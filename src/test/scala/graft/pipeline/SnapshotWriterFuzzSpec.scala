package graft.pipeline

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Randomized roll-boundary fuzz over the byte-rolling encrypted sink:
  * random batch-size thresholds (down to smaller than a single
  * record, the forced-oversize corner), random compressions, and
  * random document lengths — for every trial, the DSv2 write's
  * accounting must tile the input exactly (Σ records, per-file
  * decrypt+decompress round-trip to the document multiset, manifest
  * line parity) and the roll contract must hold: a batch exceeds
  * `maxBatchBytes` only when it holds a single oversized record (the
  * reference rolls BEFORE adding the record that would overflow,
  * S3StreamingWriter.kt:78). */
class SnapshotWriterFuzzSpec extends SparkSuite {

  test("random thresholds, compressions, and doc lengths: accounting tiles the input") {
    import spark.implicits._
    val ks = Fixture.keyService
    val rnd = new scala.util.Random(20260815L)
    for (trial <- 0 until 6) {
      val maxBytes = Seq(120, 400, 1500, 6000)(rnd.nextInt(4))
      val compression = Seq("gz", "bz2", "lz4")(rnd.nextInt(3))
      val ctx = s"trial $trial max $maxBytes $compression"
      val n = 40 + rnd.nextInt(120)
      val recs = (0 until n).map { i =>
        val docLen = 20 + rnd.nextInt(600)
        val doc = s"""{"id":"doc-$trial-$i","pad":"${"x" * docLen}"}"""
        SnapshotWriter.WriteRecord(
          slice = 0, // overwritten below from hbase_id
          doc = doc, m_id = s"id-$trial-$i", m_ts = 1000L,
          m_db = "db", m_collection = "coll", m_source = "EXPORT",
          m_outer = "O", m_inner = "I", m_original_id = s"id-$trial-$i")
      }
      // random signed first byte per record rides in a synthetic
      // hbase_id so the slice derivation in `shaped` is exercised
      val withKeys = recs.zipWithIndex.map { case (r, i) =>
        val b = (rnd.nextInt(256) - 128).toByte
        (Array(b, i.toByte), r.doc, r.m_id, r.m_ts, r.m_db, r.m_collection,
          r.m_source, r.m_outer, r.m_inner, r.m_original_id)
      }
      val df = withKeys.toDF("hbase_id", "doc", "m_id", "m_ts", "m_db",
        "m_collection", "m_source", "m_outer", "m_inner", "m_original_id")

      val outDir = Files.createTempDirectory(s"graft-wfuzz-$trial")
      val manDir = Files.createTempDirectory(s"graft-wfuzz-man-$trial")
      val cfg = SnapshotWriter.Config(outDir.toString, manDir.toString,
        Fixture.Topic, maxBatchBytes = maxBytes, compression = compression)
      val acct = SnapshotWriter.write(df, cfg, ks).collect().toSeq

      assert(acct.map(_.records).sum === n.toLong, ctx)
      // roll contract: oversize batches only as singletons
      acct.foreach { fa =>
        assert(fa.batch_bytes <= maxBytes || fa.records == 1L,
          s"$ctx ${fa.file}: ${fa.batch_bytes} bytes over $maxBytes " +
            s"with ${fa.records} records")
      }
      // full decrypt+decompress round trip: document multiset equality
      val back = acct.flatMap(fa =>
        SnapshotWriter.readBack(outDir.toString, fa.file, compression, ks))
      assert(back.groupBy(identity).view.mapValues(_.size).toMap ===
        recs.map(_.doc).groupBy(identity).view.mapValues(_.size).toMap, ctx)
      // manifest parity per file
      acct.foreach { fa =>
        val lines = Files.readString(
          new java.io.File(manDir.toFile, fa.manifest_file).toPath)
          .split("\n").count(_.nonEmpty)
        assert(lines === fa.records, s"$ctx ${fa.manifest_file}")
      }
      // slice labels match the signed-band arithmetic of the keys
      val expectSlices = withKeys.map { case (k, _, _, _, _, _, _, _, _, _) =>
        ((k(0) + 128) & 0xff) / cfg.scanWidth
      }.distinct.sorted
      val gotSlices = acct.map(_.slice).distinct.sorted
      assert(gotSlices.size === expectSlices.size, ctx)
    }
  }

  test("exactly-once under random kill points x roll thresholds: " +
      "task retry yields byte-identical output") {
    // Composes SnapshotWriterSpec's single fixed-point retry test with
    // this suite's roll-boundary sweep (the systematic-sweep pattern
    // HFileFuzzSpec applied to the strict-floor bug class): each trial
    // draws a random roll threshold, compression, slice width, corpus,
    // and a random FIRST-ATTEMPT kill point guaranteed to fire inside
    // some task — mid-batch, exactly on a roll, before the first
    // flush, or after several files are already staged — and the
    // retried run's directories must be byte-identical to a fault-free
    // run of the same corpus (staged-but-uncommitted attempt files
    // never surface; the deterministic rewrite republishes the same
    // bytes).
    import spark.implicits._
    assert(spark.sparkContext.master.endsWith(",2]"),
      s"retry fuzz needs task retries enabled: ${spark.sparkContext.master}")
    val ks = Fixture.keyService
    val rnd = new scala.util.Random(20260815L)
    for (trial <- 0 until 5) {
      val maxBytes = Seq(150, 500, 2000, 8000)(rnd.nextInt(4))
      val compression = Seq("gz", "bz2", "lz4")(rnd.nextInt(3))
      val width = Seq(32, 64, 128)(rnd.nextInt(3))
      val n = 60 + rnd.nextInt(140)
      val rows = (0 until n).map { i =>
        val b = (rnd.nextInt(256) - 128).toByte
        val doc =
          s"""{"id":"kf-$trial-$i","pad":"${"y" * (20 + rnd.nextInt(400))}"}"""
        (Array(b, i.toByte), doc, s"id-$trial-$i", 1000L, "db", "coll",
          "EXPORT", "O", "I", s"id-$trial-$i")
      }
      val df = rows.toDF("hbase_id", "doc", "m_id", "m_ts", "m_db",
        "m_collection", "m_source", "m_outer", "m_inner", "m_original_id")
      // per-slice row counts under this width: a kill point strictly
      // below the densest slice's count is guaranteed to fire in the
      // task that owns it (the sink plans one partition per slice)
      val sliceCounts = rows.groupBy { case (k, _, _, _, _, _, _, _, _, _) =>
        ((k(0) + 128) & 0xff) / width }.view.mapValues(_.size)
      val densest = sliceCounts.values.max
      // the fault fires only in a task holding MORE than killAt rows
      // (write checks `written >= faultAt` before each record), so the
      // trial's precondition is densest >= 2 — assert it loudly rather
      // than let a reparameterized generator (smaller n, wider width)
      // turn nextInt(0) into an opaque IllegalArgumentException
      assert(densest >= 2, s"trial $trial generated a densest slice of " +
        s"$densest row(s) (n=$n width=$width): no kill point can be " +
        "guaranteed to fire — regenerate with more rows per slice")
      val killAt = 1 + rnd.nextInt(densest - 1)
      val ctx = s"trial $trial max $maxBytes $compression w$width " +
        s"n=$n kill@$killAt"

      def run(fault: Int): (java.io.File, java.io.File,
          Seq[SnapshotWriter.FileAccounting]) = {
        val out = Files.createTempDirectory(s"graft-kfuzz-$trial").toFile
        val man = Files.createTempDirectory(s"graft-kfuzz-man-$trial").toFile
        val cfg = SnapshotWriter.Config(out.toString, man.toString,
          Fixture.Topic, maxBatchBytes = maxBytes, compression = compression,
          scanWidth = width, faultFirstAttemptAfter = fault)
        (out, man, SnapshotWriter.write(df, cfg, ks).collect().toSeq)
      }
      val (cleanOut, cleanMan, cleanAcct) = run(0)
      val before = SnapshotWriter.faultsInjected.get()
      val (out, man, acct) = run(killAt)
      assert(SnapshotWriter.faultsInjected.get() - before >= 1,
        s"$ctx: kill point never fired")
      assert(acct.toSet === cleanAcct.toSet, ctx)
      def listing(d: java.io.File): Seq[String] = d.list().sorted.toSeq
      assert(listing(out) === listing(cleanOut), ctx)
      assert(listing(man) === listing(cleanMan), ctx)
      assert(!listing(out).exists(_.endsWith(".tmp")), ctx)
      for (nm <- listing(out))
        assert(java.util.Arrays.equals(
          Files.readAllBytes(new java.io.File(out, nm).toPath),
          Files.readAllBytes(new java.io.File(cleanOut, nm).toPath)),
          s"$ctx object $nm differs")
      for (nm <- listing(man))
        assert(java.util.Arrays.equals(
          Files.readAllBytes(new java.io.File(man, nm).toPath),
          Files.readAllBytes(new java.io.File(cleanMan, nm).toPath)),
          s"$ctx manifest $nm differs")
    }
  }
}
