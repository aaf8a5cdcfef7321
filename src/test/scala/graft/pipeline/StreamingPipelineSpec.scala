package graft.pipeline

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Structured Streaming spec: the export pipeline is stateless per-row
  * (parse → decrypt → transform → validate → sanitise are all row
  * expressions/UDFs), so the SAME stage composition runs unchanged as
  * `readStream → transforms → writeStream`. The reference is strictly
  * batch — "incremental" is a timestamp-ranged batch (README.md:83-84)
  * — so this is the north-star extension: a continuously exporting
  * variant with exactly the same record semantics.
  */
class StreamingPipelineSpec extends SparkSuite {

  test("pipeline stages run under structured streaming, incrementally") {
    val sqlCtx = spark.sqlContext
    implicit val ctx: org.apache.spark.sql.SQLContext = sqlCtx
    import spark.implicits._

    val ks = Fixture.keyService
    val dek = ks.batchDataKey().plaintextDataKey
    val encKey = ks.encryptKey(Fixture.MasterKeyId, dek)

    val stream = MemoryStream[Fixture.RawCell]
    val out = ExportPipeline.run(stream.toDF(), Fixture.Topic, ks)
    val query = ExportPipeline.records(out)
      .select("doc", "m_id", "err")
      .writeStream.format("memory").queryName("graft_stream")
      .outputMode("append").start()
    try {
      stream.addData((0L until 100L).map(i => Fixture.cell(i, dek, encKey, corrupt = false)))
      query.processAllAvailable()
      assert(spark.table("graft_stream").count() == 100)

      // incremental micro-batch: only the new rows append
      stream.addData((100L until 150L).map(i => Fixture.cell(i, dek, encKey, corrupt = false)))
      query.processAllAvailable()
      val t = spark.table("graft_stream")
      assert(t.count() == 150)
      assert(t.filter(col("doc").contains("d_oid")).count() == 75)
      assert(t.select("m_id").distinct().count() == 150)
    } finally query.stop()
  }

  test("snapshot writer runs as the streaming sink: rolled files + manifests " +
      "paired per micro-batch") {
    val sqlCtx = spark.sqlContext
    implicit val ctx: org.apache.spark.sql.SQLContext = sqlCtx
    import spark.implicits._
    import graft.streaming.StreamingExport

    val ks = Fixture.keyService
    val dek = ks.batchDataKey().plaintextDataKey
    val encKey = ks.encryptKey(Fixture.MasterKeyId, dek)

    val outDir = java.nio.file.Files.createTempDirectory("graft-stream-out")
    val manDir = java.nio.file.Files.createTempDirectory("graft-stream-man")
    val cfg = SnapshotWriter.Config(outDir.toString, manDir.toString,
      Fixture.Topic, maxBatchBytes = 5000, compression = "gz")

    val results = new scala.collection.mutable.ListBuffer[StreamingExport.BatchResult]
    val stream = MemoryStream[Fixture.RawCell]
    val records = ExportPipeline.records(
      ExportPipeline.run(stream.toDF(), Fixture.Topic, ks))
    val query = StreamingExport.start(records, cfg, ks, "graft_stream_sink",
      r => results.synchronized { results += r })
    try {
      stream.addData((0L until 200L).map(i => Fixture.cell(i, dek, encKey, corrupt = false)))
      query.processAllAvailable()
      stream.addData((200L until 350L).map(i => Fixture.cell(i, dek, encKey, corrupt = false)))
      query.processAllAvailable()

      val snap = results.synchronized(results.toList)
      assert(snap.map(_.batchId).distinct.size == 2, snap.map(_.batchId))

      // every micro-batch: written records == streamed records, both
      // key slices produced output, rolling actually rolled
      val expected = Map(0L -> 200L, 1L -> 150L)
      snap.foreach { batch =>
        assert(batch.files.map(_.records).sum == expected(batch.batchId))
        assert(batch.files.map(_.slice).distinct.sorted == Seq("000-128", "128-000"))
        assert(batch.files.size > 2, s"expected rolling: ${batch.files.size} files")
        batch.files.foreach { fa =>
          // manifest line count matches its file's record count
          val manifest = java.nio.file.Path.of(
            manDir.toString, s"batch=${batch.batchId}", fa.manifest_file)
          val lines = java.nio.file.Files.readString(manifest)
            .split("\n").count(_.nonEmpty)
          assert(lines == fa.records, s"${fa.manifest_file}: $lines != ${fa.records}")
          // encrypted object round-trips to its record count
          val back = SnapshotWriter.readBack(
            s"${outDir.toString}/batch=${batch.batchId}", fa.file, "gz", ks)
          assert(back.length == fa.records)
        }
      }
    } finally query.stop()
  }

  test("mapBatch mode (prepared sink-side pipeline) writes exactly what " +
      "record mode writes") {
    // the two StreamingExport modes must be observably equivalent:
    // record mode (engine-planned pipeline, staged write) and mapBatch
    // mode (raw stream, prepared transform fused into the sink query)
    // export the same corpus to the same files
    val sqlCtx = spark.sqlContext
    implicit val ctx: org.apache.spark.sql.SQLContext = sqlCtx
    import spark.implicits._
    import graft.streaming.StreamingExport

    val ks = Fixture.keyService
    val dek = ks.batchDataKey().plaintextDataKey
    val encKey = ks.encryptKey(Fixture.MasterKeyId, dek)
    val batches = Seq(0L until 150L, 150L until 300L)
      .map(_.map(i => Fixture.cell(i, dek, encKey, corrupt = false)))

    def export(useMapBatch: Boolean): Map[String, Int] = {
      val outDir = java.nio.file.Files.createTempDirectory("graft-mb-out")
      val manDir = java.nio.file.Files.createTempDirectory("graft-mb-man")
      val cfg = SnapshotWriter.Config(outDir.toString, manDir.toString,
        Fixture.Topic, maxBatchBytes = 5000, compression = "gz")
      val results =
        new scala.collection.mutable.ListBuffer[StreamingExport.BatchResult]
      val stream = MemoryStream[Fixture.RawCell]
      val query =
        if (useMapBatch) {
          val prepared = new graft.core.PreparedTransform(spark,
            stream.toDF().schema,
            b => SnapshotWriter.shaped(ExportPipeline.records(
              ExportPipeline.run(b, Fixture.Topic, ks)), cfg))
          StreamingExport.start(stream.toDF(), cfg, ks, "graft_mb_sink",
            r => results.synchronized { results += r },
            mapBatch = Some(prepared.lift))
        } else {
          val records = ExportPipeline.records(
            ExportPipeline.run(stream.toDF(), Fixture.Topic, ks))
          StreamingExport.start(records, cfg, ks, "graft_rec_sink",
            r => results.synchronized { results += r })
        }
      try {
        batches.foreach { b => stream.addData(b); query.processAllAvailable() }
        val snap = results.synchronized(results.toList)
        assert(snap.map(_.batchId).distinct.size == 2)
        // decrypted doc multiset across every written file
        snap.flatMap(b => b.files.flatMap(fa => SnapshotWriter.readBack(
            s"${outDir.toString}/batch=${b.batchId}", fa.file, "gz", ks)))
          .groupBy(identity).view.mapValues(_.size).toMap
      } finally query.stop()
    }

    val viaRecords = export(useMapBatch = false)
    val viaMapBatch = export(useMapBatch = true)
    assert(viaMapBatch.values.sum == 300)
    assert(viaMapBatch === viaRecords,
      "mapBatch mode must export the identical document multiset")
  }

  test("typed skips flow as a streaming aggregation (complete mode)") {
    val sqlCtx = spark.sqlContext
    implicit val ctx: org.apache.spark.sql.SQLContext = sqlCtx
    import spark.implicits._

    val ks = Fixture.keyService
    val dek = ks.batchDataKey().plaintextDataKey
    val encKey = ks.encryptKey(Fixture.MasterKeyId, dek)

    val stream = MemoryStream[Fixture.RawCell]
    val out = ExportPipeline.run(stream.toDF(), Fixture.Topic, ks)
    val query = ExportPipeline.skipSummary(out)
      .writeStream.format("memory").queryName("graft_stream_skips")
      .outputMode("complete").start()
    try {
      stream.addData((0L until 200L).map(i => Fixture.cell(i, dek, encKey, corrupt = true)))
      query.processAllAvailable()
      val counts = spark.table("graft_stream_skips").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(counts == Map("ok" -> 194L, "missing:dbObject" -> 2L,
        "decrypt_failed" -> 2L, "bad_decrypted" -> 2L))
    } finally query.stop()
  }

  // Task-retry exactly-once is fuzz-swept (SnapshotWriterFuzzSpec:
  // kill points inside a task, retried output byte-identical). This
  // pins the OTHER fault-tolerance class: a query RESTART from the
  // offset/commit logs. Contract: batches committed before the stop
  // are not re-run (no duplicate batchId callback, their batch=N file
  // sets untouched), the restarted query picks up data that arrived
  // while it was down under the NEXT batch id, and the decrypted
  // document multiset across all batch dirs is exactly the full
  // corpus, once. Exercised in BOTH sink modes: record mode
  // (engine-planned pipeline) and mapBatch mode (PreparedTransform
  // fused into the sink — the production q56 shape, where the
  // template must also serve batches of a RESTARTED query).
  for (useMapBatch <- Seq(false, true))
    test("restart from checkpoint: committed batches never re-deliver " +
      s"(${if (useMapBatch) "mapBatch/prepared" else "record"} mode)") {
    val sqlCtx = spark.sqlContext
    implicit val ctx: org.apache.spark.sql.SQLContext = sqlCtx
    import spark.implicits._
    import graft.streaming.StreamingExport

    val ks = Fixture.keyService
    val dek = ks.batchDataKey().plaintextDataKey
    val encKey = ks.encryptKey(Fixture.MasterKeyId, dek)
    val outDir = java.nio.file.Files.createTempDirectory("graft-rs-out")
    val manDir = java.nio.file.Files.createTempDirectory("graft-rs-man")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-rs-ckpt")
    val cfg = SnapshotWriter.Config(outDir.toString, manDir.toString,
      Fixture.Topic, maxBatchBytes = 5000, compression = "gz")

    val results = new scala.collection.mutable.ListBuffer[StreamingExport.BatchResult]
    // ONE MemoryStream instance across both query incarnations: its
    // data survives in the JVM, so the restarted query can serve the
    // offset range the checkpoint says is next
    val stream = MemoryStream[Fixture.RawCell]
    // one prepared template across incarnations too (the q56LiftMemo
    // pattern: analyzed once per session, not per query start)
    lazy val prepared = new graft.core.PreparedTransform(spark,
      stream.toDF().schema,
      b => SnapshotWriter.shaped(ExportPipeline.records(
        ExportPipeline.run(b, Fixture.Topic, ks)), cfg))
    def startQuery(name: String) =
      if (useMapBatch)
        StreamingExport.start(stream.toDF(), cfg, ks, name,
          r => results.synchronized { results += r },
          checkpointDir = Some(ckpt.toString),
          mapBatch = Some(prepared.lift))
      else
        StreamingExport.start(
          ExportPipeline.records(
            ExportPipeline.run(stream.toDF(), Fixture.Topic, ks)),
          cfg, ks, name, r => results.synchronized { results += r },
          checkpointDir = Some(ckpt.toString))

    def batchFiles(): Map[String, Set[String]] = {
      val out = new java.io.File(outDir.toFile, "")
      out.listFiles().filter(_.getName.startsWith("batch="))
        .map(d => d.getName -> d.listFiles().map(_.getName).toSet).toMap
    }

    val q1 = startQuery("graft_restart_sink_a")
    try {
      stream.addData((0L until 150L).map(i =>
        Fixture.cell(i, dek, encKey, corrupt = false)))
      q1.processAllAvailable()
      stream.addData((150L until 250L).map(i =>
        Fixture.cell(i, dek, encKey, corrupt = false)))
      q1.processAllAvailable()
    } finally q1.stop()
    assert(results.synchronized(results.toList).map(_.batchId) == Seq(0L, 1L))
    val filesBefore = batchFiles()
    assert(filesBefore.keySet == Set("batch=0", "batch=1"))

    // data lands while the query is DOWN; the restart must export it
    stream.addData((250L until 350L).map(i =>
      Fixture.cell(i, dek, encKey, corrupt = false)))
    val q2 = startQuery("graft_restart_sink_b")
    try q2.processAllAvailable() finally q2.stop()

    val allBatches = results.synchronized(results.toList)
    assert(allBatches.map(_.batchId) == Seq(0L, 1L, 2L),
      s"restart must run ONLY the new batch 2, got ${allBatches.map(_.batchId)}")
    // committed batch dirs untouched: same file sets, and batch=2 new
    val filesAfter = batchFiles()
    assert(filesAfter.keySet == Set("batch=0", "batch=1", "batch=2"))
    assert(filesAfter("batch=0") == filesBefore("batch=0") &&
      filesAfter("batch=1") == filesBefore("batch=1"),
      "restart rewrote a committed batch dir")
    // the whole corpus decrypts back exactly once across all batches
    val docs = allBatches.flatMap(b => b.files.flatMap(fa =>
      SnapshotWriter.readBack(
        s"${outDir.toString}/batch=${b.batchId}", fa.file, "gz", ks)))
    assert(docs.size == 350, s"expected 350 docs once, got ${docs.size}")
    assert(docs.distinct.size == 350, "a document was delivered twice")
  }

  test("a crash AFTER file publish but BEFORE the checkpoint commit " +
      "replays the batch idempotently (byte-identical re-publish)") {
    // The narrowest exactly-once window: the sink's job commit has
    // PUBLISHED batch files, then the query dies before the engine
    // writes the batch to the commit log. On restart Spark re-runs
    // that batch; the writer must overwrite its own published files
    // with identical bytes (deterministic DEK + per-(topic,slice,
    // batch) IVs + REPLACE_EXISTING publishes), never wedge on
    // already-existing targets or double-deliver documents.
    val sqlCtx = spark.sqlContext
    implicit val ctx: org.apache.spark.sql.SQLContext = sqlCtx
    import spark.implicits._
    import graft.streaming.StreamingExport

    val ks = Fixture.keyService
    val dek = ks.batchDataKey().plaintextDataKey
    val encKey = ks.encryptKey(Fixture.MasterKeyId, dek)
    val outDir = java.nio.file.Files.createTempDirectory("graft-cw-out")
    val manDir = java.nio.file.Files.createTempDirectory("graft-cw-man")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-cw-ckpt")
    val cfg = SnapshotWriter.Config(outDir.toString, manDir.toString,
      Fixture.Topic, maxBatchBytes = 5000, compression = "gz")

    val results = new scala.collection.mutable.ListBuffer[StreamingExport.BatchResult]
    val dieOnce = new java.util.concurrent.atomic.AtomicBoolean(true)
    val stream = MemoryStream[Fixture.RawCell]
    def startQuery(name: String) = StreamingExport.start(
      ExportPipeline.records(
        ExportPipeline.run(stream.toDF(), Fixture.Topic, ks)),
      cfg, ks, name, r => {
        results.synchronized { results += r }
        // onBatch runs after the DSv2 job commit (files are live) and
        // before foreachBatch returns (commit log not yet written):
        // throwing HERE is the crash window
        if (r.batchId == 1 && dieOnce.getAndSet(false))
          throw new IllegalStateException("injected post-publish crash")
      }, checkpointDir = Some(ckpt.toString))

    def batchBytes(batch: String): Map[String, Seq[Byte]] = {
      val d = new java.io.File(outDir.toFile, batch)
      d.listFiles().map(f => f.getName ->
        java.nio.file.Files.readAllBytes(f.toPath).toSeq).toMap
    }

    val q1 = startQuery("graft_crashwin_a")
    val thrown = try {
      stream.addData((0L until 150L).map(i =>
        Fixture.cell(i, dek, encKey, corrupt = false)))
      q1.processAllAvailable()
      stream.addData((150L until 250L).map(i =>
        Fixture.cell(i, dek, encKey, corrupt = false)))
      q1.processAllAvailable() // batch 1 publishes, then dies
      false
    } catch { case _: Exception => true } finally q1.stop()
    assert(thrown, "the injected crash must fail the first query")
    assert(!dieOnce.get(), "the crash injection never fired")
    // batch 1's files ARE published despite the crash (commit ran)
    val publishedBefore = batchBytes("batch=1")
    assert(publishedBefore.nonEmpty)

    val q2 = startQuery("graft_crashwin_b")
    try q2.processAllAvailable() finally q2.stop()

    // the engine re-ran batch 1 (it never reached the commit log):
    // once crashed-after-publish, once committed — and the replay
    // overwrote the published files with IDENTICAL bytes
    assert(results.synchronized(results.toList).map(_.batchId) ==
      Seq(0L, 1L, 1L))
    assert(batchBytes("batch=1") === publishedBefore,
      "replayed batch must re-publish byte-identical files")
    // document multiset across batch dirs: the full corpus, once
    val last = results.synchronized(results.toList).groupBy(_.batchId)
      .view.mapValues(_.last).values.toSeq
    val docs = last.flatMap(b => b.files.flatMap(fa =>
      SnapshotWriter.readBack(
        s"${outDir.toString}/batch=${b.batchId}", fa.file, "gz", ks)))
    assert(docs.size == 250 && docs.distinct.size == 250)
  }
}
