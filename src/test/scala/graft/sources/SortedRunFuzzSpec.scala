package graft.sources

import java.nio.file.Files

import scala.collection.mutable

import org.scalatest.funsuite.AnyFunSuite

/** Randomized round-trip fuzz over the sorted-run store — the
  * [[HFileFuzzSpec]] treatment for the second snapshot format: random
  * block fan-outs (down to one entry per block, the peak
  * boundary-spanning stress), random multi-version corpora across two
  * overlapping runs with exact (key, ts) collisions (manifest-ordinal
  * tie-break), and for every trial the slice scan, the point get, and
  * the full fault-injection sweep (reopen-at-key after an IOException
  * at EVERY offset) must agree with an in-memory model. The model
  * re-derives the store's contract directly: newest in-ts-range
  * version per key, ordinal breaking exact ties. */
class SortedRunFuzzSpec extends AnyFunSuite {

  private def modelWinners(
      runs: Seq[Seq[(Array[Byte], Long, String)]], range: TsRange)
      : Map[Seq[Byte], (Long, String)] =
    runs.zipWithIndex
      .flatMap { case (es, ord) => es.map { case (k, ts, v) => (k.toSeq, ts, v, ord) } }
      .filter { case (_, ts, _, _) => range.contains(ts) }
      .groupBy(_._1)
      .map { case (k, group) =>
        val w = group.maxBy { case (_, ts, _, ord) => (ts, ord) }
        k -> ((w._2, w._3))
      }

  private def scanAll(store: SortedRunStore, range: TsRange)
      : Map[Seq[Byte], (Long, String)] =
    (0 until 256 / 8).flatMap(i => store.scan(KeySlice(i, 8), range).toSeq)
      .map(c => c.hbaseId.toSeq -> ((c.ts, c.value))).toMap

  test("random fan-outs and corpora: scan, get, and every fault offset match the model") {
    val rnd = new scala.util.Random(20260815L)
    for (trial <- 0 until 20) {
      val blockEntries = 1 + rnd.nextInt(6)
      val ctx = s"trial $trial blockEntries $blockEntries"
      val rows = (0 until 20).map { _ =>
        val len = 1 + rnd.nextInt(5)
        val a = new Array[Byte](len); rnd.nextBytes(a); a
      }.distinctBy(_.toSeq)

      // two runs; keys overlap, versions overlap, some exact (key, ts)
      // collisions across runs (ordinal tie-break); one key gets MANY
      // versions so they span several blocks
      val deepKey = rows.head
      val runs = (0 until 2).map { g =>
        val es = mutable.ArrayBuffer.empty[(Array[Byte], Long, String)]
        rows.foreach { row =>
          val nv =
            if (row eq deepKey) 6 + rnd.nextInt(5)
            else rnd.nextInt(4)
          val tss = mutable.Set.empty[Long]
          (0 until nv).foreach(_ => tss += 1000L + rnd.nextInt(8))
          tss.foreach(ts => es += ((row, ts,
            s"v-${row.toSeq.mkString("_")}-$ts-g$g")))
        }
        // (key unsigned ASC, ts DESC) — the writer's required order
        es.sortWith { (a, b) =>
          val c = java.util.Arrays.compareUnsigned(a._1, b._1)
          if (c != 0) c < 0 else a._2 > b._2
        }.toSeq
      }.filter(_.nonEmpty)

      val dir = Files.createTempDirectory(s"graft-srs-fuzz-$trial")
      val metas = runs.zipWithIndex.map { case (es, g) =>
        SortedRunWriter.writeRun(dir, f"run-$g%03d.dat", es.iterator,
          blockEntries = blockEntries)
      }
      SortedRunFormat.writeManifest(dir, metas)
      val store = SortedRunStore(dir.toString)

      val ranges = Seq(TsRange.All, TsRange(1000L, 1003L),
        TsRange(1004L, 1007L), TsRange(1002L, 1002L))
      for (range <- ranges) {
        val expected = modelWinners(runs, range)
        assert(scanAll(store, range) === expected, s"$ctx scan $range")

        val absents = rows.map { r =>
          val x = r.clone(); x(x.length - 1) = (x(x.length - 1) ^ 0x5a).toByte; x
        }.filter(r => !rows.exists(_.sameElements(r)))
        val got = store.get(rows ++ absents ++ Seq(Array.emptyByteArray), range)
          .map(c => c.hbaseId.toSeq -> ((c.ts, c.value))).toMap
        assert(got === expected, s"$ctx get $range")
      }

      // reopen-at-key: an injected IOException after EVERY possible
      // entry offset must leave the scan identical to the clean one
      val clean = scanAll(store, TsRange.All)
      val maxEntries = runs.map(_.size).max
      for (failAt <- 1 to math.min(maxEntries, 12)) {
        val faulty = SortedRunStore(dir.toString,
          failAfterEntries = Some(failAt))
        assert(scanAll(faulty, TsRange.All) === clean, s"$ctx failAt $failAt")
      }
    }
  }
}
