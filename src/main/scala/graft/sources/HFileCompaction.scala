package graft.sources

import java.nio.file.{Files, Paths}
import java.util.concurrent.ConcurrentHashMap

import scala.collection.mutable

import org.apache.spark.sql.SparkSession

/** HBase MAJOR COMPACTION over an HFile snapshot directory — the
  * maintenance operator that bounds the generation count the scan's
  * heap-merge pays for (HBase ref guide §70 "Compaction"; the
  * reference's cluster runs this server-side, a snapshot-export
  * pipeline runs it over the exported files).
  *
  * Semantics (HBase's, re-expressed over the decoder):
  *  - per region, every generation file's cells heap-merge in
  *    (row ASC, ts DESC, generation DESC) order, keeping ALL versions
  *    — this is a major compaction without delete/TTL processing, the
  *    snapshot-export case;
  *  - an exact (row, ts) tie across generations resolves to the
  *    NEWEST generation's cell (the sequence-id rule — same tie-break
  *    the scan itself applies), so compaction can never change what a
  *    scan returns;
  *  - output is ONE file per region, written in any [[HFileShape]] —
  *    compaction doubles as a format transcoder (e.g. legacy v2/GZ
  *    generations into v3 + FAST_DIFF + multi-level index).
  *
  * Execution: one Spark task per region (the unit HBase compacts by),
  * each streaming its generations through constant memory — the
  * scanner decodes block-at-a-time and the writer buffers one block.
  * At 100 TB this is the same job with file IO against the DFS; no
  * driver materialization (the driver ships region→file lists, a few
  * strings each).
  */
object HFileCompaction {

  private val memo = new ConcurrentHashMap[(String, HFileShape), String]()

  /** Regions of a snapshot dir: file names follow
    * `region-rNNN-gM.hfile`; generation order = name order (later
    * generation = newer, the fixture/HBase-seqid convention). */
  private[sources] def regionFiles(dir: String): Seq[(String, Seq[String])] = {
    val names = mutable.ArrayBuffer.empty[String]
    val it = Files.list(Paths.get(dir)).iterator()
    while (it.hasNext) {
      val p = it.next()
      if (p.getFileName.toString.endsWith(".hfile")) names += p.toString
    }
    names.sorted.groupBy(n =>
      Paths.get(n).getFileName.toString.split("-g").head)
      .toSeq.map { case (r, fs) => r -> fs.toSeq.sorted }
      .sortBy(_._1)
  }

  /** Compacts `dir` into a fresh directory (memoised per (dir, shape)
    * per JVM); returns the compacted directory path. */
  def compact(s: SparkSession, dir: String, shape: HFileShape): String =
    memo.computeIfAbsent((dir, shape), { _ =>
      val out = Files.createTempDirectory("graft-hfile-compacted")
      val regions = regionFiles(dir)
      val outPath = out.toString
      s.sparkContext
        .parallelize(regions, math.max(1, regions.size))
        .foreach { case (region, files) =>
          compactRegion(files, s"$outPath/$region-g0.hfile", shape)
        }
      outPath
    })

  /** Executor-side merge of one region's generation files into one
    * output file. */
  private[sources] def compactRegion(files: Seq[String], outFile: String,
      shape: HFileShape): Unit = {
    val scanners = files.zipWithIndex.map { case (f, ord) =>
      new HFileScanner(f, 0, 256, TsRange.All, ord)
    }.filter(_.hasNext)
    // (row ASC, ts DESC, generation DESC): same comparator as the
    // scan-side heap-merge in HFileSnapshotStore
    val ord = new Ordering[HFileScanner] {
      override def compare(a: HFileScanner, b: HFileScanner): Int = {
        val c = java.util.Arrays.compareUnsigned(b.head.key, a.head.key)
        if (c != 0) c
        else {
          val t = java.lang.Long.compare(a.head.ts, b.head.ts)
          if (t != 0) t else Integer.compare(a.ordinal, b.ordinal)
        }
      }
    }
    val pq = mutable.PriorityQueue(scanners: _*)(ord)
    val merged = new Iterator[(Array[Byte], Long, Array[Byte])] {
      private var lastRow: Array[Byte] = _
      private var lastTs = 0L
      private var nextE: HFileEntry = _

      private def advance(): Unit = {
        while (nextE == null && pq.nonEmpty) {
          val sc = pq.dequeue()
          val e = sc.next()
          if (sc.hasNext) pq.enqueue(sc)
          // exact (row, ts) tie: a LATER-dequeued equal cell is an
          // older generation's — drop it (sequence-id rule)
          if (lastRow == null || lastTs != e.ts ||
              !java.util.Arrays.equals(lastRow, e.key)) {
            lastRow = e.key; lastTs = e.ts
            nextE = e
          }
        }
      }

      override def hasNext: Boolean = { if (nextE == null) advance(); nextE != null }
      override def next(): (Array[Byte], Long, Array[Byte]) = {
        if (!hasNext) throw new NoSuchElementException
        val e = nextE; nextE = null
        (e.key, e.ts, e.value)
      }
    }
    if (merged.hasNext)
      HFileV2Writer.writeHFile(Paths.get(outFile), merged, shape)
    ()
  }
}
