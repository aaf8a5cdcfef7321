package graft.sources

import java.io.{BufferedOutputStream, DataInputStream, DataOutputStream, FileInputStream, FileOutputStream, IOException, RandomAccessFile}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import java.util.concurrent.ConcurrentHashMap

import scala.collection.mutable

import graft.pipeline.Fixture

/** Block-indexed sorted-run snapshot format — the in-repo, runnable
  * realization of the 5-step HFile-snapshot scan contract (now also
  * implemented over the real HFile v2 byte format in HFileV2.scala;
  * the reference scans the live cluster instead,
  * batch/HBaseReader.kt:145-187). The layout
  * mirrors an HBase snapshot's shape: a snapshot directory holds a
  * manifest plus one sorted run file per (region × generation) —
  * a region is a key range (first unsigned row-key byte), and a
  * region's generations are overlapping files whose entries must be
  * version-merged at read time, exactly like a region's HFiles
  * between compactions.
  *
  * Run file layout (all integers big-endian, Data{In,Out}putStream):
  * {{{
  *   block*   block   = [entryCount:int] entry*
  *            entry   = [keyLen:int][key][ts:long][valLen:int][valueUtf8]
  *   index            = [nBlocks:int] ([offset:long][firstKeyLen:int][firstKey])*
  *   trailer          = [indexOffset:long][magic:long]
  * }}}
  * Entries within a run are sorted by (row key unsigned-lexicographic
  * ASC, ts DESC) — HBase cell order — so a heap-merge of run scanners
  * yields, per key, its freshest in-range version first.
  */
object SortedRunFormat {

  val Magic: Long = 0x4752414654535231L // "GRAFTSR1"
  val ManifestFile = "MANIFEST"
  val TrailerBytes = 16

  /** One run's manifest row: enough to prune runs against a key-range
    * slice without opening the file (step 1 of the scan contract). */
  final case class RunMeta(file: String, firstByte: Int, lastByte: Int,
      entries: Long)

  final case class BlockRef(offset: Long, firstKey: Array[Byte])

  /** Manifest + per-file block indexes are read once per JVM and
    * memoised (a production job reads the manifest once on the driver
    * and broadcasts it; the block index is the first read any scanner
    * of that file performs — HFile keeps it in the block cache). */
  private val manifestMemo = new ConcurrentHashMap[String, Seq[RunMeta]]()
  private val indexMemo = new ConcurrentHashMap[String, Array[BlockRef]]()

  /** Files opened by scanners — observability for the pruning spec
    * (a slice scan must open only the runs its manifest rows admit). */
  private[sources] val opens = new java.util.concurrent.atomic.AtomicInteger

  def writeManifest(dir: Path, runs: Seq[RunMeta]): Unit = {
    val body = runs.map(r =>
      s"${r.file}|${r.firstByte}|${r.lastByte}|${r.entries}").mkString("\n")
    Files.writeString(dir.resolve(ManifestFile), s"graft-sorted-run-v1\n$body\n")
  }

  def readManifest(dir: String): Seq[RunMeta] =
    manifestMemo.computeIfAbsent(dir, { d =>
      val lines = Files.readString(Paths.get(d, ManifestFile))
        .split("\n").toSeq.filter(_.nonEmpty)
      require(lines.headOption.contains("graft-sorted-run-v1"),
        s"not a sorted-run snapshot: $d")
      lines.tail.map { l =>
        val p = l.split('|')
        RunMeta(p(0), p(1).toInt, p(2).toInt, p(3).toLong)
      }
    })

  def readBlockIndex(path: String): Array[BlockRef] =
    indexMemo.computeIfAbsent(path, { p =>
      val raf = new RandomAccessFile(p, "r")
      try {
        raf.seek(raf.length() - TrailerBytes)
        val indexOffset = raf.readLong()
        val magic = raf.readLong()
        require(magic == Magic, s"bad sorted-run magic in $p")
        raf.seek(indexOffset)
        val n = raf.readInt()
        Array.fill(n) {
          val off = raf.readLong()
          val kl = raf.readInt()
          val k = new Array[Byte](kl)
          raf.readFully(k)
          BlockRef(off, k)
        }
      } finally raf.close()
    })

  /** Greatest block whose first key is <= target (seek start), or 0 —
    * a scan starting there cannot miss a key >= target. */
  def seekBlock(index: Array[BlockRef], target: Array[Byte]): Int = {
    var lo = 0; var hi = index.length - 1; var best = 0
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      if (java.util.Arrays.compareUnsigned(index(mid).firstKey, target) <= 0) {
        best = mid; lo = mid + 1
      } else hi = mid - 1
    }
    best
  }

  /** Greatest block whose first key is STRICTLY < target, or 0. The
    * floor a KEY-targeted seek needs: entries sort (key ASC, ts DESC),
    * so when one key's versions span a block boundary its higher-ts
    * entries trail the PREVIOUS block — a seek landing on the block
    * whose first key == target would miss them (bites resume-at-key
    * after a fault and point probes; the slice-start seek uses a
    * 1-byte prefix no full key equals, so either floor works there).
    * Differs from [[seekBlock]] only in that equality case. */
  def seekBlockBefore(index: Array[BlockRef], target: Array[Byte]): Int = {
    var lo = 0; var hi = index.length - 1; var best = 0
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      if (java.util.Arrays.compareUnsigned(index(mid).firstKey, target) < 0) {
        best = mid; lo = mid + 1
      } else hi = mid - 1
    }
    best
  }
}

/** Writes sorted run files. This is a FIXTURE/TEST seam: in production
  * the run files are HBase's own flushed+compacted HFiles (we only
  * ever read a snapshot), so the writer's job is building small
  * deterministic snapshots for specs and oracle queries — per-run
  * in-memory sort is deliberate and fine at that scale. */
object SortedRunWriter {

  val DefaultBlockEntries = 64

  /** Writes one run from entries ALREADY sorted by (key unsigned ASC,
    * ts DESC); returns its manifest row. */
  def writeRun(dir: Path, file: String,
      entries: Iterator[(Array[Byte], Long, String)],
      blockEntries: Int = DefaultBlockEntries): SortedRunFormat.RunMeta = {
    val out = new DataOutputStream(new BufferedOutputStream(
      new FileOutputStream(dir.resolve(file).toFile)))
    var offset = 0L
    val index = mutable.ArrayBuffer.empty[SortedRunFormat.BlockRef]
    val buf = mutable.ArrayBuffer.empty[(Array[Byte], Long, Array[Byte])]
    var n = 0L
    var firstByte = -1
    var lastByte = -1
    def flushBlock(): Unit = if (buf.nonEmpty) {
      index += SortedRunFormat.BlockRef(offset, buf.head._1)
      out.writeInt(buf.size)
      offset += 4
      buf.foreach { case (k, ts, v) =>
        out.writeInt(k.length); out.write(k)
        out.writeLong(ts)
        out.writeInt(v.length); out.write(v)
        offset += 4L + k.length + 8L + 4L + v.length
      }
      buf.clear()
    }
    entries.foreach { case (k, ts, v) =>
      if (firstByte < 0) firstByte = k(0) & 0xff
      lastByte = k(0) & 0xff
      buf += ((k, ts, v.getBytes(StandardCharsets.UTF_8)))
      n += 1
      if (buf.size >= blockEntries) flushBlock()
    }
    flushBlock()
    val indexOffset = offset
    out.writeInt(index.size)
    index.foreach { b =>
      out.writeLong(b.offset)
      out.writeInt(b.firstKey.length); out.write(b.firstKey)
    }
    out.writeLong(indexOffset)
    out.writeLong(SortedRunFormat.Magic)
    out.close()
    SortedRunFormat.RunMeta(file, math.max(firstByte, 0),
      math.max(lastByte, 0), n)
  }
}

/** [[EnvelopeStore]] over a sorted-run snapshot directory — every one
  * of the 5 steps the HFile sketch documents, as exercised code:
  *
  *  1. manifest resolve: runs whose [firstByte, lastByte] overlaps the
  *     slice are the only files touched ([[SortedRunFormat.readManifest]],
  *     memoised per JVM — the broadcast analogue);
  *  2. block-index seek: each scanner binary-searches its block index
  *     to the last block starting <= the slice start key and skips
  *     decode-forward from there ([[SortedRunFormat.seekBlock]]);
  *  3. heap-merge in (key ASC, ts DESC) order across the run scanners,
  *     with the ts range applied AT THE DECODER — an out-of-range
  *     cell's value bytes are skipped, never materialized — and only
  *     the latest in-range version per key emitted (the
  *     Scan.setTimeRange + one-version semantics [[VersionSelect]]
  *     encodes arithmetically for the fixture store);
  *  4. stop-at-slice-end: a scanner ends at the first key whose first
  *     unsigned byte reaches the slice stop — runs are key-sorted, so
  *     nothing after can qualify;
  *  5. reopen-at-key retry: an IOException mid-scan reopens the file
  *     WITHIN the task attempt and reseeks to just past the last
  *     entry this scanner handed to the merge (strictly-after in
  *     (key ASC, ts DESC) order), so a transient drop costs a reopen,
  *     never a duplicate or a hole; progress is never persisted
  *     across attempts (the trait's retry contract).
  *
  * `failAfterEntries` is the fault-injection hook for step 5's spec:
  * each scanner throws one injected IOException after decoding that
  * many entries, and the scan must still produce exactly the
  * fault-free output.
  */
final case class SortedRunStore(dir: String,
    failAfterEntries: Option[Int] = None) extends EnvelopeStore {

  /** Point lookups for pushed `hbase_id` predicates: per probed row,
    * prune runs by the manifest's [firstByte, lastByte] band, seek
    * each surviving run's block index straight to the row
    * ([[SortedRunFormat.seekBlockBefore]] — one block, maybe two when
    * the row's versions span a boundary), and select the newest
    * in-range version with the same generation tie-break as the scan
    * merge (higher manifest ordinal wins an exact (key, ts) tie). The
    * sorted-run format carries no tombstones, so winner selection is
    * pure max — the scan's first-in-merge-order rule, computed
    * directly. */
  override def get(rows: Seq[Array[Byte]], ts: TsRange): Iterator[EnvelopeCell] = {
    val runs = SortedRunFormat.readManifest(dir).zipWithIndex
    // zero-length keys match nothing and carry no band byte (the DSv2
    // pushdown filters them; direct store callers stay safe too)
    rows.iterator.filter(_.nonEmpty).flatMap { row =>
      val b = row(0) & 0xff
      var bestTs = Long.MinValue
      var bestOrd = -1
      var bestVal: String = null
      runs.foreach { case (r, ord) =>
        if (r.firstByte <= b && b <= r.lastByte) {
          val sc = new RunScanner(Paths.get(dir, r.file).toString, row,
            b, b + 1, ts, failAfterEntries, ordinal = ord)
          try {
            var done = false
            while (!done && sc.hasNext) {
              val c = java.util.Arrays.compareUnsigned(sc.head.key, row)
              if (c > 0) done = true
              else {
                val e = sc.next()
                if (c == 0 && (e.ts > bestTs ||
                    (e.ts == bestTs && ord > bestOrd))) {
                  bestTs = e.ts; bestOrd = ord; bestVal = e.value
                }
              }
            }
          } finally sc.closeEarly()
        }
      }
      if (bestVal == null) None else Some(EnvelopeCell(row, bestTs, bestVal))
    }
  }

  override def scan(slice: KeySlice, ts: TsRange): Iterator[EnvelopeCell] = {
    val lo = slice.index * slice.width
    val hi = (slice.index + 1) * slice.width
    val runs = SortedRunFormat.readManifest(dir)
      .filter(r => r.lastByte >= lo && r.firstByte < hi)
    val seekKey = Array[Byte]((lo & 0xff).toByte)
    val scanners = runs.zipWithIndex.map { case (r, ord) => new RunScanner(
      Paths.get(dir, r.file).toString, seekKey, lo, hi, ts, failAfterEntries,
      ordinal = ord) }
      .filter(_.hasNext)

    // max-heap: smallest key first, largest ts first within a key;
    // equal (key, ts) across runs resolves to the NEWER generation
    // (higher manifest ordinal — the manifest lists generations
    // ascending per region), mirroring HBase's file-sequence-id
    // tie-break, so the emitted value never depends on scanner
    // insertion order
    val ord = new Ordering[RunScanner] {
      override def compare(a: RunScanner, b: RunScanner): Int = {
        val c = java.util.Arrays.compareUnsigned(b.head.key, a.head.key)
        if (c != 0) c
        else {
          val t = java.lang.Long.compare(a.head.ts, b.head.ts)
          if (t != 0) t else Integer.compare(a.ordinal, b.ordinal)
        }
      }
    }
    val pq = mutable.PriorityQueue(scanners: _*)(ord)

    new Iterator[EnvelopeCell] {
      private var lastKey: Array[Byte] = _
      private var nextCell: EnvelopeCell = _

      private def advance(): Unit = {
        while (nextCell == null && pq.nonEmpty) {
          val s = pq.dequeue()
          val e = s.next()
          if (s.hasNext) pq.enqueue(s)
          // first in merge order per key = freshest in-range version;
          // later same-key entries are overwritten versions — dropped
          if (lastKey == null || !java.util.Arrays.equals(lastKey, e.key)) {
            lastKey = e.key
            nextCell = EnvelopeCell(e.key, e.ts, e.value)
          }
        }
      }

      override def hasNext: Boolean = {
        if (nextCell == null) advance()
        nextCell != null
      }

      override def next(): EnvelopeCell = {
        if (!hasNext) throw new NoSuchElementException
        val c = nextCell
        nextCell = null
        c
      }
    }
  }
}

private[sources] final case class RunEntry(key: Array[Byte], ts: Long,
    value: String)

/** Sequential scanner over one run file, seeked to a slice start:
  * decodes entries in file order, skipping (a) pre-seek keys, (b)
  * out-of-range-ts cells WITHOUT materializing their values, and
  * ending at the slice stop byte. Survives one (injected or real)
  * IOException per `reopensLeft` by reopening and reseeking to
  * strictly past the last entry it returned. */
private[sources] final class RunScanner(path: String, seekKey: Array[Byte],
    loByte: Int, hiByte: Int, range: TsRange, failAfter: Option[Int],
    // generation ordinal (manifest position): breaks (key, ts) ties in
    // the merge deterministically — see SortedRunStore's heap ordering
    val ordinal: Int = 0)
    extends Iterator[RunEntry] {

  private val index = SortedRunFormat.readBlockIndex(path)
  private var in: DataInputStream = _
  private var currentBlock = 0
  private var remainingInBlock = 0
  private var seeking = true
  private var exhausted = index.isEmpty
  private var nextE: RunEntry = _
  private var lastKey: Array[Byte] = _
  private var lastTs = 0L
  private var decoded = 0
  private var faultFired = false
  private var reopensLeft = 2

  if (!exhausted) open()

  /** (Re)open the stream and position it at the seek block for either
    * the slice start (fresh scan) or the last returned entry (retry). */
  private def open(): Unit = {
    SortedRunFormat.opens.incrementAndGet()
    val target = if (lastKey == null) seekKey else lastKey
    val startBlock = SortedRunFormat.seekBlockBefore(index, target)
    val fis = new FileInputStream(path)
    fis.getChannel.position(index(startBlock).offset)
    in = new DataInputStream(new java.io.BufferedInputStream(fis, 1 << 16))
    currentBlock = startBlock
    remainingInBlock = 0
    seeking = true
  }

  /** An entry at (k, ts) is not-yet-returned iff it sorts strictly
    * after the resume point in (key ASC, ts DESC) file order. Skipped
    * (pre-seek / out-of-range) entries re-skip deterministically on
    * replay, so the predicate only needs the last RETURNED entry. */
  private def behindResumePoint(k: Array[Byte], ts: Long): Boolean =
    if (lastKey == null) java.util.Arrays.compareUnsigned(k, seekKey) < 0
    else {
      val c = java.util.Arrays.compareUnsigned(k, lastKey)
      c < 0 || (c == 0 && ts >= lastTs)
    }

  /** Decode forward to the next emittable entry; null = end of slice
    * or file. Throws IOException on stream faults (incl. injected). */
  private def decodeNext(): RunEntry = {
    while (true) {
      if (remainingInBlock == 0) {
        if (currentBlock >= index.length) return null
        remainingInBlock = in.readInt()
        currentBlock += 1
      }
      decoded += 1
      if (!faultFired && failAfter.exists(decoded >= _)) {
        faultFired = true
        throw new IOException(s"injected fault after $decoded entries")
      }
      val kl = in.readInt()
      val k = new Array[Byte](kl)
      in.readFully(k)
      val ts = in.readLong()
      val vl = in.readInt()
      remainingInBlock -= 1
      if ((k(0) & 0xff) >= hiByte) return null // stop-at-slice-end
      if (seeking && behindResumePoint(k, ts)) in.skipNBytes(vl)
      else {
        seeking = false
        if (!range.contains(ts)) in.skipNBytes(vl) // ts range at the decoder
        else {
          val v = new Array[Byte](vl)
          in.readFully(v)
          return RunEntry(k, ts, new String(v, StandardCharsets.UTF_8))
        }
      }
    }
    null // unreachable
  }

  private def advanceWithRetry(): RunEntry = {
    while (true) {
      try return decodeNext()
      catch {
        case e: IOException =>
          if (reopensLeft == 0) throw e
          reopensLeft -= 1
          try if (in != null) in.close() catch { case _: IOException => () }
          open()
      }
    }
    null // unreachable
  }

  def head: RunEntry = {
    if (!hasNext) throw new NoSuchElementException(path)
    nextE
  }

  override def hasNext: Boolean = {
    if (!exhausted && nextE == null) {
      nextE = advanceWithRetry()
      if (nextE == null) {
        exhausted = true
        try if (in != null) in.close() catch { case _: IOException => () }
      }
    }
    nextE != null
  }

  override def next(): RunEntry = {
    if (!hasNext) throw new NoSuchElementException(path)
    val e = nextE
    nextE = null
    lastKey = e.key
    lastTs = e.ts
    e
  }

  /** Early termination for consumers that stop before exhaustion
    * (point probes): releases the stream; the scanner is dead after. */
  private[sources] def closeEarly(): Unit = {
    exhausted = true
    nextE = null
    try if (in != null) in.close() catch { case _: IOException => () }
  }
}

/** Deterministic fixture snapshots in the sorted-run format — the
  * same corpus [[FixtureEnvelopeStore]] generates, persisted so the
  * block-indexed scan path is exercised against known goldens. Region
  * r of `regions` holds the keys whose first unsigned row-key byte
  * falls in [r·256/regions, (r+1)·256/regions); a key's versions are
  * spread across the region's `gens` generation files (single-version
  * corpora spread keys instead), so a scan must both prune runs by
  * slice AND heap-merge overlapping files to win. */
object SortedRunFixture {

  private val snapshotMemo = new ConcurrentHashMap[(Long, Int, Int, Int, Long), String]()

  /** Memoised per-JVM snapshot dir for (n, versions, regions, gens,
    * tsSpread) — written once under java.io.tmpdir. */
  def snapshotDir(n: Long, versions: Int, regions: Int, gens: Int,
      tsSpread: Long = 0L): String =
    snapshotMemo.computeIfAbsent((n, versions, regions, gens, tsSpread), { _ =>
      val dir = Files.createTempDirectory("graft-sortedrun")
      writeSnapshot(dir, n, versions, regions, gens, tsSpread)
      dir.toString
    })

  /** Writes the fixture corpus as a sorted-run snapshot. Multi-version
    * semantics mirror [[FixtureEnvelopeStore]] exactly: key i holds
    * `1 + (i % versions)` versions at ts = CellTimestamp + v (payload
    * carries `"v":v` for v > 0); with versions == 1, ts spreads as
    * CellTimestamp + i % tsSpread over the version-0 cell. */
  def writeSnapshot(dir: Path, n: Long, versions: Int, regions: Int,
      gens: Int, tsSpread: Long = 0L,
      blockEntries: Int = SortedRunWriter.DefaultBlockEntries): Unit = {
    require(256 % regions == 0, s"regions must divide 256: $regions")
    val ks = Fixture.keyService
    val dek = ks.batchDataKey().plaintextDataKey
    val encKey = ks.encryptKey(Fixture.MasterKeyId, dek)
    val regionWidth = 256 / regions
    val buckets = Array.fill(regions, gens)(
      mutable.ArrayBuffer.empty[(Array[Byte], Long, String)])
    var i = 0L
    while (i < n) {
      val nv = if (versions > 1) 1 + (i % versions).toInt else 1
      var v = 0
      while (v < nv) {
        val c = Fixture.cell(i, dek, encKey, corrupt = false, v)
        val ts =
          if (versions > 1) c.ts
          else Fixture.CellTimestamp + (if (tsSpread > 0) i % tsSpread else 0L)
        val region = (c.hbase_id(0) & 0xff) / regionWidth
        val gen = (if (versions > 1) v else (i % gens).toInt) % gens
        buckets(region)(gen) += ((c.hbase_id, ts, c.value))
        v += 1
      }
      i += 1
    }
    val metas = for {
      r <- 0 until regions
      g <- 0 until gens
      if buckets(r)(g).nonEmpty
    } yield {
      val sorted = buckets(r)(g).sortWith { (a, b) =>
        val c = java.util.Arrays.compareUnsigned(a._1, b._1)
        if (c != 0) c < 0 else a._2 > b._2 // key ASC, ts DESC
      }
      SortedRunWriter.writeRun(dir, f"run-r$r%03d-g$g.srf", sorted.iterator,
        blockEntries)
    }
    SortedRunFormat.writeManifest(dir, metas)
  }
}
