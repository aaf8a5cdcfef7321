package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream, IOException, RandomAccessFile}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import java.util.concurrent.ConcurrentHashMap
import java.util.zip.{CRC32, GZIPInputStream, GZIPOutputStream}

import scala.collection.mutable

import graft.pipeline.Fixture

/** HBase HFile version 2 on-disk format — reader and fixture writer.
  *
  * This closes the one environmental seam the engine had left: the
  * reference scans a LIVE HBase cluster (batch/HBaseReader.kt:145-187),
  * and at 100 TB the right scan layer is the cluster's SNAPSHOT — the
  * HFiles themselves, read directly with no region-server load, no RPC
  * throttling, and stable input under task retry. The HFile v2 format
  * is public (HBase reference guide, Appendix E "HFile format"; HBase
  * source `io.hfile.FixedFileTrailer` / `HFileBlock` /
  * `HFileBlockIndex` document the exact byte layout), and READING a
  * block needs no HBase runtime — only this decoder.
  *
  * Byte layout implemented here (all integers big-endian):
  *
  * {{{
  *   file    = scanned-section load-on-open trailer
  *   scanned-section = datablock*
  *   load-on-open    = root-index-block fileinfo-block
  *
  *   block   = header[33] compressed-payload checksums
  *   header  = magic[8]                      // "DATABLK*" | "IDXROOT2" | "FILEINF2"
  *             onDiskSizeWithoutHeader:int   // payload + checksum bytes
  *             uncompressedSizeWithoutHeader:int
  *             prevBlockOffset:long          // previous block of same type
  *             checksumType:byte             // 0=NULL 1=CRC32 2=CRC32C
  *             bytesPerChecksum:int          // default 16384
  *             onDiskDataSizeWithHeader:int  // header + payload, NO checksums
  *   checksums = one CRC int per bytesPerChecksum chunk of
  *               (header + compressed-payload)
  *
  *   datablock payload = keyvalue*
  *   keyvalue = keyLen:int valLen:int key value
  *   key      = rowLen:short row famLen:byte family qualifier
  *              ts:long type:byte            // type 4 = Put
  *
  *   root-index payload = (blockOffset:long onDiskSize:int
  *                         vint-keyLen firstKey)*     // Hadoop vint
  *   fileinfo payload   = count:int (vint-len key vint-len value)*
  *
  *   trailer[212] = magic[8]="TRABLK\"$"
  *                  fileInfoOffset:long loadOnOpenDataOffset:long
  *                  dataIndexCount:int uncompressedDataIndexSize:long
  *                  metaIndexCount:int totalUncompressedBytes:long
  *                  entryCount:long compressionCodec:int  // 1=GZ 2=NONE
  *                  numDataIndexLevels:int
  *                  firstDataBlockOffset:long lastDataBlockOffset:long
  *                  comparatorClassName[128]              // fixed-size UTF
  *                  version:int   // major | minor<<24
  * }}}
  *
  * Scope, stated honestly: the subset a snapshot-export scan needs —
  * v2 trailers, single-level root indexes (`numDataIndexLevels == 1`),
  * DATABLK* decode with NONE/GZ compression and CRC32 checksum
  * verification, FileInfo first/last-key pruning. Round-trip-validated
  * against [[HFileV2Writer]] (which follows the same published
  * layout); multi-level indexes, encoded data blocks
  * (PREFIX/DIFF/FAST_DIFF), cell tags and the v3 protobuf trailer are
  * the remaining delta for files a live modern cluster writes, and
  * fail loudly here rather than misread. FileInfo that fails to parse
  * only disables pruning — the scan stays correct (seek + stop-at-
  * slice-end never depended on it).
  */
object HFileV2Format {

  val HeaderSize = 33
  val TrailerSize = 212
  val MaxComparatorLen = 128
  val DataMagic: Array[Byte] = "DATABLK*".getBytes(StandardCharsets.US_ASCII)
  val RootIndexMagic: Array[Byte] = "IDXROOT2".getBytes(StandardCharsets.US_ASCII)
  val FileInfoMagic: Array[Byte] = "FILEINF2".getBytes(StandardCharsets.US_ASCII)
  val TrailerMagic: Array[Byte] = "TRABLK\"$".getBytes(StandardCharsets.US_ASCII)
  /** HBase `Compression.Algorithm` ordinals: LZO=0, GZ=1, NONE=2. */
  val CodecGz = 1
  val CodecNone = 2
  /** HBase `ChecksumType` codes. */
  val ChecksumCrc32: Byte = 1
  val DefaultBytesPerChecksum = 16384
  val KeyTypePut: Byte = 4
  val Family: Array[Byte] = "cf".getBytes(StandardCharsets.US_ASCII)
  val Qualifier: Array[Byte] = "record".getBytes(StandardCharsets.US_ASCII)

  final case class Trailer(fileInfoOffset: Long, loadOnOpenDataOffset: Long,
      dataIndexCount: Int, metaIndexCount: Int, entryCount: Long,
      compressionCodec: Int, numDataIndexLevels: Int,
      firstDataBlockOffset: Long, lastDataBlockOffset: Long,
      majorVersion: Int, minorVersion: Int)

  final case class RootIndexEntry(offset: Long, onDiskSize: Int,
      firstKey: Array[Byte]) // the block's first cell KEY (not full KV)

  /** Load-on-open state of one HFile: trailer + root index + the
    * first/last keys used for slice pruning. */
  final case class HFileMeta(trailer: Trailer, index: Array[RootIndexEntry],
      firstRow: Array[Byte], lastRow: Option[Array[Byte]])

  /** FileInfo keys (mirroring HBase's reserved `hfile.` namespace). */
  val InfoLastKey = "hfile.LASTKEY"
  val InfoAvgKeyLen = "hfile.AVG_KEY_LEN"

  // ---------------------------------------------------------- vint
  /** Hadoop WritableUtils vlong: [-112,127] inline; else a length
    * byte (-113..-120 positive, -121..-128 negative) + big-endian
    * magnitude bytes. */
  def writeVLong(out: DataOutputStream, value: Long): Unit = {
    var i = value
    if (i >= -112 && i <= 127) { out.writeByte(i.toInt); return }
    var len = -112
    if (i < 0) { i ^= -1L; len = -120 }
    var tmp = i
    while (tmp != 0) { tmp >>= 8; len -= 1 }
    out.writeByte(len)
    val n = if (len < -120) -(len + 120) else -(len + 112)
    var idx = n
    while (idx != 0) {
      val shift = (idx - 1) * 8
      out.writeByte(((i & (0xffL << shift)) >> shift).toInt)
      idx -= 1
    }
  }

  def readVLong(in: DataInputStream): Long = {
    val first = in.readByte()
    if (first >= -112) return first.toLong
    val negative = first < -120
    val len = if (negative) -(first + 120) else -(first + 112)
    var i = 0L
    var k = 0
    while (k < len) { i = (i << 8) | (in.readByte() & 0xffL); k += 1 }
    if (negative) i ^ -1L else i
  }

  // ---------------------------------------------------------- key part
  /** Serializes a cell KEY part for `row` at `ts` (fixed cf:record
    * column, Put type) — the byte form both data blocks and index
    * entries carry. */
  def cellKey(row: Array[Byte], ts: Long): Array[Byte] = {
    val buf = new ByteArrayOutputStream()
    val out = new DataOutputStream(buf)
    out.writeShort(row.length)
    out.write(row)
    out.writeByte(Family.length)
    out.write(Family)
    out.write(Qualifier)
    out.writeLong(ts)
    out.writeByte(KeyTypePut)
    buf.toByteArray
  }

  /** Row bytes of a serialized key part. */
  def rowOf(key: Array[Byte]): Array[Byte] = {
    val rowLen = ((key(0) & 0xff) << 8) | (key(1) & 0xff)
    java.util.Arrays.copyOfRange(key, 2, 2 + rowLen)
  }

  // ---------------------------------------------------------- blocks
  /** Writes one block: header + (maybe-compressed) payload +
    * per-chunk CRC32 checksums over header + payload. Returns the
    * full on-disk size. */
  private[sources] def writeBlock(out: DataOutputStream, magic: Array[Byte],
      payload: Array[Byte], prevOffset: Long, codec: Int,
      bytesPerChecksum: Int = DefaultBytesPerChecksum): Int = {
    val onDisk =
      if (codec == CodecGz) {
        val b = new ByteArrayOutputStream()
        val gz = new GZIPOutputStream(b)
        gz.write(payload); gz.close()
        b.toByteArray
      } else payload
    val dataWithHeader = HeaderSize + onDisk.length
    val nChunks = (dataWithHeader + bytesPerChecksum - 1) / bytesPerChecksum
    val header = new ByteArrayOutputStream(HeaderSize)
    val h = new DataOutputStream(header)
    h.write(magic)
    h.writeInt(onDisk.length + nChunks * 4) // onDiskSizeWithoutHeader
    h.writeInt(payload.length) // uncompressedSizeWithoutHeader
    h.writeLong(prevOffset)
    h.writeByte(ChecksumCrc32)
    h.writeInt(bytesPerChecksum)
    h.writeInt(dataWithHeader) // onDiskDataSizeWithHeader
    val headerBytes = header.toByteArray
    out.write(headerBytes)
    out.write(onDisk)
    // checksums over header + payload, chunked
    val all = new Array[Byte](dataWithHeader)
    System.arraycopy(headerBytes, 0, all, 0, HeaderSize)
    System.arraycopy(onDisk, 0, all, HeaderSize, onDisk.length)
    var off = 0
    while (off < dataWithHeader) {
      val len = math.min(bytesPerChecksum, dataWithHeader - off)
      val crc = new CRC32()
      crc.update(all, off, len)
      out.writeInt(crc.getValue.toInt)
      off += len
    }
    HeaderSize + onDisk.length + nChunks * 4
  }

  /** Reads + verifies + decompresses the block at `offset`; returns
    * (payload bytes, full on-disk size). Checksum mismatch raises
    * IOException — a torn or corrupted block is never decoded. */
  private[sources] def readBlock(raf: RandomAccessFile, offset: Long,
      expectMagic: Array[Byte], codec: Int): (Array[Byte], Int) = {
    raf.seek(offset)
    val header = new Array[Byte](HeaderSize)
    raf.readFully(header)
    val in = new DataInputStream(new ByteArrayInputStream(header))
    val magic = new Array[Byte](8); in.readFully(magic)
    if (!java.util.Arrays.equals(magic, expectMagic))
      throw new IOException(s"bad block magic at $offset: " +
        new String(magic, StandardCharsets.US_ASCII))
    val onDiskSizeWithoutHeader = in.readInt()
    val uncompressedSize = in.readInt()
    in.readLong() // prevBlockOffset
    val checksumType = in.readByte()
    val bytesPerChecksum = in.readInt()
    val onDiskDataSizeWithHeader = in.readInt()
    val payloadLen = onDiskDataSizeWithHeader - HeaderSize
    val payload = new Array[Byte](payloadLen)
    raf.readFully(payload)
    val nChunks = (onDiskDataSizeWithHeader + bytesPerChecksum - 1) / bytesPerChecksum
    if (checksumType == ChecksumCrc32) {
      val sums = new Array[Byte](nChunks * 4)
      raf.readFully(sums)
      val sumIn = new DataInputStream(new ByteArrayInputStream(sums))
      val all = new Array[Byte](onDiskDataSizeWithHeader)
      System.arraycopy(header, 0, all, 0, HeaderSize)
      System.arraycopy(payload, 0, all, HeaderSize, payloadLen)
      var off = 0
      while (off < onDiskDataSizeWithHeader) {
        val len = math.min(bytesPerChecksum, onDiskDataSizeWithHeader - off)
        val crc = new CRC32()
        crc.update(all, off, len)
        val expect = sumIn.readInt()
        if (crc.getValue.toInt != expect)
          throw new IOException(
            s"checksum mismatch in block at $offset chunk at $off")
        off += len
      }
    }
    val data =
      if (codec == CodecGz) {
        val gz = new GZIPInputStream(new ByteArrayInputStream(payload))
        val b = gz.readAllBytes(); gz.close()
        require(b.length == uncompressedSize,
          s"decompressed ${b.length} != declared $uncompressedSize")
        b
      } else payload
    (data, HeaderSize + onDiskSizeWithoutHeader)
  }

  // ---------------------------------------------------------- trailer
  private[sources] def writeTrailer(out: DataOutputStream, t: Trailer,
      uncompressedDataIndexSize: Long, totalUncompressedBytes: Long,
      comparator: String): Unit = {
    out.write(TrailerMagic)
    out.writeLong(t.fileInfoOffset)
    out.writeLong(t.loadOnOpenDataOffset)
    out.writeInt(t.dataIndexCount)
    out.writeLong(uncompressedDataIndexSize)
    out.writeInt(t.metaIndexCount)
    out.writeLong(totalUncompressedBytes)
    out.writeLong(t.entryCount)
    out.writeInt(t.compressionCodec)
    out.writeInt(t.numDataIndexLevels)
    out.writeLong(t.firstDataBlockOffset)
    out.writeLong(t.lastDataBlockOffset)
    val cmp = comparator.getBytes(StandardCharsets.UTF_8)
    require(cmp.length <= MaxComparatorLen, "comparator name too long")
    out.write(cmp)
    out.write(new Array[Byte](MaxComparatorLen - cmp.length))
    out.writeInt((t.majorVersion & 0x00ffffff) | (t.minorVersion << 24))
  }

  def readTrailer(raf: RandomAccessFile): Trailer = {
    require(raf.length() >= TrailerSize, "file shorter than an HFile trailer")
    raf.seek(raf.length() - TrailerSize)
    val bytes = new Array[Byte](TrailerSize)
    raf.readFully(bytes)
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val magic = new Array[Byte](8); in.readFully(magic)
    if (!java.util.Arrays.equals(magic, TrailerMagic))
      throw new IOException("not an HFile v2: bad trailer magic")
    val fileInfoOffset = in.readLong()
    val loadOnOpen = in.readLong()
    val dataIndexCount = in.readInt()
    in.readLong() // uncompressedDataIndexSize
    val metaIndexCount = in.readInt()
    in.readLong() // totalUncompressedBytes
    val entryCount = in.readLong()
    val codec = in.readInt()
    val levels = in.readInt()
    val firstData = in.readLong()
    val lastData = in.readLong()
    in.skipBytes(MaxComparatorLen)
    val version = in.readInt()
    val major = version & 0x00ffffff
    val minor = version >>> 24
    if (major != 2)
      throw new IOException(s"unsupported HFile major version $major " +
        "(v3 adds a protobuf trailer; this reader targets v2)")
    Trailer(fileInfoOffset, loadOnOpen, dataIndexCount, metaIndexCount,
      entryCount, codec, levels, firstData, lastData, major, minor)
  }

  // ------------------------------------------------------- load-on-open
  private val metaMemo = new ConcurrentHashMap[String, HFileMeta]()
  /** Files opened for scanning — observability for the pruning spec. */
  private[sources] val opens = new java.util.concurrent.atomic.AtomicInteger

  /** Trailer + root index + pruning keys, read once per JVM per file
    * (the block-cache / broadcast analogue — same policy as
    * [[SortedRunFormat.readBlockIndex]]). */
  def readMeta(path: String): HFileMeta =
    metaMemo.computeIfAbsent(path, { p =>
      val raf = new RandomAccessFile(p, "r")
      try {
        val t = readTrailer(raf)
        if (t.numDataIndexLevels != 1)
          throw new IOException(
            s"multi-level data index (${t.numDataIndexLevels}) not supported")
        val (indexPayload, idxSize) =
          readBlock(raf, t.loadOnOpenDataOffset, RootIndexMagic, t.compressionCodec)
        val in = new DataInputStream(new ByteArrayInputStream(indexPayload))
        val entries = Array.fill(t.dataIndexCount) {
          val off = in.readLong()
          val size = in.readInt()
          val kl = readVLong(in).toInt
          val k = new Array[Byte](kl); in.readFully(k)
          RootIndexEntry(off, size, k)
        }
        require(entries.nonEmpty, s"empty HFile: $p")
        val lastRow =
          try {
            val (infoPayload, _) =
              readBlock(raf, t.fileInfoOffset, FileInfoMagic, t.compressionCodec)
            val fin = new DataInputStream(new ByteArrayInputStream(infoPayload))
            val n = fin.readInt()
            val m = (0 until n).map { _ =>
              val kl = readVLong(fin).toInt
              val k = new Array[Byte](kl); fin.readFully(k)
              val vl = readVLong(fin).toInt
              val v = new Array[Byte](vl); fin.readFully(v)
              new String(k, StandardCharsets.UTF_8) -> v
            }.toMap
            m.get(InfoLastKey).map(rowOf)
          } catch {
            // unparseable FileInfo (foreign writer) only disables
            // pruning; the scan itself never depends on it
            case _: Exception => None
          }
        val _ = idxSize
        HFileMeta(t, entries, rowOf(entries.head.firstKey), lastRow)
      } finally raf.close()
    })

  /** Greatest index entry whose first ROW is <= target, or 0. */
  def seekBlock(index: Array[RootIndexEntry], targetRow: Array[Byte]): Int = {
    var lo = 0; var hi = index.length - 1; var best = 0
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      if (java.util.Arrays.compareUnsigned(rowOf(index(mid).firstKey), targetRow) <= 0) {
        best = mid; lo = mid + 1
      } else hi = mid - 1
    }
    best
  }
}

/** Writes HFile v2 files. FIXTURE/TEST seam with the same role as
  * [[SortedRunWriter]]: production never writes HFiles (HBase does);
  * this writer exists so the READER — the production-relevant half —
  * is exercised against files laid out exactly per the published
  * format, including compression, checksums, index and trailer. */
object HFileV2Writer {

  import HFileV2Format._

  val DefaultBlockEntries = 64

  /** Writes one HFile from cells ALREADY sorted (row unsigned ASC,
    * ts DESC); returns the file's entry count. */
  def writeHFile(path: Path, cells: Iterator[(Array[Byte], Long, Array[Byte])],
      codec: Int = CodecNone, blockEntries: Int = DefaultBlockEntries,
      bytesPerChecksum: Int = DefaultBytesPerChecksum): Long = {
    val fileBuf = new ByteArrayOutputStream()
    val out = new DataOutputStream(fileBuf)
    var offset = 0L
    var prevData = -1L
    var firstDataOffset = -1L
    var lastDataOffset = -1L
    val index = mutable.ArrayBuffer.empty[RootIndexEntry]
    var entryCount = 0L
    var totalUncompressed = 0L
    var lastKey: Array[Byte] = null

    val block = new ByteArrayOutputStream()
    val blockOut = new DataOutputStream(block)
    var blockFirstKey: Array[Byte] = null
    var inBlock = 0

    def flushBlock(): Unit = if (inBlock > 0) {
      if (firstDataOffset < 0) firstDataOffset = offset
      lastDataOffset = offset
      val payload = block.toByteArray
      totalUncompressed += payload.length
      val size = writeBlock(out, DataMagic, payload, prevData, codec,
        bytesPerChecksum)
      index += RootIndexEntry(offset, size, blockFirstKey)
      prevData = offset
      offset += size
      block.reset(); inBlock = 0; blockFirstKey = null
    }

    cells.foreach { case (row, ts, value) =>
      val key = cellKey(row, ts)
      blockOut.writeInt(key.length)
      blockOut.writeInt(value.length)
      blockOut.write(key)
      blockOut.write(value)
      if (blockFirstKey == null) blockFirstKey = key
      lastKey = key
      inBlock += 1; entryCount += 1
      if (inBlock >= blockEntries) flushBlock()
    }
    flushBlock()
    require(entryCount > 0, "refusing to write an empty HFile")

    // load-on-open: root index then file info
    val loadOnOpenOffset = offset
    val idxBuf = new ByteArrayOutputStream()
    val idxOut = new DataOutputStream(idxBuf)
    index.foreach { e =>
      idxOut.writeLong(e.offset)
      idxOut.writeInt(e.onDiskSize)
      writeVLong(idxOut, e.firstKey.length)
      idxOut.write(e.firstKey)
    }
    val idxPayload = idxBuf.toByteArray
    offset += writeBlock(out, RootIndexMagic, idxPayload, -1L, codec,
      bytesPerChecksum)

    val fileInfoOffset = offset
    val infoBuf = new ByteArrayOutputStream()
    val infoOut = new DataOutputStream(infoBuf)
    val infoEntries = Seq(
      InfoLastKey -> lastKey,
      InfoAvgKeyLen -> { val b = new ByteArrayOutputStream()
        new DataOutputStream(b).writeInt(lastKey.length); b.toByteArray })
    infoOut.writeInt(infoEntries.size)
    infoEntries.foreach { case (k, v) =>
      val kb = k.getBytes(StandardCharsets.UTF_8)
      writeVLong(infoOut, kb.length); infoOut.write(kb)
      writeVLong(infoOut, v.length); infoOut.write(v)
    }
    offset += writeBlock(out, FileInfoMagic, infoBuf.toByteArray, -1L, codec,
      bytesPerChecksum)

    writeTrailer(out, Trailer(fileInfoOffset, loadOnOpenOffset,
      index.size, 0, entryCount, codec, 1, firstDataOffset, lastDataOffset,
      2, 3), idxPayload.length.toLong, totalUncompressed,
      "org.apache.hadoop.hbase.KeyValue$KVComparator")

    // atomic publication, same rationale as SnapshotWriter.atomicWrite
    val tmp = Files.createTempFile(path.getParent, "." + path.getFileName, ".tmp")
    try {
      Files.write(tmp, fileBuf.toByteArray)
      Files.move(tmp, path, java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    } finally Files.deleteIfExists(tmp)
    entryCount
  }
}

/** [[EnvelopeStore]] over a directory of HFile v2 files — the real
  * form of the 5-step snapshot-scan contract (the production plan the
  * former sketch documented, now exercised code):
  *
  *  1. resolve: every `*.hfile` in the snapshot dir, PRUNED to those
  *     whose [firstRow, lastRow] byte range overlaps the slice
  *     (first/last keys from load-on-open state, memoised per JVM —
  *     the manifest-broadcast analogue);
  *  2. seek: each file's root block index is binary-searched to the
  *     last block whose first row <= the slice start
  *     ([[HFileV2Format.seekBlock]]), decode-forward from there;
  *  3. heap-merge of the per-file scanners in (row ASC, ts DESC,
  *     generation DESC) order — overlapping files are an HBase
  *     region's un-compacted generations; ties on (row, ts) resolve
  *     to the newer file like HBase's sequence-id rule — keeping only
  *     the latest in-range version per row; the ts range is applied
  *     AT THE DECODER, so out-of-range cells never materialize their
  *     value;
  *  4. stop-at-slice-end: scanning ends at the first row whose first
  *     unsigned byte reaches the slice stop;
  *  5. block checksums verify on every read — a torn or bit-flipped
  *     block raises, it never decodes silently (the trait's retry
  *     contract then reruns the task attempt cleanly).
  */
final case class HFileSnapshotStore(dir: String,
    failAfterEntries: Option[Int] = None) extends EnvelopeStore {

  import HFileV2Format._

  override def scan(slice: KeySlice, ts: TsRange): Iterator[EnvelopeCell] = {
    val lo = slice.index * slice.width
    val hi = (slice.index + 1) * slice.width
    val files = Files.list(Paths.get(dir)).iterator()
    val names = mutable.ArrayBuffer.empty[String]
    while (files.hasNext) {
      val p = files.next()
      if (p.getFileName.toString.endsWith(".hfile")) names += p.toString
    }
    val pruned = names.sorted.zipWithIndex.filter { case (p, _) =>
      val m = readMeta(p)
      val firstB = m.firstRow(0) & 0xff
      val lastB = m.lastRow.map(r => r(0) & 0xff)
      firstB < hi && lastB.forall(_ >= lo)
    }
    val scanners = pruned.map { case (p, ord) =>
      new HFileScanner(p, lo, hi, ts, ord, failAfterEntries)
    }.filter(_.hasNext)

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
    val pq = mutable.PriorityQueue(scanners.toSeq: _*)(ord)

    new Iterator[EnvelopeCell] {
      private var lastKey: Array[Byte] = _
      private var nextCell: EnvelopeCell = _

      private def advance(): Unit = {
        while (nextCell == null && pq.nonEmpty) {
          val s = pq.dequeue()
          val e = s.next()
          if (s.hasNext) pq.enqueue(s)
          if (lastKey == null || !java.util.Arrays.equals(lastKey, e.key)) {
            lastKey = e.key
            nextCell = EnvelopeCell(e.key, e.ts,
              new String(e.value, StandardCharsets.UTF_8))
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

private[sources] final case class HFileEntry(key: Array[Byte], ts: Long,
    value: Array[Byte])

/** Sequential KeyValue scanner over one HFile, seeked to a slice
  * start: decodes blocks in file order (verifying each checksum),
  * skips pre-slice rows, drops out-of-ts-range cells without
  * materializing values, and ends at the slice stop byte. Survives one
  * (injected or real) IOException per `reopensLeft` by reopening the
  * file and reseeking to strictly past the last entry it returned —
  * the same within-attempt reopen-at-key contract [[RunScanner]]
  * implements (the reference's resume-at-key, HBaseReader.kt:62-90). */
private[sources] final class HFileScanner(path: String, loByte: Int,
    hiByte: Int, range: TsRange, val ordinal: Int,
    failAfter: Option[Int] = None)
    extends Iterator[HFileEntry] {

  import HFileV2Format._

  private val meta = readMeta(path)
  private val seekRow = Array[Byte]((loByte & 0xff).toByte)
  private var raf: RandomAccessFile = _
  private var blockIdx = 0
  private var in: DataInputStream = _
  private var exhausted = false
  private var nextE: HFileEntry = _
  private var lastRow: Array[Byte] = _
  private var lastTs = 0L
  private var decoded = 0
  private var faultFired = false
  private var reopensLeft = 2

  open()

  /** (Re)open the file positioned at the seek block for either the
    * slice start (fresh scan) or the last returned row (retry). */
  private def open(): Unit = {
    HFileV2Format.opens.incrementAndGet()
    raf = new RandomAccessFile(path, "r")
    blockIdx = seekBlock(meta.index, if (lastRow == null) seekRow else lastRow)
    in = null
  }

  /** An entry at (row, ts) is not-yet-returned iff it sorts strictly
    * after the resume point in (row ASC, ts DESC) file order. Skipped
    * (pre-seek / out-of-range) entries re-skip deterministically on
    * replay, so the predicate only needs the last RETURNED entry. */
  private def behindResumePoint(row: Array[Byte], ts: Long): Boolean =
    if (lastRow == null) java.util.Arrays.compareUnsigned(row, seekRow) < 0
    else {
      val c = java.util.Arrays.compareUnsigned(row, lastRow)
      c < 0 || (c == 0 && ts >= lastTs)
    }

  private def close(): Unit = {
    exhausted = true
    try if (raf != null) raf.close() catch { case _: IOException => }
  }

  /** Decode forward to the next emittable entry; null = end of slice
    * or file. Throws IOException on faults (incl. injected). */
  private def decodeNext(): HFileEntry = {
    while (true) {
      if (in == null || in.available() == 0) {
        if (blockIdx >= meta.index.length) return null
        val (payload, _) = readBlock(raf, meta.index(blockIdx).offset,
          DataMagic, meta.trailer.compressionCodec)
        in = new DataInputStream(new ByteArrayInputStream(payload))
        blockIdx += 1
      }
      decoded += 1
      if (!faultFired && failAfter.exists(decoded >= _)) {
        faultFired = true
        throw new IOException(s"injected fault after $decoded entries")
      }
      val keyLen = in.readInt()
      val valLen = in.readInt()
      val key = new Array[Byte](keyLen)
      in.readFully(key)
      val row = rowOf(key)
      if ((row(0) & 0xff) >= hiByte) return null // stop-at-slice-end
      val ts = java.nio.ByteBuffer.wrap(key, keyLen - 9, 8).getLong
      if (behindResumePoint(row, ts) || !range.contains(ts)) {
        // pre-seek row, already-returned entry on a reopen, or
        // out-of-range version: never materialize the value
        in.skipBytes(valLen)
      } else {
        val value = new Array[Byte](valLen)
        in.readFully(value)
        return HFileEntry(row, ts, value)
      }
    }
    null // unreachable
  }

  private def advanceWithRetry(): HFileEntry = {
    while (true) {
      try return decodeNext()
      catch {
        case e: IOException =>
          if (reopensLeft == 0) throw e
          reopensLeft -= 1
          try if (raf != null) raf.close() catch { case _: IOException => }
          open()
      }
    }
    null // unreachable
  }

  def head: HFileEntry = {
    if (!hasNext) throw new NoSuchElementException
    nextE
  }

  override def hasNext: Boolean = {
    if (nextE == null && !exhausted) {
      nextE = advanceWithRetry()
      if (nextE == null) close()
      else { lastRow = nextE.key; lastTs = nextE.ts }
    }
    nextE != null
  }

  override def next(): HFileEntry = {
    val e = head
    nextE = null
    e
  }
}

/** Deterministic HFile-snapshot fixtures over the SAME corpus the
  * other stores generate — region r of `regions` holds first-row-byte
  * range [r·256/regions, (r+1)·256/regions), a key's versions spread
  * across the region's `gens` generation files (single-version corpora
  * spread keys instead), so a scan must both prune files by slice AND
  * heap-merge overlapping generations, exactly like
  * [[SortedRunFixture]]. */
object HFileFixture {

  private val snapshotMemo =
    new ConcurrentHashMap[(Long, Int, Int, Int, Long, Int), String]()

  /** Memoised per-JVM snapshot dir for (n, versions, regions, gens,
    * tsSpread, codec) — written once under java.io.tmpdir. */
  def snapshotDir(n: Long, versions: Int, regions: Int, gens: Int,
      tsSpread: Long = 0L, codec: Int = HFileV2Format.CodecGz): String =
    snapshotMemo.computeIfAbsent((n, versions, regions, gens, tsSpread, codec), { _ =>
      val dir = Files.createTempDirectory("graft-hfile")
      writeSnapshot(dir, n, versions, regions, gens, tsSpread, codec)
      dir.toString
    })

  def writeSnapshot(dir: Path, n: Long, versions: Int, regions: Int,
      gens: Int, tsSpread: Long = 0L, codec: Int = HFileV2Format.CodecGz,
      blockEntries: Int = HFileV2Writer.DefaultBlockEntries): Unit = {
    require(256 % regions == 0, s"regions must divide 256: $regions")
    val ks = Fixture.keyService
    val dek = ks.batchDataKey().plaintextDataKey
    val encKey = ks.encryptKey(Fixture.MasterKeyId, dek)
    val regionWidth = 256 / regions
    val buckets = Array.fill(regions, gens)(
      mutable.ArrayBuffer.empty[(Array[Byte], Long, Array[Byte])])
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
        buckets(region)(gen) += ((c.hbase_id, ts,
          c.value.getBytes(StandardCharsets.UTF_8)))
        v += 1
      }
      i += 1
    }
    for {
      r <- 0 until regions
      g <- 0 until gens
      if buckets(r)(g).nonEmpty
    } {
      val sorted = buckets(r)(g).sortWith { (a, b) =>
        val c = java.util.Arrays.compareUnsigned(a._1, b._1)
        if (c != 0) c < 0 else a._2 > b._2 // row ASC, ts DESC
      }
      HFileV2Writer.writeHFile(dir.resolve(f"region-r$r%03d-g$g.hfile"),
        sorted.iterator, codec, blockEntries)
    }
  }
}
