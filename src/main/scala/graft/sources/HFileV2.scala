package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream, IOException, RandomAccessFile}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import java.util.concurrent.ConcurrentHashMap
import java.util.zip.{CRC32, GZIPInputStream, GZIPOutputStream}

import scala.collection.mutable

import graft.pipeline.Fixture

/** HBase HFile version 2/3 on-disk format — reader and fixture writer.
  *
  * This closes the one environmental seam the engine had left: the
  * reference scans a LIVE HBase cluster (batch/HBaseReader.kt:145-187),
  * and at 100 TB the right scan layer is the cluster's SNAPSHOT — the
  * HFiles themselves, read directly with no region-server load, no RPC
  * throttling, and stable input under task retry. The HFile format is
  * public (HBase reference guide, Appendix E "HFile format"; HBase
  * source `io.hfile.FixedFileTrailer` / `HFileBlock` /
  * `HFileBlockIndex` / `io.encoding.FastDiffDeltaEncoder` document the
  * exact byte layout), and READING a block needs no HBase runtime —
  * only this decoder.
  *
  * Byte layout implemented here (all integers big-endian):
  *
  * {{{
  *   file    = scanned-section load-on-open trailer
  *   scanned-section = (datablock | leaf-index | intermediate-index)*
  *   load-on-open    = root-index-block fileinfo-block
  *
  *   block   = header[33] compressed-payload checksums
  *   header  = magic[8]       // "DATABLK*" | "DATABLKE" | "IDXROOT2"
  *                            // | "IDXLEAF2" | "IDXINTE2" | "FILEINF2"
  *             onDiskSizeWithoutHeader:int   // payload + checksum bytes
  *             uncompressedSizeWithoutHeader:int
  *             prevBlockOffset:long          // previous block of same type
  *             checksumType:byte             // 0=NULL 1=CRC32 2=CRC32C
  *             bytesPerChecksum:int          // default 16384
  *             onDiskDataSizeWithHeader:int  // header + payload, NO checksums
  *   checksums = one CRC int per bytesPerChecksum chunk of
  *               (header + compressed-payload)
  *
  *   datablock (DATABLK*) payload = keyvalue*
  *   keyvalue = keyLen:int valLen:int key value
  *              [tagsLen:short tags]?        // iff FileInfo MAX_TAGS_LEN
  *              [mvcc:vlong]?                // iff FileInfo MAX_MEMSTORE_TS_KEY
  *   key      = rowLen:short row famLen:byte family qualifier
  *              ts:long type:byte            // 4=Put, 8=Delete,
  *                                           // 10=DeleteFamilyVersion,
  *                                           // 12=DeleteColumn,
  *                                           // 14=DeleteFamily
  *
  *   encoded datablock (DATABLKE) payload =
  *       encodingId:short                    // FAST_DIFF = 4
  *       fastdiff-cell*                      // FastDiffDeltaEncoder layout:
  *   fastdiff-cell =
  *       flag:byte              // bits 0-2 ts-common-prefix-len,
  *                              // 8 SAME_KEY_LENGTH, 16 SAME_VALUE_LENGTH,
  *                              // 32 SAME_TYPE, 64 SAME_VALUE
  *       [keyLen:cint]?         // iff !SAME_KEY_LENGTH   (7-bit LEB128)
  *       [valLen:cint]?         // iff !SAME_VALUE_LENGTH
  *       commonPrefix:cint      // byte-common prefix with prev key (no ts/type)
  *       key-delta              // first cell: full flat key; else row suffix
  *                              // (family never repeated) + qualifier suffix
  *       ts-suffix              // 8 - ts-common-prefix bytes
  *       [type:byte]?           // iff !SAME_TYPE
  *       [value]?               // iff !SAME_VALUE
  *       [tagsLen:cint tags]?   // iff FileInfo MAX_TAGS_LEN
  *       [mvcc:vlong]?          // iff FileInfo MAX_MEMSTORE_TS_KEY
  *
  *   root-index payload = (blockOffset:long onDiskSize:int
  *                         vint-keyLen firstKey)*     // Hadoop vint
  *                        midkey-metadata?            // iff numLevels > 1:
  *                                                    // long,int,int — ignored on read
  *   non-root-index payload = numEntries:int
  *                            entryOffset:int[numEntries+1] // relative, last=total
  *                            (blockOffset:long onDiskSize:int key)*
  *   fileinfo payload   = "PBUF" delimited-FileInfoProto       // modern
  *                      | count:int (vint-len key vint-len value)*  // legacy
  *
  *   v2 trailer[212]  = magic[8]="TRABLK\"$" fixed fields (see writeTrailer)
  *                      version:int           // major | minor<<24
  *   v3 trailer[4096] = magic[8] delimited-FileTrailerProto zero-pad
  *                      version:int           // major=3
  * }}}
  *
  * Scope: everything a modern cluster writes by default — v2 fixed and
  * v3 protobuf trailers, single- AND multi-level data block indexes,
  * unencoded and FAST_DIFF-encoded data blocks, per-cell tags and
  * memstore-mvcc trailers, NONE/GZ/SNAPPY/LZ4 compression (the latter
  * two in Hadoop's BlockCompressorStream framing over the raw-block
  * codecs Spark already ships) with per-chunk CRC32 verification,
  * PBUF and legacy FileInfo, LASTKEY pruning, MAX_SEQ_ID generation
  * ordering, all four delete-marker scopes (masking applied in
  * [[HFileSnapshotStore]]'s merge), and general ROW bloom filters
  * (CompoundBloomFilter v3: murmur double-hashing, chunked bit arrays
  * in the scanned section, chunk directory + meta in load-on-open —
  * consulted by [[HFileSnapshotStore.multiGet]]'s point probes, with
  * full-index fallback for bloomless files). Remaining deltas fail loudly
  * rather than misread: PREFIX/DIFF/ROW_INDEX_V1 block encodings,
  * LZO/BZIP2 codecs, and AES-encrypted files (trailer
  * `encryption_key`). FileInfo that fails to parse only disables
  * pruning and the tags/mvcc cell trailers — the scan itself stays
  * correct for files without them.
  */
object HFileV2Format {

  val HeaderSize = 33
  val TrailerSize = 212
  val TrailerSizeV3 = 4096
  val MaxComparatorLen = 128
  val DataMagic: Array[Byte] = "DATABLK*".getBytes(StandardCharsets.US_ASCII)
  val EncodedDataMagic: Array[Byte] = "DATABLKE".getBytes(StandardCharsets.US_ASCII)
  val RootIndexMagic: Array[Byte] = "IDXROOT2".getBytes(StandardCharsets.US_ASCII)
  val LeafIndexMagic: Array[Byte] = "IDXLEAF2".getBytes(StandardCharsets.US_ASCII)
  val IntermediateIndexMagic: Array[Byte] = "IDXINTE2".getBytes(StandardCharsets.US_ASCII)
  val FileInfoMagic: Array[Byte] = "FILEINF2".getBytes(StandardCharsets.US_ASCII)
  /** Bloom-filter block magics (HFileBlock.BlockType BLOOM_CHUNK /
    * GENERAL_BLOOM_META / DELETE_FAMILY_BLOOM_META): chunk blocks live
    * in the scanned section, the meta block in load-on-open after
    * FileInfo ("additional load-on-open data", HFileWriterImpl.close). */
  val BloomChunkMagic: Array[Byte] = "BLMFBLK2".getBytes(StandardCharsets.US_ASCII)
  val BloomMetaMagic: Array[Byte] = "BLMFMET2".getBytes(StandardCharsets.US_ASCII)
  val DeleteFamilyBloomMetaMagic: Array[Byte] = "DFBLMET2".getBytes(StandardCharsets.US_ASCII)
  val TrailerMagic: Array[Byte] = "TRABLK\"$".getBytes(StandardCharsets.US_ASCII)
  val PbufMagic: Array[Byte] = "PBUF".getBytes(StandardCharsets.US_ASCII)
  /** HBase `Compression.Algorithm` ordinals: LZO=0, GZ=1, NONE=2,
    * SNAPPY=3, LZ4=4, BZIP2=5, ZSTD=6. SNAPPY (the legacy production
    * default), LZ4, and ZSTD (the modern default — hbase-compression-
    * zstd) ride the same jars Spark itself ships (snappy-java /
    * lz4-java / zstd-jni) inside Hadoop's `BlockCompressorStream`
    * framing — see [[hadoopBlockCompress]]. */
  val CodecGz = 1
  val CodecNone = 2
  val CodecSnappy = 3
  val CodecLz4 = 4
  val CodecZstd = 6
  /** HBase `DataBlockEncoding` ids: NONE=0, PREFIX=2, DIFF=3, FAST_DIFF=4. */
  val EncodingNone = 0
  val EncodingFastDiff = 4
  /** HBase `ChecksumType` codes. */
  val ChecksumCrc32: Byte = 1
  val DefaultBytesPerChecksum = 16384
  /** HBase `KeyValue.Type` codes. The four delete codes are the
    * tombstone SCOPES a real between-compactions snapshot contains
    * (HBase ref guide §26.4 "Delete"): Delete masks one column at
    * exactly its ts; DeleteFamilyVersion masks every column of the
    * family at exactly its ts; DeleteColumn masks one column at
    * ts <= its ts; DeleteFamily masks the whole family at ts <= its
    * ts. The region server applies these for the reference's live
    * scan (batch/HBaseReader.kt:145-187); [[HFileSnapshotStore]]
    * applies them in its heap-merge. */
  val KeyTypePut: Byte = 4
  val KeyTypeDelete: Byte = 8
  val KeyTypeDeleteFamilyVersion: Byte = 10
  val KeyTypeDeleteColumn: Byte = 12
  val KeyTypeDeleteFamily: Byte = 14

  /** PrivateCellUtil.isDelete: every code in [Delete, DeleteFamily]. */
  def isDelete(typ: Byte): Boolean =
    typ >= KeyTypeDelete && typ <= KeyTypeDeleteFamily

  val Family: Array[Byte] = "cf".getBytes(StandardCharsets.US_ASCII)
  val Qualifier: Array[Byte] = "record".getBytes(StandardCharsets.US_ASCII)
  /** DeleteFamily markers carry an EMPTY qualifier — they sort before
    * every real column of their row (KeyValue.createFirstDeleteFamily). */
  val EmptyQualifier: Array[Byte] = Array.emptyByteArray

  val RowLengthSize = 2
  val TimestampSize = 8
  val TsTypeSize = 9

  /** FastDiffDeltaEncoder flag bits. */
  val FlagMaskTimestampLength = 0x07
  val FlagSameKeyLength = 1 << 3
  val FlagSameValueLength = 1 << 4
  val FlagSameType = 1 << 5
  val FlagSameValue = 1 << 6

  final case class Trailer(fileInfoOffset: Long, loadOnOpenDataOffset: Long,
      dataIndexCount: Int, metaIndexCount: Int, entryCount: Long,
      compressionCodec: Int, numDataIndexLevels: Int,
      firstDataBlockOffset: Long, lastDataBlockOffset: Long,
      majorVersion: Int, minorVersion: Int)

  final case class RootIndexEntry(offset: Long, onDiskSize: Int,
      firstKey: Array[Byte]) // the subtree's first cell KEY (not full KV)

  /** Parsed GENERAL_BLOOM_META: a CompoundBloomFilter (version 3) —
    * one hashCount/hashType pair shared by every chunk, plus a
    * root-index-format directory of the on-disk bloom chunk blocks
    * keyed by each chunk's first bloom key (the ROW bytes for a ROW
    * bloom). A point probe binary-searches the directory, reads ONE
    * chunk block, and tests `hashCount` bits. */
  final case class BloomMeta(hashCount: Int, hashType: Int,
      totalKeyCount: Long, index: Array[RootIndexEntry])

  /** Load-on-open state of one HFile: trailer + root index + the
    * first/last keys used for slice pruning + the FileInfo flags that
    * change per-cell decoding (tags / mvcc trailers) + the general
    * ROW bloom when the writer recorded one. */
  final case class HFileMeta(trailer: Trailer, index: Array[RootIndexEntry],
      firstRow: Array[Byte], lastRow: Option[Array[Byte]],
      includesTags: Boolean, includesMvcc: Boolean,
      maxSeqId: Option[Long] = None,
      bloom: Option[BloomMeta] = None)

  /** FileInfo keys (HBase's reserved `hfile.` namespace, HFileInfo). */
  val InfoLastKey = "hfile.LASTKEY"
  val InfoAvgKeyLen = "hfile.AVG_KEY_LEN"
  val InfoMaxMemstoreTs = "hfile.MAX_MEMSTORE_TS_KEY"
  val InfoMaxTagsLen = "hfile.MAX_TAGS_LEN"
  /** Written by HFileDataBlockEncoderImpl (no reserved prefix). */
  val InfoDataBlockEncoding = "DATA_BLOCK_ENCODING"
  /** Written by StoreFileWriter.appendMetadata (HStoreFile
    * MAX_SEQ_ID_KEY — no reserved prefix): the store file's maximum
    * memstore sequence id. THE generation-order authority on a real
    * snapshot — store-file names there are random hashes, so "newer
    * file name" means nothing; the scan and compaction tie-breaks
    * order generations by this value. */
  val InfoMaxSeqId = "MAX_SEQ_ID_KEY"
  /** Written by StoreFileWriter (BLOOM_FILTER_TYPE_KEY — no reserved
    * prefix): which cell fragment the general bloom keys on. Only ROW
    * is implemented (the modern default; ROWCOL blooms are rarely
    * enabled because flush-per-column cardinality inflates them). */
  val InfoBloomFilterType = "BLOOM_FILTER_TYPE"

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

  // ------------------------------------------------- compressed int
  /** HBase ByteBufferUtils compressed int: 7-bit LEB128, low group
    * first, 0x80 continuation — the integer form every block ENCODER
    * uses (distinct from Hadoop's vint above, which index blocks and
    * legacy FileInfo use). */
  def putCompressedInt(out: DataOutputStream, value: Int): Unit = {
    var v = value
    var continue = true
    while (continue) {
      var b = v & 0x7f
      v = v >>> 7
      if (v != 0) b |= 0x80
      out.writeByte(b)
      continue = v != 0
    }
  }

  def readCompressedInt(in: DataInputStream): Int = {
    var result = 0
    var i = 0
    var b = 0
    do {
      b = in.readByte() & 0xff
      result += (b & 0x7f) << (7 * i)
      i += 1
    } while ((b & 0x80) != 0)
    result
  }

  // ----------------------------------------------- block codecs
  /** Hadoop `BlockCompressorStream` framing — the on-disk form HBase's
    * SNAPPY and LZ4 block compression actually writes (hadoop-common
    * `io.compress.BlockCompressorStream` / `BlockDecompressorStream`):
    * a sequence of groups, each `[uncompressedGroupLen:int]` followed
    * by one or more `[compressedChunkLen:int][raw-codec chunk]` until
    * the group's uncompressed bytes are produced. The chunks are RAW
    * codec blocks (xerial snappy-java / jpountz lz4-java — the same
    * jars Spark ships), no frame headers. Group size mirrors the
    * codecs' default 64 KiB buffer. */
  val HadoopCompressionGroup = 64 * 1024

  private[sources] def hadoopBlockCompress(payload: Array[Byte],
      chunkCompress: Array[Byte] => Array[Byte]): Array[Byte] = {
    val buf = new ByteArrayOutputStream()
    val out = new DataOutputStream(buf)
    var off = 0
    if (payload.length == 0) {
      out.writeInt(0)
    } else while (off < payload.length) {
      val len = math.min(HadoopCompressionGroup, payload.length - off)
      val chunk = chunkCompress(
        java.util.Arrays.copyOfRange(payload, off, off + len))
      out.writeInt(len)
      out.writeInt(chunk.length)
      out.write(chunk)
      off += len
    }
    buf.toByteArray
  }

  /** Inverse of [[hadoopBlockCompress]], tolerating multiple chunks
    * per group (a real Hadoop compressor may split a group).
    * `chunkDecompress(chunk, maxLen)` returns the chunk's uncompressed
    * bytes (at most `maxLen`). */
  private[sources] def hadoopBlockDecompress(payload: Array[Byte],
      uncompressedSize: Int,
      chunkDecompress: (Array[Byte], Int) => Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(uncompressedSize)
    val in = new DataInputStream(new ByteArrayInputStream(payload))
    while (out.size() < uncompressedSize) {
      val groupLen = in.readInt()
      var produced = 0
      while (produced < groupLen) {
        val chunkLen = in.readInt()
        val chunk = new Array[Byte](chunkLen)
        in.readFully(chunk)
        val plain = chunkDecompress(chunk, groupLen - produced)
        out.write(plain)
        produced += plain.length
      }
    }
    out.toByteArray
  }

  private def lz4Factory = net.jpountz.lz4.LZ4Factory.fastestInstance()

  /** Compresses a block payload per the codec ordinal. */
  private[sources] def compressPayload(codec: Int, payload: Array[Byte]): Array[Byte] =
    codec match {
      case CodecNone => payload
      case CodecGz =>
        val b = new ByteArrayOutputStream()
        val gz = new GZIPOutputStream(b)
        gz.write(payload); gz.close()
        b.toByteArray
      case CodecSnappy =>
        hadoopBlockCompress(payload, org.xerial.snappy.Snappy.compress)
      case CodecLz4 =>
        val comp = lz4Factory.fastCompressor()
        hadoopBlockCompress(payload, c => comp.compress(c))
      case CodecZstd =>
        hadoopBlockCompress(payload, com.github.luben.zstd.Zstd.compress)
      case c => throw new IOException(s"unsupported compression codec ordinal $c")
    }

  /** Decompresses a block payload per the codec ordinal, verifying the
    * declared uncompressed size. */
  private[sources] def decompressPayload(codec: Int, payload: Array[Byte],
      uncompressedSize: Int): Array[Byte] = codec match {
    case CodecNone => payload
    case CodecGz =>
      val gz = new GZIPInputStream(new ByteArrayInputStream(payload))
      val b = gz.readAllBytes(); gz.close()
      require(b.length == uncompressedSize,
        s"decompressed ${b.length} != declared $uncompressedSize")
      b
    case CodecSnappy =>
      val b = hadoopBlockDecompress(payload, uncompressedSize,
        (chunk, _) => org.xerial.snappy.Snappy.uncompress(chunk))
      require(b.length == uncompressedSize,
        s"decompressed ${b.length} != declared $uncompressedSize")
      b
    case CodecLz4 =>
      val dec = lz4Factory.safeDecompressor()
      val b = hadoopBlockDecompress(payload, uncompressedSize, (chunk, maxLen) => {
        val dest = new Array[Byte](maxLen)
        val n = dec.decompress(chunk, 0, chunk.length, dest, 0)
        if (n == maxLen) dest else java.util.Arrays.copyOfRange(dest, 0, n)
      })
      require(b.length == uncompressedSize,
        s"decompressed ${b.length} != declared $uncompressedSize")
      b
    case CodecZstd =>
      val b = hadoopBlockDecompress(payload, uncompressedSize,
        (chunk, maxLen) => com.github.luben.zstd.Zstd.decompress(chunk, maxLen))
      require(b.length == uncompressedSize,
        s"decompressed ${b.length} != declared $uncompressedSize")
      b
    case c => throw new IOException(s"unsupported compression codec ordinal $c")
  }

  // ------------------------------------------------- mini protobuf
  /** Just enough protobuf (wire types 0 and 2) to read and write the
    * two PB payloads a v3 HFile carries — `FileTrailerProto` and
    * `FileInfoProto` (HBase HFile.proto / HBaseProtos.BytesBytesPair).
    * Hand-rolled so the decoder stays dependency-free. */
  private[sources] object Pb {
    def writeVarint(out: DataOutputStream, value: Long): Unit = {
      var v = value
      var continue = true
      while (continue) {
        var b = (v & 0x7f).toInt
        v = v >>> 7
        if (v != 0) b |= 0x80
        out.writeByte(b)
        continue = v != 0
      }
    }

    def readVarint(in: DataInputStream): Long = {
      var result = 0L
      var shift = 0
      var b = 0
      do {
        b = in.readByte() & 0xff
        result |= (b & 0x7fL) << shift
        shift += 7
      } while ((b & 0x80) != 0)
      result
    }

    def writeVarintField(out: DataOutputStream, field: Int, value: Long): Unit = {
      writeVarint(out, (field << 3) | 0L) // wire type 0
      writeVarint(out, value)
    }

    def writeBytesField(out: DataOutputStream, field: Int, value: Array[Byte]): Unit = {
      writeVarint(out, (field << 3) | 2L) // wire type 2
      writeVarint(out, value.length.toLong)
      out.write(value)
    }

    /** Parses one message, calling back per field; length-delimited
      * fields pass their bytes, varint fields their value. Unknown
      * wire types raise — a misparse must never be silent. */
    def parseMessage(bytes: Array[Byte])(
        onVarint: (Int, Long) => Unit, onBytes: (Int, Array[Byte]) => Unit): Unit = {
      val in = new DataInputStream(new ByteArrayInputStream(bytes))
      while (in.available() > 0) {
        val tag = readVarint(in)
        val field = (tag >>> 3).toInt
        (tag & 0x7).toInt match {
          case 0 => onVarint(field, readVarint(in))
          case 2 =>
            val len = readVarint(in).toInt
            val b = new Array[Byte](len); in.readFully(b)
            onBytes(field, b)
          case 1 => in.skipBytes(8); () // fixed64 — skip unknown
          case 5 => in.skipBytes(4); () // fixed32 — skip unknown
          case w => throw new IOException(s"unsupported protobuf wire type $w")
        }
      }
    }

    /** writeDelimitedTo: varint message length + message bytes. */
    def writeDelimited(out: DataOutputStream, message: Array[Byte]): Unit = {
      writeVarint(out, message.length.toLong)
      out.write(message)
    }

    def readDelimited(in: DataInputStream): Array[Byte] = {
      val len = readVarint(in).toInt
      val b = new Array[Byte](len); in.readFully(b)
      b
    }
  }

  // ---------------------------------------------------------- key part
  /** Serializes a cell KEY part for `row` at `ts` with explicit type
    * and qualifier — the byte form both data blocks and index entries
    * carry. DeleteFamily/DeleteFamilyVersion markers use
    * [[EmptyQualifier]] (HBase writes them column-less). */
  def cellKey(row: Array[Byte], ts: Long, typ: Byte,
      qualifier: Array[Byte]): Array[Byte] = {
    val buf = new ByteArrayOutputStream()
    val out = new DataOutputStream(buf)
    out.writeShort(row.length)
    out.write(row)
    out.writeByte(Family.length)
    out.write(Family)
    out.write(qualifier)
    out.writeLong(ts)
    out.writeByte(typ)
    buf.toByteArray
  }

  /** Put cell key on the fixed cf:record column. */
  def cellKey(row: Array[Byte], ts: Long): Array[Byte] =
    cellKey(row, ts, KeyTypePut, Qualifier)

  /** Row bytes of a serialized key part. */
  def rowOf(key: Array[Byte]): Array[Byte] = {
    val rowLen = ((key(0) & 0xff) << 8) | (key(1) & 0xff)
    java.util.Arrays.copyOfRange(key, 2, 2 + rowLen)
  }

  /** Qualifier bytes of a serialized key part. */
  def qualifierOf(key: Array[Byte]): Array[Byte] = {
    val rowLen = ((key(0) & 0xff) << 8) | (key(1) & 0xff)
    val famLen = key(2 + rowLen) & 0xff
    java.util.Arrays.copyOfRange(key, 3 + rowLen + famLen, key.length - TsTypeSize)
  }

  /** Type byte (Put / one of the four delete codes) of a key part. */
  def typeOf(key: Array[Byte]): Byte = key(key.length - 1)

  /** Cell timestamp of a key part. */
  def tsOf(key: Array[Byte]): Long =
    java.nio.ByteBuffer.wrap(key, key.length - TsTypeSize, TimestampSize).getLong

  /** HBase CellComparator order over flat key parts: row ASC, family
    * ASC, qualifier ASC (so a column-less DeleteFamily marker sorts
    * before every real column of its row), timestamp DESC, type DESC
    * (so at an equal ts a delete marker sorts before the put it
    * masks). Every HFile's cells are laid out in this order; the
    * scanner's reopen-at-key resume compares with it. */
  def compareCellKeys(a: Array[Byte], b: Array[Byte]): Int = {
    val rla = ((a(0) & 0xff) << 8) | (a(1) & 0xff)
    val rlb = ((b(0) & 0xff) << 8) | (b(1) & 0xff)
    var c = java.util.Arrays.compareUnsigned(a, 2, 2 + rla, b, 2, 2 + rlb)
    if (c != 0) return c
    val fla = a(2 + rla) & 0xff
    val flb = b(2 + rlb) & 0xff
    c = java.util.Arrays.compareUnsigned(
      a, 3 + rla, 3 + rla + fla, b, 3 + rlb, 3 + rlb + flb)
    if (c != 0) return c
    c = java.util.Arrays.compareUnsigned(
      a, 3 + rla + fla, a.length - TsTypeSize,
      b, 3 + rlb + flb, b.length - TsTypeSize)
    if (c != 0) return c
    val t = java.lang.Long.compare(tsOf(b), tsOf(a)) // ts DESC
    if (t != 0) return t
    (typeOf(b) & 0xff) - (typeOf(a) & 0xff) // type DESC
  }

  // ---------------------------------------------------------- blocks
  /** Writes one block: header + (maybe-compressed) payload +
    * per-chunk CRC32 checksums over header + payload. Returns the
    * full on-disk size. */
  private[sources] def writeBlock(out: DataOutputStream, magic: Array[Byte],
      payload: Array[Byte], prevOffset: Long, codec: Int,
      bytesPerChecksum: Int = DefaultBytesPerChecksum): Int = {
    val onDisk = compressPayload(codec, payload)
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

  /** Reads + verifies + decompresses the block at `offset`, accepting
    * any of `allowedMagics`; returns (matched magic, payload bytes,
    * full on-disk size). Checksum mismatch raises IOException — a torn
    * or corrupted block is never decoded. */
  private[sources] def readBlockOneOf(raf: RandomAccessFile, offset: Long,
      allowedMagics: Seq[Array[Byte]], codec: Int): (Array[Byte], Array[Byte], Int) = {
    raf.seek(offset)
    val header = new Array[Byte](HeaderSize)
    raf.readFully(header)
    val in = new DataInputStream(new ByteArrayInputStream(header))
    val magic = new Array[Byte](8); in.readFully(magic)
    val matched = allowedMagics.find(java.util.Arrays.equals(magic, _))
    if (matched.isEmpty)
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
    val data = decompressPayload(codec, payload, uncompressedSize)
    (matched.get, data, HeaderSize + onDiskSizeWithoutHeader)
  }

  /** Single-magic convenience over [[readBlockOneOf]]. */
  private[sources] def readBlock(raf: RandomAccessFile, offset: Long,
      expectMagic: Array[Byte], codec: Int): (Array[Byte], Int) = {
    val (_, payload, size) = readBlockOneOf(raf, offset, Seq(expectMagic), codec)
    (payload, size)
  }

  // ------------------------------------------------- non-root index
  /** Non-root (leaf / intermediate) index block payload: entry count,
    * a secondary offset array of numEntries+1 ints (entry starts
    * relative to the entries section; last = total size), then the
    * entries (offset long, onDiskSize int, raw key — length derived
    * from consecutive secondary offsets; HFileBlockIndex layout). */
  private[sources] def nonRootIndexPayload(entries: Seq[RootIndexEntry]): Array[Byte] = {
    val buf = new ByteArrayOutputStream()
    val out = new DataOutputStream(buf)
    out.writeInt(entries.size)
    var cum = 0
    entries.foreach { e => out.writeInt(cum); cum += 12 + e.firstKey.length }
    out.writeInt(cum) // total entries-section size
    entries.foreach { e =>
      out.writeLong(e.offset)
      out.writeInt(e.onDiskSize)
      out.write(e.firstKey)
    }
    buf.toByteArray
  }

  private[sources] def parseNonRootIndex(payload: Array[Byte]): Array[RootIndexEntry] = {
    def intAt(p: Int): Int =
      ((payload(p) & 0xff) << 24) | ((payload(p + 1) & 0xff) << 16) |
        ((payload(p + 2) & 0xff) << 8) | (payload(p + 3) & 0xff)
    def longAt(p: Int): Long =
      (intAt(p).toLong << 32) | (intAt(p + 4) & 0xffffffffL)
    val n = intAt(0)
    val entriesStart = 4 * (n + 2)
    Array.tabulate(n) { i =>
      val rel = intAt(4 + 4 * i)
      val next = intAt(4 + 4 * (i + 1))
      val base = entriesStart + rel
      val key = java.util.Arrays.copyOfRange(payload, base + 12, entriesStart + next)
      RootIndexEntry(longAt(base), intAt(base + 8), key)
    }
  }

  // ---------------------------------------------------------- trailer
  private[sources] def writeTrailer(out: DataOutputStream, t: Trailer,
      uncompressedDataIndexSize: Long, totalUncompressedBytes: Long,
      comparator: String): Unit = {
    out.write(TrailerMagic)
    if (t.majorVersion >= 3) {
      // v3: delimited FileTrailerProto + zero padding to 4096 total
      // (FixedFileTrailer.serializeAsPB; field numbers from HFile.proto)
      val msgBuf = new ByteArrayOutputStream()
      val m = new DataOutputStream(msgBuf)
      Pb.writeVarintField(m, 1, t.fileInfoOffset)
      Pb.writeVarintField(m, 2, t.loadOnOpenDataOffset)
      Pb.writeVarintField(m, 3, uncompressedDataIndexSize)
      Pb.writeVarintField(m, 4, totalUncompressedBytes)
      Pb.writeVarintField(m, 5, t.dataIndexCount.toLong)
      Pb.writeVarintField(m, 6, t.metaIndexCount.toLong)
      Pb.writeVarintField(m, 7, t.entryCount)
      Pb.writeVarintField(m, 8, t.numDataIndexLevels.toLong)
      Pb.writeVarintField(m, 9, t.firstDataBlockOffset)
      Pb.writeVarintField(m, 10, t.lastDataBlockOffset)
      Pb.writeBytesField(m, 11, comparator.getBytes(StandardCharsets.UTF_8))
      Pb.writeVarintField(m, 12, t.compressionCodec.toLong)
      val delim = new ByteArrayOutputStream()
      Pb.writeDelimited(new DataOutputStream(delim), msgBuf.toByteArray)
      val pb = delim.toByteArray
      val padding = TrailerSizeV3 - 12 - pb.length // 12 = magic + version int
      require(padding >= 0, "v3 trailer protobuf exceeds the fixed trailer size")
      out.write(pb)
      out.write(new Array[Byte](padding))
    } else {
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
    }
    out.writeInt((t.majorVersion & 0x00ffffff) | (t.minorVersion << 24))
  }

  /** Reads a v2 (212-byte fixed) or v3 (4096-byte protobuf) trailer.
    * The version int lives in the file's LAST 4 bytes for both, so the
    * major version is read first and picks the layout
    * (FixedFileTrailer.readFromStream does the same). */
  def readTrailer(raf: RandomAccessFile): Trailer = {
    require(raf.length() >= TrailerSize, "file shorter than an HFile trailer")
    raf.seek(raf.length() - 4)
    val version = raf.readInt()
    val major = version & 0x00ffffff
    val minor = version >>> 24
    major match {
      case 2 => readTrailerV2(raf, minor)
      case 3 => readTrailerV3(raf, minor)
      case _ =>
        // not a plausible version int — most likely not an HFile at all
        throw new IOException("not an HFile v2/v3: bad trailer version " +
          s"(major $major)")
    }
  }

  private def readTrailerV2(raf: RandomAccessFile, minor: Int): Trailer = {
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
    Trailer(fileInfoOffset, loadOnOpen, dataIndexCount, metaIndexCount,
      entryCount, codec, levels, firstData, lastData, 2, minor)
  }

  private def readTrailerV3(raf: RandomAccessFile, minor: Int): Trailer = {
    if (raf.length() < TrailerSizeV3)
      throw new IOException("file shorter than an HFile v3 trailer")
    raf.seek(raf.length() - TrailerSizeV3)
    val bytes = new Array[Byte](TrailerSizeV3)
    raf.readFully(bytes)
    if (!java.util.Arrays.equals(
        java.util.Arrays.copyOfRange(bytes, 0, 8), TrailerMagic))
      throw new IOException("not an HFile v3: bad trailer magic")
    val in = new DataInputStream(new ByteArrayInputStream(bytes, 8,
      TrailerSizeV3 - 12))
    val msg = Pb.readDelimited(in)
    var fileInfoOffset = 0L; var loadOnOpen = 0L; var dataIndexCount = 0
    var metaIndexCount = 0; var entryCount = 0L; var codec = CodecNone
    var levels = 1; var firstData = 0L; var lastData = 0L
    var encrypted = false
    Pb.parseMessage(msg)(
      onVarint = (field, v) => field match {
        case 1 => fileInfoOffset = v
        case 2 => loadOnOpen = v
        case 5 => dataIndexCount = v.toInt
        case 6 => metaIndexCount = v.toInt
        case 7 => entryCount = v
        case 8 => levels = v.toInt
        case 9 => firstData = v
        case 10 => lastData = v
        case 12 => codec = v.toInt
        case _ => () // 3/4 sizes — unused on read
      },
      onBytes = (field, b) => field match {
        case 13 => encrypted = b.nonEmpty
        case _ => () // 11 comparator name — unused on read
      })
    if (encrypted)
      throw new IOException(
        "encrypted HFile (trailer encryption_key) not supported")
    Trailer(fileInfoOffset, loadOnOpen, dataIndexCount, metaIndexCount,
      entryCount, codec, levels, firstData, lastData, 3, minor)
  }

  // ---------------------------------------------------------- fileinfo
  /** Serializes FileInfo the modern way: "PBUF" + delimited
    * FileInfoProto{repeated BytesBytesPair map_entry = 1} with
    * BytesBytesPair{bytes first = 1, second = 2} (HFileInfo.write). */
  private[sources] def pbufFileInfoPayload(
      entries: Seq[(String, Array[Byte])]): Array[Byte] = {
    val msgBuf = new ByteArrayOutputStream()
    val m = new DataOutputStream(msgBuf)
    entries.foreach { case (k, v) =>
      val pairBuf = new ByteArrayOutputStream()
      val p = new DataOutputStream(pairBuf)
      Pb.writeBytesField(p, 1, k.getBytes(StandardCharsets.UTF_8))
      Pb.writeBytesField(p, 2, v)
      Pb.writeBytesField(m, 1, pairBuf.toByteArray)
    }
    val buf = new ByteArrayOutputStream()
    val out = new DataOutputStream(buf)
    out.write(PbufMagic)
    Pb.writeDelimited(out, msgBuf.toByteArray)
    buf.toByteArray
  }

  /** Legacy (pre-protobuf) FileInfo: count + vint-framed pairs. */
  private[sources] def legacyFileInfoPayload(
      entries: Seq[(String, Array[Byte])]): Array[Byte] = {
    val buf = new ByteArrayOutputStream()
    val out = new DataOutputStream(buf)
    out.writeInt(entries.size)
    entries.foreach { case (k, v) =>
      val kb = k.getBytes(StandardCharsets.UTF_8)
      writeVLong(out, kb.length); out.write(kb)
      writeVLong(out, v.length); out.write(v)
    }
    buf.toByteArray
  }

  /** Parses either FileInfo form, discriminated by the PBUF magic. */
  private[sources] def parseFileInfo(payload: Array[Byte]): Map[String, Array[Byte]] = {
    if (payload.length >= 4 && java.util.Arrays.equals(
        java.util.Arrays.copyOfRange(payload, 0, 4), PbufMagic)) {
      val in = new DataInputStream(new ByteArrayInputStream(payload, 4,
        payload.length - 4))
      val msg = Pb.readDelimited(in)
      val m = mutable.Map.empty[String, Array[Byte]]
      Pb.parseMessage(msg)(
        onVarint = (_, _) => (),
        onBytes = (field, pair) => if (field == 1) {
          var k: Array[Byte] = null; var v: Array[Byte] = null
          Pb.parseMessage(pair)(
            onVarint = (_, _) => (),
            onBytes = (f, b) => f match {
              case 1 => k = b
              case 2 => v = b
              case _ => ()
            })
          if (k != null && v != null)
            m(new String(k, StandardCharsets.UTF_8)) = v
        })
      m.toMap
    } else {
      val fin = new DataInputStream(new ByteArrayInputStream(payload))
      val n = fin.readInt()
      (0 until n).map { _ =>
        val kl = readVLong(fin).toInt
        val k = new Array[Byte](kl); fin.readFully(k)
        val vl = readVLong(fin).toInt
        val v = new Array[Byte](vl); fin.readFully(v)
        new String(k, StandardCharsets.UTF_8) -> v
      }.toMap
    }
  }

  // ------------------------------------------------------------ bloom
  /** HBase `Hash` algorithm ids (hbase.hash.type; MURMUR is the
    * default a real store file's bloom carries). */
  val HashMurmur = 1

  /** MurmurHash2 32-bit, the exact byte walk of
    * org.apache.hadoop.hbase.util.MurmurHash (little-endian word
    * assembly, 3/2/1-byte tail, 13/15 finalization shifts) — bloom bit
    * positions must replicate bit-for-bit or a reader of a real file
    * would skip rows the file contains. */
  def murmurHash(data: Array[Byte], offset: Int, length: Int, seed: Int): Int = {
    val m = 0x5bd1e995
    val r = 24
    var h = seed ^ length
    val len4 = length >> 2
    var i = 0
    while (i < len4) {
      val i4 = (i << 2) + offset
      var k = data(i4 + 3).toInt
      k = (k << 8) | (data(i4 + 2) & 0xff)
      k = (k << 8) | (data(i4 + 1) & 0xff)
      k = (k << 8) | (data(i4) & 0xff)
      k *= m
      k ^= k >>> r
      k *= m
      h *= m
      h ^= k
      i += 1
    }
    val lenM = len4 << 2
    val left = length - lenM
    val iM = lenM + offset
    if (left != 0) {
      if (left >= 3) h ^= data(iM + 2).toInt << 16
      if (left >= 2) h ^= data(iM + 1).toInt << 8
      if (left >= 1) h ^= data(iM).toInt
      h *= m
    }
    h ^= h >>> 13
    h *= m
    h ^= h >>> 15
    h
  }

  /** Bloom allocation for `maxKeys` at `errorRate`
    * (BloomFilterUtil.computeBitSize / optimalFunctionCount):
    * m = -n·ln(p)/ln(2)², k = (m/n)·ln(2), byte-aligned. */
  def bloomByteSize(maxKeys: Int, errorRate: Double): Int = {
    val bits = math.ceil(-maxKeys * math.log(errorRate) /
      (math.log(2) * math.log(2))).toLong
    (((bits + 7) >> 3).max(1L)).toInt
  }

  def bloomHashCount(byteSize: Int, maxKeys: Int): Int =
    // BloomFilterUtil.optimalFunctionCount FLOORS the bits-per-key
    // term (integer division) before the ln(2) scale — match it so a
    // bloom this writer emits carries the same hashCount as a
    // cluster-written file of identical geometry (reads are immune
    // either way: hashCount travels in the meta block).
    // Contract: this guarantees SELF-CONSISTENCY (writer and reader
    // agree) and FORMULA PARITY with the published BloomFilterUtil
    // arithmetic; byte-level parity with a cluster-written bloom
    // remains unverified — it would need a real HBase-written fixture
    // file, which this sandbox cannot produce.
    math.ceil(math.log(2) * ((byteSize.toLong << 3) / maxKeys))
      .toInt.max(1)

  /** Double hashing over the chunk's bit array — BloomFilterUtil's
    * production path: h1, h2 = murmur(key, 0), murmur(key, h1); probe
    * i tests bit |h1 + i·h2| mod bits, LSB-first within each byte. */
  private def bloomBitPos(i: Int, h1: Int, h2: Int, bitSize: Int): Int =
    math.abs((h1 + i * h2) % bitSize)

  def bloomSet(bits: Array[Byte], key: Array[Byte], hashCount: Int): Unit = {
    val bitSize = bits.length << 3
    val h1 = murmurHash(key, 0, key.length, 0)
    val h2 = murmurHash(key, 0, key.length, h1)
    var i = 0
    while (i < hashCount) {
      val pos = bloomBitPos(i, h1, h2, bitSize)
      bits(pos >> 3) = (bits(pos >> 3) | (1 << (pos & 7))).toByte
      i += 1
    }
  }

  def bloomContains(bits: Array[Byte], key: Array[Byte], hashCount: Int): Boolean = {
    val bitSize = bits.length << 3
    val h1 = murmurHash(key, 0, key.length, 0)
    val h2 = murmurHash(key, 0, key.length, h1)
    var i = 0
    while (i < hashCount) {
      val pos = bloomBitPos(i, h1, h2, bitSize)
      if ((bits(pos >> 3) & (1 << (pos & 7))) == 0) return false
      i += 1
    }
    true
  }

  /** GENERAL_BLOOM_META payload (CompoundBloomFilterBase VERSION=3 +
    * BlockIndexChunk.writeRoot): version, totalByteSize, hashCount,
    * hashType, totalKeyCount, totalMaxKeys, numChunks, vint-prefixed
    * comparator name (vint 0 = null, the raw-byte ROW-bloom case),
    * then (offset:long onDiskSize:int vint-keyLen firstKey)* — the
    * root-index entry layout, uncompressed and headerless inside the
    * meta block. */
  private[sources] def bloomMetaPayload(totalByteSize: Long, hashCount: Int,
      totalKeyCount: Long, totalMaxKeys: Long,
      chunks: Seq[RootIndexEntry]): Array[Byte] = {
    val buf = new ByteArrayOutputStream()
    val out = new DataOutputStream(buf)
    out.writeInt(3) // CompoundBloomFilterBase.VERSION
    out.writeLong(totalByteSize)
    out.writeInt(hashCount)
    out.writeInt(HashMurmur)
    out.writeLong(totalKeyCount)
    out.writeLong(totalMaxKeys)
    out.writeInt(chunks.size)
    writeVLong(out, 0L) // null comparator: raw-byte ROW keys
    chunks.foreach { e =>
      out.writeLong(e.offset)
      out.writeInt(e.onDiskSize)
      writeVLong(out, e.firstKey.length)
      out.write(e.firstKey)
    }
    buf.toByteArray
  }

  private[sources] def parseBloomMeta(payload: Array[Byte]): BloomMeta = {
    val in = new DataInputStream(new ByteArrayInputStream(payload))
    val version = in.readInt()
    require(version == 3, s"unsupported compound bloom version $version")
    in.readLong() // totalByteSize
    val hashCount = in.readInt()
    val hashType = in.readInt()
    require(hashType == HashMurmur, s"unsupported bloom hash type $hashType")
    val totalKeyCount = in.readLong()
    in.readLong() // totalMaxKeys
    val numChunks = in.readInt()
    val cmpLen = readVLong(in).toInt
    if (cmpLen > 0) in.skipBytes(cmpLen)
    val chunks = Array.fill(numChunks) {
      val off = in.readLong()
      val size = in.readInt()
      val kl = readVLong(in).toInt
      val k = new Array[Byte](kl); in.readFully(k)
      RootIndexEntry(off, size, k)
    }
    BloomMeta(hashCount, hashType, totalKeyCount, chunks)
  }

  // ------------------------------------------------------- load-on-open
  private val metaMemo = new ConcurrentHashMap[String, HFileMeta]()
  /** Files opened for scanning — observability for the pruning spec. */
  private[sources] val opens = new java.util.concurrent.atomic.AtomicInteger

  /** Trailer + root index + pruning keys + cell-trailer flags, read
    * once per JVM per file (the block-cache / broadcast analogue —
    * same policy as [[SortedRunFormat.readBlockIndex]]). */
  def readMeta(path: String): HFileMeta =
    metaMemo.computeIfAbsent(path, { p =>
      val raf = new RandomAccessFile(p, "r")
      try {
        val t = readTrailer(raf)
        val (indexPayload, _) =
          readBlock(raf, t.loadOnOpenDataOffset, RootIndexMagic, t.compressionCodec)
        val in = new DataInputStream(new ByteArrayInputStream(indexPayload))
        val entries = Array.fill(t.dataIndexCount) {
          val off = in.readLong()
          val size = in.readInt()
          val kl = readVLong(in).toInt
          val k = new Array[Byte](kl); in.readFully(k)
          RootIndexEntry(off, size, k)
        }
        // multi-level roots append midkey metadata (long,int,int) after
        // the entries — reading exactly dataIndexCount entries skips it
        require(entries.nonEmpty, s"empty HFile: $p")
        val (lastRow, tags, mvcc, seqId, infoSize) =
          try {
            val (infoPayload, size) =
              readBlock(raf, t.fileInfoOffset, FileInfoMagic, t.compressionCodec)
            val m = parseFileInfo(infoPayload)
            (m.get(InfoLastKey).map(rowOf),
              m.contains(InfoMaxTagsLen), m.contains(InfoMaxMemstoreTs),
              m.get(InfoMaxSeqId).filter(_.length == 8)
                .map(java.nio.ByteBuffer.wrap(_).getLong), size)
          } catch {
            // unparseable FileInfo (foreign writer) only disables
            // pruning and the tags/mvcc cell trailers; the scan of a
            // file without them never depended on it
            case _: Exception => (None, false, false, None, 0)
          }
        // bloom meta lives in load-on-open AFTER FileInfo (the
        // "additional load-on-open data" HFileWriterImpl.close appends
        // before the trailer) — walk the remaining blocks up to the
        // trailer, keeping the general (ROW) bloom if present. Bloom
        // parse failure only disables the probe fast path; scans never
        // consult it.
        //
        // The delete-family bloom (DFBLMET2) is accepted ONLY so the
        // walk can STEP OVER it in cluster-written files (HBase writes
        // it after the general meta; a general-bloom NONE file can
        // carry one alone) — it is never parsed or consulted, and
        // deliberately so: THIS writer keys EVERY cell's row into the
        // general ROW bloom, delete markers included, so a
        // general-bloom miss already proves the file holds neither
        // cells nor markers for the row. A DF bloom can never skip a
        // file the general bloom admits (any file it would clear still
        // needs its descent for the row's puts), so consulting it
        // would read a meta block per file for zero saved blocks on
        // this layout. HBase needs it because ITS general bloom is a
        // ROWCOL option that delete-family markers bypass.
        val bloom =
          try {
            val trailerStart = raf.length() -
              (if (t.majorVersion >= 3) TrailerSizeV3 else TrailerSize)
            var off = t.fileInfoOffset + infoSize
            var found: Option[BloomMeta] = None
            while (found.isEmpty && infoSize > 0 && off < trailerStart) {
              val (magic, payload, size) = readBlockOneOf(raf, off,
                Seq(BloomMetaMagic, DeleteFamilyBloomMetaMagic),
                t.compressionCodec)
              if (java.util.Arrays.equals(magic, BloomMetaMagic))
                found = Some(parseBloomMeta(payload))
              off += size
            }
            found
          } catch { case _: Exception => None }
        HFileMeta(t, entries, rowOf(entries.head.firstKey), lastRow, tags, mvcc,
          seqId, bloom)
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

  /** Greatest index entry whose first ROW is STRICTLY < target, or 0.
    * The seek floor a row-targeted descent needs: cells sort ts DESC
    * within a row, so when a row spans a block boundary its
    * highest-ts cells trail the PREVIOUS block — a descent that lands
    * on the block whose first row == target would miss them. Differs
    * from [[seekBlock]] only in that equality case (one extra block
    * read); identical otherwise. */
  def seekBlockBefore(index: Array[RootIndexEntry], targetRow: Array[Byte]): Int = {
    var lo = 0; var hi = index.length - 1; var best = 0
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      if (java.util.Arrays.compareUnsigned(rowOf(index(mid).firstKey), targetRow) < 0) {
        best = mid; lo = mid + 1
      } else hi = mid - 1
    }
    best
  }

  // ------------------------------------------------- index traversal
  /** Cursor over the data-block entries of a 1..N-level block index.
    * Only the descent path is held in memory (root array + one parsed
    * block per level) — the design that scales to indexes too large to
    * flatten: a sequential slice scan reads each index block at most
    * once, and nothing is cached beyond the current path. */
  private[sources] final class IndexCursor(meta: HFileMeta) {
    private val levels = meta.trailer.numDataIndexLevels
    private val entries = new Array[Array[RootIndexEntry]](levels)
    private val pos = new Array[Int](levels)
    private var pending = false

    private def loadChild(raf: RandomAccessFile, parent: RootIndexEntry): Array[RootIndexEntry] = {
      val (_, payload, _) = readBlockOneOf(raf, parent.offset,
        Seq(LeafIndexMagic, IntermediateIndexMagic), meta.trailer.compressionCodec)
      parseNonRootIndex(payload)
    }

    /** Positions the cursor so the next [[next]] returns the FIRST
      * data block that can contain a cell of `targetRow`
      * ([[seekBlockBefore]] floor at every level — the row's
      * highest-ts cells can trail the previous block). */
    def seek(raf: RandomAccessFile, targetRow: Array[Byte]): Unit = {
      entries(0) = meta.index
      pos(0) = seekBlockBefore(entries(0), targetRow)
      var lvl = 1
      while (lvl < levels) {
        entries(lvl) = loadChild(raf, entries(lvl - 1)(pos(lvl - 1)))
        pos(lvl) = seekBlockBefore(entries(lvl), targetRow)
        lvl += 1
      }
      pending = true
    }

    /** The next data-block entry in file-key order, or null when the
      * index is exhausted. */
    def next(raf: RandomAccessFile): RootIndexEntry = {
      if (pending) pending = false
      else {
        var lvl = levels - 1
        var advanced = false
        while (!advanced) {
          pos(lvl) += 1
          if (pos(lvl) < entries(lvl).length) {
            var k = lvl + 1
            while (k < levels) {
              entries(k) = loadChild(raf, entries(k - 1)(pos(k - 1)))
              pos(k) = 0
              k += 1
            }
            advanced = true
          } else if (lvl == 0) return null
          else lvl -= 1
        }
      }
      entries(levels - 1)(pos(levels - 1))
    }
  }

  // ------------------------------------------------- cell decoders
  /** Per-block cell decoder: `nextKey` advances and returns the full
    * flat cell key (null at block end); exactly one of `readValue` /
    * `skipValue` must follow each `nextKey`. */
  private[sources] sealed trait CellDecoder {
    def nextKey(): Array[Byte]
    def readValue(): Array[Byte]
    def skipValue(): Unit
  }

  /** Unencoded DATABLK* payload: keyLen/valLen/key/value
    * [+ tagsLen:short tags] [+ mvcc vlong]. Skipped values are never
    * materialized. */
  private[sources] final class RawCellDecoder(payload: Array[Byte],
      includesTags: Boolean, includesMvcc: Boolean) extends CellDecoder {
    private val in = new DataInputStream(new ByteArrayInputStream(payload))
    private var valLen = 0

    override def nextKey(): Array[Byte] = {
      if (in.available() == 0) return null
      val keyLen = in.readInt()
      valLen = in.readInt()
      val key = new Array[Byte](keyLen)
      in.readFully(key)
      key
    }

    private def consumeCellTrailers(): Unit = {
      if (includesTags) { val tl = in.readShort() & 0xffff; in.skipBytes(tl); () }
      if (includesMvcc) { readVLong(in); () }
    }

    override def readValue(): Array[Byte] = {
      val v = new Array[Byte](valLen)
      in.readFully(v)
      consumeCellTrailers()
      v
    }

    override def skipValue(): Unit = {
      in.skipBytes(valLen)
      consumeCellTrailers()
    }
  }

  /** FAST_DIFF-encoded DATABLKE payload (after the 2-byte encoding
    * id): FastDiffDeltaEncoder's flag-byte layout — see the format
    * comment at the top of the file. Values must be materialized even
    * when skipped (the NEXT cell may reference them via SAME_VALUE). */
  private[sources] final class FastDiffCellDecoder(payload: Array[Byte],
      includesTags: Boolean, includesMvcc: Boolean) extends CellDecoder {
    private val in = new DataInputStream(new ByteArrayInputStream(payload))
    private var prevKey: Array[Byte] = _
    private var prevValue: Array[Byte] = _
    private var keyLength = 0
    private var valueLength = 0
    private var rowLengthWithSize = 0
    private var familyLengthWithSize = 0
    private var sameValue = false

    override def nextKey(): Array[Byte] = {
      if (in.available() == 0) return null
      val flag = in.readByte() & 0xff
      if ((flag & FlagSameKeyLength) == 0) keyLength = readCompressedInt(in)
      if ((flag & FlagSameValueLength) == 0) valueLength = readCompressedInt(in)
      val commonPrefix = readCompressedInt(in)
      val key = new Array[Byte](keyLength)
      if (prevKey == null) {
        // first cell: the full flat key follows (ts + type via the
        // common suffix path below, commonPrefix == 0, flag == 0)
        in.readFully(key, 0, keyLength - TsTypeSize)
        rowLengthWithSize = (((key(0) & 0xff) << 8) | (key(1) & 0xff)) + RowLengthSize
        familyLengthWithSize = (key(rowLengthWithSize) & 0xff) + 1
      } else {
        System.arraycopy(prevKey, 0, key, 0, commonPrefix)
        if (commonPrefix < RowLengthSize) {
          // row length may differ: rest of the length short, the whole
          // row, the family copied forward, then the full qualifier
          in.readFully(key, commonPrefix, RowLengthSize - commonPrefix)
          val newRowLengthWithSize =
            (((key(0) & 0xff) << 8) | (key(1) & 0xff)) + RowLengthSize
          in.readFully(key, RowLengthSize, newRowLengthWithSize - RowLengthSize)
          System.arraycopy(prevKey, rowLengthWithSize, key,
            newRowLengthWithSize, familyLengthWithSize)
          rowLengthWithSize = newRowLengthWithSize
          in.readFully(key, rowLengthWithSize + familyLengthWithSize,
            keyLength - rowLengthWithSize - familyLengthWithSize - TsTypeSize)
        } else if (commonPrefix < rowLengthWithSize) {
          // same row length: rest of the row, family copied forward,
          // full qualifier
          in.readFully(key, commonPrefix, rowLengthWithSize - commonPrefix)
          System.arraycopy(prevKey, rowLengthWithSize, key,
            rowLengthWithSize, familyLengthWithSize)
          in.readFully(key, rowLengthWithSize + familyLengthWithSize,
            keyLength - rowLengthWithSize - familyLengthWithSize - TsTypeSize)
        } else {
          // common covers row + family (single family per file): only
          // the qualifier suffix is in the stream
          in.readFully(key, commonPrefix, keyLength - TsTypeSize - commonPrefix)
        }
      }
      // timestamp: common prefix with the previous cell's, then suffix
      val tsCommon = flag & FlagMaskTimestampLength
      val tsPos = keyLength - TsTypeSize
      if (prevKey != null)
        System.arraycopy(prevKey, prevKey.length - TsTypeSize, key, tsPos, tsCommon)
      in.readFully(key, tsPos + tsCommon, TimestampSize - tsCommon)
      // type byte
      if ((flag & FlagSameType) != 0) key(keyLength - 1) = prevKey(prevKey.length - 1)
      else key(keyLength - 1) = in.readByte()
      sameValue = (flag & FlagSameValue) != 0
      prevKey = key
      key
    }

    private def consumeCellTrailers(): Unit = {
      if (includesTags) { val tl = readCompressedInt(in); in.skipBytes(tl); () }
      if (includesMvcc) { readVLong(in); () }
    }

    private def advanceValue(): Array[Byte] = {
      if (!sameValue) {
        val v = new Array[Byte](valueLength)
        in.readFully(v)
        prevValue = v
      }
      consumeCellTrailers()
      prevValue
    }

    override def readValue(): Array[Byte] = advanceValue()
    override def skipValue(): Unit = { advanceValue(); () }
  }

  /** Decoder for a data block read via [[readBlockOneOf]]: DATABLK*
    * is raw; DATABLKE carries a 2-byte encoding id — FAST_DIFF is
    * decoded, anything else fails loudly. */
  private[sources] def cellDecoder(magic: Array[Byte], payload: Array[Byte],
      meta: HFileMeta): CellDecoder =
    if (java.util.Arrays.equals(magic, DataMagic))
      new RawCellDecoder(payload, meta.includesTags, meta.includesMvcc)
    else {
      val id = ((payload(0) & 0xff) << 8) | (payload(1) & 0xff)
      if (id != EncodingFastDiff)
        throw new IOException(s"unsupported data block encoding id $id " +
          "(NONE and FAST_DIFF are supported)")
      new FastDiffCellDecoder(
        java.util.Arrays.copyOfRange(payload, 2, payload.length),
        meta.includesTags, meta.includesMvcc)
    }

  // ------------------------------------------------- fast-diff encode
  /** FAST_DIFF encoder (fixture/test side) mirroring
    * FastDiffDeltaEncoder.compressSingleKeyValue byte for byte, plus
    * the per-cell tags/mvcc trailers BufferedDataBlockEncoder appends. */
  private[sources] final class FastDiffEncoder(out: DataOutputStream,
      includesTags: Boolean, includesMvcc: Boolean) {
    private var prevKey: Array[Byte] = _
    private var prevValue: Array[Byte] = _

    def append(key: Array[Byte], value: Array[Byte],
        tags: Array[Byte] = Array.emptyByteArray, mvcc: Long = 0L): Unit = {
      if (prevKey == null) {
        out.writeByte(0)
        putCompressedInt(out, key.length)
        putCompressedInt(out, value.length)
        putCompressedInt(out, 0)
        out.write(key) // full flat key including ts + type
        out.write(value)
      } else {
        var flag = 0
        val limit = math.min(key.length, prevKey.length) - TsTypeSize
        var commonPrefix = 0
        while (commonPrefix < limit && key(commonPrefix) == prevKey(commonPrefix))
          commonPrefix += 1
        if (key.length == prevKey.length) flag |= FlagSameKeyLength
        if (value.length == prevValue.length) flag |= FlagSameValueLength
        if (key(key.length - 1) == prevKey(prevKey.length - 1)) flag |= FlagSameType
        var tsCommon = 0
        while (tsCommon < TimestampSize - 1 &&
            key(key.length - TsTypeSize + tsCommon) ==
              prevKey(prevKey.length - TsTypeSize + tsCommon))
          tsCommon += 1
        flag |= tsCommon
        if (value.length == prevValue.length &&
            java.util.Arrays.equals(value, prevValue)) flag |= FlagSameValue
        out.writeByte(flag)
        if ((flag & FlagSameKeyLength) == 0) putCompressedInt(out, key.length)
        if ((flag & FlagSameValueLength) == 0) putCompressedInt(out, value.length)
        putCompressedInt(out, commonPrefix)
        val rowLengthWithSize = (((key(0) & 0xff) << 8) | (key(1) & 0xff)) + RowLengthSize
        if (commonPrefix < rowLengthWithSize) {
          // rows differ: row excluding common, skip family, full qualifier
          if (commonPrefix < RowLengthSize) {
            out.write(key, commonPrefix, RowLengthSize - commonPrefix)
            out.write(key, RowLengthSize, rowLengthWithSize - RowLengthSize)
          } else {
            out.write(key, commonPrefix, rowLengthWithSize - commonPrefix)
          }
          val famLenWithSize = (key(rowLengthWithSize) & 0xff) + 1
          val qualStart = rowLengthWithSize + famLenWithSize
          out.write(key, qualStart, key.length - TsTypeSize - qualStart)
        } else {
          // common covers the row (and family — constant per file):
          // only the qualifier suffix
          out.write(key, commonPrefix, key.length - TsTypeSize - commonPrefix)
        }
        out.write(key, key.length - TsTypeSize + tsCommon, TimestampSize - tsCommon)
        if ((flag & FlagSameType) == 0) out.writeByte(key(key.length - 1))
        if ((flag & FlagSameValue) == 0) out.write(value)
      }
      if (includesTags) { putCompressedInt(out, tags.length); out.write(tags) }
      if (includesMvcc) writeVLong(out, mvcc)
      prevKey = key
      prevValue = value
    }
  }
}

/** Shape options for [[HFileV2Writer.writeHFile]] — the knobs a real
  * cluster's files vary on: major version (2 fixed trailer / 3
  * protobuf), data block encoding (NONE / FAST_DIFF), per-cell mvcc
  * and tags trailers, and the index fan-out that forces multi-level
  * block indexes. */
final case class HFileShape(codec: Int = HFileV2Format.CodecNone,
    blockEntries: Int = HFileV2Writer.DefaultBlockEntries,
    bytesPerChecksum: Int = HFileV2Format.DefaultBytesPerChecksum,
    encoding: Int = HFileV2Format.EncodingNone,
    majorVersion: Int = 2,
    includesMvcc: Boolean = false,
    includesTags: Boolean = false,
    maxIndexEntriesPerBlock: Int = Int.MaxValue,
    // > 0 writes a general ROW bloom (CompoundBloomFilter, 1% error):
    // chunks of this many distinct rows. A real cluster sizes chunks
    // by bytes (128 KB default); the fixture sizes by rows so specs
    // can pin exact chunk counts.
    bloomRowsPerChunk: Int = 0)

/** One cell as the writer consumes it: a Put by default, or one of the
  * four delete-marker scopes ([[HFileV2Format.isDelete]]). Markers
  * carry an empty value; family-scoped markers carry
  * [[HFileV2Format.EmptyQualifier]]. */
final case class HFileCell(row: Array[Byte], ts: Long, value: Array[Byte],
    typ: Byte = HFileV2Format.KeyTypePut,
    qualifier: Array[Byte] = HFileV2Format.Qualifier)

/** Writes HFile v2/v3 files. FIXTURE/TEST seam with the same role as
  * [[SortedRunWriter]]: production never writes HFiles (HBase does);
  * this writer exists so the READER — the production-relevant half —
  * is exercised against files laid out exactly per the published
  * format, including compression, checksums, block encoding,
  * single- and multi-level indexes, both trailer versions and both
  * FileInfo serializations. */
object HFileV2Writer {

  import HFileV2Format._

  val DefaultBlockEntries = 64

  /** Back-compatible single-level unencoded v2 form. */
  def writeHFile(path: Path, cells: Iterator[(Array[Byte], Long, Array[Byte])],
      codec: Int = CodecNone, blockEntries: Int = DefaultBlockEntries,
      bytesPerChecksum: Int = DefaultBytesPerChecksum): Long =
    writeHFile(path, cells, HFileShape(codec = codec,
      blockEntries = blockEntries, bytesPerChecksum = bytesPerChecksum))

  /** Put-only convenience over [[writeCells]]. */
  def writeHFile(path: Path, cells: Iterator[(Array[Byte], Long, Array[Byte])],
      shape: HFileShape): Long =
    writeCells(path,
      cells.map { case (row, ts, v) => HFileCell(row, ts, v) }, shape)

  /** Writes one HFile from cells ALREADY sorted in
    * [[HFileV2Format.compareCellKeys]] order (row ASC, qualifier ASC,
    * ts DESC, type DESC); returns the file's entry count. `seqId >= 0`
    * records the file's MAX_SEQ_ID in FileInfo — the generation-order
    * authority a real store file carries. */
  def writeCells(path: Path, cells: Iterator[HFileCell],
      shape: HFileShape, seqId: Long = -1L): Long = {
    require(shape.encoding == EncodingNone || shape.encoding == EncodingFastDiff,
      s"unsupported encoding ${shape.encoding}")
    require(!shape.includesTags || shape.majorVersion >= 3,
      "cell tags require HFile v3")
    require(shape.maxIndexEntriesPerBlock >= 2,
      "index blocks need a fan-out of at least 2")
    val fileBuf = new ByteArrayOutputStream()
    val out = new DataOutputStream(fileBuf)
    var offset = 0L
    var prevData = -1L
    var firstDataOffset = -1L
    var lastDataOffset = -1L
    val dataEntries = mutable.ArrayBuffer.empty[RootIndexEntry]
    var entryCount = 0L
    var totalUncompressed = 0L
    var lastKey: Array[Byte] = null
    var maxTagsLen = 0

    // a deterministic per-cell tag (type 8 ~ a TTL-ish tag): only the
    // reader's ability to SKIP tags matters, not their content
    def tagsFor(row: Array[Byte]): Array[Byte] =
      if (!shape.includesTags) Array.emptyByteArray
      else {
        val payload = java.util.Arrays.copyOfRange(row, 0, math.min(2, row.length))
        val b = new ByteArrayOutputStream()
        val o = new DataOutputStream(b)
        o.writeShort(1 + payload.length) // tag length includes the type byte
        o.writeByte(8)
        o.write(payload)
        b.toByteArray
      }

    val block = mutable.ArrayBuffer.empty[(Array[Byte], Array[Byte], Array[Byte])]

    def encodeBlock(): Array[Byte] = {
      val buf = new ByteArrayOutputStream()
      val o = new DataOutputStream(buf)
      if (shape.encoding == EncodingFastDiff) {
        o.writeShort(EncodingFastDiff) // DataBlockEncoding id prefix
        val enc = new FastDiffEncoder(o, shape.includesTags, shape.includesMvcc)
        block.foreach { case (key, value, tags) =>
          enc.append(key, value, tags, mvcc = entryCount)
        }
      } else {
        block.foreach { case (key, value, tags) =>
          o.writeInt(key.length)
          o.writeInt(value.length)
          o.write(key)
          o.write(value)
          if (shape.includesTags) { o.writeShort(tags.length); o.write(tags) }
          if (shape.includesMvcc) writeVLong(o, entryCount)
        }
      }
      buf.toByteArray
    }

    def flushBlock(): Unit = if (block.nonEmpty) {
      if (firstDataOffset < 0) firstDataOffset = offset
      lastDataOffset = offset
      val payload = encodeBlock()
      totalUncompressed += payload.length
      val magic = if (shape.encoding == EncodingFastDiff) EncodedDataMagic else DataMagic
      val size = writeBlock(out, magic, payload, prevData, shape.codec,
        shape.bytesPerChecksum)
      dataEntries += RootIndexEntry(offset, size, block.head._1)
      prevData = offset
      offset += size
      block.clear()
    }

    // general ROW bloom accumulation: every cell's row — puts AND
    // delete markers (StoreFileWriter appends the bloom key for each
    // cell, so a probe that bloom-skips a file cannot miss a
    // tombstone) — deduped consecutively (cells arrive row-sorted)
    val bloomChunkRows = mutable.ArrayBuffer.empty[mutable.ArrayBuffer[Array[Byte]]]
    var lastBloomRow: Array[Byte] = null
    def noteBloomRow(row: Array[Byte]): Unit =
      if (shape.bloomRowsPerChunk > 0 &&
          (lastBloomRow == null || !java.util.Arrays.equals(lastBloomRow, row))) {
        if (bloomChunkRows.isEmpty ||
            bloomChunkRows.last.size >= shape.bloomRowsPerChunk)
          bloomChunkRows += mutable.ArrayBuffer.empty[Array[Byte]]
        bloomChunkRows.last += row
        lastBloomRow = row
      }

    cells.foreach { c =>
      val key = cellKey(c.row, c.ts, c.typ, c.qualifier)
      val tags = tagsFor(c.row)
      maxTagsLen = math.max(maxTagsLen, tags.length)
      noteBloomRow(c.row)
      block += ((key, c.value, tags))
      lastKey = key
      entryCount += 1
      if (block.size >= shape.blockEntries) flushBlock()
    }
    flushBlock()
    require(entryCount > 0, "refusing to write an empty HFile")

    // bloom chunk blocks: still the scanned section (real writers
    // interleave them with data blocks as chunks fill; trailing is
    // equally valid — every offset is explicit in the chunk directory)
    val bloomChunks = mutable.ArrayBuffer.empty[RootIndexEntry]
    val bloomHashes =
      if (shape.bloomRowsPerChunk > 0)
        bloomHashCount(bloomByteSize(shape.bloomRowsPerChunk, 0.01),
          shape.bloomRowsPerChunk)
      else 0
    var bloomKeyCount = 0L
    bloomChunkRows.foreach { rows =>
      val bits = new Array[Byte](bloomByteSize(shape.bloomRowsPerChunk, 0.01))
      rows.foreach(bloomSet(bits, _, bloomHashes))
      bloomKeyCount += rows.size
      val size = writeBlock(out, BloomChunkMagic, bits, -1L, shape.codec,
        shape.bytesPerChecksum)
      bloomChunks += RootIndexEntry(offset, size, rows.head)
      offset += size
    }

    // ------------------------------------------ block index (1..N levels)
    // chunk the data-entry level into leaf blocks, then intermediate
    // levels, until one level fits a root block (HFileBlockIndex)
    var level: Seq[RootIndexEntry] = dataEntries.toSeq
    var numLevels = 1
    var uncompressedIndexSize = 0L
    var deepest = true
    val leafBlocks = mutable.ArrayBuffer.empty[(Long, Int)] // for midkey metadata
    while (level.size > shape.maxIndexEntriesPerBlock) {
      val next = mutable.ArrayBuffer.empty[RootIndexEntry]
      level.grouped(shape.maxIndexEntriesPerBlock).foreach { chunk =>
        val payload = nonRootIndexPayload(chunk)
        uncompressedIndexSize += payload.length
        val magic = if (deepest) LeafIndexMagic else IntermediateIndexMagic
        val size = writeBlock(out, magic, payload, -1L, shape.codec,
          shape.bytesPerChecksum)
        if (deepest) leafBlocks += ((offset, size))
        next += RootIndexEntry(offset, size, chunk.head.firstKey)
        offset += size
      }
      level = next.toSeq
      numLevels += 1
      deepest = false
    }

    // load-on-open: root index then file info
    val loadOnOpenOffset = offset
    val idxBuf = new ByteArrayOutputStream()
    val idxOut = new DataOutputStream(idxBuf)
    level.foreach { e =>
      idxOut.writeLong(e.offset)
      idxOut.writeInt(e.onDiskSize)
      writeVLong(idxOut, e.firstKey.length)
      idxOut.write(e.firstKey)
    }
    if (numLevels > 1) {
      // midkey metadata: the deepest-level block holding the middle
      // data entry + its position in it (BlockIndexChunk.getMidKeyMetadata;
      // used for region splits, ignored by this reader)
      val midIdx = ((dataEntries.size - 1) / 2)
      val leafNo = midIdx / shape.maxIndexEntriesPerBlock
      val (leafOff, leafSize) = leafBlocks(leafNo)
      idxOut.writeLong(leafOff)
      idxOut.writeInt(leafSize)
      idxOut.writeInt(midIdx % shape.maxIndexEntriesPerBlock)
    }
    val idxPayload = idxBuf.toByteArray
    uncompressedIndexSize += idxPayload.length
    offset += writeBlock(out, RootIndexMagic, idxPayload, -1L, shape.codec,
      shape.bytesPerChecksum)

    val fileInfoOffset = offset
    val infoEntries = mutable.ArrayBuffer[(String, Array[Byte])](
      InfoLastKey -> lastKey,
      InfoAvgKeyLen -> { val b = new ByteArrayOutputStream()
        new DataOutputStream(b).writeInt(lastKey.length); b.toByteArray })
    if (shape.includesMvcc)
      infoEntries += InfoMaxMemstoreTs -> { val b = new ByteArrayOutputStream()
        new DataOutputStream(b).writeLong(entryCount); b.toByteArray }
    if (shape.includesTags)
      infoEntries += InfoMaxTagsLen -> { val b = new ByteArrayOutputStream()
        new DataOutputStream(b).writeInt(maxTagsLen); b.toByteArray }
    if (shape.encoding == EncodingFastDiff)
      infoEntries += InfoDataBlockEncoding ->
        "FAST_DIFF".getBytes(StandardCharsets.UTF_8)
    if (seqId >= 0L)
      infoEntries += InfoMaxSeqId -> { val b = new ByteArrayOutputStream()
        new DataOutputStream(b).writeLong(seqId); b.toByteArray }
    if (bloomChunks.nonEmpty)
      infoEntries += InfoBloomFilterType ->
        "ROW".getBytes(StandardCharsets.UTF_8)
    val infoPayload =
      if (shape.majorVersion >= 3) pbufFileInfoPayload(infoEntries.toSeq)
      else legacyFileInfoPayload(infoEntries.toSeq)
    offset += writeBlock(out, FileInfoMagic, infoPayload, -1L, shape.codec,
      shape.bytesPerChecksum)

    // general bloom meta: the "additional load-on-open data" slot
    // after FileInfo; readers walk to it from the FileInfo block
    if (bloomChunks.nonEmpty) {
      val metaPayload = bloomMetaPayload(
        bloomChunks.size.toLong * bloomByteSize(shape.bloomRowsPerChunk, 0.01),
        bloomHashes, bloomKeyCount,
        bloomChunks.size.toLong * shape.bloomRowsPerChunk, bloomChunks.toSeq)
      offset += writeBlock(out, BloomMetaMagic, metaPayload, -1L, shape.codec,
        shape.bytesPerChecksum)
    }

    val comparator =
      if (shape.majorVersion >= 3) "org.apache.hadoop.hbase.CellComparatorImpl"
      else "org.apache.hadoop.hbase.KeyValue$KVComparator"
    writeTrailer(out, Trailer(fileInfoOffset, loadOnOpenOffset,
      level.size, 0, entryCount, shape.codec, numLevels, firstDataOffset,
      lastDataOffset, shape.majorVersion, 3), uncompressedIndexSize,
      totalUncompressed, comparator)

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

/** [[EnvelopeStore]] over a directory of HFile v2/v3 files — the real
  * form of the 5-step snapshot-scan contract (the production plan the
  * former sketch documented, now exercised code):
  *
  *  1. resolve: every `*.hfile` in the snapshot dir, PRUNED to those
  *     whose [firstRow, lastRow] byte range overlaps the slice
  *     (first/last keys from load-on-open state, memoised per JVM —
  *     the manifest-broadcast analogue);
  *  2. seek: each file's block index — single- or multi-level — is
  *     binary-searched level by level to the last data block whose
  *     first row <= the slice start ([[HFileV2Format.IndexCursor]]),
  *     decode-forward from there;
  *  3. heap-merge of the per-file scanners in (row ASC, ts DESC,
  *     generation DESC) order — overlapping files are an HBase
  *     region's un-compacted generations; ties on (row, ts) resolve
  *     to the newer file like HBase's sequence-id rule — keeping only
  *     the latest in-range version per row; the ts range is applied
  *     AT THE DECODER, so out-of-range cells never materialize their
  *     value (raw blocks) or never leave the block decoder (encoded);
  *  4. stop-at-slice-end: scanning ends at the first row whose first
  *     unsigned byte reaches the slice stop;
  *  5. block checksums verify on every read — a torn or bit-flipped
  *     block raises, it never decodes silently (the trait's retry
  *     contract then reruns the task attempt cleanly).
  */
final case class HFileSnapshotStore(dir: String,
    failAfterEntries: Option[Int] = None) extends EnvelopeStore {

  import HFileV2Format._

  /** The DSv2 point-predicate path: bloom-consulting [[multiGet]]. */
  override def get(rows: Seq[Array[Byte]], ts: TsRange): Iterator[EnvelopeCell] =
    multiGet(rows, ts).found.iterator

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
      // generation order: FileInfo MAX_SEQ_ID when the writer recorded
      // it (real store files — their names are random hashes, so name
      // order means nothing there), sorted-name index as the fallback
      val seq = readMeta(p).maxSeqId.getOrElse(ord.toLong)
      new HFileScanner(p, lo, hi, ts, seq, failAfterEntries)
    }.filter(_.hasNext)

    val ord = new Ordering[HFileScanner] {
      override def compare(a: HFileScanner, b: HFileScanner): Int = {
        val c = java.util.Arrays.compareUnsigned(b.head.key, a.head.key)
        if (c != 0) c
        else {
          val t = java.lang.Long.compare(a.head.ts, b.head.ts)
          if (t != 0) t else java.lang.Long.compare(a.seqId, b.seqId)
        }
      }
    }
    val pq = mutable.PriorityQueue(scanners.toSeq: _*)(ord)

    // Row-group merge with tombstone masking — the region server's
    // ScanQueryMatcher + DeleteTracker semantics, which the reference
    // gets free from HBase on its live scan (batch/HBaseReader
    // .kt:145-187): all cells of one row — put versions AND delete
    // markers, across every generation file — drain from the heap
    // together (memory bounded by the row's cell count), the four
    // delete scopes apply, and the row emits its newest surviving
    // in-range put (exact-ts generation tie → highest sequence id) or
    // nothing. A marker masks matching puts from EVERY generation,
    // including puts written after it at a masked ts (HBase's
    // documented puts-after-delete masking — only a major compaction
    // drops the marker). Markers themselves never emit.
    new Iterator[EnvelopeCell] {
      private var nextCell: EnvelopeCell = _
      private val rowCells = mutable.ArrayBuffer.empty[(HFileEntry, Long)]

      private def advance(): Unit = {
        while (nextCell == null && pq.nonEmpty) {
          val row = pq.head.head.key
          rowCells.clear()
          while (pq.nonEmpty && java.util.Arrays.equals(pq.head.head.key, row)) {
            val s = pq.dequeue()
            val e = s.next()
            rowCells += ((e, s.seqId))
            if (s.hasNext) pq.enqueue(s)
          }
          HFileSnapshotStore.selectRowWinner(rowCells).foreach { w =>
            nextCell = EnvelopeCell(w.key, w.ts,
              new String(w.value, StandardCharsets.UTF_8))
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

  /** Point-get over the snapshot — the GET path a real region server
    * answers from its blooms: for each probed row, every generation
    * file whose [firstRow, lastRow] covers the row consults its
    * general ROW bloom FIRST (one chunk directory binary search + one
    * bloom chunk block), and only maybe-present files pay the block
    * index descent + data block fetch. Delete markers are bloom
    * visible (the writer keys every cell's row), so a bloom skip can
    * never lose a tombstone; matched cells across files then pass
    * through the SAME tracker+selection as [[scan]].
    *
    * `useBloom = false` is the observability control: the report's
    * `dataBlocksRead` under it measures what the bloom saves. At 100
    * TB this is the difference between touching O(|files|) index
    * descents per probe and O(matching files): a selective audit
    * (recover N keys from a snapshot of thousands of store files)
    * reads ~hashCount bits per non-matching file instead of a block.
    *
    * Memory contract: the per-call block caches are LRU-BOUNDED —
    * at most [[HFileSnapshotStore.ProbeBlockCacheCap]] decoded data
    * blocks and [[HFileSnapshotStore.ProbeBloomCacheCap]] bloom chunk
    * bit arrays resident at once — so a probe batch of any row count
    * over any snapshot width runs in O(cap × blockSize) memory, not
    * O(touched blocks). Sorted probe batches (the DSv2 probe plan
    * sorts rows) keep their block reuse: adjacent rows hit adjacent
    * blocks well inside the cap. */
  def multiGet(rows: Seq[Array[Byte]], ts: TsRange,
      useBloom: Boolean = true): HFileProbeReport = {
    import scala.jdk.CollectionConverters._
    val paths = Files.list(Paths.get(dir)).iterator().asScala
      .map(_.toString).filter(_.endsWith(".hfile")).toSeq.sorted
    val metas = paths.zipWithIndex.map { case (p, ord) =>
      val m = readMeta(p)
      (p, m, m.maxSeqId.getOrElse(ord.toLong))
    }
    var filesConsidered = 0
    var bloomSkips = 0
    var bloomChunksRead = 0
    var bloomErrors = 0
    var dataBlocksRead = 0
    def lru[K, V](cap: Int): java.util.LinkedHashMap[K, V] =
      new java.util.LinkedHashMap[K, V](16, 0.75f, true) {
        override def removeEldestEntry(e: java.util.Map.Entry[K, V]): Boolean =
          size > cap
      }
    val bloomBitsCache =
      lru[(String, Int), Array[Byte]](HFileSnapshotStore.ProbeBloomCacheCap)
    val blockCache = lru[(String, Long), Array[HFileEntry]](
      HFileSnapshotStore.ProbeBlockCacheCap)
    val rafs = mutable.Map.empty[String, RandomAccessFile]
    def rafFor(p: String): RandomAccessFile =
      rafs.getOrElseUpdate(p, new RandomAccessFile(p, "r"))

    def fetchRow(p: String, meta: HFileMeta, row: Array[Byte], range: TsRange,
        seq: Long): Seq[(HFileEntry, Long)] = {
      val out = mutable.ArrayBuffer.empty[(HFileEntry, Long)]
      val raf = rafFor(p)
      val cursor = new IndexCursor(meta)
      cursor.seek(raf, row)
      var done = false
      while (!done) {
        val entry = cursor.next(raf)
        if (entry == null) done = true
        else {
          var cells = blockCache.get((p, entry.offset))
          if (cells == null) {
            dataBlocksRead += 1
            val (magic, payload, _) = readBlockOneOf(raf, entry.offset,
              Seq(DataMagic, EncodedDataMagic), meta.trailer.compressionCodec)
            val dec = cellDecoder(magic, payload, meta)
            val buf = mutable.ArrayBuffer.empty[HFileEntry]
            var k = dec.nextKey()
            while (k != null) {
              buf += HFileEntry(rowOf(k), tsOf(k), dec.readValue(),
                typeOf(k), qualifierOf(k))
              k = dec.nextKey()
            }
            cells = buf.toArray
            blockCache.put((p, entry.offset), cells)
          }
          var sawBeyond = false
          cells.foreach { e =>
            val c = java.util.Arrays.compareUnsigned(e.key, row)
            if (c == 0) {
              // same put-vs-marker ts-range rule as the slice scan
              val emit =
                if (isDelete(e.typ)) e.ts >= range.lo
                else range.contains(e.ts)
              if (emit) out += ((e, seq))
            } else if (c > 0) sawBeyond = true
          }
          // the row's cells can span a block boundary; stop once a
          // block contains a row beyond the target
          if (sawBeyond) done = true
        }
      }
      out.toSeq
    }

    try {
      val found = rows.flatMap { row =>
        val cells = mutable.ArrayBuffer.empty[(HFileEntry, Long)]
        metas.foreach { case (p, meta, seq) =>
          val inRange =
            java.util.Arrays.compareUnsigned(meta.firstRow, row) <= 0 &&
              meta.lastRow.forall(java.util.Arrays.compareUnsigned(row, _) <= 0)
          if (inRange) {
            filesConsidered += 1
            val maybe = (useBloom, meta.bloom) match {
              case (true, Some(b)) =>
                // chunk directory firstKeys are RAW bloom keys (the
                // row bytes), not cell keys — floor-search them raw
                var lo = 0; var hi = b.index.length - 1; var chunk = -1
                while (lo <= hi) {
                  val mid = (lo + hi) >>> 1
                  if (java.util.Arrays.compareUnsigned(
                      b.index(mid).firstKey, row) <= 0) {
                    chunk = mid; lo = mid + 1
                  } else hi = mid - 1
                }
                if (chunk < 0) false // sorts before every chunk's first key
                else {
                  // a bloom is ADVISORY: a torn/corrupt chunk (CRC
                  // failure here) must degrade to the full index
                  // descent, never fail a probe the data could answer
                  try {
                    var bits = bloomBitsCache.get((p, chunk))
                    if (bits == null) {
                      bloomChunksRead += 1
                      bits = readBlock(rafFor(p), b.index(chunk).offset,
                        BloomChunkMagic, meta.trailer.compressionCodec)._1
                      bloomBitsCache.put((p, chunk), bits)
                    }
                    bloomContains(bits, row, b.hashCount)
                  } catch {
                    case _: IOException => bloomErrors += 1; true
                  }
                }
              case _ => true
            }
            if (!maybe) bloomSkips += 1
            else cells ++= fetchRow(p, meta, row, ts, seq)
          }
        }
        HFileSnapshotStore.selectRowWinner(cells).map(w =>
          EnvelopeCell(w.key, w.ts, new String(w.value, StandardCharsets.UTF_8)))
      }
      HFileProbeReport(found, rows.size, filesConsidered, bloomSkips,
        bloomChunksRead, dataBlocksRead, bloomErrors)
    } finally rafs.values.foreach(r =>
      try r.close() catch { case _: IOException => })
  }
}

/** Result + cost accounting of one [[HFileSnapshotStore.multiGet]]:
  * `found` carries the surviving winner per probed row (absent and
  * fully-masked rows contribute nothing); the counters make the bloom
  * skip OBSERVABLE — `bloomSkips` files never paid an index descent,
  * and `dataBlocksRead` under `useBloom = false` measures the saving. */
final case class HFileProbeReport(found: Seq[EnvelopeCell], rowsProbed: Int,
    filesConsidered: Int, bloomSkips: Int, bloomChunksRead: Int,
    dataBlocksRead: Int,
    // unreadable bloom chunks (CRC/parse) that degraded to a full
    // descent — nonzero means the snapshot needs attention, but the
    // probe's ANSWER is unaffected (blooms are advisory)
    bloomErrors: Int = 0)

object HFileSnapshotStore {
  import HFileV2Format._

  /** LRU caps of [[HFileSnapshotStore.multiGet]]'s per-call caches —
    * the probe path's memory contract: at most this many decoded data
    * blocks / bloom chunk bit arrays resident, regardless of probe
    * batch size or snapshot width (evicted blocks re-read and re-count
    * in `dataBlocksRead` — honest accounting). */
  val ProbeBlockCacheCap = 64
  val ProbeBloomCacheCap = 256

  /** Tombstone tracker + winner selection over ALL cells of one row
    * (across every generation file): the four delete scopes mask, the
    * newest surviving in-range put wins, exact-ts generation tie goes
    * to the highest sequence id. The exact-version scopes can mask the
    * newest put while sparing an older one, so selection runs only
    * AFTER the row's tracker is complete. Shared verbatim by the slice
    * scan's heap-merge and [[HFileSnapshotStore.multiGet]] — the two
    * paths cannot drift. */
  private[sources] def selectRowWinner(
      cells: scala.collection.Seq[(HFileEntry, Long)]): Option[HFileEntry] = {
    var famMax = Long.MinValue
    var famVers: Set[Long] = Set.empty
    var colMax = Map.empty[Seq[Byte], Long]
    var colVers = Set.empty[(Seq[Byte], Long)]
    cells.foreach { case (e, _) =>
      e.typ match {
        case KeyTypeDeleteFamily => famMax = math.max(famMax, e.ts)
        case KeyTypeDeleteFamilyVersion => famVers += e.ts
        case KeyTypeDeleteColumn =>
          val q = e.qualifier.toSeq
          colMax += q -> math.max(colMax.getOrElse(q, Long.MinValue), e.ts)
        case KeyTypeDelete => colVers += ((e.qualifier.toSeq, e.ts))
        case _ => ()
      }
    }
    var winner: HFileEntry = null
    var winnerSeq = Long.MinValue
    cells.foreach { case (e, sSeq) =>
      if (!isDelete(e.typ)) {
        val masked = e.ts <= famMax || famVers.contains(e.ts) ||
          e.ts <= colMax.getOrElse(e.qualifier.toSeq, Long.MinValue) ||
          colVers.contains((e.qualifier.toSeq, e.ts))
        if (!masked && (winner == null || e.ts > winner.ts ||
            (e.ts == winner.ts && sSeq > winnerSeq))) {
          winner = e; winnerSeq = sSeq
        }
      }
    }
    Option(winner)
  }
}

private[sources] final case class HFileEntry(key: Array[Byte], ts: Long,
    value: Array[Byte], typ: Byte = HFileV2Format.KeyTypePut,
    qualifier: Array[Byte] = HFileV2Format.Qualifier)

/** Sequential KeyValue scanner over one HFile, seeked to a slice
  * start: descends the (possibly multi-level) block index, decodes
  * data blocks in file order (verifying each checksum, raw or
  * FAST_DIFF), skips pre-slice rows, drops out-of-ts-range cells, and
  * ends at the slice stop byte. Survives one (injected or real)
  * IOException per `reopensLeft` by reopening the file and reseeking
  * to strictly past the last entry it returned — the same
  * within-attempt reopen-at-key contract [[RunScanner]] implements
  * (the reference's resume-at-key, HBaseReader.kt:62-90). */
private[sources] final class HFileScanner(path: String, loByte: Int,
    hiByte: Int, range: TsRange, val seqId: Long,
    failAfter: Option[Int] = None)
    extends Iterator[HFileEntry] {

  import HFileV2Format._

  private val meta = readMeta(path)
  private val seekRow = Array[Byte]((loByte & 0xff).toByte)
  private var raf: RandomAccessFile = _
  private val cursor = new IndexCursor(meta)
  private var decoder: CellDecoder = _
  private var exhausted = false
  private var nextE: HFileEntry = _
  private var lastCellKey: Array[Byte] = _
  private var pendingKey: Array[Byte] = _
  private var decoded = 0
  private var faultFired = false
  private var reopensLeft = 2

  open()

  /** (Re)open the file positioned at the seek block for either the
    * slice start (fresh scan) or the last returned cell's row (retry). */
  private def open(): Unit = {
    HFileV2Format.opens.incrementAndGet()
    raf = new RandomAccessFile(path, "r")
    cursor.seek(raf, if (lastCellKey == null) seekRow else rowOf(lastCellKey))
    decoder = null
  }

  /** A cell is not-yet-returned iff it sorts strictly after the resume
    * point in full-key file order ([[HFileV2Format.compareCellKeys]] —
    * row/qualifier ASC, ts/type DESC, so a delete marker and the put
    * it masks at the same (row, ts) resume distinctly). Skipped
    * (pre-seek / out-of-range) cells re-skip deterministically on
    * replay, so the predicate only needs the last RETURNED cell. */
  private def behindResumePoint(key: Array[Byte], row: Array[Byte]): Boolean =
    if (lastCellKey == null) java.util.Arrays.compareUnsigned(row, seekRow) < 0
    else compareCellKeys(key, lastCellKey) <= 0

  private def close(): Unit = {
    exhausted = true
    try if (raf != null) raf.close() catch { case _: IOException => }
  }

  /** Decode forward to the next emittable entry; null = end of slice
    * or file. Throws IOException on faults (incl. injected). */
  private def decodeNext(): HFileEntry = {
    while (true) {
      if (decoder == null) {
        val entry = cursor.next(raf)
        if (entry == null) return null
        val (magic, payload, _) = readBlockOneOf(raf, entry.offset,
          Seq(DataMagic, EncodedDataMagic), meta.trailer.compressionCodec)
        decoder = cellDecoder(magic, payload, meta)
      }
      val key = decoder.nextKey()
      if (key == null) { decoder = null }
      else {
        decoded += 1
        if (!faultFired && failAfter.exists(decoded >= _)) {
          faultFired = true
          throw new IOException(s"injected fault after $decoded entries")
        }
        val row = rowOf(key)
        if ((row(0) & 0xff) >= hiByte) return null // stop-at-slice-end
        val ts = tsOf(key)
        val typ = typeOf(key)
        // puts must be IN the pushed range; delete markers must only be
        // >= its floor (ScanQueryMatcher's withinOrAfterTimeRange): a
        // marker NEWER than the range ceiling still masks in-range
        // cells <= its ts, one older than the floor can mask nothing
        // in range
        val emit =
          if (isDelete(typ)) ts >= range.lo
          else range.contains(ts)
        if (behindResumePoint(key, row) || !emit) {
          // pre-seek row, already-returned entry on a reopen, or
          // out-of-range version
          decoder.skipValue()
        } else {
          pendingKey = key
          return HFileEntry(row, ts, decoder.readValue(), typ, qualifierOf(key))
        }
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
      else lastCellKey = pendingKey
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
    new ConcurrentHashMap[(Long, Int, Int, Int, Long, HFileShape), String]()

  /** Memoised per-JVM snapshot dir for (n, versions, regions, gens,
    * tsSpread, shape) — written once under java.io.tmpdir. */
  def snapshotDir(n: Long, versions: Int, regions: Int, gens: Int,
      tsSpread: Long = 0L, codec: Int = HFileV2Format.CodecGz,
      shape: HFileShape = null): String = {
    val s = if (shape != null) shape else HFileShape(codec = codec)
    snapshotMemo.computeIfAbsent((n, versions, regions, gens, tsSpread, s), { _ =>
      val dir = Files.createTempDirectory("graft-hfile")
      writeSnapshot(dir, n, versions, regions, gens, tsSpread, shape = s)
      dir.toString
    })
  }

  def writeSnapshot(dir: Path, n: Long, versions: Int, regions: Int,
      gens: Int, tsSpread: Long = 0L, codec: Int = HFileV2Format.CodecGz,
      blockEntries: Int = HFileV2Writer.DefaultBlockEntries,
      shape: HFileShape = null): Unit = {
    val s = if (shape != null) shape
      else HFileShape(codec = codec, blockEntries = blockEntries)
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
      // generation ordering travels BOTH ways a real snapshot can
      // carry it: zero-padded file names (fixture convention) and the
      // authoritative FileInfo MAX_SEQ_ID
      HFileV2Writer.writeCells(dir.resolve(f"region-r$r%03d-g$g%03d.hfile"),
        sorted.iterator.map { case (row, ts, v) => HFileCell(row, ts, v) },
        s, seqId = g.toLong)
    }
  }

  private val tombstoneMemo = new ConcurrentHashMap[(Long, Int), String]()

  /** Memoised snapshot with INTERLEAVED puts and delete markers across
    * generations — the between-major-compactions state of a real
    * table. Base corpus = the multi-version fixture (key i: 1 + i%5
    * put versions at ts 1000+v, spread over 2 generations); a THIRD
    * generation (highest seq id) carries one marker per key class
    * `i % 10`, covering all four delete scopes:
    *
    *  - class 1 (versions v0,v1):    DeleteFamily @1001 — whole row
    *    masked (every version <= 1001), the key must NOT export;
    *  - class 2 (v0..v2):            DeleteColumn @1001 — v0/v1
    *    masked, the NEWER v2 put survives the older marker;
    *  - class 3 (v0..v3):            Delete @1002 — exactly v2
    *    masked, the scan's [1000,1003) winner falls back to v1;
    *  - class 4 (v0..v4):            DeleteFamilyVersion @1002 —
    *    exactly ts 1002 masked family-wide, winner falls back to v1;
    *  - class 6 (v0,v1):             Delete @1001 — v1 masked,
    *    winner falls back to v0;
    *  - classes 0,5,7,8,9: no markers — the q47 winner arithmetic
    *    must hold untouched.
    */
  def tombstoneSnapshotDir(n: Long, regions: Int = 4): String =
    tombstoneMemo.computeIfAbsent((n, regions), { _ =>
      val dir = Files.createTempDirectory("graft-hfile-tomb")
      writeSnapshot(dir, n, versions = 5, regions = regions, gens = 2)
      val ks = Fixture.keyService
      val dek = ks.batchDataKey().plaintextDataKey
      val encKey = ks.encryptKey(Fixture.MasterKeyId, dek)
      val regionWidth = 256 / regions
      val markers = Array.fill(regions)(mutable.ArrayBuffer.empty[HFileCell])
      var i = 0L
      while (i < n) {
        val c = Fixture.cell(i, dek, encKey, corrupt = false, 0)
        val row = c.hbase_id
        val region = (row(0) & 0xff) / regionWidth
        import HFileV2Format._
        (i % 10) match {
          case 1 => markers(region) += HFileCell(row, 1001L,
            Array.emptyByteArray, KeyTypeDeleteFamily, EmptyQualifier)
          case 2 => markers(region) += HFileCell(row, 1001L,
            Array.emptyByteArray, KeyTypeDeleteColumn, Qualifier)
          case 3 => markers(region) += HFileCell(row, 1002L,
            Array.emptyByteArray, KeyTypeDelete, Qualifier)
          case 4 => markers(region) += HFileCell(row, 1002L,
            Array.emptyByteArray, KeyTypeDeleteFamilyVersion, EmptyQualifier)
          case 6 => markers(region) += HFileCell(row, 1001L,
            Array.emptyByteArray, KeyTypeDelete, Qualifier)
          case _ => ()
        }
        i += 1
      }
      for (r <- 0 until regions if markers(r).nonEmpty) {
        val sorted = markers(r).sortWith { (a, b) =>
          HFileV2Format.compareCellKeys(
            HFileV2Format.cellKey(a.row, a.ts, a.typ, a.qualifier),
            HFileV2Format.cellKey(b.row, b.ts, b.typ, b.qualifier)) < 0
        }
        HFileV2Writer.writeCells(dir.resolve(f"region-r$r%03d-g002.hfile"),
          sorted.iterator, HFileShape(codec = HFileV2Format.CodecGz),
          seqId = 2L)
      }
      dir.toString
    })
}
