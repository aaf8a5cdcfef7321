package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset}

/** Decode / feature-extract stage for multimodal binary columns — the
  * Scala analogue of a Pandas-UDF-over-`mapInPandas` stage: binary
  * column in, typed feature struct out, processed partition-at-a-time
  * so per-task decoder initialization (codec tables, a model handle)
  * amortizes over the whole partition.
  *
  * The DECODE step itself is a clearly-marked STUB: this container
  * ships no image/audio codecs, so [[StubDecoder]] derives
  * deterministic pseudo-features from the bytes. Swapping in a real
  * decoder (e.g. TwelveMonkeys/JavaCV behind the same trait) changes
  * no Spark plumbing: schema, partitioning, batch shape and the
  * accounting contract stay identical.
  *
  * Scale: one decoder instance per task, rows streamed (no partition
  * materialization), output is a narrow fixed-width struct — the blob
  * bytes are dropped as early as possible so downstream stages never
  * shuffle media payloads.
  */
object MultimodalDecode {

  /** The decoded feature row (what a real image decode would yield). */
  final case class Decoded(
      doc_id: Long,
      size_bytes: Int,
      width: Int,
      height: Int,
      channels: Int,
      // stubbed content features: a 8-bin byte histogram, L1-normalized
      histogram: Array[Float],
      decode_ok: Boolean)

  /** Decoder contract: one instance per task (init amortized). */
  trait Decoder extends Serializable {
    /** Called once per task before the first record. */
    def init(): Unit
    def decode(docId: Long, bytes: Array[Byte]): Decoded
  }

  /** STUB decode — deterministic fake standing in for a real media
    * decoder (none available in this container). Header fields mirror
    * the synthetic header convention of
    * [[graft.queries.Multimodal.q33BlobMeta]]; the "histogram" is a
    * real byte histogram of the payload, which a real decoder would
    * replace with pixel statistics. */
  final class StubDecoder extends Decoder {
    @transient private var initialized = false
    override def init(): Unit = { initialized = true }
    override def decode(docId: Long, bytes: Array[Byte]): Decoded = {
      require(initialized, "decoder used before init()")
      if (bytes == null || bytes.length < 3)
        Decoded(docId, if (bytes == null) 0 else bytes.length, 0, 0, 0,
          Array.fill(8)(0f), decode_ok = false)
      else {
        val counts = new Array[Int](8)
        bytes.foreach(b => counts((b & 0xff) >> 5) += 1)
        val n = bytes.length.toFloat
        Decoded(docId, bytes.length,
          (bytes(0) & 0xff) + 1, (bytes(1) & 0xff) + 1,
          (bytes(2) & 0xff) % 4 + 1,
          counts.map(_ / n), decode_ok = true)
      }
    }
  }

  /** Run the decode stage over a DataFrame with (doc_id: long,
    * blob: binary) columns. */
  def decodeFeatures(blobs: DataFrame,
      decoder: Decoder = new StubDecoder): Dataset[Decoded] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.select("doc_id", "blob").as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        decoder.init() // once per task, before the first record
        rows.map { case (id, bytes) => decoder.decode(id, bytes) }
      }
  }
}
