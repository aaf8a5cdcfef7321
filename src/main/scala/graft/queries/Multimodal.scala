package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Multimodal (binary) column operators — the training-data-pipeline
  * surface for opaque image/audio/video payloads: content hashing,
  * header/metadata extraction, and perceptual-hash near-duplicate
  * detection over Hamming distance with LSH banding.
  *
  * The binary fixture is synthesized deterministically from `documents`
  * with md5-chains (expressible identically in Spark and DuckDB, so
  * every operator is oracle-checked end-to-end — no rows-only checks):
  *  - every 50th doc shares blob content with doc 0 (planted exact
  *    duplicates for the content-hash dedup);
  *  - docs in the same (doc_id mod 97) group share a perceptual-hash
  *    base with one per-doc nibble of noise (planted near-duplicates
  *    for the Hamming path).
  *
  * Scale notes (100 TB): blob synthesis/hashing/metadata extraction are
  * per-row expressions (no shuffle, codegen-friendly); the near-dup
  * join is LSH-banded on 32-bit (8-nibble) band keys — linear, never
  * all-pairs, occupancy bounded at N/2^32 per bucket — and the Hamming
  * verify ships 64-char phashes only, never blob bytes.
  * For real media the synthesis column is replaced by a binary column
  * read from parquet; see [[graft.pipeline.MultimodalDecode]] for the
  * decode/feature-extract stage stub.
  */
object Multimodal {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  // ------------------------------------------------- shared synthesis

  /** Spark: doc_id + blob (binary) + blob_hex. */
  private def withBlob(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .withColumn("seed",
        when(col("doc_id") % 50 === 0, 0L).otherwise(col("doc_id")))
      .withColumn("blob_hex", expr(
        """array_join(transform(sequence(0, CAST(2 + seed % 7 AS INT) - 1),
          |  i -> md5(concat('blob:', CAST(i AS STRING), ':', CAST(seed AS STRING)))), '')""".stripMargin))
      .withColumn("blob", unhex(col("blob_hex")))

  private val blobCte: String =
    """WITH seeded AS (
      |  SELECT doc_id, CASE WHEN doc_id % 50 = 0 THEN 0 ELSE doc_id END AS seed
      |  FROM documents),
      |blobs AS (
      |  SELECT doc_id, seed,
      |    array_to_string(list_transform(range(0, CAST(2 + seed % 7 AS INT)),
      |      i -> md5('blob:' || CAST(i AS VARCHAR) || ':' || CAST(seed AS VARCHAR))), '') AS blob_hex
      |  FROM seeded),
      |binary_blobs AS (SELECT doc_id, seed, blob_hex, unhex(blob_hex) AS blob
      |  FROM blobs)""".stripMargin

  // --------------------------------------------------- q33 blob meta
  /** Header-style metadata extraction from the binary column: size and
    * width/height/channels/format decoded from the leading bytes (the
    * plumbing a real image-header parse would use — Spark reads the
    * BYTES; the oracle twin reads the equal hex form because DuckDB
    * cannot slice blobs). */
  def q33BlobMeta(s: SparkSession, dir: String): DataFrame =
    withBlob(s, dir).select(
      col("doc_id"),
      length(col("blob")).as("size_bytes"),
      (conv(hex(expr("substring(blob, 1, 1)")), 16, 10).cast("long") + 1)
        .as("width"),
      (conv(hex(expr("substring(blob, 2, 1)")), 16, 10).cast("long") + 1)
        .as("height"),
      (conv(hex(expr("substring(blob, 3, 1)")), 16, 10).cast("long") % 4 + 1)
        .as("channels"),
      element_at(array(lit("png"), lit("jpg"), lit("webp")),
        (col("seed") % 3 + 1).cast("int")).as("format"))
      .orderBy("doc_id")

  val q33Sql: String =
    s"""$blobCte
       |SELECT doc_id,
       |octet_length(blob) AS size_bytes,
       |('0x' || substr(blob_hex, 1, 2))::BIGINT + 1 AS width,
       |('0x' || substr(blob_hex, 3, 2))::BIGINT + 1 AS height,
       |('0x' || substr(blob_hex, 5, 2))::BIGINT % 4 + 1 AS channels,
       |(['png', 'jpg', 'webp'])[CAST(seed % 3 + 1 AS INT)] AS format
       |FROM binary_blobs ORDER BY doc_id""".stripMargin

  // --------------------------------------------------- q34 blob hash
  /** Content-hash dedup over the binary column (the multimodal
    * exact-dedup path; hash-groupBy, map-side combinable). The
    * fingerprint hashes the hex form — bijective with the bytes, and
    * DuckDB's md5 cannot take a BLOB — so both engines hash the
    * identical string. */
  def q34BlobHash(s: SparkSession, dir: String): DataFrame =
    withBlob(s, dir).select(md5(col("blob_hex").cast("binary")).as("fp"))
      .agg(count(lit(1)).as("n_blobs"),
        countDistinct(col("fp")).as("n_distinct"),
        (count(lit(1)) - countDistinct(col("fp"))).as("n_dup"))

  val q34Sql: String =
    s"""$blobCte
       |SELECT COUNT(*) AS n_blobs, COUNT(DISTINCT md5(blob_hex)) AS n_distinct,
       |COUNT(*) - COUNT(DISTINCT md5(blob_hex)) AS n_dup FROM binary_blobs""".stripMargin

  // ----------------------------------------------- q35 phash near-dup
  /** Perceptual-hash near-duplicates: [[PhashNibbles]]-nibble phash per
    * blob, LSH over [[PhashNumBands]] bands of [[PhashBandNibbles]]
    * nibbles, nibble-Hamming verify (≤ 2). The band join reuses the
    * MinHash+LSH machinery shape: narrow band keys, candidates only,
    * never all-pairs. */

  /** Band sizing for 100×: each band key is 8 nibbles = 32 bits —
    * 2^32 buckets per band bounds expected occupancy at N/2^32 (~0.25
    * rows/bucket at 10^9 blobs), where the old 4-nibble/16-bit bands
    * (65,536 buckets) went quadratic within buckets past ~10^7 blobs.
    * Pigeonhole: pairs within nibble-Hamming ≤ NumBands-1 = 7 share a
    * band, comfortably covering the ≤2 verify ball; to widen the ball
    * at constant occupancy, add bands (the parameters are free —
    * derive them from expected N and ball radius). */
  val PhashNibbles = 64 // 256-bit hash
  val PhashBandNibbles = 8 // 32 bits per band
  val PhashNumBands: Int = PhashNibbles / PhashBandNibbles // 8

  // 64-nibble synthetic phash = 4 chained md5s on the (doc_id % 97)
  // group, with one per-doc noise nibble at position doc_id % 64 —
  // same-group docs sit at nibble-Hamming <= 2, cross-group pairs at
  // ~60, so the planted structure survives any band layout.
  private val phashBaseSpark: String =
    """array_join(transform(sequence(0, 3),
      |  i -> md5(concat('phash:', CAST(i AS STRING), ':',
      |                  CAST(doc_id % 97 AS STRING)))), '')""".stripMargin

  private val phashSpark: String =
    s"""concat(
       |  substring($phashBaseSpark, 1, CAST(doc_id % 64 AS INT)),
       |  substring(md5(concat('noise:', CAST(doc_id AS STRING))), 1, 1),
       |  substring($phashBaseSpark,
       |            CAST(doc_id % 64 AS INT) + 2,
       |            63 - CAST(doc_id % 64 AS INT)))""".stripMargin

  private val phashBaseDuck: String =
    """array_to_string(list_transform(range(0, 4),
      |  i -> md5('phash:' || CAST(i AS VARCHAR) || ':' ||
      |           CAST(doc_id % 97 AS VARCHAR))), '')""".stripMargin

  private val phashDuck: String =
    s"""substr($phashBaseDuck, 1, CAST(doc_id % 64 AS INT)) ||
       |substr(md5('noise:' || CAST(doc_id AS VARCHAR)), 1, 1) ||
       |substr($phashBaseDuck,
       |       CAST(doc_id % 64 AS INT) + 2, 63 - CAST(doc_id % 64 AS INT))""".stripMargin

  // the phash relation feeds the band self-joins + 2 verify joins;
  // cache it (narrow: id + 64-char hash) with the same managed-
  // unpersist pattern as Dedup.cachedSignatures
  @transient private var cachedPhash: Option[(String, DataFrame)] = None
  private def phashed(s: SparkSession, dir: String): DataFrame = synchronized {
    cachedPhash match {
      case Some((d, df)) if d == dir => df
      case prev =>
        prev.foreach(_._2.unpersist())
        val df = docs(s, dir)
          .select(col("doc_id"), expr(phashSpark).as("ph")).cache()
        cachedPhash = Some((dir, df))
        df
    }
  }

  /** Banded candidate pairs (testable seam): the shared
    * [[graft.operators.LshBands]] machinery over the phash nibble
    * bands. */
  private[queries] def phashBandPairs(hashed: DataFrame): DataFrame = {
    val banded = hashed.select(col("doc_id") +: (0 until PhashNumBands).map(b =>
      substring(col("ph"), 1 + PhashBandNibbles * b, PhashBandNibbles)
        .as(s"band$b")): _*)
    graft.operators.LshBands.candidatePairs(banded, "doc_id",
      (0 until PhashNumBands).map(b => s"band$b"))
  }

  def q35PhashNearDup(s: SparkSession, dir: String): DataFrame = {
    val hashed = phashed(s, dir)
    val cand = phashBandPairs(hashed)
    // Nibble-Hamming as bitwise words (round 21): the per-PAIR lambda
    // (`filter(sequence(1,64), i -> substring(p1,i,1) != ...)`) is an
    // interpreted HOF — 128 interpreted substring evaluations per
    // candidate pair dominated the verify stage (measured: a ~1 s
    // single job over ~10⁵ pairs at sf0.1). Instead each DOC row (the
    // small, cached side of the verify joins) converts its 64 hex
    // nibbles to eight 32-bit words once; per pair the count of
    // differing nibbles is XOR + fold-to-nibble-flag + bit_count —
    // straight-line whole-stage-codegen long arithmetic. A nibble
    // differs iff its 4-bit XOR group is non-zero; OR-folding the
    // group onto its low bit and masking 0x1111… makes bit_count
    // count exactly those groups, so `hamming` is value-identical to
    // the lambda form (and to the DuckDB twin's list_filter).
    val nChunks = PhashNibbles / 8
    def words(pfx: String) =
      (0 until nChunks).map(i =>
        expr(s"CAST(conv(substring(ph, ${8 * i + 1}, 8), 16, 10) AS BIGINT)")
          .as(s"$pfx$i"))
    val h1 = hashed.select(col("doc_id").as("d1") +: words("pa"): _*)
    val h2 = hashed.select(col("doc_id").as("d2") +: words("pb"): _*)
    val nibbleMask = java.lang.Long.parseLong("1111111111111111", 16)
    val hammingExpr = (0 until nChunks).map { i =>
      val x = s"(pa$i ^ pb$i)"
      s"bit_count((($x | ($x >> 1) | ($x >> 2) | ($x >> 3)) & $nibbleMask))"
    }.mkString(" + ")
    cand.join(h1, "d1").join(h2, "d2")
      .withColumn("hamming", expr(hammingExpr))
      .filter(col("hamming") <= 2)
      .select(col("d1"), col("d2"), col("hamming"))
      .orderBy("d1", "d2")
  }

  val q35Sql: String = {
    val bandCols = (0 until PhashNumBands).map { b =>
      s"substr(ph, ${1 + PhashBandNibbles * b}, $PhashBandNibbles) AS band$b"
    }.mkString(", ")
    val bandJoins = (0 until PhashNumBands).map { b =>
      s"""  SELECT a.doc_id AS d1, b.doc_id AS d2 FROM banded a JOIN banded b
         |    ON a.band$b = b.band$b AND a.doc_id < b.doc_id""".stripMargin
    }.mkString("\n  UNION\n")
    s"""WITH hashed AS (SELECT doc_id, $phashDuck AS ph FROM documents),
       |banded AS (SELECT doc_id, ph, $bandCols FROM hashed),
       |cand AS (
       |$bandJoins),
       |scored AS (SELECT d1, d2,
       |  len(list_filter(range(1, ${PhashNibbles + 1}), i -> x.ph[i] != y.ph[i])) AS hamming
       |  FROM cand JOIN hashed x ON cand.d1 = x.doc_id
       |            JOIN hashed y ON cand.d2 = y.doc_id)
       |SELECT d1, d2, hamming FROM scored WHERE hamming <= 2
       |ORDER BY d1, d2""".stripMargin
  }

  // ---------------------------------------------- q169 frame sample
  /** Video-style frame sampling over the binary column: treat the blob
    * as a frame stream (8-byte frames), sample every 2nd frame
    * (stride-2 temporal subsampling — the standard pre-decode step of
    * a video training pipeline), and emit per-doc frame accounting
    * plus a content signature over the SAMPLED frames only (md5 chain
    * — the key a frame-level dedup or decode-batch scheduler would
    * group on).
    *
    * Scale: pure per-row expressions over the blob — no shuffle, no
    * explode (the frame loop is an array transform inside one
    * projection); a real codec swaps the substring slicing for a
    * container demuxer inside the same per-row stage
    * ([[graft.pipeline.MultimodalDecode]] holds that seam). Frame
    * counts use explicit floor division (`div` / DuckDB `//`) and the
    * sampled-signature sequence is guarded for the zero-frame blob, so
    * correctness does not lean on the fixture's
    * length-multiple-of-32 invariant (Spark's `sequence(0, -1)` is a
    * DESCENDING two-element array, not empty — the guard keeps that
    * foot-gun out of the plan). */
  def q169FrameSample(s: SparkSession, dir: String): DataFrame =
    withBlob(s, dir)
      .withColumn("n_frames", expr("length(blob_hex) div 16").cast("int"))
      .withColumn("n_sampled", expr("length(blob_hex) div 32").cast("int"))
      .select(
        col("doc_id"), col("n_frames"), col("n_sampled"),
        substring(col("blob_hex"), 1, 16).as("first_frame"),
        md5(expr(
          """IF(n_sampled > 0,
            |  array_join(transform(sequence(0, n_sampled - 1),
            |    i -> md5(substring(blob_hex, i * 32 + 1, 16))), ''), '')""".stripMargin))
          .as("sample_sig"))
      .orderBy("doc_id")

  val q169Sql: String =
    s"""$blobCte
       |SELECT doc_id,
       |CAST(length(blob_hex) // 16 AS INT) AS n_frames,
       |CAST(length(blob_hex) // 32 AS INT) AS n_sampled,
       |substr(blob_hex, 1, 16) AS first_frame,
       |md5(array_to_string(list_transform(
       |  range(0, CAST(length(blob_hex) // 32 AS INT)),
       |  i -> md5(substr(blob_hex, CAST(i * 32 + 1 AS INT), 16))), ''))
       |  AS sample_sig
       |FROM binary_blobs ORDER BY doc_id""".stripMargin

  // -------------------------------------------- q170 audio features
  /** Audio-style waveform feature extraction: interpret the blob as
    * unsigned 8-bit PCM samples and compute the accounting a corpus
    * audit keeps per clip — sample count, peak, mean amplitude, RMS
    * energy, midline (128) crossing count, and clipped-sample count.
    * The analogue of q25's text stats for the audio modality: the
    * features feed quality gates (silence/clipping filters) and
    * duration-balanced mixing.
    *
    * Determinism: samples decode to exact integers (hex-nibble
    * arithmetic via instr on a shared alphabet — no float parse), all
    * sums are integer folds, and the only doubles are final mean/RMS
    * divisions + sqrt on exact integer inputs — identical IEEE ops in
    * both engines. Scale: per-row array expressions in one projection;
    * no shuffle, no explode. */
  def q170AudioFeatures(s: SparkSession, dir: String): DataFrame =
    withBlob(s, dir)
      .withColumn("n_samples", expr("length(blob_hex) div 2").cast("int"))
      .withColumn("samples", expr(
        """transform(sequence(0, n_samples - 1),
          |  i -> (instr('0123456789abcdef', substring(blob_hex, i * 2 + 1, 1)) - 1) * 16
          |     + (instr('0123456789abcdef', substring(blob_hex, i * 2 + 2, 1)) - 1))""".stripMargin))
      .select(
        col("doc_id"), col("n_samples"),
        expr("array_max(samples)").as("peak"),
        // integer-sum / count ratio → exact rounding (q82 tie class);
        // rms keeps round(double): sqrt is correctly-rounded IEEE on
        // exact integer inputs, identical in both engines
        graft.queries.Relational.dratio(
          expr("aggregate(samples, 0L, (s, x) -> s + x)"),
          col("n_samples"), 4).as("mean_amp"),
        round(sqrt(expr("aggregate(samples, 0L, (s, x) -> s + x * x)")
          .cast("double") / col("n_samples").cast("double")), 4).as("rms"),
        expr(
          """IF(n_samples > 1,
            |  aggregate(transform(sequence(1, n_samples - 1),
            |    i -> IF((element_at(samples, i + 1) >= 128) !=
            |            (element_at(samples, i) >= 128), 1, 0)),
            |    0, (s, x) -> s + x), 0)""".stripMargin).as("crossings"),
        expr("size(filter(samples, x -> x = 0 OR x = 255))").as("clipped"))
      .orderBy("doc_id")

  val q170Sql: String =
    s"""$blobCte,
       |sampled AS (SELECT doc_id,
       |  CAST(length(blob_hex) // 2 AS INT) AS n_samples,
       |  list_transform(range(0, CAST(length(blob_hex) // 2 AS INT)),
       |    i -> (instr('0123456789abcdef',
       |            substr(blob_hex, CAST(i * 2 + 1 AS INT), 1)) - 1) * 16
       |       + (instr('0123456789abcdef',
       |            substr(blob_hex, CAST(i * 2 + 2 AS INT), 1)) - 1)) AS samples
       |  FROM binary_blobs)
       |SELECT doc_id, n_samples,
       |CAST(list_max(samples) AS INT) AS peak,
       |${graft.queries.Relational.DRATIO("list_sum(samples)",
           "n_samples", 4)} AS mean_amp,
       |round(sqrt(CAST(list_sum(list_transform(samples, x -> x * x)) AS DOUBLE)
       |  / n_samples), 4) AS rms,
       |CAST(CASE WHEN n_samples > 1 THEN
       |  list_sum(list_transform(range(1, n_samples),
       |    i -> CASE WHEN (samples[i + 1] >= 128) <> (samples[i] >= 128)
       |         THEN 1 ELSE 0 END)) ELSE 0 END AS INT) AS crossings,
       |CAST(len(list_filter(samples, x -> x = 0 OR x = 255)) AS INT) AS clipped
       |FROM sampled ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------------ wiring
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q33_blob_meta" -> (q33BlobMeta _),
    "q34_blob_hash" -> (q34BlobHash _),
    "q35_phash_neardup" -> (q35PhashNearDup _),
    "q169_frame_sample" -> (q169FrameSample _),
    "q170_audio_features" -> (q170AudioFeatures _))

  val oracles: Map[String, String] = Map(
    "q33_blob_meta" -> q33Sql,
    "q34_blob_hash" -> q34Sql,
    "q35_phash_neardup" -> q35Sql,
    "q169_frame_sample" -> q169Sql,
    "q170_audio_features" -> q170Sql)
}
