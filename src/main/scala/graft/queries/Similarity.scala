package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** SRP-LSH band sizing — THE scale knob (the simhash/phash lesson,
  * now a caller parameter instead of a compile-time constant): each of
  * `bands` bands hashes `bitsPerBand` hyperplane sign bits into
  * 2^bitsPerBand buckets, so expected bucket occupancy is
  * N / 2^bitsPerBand while per-band recall for a cosine-c pair is
  * (1 − θ(c)/π)^bitsPerBand — more bits shrink buckets (and candidate
  * volume) but cost recall, which extra bands buy back. Both the Spark
  * plan and the DuckDB oracle render from the same config, so any
  * sizing stays oracle-checkable. */
final case class SrpConfig(bands: Int, bitsPerBand: Int) {
  require(bands >= 1, "bands must be >= 1")
  require(bitsPerBand >= 1 && bitsPerBand <= SrpConfig.MaxBits,
    s"bitsPerBand must be in [1, ${SrpConfig.MaxBits}]")
  val planes: Int = bands * bitsPerBand
  def bucketsPerBand: Long = 1L << bitsPerBand
  /** Expected rows per band bucket under uniform hashing. */
  def expectedOccupancy(n: Long): Double = n.toDouble / bucketsPerBand
}

object SrpConfig {
  val MinBits = 4
  val MaxBits = 24
  val DefaultBands = 8
  /** ~20 rows/bucket keeps the within-bucket quadratic trivial while
    * leaving buckets populated enough that banding still groups. */
  val DefaultTargetOccupancy = 20.0

  /** Derive the band width from the corpus size:
    * `bits = clamp(ceil(log2(n / targetOccupancy)), MinBits, MaxBits)`
    * — bucket count tracks N, so occupancy stays ~targetOccupancy at
    * any scale (10^9 vectors → 24-bit bands, not the fixture's 8). */
  def forExpectedN(n: Long, bands: Int = DefaultBands,
      targetOccupancy: Double = DefaultTargetOccupancy): SrpConfig = {
    require(n >= 1, "n must be >= 1")
    require(targetOccupancy > 0, "targetOccupancy must be > 0")
    val raw = math.ceil(
      math.log(n.toDouble / targetOccupancy) / math.log(2.0)).toInt
    SrpConfig(bands, math.min(MaxBits, math.max(MinBits, raw)))
  }

  /** Fixture-corpus default: forExpectedN(5000) = (8 bands, 8 bits) —
    * byte-compatible with the pre-parameterized q55 oracle. */
  val Default: SrpConfig = forExpectedN(5000)
}

/** Similarity search + embedding near-dup over `embeddings`
  * (64-dim float vectors).
  *
  * Determinism: all dot products accumulate left-to-right in DOUBLE from
  * the same float32 inputs in both engines (Spark `aggregate` over
  * `zip_with`; DuckDB `list_sum(list_transform(range...))`), so cosine
  * values are bit-identical and rank ties cannot flip across engines
  * (tiebreak on vec_id regardless).
  *
  * Scale: brute-force top-k is O(|Q|·N) — linear in N for a fixed query
  * set, the correct baseline. The IVF variant bounds the search to
  * probed cells (coarse quantization over deterministic seed centroids):
  * the 100 TB path. The near-dup pair join is blocked by `label`
  * (coarse partition), never all-pairs global.
  */
object Similarity {

  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "embeddings")

  /** sqrt(sum(x_i^2)) in double, left-to-right. The Spark side uses the
    * native codegen'd [[graft.expressions.VectorDot]] (registered as
    * `vec_dot` by [[graft.core.Sessions]]) — bitwise identical to the
    * `aggregate(zip_with(...))` HOF form but a primitive loop, which is
    * the difference between boxed-lambda and vectorizable execution on
    * the quadratic similarity joins. */
  private val normSpark = "sqrt(vec_dot(embedding, embedding))"
  private val normDuck =
    "sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"

  /** Spark dot product of two vector columns, left-to-right double. */
  private def dotSpark(a: String, b: String): String = s"vec_dot($a, $b)"
  private def dotDuck(a: String, b: String): String =
    s"list_sum(list_transform(range(1, len($a) + 1), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))"

  // -------------------------------------------------------------- norm
  def qEmbedNorm(s: SparkSession, dir: String): DataFrame =
    emb(s, dir).select(col("vec_id"), size(col("embedding")).as("dim"),
      expr(normSpark).as("norm"))
      .orderBy("vec_id")

  val qEmbedNormSql: String =
    s"""SELECT vec_id, len(embedding) AS dim, $normDuck AS norm
       |FROM embeddings ORDER BY vec_id""".stripMargin

  // --------------------------------------------------------- brute kNN
  // Brute-force cosine top-5 for a fixed query set (vec_id < 8).
  def qKnnBrute(s: SparkSession, dir: String): DataFrame = {
    val n = emb(s, dir).select(col("vec_id"), col("embedding"),
      expr(normSpark).as("nrm"))
    val q = n.filter(col("vec_id") < 8).select(
      col("vec_id").as("qid"), col("embedding").as("qe"), col("nrm").as("qn"))
    val c = n.select(
      col("vec_id").as("cid"), col("embedding").as("ce"), col("nrm").as("cn"))
    val w = Window.partitionBy("qid").orderBy(col("cosine").desc, col("cid"))
    c.crossJoin(broadcast(q))
      .filter(col("qid") =!= col("cid"))
      .withColumn("cosine",
        expr(dotSpark("qe", "ce")) / (col("qn") * col("cn")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select(col("qid"), col("cid"), col("rn"), col("cosine"))
      .orderBy("qid", "rn")
  }

  val qKnnBruteSql: String =
    s"""WITH n AS (SELECT vec_id, embedding, $normDuck AS nrm FROM embeddings),
       |p AS (SELECT q.vec_id AS qid, c.vec_id AS cid,
       |  ${dotDuck("q.embedding", "c.embedding")} / (q.nrm * c.nrm) AS cosine
       |  FROM n q, n c WHERE q.vec_id < 8 AND q.vec_id <> c.vec_id)
       |SELECT qid, cid, rn, cosine FROM
       |(SELECT *, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, cid) AS rn FROM p)
       |WHERE rn <= 5 ORDER BY qid, rn""".stripMargin

  // ----------------------------------------------- near-dup (blocked)
  // Embedding-cosine near-duplicate pairs, blocked by the coarse
  // partition (`label`) — the IVF-cell-local quadratic join, not a
  // global one.
  def qCosineNearDup(s: SparkSession, dir: String): DataFrame = {
    val n = emb(s, dir).select(col("vec_id"), col("label"),
      col("embedding"), expr(normSpark).as("nrm"))
    val a = n.select(col("label"), col("vec_id").as("d1"),
      col("embedding").as("e1"), col("nrm").as("n1"))
    val b = n.select(col("label"), col("vec_id").as("d2"),
      col("embedding").as("e2"), col("nrm").as("n2"))
    a.join(b, "label").filter(col("d1") < col("d2"))
      .withColumn("cosine",
        expr(dotSpark("e1", "e2")) / (col("n1") * col("n2")))
      .filter(col("cosine") > 0.35)
      .select(col("label"), col("d1"), col("d2"), col("cosine"))
      .orderBy("label", "d1", "d2")
  }

  val qCosineNearDupSql: String =
    s"""WITH n AS (SELECT vec_id, label, embedding, $normDuck AS nrm FROM embeddings),
       |p AS (SELECT a.label AS label, a.vec_id AS d1, b.vec_id AS d2,
       |  ${dotDuck("a.embedding", "b.embedding")} / (a.nrm * b.nrm) AS cosine
       |  FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id)
       |SELECT label, d1, d2, cosine FROM p WHERE cosine > 0.35
       |ORDER BY label, d1, d2""".stripMargin

  // -------------------------------------------- SRP-LSH near-dup (q55)
  /** Signed-random-projection LSH — the bucketed scale path for
    * embedding-cosine near-dup beside the IVF-cell block (q39) and the
    * label block (q31): `planes` fixed ±1 hyperplanes, sign bits
    * grouped into `bands` bands of `bitsPerBand` bits; same band value
    * ⇒ candidate pair; exact cosine verifies. Candidates are
    * probabilistic (SRP recall for a cosine-c pair per band is
    * (1 − θ/π)^bits), but DETERMINISTIC given the fixed planes — the
    * oracle runs the identical planes, so both engines produce the
    * same pair set. Banded join = narrow (band, value) keys, linear
    * scale, never all-pairs.
    *
    * The planes are generated once from a fixed seed and rendered into
    * BOTH dialects as the per-plane negative-index sets: a ±1 dot is
    * `total − 2·Σ v[neg]`, so each engine evaluates the same doubles
    * in the same order (no float literal round-trips). */
  private val SrpDim = 64

  /** Per-dim plane memo — regenerating from the fixed seed is
    * prefix-stable, so growing `planes` never changes existing planes
    * (a (8,8) run and a (16,8) run agree on planes 0..63). */
  @transient private var srpNegIdxMemo: Map[Int, IndexedSeq[Seq[Int]]] = Map.empty
  private def srpNegIdx(planes: Int, dim: Int): IndexedSeq[Seq[Int]] =
    synchronized {
      val cur = srpNegIdxMemo.getOrElse(dim, IndexedSeq.empty)
      if (cur.length >= planes) cur.take(planes)
      else {
        val rnd = new scala.util.Random(20260812L)
        val fresh = IndexedSeq.fill(planes)(
          (1 to dim).filter(_ => rnd.nextBoolean()))
        srpNegIdxMemo += dim -> fresh
        fresh
      }
    }

  /** Band b's integer key in the DuckDB dialect: `bitsPerBand` sign
    * bits of `total − 2·Σ v[neg]` plane dots (per-plane neg sums
    * accumulated left-to-right, ascending indices), NULL when the
    * embedding is not `dim`-long — NULL band keys never equi-join, so
    * degenerate rows drop out of candidate generation instead of
    * colliding in one all-pairs bucket (the LshBands NULL-band rule).
    * The Spark side computes the identical doubles in the identical
    * order inside the native one-pass `graft_srp_bands` kernel
    * ([[graft.expressions.SrpBandKeys]]). */
  private def srpBandDuck(cfg: SrpConfig, dim: Int, b: Int): String = {
    val neg = srpNegIdx(cfg.planes, dim)
    val bits = (0 until cfg.bitsPerBand).map { j =>
      val negSum = neg(b * cfg.bitsPerBand + j)
        .map(i => s"CAST(embedding[$i] AS DOUBLE)").mkString(" + ")
      s"CASE WHEN (srp_total - 2.0 * ($negSum)) >= 0.0 THEN ${1 << j} ELSE 0 END"
    }.mkString(" + ")
    s"CASE WHEN len(embedding) = $dim THEN $bits ELSE NULL END"
  }

  /** id + embedding + norm + `cfg.bands` integer band keys over ANY
    * relation with an `Array[Float]` embedding column — the banded
    * seam the scale spec and the general operator share. All keys come
    * from ONE `graft_srp_bands` call per row: the previous rendered-
    * SQL form was ~(planes × dims) expression nodes per band, and the
    * band self-joins + verify joins duplicate the banded subtree, so
    * ANALYSIS + CODEGEN (not execution) dominated q55 — 5.5 s at 500
    * vectors, flat in SF. The native kernel makes plan size O(1) in
    * (planes, dims). */
  private[queries] def srpBandedOf(df: DataFrame, idCol: String,
      embCol: String, cfg: SrpConfig, dim: Int = SrpDim): DataFrame = {
    val negLit = srpNegIdx(cfg.planes, dim)
      .map(_.mkString("array(", ",", ")"))
      .mkString("array(", ",", ")")
    val base = df.select(col(idCol), col(embCol),
      expr(s"sqrt(vec_dot($embCol, $embCol))").as("nrm"),
      expr(s"graft_srp_bands($embCol, $negLit, $dim, ${cfg.bitsPerBand})")
        .as("srp_keys"))
    (0 until cfg.bands).foldLeft(base) { (acc, b) =>
      acc.withColumn(s"srp$b", element_at(col("srp_keys"), b + 1))
    }.select(col(idCol) +: col(embCol) +: col("nrm") +:
      (0 until cfg.bands).map(b => col(s"srp$b")): _*)
  }

  /** SRP-LSH near-duplicate pairs over ANY relation: banded
    * candidates (cfg-sized — callers size via
    * [[SrpConfig.forExpectedN]]) verified by exact cosine >
    * `threshold`. The banded relation feeds `cfg.bands` band
    * self-joins + 2 verify joins, so it is cached; re-invocation
    * unpersists the previous call's cache ([[clearSrpCache]] is the
    * explicit seam), bounding storage to one banded set. */
  def srpNearDup(df: DataFrame, idCol: String, embCol: String,
      threshold: Double, cfg: SrpConfig, dim: Int = SrpDim): DataFrame = {
    val banded = srpBandedOf(df, idCol, embCol, cfg, dim).cache()
    synchronized {
      cachedSrpGeneral.foreach(_.unpersist())
      cachedSrpGeneral = Some(banded)
    }
    srpPairsFrom(banded, idCol, embCol, threshold, cfg)
  }

  private def srpPairsFrom(banded: DataFrame, idCol: String,
      embCol: String, threshold: Double, cfg: SrpConfig): DataFrame = {
    val cand = graft.operators.LshBands.candidatePairs(banded, idCol,
      (0 until cfg.bands).map(b => s"srp$b"))
    val e1 = banded.select(col(idCol).as("d1"),
      col(embCol).as("e1"), col("nrm").as("n1"))
    val e2 = banded.select(col(idCol).as("d2"),
      col(embCol).as("e2"), col("nrm").as("n2"))
    cand.join(e1, "d1").join(e2, "d2")
      .withColumn("cosine",
        expr(dotSpark("e1", "e2")) / (col("n1") * col("n2")))
      .filter(col("cosine") > threshold)
      .select(col("d1"), col("d2"), col("cosine"))
      .orderBy("d1", "d2")
  }

  // managed caches: a bounded map of banded sets for the fixture path
  // (q55 and q62 run the operator at DIFFERENT configs — a single slot
  // would thrash between them every bench rep), one slot for the
  // latest general-API call
  private val SrpCacheMax = 4
  @transient private var cachedSrp =
    scala.collection.mutable.LinkedHashMap.empty[(String, SrpConfig), DataFrame]
  @transient private var cachedSrpGeneral: Option[DataFrame] = None
  private def srpBanded(s: SparkSession, dir: String,
      cfg: SrpConfig): DataFrame = synchronized {
    cachedSrp.getOrElseUpdate((dir, cfg), {
      if (cachedSrp.size >= SrpCacheMax) {
        val (k, df) = cachedSrp.head
        df.unpersist(); cachedSrp.remove(k)
      }
      srpBandedOf(emb(s, dir), "vec_id", "embedding", cfg).cache()
    })
  }

  /** Unpersists every banded relation this object holds. */
  def clearSrpCache(): Unit = synchronized {
    cachedSrp.values.foreach(_.unpersist()); cachedSrp.clear()
    cachedSrpGeneral.foreach(_.unpersist()); cachedSrpGeneral = None
  }

  def qSrpNearDup(s: SparkSession, dir: String): DataFrame =
    qSrpNearDupWith(s, dir, SrpConfig.Default)

  /** The q55 shape under a caller-chosen band sizing — cfg flows into
    * the Spark plan here and into the oracle via [[srpNearDupSql]]. */
  def qSrpNearDupWith(s: SparkSession, dir: String,
      cfg: SrpConfig): DataFrame =
    srpPairsFrom(srpBanded(s, dir, cfg), "vec_id", "embedding", 0.35, cfg)

  /** DuckDB twin rendered from the SAME cfg (planes, band grouping,
    * addition order all derive from the one value pair). */
  def srpNearDupSql(cfg: SrpConfig): String = {
    val onesSum = (1 to SrpDim)
      .map(i => s"CAST(embedding[$i] AS DOUBLE)").mkString(" + ")
    val bandCols = (0 until cfg.bands)
      .map(b => s"${srpBandDuck(cfg, SrpDim, b)} AS srp$b").mkString(",\n")
    val bandJoins = (0 until cfg.bands).map { b =>
      s"""  SELECT a.vec_id AS d1, b.vec_id AS d2 FROM banded a JOIN banded b
         |    ON a.srp$b = b.srp$b AND a.vec_id < b.vec_id""".stripMargin
    }.mkString("\n  UNION\n")
    s"""WITH tot AS (SELECT vec_id, embedding, $normDuck AS nrm,
       |  ($onesSum) AS srp_total FROM embeddings),
       |banded AS (SELECT vec_id, embedding, nrm,
       |$bandCols
       |FROM tot),
       |cand AS (
       |$bandJoins),
       |verified AS (SELECT d1, d2,
       |  ${dotDuck("x.embedding", "y.embedding")} / (x.nrm * y.nrm) AS cosine
       |  FROM cand JOIN banded x ON cand.d1 = x.vec_id
       |            JOIN banded y ON cand.d2 = y.vec_id)
       |SELECT d1, d2, cosine FROM verified WHERE cosine > 0.35
       |ORDER BY d1, d2""".stripMargin
  }

  val qSrpNearDupSql: String = srpNearDupSql(SrpConfig.Default)

  /** q62: the SAME operator at a second band sizing — (4 bands,
    * 10 bits) instead of the default (8, 8) — with its oracle rendered
    * from the same config. This pins the round-4 fix end-to-end: the
    * sizing knob turns WITHOUT a recompile of anything but the config
    * value, and both dialects re-derive planes, band grouping, and
    * join shape from it. Fewer, wider bands ⇒ fewer candidates, lower
    * recall — a different (deterministic) pair set than q55. */
  val SrpAltConfig: SrpConfig = SrpConfig(4, 10)
  def qSrpNearDupSized(s: SparkSession, dir: String): DataFrame =
    qSrpNearDupWith(s, dir, SrpAltConfig)
  val qSrpNearDupSizedSql: String = srpNearDupSql(SrpAltConfig)

  // ----------------------------------------------------------- IVF kNN
  // IVF-style ANN: a FIXED-SIZE coarse quantizer — exactly IvfSeedCount
  // seed centroids chosen by a deterministic multiplicative-hash sample
  // (top-K by Knuth hash of vec_id) — assign every vector to its
  // nearest seed (its cell), then probe each query's top-IvfProbes
  // cells only — candidate set ∝ cells probed, not N.
  //
  // Scale design: the quantizer is O(K) with K CONSTANT in N. Seed
  // selection is `ORDER BY hash LIMIT K` → Spark plans
  // TakeOrderedAndProject (per-partition partial top-K, no global
  // sort), so the driver receives exactly K rows whether N is 500 or
  // 1 B (round-2 shape collected N/53 rows — linear in N — and baked
  // them into a plan literal Catalyst couldn't serialize at scale;
  // IvfScaleSpec now pins seed count == K across SFs). The K seeds
  // ship to executors as a K-entry literal array-of-structs, so cell
  // assignment is a per-row fold — ZERO shuffle, fully
  // codegen/whole-stage friendly. Probe rows (|Q|×IvfProbes) are
  // broadcast into the cell join, so the big `assigned` side is never
  // shuffled either.
  //
  // Determinism (oracle parity): dot products accumulate left-to-right
  // in double in both engines; argmax ties break to the lowest seed_id
  // (strict `>` fold over the seed array sorted by seed_id == DuckDB
  // ROW_NUMBER ORDER BY scos DESC, seed_id).
  /** dot(vec, se) accumulated left-to-right in double (native
    * `vec_dot` — primitive loop, no per-element boxing). */
  private def dotC(vec: Column, se: Column): Column =
    call_function("vec_dot", vec, se)

  /** Coarse-quantizer helpers shared by the IVF queries: collect the
    * FIXED-K seed set (TakeOrderedAndProject — the driver sees exactly
    * K rows, independent of N) and re-ship as a K-entry literal
    * array-of-structs; cell assignment becomes a per-row fold — ZERO
    * shuffle. The Scala norm fold mirrors the Spark/DuckDB
    * left-to-right double accumulation bit-for-bit. */
  /** `seedFilter` restricts SEED candidacy (not assignment): q219
    * builds the coarse quantizer from the OLD corpus slice only, then
    * assigns everything — the index-staleness shape. Default keeps
    * the original whole-corpus behaviour for every other caller. */
  private[graft] final class IvfQuantizer(s: SparkSession, dir: String,
      seedFilter: Column = lit(true)) {
    val n: DataFrame = emb(s, dir).select(col("vec_id"), col("embedding"),
      expr(normSpark).as("nrm"))

    private val seedRows = n.filter(seedFilter)
      .orderBy(ivfHash(col("vec_id")), col("vec_id"))
      .limit(IvfSeedCount)
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map { r =>
        val id = r.getLong(0)
        val e = r.getSeq[Float](1)
        val nrm = math.sqrt(e.foldLeft(0.0)((acc, x) =>
          acc + x.toDouble * x.toDouble))
        (id, e, nrm)
      }
      .sortBy(_._1)
    /** Seed vec_ids, ascending — exposed for IvfScaleSpec's O(K) pin. */
    def seedIds: Seq[Long] = seedRows.map(_._1).toIndexedSeq
    private val seedsCol = array(seedRows.map { case (id, e, nrm) =>
      struct(lit(id).as("id"), typedLit(e).as("e"), lit(nrm).as("n"))
    }.toIndexedSeq: _*)

    /** Per-seed cosine scores as array<struct<c,id>>, seed_id order. */
    private def scored(vec: Column, nrm: Column): Column =
      transform(seedsCol, sd => struct(
        (dotC(vec, sd("e")) / (nrm * sd("n"))).as("c"),
        sd("id").as("id")))
    /** argmax by cosine, ties to lowest seed_id (strict > fold). */
    def bestCell(vec: Column, nrm: Column): Column =
      aggregate(scored(vec, nrm),
        struct(lit(-2.0).as("c"), lit(-1L).as("id")),
        (acc, x) => when(x("c") > acc("c"), x).otherwise(acc))("id")
    /** top-k cells by cosine (desc, seed_id asc) for the probe side. */
    def probeCells(vec: Column, nrm: Column, k: Int): Column = {
      val sorted = array_sort(scored(vec, nrm), (l, r) =>
        when(l("c") > r("c"), -1).when(l("c") < r("c"), 1)
          .when(l("id") < r("id"), -1).when(l("id") > r("id"), 1)
          .otherwise(0))
      transform(slice(sorted, 1, k), x => x("id"))
    }
    /** every vector tagged with its nearest-seed cell. */
    def assigned: DataFrame =
      n.withColumn("cell", bestCell(col("embedding"), col("nrm")))
  }

  /** IVF tuning, shared by the Spark plan and the DuckDB oracle twin:
    * exactly IvfSeedCount seeds = the K vectors ranking first under a
    * Knuth multiplicative hash of vec_id (deterministic, uniform,
    * engine-portable: plain 64-bit arithmetic, no md5/murmur mismatch),
    * IvfProbes cells probed per query. K is CONSTANT in N — at 1 B
    * vectors the driver still collects 10 rows. Recall calibration on
    * this corpus (SimilarityRecallSpec): the embeddings are
    * near-isotropic noise — true top-5 neighbors sit at cosine ≈ 0.3
    * vs ≈ 0.005 for random pairs and are almost never same-`label` —
    * so partition-ANN recall is data-limited; probing 4 of 10 cells
    * recalls ≈ 0.65 here, and finer cells make it WORSE. On clustered
    * embeddings (the production case) the same plan recalls ≥ 0.9;
    * the spec pins the measured 0.6 floor. */
  val IvfSeedCount = 10
  val IvfProbes = 4
  /** Knuth multiplicative hash, identical arithmetic in both engines.
    * The id is masked to 31 bits BEFORE the multiply so the product
    * stays within signed 64-bit for ANY id (an unmasked id ≥ ~3.5e9
    * would overflow — ANSI-mode Spark throws, DuckDB errors); ids
    * below 2^31 hash identically to the unmasked form, so seed
    * selection is unchanged on every existing corpus. */
  private val IvfHashMult = 2654435761L
  private val IvfHashMod = 4294967296L // 2^32
  private val IvfIdMask = 2147483648L // 2^31: 2^31 * mult < 2^63
  private def ivfHash(id: Column): Column =
    pmod(pmod(id, lit(IvfIdMask)) * lit(IvfHashMult), lit(IvfHashMod))
  private val ivfHashDuck =
    s"((vec_id % $IvfIdMask) * $IvfHashMult) % $IvfHashMod"

  def qKnnIvf(s: SparkSession, dir: String): DataFrame =
    qKnnIvfProbed(s, dir, IvfProbes)

  /** [[qKnnIvf]] with the probe count as a parameter — q93's
    * regression-tripwire seam (SimilarityRecallSpec runs the eval
    * against a deliberately degraded 1-probe index and asserts the
    * metric row moves). */
  private[queries] def qKnnIvfProbed(s: SparkSession, dir: String,
      ivfProbes: Int): DataFrame = {
    val q = new IvfQuantizer(s, dir)
    val n = q.n
    def probeCells(vec: Column, nrm: Column): Column =
      q.probeCells(vec, nrm, ivfProbes)

    val assigned = q.assigned
    val probes = n.filter(col("vec_id") < 8)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"),
        col("nrm").as("qn"),
        explode(probeCells(col("embedding"), col("nrm"))).as("cell"))

    val wTop = Window.partitionBy("qid").orderBy(col("cosine").desc, col("cid"))
    assigned.withColumnRenamed("vec_id", "cid")
      .join(broadcast(probes), "cell")
      .filter(col("qid") =!= col("cid"))
      .withColumn("cosine", dotC(col("qe"), col("embedding")) / (col("qn") * col("nrm")))
      .withColumn("rn", row_number().over(wTop))
      .filter(col("rn") <= 5)
      .select(col("qid"), col("cid"), col("rn"), col("cosine"))
      .orderBy("qid", "rn")
  }

  val qKnnIvfSql: String =
    s"""WITH n AS (SELECT vec_id, embedding, $normDuck AS nrm FROM embeddings),
       |seeds AS (SELECT vec_id AS seed_id, embedding AS se, nrm AS sn
       |  FROM n ORDER BY $ivfHashDuck, vec_id LIMIT $IvfSeedCount),
       |scored AS (SELECT n.vec_id, n.embedding, n.nrm, s.seed_id,
       |  ${dotDuck("n.embedding", "s.se")} / (n.nrm * s.sn) AS scos
       |  FROM n CROSS JOIN seeds s),
       |assigned AS (SELECT vec_id, embedding, nrm, seed_id AS cell FROM
       |  (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
       |     ORDER BY scos DESC, seed_id) AS rn FROM scored) WHERE rn = 1),
       |probes AS (SELECT vec_id AS qid, embedding AS qe, nrm AS qn,
       |  seed_id AS cell FROM
       |  (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
       |     ORDER BY scos DESC, seed_id) AS rn FROM scored WHERE vec_id < 8)
       |  WHERE rn <= $IvfProbes),
       |cand AS (SELECT p.qid, a.vec_id AS cid,
       |  ${dotDuck("p.qe", "a.embedding")} / (p.qn * a.nrm) AS cosine
       |  FROM probes p JOIN assigned a USING (cell) WHERE p.qid <> a.vec_id)
       |SELECT qid, cid, rn, cosine FROM
       |(SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
       |   ORDER BY cosine DESC, cid) AS rn FROM cand)
       |WHERE rn <= 5 ORDER BY qid, rn""".stripMargin

  // ----------------------------------- q39 IVF-cell-blocked near-dup
  // Near-duplicate pairs with the blocking key DERIVED by the engine
  // (nearest IVF cell) instead of a given label column (q31's caveat):
  // the real-pipeline shape, where no label exists and the coarse
  // quantizer provides the block. Within-cell quadratic only — never
  // all-pairs; cell assignment itself is the zero-shuffle fold.
  def qCellNearDup(s: SparkSession, dir: String): DataFrame = {
    val assigned = new IvfQuantizer(s, dir).assigned
    val a = assigned.select(col("cell"), col("vec_id").as("d1"),
      col("embedding").as("e1"), col("nrm").as("n1"))
    val b = assigned.select(col("cell"), col("vec_id").as("d2"),
      col("embedding").as("e2"), col("nrm").as("n2"))
    a.join(b, "cell").filter(col("d1") < col("d2"))
      .withColumn("cosine", dotC(col("e1"), col("e2")) / (col("n1") * col("n2")))
      .filter(col("cosine") > 0.5)
      .select(col("cell"), col("d1"), col("d2"), col("cosine"))
      .orderBy("cell", "d1", "d2")
  }

  val qCellNearDupSql: String =
    s"""WITH n AS (SELECT vec_id, embedding, $normDuck AS nrm FROM embeddings),
       |seeds AS (SELECT vec_id AS seed_id, embedding AS se, nrm AS sn
       |  FROM n ORDER BY $ivfHashDuck, vec_id LIMIT $IvfSeedCount),
       |scored AS (SELECT n.vec_id, n.embedding, n.nrm, s.seed_id,
       |  ${dotDuck("n.embedding", "s.se")} / (n.nrm * s.sn) AS scos
       |  FROM n CROSS JOIN seeds s),
       |assigned AS (SELECT vec_id, embedding, nrm, seed_id AS cell FROM
       |  (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
       |     ORDER BY scos DESC, seed_id) AS rn FROM scored) WHERE rn = 1),
       |p AS (SELECT a.cell, a.vec_id AS d1, b.vec_id AS d2,
       |  ${dotDuck("a.embedding", "b.embedding")} / (a.nrm * b.nrm) AS cosine
       |  FROM assigned a JOIN assigned b
       |    ON a.cell = b.cell AND a.vec_id < b.vec_id)
       |SELECT cell, d1, d2, cosine FROM p WHERE cosine > 0.5
       |ORDER BY cell, d1, d2""".stripMargin

  // ------------------------------------------------ q65 PQ ANN (ADC)
  /** Product quantization — the memory-compression ANN path beside IVF
    * (cell pruning, q32) and SRP (hash bucketing, q55/q62): each
    * 64-dim vector is split into [[PqM]] 8-dim subvectors, each
    * encoded as the id of its nearest codebook centroid ([[PqK]] per
    * subspace → 8 × 4 bits = 4 bytes per vector instead of 256), and
    * search runs by Asymmetric Distance Computation: the query's
    * per-(subspace, centroid) distance table is precomputed (M×K
    * entries), a candidate's approximate distance is the sum of M
    * table lookups — no candidate vector is ever read.
    *
    * Codebook: Lloyd's k-means, [[PqIters]] fixed iterations, trained
    * on the FIXED sf0.001 sample corpus ([[PqSampleN]] hash-sampled
    * vectors) — training on a small sample and encoding the full
    * corpus is standard PQ practice, and it makes the codebook a
    * CONSTANT: both dialects embed the identical centroid literals
    * (Double.toString round-trips exactly), so encode, ADC tables and
    * ranking are bit-reproducible. Ties everywhere break to the
    * lowest centroid/candidate id; the per-candidate ADC sum routes
    * through DECIMAL(25,6) (the dsum pattern) so shuffle order cannot
    * flip ranks.
    *
    * Scale: encoding is a broadcast join against M×K centroid rows +
    * one windowed argmin per (vector, subspace); at 10^9 vectors the
    * 4-byte codes replace the 256-byte vectors in memory, the ADC
    * table is per-query constant work, and the scan is linear over
    * codes — combine with the IVF cells of q32 for IVF-PQ. */
  val PqM = 8 // subspaces
  val PqK = 16 // centroids per subspace
  val PqSubDim: Int = SrpDim / PqM // 8
  val PqSampleN = 256
  val PqIters = 5
  private val PqTrainDir = "/root/testdata/sf0.001"

  /** [m][k][PqSubDim] centroids, deterministic (fixed sample order,
    * fixed iterations, ties to lowest id, empty clusters keep their
    * previous centroid). */
  private lazy val pqCentroids: Array[Array[Array[Double]]] = {
    val s = SparkSession.getActiveSession
      .orElse(SparkSession.getDefaultSession)
      .getOrElse(graft.core.Sessions.local("4"))
    val sample: Array[Array[Double]] = emb(s, PqTrainDir)
      .orderBy(ivfHash(col("vec_id")), col("vec_id"))
      .limit(PqSampleN)
      .select(col("embedding"))
      .collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    Array.tabulate(PqM) { m =>
      val subs = sample.map(v => v.slice(m * PqSubDim, (m + 1) * PqSubDim))
      var cents = Array.tabulate(PqK)(k => subs(k % subs.length).clone())
      for (_ <- 0 until PqIters) {
        val sums = Array.fill(PqK, PqSubDim)(0.0)
        val counts = Array.fill(PqK)(0)
        for (v <- subs) {
          var best = 0; var bestD = Double.MaxValue
          for (k <- 0 until PqK) {
            var d = 0.0; var i = 0
            while (i < PqSubDim) {
              val x = v(i) - cents(k)(i); d += x * x; i += 1
            }
            if (d < bestD) { bestD = d; best = k }
          }
          counts(best) += 1
          for (i <- 0 until PqSubDim) sums(best)(i) += v(i)
        }
        cents = Array.tabulate(PqK)(k =>
          if (counts(k) == 0) cents(k)
          else Array.tabulate(PqSubDim)(i => sums(k)(i) / counts(k)))
      }
      cents
    }
  }

  /** Subvector↔centroid squared L2, expanded to a LEFT-ASSOCIATIVE
    * inline term chain (round 21): the `aggregate(zip_with(...))` HOF
    * form is interpreted per row — at corpus × M × K scored rows it
    * dominated the PQ encode stage (q35's lambda pathology). The fold
    * evaluates ((0.0 + x₁) + x₂) + …; squares are non-negative, so
    * 0.0 + x₁ ≡ x₁ bitwise and the explicit chain (x₁ + x₂) + … is
    * IEEE-identical to the fold and to the DuckDB twin's list_sum —
    * while compiling to straight-line whole-stage-codegen arithmetic. */
  private lazy val pqAdcDist: Column = expr(
    (1 to PqSubDim).map(i =>
      s"((CAST(element_at(sv, $i) AS DOUBLE) - element_at(c, $i)) * " +
        s"(CAST(element_at(sv, $i) AS DOUBLE) - element_at(c, $i)))")
      .reduceLeft((a, b) => s"($a + $b)"))

  def qKnnPq(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cents = pqCentroids
    val centDf = broadcast(
      (for (m <- 0 until PqM; k <- 0 until PqK)
        yield (m, k, cents(m)(k).toSeq)).toDF("m", "k", "c"))
    // squared distance subvec↔centroid, left-to-right double (both
    // dialects evaluate the identical addition order)
    val distExpr = pqAdcDist
    val sub = emb(s, dir)
      .select(col("vec_id"), col("embedding"),
        explode(expr(s"sequence(0, ${PqM - 1})")).as("m"))
      .select(col("vec_id"), col("m"),
        slice(col("embedding"), col("m") * PqSubDim + 1, lit(PqSubDim)).as("sv"))
    val scored = sub.join(centDf, "m").withColumn("dist", distExpr)
    val wEnc = Window.partitionBy("vec_id", "m").orderBy(col("dist"), col("k"))
    val codes = scored.withColumn("rn", row_number().over(wEnc))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("m"), col("k").as("code"))
    // query-side ADC table: all (m, k) distances for each query vector
    val qd = broadcast(scored.filter(col("vec_id") < 8)
      .select(col("vec_id").as("qid"), col("m"), col("k"),
        col("dist").as("qdist")))
    val wTop = Window.partitionBy("qid").orderBy(col("adist"), col("cid"))
    codes.join(qd, Seq("m")).filter(col("k") === col("code"))
      .filter(col("qid") =!= col("vec_id"))
      .groupBy(col("qid"), col("vec_id").as("cid"))
      .agg(graft.queries.Relational.dsum(col("qdist")).as("adist"))
      .withColumn("rn", row_number().over(wTop))
      .filter(col("rn") <= 5)
      .select(col("qid"), col("cid"), col("rn"), col("adist"))
      .orderBy("qid", "rn")
  }

  def qKnnPqSql: String = {
    val centRows = (for (m <- 0 until PqM; k <- 0 until PqK) yield {
      // Relational.DLIT: centroids are DATA-DERIVED doubles — a bare
      // 17-digit literal parses as wide DECIMAL whose ->DOUBLE cast
      // can land an ulp off the JVM value (the q197 class)
      val c = pqCentroids(m)(k).map(Relational.DLIT).mkString(", ")
      s"($m, $k, [$c])"
    }).mkString(",\n")
    val distDuck =
      "list_sum(list_transform(range(1, 9), i -> " +
        "(CAST(sv[i] AS DOUBLE) - c[i]) * (CAST(sv[i] AS DOUBLE) - c[i])))"
    s"""WITH cent(m, k, c) AS (VALUES
       |$centRows),
       |sub AS (SELECT vec_id, t.m AS m,
       |  embedding[(t.m * $PqSubDim + 1):(t.m * $PqSubDim + $PqSubDim)] AS sv
       |  FROM embeddings CROSS JOIN (SELECT unnest(range(0, $PqM)) AS m) t),
       |scored AS (SELECT vec_id, sub.m AS m, k, $distDuck AS dist
       |  FROM sub JOIN cent ON sub.m = cent.m),
       |codes AS (SELECT vec_id, m, k AS code FROM
       |  (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, m
       |     ORDER BY dist, k) AS rn FROM scored) WHERE rn = 1),
       |qd AS (SELECT vec_id AS qid, m, k, dist AS qdist FROM scored
       |  WHERE vec_id < 8),
       |adc AS (SELECT qid, codes.vec_id AS cid,
       |  CAST(SUM(CAST(qdist AS DECIMAL(25,6))) AS DOUBLE) AS adist
       |  FROM codes JOIN qd ON codes.m = qd.m AND codes.code = qd.k
       |  WHERE qd.qid <> codes.vec_id
       |  GROUP BY qid, codes.vec_id)
       |SELECT qid, cid, rn, adist FROM
       |(SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
       |   ORDER BY adist, cid) AS rn FROM adc)
       |WHERE rn <= 5 ORDER BY qid, rn""".stripMargin
  }

  // --------------------------------------------- q66 IVF-PQ (capstone)
  /** IVF-PQ: the production ANN layout — the coarse quantizer of q32
    * prunes the search to the query's probed cells, and within them
    * candidates are ranked by q65's asymmetric distance over 4-byte PQ
    * codes. At 10^9 vectors this is the memory-AND-compute story in
    * one operator: the scan touches only probed cells, reads only
    * codes (never vectors), and the per-query work is an M×K table +
    * cells/K_cells of the corpus. Both building blocks are already
    * oracle-proven deterministic; the composition is pure equi-joins,
    * so the combined row set is too. */
  def qKnnIvfPq(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val q = new IvfQuantizer(s, dir)
    val assigned = q.assigned // (vec_id, embedding, nrm, cell)

    val cents = pqCentroids
    val centDf = broadcast(
      (for (m <- 0 until PqM; k <- 0 until PqK)
        yield (m, k, cents(m)(k).toSeq)).toDF("m", "k", "c"))
    val distExpr = pqAdcDist
    val sub = emb(s, dir)
      .select(col("vec_id"), col("embedding"),
        explode(expr(s"sequence(0, ${PqM - 1})")).as("m"))
      .select(col("vec_id"), col("m"),
        slice(col("embedding"), col("m") * PqSubDim + 1, lit(PqSubDim)).as("sv"))
    val scored = sub.join(centDf, "m").withColumn("dist", distExpr)
    val wEnc = Window.partitionBy("vec_id", "m").orderBy(col("dist"), col("k"))
    val codes = scored.withColumn("rn", row_number().over(wEnc))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("m"), col("k").as("code"))

    // probe side: each query's top-IvfProbes cells + its ADC table
    val probes = assigned.filter(col("vec_id") < 8)
      .select(col("vec_id").as("qid"),
        explode(q.probeCells(col("embedding"), col("nrm"), IvfProbes))
          .as("cell"))
    val qd = scored.filter(col("vec_id") < 8)
      .select(col("vec_id").as("qid"), col("m"), col("k"),
        col("dist").as("qdist"))

    // candidates = vectors in a probed cell of that query
    val cand = assigned.select(col("vec_id").as("cid"), col("cell"))
      .join(broadcast(probes), "cell")
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"))

    val wTop = Window.partitionBy("qid").orderBy(col("adist"), col("cid"))
    cand.join(codes.withColumnRenamed("vec_id", "cid"), "cid")
      .join(broadcast(qd), Seq("qid", "m"))
      .filter(col("k") === col("code"))
      .groupBy(col("qid"), col("cid"))
      .agg(graft.queries.Relational.dsum(col("qdist")).as("adist"))
      .withColumn("rn", row_number().over(wTop))
      .filter(col("rn") <= 5)
      .select(col("qid"), col("cid"), col("rn"), col("adist"))
      .orderBy("qid", "rn")
  }

  def qKnnIvfPqSql: String = {
    val centRows = (for (m <- 0 until PqM; k <- 0 until PqK) yield {
      // Relational.DLIT: centroids are DATA-DERIVED doubles — a bare
      // 17-digit literal parses as wide DECIMAL whose ->DOUBLE cast
      // can land an ulp off the JVM value (the q197 class)
      val c = pqCentroids(m)(k).map(Relational.DLIT).mkString(", ")
      s"($m, $k, [$c])"
    }).mkString(",\n")
    val distDuck =
      "list_sum(list_transform(range(1, 9), i -> " +
        "(CAST(sv[i] AS DOUBLE) - c[i]) * (CAST(sv[i] AS DOUBLE) - c[i])))"
    s"""WITH n AS (SELECT vec_id, embedding, $normDuck AS nrm FROM embeddings),
       |seeds AS (SELECT vec_id AS seed_id, embedding AS se, nrm AS sn
       |  FROM n ORDER BY $ivfHashDuck, vec_id LIMIT $IvfSeedCount),
       |cellscored AS (SELECT n.vec_id, n.embedding, n.nrm, s.seed_id,
       |  ${dotDuck("n.embedding", "s.se")} / (n.nrm * s.sn) AS scos
       |  FROM n CROSS JOIN seeds s),
       |assigned AS (SELECT vec_id, seed_id AS cell FROM
       |  (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
       |     ORDER BY scos DESC, seed_id) AS rn FROM cellscored) WHERE rn = 1),
       |probes AS (SELECT vec_id AS qid, seed_id AS cell FROM
       |  (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
       |     ORDER BY scos DESC, seed_id) AS rn FROM cellscored
       |   WHERE vec_id < 8) WHERE rn <= $IvfProbes),
       |cent(m, k, c) AS (VALUES
       |$centRows),
       |sub AS (SELECT vec_id, t.m AS m,
       |  embedding[(t.m * $PqSubDim + 1):(t.m * $PqSubDim + $PqSubDim)] AS sv
       |  FROM embeddings CROSS JOIN (SELECT unnest(range(0, $PqM)) AS m) t),
       |pqs AS (SELECT vec_id, sub.m AS m, k, $distDuck AS dist
       |  FROM sub JOIN cent ON sub.m = cent.m),
       |codes AS (SELECT vec_id, m, k AS code FROM
       |  (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, m
       |     ORDER BY dist, k) AS rn FROM pqs) WHERE rn = 1),
       |qd AS (SELECT vec_id AS qid, m, k, dist AS qdist FROM pqs
       |  WHERE vec_id < 8),
       |cand AS (SELECT p.qid, a.vec_id AS cid
       |  FROM assigned a JOIN probes p ON a.cell = p.cell
       |  WHERE p.qid <> a.vec_id),
       |adc AS (SELECT cand.qid, cand.cid,
       |  CAST(SUM(CAST(qdist AS DECIMAL(25,6))) AS DOUBLE) AS adist
       |  FROM cand
       |  JOIN codes ON codes.vec_id = cand.cid
       |  JOIN qd ON qd.qid = cand.qid AND qd.m = codes.m AND qd.k = codes.code
       |  GROUP BY cand.qid, cand.cid)
       |SELECT qid, cid, rn, adist FROM
       |(SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
       |   ORDER BY adist, cid) AS rn FROM adc)
       |WHERE rn <= 5 ORDER BY qid, rn""".stripMargin
  }

  // ------------------------------------------------------------ wiring
  // ------------------------------------------- q82 label centroids
  /** Per-label embedding centroids (mean pooling) — the distributed
    * vector aggregation behind class prototypes, IVF coarse-quantizer
    * retraining, and embedding-drift monitoring. Emitted long-form
    * (label, pos, c) rather than as an array column so the oracle
    * can compare scalar cells.
    *
    * Determinism: each dimension's sum routes through DECIMAL(25,6)
    * (the [[Relational.dsum]] rule — float→double is exact, the
    * decimal quantization is the same half-up in both engines), so
    * the sum is bit-identical under any partitioning, and the
    * rounded mean is [[Relational.dmean]] — exact integer
    * half-away-from-zero on the rational sum/n, never a double
    * round() (a REAL 6-dp tie, 0.616992/192 = 0.0032135, bit the
    * double form at sf0.1). Plan: posexplode fans each vector into
    * (label, pos, v) rows — scan-local — then ONE map-side-combined
    * shuffle on (label, pos); |labels|·dim result rows. */
  def qLabelCentroids(s: SparkSession, dir: String): DataFrame =
    emb(s, dir)
      .select(col("label"), posexplode(col("embedding")))
      .withColumnRenamed("pos", "p").withColumnRenamed("col", "v")
      .groupBy(col("label"), col("p"))
      .agg(count(lit(1)).as("n"),
        Relational.dmean(col("v").cast("double"), 6).as("c"))
      .orderBy("label", "p")

  val qLabelCentroidsSql: String =
    s"""WITH ex AS (SELECT label,
      |  unnest(list_transform(range(1, len(embedding) + 1),
      |    i -> {'p': i - 1, 'v': embedding[i]})) AS s FROM embeddings)
      |SELECT label, s.p AS p, COUNT(*) AS n,
      |${Relational.DMEAN("CAST(s.v AS DOUBLE)", 6)} AS c
      |FROM ex GROUP BY label, p ORDER BY label, p""".stripMargin

  // ------------------------------------------------ q93 ANN eval
  /** The ANN deployment's eval harness as a query: recall@5 and
    * top-1 agreement of the IVF index (q32) against the brute-force
    * ground truth (q30), computed in-engine. The oracle COMPUTES the
    * same metrics from DuckDB's own independent brute + IVF SQL (the
    * q30/q32 oracle bodies composed into one statement), so the check
    * is scale-free — it holds at ANY fixture, not just the sf where a
    * constant was once measured — and an index regression (probe
    * count, seed selection, cell assignment) still reads red, because
    * the oracle's IVF is an independent implementation that does not
    * move with the engine's (tripwire pinned in
    * SimilarityRecallSpec). Metrics are exact single IEEE divisions
    * of join-cardinality integers — no rounding, no tie hazard.
    * At production scale the same query runs over a sampled query
    * set as the index-maintenance canary. */
  def qAnnEval(s: SparkSession, dir: String): DataFrame =
    annEval(s, qKnnBrute(s, dir), qKnnIvf(s, dir))

  /** q93's metric core with an injectable system list — the
    * regression tripwire's seam (SimilarityRecallSpec perturbs the
    * index through it and asserts the row moves). */
  private[queries] def annEval(s: SparkSession, brute0: DataFrame,
      ivf0: DataFrame): DataFrame = {
    val brute = brute0.select(col("qid"), col("cid"), col("rn"))
    val ivf = ivf0.select(col("qid"), col("cid"))
    val k = 5
    val nq = brute.select(countDistinct(col("qid"))).head().getLong(0)
    val hits = brute.join(ivf, Seq("qid", "cid")).count()
    val top1 = brute.filter(col("rn") === 1)
      .join(ivf, Seq("qid", "cid")).count()
    import s.implicits._
    Seq((nq, hits.toDouble / (k * nq), top1.toDouble / nq))
      .toDF("n_queries", "recall_at_5", "top1_rate")
  }

  /** The q30 (brute) and q32 (IVF) oracle bodies composed into one
    * statement BY INTERPOLATION — the q245Sql/q195Sql pattern — so
    * there is exactly one source of truth for the oracle-side IVF:
    * any future change to [[qKnnBruteSql]]/[[qKnnIvfSql]] (probe
    * count, tie-break, seed selection) flows into this eval's oracle
    * automatically instead of silently desynchronizing a hand-copied
    * CTE block. DuckDB recomputes recall@5 / top-1 independently at
    * whatever sf it is handed. */
  val qAnnEvalSql: String =
    s"""WITH brute AS MATERIALIZED (
       |  SELECT qid, cid, rn FROM ($qKnnBruteSql) b),
       |ivf AS MATERIALIZED (SELECT qid, cid FROM ($qKnnIvfSql) v),
       |nq AS (SELECT CAST(COUNT(DISTINCT qid) AS BIGINT) AS n_queries
       |  FROM brute),
       |h AS (SELECT CAST(COUNT(*) AS BIGINT) AS hits
       |  FROM brute JOIN ivf USING (qid, cid)),
       |t1 AS (SELECT CAST(COUNT(*) AS BIGINT) AS top1
       |  FROM brute JOIN ivf USING (qid, cid) WHERE rn = 1)
       |SELECT n_queries,
       |  CAST(hits AS DOUBLE) / (5 * n_queries) AS recall_at_5,
       |  CAST(top1 AS DOUBLE) / n_queries AS top1_rate
       |FROM nq, h, t1""".stripMargin

  // --------------------------------------- q245 nDCG@5 + MRR metrics
  /** Graded-relevance ranking metrics for the IVF index against
    * brute-force ground truth — the retrieval-eval battery's missing
    * pair beside recall@k / top-1 (q93) and RRF fusion (q224):
    * per query, the system list (qKnnIvf, its own ranking) earns gain
    * `6 − true_rank` for each hit in the brute top-5 (rank 1 → 5 …
    * rank 5 → 1, miss → 0), discounted by `log2(position + 1)`;
    * nDCG@5 normalizes by the ideal DCG derived from the truth list
    * itself, and MRR is the reciprocal of the first relevant system
    * position. One output row: query count + the two means.
    *
    * Determinism (the q172 round-on-decimal treatment applied to the
    * log2 discount): every discounted-gain term, reciprocal rank, and
    * per-query nDCG ratio quantizes to DECIMAL(25,6) micro-units
    * (exact BIGINT) BEFORE any sum, so neither join order nor
    * aggregation order can move a bit; the final means are single
    * double divisions of exact integer sums.
    *
    * Scale: both inputs are top-5-per-query relations — |Q|·5 rows —
    * so everything here is bounded by the query set, not the corpus;
    * the corpus-scale work lives in the index queries it evaluates. */
  def q245RankMetrics(s: SparkSession, dir: String): DataFrame = {
    def us(e: String): String =
      s"CAST(CAST($e AS DECIMAL(25,6)) * 1000000 AS BIGINT)"
    val truth = qKnnBrute(s, dir).select(col("qid"), col("cid"),
      col("rn").as("trn"), (lit(6L) - col("rn")).as("rel"))
    val sys = qKnnIvf(s, dir).select(col("qid"), col("cid"), col("rn"))
    val perSys = sys
      .join(truth.select(col("qid"), col("cid"), col("rel")),
        Seq("qid", "cid"), "left")
      .withColumn("rel", coalesce(col("rel"), lit(0L)))
      .withColumn("dg_us", expr(us(
        "CAST(rel AS DOUBLE) / log2(CAST(rn AS DOUBLE) + 1.0)")))
      .groupBy("qid")
      .agg(sum("dg_us").as("dcg_us"),
        min(when(col("rel") > 0, col("rn"))).as("first_rel"))
      .withColumn("rr_us", coalesce(
        expr(us("1.0 / CAST(first_rel AS DOUBLE)")), lit(0L)))
    val ideal = truth
      .withColumn("ig_us", expr(us(
        "CAST(rel AS DOUBLE) / log2(CAST(trn AS DOUBLE) + 1.0)")))
      .groupBy("qid").agg(sum("ig_us").as("idcg_us"))
    perSys.join(ideal, "qid")
      .withColumn("ndcg_us", expr(us(
        "CAST(dcg_us AS DOUBLE) / CAST(idcg_us AS DOUBLE)")))
      .agg(count(lit(1)).as("n_queries"),
        expr("CAST(SUM(rr_us) AS DOUBLE) / 1000000.0 / " +
          "CAST(COUNT(1) AS DOUBLE)").as("mrr"),
        expr("CAST(SUM(ndcg_us) AS DOUBLE) / 1000000.0 / " +
          "CAST(COUNT(1) AS DOUBLE)").as("ndcg_at_5"))
  }

  val q245Sql: String = {
    def us(e: String): String =
      s"CAST(CAST($e AS DECIMAL(25,6)) * 1000000 AS BIGINT)"
    s"""WITH truth AS MATERIALIZED (
       |  SELECT qid, cid, rn AS trn, 6 - rn AS rel FROM ($qKnnBruteSql) b),
       |sys AS MATERIALIZED (SELECT qid, cid, rn FROM ($qKnnIvfSql) v),
       |j AS (SELECT s.qid, s.rn, COALESCE(t.rel, 0) AS rel
       |  FROM sys s LEFT JOIN truth t ON s.qid = t.qid AND s.cid = t.cid),
       |d AS (SELECT qid,
       |  SUM(${us("CAST(rel AS DOUBLE) / log2(CAST(rn AS DOUBLE) + 1.0)")})
       |    AS dcg_us,
       |  MIN(CASE WHEN rel > 0 THEN rn END) AS first_rel
       |  FROM j GROUP BY 1),
       |i AS (SELECT qid,
       |  SUM(${us("CAST(rel AS DOUBLE) / log2(CAST(trn AS DOUBLE) + 1.0)")})
       |    AS idcg_us
       |  FROM truth GROUP BY 1),
       |p2 AS (SELECT d.qid,
       |  COALESCE(${us("1.0 / CAST(first_rel AS DOUBLE)")}, 0) AS rr_us,
       |  ${us("CAST(dcg_us AS DOUBLE) / CAST(idcg_us AS DOUBLE)")} AS ndcg_us
       |  FROM d JOIN i ON d.qid = i.qid)
       |SELECT CAST(COUNT(*) AS BIGINT) AS n_queries,
       |  CAST(SUM(rr_us) AS DOUBLE) / 1000000.0 / CAST(COUNT(*) AS DOUBLE)
       |    AS mrr,
       |  CAST(SUM(ndcg_us) AS DOUBLE) / 1000000.0 / CAST(COUNT(*) AS DOUBLE)
       |    AS ndcg_at_5
       |FROM p2""".stripMargin
  }

  // --------------------------------------------------- q168 k-means
  /** Quantized-Lloyd k-means over the embedding corpus: [[KmeansK]]
    * seed centroids (the K smallest vec_ids), [[KmeansIters]]
    * assignment→update rounds, one final assignment; output is the
    * per-cluster membership count and mean squared distance — the
    * inertia decomposition behind clustering-based diversity sampling
    * and IVF coarse-quantizer retraining (q32 assigns to FIXED seeds;
    * this is the refinement loop that would train them).
    *
    * Determinism contract (what makes an ITERATIVE float algorithm
    * oracle-checkable): every squared distance is a per-dimension
    * (v−c)² fold routed through DECIMAL(25,6) (order-insensitive sum),
    * and every updated centroid coordinate is round(dsum(v)/n, 6) —
    * both engines quantize identically at each round, so the argmin
    * assignments (cluster-id tie-break) match bit-for-bit throughout.
    *
    * Plan shape: ONE posexplode of the corpus feeds every round; the
    * K×dim centroid relation is collected driver-side between rounds
    * (bounded: K·dim = 512 rows — the PQ-codebook pattern) and
    * broadcast back, so each round is a broadcast join + ONE map-side
    * combined (vec, k) aggregate, and the plan never deepens with the
    * round count. At 100 TB the same loop re-expresses assignment over
    * the native vec_dot kernel (|x−c|² = |x|² − 2x·c + |c|²); the
    * long form here is the semantics pin the oracle can mirror. */
  val KmeansK: Int = 8
  val KmeansIters: Int = 2

  // Managed cache for the exploded (vec_id, p, v) relation (the
  // cachedSignatures pattern): every k-means round — 3 assignments +
  // 2 centroid updates — re-reads it, and without a cache each round
  // re-pays the scan + posexplode. Derived deterministically from the
  // corpus, so it is an index-like artifact; one slot per JVM, keyed
  // by fixture dir. At 100 TB this is the standard iterative-ML
  // persist (narrow corpus×dim rows, MEMORY_AND_DISK).
  @transient private var cachedKmeansEx: Option[(String, DataFrame)] = None

  private[queries] def kmeansExploded(s: SparkSession, dir: String): DataFrame =
    synchronized {
      cachedKmeansEx match {
        case Some((d, df)) if d == dir => df
        case prev =>
          prev.foreach(_._2.unpersist())
          val df = emb(s, dir).select(col("vec_id"), posexplode(col("embedding")))
            .select(col("vec_id"), col("pos").as("p"),
              col("col").cast("double").as("v"))
            .cache()
          df.count()
          cachedKmeansEx = Some((dir, df))
          df
      }
    }

  /** Argmin assignment of every vector to a centroid in `cent(k,p,c)`:
    * (vec_id, k, dist) with dist the decimal-summed squared L2. The
    * argmin is `min(struct(dist, k))` — one aggregate over the
    * K-per-vector distance rows instead of a window sort (same
    * (dist, k) lexicographic tie-break). */
  private[queries] def kmeansAssign(ex: DataFrame, cent: DataFrame): DataFrame =
    ex.join(broadcast(cent), "p")
      .withColumn("sq", (col("v") - col("c")) * (col("v") - col("c")))
      .groupBy(col("vec_id"), col("k"))
      .agg(Relational.dsum(col("sq")).as("dist"))
      .groupBy(col("vec_id"))
      .agg(min(struct(col("dist"), col("k"))).as("m"))
      .select(col("vec_id"), col("m.k").as("k"), col("m.dist").as("dist"))

  /** Per-row distance to one centroid, embedded as a folded array
    * literal: each dimension's (v−c)² quantizes to DECIMAL(25,6) and
    * accumulates in exact decimal micro-units — VALUE-identical to the
    * oracle's grouped decimal SUM under any order (exact decimal
    * addition is associative), so the engine is free to use the
    * shuffle-free scan-local form while the oracle keeps the
    * independent long-form recomputation. The native codegen'd
    * [[graft.expressions.L2SquaredQuantized]] kernel replaces the
    * `aggregate(zip_with(...))` decimal-fold chain (CodegenFallback,
    * one boxed BigDecimal op per dimension per lambda step) with one
    * primitive loop. */
  private def kmeansDistExpr(c: Seq[Double]): String = {
    val arr = c.map(v => s"CAST($v AS DOUBLE)").mkString("array(", ",", ")")
    s"graft_l2sq_q6(embedding, $arr)"
  }

  /** Scan-local assignment columns for a FIXED centroid set: K
    * distance folds per row + array_min + first-position argmin —
    * ZERO shuffles (the long-form [[kmeansAssign]] is the semantics
    * twin the spec cross-checks). `cent` must be sorted by k so
    * array_position's first-match IS the lowest-k tie-break. Exposes
    * `dists` (all K distances) and `pos` (1-based argmin index) for
    * downstream per-point probes (q254's silhouette needs the
    * second-best distance). */
  private def kmeansAssignCols(e: DataFrame,
      cent: Seq[(Int, Seq[Double])]): DataFrame = {
    val dists = cent.map(c => kmeansDistExpr(c._2))
      .mkString("array(", ",\n", ")")
    val ks = cent.map(_._1).mkString("array(", ",", ")")
    e.withColumn("dists", expr(dists))
      .withColumn("dist", expr("array_min(dists)"))
      .withColumn("pos", expr("CAST(array_position(dists, dist) AS INT)"))
      .withColumn("k", expr(s"element_at($ks, pos)"))
  }

  // Final-centroid memo (one slot, dir-keyed — the cachedKmeansEx
  // pattern): q168 and q254 both consume the trained centroids; the
  // Lloyd rounds are deterministic in the fixture, so the K×dim
  // driver-side result is an index-like artifact.
  @transient private var cachedKmeansCent:
    Option[(String, Seq[(Int, Seq[Double])])] = None

  /** Seed + [[KmeansIters]] quantized-Lloyd rounds; returns the final
    * centroids sorted by k (bounded driver state: K×dim doubles). */
  private[queries] def kmeansFinalCentroids(
      s: SparkSession, dir: String): Seq[(Int, Seq[Double])] = synchronized {
    cachedKmeansCent match {
      case Some((d, c)) if d == dir => c
      case _ =>
        val e = emb(s, dir).select(col("vec_id"), col("embedding"))
        var cent: Seq[(Int, Seq[Double])] = e.filter(col("vec_id") < KmeansK)
          .collect()
          .map(r => (r.getLong(0).toInt,
            r.getSeq[Float](1).map(_.toDouble).toSeq))
          .sortBy(_._1).toSeq
        // Per-round fixed costs (task launch, AQE re-plan) dominate
        // the fixture-scale volumes — the q63 iterative-stage
        // treatment.
        graft.core.Sessions.withConfs(s,
          "spark.sql.shuffle.partitions" -> "8",
          "spark.sql.adaptive.enabled" -> "false") {
          for (_ <- 1 to KmeansIters) {
            val upd = kmeansAssignCols(e, cent)
              .select(col("k"), posexplode(col("embedding")))
              .select(col("k"), col("pos").as("p"),
                col("col").cast("double").as("v"))
              .groupBy(col("k"), col("p"))
              .agg(Relational.dmean(col("v"), 6).as("c"))
              .collect().map(r => (r.getInt(0), r.getInt(1), r.getDouble(2)))
            cent = upd.groupBy(_._1).map { case (k, rows) =>
              (k, rows.sortBy(_._2).map(_._3).toSeq)
            }.toSeq.sortBy(_._1)
          }
        }
        cachedKmeansCent = Some((dir, cent))
        cent
    }
  }

  def qKmeans(s: SparkSession, dir: String): DataFrame = {
    val cent = kmeansFinalCentroids(s, dir)
    val e = emb(s, dir).select(col("vec_id"), col("embedding"))
    graft.core.Sessions.withConfs(s,
      "spark.sql.shuffle.partitions" -> "8",
      "spark.sql.adaptive.enabled" -> "false") {
      val out = kmeansAssignCols(e, cent).groupBy(col("k").as("cluster"))
        .agg(count(lit(1)).as("n_members"),
          Relational.dmean(col("dist"), 6).as("mean_dist"))
        .orderBy("cluster")
      // materialize under the scoped confs (K rows; later actions
      // replay from this local result, not the round pipeline)
      val rows = out.collect()
      s.createDataFrame(
        s.sparkContext.parallelize(rows.toIndexedSeq, 1), out.schema)
    }
  }

  /** The q168 Lloyd-round CTE chain (seed c0, KmeansIters d/a/c
    * rounds, final-round d/a relations) — shared by [[qKmeansSql]]
    * and q254's silhouette oracle so both replay the SAME training. */
  private val kmeansCtePrefixSql: String = {
    def dStep(i: Int): String =
      s"""d$i AS (SELECT e.vec_id, c.k,
         |  CAST(SUM(CAST((e.v - c.c) * (e.v - c.c) AS DECIMAL(25,6))) AS DOUBLE) AS dist
         |  FROM e JOIN c${i - 1} c ON e.p = c.p GROUP BY 1, 2),
         |a$i AS (SELECT vec_id, k, dist FROM (SELECT *,
         |  ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, k) AS rn
         |  FROM d$i) WHERE rn = 1)""".stripMargin
    def cStep(i: Int): String =
      s"""c$i AS (SELECT a.k, e.p,
         |  ${Relational.DMEAN("e.v", 6)} AS c
         |  FROM e JOIN a$i a USING (vec_id) GROUP BY 1, 2)""".stripMargin
    val rounds = (1 to KmeansIters)
      .map(i => dStep(i) + ",\n" + cStep(i)).mkString(",\n")
    val fin = KmeansIters + 1
    s"""WITH ex AS (SELECT vec_id,
       |  unnest(list_transform(range(1, len(embedding) + 1),
       |    i -> {'p': i - 1, 'v': CAST(embedding[i] AS DOUBLE)})) AS s
       |  FROM embeddings),
       |e AS (SELECT vec_id, s.p AS p, s.v AS v FROM ex),
       |c0 AS (SELECT CAST(vec_id AS INT) AS k, p, v AS c FROM e
       |  WHERE vec_id < $KmeansK),
       |$rounds,
       |${dStep(fin)}""".stripMargin
  }

  val qKmeansSql: String = {
    val fin = KmeansIters + 1
    s"""$kmeansCtePrefixSql
       |SELECT k AS cluster, COUNT(*) AS n_members,
       |${Relational.DMEAN("dist", 6)}
       |  AS mean_dist
       |FROM a$fin GROUP BY 1 ORDER BY cluster""".stripMargin
  }

  // ------------------------------- q254 simplified silhouette score
  /** Cluster-quality audit of the q168 k-means result: the simplified
    * (centroid-based) silhouette — per point, a = distance to its own
    * trained centroid, b = distance to the nearest OTHER centroid,
    * s = (b − a) / max(a, b) — reported per cluster and corpus-wide.
    * The "is K even right / which clusters are mush" scalar read
    * before clustering-based curation (q186 SemDeDup, q213 prototype
    * pruning) trusts the partition; the classic O(n²) silhouette is
    * infeasible at corpus scale, the centroid form is the standard
    * production surrogate and needs only the K distances q168 already
    * computes per point.
    *
    * Determinism: squared distances are the q168 decimal-quantized
    * folds (bit-identical to the oracle's grouped decimal SUM);
    * sqrt is correctly-rounded IEEE; each per-point s quantizes to
    * 6 dp before the decimal mean; a == b == 0 (point ON two
    * centroids) deterministically scores 0. The engine excludes the
    * argmin POSITION (lowest-k among ties), the oracle excludes
    * rn = 1 under ORDER BY (dist, k) — the same element.
    *
    * Scale: scan-local K-fold distances + argmin (zero shuffles to
    * score), one map-side-combined aggregation to K rows, one-row
    * aggregate crossJoin for the corpus mean. */
  def q254Silhouette(s: SparkSession, dir: String): DataFrame = {
    val cent = kmeansFinalCentroids(s, dir)
    val e = emb(s, dir).select(col("vec_id"), col("embedding"))
    graft.core.Sessions.withConfs(s,
      "spark.sql.shuffle.partitions" -> "8",
      "spark.sql.adaptive.enabled" -> "false") {
      val sil = kmeansAssignCols(e, cent)
        .withColumn("b",
          expr("array_min(filter(dists, (d, i) -> i != pos - 1))"))
        .withColumn("sa", sqrt(col("dist")))
        .withColumn("sb", sqrt(col("b")))
        .withColumn("sil",
          when(greatest(col("sa"), col("sb")) === 0.0, lit(0.0))
            .otherwise(round((col("sb") - col("sa")) /
              greatest(col("sa"), col("sb")), 6)))
      // ONE pass over the K-fold distance scan (round 21): the
      // separate `tot` aggregate re-executed the whole sil subtree
      // (measured at sf0.1: two ~640 ms jobs for one 8-row result).
      // Aggregate per cluster to (count, DECIMAL(25,6) sum) once, then
      // derive BOTH the per-cluster mean and the corpus mean from
      // those rows via an unpartitioned window over the K-row
      // aggregate — decimal addition is associative, so the window
      // total equals the direct corpus sum bit-for-bit, and
      // dmeanFinish applies the same integer tie-break as dmean.
      val w = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
      val out = sil.groupBy(col("k").as("cluster"))
        .agg(count(lit(1)).as("n_members"),
          sum(col("sil").cast(org.apache.spark.sql.types.DecimalType(25, 6)))
            .as("ssum"))
        .select(col("cluster"), col("n_members"),
          Relational.dmeanFinish(col("ssum"), col("n_members"), 6)
            .as("mean_sil"),
          Relational.dmeanFinish(sum(col("ssum")).over(w),
            sum(col("n_members")).over(w), 6).as("overall_sil"))
        .orderBy("cluster")
      val rows = out.collect()
      s.createDataFrame(
        s.sparkContext.parallelize(rows.toIndexedSeq, 1), out.schema)
    }
  }

  val q254Sql: String = {
    val fin = KmeansIters + 1
    s"""$kmeansCtePrefixSql,
       |rr AS (SELECT vec_id, k, dist,
       |  ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, k) AS rn
       |  FROM d$fin),
       |ab AS (SELECT vec_id,
       |  MIN(CASE WHEN rn = 1 THEN k END) AS cluster,
       |  MIN(CASE WHEN rn = 1 THEN dist END) AS a,
       |  MIN(CASE WHEN rn > 1 THEN dist END) AS b
       |  FROM rr GROUP BY 1),
       |sil AS (SELECT cluster,
       |  CASE WHEN greatest(sqrt(a), sqrt(b)) = 0 THEN 0.0
       |       ELSE round((sqrt(b) - sqrt(a)) / greatest(sqrt(a), sqrt(b)), 6)
       |  END AS sil FROM ab),
       |tt AS (SELECT ${Relational.DMEAN("sil", 6)}
       |  AS overall_sil FROM sil)
       |SELECT cluster, CAST(COUNT(*) AS BIGINT) AS n_members,
       |  ${Relational.DMEAN("sil", 6)}
       |    AS mean_sil,
       |  tt.overall_sil
       |FROM sil CROSS JOIN tt GROUP BY 1, 4 ORDER BY 1""".stripMargin
  }

  // ------------------------------------ q183 per-dim standardization
  /** Per-dimension standardization statistics over the embedding
    * corpus — the "fit" half of a whitening/normalization transform
    * (mean, sample std, min, max per coordinate) plus each dimension's
    * share of total variance: the diagnostics behind anisotropy checks
    * (dominant dimensions hurt cosine retrieval) and the parameters a
    * per-dim scaler applies at inference.
    *
    * Determinism: moments route through DECIMAL ([[Relational.dsum]]);
    * std = sqrt((Σv²−(Σv)²/n)/(n−1)) uses only IEEE-exact ops on the
    * bit-identical moments (sqrt is correctly-rounded, so the double
    * is engine-identical; its 6-dp round carries no structural tie —
    * a tie would need the irrational-or-division-derived double to
    * land exactly on a 7-dp decimal). The RATIONAL outputs round
    * exactly: mean via [[Relational.dmean]]; var_share as an integer
    * ratio — every dimension's variance numerator
    * svv_us·n·10⁶ − sv_us² shares the same denominator n(n−1)·10¹²,
    * which cancels in the share, so var_share =
    * [[Relational.dfrac]](vnum, Σvnum, 6) on exact integers. v_min /
    * v_max emit the raw float-as-double (bit-exact in both engines) —
    * a 6-dp double round of a DATA value can hit an odd/2⁷-class
    * float whose shortest repr ties at 7 dp. Plan: ONE posexplode +
    * one map-side-combined (p) shuffle; |dim| result rows; the
    * total-variance denominator is a window over the |dim|-row
    * aggregate, not the corpus. */
  def q183DimStats(s: SparkSession, dir: String): DataFrame = {
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val dec = org.apache.spark.sql.types.DecimalType(25, 6)
    val ex = emb(s, dir).select(posexplode(col("embedding")))
      .select(col("pos").as("p"), col("col").cast("double").as("v"))
    // ONE decimal aggregate per moment: sd/sdd feed the double
    // moments (== dsum), the micro-unit integers, AND the exact mean
    // (the dmean formula applied to sv_us — no second sum buffer)
    val m = ex.groupBy(col("p")).agg(
      count(lit(1)).as("n"),
      sum(col("v").cast(dec)).as("sd"),
      sum((col("v") * col("v")).cast(dec)).as("sdd"),
      min(col("v")).as("v_min"),
      max(col("v")).as("v_max"))
      .select(col("p"), col("n"),
        col("sd").cast("double").as("sv"),
        col("sdd").cast("double").as("svv"),
        (col("sd") * lit(1000000L)).cast(d38).as("sv_us"),
        (col("sdd") * lit(1000000L)).cast(d38).as("svv_us"),
        col("v_min"), col("v_max"))
    val nD = col("n").cast(d38)
    val meanUnits = org.apache.spark.sql.graftbridge.ColumnBridge.div(
      abs(col("sv_us")) * lit(2L) + nD, nD * lit(2L))
    m.withColumn("mean",
        (when(col("sv_us") < lit(0), -meanUnits).otherwise(meanUnits)
          .cast("double") / lit(1e6)))
      .withColumn("variance",
        (col("svv") - col("sv") * col("sv") / col("n")) / (col("n") - 1))
      .withColumn("vnum",
        (col("svv_us") * nD * lit(1000000L).cast(d38) -
          col("sv_us") * col("sv_us")).cast(d38))
      .withColumn("vtotal", sum(col("vnum")).over(Window.partitionBy()))
      .withColumn("var_share",
        Relational.dfrac(col("vnum"), col("vtotal"), 6))
      .select(col("p"), col("n"), col("mean"),
        round(sqrt(col("variance")), 6).as("std"),
        col("v_min"), col("v_max"), col("var_share"))
      .orderBy("p")
  }

  val q183Sql: String = {
    import Relational.DSUM
    s"""WITH ex AS (SELECT
       |  unnest(list_transform(range(1, len(embedding) + 1),
       |    i -> {'p': i - 1, 'v': CAST(embedding[i] AS DOUBLE)})) AS s
       |  FROM embeddings),
       |e AS (SELECT s.p AS p, s.v AS v FROM ex),
       |m AS (SELECT p, COUNT(*) AS n, ${DSUM("v")} AS sv,
       |  ${DSUM("v * v")} AS svv,
       |  CAST(SUM(CAST(v AS DECIMAL(25,6))) * 1000000 AS HUGEINT) AS sv_us,
       |  CAST(SUM(CAST(v * v AS DECIMAL(25,6))) * 1000000 AS HUGEINT)
       |    AS svv_us,
       |  ${Relational.DMEAN("v", 6)} AS mean,
       |  MIN(v) AS v_min, MAX(v) AS v_max
       |  FROM e GROUP BY p),
       |vr AS (SELECT *,
       |  (svv - sv * sv / n) / (n - 1) AS variance,
       |  svv_us * n * 1000000 - sv_us * sv_us AS vnum FROM m)
       |SELECT p, n, mean,
       |round(sqrt(variance), 6) AS std, v_min, v_max,
       |${Relational.DFRAC("vnum", "SUM(vnum) OVER ()", 6)} AS var_share
       |FROM vr ORDER BY p""".stripMargin
  }

  // ------------------------------------ q203 Fisher class separation
  /** Per-dimension Fisher separation of the labeled embedding space:
    * between-class variance over within-class variance for every
    * coordinate — the feature-quality audit behind "which dimensions
    * actually carry the label signal" (high ratio ⇒ discriminative
    * axis; all-low ⇒ the labels are not linearly visible and an ANN
    * probe on raw coordinates won't stratify). The q183 moment
    * machinery refined one level: moments per (dimension, class).
    *
    * Determinism: per-class moments route through DECIMAL
    * ([[Relational.dsum]]); the class→dimension reductions re-quantize
    * each class term before summing (≤ |classes| terms, order cannot
    * change bits); every division is IEEE on identical operands.
    *
    * Scale: ONE posexplode shuffle to (dim, label) granularity —
    * |dim|·|classes| rows — then windows and rollups over that tiny
    * relation; the corpus is touched once, map-side combined. */
  def q203FisherSep(s: SparkSession, dir: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(25, 6)
    val ex = emb(s, dir).select(col("label"), posexplode(col("embedding")))
      .select(col("label"), col("pos").as("p"), col("col").cast("double").as("v"))
    val cls = ex.groupBy(col("p"), col("label")).agg(
      count(lit(1)).as("nc"),
      Relational.dsum(col("v")).as("svc"),
      Relational.dsum(col("v") * col("v")).as("svvc"))
    val wp = Window.partitionBy("p")
    cls
      .withColumn("n", sum(col("nc")).over(wp))
      .withColumn("sv", sum(col("svc").cast(dec)).over(wp).cast("double"))
      .withColumn("within_c",
        col("svvc") - col("svc") * col("svc") / col("nc"))
      .withColumn("between_c",
        col("nc") * (col("svc") / col("nc") - col("sv") / col("n")) *
          (col("svc") / col("nc") - col("sv") / col("n")))
      .groupBy("p")
      .agg(max(col("n")).as("n"), count(lit(1)).as("n_classes"),
        (sum(col("within_c").cast(dec)) * lit(1000000L))
          .cast(org.apache.spark.sql.types.DecimalType(38, 0)).as("ws_us"),
        (sum(col("between_c").cast(dec)) * lit(1000000L))
          .cast(org.apache.spark.sql.types.DecimalType(38, 0)).as("bs_us"))
      // the quantized sums are exact micro-unit integers, so every
      // output is a pure integer ratio — rounded via dfrac on the
      // exact rational (within_var = ws_us/((n−k)·10⁶) etc.; the
      // micro-units cancel in fisher); round(double) breaks their
      // real 7-dp ties engine-differently. ws_us can be a hair
      // negative from quantization of a ~0 within-class term, hence
      // the signed dfrac and the fisher guard.
      .select(col("p"), col("n"), col("n_classes"),
        Relational.dfrac(col("ws_us"),
          (col("n") - col("n_classes")) * lit(1000000L), 6).as("within_var"),
        Relational.dfrac(col("bs_us"),
          (col("n_classes") - 1) * lit(1000000L), 6).as("between_var"),
        when(col("ws_us") > 0, Relational.dfrac(
          col("bs_us") * (col("n") - col("n_classes"))
            .cast(org.apache.spark.sql.types.DecimalType(38, 0)),
          col("ws_us") * (col("n_classes") - 1)
            .cast(org.apache.spark.sql.types.DecimalType(38, 0)), 6))
          .otherwise(lit(Double.PositiveInfinity)).as("fisher"))
      .orderBy("p")
  }

  val q203Sql: String = {
    import Relational.DSUM
    s"""WITH ex AS (SELECT label,
       |  unnest(list_transform(range(1, len(embedding) + 1),
       |    i -> {'p': i - 1, 'v': CAST(embedding[i] AS DOUBLE)})) AS s
       |  FROM embeddings),
       |e AS (SELECT label, s.p AS p, s.v AS v FROM ex),
       |cls AS (SELECT p, label, COUNT(*) AS nc, ${DSUM("v")} AS svc,
       |  ${DSUM("v * v")} AS svvc FROM e GROUP BY 1, 2),
       |tot AS (SELECT *,
       |  CAST(SUM(nc) OVER (PARTITION BY p) AS BIGINT) AS n,
       |  CAST(SUM(CAST(svc AS DECIMAL(25,6))) OVER (PARTITION BY p)
       |    AS DOUBLE) AS sv FROM cls),
       |terms AS (SELECT p, n,
       |  svvc - svc * svc / nc AS within_c,
       |  nc * (svc / nc - sv / n) * (svc / nc - sv / n) AS between_c
       |  FROM tot),
       |g AS (SELECT p, MAX(n) AS n, COUNT(*) AS n_classes,
       |  CAST(SUM(CAST(within_c AS DECIMAL(25,6))) * 1000000 AS HUGEINT)
       |    AS ws_us,
       |  CAST(SUM(CAST(between_c AS DECIMAL(25,6))) * 1000000 AS HUGEINT)
       |    AS bs_us
       |  FROM terms GROUP BY 1)
       |SELECT p, n, n_classes,
       |  ${Relational.DFRAC("ws_us", "(n - n_classes) * 1000000", 6)}
       |    AS within_var,
       |  ${Relational.DFRAC("bs_us", "(n_classes - 1) * 1000000", 6)}
       |    AS between_var,
       |  CASE WHEN ws_us > 0 THEN ${Relational.DFRAC(
            "bs_us * (n - n_classes)", "ws_us * (n_classes - 1)", 6)}
       |    ELSE CAST('infinity' AS DOUBLE) END AS fisher
       |FROM g ORDER BY p""".stripMargin
  }

  // ------------------------------------------ q206 PC1 power iteration
  /** Top principal component of the embedding corpus by fixed-round
    * power iteration over the exact covariance matrix — the anisotropy
    * audit behind "is cosine retrieval dominated by one rogue
    * direction" (Mu & Viswanath's all-but-the-top observation) and the
    * whitening direction a post-processor would remove. Emits per
    * dimension the signed PC1 loading plus the eigenvalue estimate
    * (‖C·v‖ after the final round) and its share of total variance
    * (trace).
    *
    * Spark-first linear algebra: covariance is ONE self-join outer-
    * product aggregation — (vec_id,i,v) ⋈ (vec_id,j,w) → dsum(v·w)
    * per (i,j) — i.e. a |dim|²-row relation built map-side-combined
    * from a single corpus pass (no driver matrices, no collect). The
    * three matvec+normalize rounds then run on that |dim|²-row
    * relation joined against a |dim|-row vector — constant-size work
    * independent of corpus size, exactly how an iterative solver
    * should sit on top of a 100 TB scan.
    *
    * Determinism: every reduction (covariance moments, matvec terms,
    * norms, trace) quantizes to a shifted DECIMAL(25,6) — terms ·2^10
    * before the cast, the sum /2^10 after, both exact double ops — so
    * neither join order nor partitioning changes bits; sqrt and the
    * divisions are IEEE-exact on identical operands; v₀ = 1/√64 =
    * 0.125 exactly. The sign convention (make the largest-|loading|
    * coordinate positive, min index on ties) makes the eigenvector
    * unique — power iteration's inherent sign ambiguity would
    * otherwise be engine-dependent. Three rounds is a FIXED contract,
    * not a convergence loop: both engines run the identical
    * computation graph. */
  val Pc1Rounds = 3

  def q206Pc1Power(s: SparkSession, dir: String): DataFrame = {
    // Reductions here need more than the repo-wide 6-dp quantum: after
    // normalization the matvec terms are ~1e-3 and plain DECIMAL(25,6)
    // costs ~1e-3 relative error per round (measured: ‖v‖ drifting to
    // 0.9976). Raising the decimal SCALE is not the fix — at scale 18
    // the engines' double→decimal casts are no longer exactly rounded
    // and last-ulp divergences appear (measured: 64/64 rows off by
    // ~1e-16). Instead keep the proven 6-dp cast regime but shift the
    // terms by 2^10 first: ·1024 and /1024 are EXACT double ops, the
    // cast still sees O(1)-magnitude values (where both engines round
    // identically), and the effective quantum becomes 1e-6/1024 ≈ 1e-9
    // — unit-norm loadings to ~1e-8 with zero tie-boundary risk.
    val dec = org.apache.spark.sql.types.DecimalType(25, 6)
    def dsum2(c: Column): Column =
      (sum((c * lit(1024.0)).cast(dec)).cast("double") / lit(1024.0))
    val ex = emb(s, dir).select(col("vec_id"), posexplode(col("embedding")))
      .select(col("vec_id"), col("pos").as("i"), col("col").cast("double").as("v"))
    val sums = ex.groupBy("i").agg(count(lit(1)).as("n"),
      dsum2(col("v")).as("sv"))
    val sxy = ex.join(ex.select(col("vec_id"), col("i").as("j"),
        col("v").as("w")), "vec_id")
      .groupBy("i", "j").agg(dsum2(col("v") * col("w")).as("svw"))
    val cov = sxy
      .join(sums.select(col("i"), col("sv").as("svi"), col("n")), "i")
      .join(sums.select(col("i").as("j"), col("sv").as("svj")), "j")
      .withColumn("cov",
        (col("svw") - col("svi") * col("svj") / col("n")) / (col("n") - 1))
      .select("i", "j", "cov")
    var v = sums.select(col("i"), lit(0.125).as("vv"))
    var nrm: DataFrame = null
    var w: DataFrame = null
    for (_ <- 1 to Pc1Rounds) {
      w = cov.join(v.select(col("i").as("j"), col("vv")), "j")
        .groupBy("i").agg(dsum2(col("cov") * col("vv")).as("w"))
      nrm = w.agg(sqrt(dsum2(col("w") * col("w"))).as("nrm"))
      v = w.crossJoin(broadcast(nrm))
        .select(col("i"), (col("w") / col("nrm")).as("vv"))
    }
    val trace = cov.filter(col("i") === col("j"))
      .agg(dsum2(col("cov")).as("trace"))
    val wSgn = Window.orderBy(abs(col("vv")).desc, col("i"))
    v.withColumn("s0", signum(first(col("vv")).over(wSgn)))
      .withColumn("sgn", when(col("s0") === 0.0, 1.0).otherwise(col("s0")))
      .crossJoin(broadcast(nrm)).crossJoin(broadcast(trace))
      .select(col("i").as("p"), (col("vv") * col("sgn")).as("loading"),
        col("nrm").as("eigenvalue"),
        (col("nrm") / col("trace")).as("var_share"))
      .orderBy("p")
  }

  val q206Sql: String = {
    def D(x: String) =
      s"(CAST(SUM(CAST(($x) * 1024.0 AS DECIMAL(25,6))) AS DOUBLE) / 1024.0)"
    val rounds = (1 to Pc1Rounds).map { r =>
      val prev = if (r == 1) "v0" else s"v${r - 1}"
      s"""w$r AS (SELECT c.i, ${D(s"c.cov * $prev.vv")} AS w
         |  FROM cov c JOIN $prev ON c.j = $prev.i GROUP BY 1),
         |n$r AS (SELECT sqrt(${D("w * w")}) AS nrm FROM w$r),
         |v$r AS (SELECT i, w / (SELECT nrm FROM n$r) AS vv FROM w$r)"""
        .stripMargin
    }.mkString(",\n")
    val last = s"v$Pc1Rounds"
    val lastN = s"n$Pc1Rounds"
    s"""WITH ex0 AS (SELECT vec_id,
       |  unnest(list_transform(range(1, len(embedding) + 1),
       |    x -> {'i': x - 1, 'v': CAST(embedding[x] AS DOUBLE)})) AS s
       |  FROM embeddings),
       |e AS (SELECT vec_id, s.i AS i, s.v AS v FROM ex0),
       |sums AS (SELECT i, COUNT(*) AS n, ${D("v")} AS sv FROM e GROUP BY 1),
       |sxy AS (SELECT a.i AS i, b.i AS j, ${D("a.v * b.v")} AS svw
       |  FROM e a JOIN e b ON a.vec_id = b.vec_id GROUP BY 1, 2),
       |cov AS (SELECT s.i, s.j,
       |  (s.svw - si.sv * sj.sv / si.n) / (si.n - 1) AS cov
       |  FROM sxy s JOIN sums si ON s.i = si.i JOIN sums sj ON s.j = sj.i),
       |v0 AS (SELECT i, 0.125 AS vv FROM sums),
       |$rounds,
       |tr AS (SELECT ${D("cov")} AS trace FROM cov WHERE i = j),
       |sg AS (SELECT CASE WHEN t.f = 0 THEN 1.0 ELSE sign(t.f) END AS s
       |  FROM (SELECT vv AS f FROM $last ORDER BY abs(vv) DESC, i LIMIT 1) t)
       |SELECT $last.i AS p,
       |  $last.vv * (SELECT s FROM sg) AS loading,
       |  (SELECT nrm FROM $lastN) AS eigenvalue,
       |  (SELECT nrm FROM $lastN) / (SELECT trace FROM tr) AS var_share
       |FROM $last ORDER BY p""".stripMargin
  }

  // --------------------------------------------- q186 SemDeDup apply
  /** SemDeDup-style semantic deduplication APPLIED (Abbas et al.'s
    * cluster-then-prune recipe, re-expressed Spark-first): assign every
    * vector to its IVF coarse cell (the k-means stand-in — zero-shuffle
    * per-row fold over the K-seed literal, as in q32/q39), then inside
    * each cell kill every vector that has a LOWER-id neighbor above the
    * cosine threshold, and report per-cell attrition. This is the
    * "apply" step on top of q39's pair audit — the same audit→apply
    * progression as q173→q184 for exact substrings.
    *
    * Survivor rule: lowest vec_id per near-dup neighborhood survives
    * (deterministic, engine-portable — mirrors qDedupExact's keep-min
    * convention). Kill decisions use pairs, not transitive closure: v
    * dies iff SOME u<v in its cell has cosine(u,v) > τ, matching
    * SemDeDup's greedy one-representative-per-duplicate-set semantics
    * without an iterative fixpoint.
    *
    * Scale: the quadratic is cell-local (the coarse quantizer bounds
    * block size exactly as in q39); the kill list is a narrow vec_id
    * set ≤ corpus size — broadcast here because near-dup fractions are
    * small; a production corpus with a large kill fraction drops the
    * hint and lets AQE pick the hash anti-join. Accounting is one
    * map-side-combinable groupBy over the |cells| domain. */
  val SemDedupTau = 0.5

  def q186SemDedup(s: SparkSession, dir: String): DataFrame = {
    val assigned = new IvfQuantizer(s, dir).assigned
    val a = assigned.select(col("cell"), col("vec_id").as("d1"),
      col("embedding").as("e1"), col("nrm").as("n1"))
    val b = assigned.select(col("cell"), col("vec_id").as("d2"),
      col("embedding").as("e2"), col("nrm").as("n2"))
    val killed = a.join(b, "cell").filter(col("d1") < col("d2"))
      .filter(dotC(col("e1"), col("e2")) / (col("n1") * col("n2")) >
        lit(SemDedupTau))
      .select(col("d2").as("vec_id")).distinct()
      .withColumn("is_killed", lit(1L))
    assigned.join(broadcast(killed), Seq("vec_id"), "left")
      .groupBy("cell")
      .agg(count(lit(1)).as("n_members"),
        sum(coalesce(col("is_killed"), lit(0L))).as("n_killed"),
        (count(lit(1)) - sum(coalesce(col("is_killed"), lit(0L))))
          .as("n_survivors"),
        sum(when(col("is_killed").isNull, col("vec_id")).otherwise(lit(0L)))
          .as("surv_id_sum"))
      .orderBy("cell")
  }

  val q186Sql: String =
    s"""WITH n AS (SELECT vec_id, embedding, $normDuck AS nrm FROM embeddings),
       |seeds AS (SELECT vec_id AS seed_id, embedding AS se, nrm AS sn
       |  FROM n ORDER BY $ivfHashDuck, vec_id LIMIT $IvfSeedCount),
       |scored AS (SELECT n.vec_id, n.embedding, n.nrm, s.seed_id,
       |  ${dotDuck("n.embedding", "s.se")} / (n.nrm * s.sn) AS scos
       |  FROM n CROSS JOIN seeds s),
       |assigned AS (SELECT vec_id, embedding, nrm, seed_id AS cell FROM
       |  (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
       |     ORDER BY scos DESC, seed_id) AS rn FROM scored) WHERE rn = 1),
       |killed AS (SELECT DISTINCT b.vec_id FROM assigned a
       |  JOIN assigned b ON a.cell = b.cell AND a.vec_id < b.vec_id
       |  WHERE ${dotDuck("a.embedding", "b.embedding")} / (a.nrm * b.nrm)
       |    > $SemDedupTau)
       |SELECT m.cell, COUNT(*) AS n_members,
       |CAST(SUM(CASE WHEN k.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
       |  AS n_killed,
       |COUNT(*) - CAST(SUM(CASE WHEN k.vec_id IS NOT NULL THEN 1 ELSE 0 END)
       |  AS BIGINT) AS n_survivors,
       |CAST(SUM(CASE WHEN k.vec_id IS NULL THEN m.vec_id ELSE 0 END)
       |  AS BIGINT) AS surv_id_sum
       |FROM assigned m LEFT JOIN killed k USING (vec_id)
       |GROUP BY m.cell ORDER BY m.cell""".stripMargin

  // ------------------------------------------ q188 int8 quant audit
  /** Per-dimension int8 scalar quantization of the embedding corpus,
    * with an exact reconstruction-error audit — the compression stage
    * a billion-vector ANN index applies before PQ/IVF (4× memory cut
    * at float32→int8), plus the error report that decides whether it
    * is safe. Affine per-dim codes: `code = (v−min)·255/(max−min)`.
    *
    * Determinism: values are quantized ONCE to exact 6-dp micro-units
    * (`CAST(v AS DECIMAL(25,6)) · 1e6` — the established cross-engine
    * quantization, cf. `graft_l2sq_q6`), after which EVERYTHING —
    * code, reconstruction, per-dim error sums — is 64-bit integer
    * arithmetic, bit-identical by construction. Magnitudes: |qv| ≤
    * ~1e7 micro-units, so (qv−min)·255 < 2^33 — no overflow.
    *
    * Plan: one posexplode → map-side-combined per-dim min/max (|dim|
    * rows), broadcast back onto a second scan for the code pass —
    * the q110-winsorize stats-broadcast shape; the corpus never
    * reshuffles. A constant-range dim (max == min) maps to code 0 and
    * reconstructs exactly. */
  def q188Int8Quant(s: SparkSession, dir: String): DataFrame = {
    val ex = emb(s, dir).select(posexplode(col("embedding")))
      .select(col("pos").as("p"),
        expr("CAST(CAST(CAST(col AS DOUBLE) AS DECIMAL(25,6)) * 1000000 " +
          "AS BIGINT)").as("qv"))
    val stats = ex.groupBy("p").agg(
      min(col("qv")).as("qmn"), max(col("qv")).as("qmx"))
    ex.join(broadcast(stats), "p")
      .withColumn("code", when(col("qmx") > col("qmn"),
        expr("((qv - qmn) * 255) div (qmx - qmn)")).otherwise(lit(0L)))
      .withColumn("err", expr(
        "abs(qv - (qmn + (CASE WHEN qmx > qmn THEN " +
          "(code * (qmx - qmn)) div 255 ELSE 0 END)))"))
      .groupBy("p")
      .agg(count(lit(1)).as("n"), min(col("qmn")).as("qmn_us"),
        max(col("qmx")).as("qmx_us"), sum(col("code")).as("sum_code"),
        max(col("err")).as("max_err_us"), sum(col("err")).as("sum_err_us"))
      .orderBy("p")
  }

  val q188Sql: String =
    """WITH ex AS (SELECT
      |  unnest(list_transform(range(1, len(embedding) + 1),
      |    i -> {'p': i - 1,
      |          'qv': CAST(CAST(CAST(embedding[i] AS DOUBLE)
      |                AS DECIMAL(25,6)) * 1000000 AS BIGINT)})) AS s
      |  FROM embeddings),
      |e AS (SELECT s.p AS p, s.qv AS qv FROM ex),
      |st AS (SELECT p, MIN(qv) AS qmn, MAX(qv) AS qmx FROM e GROUP BY p),
      |coded AS (SELECT e.p, e.qv, st.qmn, st.qmx,
      |  CASE WHEN st.qmx > st.qmn
      |       THEN ((e.qv - st.qmn) * 255) // (st.qmx - st.qmn)
      |       ELSE 0 END AS code
      |  FROM e JOIN st USING (p)),
      |errs AS (SELECT p, qmn, qmx, code,
      |  abs(qv - (qmn + (CASE WHEN qmx > qmn
      |    THEN (code * (qmx - qmn)) // 255 ELSE 0 END))) AS err
      |  FROM coded)
      |SELECT p, COUNT(*) AS n, MIN(qmn) AS qmn_us, MAX(qmx) AS qmx_us,
      |CAST(SUM(code) AS BIGINT) AS sum_code,
      |MAX(err) AS max_err_us, CAST(SUM(err) AS BIGINT) AS sum_err_us
      |FROM errs GROUP BY p ORDER BY p""".stripMargin

  // --------------------------------------- q190 hard-negative mining
  /** Hard-negative mining for contrastive training: for each query
    * vector, the top-5 most-similar vectors whose `label` DIFFERS from
    * the query's — the highest-cosine non-positives, exactly the
    * negatives a dual-encoder trainer wants. Same brute top-k shape as
    * q30 (broadcast the fixed query set across the corpus scan,
    * per-query window) with the label-exclusion predicate applied
    * BEFORE the dot product, so excluded candidates never pay the
    * O(dim) kernel. Scale: identical to q30 — linear in N for a fixed
    * query set; the production path swaps the scan for the q32/q66 IVF
    * index with the label filter pushed into the cell join. */
  def q190HardNegatives(s: SparkSession, dir: String): DataFrame = {
    val n = emb(s, dir).select(col("vec_id"), col("label"),
      col("embedding"), expr(normSpark).as("nrm"))
    val q = n.filter(col("vec_id") < 8).select(
      col("vec_id").as("qid"), col("label").as("qlabel"),
      col("embedding").as("qe"), col("nrm").as("qn"))
    val c = n.select(col("vec_id").as("cid"), col("label").as("clabel"),
      col("embedding").as("ce"), col("nrm").as("cn"))
    val w = Window.partitionBy("qid").orderBy(col("cosine").desc, col("cid"))
    c.crossJoin(broadcast(q))
      .filter(col("clabel") =!= col("qlabel"))
      .withColumn("cosine",
        expr(dotSpark("qe", "ce")) / (col("qn") * col("cn")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select(col("qid"), col("cid"), col("clabel"), col("rn"), col("cosine"))
      .orderBy("qid", "rn")
  }

  val q190Sql: String =
    s"""WITH n AS (SELECT vec_id, label, embedding, $normDuck AS nrm
       |  FROM embeddings),
       |p AS (SELECT q.vec_id AS qid, c.vec_id AS cid, c.label AS clabel,
       |  ${dotDuck("q.embedding", "c.embedding")} / (q.nrm * c.nrm) AS cosine
       |  FROM n q, n c WHERE q.vec_id < 8 AND c.label <> q.label)
       |SELECT qid, cid, clabel, rn, cosine FROM
       |(SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
       |   ORDER BY cosine DESC, cid) AS rn FROM p)
       |WHERE rn <= 5 ORDER BY qid, rn""".stripMargin

  // ------------------------------------- q195 retrieval evaluation
  /** Ranked-retrieval evaluation of the IVF index against brute-force
    * truth — recall@5, MRR, and NDCG@5 per query, the metric battery
    * an ANN deployment gates on (q93 pins only aggregate top-1/top-5
    * agreement; this is the per-query ranked report). Binary
    * relevance: a system result is relevant iff it appears in the
    * brute top-5 for the same query.
    *
    * Determinism: every non-integer constant — the DCG discounts
    * 1/log2(i+1) and the IDCG prefix sums — is computed ONCE in Scala,
    * pre-quantized to 6 dp, and interpolated as a shortest-round-trip
    * double literal into BOTH dialects (the q167 BM25 trick), so no
    * runtime log/pow is evaluated in either engine and the
    * DECIMAL(25,6) cast of each DCG term is EXACT — this matters
    * because the two engines disagree on inexact downscaling (Spark's
    * double→decimal cast rounds half-up, DuckDB truncates a decimal
    * literal's excess scale: 0.6309297… → .630930 vs .630929). MRR is
    * 1/min-matched-rank — a single IEEE divide of exact ints. Both
    * input rankings are themselves oracle-checked (q30/q32), so this
    * composes checked artifacts.
    *
    * Scale: |Q|×5 rows joined against |Q|×5 — driver-trivial here,
    * and at any scale the metric join is bounded by the query set,
    * never the corpus. */
  private val NdcgK = 5
  private val ndcgDisc: IndexedSeq[Double] =
    (1 to NdcgK).map(i =>
      math.rint(1e6 / (math.log(i + 1.0) / math.log(2.0))) / 1e6)
  private val idcgPrefix: IndexedSeq[Double] =
    ndcgDisc.scanLeft(0.0)(_ + _)

  def q195RetrievalMetrics(s: SparkSession, dir: String): DataFrame = {
    val truth = qKnnBrute(s, dir).select(col("qid"), col("cid"))
      .withColumn("rel", lit(1L))
    val sys = qKnnIvf(s, dir).select(col("qid"), col("cid"), col("rn"))
    val discCol = (1 to NdcgK).foldLeft(lit(0.0)) { (acc, i) =>
      when(col("rn") === i, lit(ndcgDisc(i - 1))).otherwise(acc)
    }
    val idcgCol = (1 to NdcgK).foldLeft(lit(0.0)) { (acc, h) =>
      when(col("hits") === h, lit(idcgPrefix(h))).otherwise(acc)
    }
    sys.join(truth, Seq("qid", "cid"), "left")
      .groupBy("qid")
      .agg(
        sum(coalesce(col("rel"), lit(0L))).as("hits"),
        min(when(col("rel") === 1L, col("rn"))).as("min_rank"),
        Relational.dsum(when(col("rel") === 1L, discCol).otherwise(lit(0.0)))
          .as("dcg"))
      .withColumn("recall_at_5",
        col("hits").cast("double") / lit(NdcgK.toDouble))
      .withColumn("mrr",
        coalesce(lit(1.0) / col("min_rank").cast("double"), lit(0.0)))
      .withColumn("idcg", idcgCol)
      .withColumn("ndcg_at_5", when(col("hits") > 0L,
        col("dcg") / col("idcg")).otherwise(lit(0.0)))
      .select(col("qid"), col("hits"), col("recall_at_5"), col("mrr"),
        col("dcg"), col("ndcg_at_5"))
      .orderBy("qid")
  }

  lazy val q195Sql: String = {
    val discCase = (1 to NdcgK)
      .map(i => s"WHEN rn = $i THEN ${Relational.DLIT(ndcgDisc(i - 1))}")
      .mkString("CASE ", " ", " ELSE 0.0 END")
    val idcgCase = (1 to NdcgK)
      .map(h => s"WHEN hits = $h THEN ${Relational.DLIT(idcgPrefix(h))}")
      .mkString("CASE ", " ", " ELSE 0.0 END")
    s"""WITH brute AS ($qKnnBruteSql),
       |ivf AS ($qKnnIvfSql),
       |truth AS (SELECT qid, cid, 1 AS rel FROM brute),
       |j AS (SELECT i.qid, i.rn, t.rel FROM ivf i
       |  LEFT JOIN truth t ON i.qid = t.qid AND i.cid = t.cid),
       |m AS (SELECT qid,
       |  CAST(SUM(COALESCE(rel, 0)) AS BIGINT) AS hits,
       |  MIN(CASE WHEN rel = 1 THEN rn END) AS min_rank,
       |  CAST(SUM(CAST(CASE WHEN rel = 1 THEN $discCase
       |    ELSE 0.0 END AS DECIMAL(25,6))) AS DOUBLE) AS dcg
       |  FROM j GROUP BY qid)
       |SELECT qid, hits,
       |CAST(hits AS DOUBLE) / $NdcgK AS recall_at_5,
       |COALESCE(1.0 / CAST(min_rank AS DOUBLE), 0.0) AS mrr,
       |dcg,
       |CASE WHEN hits > 0 THEN dcg / ($idcgCase) ELSE 0.0 END AS ndcg_at_5
       |FROM m ORDER BY qid""".stripMargin
  }

  // ----------------------------------------- q215 label-noise audit
  /** kNN label-agreement noise detection (the Confident-Learning-style
    * audit a labeled corpus runs before training): for every vector,
    * the fraction of its 5 nearest neighbors sharing its label; a
    * vector whose neighborhood mostly DISAGREES (< half same-label) is
    * a flagged candidate mislabel. Reported per label: vectors with
    * neighbors, neighbor/agreement mass, flagged count.
    *
    * Spark-first scale shape: neighbors come from the IVF coarse cell
    * (the q39/q186 zero-shuffle per-row fold over the K-seed literal),
    * so the quadratic is CELL-LOCAL — never an all-pairs corpus join;
    * the top-5 window partitions by vec_id inside the cell join's
    * partitioning. Vectors alone in their cell have no neighbors and
    * drop out (production runs probe adjacent cells; the oracle pins
    * the single-probe contract). Agreement ratios divide ONCE at the
    * |labels|-row report — everything upstream is integer. */
  def q215LabelNoise(s: SparkSession, dir: String): DataFrame = {
    val q = new IvfQuantizer(s, dir)
    val n = emb(s, dir).select(col("vec_id"), col("label"),
      col("embedding"), expr(normSpark).as("nrm"))
    val assigned = n.withColumn("cell",
      q.bestCell(col("embedding"), col("nrm")))
    val a = assigned.select(col("cell"), col("vec_id"), col("label"),
      col("embedding").as("e1"), col("nrm").as("n1"))
    val b = assigned.select(col("cell"), col("vec_id").as("cid"),
      col("label").as("clabel"), col("embedding").as("e2"),
      col("nrm").as("n2"))
    val w = Window.partitionBy("vec_id")
      .orderBy(col("cosine").desc, col("cid"))
    a.join(b, "cell").filter(col("vec_id") =!= col("cid"))
      .withColumn("cosine",
        dotC(col("e1"), col("e2")) / (col("n1") * col("n2")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .groupBy("vec_id", "label")
      .agg(count(lit(1)).as("n_nbrs"),
        sum(when(col("clabel") === col("label"), 1L).otherwise(0L))
          .as("n_same"))
      .groupBy("label")
      .agg(count(lit(1)).as("n_vecs"),
        sum("n_nbrs").as("n_nbrs"), sum("n_same").as("n_same"),
        sum(when(col("n_same") * 2 < col("n_nbrs"), 1L).otherwise(0L))
          .as("n_flagged"))
      .withColumn("agreement",
        col("n_same").cast("double") / col("n_nbrs").cast("double"))
      .orderBy("label")
  }

  val q215Sql: String =
    s"""WITH n AS (SELECT vec_id, label, embedding, $normDuck AS nrm
       |  FROM embeddings),
       |seeds AS (SELECT vec_id AS seed_id, embedding AS se, nrm AS sn
       |  FROM n ORDER BY $ivfHashDuck, vec_id LIMIT $IvfSeedCount),
       |scored AS (SELECT n.vec_id, n.label, n.embedding, n.nrm, s.seed_id,
       |  ${dotDuck("n.embedding", "s.se")} / (n.nrm * s.sn) AS scos
       |  FROM n CROSS JOIN seeds s),
       |assigned AS (SELECT vec_id, label, embedding, nrm, seed_id AS cell
       |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
       |     ORDER BY scos DESC, seed_id) AS rn FROM scored) WHERE rn = 1),
       |pairs AS (SELECT a.vec_id, a.label, b.vec_id AS cid,
       |  b.label AS clabel,
       |  ${dotDuck("a.embedding", "b.embedding")} / (a.nrm * b.nrm)
       |    AS cosine
       |  FROM assigned a JOIN assigned b
       |    ON a.cell = b.cell AND a.vec_id <> b.vec_id),
       |top AS (SELECT * FROM (SELECT *, ROW_NUMBER() OVER
       |  (PARTITION BY vec_id ORDER BY cosine DESC, cid) AS rn
       |  FROM pairs) WHERE rn <= 5),
       |pv AS (SELECT vec_id, label, COUNT(*) AS n_nbrs,
       |  CAST(SUM(CASE WHEN clabel = label THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_same
       |  FROM top GROUP BY 1, 2)
       |SELECT label, COUNT(*) AS n_vecs,
       |  CAST(SUM(n_nbrs) AS BIGINT) AS n_nbrs,
       |  CAST(SUM(n_same) AS BIGINT) AS n_same,
       |  CAST(SUM(CASE WHEN n_same * 2 < n_nbrs THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_flagged,
       |  CAST(SUM(n_same) AS DOUBLE) / CAST(SUM(n_nbrs) AS DOUBLE)
       |    AS agreement
       |FROM pv GROUP BY 1 ORDER BY 1""".stripMargin

  // ------------------------------------ q216 truncated-dim recall
  /** Matryoshka-style dimension-truncation audit: recall@5 of a
    * 16-dim PREFIX index against the full-dim brute-force truth for
    * the fixed q30 query set. The go/no-go number before switching a
    * billion-vector ANN tier to prefix dimensions (4× cheaper dot
    * products and memory) — MRL embeddings keep recall high, generic
    * embeddings often don't; this measures, not guesses.
    *
    * Scale: both sides are the q30 shape — a broadcast fixed query
    * set over one corpus scan, TakeOrderedAndProject-bounded — so the
    * audit costs two linear passes; the truncated pass reads the same
    * scan with a sliced vector (the native vec_dot kernel runs on the
    * 16-element slice). */
  val TruncDims = 16

  def q216TruncRecall(s: SparkSession, dir: String): DataFrame = {
    val full = qKnnBrute(s, dir).select(col("qid"), col("cid"))
    val t = emb(s, dir).select(col("vec_id"),
      expr(s"slice(embedding, 1, $TruncDims)").as("te"))
      .withColumn("tn", expr("sqrt(vec_dot(te, te))"))
    val qs = t.filter(col("vec_id") < 8).select(col("vec_id").as("qid"),
      col("te").as("qe"), col("tn").as("qn"))
    val w = Window.partitionBy("qid").orderBy(col("cosine").desc, col("cid"))
    val trunc = t.select(col("vec_id").as("cid"), col("te").as("ce"),
      col("tn").as("cn"))
      .crossJoin(broadcast(qs))
      .filter(col("qid") =!= col("cid"))
      .withColumn("cosine", dotC(col("qe"), col("ce")) /
        (col("qn") * col("cn")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select(col("qid"), col("cid"), lit(1L).as("hit"))
    full.join(trunc, Seq("qid", "cid"), "left")
      .groupBy("qid")
      .agg(sum(coalesce(col("hit"), lit(0L))).as("hits"))
      .withColumn("recall_at_5", col("hits").cast("double") / 5.0)
      .orderBy("qid")
  }

  val q216Sql: String = {
    val truncDot = dotDuck("q.te", "c.te")
    s"""WITH full_knn AS ($qKnnBruteSql),
       |t AS (SELECT vec_id, embedding[1:$TruncDims] AS te FROM embeddings),
       |tn AS (SELECT vec_id, te,
       |  sqrt(list_sum(list_transform(te,
       |    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm FROM t),
       |tp AS (SELECT q.vec_id AS qid, c.vec_id AS cid,
       |  $truncDot / (q.nrm * c.nrm) AS cosine
       |  FROM tn q, tn c WHERE q.vec_id < 8 AND q.vec_id <> c.vec_id),
       |trunc AS (SELECT qid, cid, 1 AS hit FROM
       |  (SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
       |     ORDER BY cosine DESC, cid) AS rn FROM tp) WHERE rn <= 5)
       |SELECT f.qid, CAST(SUM(COALESCE(t.hit, 0)) AS BIGINT) AS hits,
       |  CAST(SUM(COALESCE(t.hit, 0)) AS DOUBLE) / 5.0 AS recall_at_5
       |FROM full_knn f LEFT JOIN trunc t
       |  ON f.qid = t.qid AND f.cid = t.cid
       |GROUP BY 1 ORDER BY 1""".stripMargin
  }

  // ------------------------------------ q219 index staleness audit
  /** ANN index-staleness audit — the monitor that decides WHEN to
    * rebuild a coarse quantizer as the corpus grows: build the IVF
    * cells from the OLD slice only (`vec_id % 5 < 4`, the standing
    * 80/20 convention), assign the WHOLE corpus, and report per cell
    * the old/new membership, the growth ratio, and the exact squared
    * centroid drift between the old members' centroid and the
    * all-members centroid. A cell whose centroid moved or whose
    * population ballooned is routing probes badly; past a threshold
    * the index re-trains (this query is that threshold's input).
    *
    * Exactness: the q213 no-division trick, twice — with per-(cell,
    * dim) micro-unit sums S_old/S_all and counts n_old/n_all, the
    * drift numerator per dim is `n_all·S_old − n_old·S_all` (integer),
    * squared into DECIMAL(38,0)/HUGEINT; the only divisions are the
    * final reported doubles. Cells are old-seeded, so n_old ≥ 1 by
    * construction (each seed assigns to itself at cosine 1).
    *
    * Scale: seed selection collects K rows (constant in N, the IVF
    * contract); assignment is the zero-shuffle per-row fold; the
    * posexplode aggregate is map-side combined to |cells|·|dims|
    * rows and everything after runs on that bounded relation. */
  def q219IndexStaleness(s: SparkSession, dir: String): DataFrame = {
    val isOld = col("vec_id") % 5 < 4
    val q = new IvfQuantizer(s, dir, isOld)
    val ex = q.assigned
      .withColumn("is_old", isOld)
      .select(col("cell"), col("is_old"), posexplode(col("embedding")))
      .select(col("cell"), col("is_old"), col("pos").as("p"),
        expr("CAST(CAST(CAST(col AS DOUBLE) AS DECIMAL(25,6)) * 1000000 " +
          "AS BIGINT)").as("qv"))
    ex.groupBy("cell", "p")
      .agg(sum(when(col("is_old"), col("qv")).otherwise(0L)).as("so"),
        sum(col("qv")).as("sa"),
        sum(when(col("is_old"), 1L).otherwise(0L)).as("no"),
        count(lit(1)).as("na"))
      .withColumn("dn", expr("CAST(na * so - no * sa AS DECIMAL(38,0))"))
      .groupBy("cell")
      .agg(max("no").as("n_old"), max("na").as("n_all"),
        sum(expr("CAST(dn * dn AS DECIMAL(38,0))")).as("drift_num"))
      .withColumn("n_new", col("n_all") - col("n_old"))
      .withColumn("growth",
        col("n_new").cast("double") / col("n_old").cast("double"))
      .withColumn("drift_uu2",
        col("drift_num").cast("double") /
          ((col("n_old").cast("double") * col("n_all").cast("double")) *
            (col("n_old").cast("double") * col("n_all").cast("double"))))
      .select("cell", "n_old", "n_new", "growth", "drift_uu2")
      .orderBy("cell")
  }

  val q219Sql: String =
    s"""WITH n AS (SELECT vec_id, embedding, $normDuck AS nrm
       |  FROM embeddings),
       |seeds AS (SELECT vec_id AS seed_id, embedding AS se, nrm AS sn
       |  FROM n WHERE vec_id % 5 < 4
       |  ORDER BY $ivfHashDuck, vec_id LIMIT $IvfSeedCount),
       |scored AS (SELECT n.vec_id, n.embedding, n.nrm, s.seed_id,
       |  ${dotDuck("n.embedding", "s.se")} / (n.nrm * s.sn) AS scos
       |  FROM n CROSS JOIN seeds s),
       |assigned AS (SELECT vec_id, embedding, seed_id AS cell FROM
       |  (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
       |     ORDER BY scos DESC, seed_id) AS rn FROM scored) WHERE rn = 1),
       |ex AS (SELECT cell, vec_id % 5 < 4 AS is_old, s.p AS p, s.qv AS qv
       |  FROM (SELECT cell, vec_id,
       |    unnest(list_transform(range(1, len(embedding) + 1),
       |      i -> {'p': i - 1,
       |            'qv': CAST(CAST(CAST(embedding[i] AS DOUBLE)
       |                  AS DECIMAL(25,6)) * 1000000 AS BIGINT)})) AS s
       |    FROM assigned)),
       |st AS (SELECT cell, p,
       |  CAST(SUM(CASE WHEN is_old THEN qv ELSE 0 END) AS BIGINT) AS so,
       |  CAST(SUM(qv) AS BIGINT) AS sa,
       |  CAST(SUM(CASE WHEN is_old THEN 1 ELSE 0 END) AS BIGINT) AS no,
       |  COUNT(*) AS na
       |  FROM ex GROUP BY 1, 2),
       |dd AS (SELECT cell, no, na,
       |  CAST(na * so - no * sa AS HUGEINT) AS dn FROM st),
       |ag AS (SELECT cell, MAX(no) AS n_old, MAX(na) AS n_all,
       |  SUM(dn * dn) AS drift_num FROM dd GROUP BY 1)
       |SELECT cell, n_old, n_all - n_old AS n_new,
       |  CAST(n_all - n_old AS DOUBLE) / CAST(n_old AS DOUBLE) AS growth,
       |  CAST(drift_num AS DOUBLE) /
       |    ((CAST(n_old AS DOUBLE) * CAST(n_all AS DOUBLE)) *
       |     (CAST(n_old AS DOUBLE) * CAST(n_all AS DOUBLE))) AS drift_uu2
       |FROM ag ORDER BY cell""".stripMargin

  // --------------------------------------- q217 MMR diversity rerank
  /** Maximal Marginal Relevance re-ranking (Carbonell & Goldstein
    * 1998) — the diversity-aware top-k every retrieval stack applies
    * after ANN: from each query's top-[[MmrPoolK]] relevance pool,
    * greedily select [[MmrSelectK]] results maximizing
    * `0.7·rel − 0.3·max_sim_to_already_selected`, so near-duplicate
    * hits can't crowd the result page. The greedy loop unrolls into
    * [[MmrSelectK]] deterministic argmax stages (ties to lowest cid),
    * identical in the Spark plan and the SQL oracle.
    *
    * Scale: the pool is K·|queries| rows by construction (the q30
    * TakeOrderedAndProject bound), materialized ONCE via
    * localCheckpoint so the unrolled stages and the K²-bounded
    * pairwise-sim relation reuse it instead of re-scanning the
    * corpus; every per-stage join keys on (qid, cid) over those
    * bounded relations. The corpus contributes exactly one broadcast-
    * query-set scan. Each stage's selected set ALSO localCheckpoints:
    * a greedy loop otherwise compounds lineage (stage k's plan embeds
    * every earlier stage), and Catalyst re-optimizes that quadratically
    * growing DAG per stage — measured 4.7 s of pure driver planning on
    * a 160-row pool before the cap, ~1 s after, invariant in corpus
    * size either way. */
  val MmrPoolK = 20
  val MmrSelectK = 5

  def q217MmrRerank(s: SparkSession, dir: String): DataFrame = {
    val n = emb(s, dir).select(col("vec_id"), col("embedding"),
      expr(normSpark).as("nrm"))
    val qs = n.filter(col("vec_id") < 8).select(col("vec_id").as("qid"),
      col("embedding").as("qe"), col("nrm").as("qn"))
    val wPool = Window.partitionBy("qid")
      .orderBy(col("rel").desc, col("cid"))
    val pool = n
      .select(col("vec_id").as("cid"), col("embedding").as("ce"),
        col("nrm").as("cn"))
      .crossJoin(broadcast(qs))
      .filter(col("qid") =!= col("cid"))
      .withColumn("rel", dotC(col("qe"), col("ce")) /
        (col("qn") * col("cn")))
      .withColumn("rn", row_number().over(wPool))
      .filter(col("rn") <= MmrPoolK)
      .select("qid", "cid", "ce", "cn", "rel")
      .coalesce(1)
      .localCheckpoint()
    val sims = pool
      .select(col("qid"), col("cid").as("ca"), col("ce").as("ea"),
        col("cn").as("na"))
      .join(pool.select(col("qid"), col("cid").as("cb"),
        col("ce").as("eb"), col("cn").as("nb")), "qid")
      .filter(col("ca") =!= col("cb"))
      .withColumn("sim", dotC(col("ea"), col("eb")) /
        (col("na") * col("nb")))
      .select(col("qid").as("sqid"), col("ca"), col("cb"), col("sim"))
    var selected = pool
      .withColumn("rn", row_number().over(wPool))
      .filter(col("rn") === 1)
      .select(col("qid"), col("cid"), col("rel"), lit(1).as("k"))
      .coalesce(1).localCheckpoint()
    for (k <- 2 to MmrSelectK) {
      val selR = selected.select(col("qid").as("pqid"),
        col("cid").as("scid"))
      val rem = pool.join(
        selR.select(col("pqid").as("qid"), col("scid").as("cid")),
        Seq("qid", "cid"), "left_anti")
      val wk = Window.partitionBy("qid").orderBy(col("mmr").desc, col("cid"))
      val next = rem.select(col("qid"), col("cid"), col("rel"))
        .join(sims, col("qid") === col("sqid") && col("cid") === col("ca"))
        .join(selR, col("qid") === col("pqid") && col("cb") === col("scid"))
        .groupBy(col("qid"), col("cid"), col("rel"))
        .agg(max(col("sim")).as("mx"))
        .withColumn("mmr", lit(0.7) * col("rel") - lit(0.3) * col("mx"))
        .withColumn("rn", row_number().over(wk))
        .filter(col("rn") === 1)
        .select(col("qid"), col("cid"), col("rel"), lit(k).as("k"))
      selected = selected.unionByName(next).coalesce(1).localCheckpoint()
    }
    selected.orderBy("qid", "k")
  }

  val q217Sql: String = {
    val steps = (2 to MmrSelectK).map { k =>
      val prevSel = (1 until k).map(i => s"SELECT qid, cid FROM s$i")
        .mkString(" UNION ALL ")
      s"""sel$k AS ($prevSel),
         |ms$k AS (SELECT p.qid, p.cid, p.rel, MAX(si.sim) AS mx
         |  FROM pool p
         |  LEFT JOIN sel$k x ON x.qid = p.qid AND x.cid = p.cid
         |  JOIN sims si ON si.qid = p.qid AND si.ca = p.cid
         |  JOIN sel$k s ON s.qid = si.qid AND s.cid = si.cb
         |  WHERE x.cid IS NULL
         |  GROUP BY 1, 2, 3),
         |s$k AS (SELECT qid, cid, rel, $k AS k FROM
         |  (SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
         |     ORDER BY 0.7 * rel - 0.3 * mx DESC, cid) AS rn FROM ms$k)
         |  WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    val unions = (1 to MmrSelectK).map(i => s"SELECT * FROM s$i")
      .mkString(" UNION ALL ")
    s"""WITH n AS (SELECT vec_id, embedding, $normDuck AS nrm
       |  FROM embeddings),
       |pr AS (SELECT q.vec_id AS qid, c.vec_id AS cid, c.embedding AS ce,
       |  c.nrm AS cn,
       |  ${dotDuck("q.embedding", "c.embedding")} / (q.nrm * c.nrm) AS rel
       |  FROM n q, n c WHERE q.vec_id < 8 AND q.vec_id <> c.vec_id),
       |pool AS (SELECT qid, cid, ce, cn, rel FROM
       |  (SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
       |     ORDER BY rel DESC, cid) AS rn FROM pr) WHERE rn <= $MmrPoolK),
       |sims AS (SELECT a.qid, a.cid AS ca, b.cid AS cb,
       |  ${dotDuck("a.ce", "b.ce")} / (a.cn * b.cn) AS sim
       |  FROM pool a JOIN pool b ON a.qid = b.qid AND a.cid <> b.cid),
       |s1 AS (SELECT qid, cid, rel, 1 AS k FROM
       |  (SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
       |     ORDER BY rel DESC, cid) AS rn FROM pool) WHERE rn = 1),
       |$steps
       |SELECT qid, cid, rel, k FROM ($unions) ORDER BY qid, k""".stripMargin
  }

  // --------------------------------------- q213 prototype pruning
  /** Prototype-based data pruning (Sorscher et al. 2022, "Beyond
    * neural scaling laws"): within each label class, rank vectors by
    * distance to the class centroid and prune the closest 25% — the
    * most PROTOTYPICAL examples, which are the most redundant when
    * data is abundant (keep-hard beats keep-easy at scale). The
    * embedding-space complement of q186's SemDeDup (which prunes
    * near-DUPLICATES; this prunes near-CENTROID mass).
    *
    * Exactness: embeddings quantize once to 6-dp micro-units (the
    * q188 idiom); with per-(label,dim) sums S and class size n, the
    * comparison key is `n²·‖v−c‖² = Σ_d (n·qv_d − S_d)²` — centroid
    * division never happens, every term is integer, squares
    * accumulate in DECIMAL(38,0)/HUGEINT, and the within-class rank
    * (tie-broken by vec_id) is bit-identical across engines.
    *
    * Scale: the stats relation is |labels|·|dims| rows — broadcast
    * back onto a second scan (the q188/q110 stats-broadcast shape);
    * the corpus shuffles once on vec_id to assemble distances. The
    * within-label rank is the one ordered pass; at 100 TB it swaps
    * for a distance-HISTOGRAM threshold (d²n² is quantized, so a
    * bounded histogram + prefix sum finds the k-th smallest exactly —
    * the q198 shape) with only the boundary bucket re-ranked. */
  def q213PrototypePrune(s: SparkSession, dir: String): DataFrame = {
    val ex = emb(s, dir)
      .select(col("vec_id"), col("label"), posexplode(col("embedding")))
      .select(col("vec_id"), col("label"), col("pos").as("p"),
        expr("CAST(CAST(CAST(col AS DOUBLE) AS DECIMAL(25,6)) * 1000000 " +
          "AS BIGINT)").as("qv"))
    val stats = ex.groupBy("label", "p")
      .agg(sum("qv").as("sd"), count(lit(1)).as("n"))
    val d2 = ex.join(broadcast(stats), Seq("label", "p"))
      .withColumn("diff", expr("CAST(n * qv - sd AS DECIMAL(19,0))"))
      .groupBy("vec_id", "label")
      .agg(sum(expr("CAST(diff * diff AS DECIMAL(38,0))")).as("d2n2"),
        max("n").as("n"))
    val w = Window.partitionBy("label").orderBy("d2n2", "vec_id")
    d2.withColumn("rk", row_number().over(w))
      .withColumn("pruned", col("rk") <= expr("n div 4"))
      .groupBy("label")
      .agg(count(lit(1)).as("n_vecs"),
        sum(when(col("pruned"), 1L).otherwise(0L)).as("n_pruned"),
        sum(when(!col("pruned"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(!col("pruned"), col("vec_id")).otherwise(0L))
          .as("kept_id_sum"),
        max(when(col("pruned"), col("d2n2"))).cast("double")
          .as("max_pruned_d2n2"))
      .orderBy("label")
  }

  val q213Sql: String =
    """WITH ex AS (SELECT vec_id, label, s.p AS p, s.qv AS qv FROM (
      |  SELECT vec_id, label,
      |    unnest(list_transform(range(1, len(embedding) + 1),
      |      i -> {'p': i - 1,
      |            'qv': CAST(CAST(CAST(embedding[i] AS DOUBLE)
      |                  AS DECIMAL(25,6)) * 1000000 AS BIGINT)})) AS s
      |  FROM embeddings)),
      |st AS (SELECT label, p, CAST(SUM(qv) AS BIGINT) AS sd,
      |  COUNT(*) AS n FROM ex GROUP BY 1, 2),
      |d2 AS (SELECT vec_id, e.label,
      |  SUM(CAST(n * qv - sd AS HUGEINT) * CAST(n * qv - sd AS HUGEINT))
      |    AS d2n2,
      |  MAX(n) AS n
      |  FROM ex e JOIN st USING (label, p) GROUP BY 1, 2),
      |rk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY label
      |    ORDER BY d2n2, vec_id) AS rk FROM d2),
      |fl AS (SELECT *, rk <= n // 4 AS pruned FROM rk)
      |SELECT label, COUNT(*) AS n_vecs,
      |  CAST(SUM(CASE WHEN pruned THEN 1 ELSE 0 END) AS BIGINT) AS n_pruned,
      |  CAST(SUM(CASE WHEN NOT pruned THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_kept,
      |  CAST(SUM(CASE WHEN NOT pruned THEN vec_id ELSE 0 END) AS BIGINT)
      |    AS kept_id_sum,
      |  CAST(MAX(CASE WHEN pruned THEN d2n2 END) AS DOUBLE)
      |    AS max_pruned_d2n2
      |FROM fl GROUP BY 1 ORDER BY 1""".stripMargin

  // ------------------------------------------- q224 reciprocal-rank fusion
  /** Reciprocal-rank fusion (Cormack et al. 2009) of two retrievers —
    * the standard hybrid-retrieval combiner: each candidate scores
    * `Σ 1/(60+rank)` over the lists that retrieved it, which rewards
    * consensus without comparing incommensurable raw scores. Here the
    * fused retrievers are the cosine ranking and the euclidean (L2)
    * ranking over the q30 query set — genuinely different orderings
    * whenever candidate norms differ (cosine is scale-blind, L2 is
    * not), the same way BM25 and dense rankings differ. Per query:
    * top-[[RrfDepth]] from each retriever fuse into a top-10 list
    * with both source ranks exposed.
    *
    * Determinism: cosine and `l2sq = |q|² + |c|² − 2·q·c` derive from
    * the one dot-product kernel evaluated identically in both engines
    * (bit-identical per q30's contract); ranks tiebreak on cid;
    * `1/(60+rank)` is an exact small-integer division and the fused
    * score adds two such doubles — no accumulation-order ambiguity.
    *
    * Scale: the candidate relation is the q30 broadcast shape (fixed
    * query set × corpus scan, O(dim) kernel per pair); both rank
    * windows share the one qid partitioning, so the corpus is sorted
    * per query once per retriever — the declared brute baseline.
    * RRF itself touches only 2·Depth rows per query; swapping in the
    * IVF top-k (q32) bounds the scan too. */
  val RrfDepth = 20
  val RrfK = 60

  def q224RrfFusion(s: SparkSession, dir: String): DataFrame = {
    val n = emb(s, dir).select(col("vec_id"), col("embedding"),
      expr(normSpark).as("nrm"))
    val q = n.filter(col("vec_id") < 8).select(
      col("vec_id").as("qid"), col("embedding").as("qe"), col("nrm").as("qn"))
    val c = n.select(
      col("vec_id").as("cid"), col("embedding").as("ce"), col("nrm").as("cn"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("qid") =!= col("cid"))
      .withColumn("dp", expr(dotSpark("qe", "ce")))
      .withColumn("cosine", col("dp") / (col("qn") * col("cn")))
      .withColumn("l2sq",
        col("qn") * col("qn") + col("cn") * col("cn") - lit(2.0) * col("dp"))
    val wc = Window.partitionBy("qid").orderBy(col("cosine").desc, col("cid"))
    val wl = Window.partitionBy("qid").orderBy(col("l2sq").asc, col("cid"))
    val fused = scored
      .withColumn("rank_cos", row_number().over(wc))
      .withColumn("rank_l2", row_number().over(wl))
      .filter(col("rank_cos") <= RrfDepth || col("rank_l2") <= RrfDepth)
      .withColumn("rrf_score",
        when(col("rank_cos") <= RrfDepth,
          lit(1.0) / (lit(RrfK) + col("rank_cos")).cast("double"))
          .otherwise(lit(0.0)) +
        when(col("rank_l2") <= RrfDepth,
          lit(1.0) / (lit(RrfK) + col("rank_l2")).cast("double"))
          .otherwise(lit(0.0)))
    val wf = Window.partitionBy("qid")
      .orderBy(col("rrf_score").desc, col("cid"))
    fused.withColumn("rn", row_number().over(wf))
      .filter(col("rn") <= 10)
      .select(col("qid"), col("cid"), col("rn"), col("rank_cos"),
        col("rank_l2"), col("rrf_score"))
      .orderBy("qid", "rn")
  }

  val q224Sql: String =
    s"""WITH n AS (SELECT vec_id, embedding, $normDuck AS nrm FROM embeddings),
       |p AS (SELECT q.vec_id AS qid, c.vec_id AS cid, q.nrm AS qn,
       |  c.nrm AS cn, ${dotDuck("q.embedding", "c.embedding")} AS dp
       |  FROM n q, n c WHERE q.vec_id < 8 AND q.vec_id <> c.vec_id),
       |sc AS (SELECT qid, cid, dp / (qn * cn) AS cosine,
       |  qn * qn + cn * cn - CAST(2 AS DOUBLE) * dp AS l2sq FROM p),
       |r AS (SELECT qid, cid,
       |  ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, cid)
       |    AS rank_cos,
       |  ROW_NUMBER() OVER (PARTITION BY qid ORDER BY l2sq, cid) AS rank_l2
       |  FROM sc),
       |f AS (SELECT qid, cid, rank_cos, rank_l2,
       |  (CASE WHEN rank_cos <= $RrfDepth
       |     THEN CAST(1 AS DOUBLE) / CAST($RrfK + rank_cos AS DOUBLE)
       |     ELSE CAST(0 AS DOUBLE) END) +
       |  (CASE WHEN rank_l2 <= $RrfDepth
       |     THEN CAST(1 AS DOUBLE) / CAST($RrfK + rank_l2 AS DOUBLE)
       |     ELSE CAST(0 AS DOUBLE) END) AS rrf_score
       |  FROM r WHERE rank_cos <= $RrfDepth OR rank_l2 <= $RrfDepth)
       |SELECT qid, cid, rn, rank_cos, rank_l2, rrf_score FROM
       |(SELECT *, ROW_NUMBER() OVER
       |  (PARTITION BY qid ORDER BY rrf_score DESC, cid) AS rn FROM f)
       |WHERE rn <= 10 ORDER BY qid, rn""".stripMargin

  // ------------------------------- q258 Kendall tau rank agreement
  /** Kendall rank-correlation between the two retrievers q224 fuses
    * (cosine vs L2 rankings) over each query's fused top-10 — the
    * "do my retrievers actually disagree enough for fusion to help"
    * audit (RRF only beats its best input when the inputs rank
    * DIFFERENTLY; tau ≈ 1 means the fusion is paying two retrievals
    * for one ranking). Both rankings are strict total orders
    * (row_number with id tie-break), so tau-a = tau-b:
    * tau = (C − D)/(C + D) over the K(K−1)/2 within-query pairs.
    *
    * Determinism: concordance is a sign test on integer rank
    * differences; per-query tau is one IEEE division of integers;
    * the corpus-wide mean quantizes via the decimal-sum contract.
    *
    * Scale: the pair relation is query-local over the FIXED fused
    * top-K (≤ 45 pairs per query) — a broadcast-sized self-join that
    * never touches the corpus; the expensive part (the rankings) is
    * the q224 computation itself, already cell-bounded. */
  def q258KendallTau(s: SparkSession, dir: String): DataFrame = {
    val f = q224RrfFusion(s, dir)
      .select(col("qid"), col("cid"), col("rank_cos"), col("rank_l2"))
    val a = f.select(col("qid"), col("cid").as("c1"),
      col("rank_cos").as("rc1"), col("rank_l2").as("rl1"))
    val b = f.select(col("qid"), col("cid").as("c2"),
      col("rank_cos").as("rc2"), col("rank_l2").as("rl2"))
    val pairs = a.join(b, Seq("qid")).filter(col("c1") < col("c2"))
      .withColumn("conc", when(
        (col("rc1") - col("rc2")) * (col("rl1") - col("rl2")) > 0, 1L)
        .otherwise(0L))
    val perQ = pairs.groupBy("qid")
      .agg(sum("conc").as("concordant"),
        (count(lit(1)) - sum("conc")).as("discordant"))
      .withColumn("n_pairs", col("concordant") + col("discordant"))
      .withColumn("tau",
        (col("concordant") - col("discordant")).cast("double") /
          (col("concordant") + col("discordant")).cast("double"))
      // tau is a RATIONAL of integer counts, so its 6-dp quantization
      // inside a decimal sum can hit real ties (1/128 = 0.0078125) —
      // quantize the exact rational in integer micro-units instead
      // (the q268 treatment); tau_q6 is an exact ≤6-dp double, so
      // dmean's per-row decimal cast below is tie-free by value.
      .withColumn("tau_q6", {
        val num = col("concordant") - col("discordant")
        val den = col("concordant") + col("discordant")
        val units = org.apache.spark.sql.graftbridge.ColumnBridge.div(
          abs(num) * lit(2000000L) + den, den * lit(2L))
        when(num < 0, -units).otherwise(units).cast("double") / lit(1e6)
      })
    val ov = perQ.agg(
      Relational.dmean(col("tau_q6"), 6).as("mean_tau"))
    perQ.crossJoin(broadcast(ov))
      .select("qid", "n_pairs", "concordant", "discordant", "tau", "mean_tau")
      .orderBy("qid")
  }

  val q258Sql: String =
    s"""WITH f AS (SELECT qid, cid, rank_cos, rank_l2 FROM (
       |$q224Sql
       |)),
       |pr AS (SELECT a.qid,
       |  CASE WHEN (a.rank_cos - b.rank_cos) * (a.rank_l2 - b.rank_l2) > 0
       |    THEN 1 ELSE 0 END AS conc
       |  FROM f a JOIN f b ON a.qid = b.qid AND a.cid < b.cid),
       |pq AS (SELECT qid, CAST(SUM(conc) AS BIGINT) AS concordant,
       |  CAST(COUNT(*) - SUM(conc) AS BIGINT) AS discordant
       |  FROM pr GROUP BY 1),
       |tq AS (SELECT qid, concordant, discordant,
       |  concordant + discordant AS n_pairs,
       |  CAST(concordant - discordant AS DOUBLE) /
       |    CAST(concordant + discordant AS DOUBLE) AS tau,
       |  CAST(CASE WHEN concordant < discordant THEN
       |    -((2000000*(discordant - concordant) + concordant + discordant)
       |      // (2*(concordant + discordant)))
       |  ELSE
       |    ((2000000*(concordant - discordant) + concordant + discordant)
       |      // (2*(concordant + discordant)))
       |  END AS DOUBLE) / 1e6 AS tau_q6 FROM pq),
       |ov AS (SELECT ${Relational.DMEAN("tau_q6", 6)}
       |  AS mean_tau FROM tq)
       |SELECT qid, n_pairs, concordant, discordant, tau, ov.mean_tau
       |FROM tq CROSS JOIN ov ORDER BY qid""".stripMargin

  // ------------------------------- q271 triplet-margin audit
  /** Contrastive-geometry audit over a fixed anchor panel (vec_id <
    * [[TripletAnchors]]): per anchor, the hardest positive margin —
    * cos(nearest same-label) − cos(nearest other-label) — grouped by
    * anchor label: mean/min margin and the violation rate (margin ≤ 0
    * = some negative sits closer than every positive). The
    * embedding-health scalar read BEFORE q190's negatives are fed to
    * a trainer: a label whose margin is already negative needs
    * cleaning (q215's label-noise audit says which points; this says
    * which CLASSES and how badly).
    *
    * Determinism: cosines are the shared norm/dot kernels over
    * decimal-quantized folds; per-anchor max-cosine argmaxes are
    * plain max over identical doubles; margins quantize to 6 dp
    * before the per-label decimal mean.
    *
    * Scale: the q30 shape — broadcast the fixed panel across one
    * corpus scan, one (anchor)-keyed map-side-combined aggregate,
    * then a |labels|-row rollup. Linear in N for a fixed panel. */
  val TripletAnchors = 64

  def q271TripletMargin(s: SparkSession, dir: String): DataFrame = {
    val n = emb(s, dir).select(col("vec_id"), col("label"),
      col("embedding"), expr(normSpark).as("nrm"))
    val q = n.filter(col("vec_id") < TripletAnchors).select(
      col("vec_id").as("qid"), col("label").as("qlabel"),
      col("embedding").as("qe"), col("nrm").as("qn"))
    val c = n.select(col("vec_id").as("cid"), col("label").as("clabel"),
      col("embedding").as("ce"), col("nrm").as("cn"))
    val margins = c.crossJoin(broadcast(q))
      .filter(col("cid") =!= col("qid"))
      .withColumn("cosine",
        expr(dotSpark("qe", "ce")) / (col("qn") * col("cn")))
      .groupBy(col("qid"), col("qlabel"))
      .agg(max(when(col("clabel") === col("qlabel"), col("cosine")))
          .as("pos_cos"),
        max(when(col("clabel") =!= col("qlabel"), col("cosine")))
          .as("neg_cos"))
      .withColumn("margin", round(col("pos_cos") - col("neg_cos"), 6))
    margins.groupBy(col("qlabel").as("label"))
      .agg(count(lit(1)).as("n_anchors"),
        Relational.dmean(col("margin"), 6).as("mean_margin"),
        min(col("margin")).as("min_margin"),
        sum(when(col("margin") <= 0.0, 1L).otherwise(0L))
          .as("n_violations"))
      .withColumn("violation_rate",
        col("n_violations").cast("double") / col("n_anchors").cast("double"))
      .orderBy("label")
  }

  val q271Sql: String =
    s"""WITH n AS (SELECT vec_id, label, embedding, $normDuck AS nrm
       |  FROM embeddings),
       |p AS (SELECT q.vec_id AS qid, q.label AS qlabel, c.label AS clabel,
       |  ${dotDuck("q.embedding", "c.embedding")} / (q.nrm * c.nrm)
       |    AS cosine
       |  FROM n q, n c
       |  WHERE q.vec_id < $TripletAnchors AND c.vec_id <> q.vec_id),
       |mg AS (SELECT qid, qlabel,
       |  round(MAX(CASE WHEN clabel = qlabel THEN cosine END) -
       |        MAX(CASE WHEN clabel <> qlabel THEN cosine END), 6)
       |    AS margin
       |  FROM p GROUP BY 1, 2)
       |SELECT qlabel AS label, CAST(COUNT(*) AS BIGINT) AS n_anchors,
       |  ${Relational.DMEAN("margin", 6)} AS mean_margin,
       |  MIN(margin) AS min_margin,
       |  CAST(SUM(CASE WHEN margin <= 0 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_violations,
       |  CAST(SUM(CASE WHEN margin <= 0 THEN 1 ELSE 0 END) AS DOUBLE) /
       |    CAST(COUNT(*) AS DOUBLE) AS violation_rate
       |FROM mg GROUP BY 1 ORDER BY label""".stripMargin

  // --------------------------------------- q229 semantic split leakage
  /** Embedding-space split-contamination audit — q201's n-gram leakage
    * check lifted to SEMANTIC space: after a naive hash split of the
    * vector corpus, how many test vectors have a train near-duplicate
    * (cosine > [[q229Tau]])? Paraphrases and re-encodings leak past
    * any text-level decontamination; this is the number an eval split
    * must disclose before its scores are believed, and the motivation
    * for group-aware splitting (q107) in embedding space.
    *
    * Scale: the pair search is the q39 shape — IVF-cell-blocked
    * (coarse-quantizer partition), never all-pairs; the split tag is a
    * scan-local expression, and only train×test pairs inside a cell
    * are scored with the O(dim) native kernel. Cross-CELL leaks are
    * invisible by design (the same recall trade q39/q186 declare);
    * the output discloses the blocking so the number is read as a
    * lower bound.
    *
    * Determinism: split by `(vec_id * 1000003) % 10 < 8` (the q201
    * convention), cosine from the shared kernel, counts integer. */
  val q229Tau = 0.5

  def q229SemanticLeak(s: SparkSession, dir: String): DataFrame = {
    val tagged = new IvfQuantizer(s, dir).assigned
      .withColumn("is_train", expr("(vec_id * 1000003) % 10 < 8"))
    val tr = tagged.filter(col("is_train")).select(col("cell"),
      col("vec_id").as("d1"), col("embedding").as("e1"), col("nrm").as("n1"))
    val te = tagged.filter(!col("is_train")).select(col("cell"),
      col("vec_id").as("d2"), col("embedding").as("e2"), col("nrm").as("n2"))
    val hits = tr.join(te, "cell")
      .withColumn("cosine", dotC(col("e1"), col("e2")) / (col("n1") * col("n2")))
      .filter(col("cosine") > q229Tau)
      .agg(count(lit(1)).as("n_cross_pairs"),
        countDistinct(col("d2")).as("n_leaky_test"))
    val totals = tagged.agg(
      sum(when(col("is_train"), 1L).otherwise(0L)).as("n_train"),
      sum(when(!col("is_train"), 1L).otherwise(0L)).as("n_test"))
    totals.crossJoin(hits)
      .select(col("n_train"), col("n_test"),
        col("n_cross_pairs"), col("n_leaky_test"),
        (col("n_leaky_test").cast("double") / col("n_test").cast("double"))
          .as("leak_rate"))
  }

  val q229Sql: String =
    s"""WITH n AS (SELECT vec_id, embedding, $normDuck AS nrm FROM embeddings),
       |seeds AS (SELECT vec_id AS seed_id, embedding AS se, nrm AS sn
       |  FROM n ORDER BY $ivfHashDuck, vec_id LIMIT $IvfSeedCount),
       |scored AS (SELECT n.vec_id, n.embedding, n.nrm, s.seed_id,
       |  ${dotDuck("n.embedding", "s.se")} / (n.nrm * s.sn) AS scos
       |  FROM n CROSS JOIN seeds s),
       |assigned AS (SELECT vec_id, embedding, nrm, seed_id AS cell,
       |  (vec_id * 1000003) % 10 < 8 AS is_train FROM
       |  (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
       |     ORDER BY scos DESC, seed_id) AS rn FROM scored) WHERE rn = 1),
       |hits AS (SELECT COUNT(*) AS n_cross_pairs,
       |  COUNT(DISTINCT b.vec_id) AS n_leaky_test
       |  FROM assigned a JOIN assigned b ON a.cell = b.cell
       |    AND a.is_train AND NOT b.is_train
       |  WHERE ${dotDuck("a.embedding", "b.embedding")} / (a.nrm * b.nrm)
       |    > $q229Tau),
       |tot AS (SELECT
       |  CAST(SUM(CASE WHEN is_train THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_train,
       |  CAST(SUM(CASE WHEN is_train THEN 0 ELSE 1 END) AS BIGINT)
       |    AS n_test FROM assigned)
       |SELECT n_train, n_test, n_cross_pairs, n_leaky_test,
       |  CAST(n_leaky_test AS DOUBLE) / CAST(n_test AS DOUBLE) AS leak_rate
       |FROM tot CROSS JOIN hits""".stripMargin

  // ------------------------------------ q235 JL projection distortion
  /** Johnson–Lindenstrauss distortion audit for a ±1 random projection
    * from 64 to [[JlDims]] dimensions — the measurement that decides
    * whether the cheap projection can stand in for full vectors in
    * distance work (dedup thresholds, ANN shortlists, clustering):
    * JL guarantees pairwise squared distances concentrate around 1
    * (mean 1, variance 2/k per pair), and this query MEASURES that
    * concentration on real label-blocked pairs (the q31 blocking —
    * never all-pairs) instead of assuming it: mean/min/max distortion
    * ratio and the fraction within ±25%.
    *
    * Determinism: the sign matrix is fixed at build time (quadratic
    * integer mix over d·k+j — q222's lattice-breaking form) and
    * embedded identically in both dialects; projections fold
    * left-to-right per vector BEFORE the pair join (16 doubles ride
    * the join, the 64-float originals only feed the shared dot
    * kernel); the ratio mean quantizes each term to DECIMAL(25,6)
    * before the exact-decimal sum. Identical-point pairs (zero
    * original distance) are excluded — the ratio is undefined, and
    * both engines exclude them by the same `> 0` predicate.
    *
    * Scale: projection is one scan-local pass (k·dim multiply-adds
    * per row); the quadratic piece is label-cell-local exactly like
    * q31/q39; everything after the pair aggregate is one row. */
  val JlDims = 16

  /** 16×64 ±1 sign rows, deterministic at build time. */
  private lazy val jlSigns: IndexedSeq[IndexedSeq[Int]] =
    (0 until JlDims).map { j =>
      (0 until 64).map { d =>
        val x = (d * JlDims + j).toLong
        if (((x * x * 999983L + x * 2654435761L + 17L) % 2147483647L) % 2 == 0)
          1 else -1
      }
    }

  def q235JlDistortion(s: SparkSession, dir: String): DataFrame = {
    val signsLit = typedLit(jlSigns.map(_.toSeq))
    val proj = emb(s, dir).select(col("vec_id"), col("label"),
        col("embedding"), expr(normSpark).as("nrm"))
      .withColumn("p", transform(signsLit, row =>
        aggregate(
          zip_with(col("embedding"), row,
            (x, sg) => x.cast("double") * sg.cast("double")),
          lit(0.0), (acc, v) => acc + v) / lit(4.0)))
    val a = proj.select(col("label"), col("vec_id").as("d1"),
      col("embedding").as("e1"), col("nrm").as("n1"), col("p").as("p1"))
    val b = proj.select(col("label"), col("vec_id").as("d2"),
      col("embedding").as("e2"), col("nrm").as("n2"), col("p").as("p2"))
    val pairs = a.join(b, "label").filter(col("d1") < col("d2"))
      .withColumn("d2sq",
        col("n1") * col("n1") + col("n2") * col("n2") -
          lit(2.0) * expr(dotSpark("e1", "e2")))
      .filter(col("d2sq") > 0.0)
      .withColumn("p2sq", expr(
        """aggregate(zip_with(p1, p2, (x, y) -> (x - y) * (x - y)),
          |0.0D, (acc, v) -> acc + v)""".stripMargin))
      .withColumn("ratio", col("p2sq") / col("d2sq"))
    pairs.agg(count(lit(1)).as("n_pairs"),
        sum(expr("CAST(CAST(ratio AS DECIMAL(25,6)) AS DECIMAL(25,6))"))
          .as("sr"),
        min("ratio").as("min_ratio"), max("ratio").as("max_ratio"),
        sum(when(expr("abs(ratio - 1.0D) <= 0.25D"), 1L).otherwise(0L))
          .as("n_within"))
      .select(col("n_pairs"),
        expr("""CAST(CAST(CAST(sr AS DOUBLE) / CAST(n_pairs AS DOUBLE)
          |AS DECIMAL(25,6)) AS DOUBLE)""".stripMargin).as("mean_ratio"),
        col("min_ratio"), col("max_ratio"), col("n_within"),
        (col("n_within").cast("double") / col("n_pairs").cast("double"))
          .as("frac_within_25"))
  }

  val q235Sql: String = {
    val signRows = jlSigns.map(_.mkString("[", ", ", "]"))
      .mkString("[", ", ", "]")
    s"""WITH base AS (SELECT vec_id, label, embedding, $normDuck AS nrm
       |  FROM embeddings),
       |proj AS (SELECT vec_id, label, embedding, nrm,
       |  list_transform($signRows,
       |    srow -> list_sum(list_transform(range(1, 65),
       |      d -> CAST(embedding[d] AS DOUBLE) * CAST(srow[d] AS DOUBLE)))
       |      / 4.0) AS p
       |  FROM base),
       |pairs AS (SELECT a.vec_id AS d1, b.vec_id AS d2,
       |  a.nrm * a.nrm + b.nrm * b.nrm -
       |    CAST(2 AS DOUBLE) * ${dotDuck("a.embedding", "b.embedding")}
       |    AS d2sq,
       |  list_sum(list_transform(range(1, ${JlDims + 1}),
       |    j -> (a.p[j] - b.p[j]) * (a.p[j] - b.p[j]))) AS p2sq
       |  FROM proj a JOIN proj b
       |    ON a.label = b.label AND a.vec_id < b.vec_id),
       |rr AS (SELECT d2sq, p2sq, p2sq / d2sq AS ratio FROM pairs
       |  WHERE d2sq > 0.0),
       |agg AS (SELECT COUNT(*) AS n_pairs,
       |  SUM(CAST(ratio AS DECIMAL(25,6))) AS sr,
       |  MIN(ratio) AS min_ratio, MAX(ratio) AS max_ratio,
       |  CAST(SUM(CASE WHEN abs(ratio - CAST(1 AS DOUBLE)) <=
       |    CAST(0.25 AS DOUBLE) THEN 1 ELSE 0 END) AS BIGINT) AS n_within
       |  FROM rr)
       |SELECT n_pairs,
       |  CAST(CAST(CAST(sr AS DOUBLE) / CAST(n_pairs AS DOUBLE)
       |    AS DECIMAL(25,6)) AS DOUBLE) AS mean_ratio,
       |  min_ratio, max_ratio, n_within,
       |  CAST(n_within AS DOUBLE) / CAST(n_pairs AS DOUBLE)
       |    AS frac_within_25
       |FROM agg""".stripMargin
  }

  // ------------------------------------------ q239 mutual-NN pairing
  /** Reciprocal (mutual) nearest-neighbor pairs — the clustering-free
    * dup signal: a pair where each vector is the OTHER's top-1 cosine
    * neighbor is the strongest pairwise duplicate evidence short of
    * exact equality (one-directional top-1 is cheap to satisfy near a
    * hub; reciprocity is not), and mutual-NN is the standard
    * high-precision pairing step (bitext mining, SemDeDup seeding,
    * biology's reciprocal-best-hit). Emits each mutual pair once with
    * its cosine.
    *
    * Shape: top-1 per vector WITHIN its IVF cell (q39's blocking —
    * cell-local quadratic, never all-pairs), one rank window sharing
    * the cell partitioning, then the reciprocity self-join on the
    * narrow (vec, nn) relation. Cross-cell mutual pairs are invisible
    * by construction — same declared recall trade as q39/q186/q229.
    *
    * Determinism: cosine from the shared kernel; top-1 ties break on
    * candidate id; the reciprocity predicate is exact id equality. */
  def q239MutualNn(s: SparkSession, dir: String): DataFrame = {
    val assigned = new IvfQuantizer(s, dir).assigned
    val a = assigned.select(col("cell"), col("vec_id").as("d1"),
      col("embedding").as("e1"), col("nrm").as("n1"))
    val b = assigned.select(col("cell"), col("vec_id").as("d2"),
      col("embedding").as("e2"), col("nrm").as("n2"))
    val w = Window.partitionBy("d1").orderBy(col("cosine").desc, col("d2"))
    val nn = a.join(b, "cell").filter(col("d1") =!= col("d2"))
      .withColumn("cosine",
        dotC(col("e1"), col("e2")) / (col("n1") * col("n2")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("d1"), col("d2"), col("cosine"))
    nn.as("x").join(nn.as("y"),
        expr("x.d2 = y.d1 AND y.d2 = x.d1 AND x.d1 < x.d2"))
      .select(col("x.d1").as("d1"), col("x.d2").as("d2"),
        col("x.cosine").as("cosine"))
      .orderBy("d1")
  }

  val q239Sql: String =
    s"""WITH n AS (SELECT vec_id, embedding, $normDuck AS nrm FROM embeddings),
       |seeds AS (SELECT vec_id AS seed_id, embedding AS se, nrm AS sn
       |  FROM n ORDER BY $ivfHashDuck, vec_id LIMIT $IvfSeedCount),
       |scored AS (SELECT n.vec_id, n.embedding, n.nrm, s.seed_id,
       |  ${dotDuck("n.embedding", "s.se")} / (n.nrm * s.sn) AS scos
       |  FROM n CROSS JOIN seeds s),
       |assigned AS (SELECT vec_id, embedding, nrm, seed_id AS cell FROM
       |  (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
       |     ORDER BY scos DESC, seed_id) AS rn FROM scored) WHERE rn = 1),
       |p AS (SELECT a.vec_id AS d1, b.vec_id AS d2,
       |  ${dotDuck("a.embedding", "b.embedding")} / (a.nrm * b.nrm)
       |    AS cosine
       |  FROM assigned a JOIN assigned b
       |    ON a.cell = b.cell AND a.vec_id <> b.vec_id),
       |nn AS (SELECT d1, d2, cosine FROM
       |  (SELECT *, ROW_NUMBER() OVER (PARTITION BY d1
       |     ORDER BY cosine DESC, d2) AS rn FROM p) WHERE rn = 1)
       |SELECT x.d1, x.d2, x.cosine FROM nn x JOIN nn y
       |  ON x.d2 = y.d1 AND y.d2 = x.d1 AND x.d1 < x.d2
       |ORDER BY x.d1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q239_mutual_nn" -> (q239MutualNn _),
    "q235_jl_distortion" -> (q235JlDistortion _),
    "q229_semantic_leak" -> (q229SemanticLeak _),
    "q224_rrf_fusion" -> (q224RrfFusion _),
    "q258_kendall_tau" -> (q258KendallTau _),
    "q271_triplet_margin" -> (q271TripletMargin _),
    "q213_prototype_prune" -> (q213PrototypePrune _),
    "q215_label_noise" -> (q215LabelNoise _),
    "q216_trunc_recall" -> (q216TruncRecall _),
    "q217_mmr_rerank" -> (q217MmrRerank _),
    "q219_index_staleness" -> (q219IndexStaleness _),
    "q195_retrieval_metrics" -> (q195RetrievalMetrics _),
    "q186_semdedup" -> (q186SemDedup _),
    "q188_int8_quant" -> (q188Int8Quant _),
    "q190_hard_negatives" -> (q190HardNegatives _),
    "q183_dim_stats" -> (q183DimStats _),
    "q203_fisher_sep" -> (q203FisherSep _),
    "q206_pc1_power" -> (q206Pc1Power _),
    "q168_kmeans" -> (qKmeans _),
    "q254_silhouette" -> (q254Silhouette _),
    "q93_ann_eval" -> (qAnnEval _),
    "q245_rank_metrics" -> (q245RankMetrics _),
    "q82_label_centroids" -> (qLabelCentroids _),
    "q29_embed_norm" -> (qEmbedNorm _),
    "q30_knn_brute" -> (qKnnBrute _),
    "q31_cosine_neardup" -> (qCosineNearDup _),
    "q32_knn_ivf" -> (qKnnIvf _),
    "q39_cell_neardup" -> (qCellNearDup _),
    "q55_srp_neardup" -> (qSrpNearDup _),
    "q62_srp_sized" -> (qSrpNearDupSized _),
    "q65_knn_pq" -> (qKnnPq _),
    "q66_knn_ivfpq" -> (qKnnIvfPq _))

  // lazy: q65's oracle embeds the trained codebook literals, and
  // training needs a live SparkSession (Verify/compare access oracles
  // only after building one)
  lazy val oracles: Map[String, String] = Map(
    "q239_mutual_nn" -> q239Sql,
    "q235_jl_distortion" -> q235Sql,
    "q229_semantic_leak" -> q229Sql,
    "q224_rrf_fusion" -> q224Sql,
    "q258_kendall_tau" -> q258Sql,
    "q271_triplet_margin" -> q271Sql,
    "q213_prototype_prune" -> q213Sql,
    "q215_label_noise" -> q215Sql,
    "q216_trunc_recall" -> q216Sql,
    "q217_mmr_rerank" -> q217Sql,
    "q219_index_staleness" -> q219Sql,
    "q195_retrieval_metrics" -> q195Sql,
    "q186_semdedup" -> q186Sql,
    "q188_int8_quant" -> q188Sql,
    "q190_hard_negatives" -> q190Sql,
    "q183_dim_stats" -> q183Sql,
    "q203_fisher_sep" -> q203Sql,
    "q206_pc1_power" -> q206Sql,
    "q168_kmeans" -> qKmeansSql,
    "q254_silhouette" -> q254Sql,
    "q93_ann_eval" -> qAnnEvalSql,
    "q245_rank_metrics" -> q245Sql,
    "q82_label_centroids" -> qLabelCentroidsSql,
    "q29_embed_norm" -> qEmbedNormSql,
    "q30_knn_brute" -> qKnnBruteSql,
    "q31_cosine_neardup" -> qCosineNearDupSql,
    "q32_knn_ivf" -> qKnnIvfSql,
    "q39_cell_neardup" -> qCellNearDupSql,
    "q55_srp_neardup" -> qSrpNearDupSql,
    "q62_srp_sized" -> qSrpNearDupSizedSql,
    "q65_knn_pq" -> qKnnPqSql,
    "q66_knn_ivfpq" -> qKnnIvfPqSql)
}
