package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Deterministic sampling operators over `documents` — the
  * data-mixing primitives of a pre-training pipeline: per-source rate
  * sampling (upweight books, downweight crawl) and fixed-size
  * per-stratum sampling (balanced eval slices, per-language probes).
  *
  * Determinism is the design constraint: `Dataset.sample` draws from
  * a per-partition RNG, so its row set changes with partitioning and
  * cannot be oracle-checked or reproduced across reruns — a pipeline
  * rerun would train on a different corpus. Both operators instead
  * key the draw on a multiplicative hash of the row's stable id
  * (Knuth's 2654435761, the same scheme the IVF seed sampler uses —
  * `Similarity.scala` q32), so the sample is a pure function of the
  * data: re-runnable, engine-independent, and auditable. At larger id
  * domains swap in `xxhash64(id)` (also a fixed pure function);
  * the modulus arithmetic below is exact for ids < 2^31.
  *
  * Scale: rate sampling is a scan-local filter (no shuffle at all —
  * it composes with pushdown and pruning). Fixed-k sampling shuffles
  * once on the stratum key and takes a window top-k inside each
  * stratum (partial per-partition top-k would be the next refinement
  * at extreme per-stratum volume, same as TakeOrderedAndProject).
  */
object Sampling {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  /** Knuth multiplicative hash of the doc id into [0, m). */
  private def hmod(m: Long): Column =
    pmod(col("doc_id") * lit(2654435761L), lit(m))

  // --------------------------------- q275 nested consistent sampling
  /** Nested (consistent) corpus sampling: one ring position
    * h = ((id mod P)·(K mod P)) mod P per document decides EVERY
    * sample rate at once — keep at rate p iff h < ⌊P·p⌋ — so the 10%
    * sample is a strict SUBSET of the 20% sample by construction
    * (raising the rate only ADDS documents; no re-draw churn between
    * corpus releases, the property ablation suites depend on). The
    * audit materializes both samples and checks the nesting
    * exactly: |S10 ∩ S20| must equal |S10|.
    *
    * Determinism: pure 64-bit modular arithmetic (the two-step
    * mod-P product never overflows int64 even for arbitrary ids);
    * the Knuth multiplier (> 2^31) spreads small sequential ids
    * across the ring — a bare affine of small ids would not wrap.
    *
    * Scale: the keep decision is scan-local (composes with pushdown;
    * zero shuffle); the audit's three counts are one
    * map-side-combined aggregate. */
  val RingP = 2147483647L // 2^31 − 1
  val RingK = 2654435761L // Knuth multiplicative constant

  def q275NestedSample(s: SparkSession, dir: String): DataFrame = {
    val h = pmod(pmod(col("doc_id"), lit(RingP)) * lit(RingK % RingP),
      lit(RingP))
    val t10 = RingP / 10
    val t20 = RingP / 5
    docs(s, dir).select(col("doc_id"), h.as("h"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("h") < t10, 1L).otherwise(0L)).as("n_p10"),
        sum(when(col("h") < t20, 1L).otherwise(0L)).as("n_p20"),
        sum(when(col("h") < t10 && col("h") < t20, 1L).otherwise(0L))
          .as("n_overlap"))
      .select(col("n_docs"), col("n_p10"), col("n_p20"), col("n_overlap"),
        (col("n_overlap") === col("n_p10")).as("nested"),
        (col("n_p10").cast("double") / col("n_docs").cast("double"))
          .as("rate10"),
        (col("n_p20").cast("double") / col("n_docs").cast("double"))
          .as("rate20"))
  }

  val q275Sql: String =
    s"""WITH h AS (SELECT doc_id,
       |  ((doc_id % $RingP) * ${RingK % RingP}) % $RingP AS h
       |  FROM documents)
       |SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(CASE WHEN h < ${RingP / 10} THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_p10,
       |  CAST(SUM(CASE WHEN h < ${RingP / 5} THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_p20,
       |  CAST(SUM(CASE WHEN h < ${RingP / 10} AND h < ${RingP / 5}
       |    THEN 1 ELSE 0 END) AS BIGINT) AS n_overlap,
       |  SUM(CASE WHEN h < ${RingP / 10} AND h < ${RingP / 5}
       |    THEN 1 ELSE 0 END) =
       |    SUM(CASE WHEN h < ${RingP / 10} THEN 1 ELSE 0 END) AS nested,
       |  CAST(SUM(CASE WHEN h < ${RingP / 10} THEN 1 ELSE 0 END) AS DOUBLE)
       |    / CAST(COUNT(*) AS DOUBLE) AS rate10,
       |  CAST(SUM(CASE WHEN h < ${RingP / 5} THEN 1 ELSE 0 END) AS DOUBLE)
       |    / CAST(COUNT(*) AS DOUBLE) AS rate20
       |FROM h""".stripMargin

  // ------------------------------------------- q68 stratified by rate
  /** Per-source rate sampling: each source keeps `5·(1 + src# mod 6)`
    * percent of its documents (5%–30% — a stand-in for a real mixing
    * recipe's per-source weights). The keep decision is
    * `hash(doc_id) mod 1000 < 10·rate_pct` — scan-local, zero
    * shuffle, stable under repartitioning. */
  def q68StratifiedSample(s: SparkSession, dir: String): DataFrame = {
    val ratePct = lit(5) * (lit(1) +
      pmod(substring(col("source"), 4, 10).cast("int"), lit(6)))
    docs(s, dir)
      .filter(hmod(1000L) < ratePct * lit(10))
      .select(col("doc_id"), col("source"), col("lang"))
      .orderBy("doc_id")
  }

  val q68Sql: String =
    """SELECT doc_id, source, lang FROM documents
      |WHERE (doc_id * 2654435761) % 1000 <
      |  (5 * (1 + (CAST(SUBSTR(source, 4, 10) AS INT) % 6))) * 10
      |ORDER BY doc_id""".stripMargin

  // ------------------------------------------- q74 fixed-k per stratum
  /** Deterministic "reservoir": exactly k = 20 documents per language,
    * chosen by hash order (uniform over the stratum, reproducible).
    * One shuffle on `lang`; rank is a window inside the stratum with
    * `doc_id` as the total-order tie-break. */
  val ReservoirK: Int = 20

  def q74ReservoirPerLang(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("lang").orderBy(col("h"), col("doc_id"))
    docs(s, dir)
      .withColumn("h", hmod(1000000007L))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= ReservoirK)
      .select(col("lang"), col("rnk"), col("doc_id"), col("source"))
      .orderBy("lang", "rnk")
  }

  val q74Sql: String =
    s"""SELECT lang, rnk, doc_id, source FROM (
       |  SELECT lang, doc_id, source,
       |    ROW_NUMBER() OVER (PARTITION BY lang
       |      ORDER BY (doc_id * 2654435761) % 1000000007, doc_id) AS rnk
       |  FROM documents)
       |WHERE rnk <= $ReservoirK ORDER BY lang, rnk""".stripMargin

  // ------------------------------------------- q89 weighted sample
  /** Deterministic weighted sampling without replacement (the A-ES /
    * Efraimidis–Spirakis scheme made reproducible): each doc draws a
    * pseudo-uniform u from the hash of its stable id and competes on
    * key = ln(u)/weight — larger weights pull the key toward 0, so the
    * top-k by key is a weight-proportional sample, here weighted by
    * document length (the "sample long documents preferentially"
    * recipe). Deterministic: u is a pure function of doc_id, so the
    * sample reproduces across runs, engines, and partitionings.
    *
    * Engine parity: ln comes from each engine's libm (1-ulp
    * differences allowed), so the SORT KEY is quantized to 9 dp with
    * the unique doc_id as tie-break — a 1-ulp wobble cannot flip
    * membership or order. Scale: per-row key + global top-k =
    * TakeOrderedAndProject (per-partition partial top-k), never a
    * full sort. */
  val WeightedK: Int = 20

  def q89WeightedSample(s: SparkSession, dir: String): DataFrame = {
    val u = (hmod(1000000007L) + lit(1)).cast("double") / lit(1000000008.0)
    docs(s, dir)
      .withColumn("skey", round(log(u) / col("n_chars").cast("double"), 9))
      .orderBy(col("skey").desc, col("doc_id"))
      .limit(WeightedK)
      .select(col("doc_id"), col("n_chars"), col("skey"))
  }

  val q89Sql: String =
    s"""SELECT doc_id, n_chars,
       |round(ln((((doc_id * 2654435761) % 1000000007) + 1) / 1000000008.0)
       |      / CAST(n_chars AS DOUBLE), 9) AS skey
       |FROM documents
       |ORDER BY skey DESC, doc_id LIMIT $WeightedK""".stripMargin

  // ------------------------------------------------------------ wiring
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q68_sample_stratified" -> (q68StratifiedSample _),
    "q74_sample_reservoir" -> (q74ReservoirPerLang _),
    "q89_weighted_sample" -> (q89WeightedSample _),
    "q275_nested_sample" -> (q275NestedSample _))

  val oracles: Map[String, String] = Map(
    "q68_sample_stratified" -> q68Sql,
    "q74_sample_reservoir" -> q74Sql,
    "q89_weighted_sample" -> q89Sql,
    "q275_nested_sample" -> q275Sql)
}
