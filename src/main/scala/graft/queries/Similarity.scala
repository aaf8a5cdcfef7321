package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

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

  /** sqrt(sum(x_i^2)) in double, left-to-right. */
  private val normSpark =
    "sqrt(aggregate(transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 0D, (s, v) -> s + v))"
  private val normDuck =
    "sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"

  /** Spark dot product of two vector columns, left-to-right double. */
  private def dotSpark(a: String, b: String): String =
    s"aggregate(zip_with($a, $b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (s, v) -> s + v)"
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

  // ----------------------------------------------------------- IVF kNN
  // IVF-style ANN: deterministic seed centroids (vec_id % 53 == 0),
  // assign every vector to its nearest seed (its cell), then probe the
  // query's top-2 cells only. Rows-only check (no oracle): the plan
  // shape is the point — candidate set is |cells probed| not N.
  def qKnnIvf(s: SparkSession, dir: String): DataFrame = {
    val n = emb(s, dir).select(col("vec_id"), col("embedding"),
      expr(normSpark).as("nrm"))
    val seeds = n.filter(col("vec_id") % 53 === 0).select(
      col("vec_id").as("seed_id"), col("embedding").as("se"),
      col("nrm").as("sn"))
    // cell assignment: nearest seed per vector
    val wAssign = Window.partitionBy("vec_id")
      .orderBy(col("scos").desc, col("seed_id"))
    val assigned = n.crossJoin(broadcast(seeds))
      .withColumn("scos", expr(dotSpark("embedding", "se")) / (col("nrm") * col("sn")))
      .withColumn("srn", row_number().over(wAssign))
      .filter(col("srn") === 1)
      .select(col("vec_id"), col("embedding"), col("nrm"),
        col("seed_id").as("cell"))
    // queries probe their top-2 cells
    val wProbe = Window.partitionBy("qid").orderBy(col("scos").desc, col("seed_id"))
    val probes = assigned.filter(col("vec_id") < 8)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"),
        col("nrm").as("qn"))
      .crossJoin(broadcast(seeds))
      .withColumn("scos", expr(dotSpark("qe", "se")) / (col("qn") * col("sn")))
      .withColumn("prn", row_number().over(wProbe))
      .filter(col("prn") <= 2)
      .select(col("qid"), col("qe"), col("qn"), col("seed_id").as("cell"))
    // search only within probed cells
    val wTop = Window.partitionBy("qid").orderBy(col("cosine").desc, col("cid"))
    probes.join(assigned.withColumnRenamed("vec_id", "cid"), "cell")
      .filter(col("qid") =!= col("cid"))
      .withColumn("cosine", expr(dotSpark("qe", "embedding")) / (col("qn") * col("nrm")))
      .withColumn("rn", row_number().over(wTop))
      .filter(col("rn") <= 5)
      .select(col("qid"), col("cid"), col("rn"), col("cosine"))
      .orderBy("qid", "rn")
  }

  // ------------------------------------------------------------ wiring
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q29_embed_norm" -> (qEmbedNorm _),
    "q30_knn_brute" -> (qKnnBrute _),
    "q31_cosine_neardup" -> (qCosineNearDup _),
    "q32_knn_ivf" -> (qKnnIvf _))

  val oracles: Map[String, String] = Map(
    "q29_embed_norm" -> qEmbedNormSql,
    "q30_knn_brute" -> qKnnBruteSql,
    "q31_cosine_neardup" -> qCosineNearDupSql)
}
