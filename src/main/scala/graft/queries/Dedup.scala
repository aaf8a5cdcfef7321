package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Deduplication operators over the `documents` table — first-class
  * components of the 100 TB training-data pipeline surface (exact dedup,
  * n-gram shingle-set dedup, MinHash+LSH candidate generation).
  *
  * All hash functions are md5 (present and bit-identical in both Spark
  * and the DuckDB oracle); MinHash uses min-over-md5("k<i>:"+shingle),
  * whose lexicographic min over hex strings agrees across engines.
  *
  * Scale notes (100 TB): every query here is shuffle-light — shingling,
  * signatures and fingerprints are per-row array expressions (no explode
  * -> no shuffle explosion); the LSH candidate join shuffles only on
  * narrow (band-hash) keys, which is the standard linear-scale path vs
  * the quadratic all-pairs join.
  */
object Dedup {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  /** Distinct 3-gram word shingles of `text`, as a SQL expression usable
    * in both engines' dialects (Spark side here; DuckDB twin below). */
  private[queries] val shinglesSpark: String =
    """CASE WHEN size(split(text, ' ')) >= 3 THEN
      |  array_distinct(transform(sequence(1, size(split(text, ' ')) - 2),
      |    i -> concat_ws(' ', element_at(split(text, ' '), i),
      |                        element_at(split(text, ' '), i + 1),
      |                        element_at(split(text, ' '), i + 2))))
      |ELSE CAST(array() AS ARRAY<STRING>) END""".stripMargin

  private[queries] val shinglesDuck: String =
    """CASE WHEN len(string_split(text, ' ')) >= 3 THEN
      |  list_distinct(list_transform(range(1, len(string_split(text, ' ')) - 1),
      |    i -> string_split(text, ' ')[i] || ' ' ||
      |         string_split(text, ' ')[i + 1] || ' ' ||
      |         string_split(text, ' ')[i + 2]))
      |ELSE [] END""".stripMargin

  private val NumHashes = 8
  private val BandSize = 4 // 2 bands of 4 minhashes

  /** doc_id + minhash signature columns h0..h7 + 2 LSH band keys. */
  private def signatures(s: SparkSession, dir: String): DataFrame = {
    val withSh = docs(s, dir).withColumn("sh", expr(shinglesSpark))
    val withH = (0 until NumHashes).foldLeft(withSh) { (df, k) =>
      df.withColumn(s"h$k",
        expr(s"array_min(transform(sh, s -> md5(concat('k$k:', s))))"))
    }
    withH
      .withColumn("band0", md5(concat(col("h0"), col("h1"), col("h2"), col("h3"))))
      .withColumn("band1", md5(concat(col("h4"), col("h5"), col("h6"), col("h7"))))
  }

  private def sigSqlCte: String = {
    val hs = (0 until NumHashes).map { k =>
      s"list_min(list_transform(sh, s -> md5('k$k:' || s))) AS h$k"
    }.mkString(",\n")
    s"""WITH shed AS (SELECT doc_id, $shinglesDuck AS sh FROM documents),
       |sig AS (SELECT doc_id, sh,
       |$hs
       |FROM shed),
       |banded AS (SELECT *, md5(h0 || h1 || h2 || h3) AS band0,
       |md5(h4 || h5 || h6 || h7) AS band1 FROM sig)""".stripMargin
  }

  // ------------------------------------------------------------- exact
  // Exact dedup by content hash (hash-groupBy; map-side combinable).
  def qDedupExact(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(md5(col("text").cast("binary")).as("fp"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("fp")).as("n_distinct"),
        (count(lit(1)) - countDistinct(col("fp"))).as("n_dup"))

  val qDedupExactSql: String =
    """SELECT COUNT(*) AS n_docs, COUNT(DISTINCT md5(text)) AS n_distinct,
      |COUNT(*) - COUNT(DISTINCT md5(text)) AS n_dup FROM documents""".stripMargin

  // ------------------------------------------------------------- ngram
  // N-gram Jaccard dedup, exact-set variant: documents sharing the same
  // *set* of 3-gram shingles (Jaccard == 1.0) collapse to one group.
  def qDedupNgram(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .withColumn("sh", expr(shinglesSpark))
      .select(md5(array_join(array_sort(col("sh")), "|").cast("binary")).as("fp"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("fp")).as("n_groups"),
        (count(lit(1)) - countDistinct(col("fp"))).as("n_dup"))

  val qDedupNgramSql: String =
    s"""WITH shed AS (SELECT doc_id, $shinglesDuck AS sh FROM documents),
       |fps AS (SELECT md5(array_to_string(list_sort(sh), '|')) AS fp FROM shed)
       |SELECT COUNT(*) AS n_docs, COUNT(DISTINCT fp) AS n_groups,
       |COUNT(*) - COUNT(DISTINCT fp) AS n_dup FROM fps""".stripMargin

  // ----------------------------------------------------------- minhash
  // MinHash signature + LSH band keys per document (shingle ->
  // minhash -> band). Pure per-row array expressions: no shuffle.
  def qMinhashSig(s: SparkSession, dir: String): DataFrame =
    signatures(s, dir)
      .select(col("doc_id"), col("band0"), col("band1"), col("h0"), col("h7"))
      .orderBy("doc_id")

  val qMinhashSigSql: String =
    s"""$sigSqlCte
       |SELECT doc_id, band0, band1, h0, h7 FROM banded ORDER BY doc_id""".stripMargin

  // LSH bucket-join candidate pairs, verified with exact shingle-set
  // Jaccard. Join key = band hash (linear-scale; never all-pairs).
  def qMinhashPairs(s: SparkSession, dir: String): DataFrame = {
    val sig = signatures(s, dir).select(
      col("doc_id"), col("sh"), col("band0"), col("band1")).cache()
    def pairsOn(band: String): DataFrame = {
      val a = sig.select(col("doc_id").as("d1"), col(band).as("b"))
      val b = sig.select(col("doc_id").as("d2"), col(band).as("b"))
      a.join(b, "b").filter(col("d1") < col("d2")).select(col("d1"), col("d2"))
    }
    val cand = pairsOn("band0").union(pairsOn("band1")).distinct()
    val s1 = sig.select(col("doc_id").as("d1"), col("sh").as("sh1"))
    val s2 = sig.select(col("doc_id").as("d2"), col("sh").as("sh2"))
    cand.join(s1, "d1").join(s2, "d2")
      .withColumn("jaccard",
        size(array_intersect(col("sh1"), col("sh2"))).cast("double") /
          size(array_union(col("sh1"), col("sh2"))).cast("double"))
      .filter(col("jaccard") >= 0.3)
      .select(col("d1"), col("d2"), col("jaccard"))
      .orderBy("d1", "d2")
  }

  val qMinhashPairsSql: String =
    s"""$sigSqlCte,
       |cand AS (
       |  SELECT a.doc_id AS d1, b.doc_id AS d2 FROM banded a JOIN banded b
       |    ON a.band0 = b.band0 AND a.doc_id < b.doc_id
       |  UNION
       |  SELECT a.doc_id AS d1, b.doc_id AS d2 FROM banded a JOIN banded b
       |    ON a.band1 = b.band1 AND a.doc_id < b.doc_id),
       |scored AS (
       |  SELECT d1, d2,
       |    CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE) /
       |    CAST(len(list_distinct(list_concat(x.sh, y.sh))) AS DOUBLE) AS jaccard
       |  FROM cand JOIN banded x ON cand.d1 = x.doc_id
       |            JOIN banded y ON cand.d2 = y.doc_id)
       |SELECT d1, d2, jaccard FROM scored WHERE jaccard >= 0.3
       |ORDER BY d1, d2""".stripMargin

  // ------------------------------------------------------------ wiring
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q20_dedup_exact" -> (qDedupExact _),
    "q21_dedup_ngram" -> (qDedupNgram _),
    "q22_minhash_sig" -> (qMinhashSig _),
    "q23_minhash_pairs" -> (qMinhashPairs _))

  val oracles: Map[String, String] = Map(
    "q20_dedup_exact" -> qDedupExactSql,
    "q21_dedup_ngram" -> qDedupNgramSql,
    "q22_minhash_sig" -> qMinhashSigSql,
    "q23_minhash_pairs" -> qMinhashPairsSql)
}
