package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph analytics over the verified near-duplicate graph (the q63
  * edge relation): iterative message-passing algorithms expressed as
  * joins + aggregations so Catalyst/AQE plan each superstep.
  *
  * Scale notes (100 TB):
  *  - Each PageRank superstep is the canonical Pregel shape: one
  *    edges⋈ranks hash join + one target-keyed sum — two shuffles on
  *    narrow (id, long) rows, the same frame GraphX/Pregel lowers to.
  *    Viral hubs (skewed in-degree) fall to AQE skew splitting; the
  *    iteration count is fixed (not convergence-polled), so no
  *    per-round driver action exists at all.
  *  - Ranks are FIXED-POINT integers (units of 1e-9): floating-point
  *    PageRank sums contributions in shuffle order, which is not
  *    reproducible across partitionings or engines; integer floor
  *    division + integer sums are bit-exact everywhere, which is what
  *    lets an iterative algorithm sit under a value-hash oracle gate
  *    at all. With rank mass N×1e9, 64-bit sums hold to ~1e8 nodes ×
  *    the 85 multiplier; beyond that, drop the per-node seed scale or
  *    route the sum through DECIMAL(38,0) — same semantics, wider
  *    accumulator.
  */
object GraphOps {

  /** Damping 0.85 in integer percent; seed rank 1.0 = 1e9 units. */
  val PrScale = 1000000000L
  val PrIters = 3

  // ----------------------------------------------------- q111 pagerank
  /** Fixed-point PageRank over the near-dup graph — ranks boilerplate
    * "hub" documents that LSH-pair with many others (template families
    * surface with rank ≫ 1; isolated near-dup pairs stay near 1).
    * [[PrIters]] unrolled supersteps; the bidirectional edge relation
    * means every node has in-degree ≥ 1, so no dangling-mass term.
    * The oracle unrolls the same three supersteps as non-recursive
    * CTEs — every arithmetic op is integer, so the fixpoint matches
    * bit-for-bit. */
  def q111Pagerank(s: SparkSession, dir: String): DataFrame = {
    val edges = Dedup.ccEdges(s, dir) // (d1 → d2), bidirectional, cached
    val deg = edges.groupBy("d1").agg(count(lit(1)).as("deg"))
    val withDeg = edges.join(deg, "d1")
    var ranks = deg.select(col("d1").as("id"), lit(PrScale).as("pr"))
    for (_ <- 1 to PrIters) {
      ranks = withDeg
        .join(ranks.withColumnRenamed("id", "d1"), "d1")
        .select(col("d2").as("id"), expr("pr div deg").as("c"))
        .groupBy("id")
        .agg((lit(PrScale * 15 / 100) +
          expr("85 * sum(c) div 100")).as("pr"))
    }
    ranks.select(col("id").as("doc_id"), col("pr").as("rank_e9"))
      .orderBy("doc_id")
  }

  val q111Sql: String = {
    val base = PrScale * 15 / 100
    val steps = (1 to PrIters).map { i =>
      s"""m$i AS (SELECT e.d2 AS id, SUM(r.pr // g.deg) AS s
         |  FROM edges e JOIN deg g ON e.d1 = g.d1
         |  JOIN r${i - 1} r ON e.d1 = r.id GROUP BY 1),
         |r$i AS (SELECT id, CAST($base + (85 * s) // 100 AS BIGINT) AS pr FROM m$i)""".stripMargin
    }.mkString(",\n")
    s"""${Dedup.edgesSqlCte},
       |deg AS (SELECT d1, COUNT(*) AS deg FROM edges GROUP BY 1),
       |r0 AS (SELECT d1 AS id, CAST($PrScale AS BIGINT) AS pr FROM deg),
       |$steps
       |SELECT id AS doc_id, pr AS rank_e9 FROM r$PrIters ORDER BY doc_id""".stripMargin
  }

  // ------------------------------------------------------------ wiring
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q111_pagerank" -> (q111Pagerank _))

  val oracles: Map[String, String] = Map(
    "q111_pagerank" -> q111Sql)
}
