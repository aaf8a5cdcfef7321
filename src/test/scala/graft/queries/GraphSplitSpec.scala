package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Structural pins for the round-6 additions the value-hash oracle
  * cannot see: group-aware split leakage-freedom (q107), chunk
  * coverage conservation (q109), PageRank determinism and hub
  * ordering (q111), and skyline non-dominance (q112) at sf0.001. */
class GraphSplitSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  test("q107 no duplicate group straddles train/test, and both splits exist") {
    val df = Curation.q107LeakSplit(spark, dir).cache()
    try {
      // split is constant within every group — the leakage-freedom
      // property itself, not just a consequence of the hash formula
      val straddling = df.groupBy("grp")
        .agg(countDistinct(col("split")).as("k"))
        .filter(col("k") > 1).count()
      assert(straddling == 0, "a duplicate group straddles the split")
      val splits = df.select("split").distinct().collect().map(_.getString(0)).toSet
      assert(splits == Set("train", "test"))
      // every document is assigned exactly once
      assert(df.count() == df.select("doc_id").distinct().count())
    } finally df.unpersist()
  }

  test("q107 near-duplicate pairs land in the same split") {
    val split = Curation.q107LeakSplit(spark, dir)
      .select(col("doc_id"), col("split"))
    val crossSplit = Dedup.ccEdges(spark, dir)
      .join(split.withColumnRenamed("doc_id", "d1")
        .withColumnRenamed("split", "s1"), "d1")
      .join(split.withColumnRenamed("doc_id", "d2")
        .withColumnRenamed("split", "s2"), "d2")
      .filter(col("s1") =!= col("s2")).count()
    assert(crossSplit == 0, "a near-dup pair crosses train/test")
  }

  test("q109 chunks exactly tile each document at the declared stride") {
    val ch = Curation.q109Chunk(spark, dir).cache()
    try {
      val stride = Curation.ChunkStride.toLong
      val win = Curation.ChunkWindow.toLong
      // starts form 0, stride, 2·stride, …: idx·stride == start
      assert(ch.filter(col("chunk_idx") * stride =!= col("tok_start"))
        .count() == 0)
      // windows are full-size except the tail, never empty, never over
      assert(ch.filter(col("tok_len") < 1 || col("tok_len") > win).count() == 0)
      // per doc: first chunk at 0, last chunk reaches exactly n_tokens
      // (= start of a hypothetical next chunk would fall off the end)
      val perDoc = ch.groupBy("doc_id").agg(
        min("tok_start").as("first"),
        max(col("tok_start") + col("tok_len")).as("covered"),
        max(col("tok_start")).as("last_start"))
      assert(perDoc.filter(col("first") =!= 0L).count() == 0)
      val docs = graft.core.Tables.load(spark, dir, "documents")
        .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n"))
      val bad = perDoc.join(docs, "doc_id")
        .filter(col("covered") =!= col("n") ||
          col("last_start") >= col("n")).count()
      assert(bad == 0, "chunk coverage must end exactly at n_tokens")
    } finally ch.unpersist()
  }

  test("q111 is bit-deterministic across runs and conserves rank mass") {
    val a = GraphOps.q111Pagerank(spark, dir).collect().toSeq
    val b = GraphOps.q111Pagerank(spark, dir).collect().toSeq
    assert(a == b, "fixed-point PageRank must be reproducible bit-for-bit")
    assert(a.nonEmpty)
    // every rank ≥ the damping base (0.15 in 1e-9 units)
    assert(a.forall(_.getLong(1) >= GraphOps.PrScale * 15 / 100))
    // mass conservation up to floor losses: each superstep loses < 1
    // unit per (edge division + damping round), never gains. NOTE:
    // degree ordering is deliberately NOT asserted — duplicate groups
    // are near-CLIQUES, where PageRank is uniform (every node of a
    // k-clique sends and receives exactly its own rank), so a 2-clique
    // leaf legitimately outranks a 4-clique "hub" by a floor unit.
    val n = a.size.toLong
    val mass = a.map(_.getLong(1)).sum
    assert(mass <= n * GraphOps.PrScale, "rank mass must never grow")
    assert(mass > n * GraphOps.PrScale - n * (GraphOps.PrIters + 1) * 100,
      s"floor losses should stay tiny: mass=$mass of ${n * GraphOps.PrScale}")
  }

  test("q112 skyline points are mutually non-dominating and dominate the rest") {
    val pts = graft.core.Tables.load(spark, dir, "orders")
      .groupBy(col("o_custkey").as("custkey"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice")).as("spend"))
    val sky = Relational.q112Skyline(spark, dir)
      .select(col("custkey")).collect().map(_.getLong(0)).toSet
    val all = pts.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getDouble(2)))
    def dominates(a: (Long, Long, Double), b: (Long, Long, Double)) =
      a._2 >= b._2 && a._3 >= b._3 && (a._2 > b._2 || a._3 > b._3)
    val skyPts = all.filter(p => sky(p._1))
    assert(skyPts.nonEmpty)
    // no skyline point is dominated by ANY point
    for (s <- skyPts; o <- all)
      assert(!dominates(o, s), s"$o dominates skyline point $s")
    // every non-skyline point is dominated by some skyline point
    for (o <- all if !sky(o._1))
      assert(skyPts.exists(s => dominates(s, o)), s"$o is undominated but excluded")
  }

  test("q147 oriented wedge join generates each hub wedge once, reach exact") {
    import spark.implicits._
    // constructed viral hub: star with hub 0 and leaves 1..d, plus a
    // triangle 100-101-102 hanging off leaf 1 to exercise the
    // adjacent-AND-2-hop overlap path
    val d = 40
    val star = (1 to d).flatMap(i => Seq((0L, i.toLong), (i.toLong, 0L)))
    val tri = Seq((1L, 100L), (100L, 1L), (100L, 101L), (101L, 100L),
      (101L, 102L), (102L, 101L))
    val edges = (star ++ tri).toDF("d1", "d2")
    // once-per-wedge bound: the naive ordered join emits deg·(deg−1)
    // rows per middle; orientation emits C(deg, 2). Hub 0 has degree
    // d → exactly C(d,2) of the candidates come from it.
    val expectedWedges =
      edges.groupBy("d1").agg(count(lit(1)).as("deg"))
        .collect().map(r => { val k = r.getLong(1); k * (k - 1) / 2 }).sum
    val cand = GraphOps.twoHopCandidates(edges)
    assert(cand.count() == expectedWedges,
      s"oriented join must emit each wedge once (C(deg,2) per middle)")
    // exact reach on the constructed graph, computed per definition
    val adjacency = edges.collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val want = adjacency.map { case (v, nbs) =>
      v -> ((nbs ++ nbs.flatMap(adjacency(_))) - v).size.toLong }
    val got = GraphOps.twoHopReach(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want, s"reach mismatch: got=$got want=$want")
    // the hub sees all leaves + the triangle chain within 2 hops;
    // every star leaf sees the hub and the other d−1 leaves
    assert(got(0L) == d + 1)
    assert((2 to d).forall(i => got(i.toLong) == d))
  }
}
