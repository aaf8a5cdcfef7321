package graft.queries

import graft.SparkSuite

/** ANN quality contract: the IVF index is only useful if probing a few
  * cells still finds a useful share of true neighbors. Recall@5 of q32
  * (IVF) against q30 (brute force, ground truth), asserted at the
  * data-limited floor: this corpus is near-isotropic noise (true top-5
  * neighbors at cosine ≈ 0.3 vs ≈ 0.005 random, label-orthogonal), so
  * partition-ANN cannot reach clustered-data recall — measured ≈ 0.65
  * at K=10 hash-sampled seeds / 4 probes, and FEWER probes or FINER
  * cells both degrade it (0.40). The floor still proves the index
  * finds signal: random 4-of-10-cell probing would recall ≈ 0.4 in
  * expectation. */
class SimilarityRecallSpec extends SparkSuite {

  test("IVF recall@5 vs brute force >= 0.6 (data-limited floor, see header)") {
    val dir = "/root/testdata/sf0.001"
    def topk(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.select("qid", "cid").collect()
        .groupBy(_.getLong(0)).map { case (q, rows) =>
          q -> rows.map(_.getLong(1)).toSet
        }
    val truth = topk(Similarity.qKnnBrute(spark, dir))
    val approx = topk(Similarity.qKnnIvf(spark, dir))
    assert(truth.keySet == approx.keySet)
    val recalls = truth.map { case (q, t) =>
      approx(q).intersect(t).size.toDouble / t.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.6, s"mean recall@5 = $mean (per-query: $recalls)")
  }
}
