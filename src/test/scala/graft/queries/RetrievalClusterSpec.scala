package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Behavioral specs for the round-6 additions: BM25 retrieval (q167 —
  * checked against an independent driver-side recomputation), k-means
  * (q168 — partition + inertia-descent invariants), and the
  * frame-sample / audio-feature multimodal plumbing (q169/q170 —
  * structural invariants plus the planted-duplicate signature check).
  */
class RetrievalClusterSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  test("q167 bm25 matches an independent in-memory recomputation") {
    val got = TextAnalysis.qBm25(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    val docs = graft.core.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1)))
    val n = docs.length.toDouble
    val dl = docs.map { case (id, t) => id -> t.length.toLong }.toMap
    val avgdl = dl.values.sum.toDouble / n
    val terms = TextAnalysis.Bm25Terms
    val df = terms.map(t =>
      t -> docs.count(_._2.contains(t)).toDouble).toMap
    val k1 = TextAnalysis.Bm25K1; val b = TextAnalysis.Bm25B
    val scores = docs.flatMap { case (id, toks) =>
      val s = terms.map { t =>
        val tf = toks.count(_ == t).toDouble
        if (tf == 0) BigDecimal(0)
        else {
          val idf = math.log((n - df(t) + 0.5) / (df(t) + 0.5) + 1.0)
          val raw = idf * (tf * (k1 + 1.0)) /
            (tf + k1 * ((1.0 - b) + b * (dl(id) / avgdl)))
          BigDecimal(raw).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        }
      }.sum
      if (s > 0) Some(id -> s.toDouble) else None
    }
    // rank on the raw decimal sum (the engine's ordering), then quantize
    // to the engine's 4-dp output rounding for the value comparison
    val expected = scores.sortBy { case (id, s) => (-s, id) }
      .take(TextAnalysis.Bm25TopK)
      .map { case (id, s) =>
        id -> BigDecimal(s).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
    assert(got.length === expected.length)
    got.zip(expected).zipWithIndex.foreach {
      case (((rn, id, sc), (eid, esc)), i) =>
        assert(rn === i + 1)
        assert(id === eid, s"rank ${i + 1}")
        assert(math.abs(sc - esc) < 1e-9, s"rank ${i + 1} score")
    }
  }

  test("q167 plans top-k as TakeOrderedAndProject, stats broadcast") {
    val p = TextAnalysis.qBm25(spark, dir).queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"))
    assert(p.contains("BroadcastExchange") || p.contains("Broadcast"))
  }

  test("q168 kmeans partitions the corpus and descends inertia") {
    val out = Similarity.qKmeans(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    val total = graft.core.Tables.load(spark, dir, "embeddings").count()
    assert(out.map(_._2).sum === total, "every vector in exactly one cluster")
    assert(out.length <= Similarity.KmeansK)
    assert(out.forall(_._3 >= 0.0))
    // Lloyd descent: refined centroids fit at least as well as seeds
    // (quantization at 1e-6 is far below any real per-round gain)
    val ex = Similarity.kmeansExploded(spark, dir).cache()
    try {
      val seeds = ex.filter(col("vec_id") < Similarity.KmeansK)
        .select(col("vec_id").cast("int").as("k"), col("p"), col("v").as("c"))
      val seedInertia = Similarity.kmeansAssign(ex, seeds)
        .agg(sum(col("dist"))).head().getDouble(0)
      val finalInertia = out.map(r => r._2 * r._3).sum
      assert(finalInertia <= seedInertia + 1e-3,
        s"final $finalInertia vs seed $seedInertia")
    } finally ex.unpersist()
  }

  test("q271 triplet margins match a brute-force cosine recompute") {
    val got = Similarity.q271TripletMargin(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getLong(4), r.getDouble(5)))
    val vecs = graft.core.Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("label"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).map(_.toDouble)))
    def q6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    // the engine's vec_dot kernel: LEFT-TO-RIGHT double accumulation
    def fold(xs: Seq[Double]): Double = xs.foldLeft(0.0)(_ + _)
    def nrm(v: Seq[Double]) = math.sqrt(fold(v.map(x => x * x)))
    def dot(a: Seq[Double], b: Seq[Double]) =
      fold(a.zip(b).map(p => p._1 * p._2))
    val anchors = vecs.filter(_._1 < Similarity.TripletAnchors)
    val margins = anchors.map { case (qid, qlab, qe) =>
      val cos = vecs.filter(_._1 != qid).map { case (_, lab, ce) =>
        (lab, dot(qe, ce) / (nrm(qe) * nrm(ce)))
      }
      val pos = cos.filter(_._1 == qlab).map(_._2).max
      val neg = cos.filter(_._1 != qlab).map(_._2).max
      (qlab, q6(pos - neg).toDouble)
    }
    val expected = margins.groupBy(_._1).toSeq.sortBy(_._1).map {
      case (lab, g) =>
        val viol = g.count(_._2 <= 0.0).toLong
        (lab, g.length.toLong,
          q6(g.map(m => q6(m._2)).sum.toDouble / g.length).toDouble,
          g.map(_._2).min, viol, viol.toDouble / g.length)
    }
    assert(got.toSeq === expected)
    got.foreach { case (lab, _, mean, mn, _, vr) =>
      assert(mn <= mean, s"$lab min above mean")
      assert(vr >= 0.0 && vr <= 1.0)
    }
  }

  test("q258 Kendall tau matches a pairwise recompute over q224's ranks") {
    val got = Similarity.q258KendallTau(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
    val fused = Similarity.q224RrfFusion(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3), r.getInt(4)))
      .groupBy(_._1)
    val taus = fused.toSeq.sortBy(_._1).map { case (qid, items) =>
      val pairs = for {
        i <- items.indices; j <- items.indices
        if items(i)._2 < items(j)._2
      } yield ((items(i)._3 - items(j)._3).toLong *
        (items(i)._4 - items(j)._4).toLong > 0L)
      val c = pairs.count(identity).toLong
      val d = pairs.length - c
      (qid, pairs.length.toLong, c, d, (c - d).toDouble / (c + d).toDouble)
    }
    def q6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val meanTau = q6(taus.map(t => q6(t._5)).sum.toDouble / taus.length)
      .toDouble
    assert(got.map(t => (t._1, t._2, t._3, t._4, t._5)).toSeq === taus)
    got.foreach { t =>
      assert(t._6 === meanTau)
      assert(t._5 >= -1.0 && t._5 <= 1.0)
    }
  }

  test("q254 silhouette matches an in-memory centroid recompute") {
    val out = Similarity.q254Silhouette(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    val cent = Similarity.kmeansFinalCentroids(spark, dir)
    val vecs = graft.core.Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble)))
    def q6(x: Double): BigDecimal =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    // the engine's quantized fold: each (v−c)² to 6 dp, exact sum
    def dist(v: Seq[Double], c: Seq[Double]): Double =
      v.zip(c).map { case (a, b) => q6((a - b) * (a - b)) }.sum.toDouble
    val sils = vecs.map { case (_, v) =>
      val ds = cent.map { case (k, c) => (dist(v, c), k) }
      val (a, own) = ds.min // (dist, k) lexicographic argmin
      val b = ds.filter(t => t != ((a, own))).map(_._1).min
      val (sa, sb) = (math.sqrt(a), math.sqrt(b))
      val s = if (math.max(sa, sb) == 0.0) 0.0
        else q6((sb - sa) / math.max(sa, sb)).toDouble
      (own, s)
    }
    val overall = q6(
      sils.map(s => q6(s._2)).sum.toDouble / sils.length).toDouble
    val expected = sils.groupBy(_._1).toSeq.sortBy(_._1).map { case (k, g) =>
      (k, g.length.toLong,
        q6(g.map(s => q6(s._2)).sum.toDouble / g.length).toDouble, overall)
    }
    assert(out.toSeq === expected)
    // silhouette lives in [-1, 1]; membership matches q168's partition
    out.foreach { case (_, _, m, o) =>
      assert(m >= -1.0 && m <= 1.0 && o >= -1.0 && o <= 1.0) }
    val km = Similarity.qKmeans(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1))).toMap
    out.foreach { case (k, n, _, _) => assert(km(k) === n, s"cluster $k") }
  }

  test("k-means long-form and native-kernel assignments agree bit-exactly on the seed round") {
    import org.apache.spark.sql.functions.expr
    val e = graft.core.Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val seeds = e.filter(col("vec_id") < Similarity.KmeansK).collect()
      .map(r => (r.getLong(0).toInt, r.getSeq[Float](1).map(_.toDouble).toSeq))
      .sortBy(_._1)
    // array form: per-row native kernel over centroid literals
    val distCols = seeds.map { case (k, c) =>
      val arr = c.map(v => s"CAST($v AS DOUBLE)").mkString("array(", ",", ")")
      expr(s"graft_l2sq_q6(embedding, $arr)").as(s"d$k")
    }
    val fast = e.select((col("vec_id") +: distCols.toSeq): _*).collect()
      .map(r => r.getLong(0) ->
        seeds.indices.map(i => r.getDouble(i + 1)).toVector).toMap
    // long form: exploded + grouped decimal sum (the oracle's shape)
    val ex = Similarity.kmeansExploded(spark, dir)
    val cent = ex.filter(col("vec_id") < Similarity.KmeansK)
      .select(col("vec_id").cast("int").as("k"), col("p"), col("v").as("c"))
    val slow = ex.join(cent, "p")
      .withColumn("sq", (col("v") - col("c")) * (col("v") - col("c")))
      .groupBy(col("vec_id"), col("k"))
      .agg(Relational.dsum(col("sq")).as("dist"))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(fast.nonEmpty)
    fast.foreach { case (vid, ds) =>
      seeds.indices.foreach { i =>
        val k = seeds(i)._1
        assert(ds(i) == slow((vid, k)),
          s"vec $vid cluster $k: kernel ${ds(i)} vs grouped ${slow((vid, k))}")
      }
    }
  }

  test("q169 frame accounting is consistent and planted dups share signatures") {
    val out = Multimodal.q169FrameSample(spark, dir).cache()
    try {
      assert(out.filter(col("n_frames") =!= col("n_sampled") * 2).count() === 0)
      assert(out.filter(length(col("first_frame")) =!= 16).count() === 0)
      // every doc_id % 50 == 0 shares blob content with doc 0
      val dupSigs = out.filter(col("doc_id") % 50 === 0)
        .select(col("sample_sig")).distinct().count()
      assert(dupSigs === 1, "planted exact duplicates must share the signature")
      // non-planted docs have many distinct signatures
      val rest = out.filter(col("doc_id") % 50 =!= 0)
      assert(rest.select(col("sample_sig")).distinct().count() === rest.count())
    } finally out.unpersist()
  }

  test("q170 audio features respect waveform invariants") {
    val out = Multimodal.q170AudioFeatures(spark, dir).cache()
    try {
      assert(out.filter(col("peak") > 255 || col("peak") < 0).count() === 0)
      assert(out.filter(col("mean_amp") > col("peak")).count() === 0)
      // RMS >= mean for non-negative samples (power-mean inequality)
      assert(out.filter(col("rms") < col("mean_amp") - 1e-9).count() === 0)
      assert(out.filter(col("crossings") > col("n_samples") - 1).count() === 0)
      assert(out.filter(col("clipped") > col("n_samples")).count() === 0)
      // planted duplicates (doc_id % 50 == 0) share every feature
      val dup = out.filter(col("doc_id") % 50 === 0)
        .select("n_samples", "peak", "mean_amp", "rms", "crossings", "clipped")
        .distinct()
      assert(dup.count() === 1)
    } finally out.unpersist()
  }

  test("q171 funnel attrition is monotone and consistent with the stage operators") {
    val out = Curation.q171CurationFunnel(spark, dir).cache()
    try {
      // monotone per cell: in >= exact >= near >= quality
      assert(out.filter(col("n_in") < col("n_exact") ||
        col("n_exact") < col("n_near") ||
        col("n_near") < col("n_quality")).count() === 0)
      // totals agree with the dataset-level operators run standalone
      val d = graft.core.Tables.load(spark, dir, "documents")
      val exact = Dedup.dedupExact(d, "text", "doc_id").count()
      val near = Dedup.dedupNearLSH(
        Dedup.dedupExact(d, "text", "doc_id"), "text", "doc_id", 0.5).count()
      val agg = out.agg(sum("n_in"), sum("n_exact"), sum("n_near")).head()
      assert(agg.getLong(0) === d.count())
      assert(agg.getLong(1) === exact)
      assert(agg.getLong(2) === near)
    } finally out.unpersist()
  }

  test("q173 spans respect the support floor and span width") {
    val out = TextAnalysis.qBoilerplate(spark, dir).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getLong(1) >= TextAnalysis.BoilerplateMinSupport))
    assert(out.forall(r =>
      r.getString(0).split(" ").length == TextAnalysis.BoilerplateSpan))
    // descending support with span tie-break
    val pairs = out.map(r => (r.getLong(1), r.getString(0)))
    assert(pairs.sameElements(pairs.sortBy { case (s, sp) => (-s, sp) }))
  }

  test("q175 outlier counts are bounded and MAD is non-negative") {
    val rows = EventAnalytics.q175MadOutliers(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(3) >= 0.0, "mad >= 0")
      assert(r.getLong(4) <= r.getLong(1), "outliers <= n")
    }
  }

  test("q169/q170 stay shuffle-free before the output sort") {
    for (q <- Seq(Multimodal.q169FrameSample _, Multimodal.q170AudioFeatures _)) {
      val plan = q(spark, dir).queryExecution.executedPlan.toString
      val exchanges = "Exchange".r.findAllIn(plan).length -
        "BroadcastExchange".r.findAllIn(plan).length
      assert(exchanges <= 1, s"expected only the sort exchange:\n$plan")
    }
  }
}
