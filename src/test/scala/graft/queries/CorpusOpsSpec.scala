package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Behavioral specs for the round-7 corpus-operator additions:
  * SemDeDup apply (q186), sorted-neighborhood blocking (q187), int8
  * quantization audit (q188), BPE merge statistics (q189),
  * hard-negative mining (q190), and source-level MinHash Jaccard
  * (q191). Each is checked against either an independent in-memory
  * recomputation or its defining algebraic invariants — never against
  * the engine's own arithmetic.
  */
class CorpusOpsSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  // ------------------------------------------------------------ q186
  test("q186 semdedup accounting reconciles with the q39 pair audit") {
    val out = Similarity.q186SemDedup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val corpus = graft.core.Tables.load(spark, dir, "embeddings").count()
    assert(out.map(_._2).sum === corpus, "every vector in exactly one cell")
    out.foreach { case (cell, members, killed, survivors) =>
      assert(members === killed + survivors, s"cell $cell attrition")
      assert(survivors >= 1, s"cell $cell keeps its min-id representative")
    }
    // the kill list IS the distinct higher-id side of q39's pair audit
    // (same cells, same tau) — the apply step must agree with the audit
    val killedFromPairs = Similarity.qCellNearDup(spark, dir)
      .select(col("d2")).distinct().count()
    assert(out.map(_._3).sum === killedFromPairs,
      "apply kill count == audit distinct d2")
  }

  // ------------------------------------------------------------ q187
  test("q187 sorted-neighborhood matches a brute in-memory recompute") {
    val got = Integrity.q187SortedNeighborhood(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    val docs = graft.core.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getString(2).take(Integrity.SnmPrefixLen)))
    val expected = docs.groupBy(_._2).toSeq.flatMap { case (lang, ds) =>
      val sorted = ds.sortBy(d => (d._3, d._1))
      sorted.indices.flatMap { i =>
        ((i + 1) to math.min(i + Integrity.SnmWindow, sorted.length - 1))
          .flatMap { j =>
            val l = lev(sorted(i)._3, sorted(j)._3)
            if (l <= Integrity.SnmMaxLev)
              Some((lang, sorted(i)._1, sorted(j)._1, l))
            else None
          }
      }
    }.sortBy(t => (t._1, t._2, t._3))
    assert(got.toSeq.sortBy(t => (t._1, t._2, t._3)) === expected)
  }

  test("q187 candidate volume is O(N*w), never quadratic") {
    val n = graft.core.Tables.load(spark, dir, "documents").count()
    val pairs = Integrity.q187SortedNeighborhood(spark, dir).count()
    assert(pairs <= n * Integrity.SnmWindow, "window bounds candidates")
  }

  // ------------------------------------------------------------ q188
  test("q188 int8 codes reconstruct within the quantization step") {
    val out = Similarity.q188Int8Quant(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    val corpus = graft.core.Tables.load(spark, dir, "embeddings").count()
    assert(out.length === 64, "one row per dimension")
    out.foreach { case (p, n, qmn, qmx, sumCode, maxErr, sumErr) =>
      assert(n === corpus, s"dim $p covers the corpus")
      assert(qmx >= qmn, s"dim $p range")
      val step = (qmx - qmn) / 255L
      assert(maxErr <= step + 1L,
        s"dim $p reconstruction error bounded by one quantization step")
      assert(sumErr <= (step + 1L) * n, s"dim $p total error bound")
      assert(sumCode >= 0L && sumCode <= 255L * n, s"dim $p code range")
    }
  }

  // ------------------------------------------------------------ q189
  test("q189 BPE merge stats match a brute in-memory recompute") {
    val got = TextAnalysis.q189BpeMergeStats(spark, dir).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getLong(3)))
    val docs = graft.core.Tables.load(spark, dir, "documents")
      .select(col("lang"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val counts = docs.flatMap { case (lang, text) =>
      text.split(" ", -1).flatMap(t =>
        if (t.length >= 2) (0 until t.length - 1).map(i =>
          (lang, t.substring(i, i + 2)))
        else Nil)
    }.groupBy(identity).map { case (k, v) => (k._1, k._2, v.length.toLong) }
    val expected = counts.groupBy(_._1).toSeq.flatMap { case (lang, cs) =>
      cs.toSeq.sortBy(c => (-c._3, c._2)).take(TextAnalysis.BpeTopK)
        .zipWithIndex.map { case ((_, pair, cnt), i) =>
          (lang, i + 1, pair, cnt)
        }
    }.sortBy(t => (t._1, t._2))
    assert(got.toSeq.sortBy(t => (t._1, t._2)) === expected)
  }

  // ------------------------------------------------------------ q244
  test("q244 BPE trainer merge sequence matches a brute in-memory recompute") {
    val got = TextAnalysis.q244BpeTrainer(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    // brute recompute with the SAME pinned convention: word-frequency
    // vocab, (count DESC, pair ASC) argmax, two-pass padded replace
    var vocab: Map[String, Long] = graft.core.Tables
      .load(spark, dir, "documents")
      .select(col("text")).collect().map(_.getString(0))
      .flatMap(_.split(" ", -1)).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, ws) =>
        w.toCharArray.mkString(" ") -> ws.length.toLong
      }
    def tokens(v: Map[String, Long]): Long =
      v.map { case (sym, c) => c * sym.split(" ", -1).length }.sum
    val tokens0 = tokens(vocab)
    val expected = (1 to TextAnalysis.BpeTrainRounds).map { r =>
      val counts = scala.collection.mutable.Map.empty[String, Long]
        .withDefaultValue(0L)
      vocab.foreach { case (sym, c) =>
        val a = sym.split(" ", -1)
        (0 until a.length - 1).foreach(i =>
          counts(a(i) + " " + a(i + 1)) += c)
      }
      val (pair, pc) = counts.toSeq.minBy { case (p, c) => (-c, p) }
      val merged = pair.replace(" ", "")
      vocab = vocab.toSeq.map { case (sym, c) =>
        (" " + sym + " ")
          .replace(" " + pair + " ", " " + merged + " ")
          .replace(" " + pair + " ", " " + merged + " ")
          .trim -> c
      }.groupBy(_._1).map { case (sym, xs) => sym -> xs.map(_._2).sum }
      val toks = tokens(vocab)
      (r.toLong, pair, pc, toks, toks.toDouble / tokens0.toDouble)
    }
    assert(got.toSeq === expected)
    // each merge strictly shrinks the corpus; ratios are decreasing
    assert(got.map(_._4).toSeq === got.map(_._4).sorted.reverse.toSeq)
    assert(got.last._5 < 1.0)
  }

  // ------------------------------------------------------------ q277
  test("q277 BPE apply reconciles with q244's final-round totals") {
    val apply = TextAnalysis.q277BpeApply(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getLong(5)))
    val train = TextAnalysis.q244BpeTrainer(spark, dir).collect()
    // the per-source application of the learned merges must tile the
    // trainer's own global accounting: Σ tokens_bpe == round-6
    // tokens_after, Σ tokens_char == the trainer's round-0 baseline
    // (recoverable as tokens_after / compression at any round)
    val finalRow = train.last
    assert(apply.map(_._4).sum === finalRow.getLong(3), "tokens_after")
    val tokens0 =
      math.round(finalRow.getLong(3).toDouble / finalRow.getDouble(4))
    assert(apply.map(_._3).sum === tokens0, "char-token baseline")
    // compression strictly < 1 for every source (six merges always
    // fire somewhere in each source's vocab on this corpus), and the
    // q51 regex count rides along as a sanity-scale reference
    apply.foreach { case (src, words, chars, bpe, comp, regex) =>
      assert(comp < 1.0 && comp > 0.0, src)
      assert(bpe < chars, src)
      assert(words > 0 && regex > 0, src)
    }
  }

  test("BPE merge artifact: warm dir performs zero training actions " +
      "and serves identical results") {
    // prime the managed per-dir artifact (either consumer trains it)
    val first = TextAnalysis.q244BpeTrainer(spark, dir).collect()
    val before = TextAnalysis.bpeTrainActions.get()
    // warm-dir consumption: BOTH q244 and q277 must perform zero
    // training driver actions (no argmax heads, no token-total folds)
    val again = TextAnalysis.q244BpeTrainer(spark, dir).collect()
    val apply = TextAnalysis.q277BpeApply(spark, dir).collect()
    assert(TextAnalysis.bpeTrainActions.get() === before,
      "warm-dir consumers must not re-train the merge list")
    // cache-hit equivalence: the served artifact is the trained one
    assert(again.map(_.toSeq).toSeq === first.map(_.toSeq).toSeq)
    assert(apply.nonEmpty)
  }

  test("BPE artifact: a corpus regenerated in place retrains " +
      "(fingerprint-keyed vocab)") {
    // The staleness contract: the vocab cache keys on
    // PlanMemo.fingerprint(dir), so rewriting the corpus AT THE SAME
    // PATH must invalidate vocab AND (via the vocab-instance key)
    // the trained merge artifact — stale merges are never served.
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("bpe_fp").toString
    def write(texts: Seq[String]): Unit =
      texts.zipWithIndex.map { case (t, i) =>
        (i.toLong, t, "en", "src", t.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .coalesce(1).write.mode("overwrite")
        .parquet(s"$tmp/documents.parquet")
    write(Seq("alphabeta alphabeta gammadelta",
      "alphabeta gammadelta gammadelta"))
    val first = TextAnalysis.q244BpeTrainer(spark, tmp).collect()
    val warm = TextAnalysis.bpeTrainActions.get()
    TextAnalysis.q244BpeTrainer(spark, tmp).collect()
    assert(TextAnalysis.bpeTrainActions.get() === warm,
      "unchanged dir must stay warm")
    Thread.sleep(1100) // distinct child mtimes across the rewrite
    write(Seq("omicronsigma omicronsigma epsilonzeta",
      "omicronsigma epsilonzeta epsilonzeta"))
    val after = TextAnalysis.q244BpeTrainer(spark, tmp).collect()
    assert(TextAnalysis.bpeTrainActions.get() > warm,
      "in-place corpus rewrite must retrain the merge artifact")
    assert(after.map(_.getString(1)).toSeq !==
      first.map(_.getString(1)).toSeq,
      "retrained merges must reflect the new corpus")
  }

  // ------------------------------------------------------------ q246
  test("q246 packing audit matches a brute in-memory concat-and-chunk") {
    val W = TextAnalysis.PackWindow
    val got = TextAnalysis.q246PackingAudit(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6), r.getDouble(7)))
    val docsRows = graft.core.Tables.load(spark, dir, "documents")
      .select(col("source"), col("doc_id"), col("text")).collect()
      .map(r => (r.getString(0), r.getLong(1),
        r.getString(2).split(" ", -1).length.toLong))
    val expected = docsRows.groupBy(_._1).toSeq.map { case (src, ds) =>
      val ordered = ds.sortBy(_._2).map(_._3)
      val offsets = ordered.scanLeft(0L)(_ + _)
      val spans = ordered.zip(offsets).map { case (n, off) =>
        (off + n - 1) / W - off / W + 1 }
      val total = ordered.sum
      val nWin = (total + W - 1) / W
      val tail = if (total % W == 0) W else total % W
      (src, ordered.length.toLong, total, nWin,
        spans.count(_ > 1).toLong,
        spans.count(_ > 1).toDouble / ordered.length,
        spans.sum.toDouble / nWin, tail.toDouble / W)
    }.sortBy(_._1)
    assert(got.toSeq === expected)
    // every window is touched by at least one doc; splits only exist
    // where docs are longer than the residual window space
    got.foreach { g => assert(g._7 >= 1.0, s"${g._1} docs_per_window") }
  }

  // ------------------------------------------------------------ q245
  test("q245 nDCG@5 / MRR match a brute in-memory recompute") {
    val got = Similarity.q245RankMetrics(spark, dir).head()
    val truth = Similarity.qKnnBrute(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val sys = Similarity.qKnnIvf(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    def q6(x: Double): Long =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .*(BigDecimal(1000000)).toLongExact
    val rel = truth.map { case (q, c, rn) => (q, c) -> (6L - rn) }.toMap
    val qids = sys.map(_._1).distinct.sorted
    val perQ = qids.map { q =>
      val list = sys.filter(_._1 == q).sortBy(_._3)
      val dcgUs = list.map { case (_, c, rn) =>
        q6(rel.getOrElse((q, c), 0L).toDouble /
          (math.log(rn + 1.0) / math.log(2.0)))
      }.sum
      val idcgUs = truth.filter(_._1 == q).map { case (_, _, rn) =>
        q6((6L - rn).toDouble / (math.log(rn + 1.0) / math.log(2.0)))
      }.sum
      val firstRel = list.collectFirst {
        case (_, c, rn) if rel.contains((q, c)) => rn }
      val rrUs = firstRel.map(r => q6(1.0 / r)).getOrElse(0L)
      (q6(dcgUs.toDouble / idcgUs.toDouble), rrUs)
    }
    val n = qids.length
    assert(got.getLong(0) === n.toLong)
    assert(got.getDouble(1) === perQ.map(_._2).sum.toDouble / 1e6 / n, "mrr")
    assert(got.getDouble(2) === perQ.map(_._1).sum.toDouble / 1e6 / n, "ndcg")
    // sanity: metrics live in (0, 1]; the IVF index recalls some but
    // not all of the true top-5 on this fixture (q93's pinned floor)
    assert(got.getDouble(2) > 0.0 && got.getDouble(2) < 1.0)
    assert(got.getDouble(1) > 0.0 && got.getDouble(1) <= 1.0)
  }

  // ------------------------------------------------------------ q190
  test("q190 hard negatives exclude the query label and rank correctly") {
    val neg = Similarity.q190HardNegatives(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3),
        r.getDouble(4)))
    val labels = graft.core.Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    neg.groupBy(_._1).foreach { case (qid, rows) =>
      rows.foreach { case (_, cid, clabel, _, _) =>
        assert(clabel === labels(cid), "emitted label is the candidate's")
        assert(clabel !== labels(qid), s"q$qid negative shares its label")
      }
      val byRank = rows.sortBy(_._4).map(_._5)
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b },
        s"q$qid cosine non-increasing in rank")
    }
    // negatives are a filtered candidate set: their best cosine can
    // never beat the unfiltered brute top-1 for the same query
    val brute = Similarity.qKnnBrute(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(2), r.getDouble(3)))
      .filter(_._2 == 1).map(t => t._1 -> t._3).toMap
    neg.filter(_._4 == 1).foreach { case (qid, _, _, _, c) =>
      assert(c <= brute(qid) + 1e-12, s"q$qid negative top-1 vs brute top-1")
    }
  }

  // ------------------------------------------------------------ q192
  test("q192 k-anonymity matches a brute in-memory recompute") {
    val got = Curation.q192KAnonymity(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val docs = graft.core.Tables.load(spark, dir, "documents")
      .select(col("source"), col("lang"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val classes = docs.groupBy(d =>
      (d._1, d._2, d._3 / Curation.KAnonLenBucket)).map(_._2.length.toLong)
      .toSeq
    val expected = docs.map(_._1).distinct.sorted.map { src =>
      val cs = docs.filter(_._1 == src)
        .groupBy(d => (d._2, d._3 / Curation.KAnonLenBucket))
        .map(_._2.length.toLong).toSeq
      (src, cs.sum, cs.length.toLong,
        cs.count(_ < Curation.KAnonK).toLong,
        cs.filter(_ < Curation.KAnonK).sum, cs.min)
    }
    assert(got.toSeq === expected)
    assert(classes.sum === docs.length.toLong)
  }

  // ------------------------------------------------------------ q194
  test("q194 Hamilton apportionment: quotas sum exactly to the budget") {
    val out = Curation.q194BudgetApportion(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    val budget = out.head._3
    assert(out.forall(_._3 == budget), "one global budget")
    assert(out.map(_._7).sum === budget, "largest-remainder exactness")
    out.foreach { case (src, mass, b, floorQ, rem, _, quota) =>
      assert(quota == floorQ || quota == floorQ + 1, s"$src quota step")
      assert(rem < out.map(_._2).sum, s"$src remainder < total")
      // floor share never exceeds the ideal real share
      assert(BigInt(floorQ) * out.map(_._2).sum <= BigInt(mass) * b,
        s"$src floor bound")
    }
    // the +1 tokens go to the LARGEST remainders
    val leftover = budget - out.map(_._4).sum
    val bumped = out.filter(t => t._7 == t._4 + 1)
    assert(bumped.length.toLong === leftover)
    val minBumpedRem = if (bumped.isEmpty) Long.MaxValue else bumped.map(_._5).min
    out.filter(t => t._7 == t._4).foreach { t =>
      assert(t._5 <= minBumpedRem, s"${t._1} skipped despite larger remainder")
    }
  }

  // ------------------------------------------------------------ q193
  test("q193 streaming near-dedup equals the batch band-collision rule") {
    val got = StreamingQueries.q193StreamNearDup(spark, dir).collect()
      .map(_.getLong(0)).toSet
    val docs = graft.core.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def simhash(text: String): Long = {
      val toks = text.split(" ", -1)
      if (toks.length < 3) return -1L
      val sh = (0 to toks.length - 3).map { i =>
        val g = toks.slice(i, i + 3).mkString(" ")
        val hex = java.security.MessageDigest.getInstance("MD5")
          .digest(g.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.take(15)
        java.lang.Long.parseLong(hex, 16)
      }.distinct
      (0 until Dedup.SimhashBits).foldLeft(0L) { (acc, j) =>
        val vote = sh.map(h => if (((h >> j) & 1L) == 1L) 1 else -1).sum
        if (vote >= 0) acc | (1L << j) else acc
      }
    }
    val sims = docs.map { case (id, t) => (id, simhash(t)) }
    val bands = sims.filter(_._2 >= 0L).flatMap { case (id, sm) =>
      (0 until Dedup.SimhashNumBands).map(b =>
        ((b, (sm >> (b * Dedup.SimhashBandBits)) &
          ((1L << Dedup.SimhashBandBits) - 1)), id))
    }
    val minPerBand = bands.groupBy(_._1).map { case (k, v) =>
      k -> v.map(_._2).min
    }
    val killed = bands.filter { case (k, id) => minPerBand(k) < id }
      .map(_._2).toSet
    val expected = docs.map(_._1).filterNot(killed).toSet
    assert(got === expected)
  }

  // ------------------------------------------------------------ q191
  test("q191 source Jaccard: set algebra + an independent exact pair") {
    val out = Dedup.q191SourceJaccard(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6), r.getLong(7),
        r.getDouble(8)))
    assert(out.nonEmpty)
    out.foreach { case (s1, s2, n1, n2, inter, union, jac, mh, est) =>
      assert(inter <= math.min(n1, n2), s"$s1/$s2 intersection bound")
      assert(union === n1 + n2 - inter, s"$s1/$s2 inclusion-exclusion")
      assert(jac >= 0.0 && jac <= 1.0, s"$s1/$s2 exact jaccard range")
      assert(mh >= 0L && mh <= Dedup.NumHashes.toLong, s"$s1/$s2 matches")
      assert(est === mh.toDouble / Dedup.NumHashes, s"$s1/$s2 estimate")
    }
    // independent exact recompute of one pair's shingle-set Jaccard
    val (s1, s2) = (out.head._1, out.head._2)
    val docs = graft.core.Tables.load(spark, dir, "documents")
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    def shingleSet(src: String): Set[String] = docs.filter(_._1 == src)
      .flatMap { case (_, t) =>
        val toks = t.split(" ", -1)
        if (toks.length >= 3) (0 to toks.length - 3)
          .map(i => toks.slice(i, i + 3).mkString(" "))
        else Nil
      }.toSet
    val (a, b) = (shingleSet(s1), shingleSet(s2))
    // md5-hashed cardinalities equal raw-set cardinalities bar collisions
    assert(out.head._3 === a.size.toLong, s"$s1 shingle count")
    assert(out.head._4 === b.size.toLong, s"$s2 shingle count")
    assert(out.head._5 === a.intersect(b).size.toLong, s"$s1/$s2 intersection")
  }

  // ------------------------------------------------------------ q196
  test("q196 temperature mix: sqrt-law weights, unit mass, epoch math") {
    val out = Curation.q196TemperatureMix(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
    assert(out.nonEmpty)
    val totalTokens = out.map(_._3).sum
    out.foreach { case (src, nDocs, nTok, p, w, epochs) =>
      assert(nDocs > 0 && nTok > 0, s"$src non-empty")
      assert(p === nTok.toDouble / totalTokens.toDouble, s"$src share")
      assert(w > 0.0 && w < 1.0, s"$src weight range")
      // epochs is exactly weight*budget/tokens in double arithmetic
      assert(epochs === w * Curation.TempMixBudget.toDouble / nTok.toDouble,
        s"$src epochs formula")
    }
    assert(math.abs(out.map(_._5).sum - 1.0) < 1e-9, "weights sum to 1")
    assert(math.abs(out.map(_._4).sum - 1.0) < 1e-12, "shares sum to 1")
    // alpha = 1/2: pairwise weight ratios follow sqrt of share ratios
    // (6-dp decimal quantization of sqrt(p) bounds the relative error)
    for (Seq(a, b) <- out.toSeq.combinations(2)) {
      val expect = math.sqrt(a._4 / b._4)
      assert(math.abs(a._5 / b._5 - expect) < 1e-4,
        s"${a._1}/${b._1} sqrt law")
    }
    // temperature < 1 compresses the mix: the relative boost w/p is
    // strictly decreasing in share (w/p ∝ 1/sqrt(p)), so smaller
    // sources always get a larger multiplier than bigger ones
    val boosts = out.sortBy(_._4).map(t => t._5 / t._4)
    boosts.sliding(2).foreach {
      case Array(hi, lo) => assert(hi >= lo * (1.0 - 1e-6), "boost monotone")
      case _ =>
    }
  }

  // ------------------------------------------------------------ q197
  test("q197 LSH P/R curve: counts, rates, and the theoretical S-curve") {
    val out = Dedup.q197LshPrCurve(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4)))
    assert(out.nonEmpty)
    out.foreach { case (bucket, nPairs, nHits, hitRate, expected) =>
      assert(bucket >= 0L && bucket <= 9L, s"bucket $bucket range")
      assert(nPairs > 0L, s"bucket $bucket populated")
      assert(nHits >= 0L && nHits <= nPairs, s"bucket $bucket hit bound")
      assert(hitRate === nHits.toDouble / nPairs.toDouble,
        s"bucket $bucket rate")
      // the engine's interpolated constant IS the closed-form S-curve
      val m = (bucket + 0.5) / 10.0
      val s = 1.0 - math.pow(1.0 - math.pow(m, Dedup.BandSize.toDouble),
        Dedup.NumBands.toDouble)
      assert(expected === s, s"bucket $bucket S-curve constant")
    }
    // the theoretical curve is strictly increasing in similarity
    val sorted = out.sortBy(_._1)
    sorted.sliding(2).foreach {
      case Array(lo, hi) => assert(lo._5 < hi._5, "S-curve monotone")
      case _ =>
    }
    // a perfect-duplicate pair (identical shingle sets ⇒ identical
    // signatures) must always collide: top bucket, if populated at
    // Jaccard 1.0 only, cannot have hit_rate < 1 for those pairs —
    // checked via the exact-Jaccard recompute on the engine's own
    // candidate universe being consistent with at least the top decile
    // never scoring below the theoretical floor by more than sampling
    // noise allows on >= 30 pairs
    sorted.lastOption.foreach { case (b, n, _, rate, expected) =>
      if (b == 9L && n >= 30L)
        assert(rate >= expected - 3.0 * math.sqrt(expected / n),
          "top decile within sampling noise of the S-curve")
    }
  }

  // ------------------------------------------------------------ q198
  test("q198 AUC equals an independent rank-based recompute") {
    val Array(row) = Curation.q198ScoreAuc(spark, dir).collect()
    val (nPos, nNeg, auc) = (row.getLong(0), row.getLong(1), row.getDouble(2))
    // independent AUC: per-row scores from the oracle-checked q97
    // output joined to the langid label, tie-aware average ranks
    val scores = Curation.q97ModelScore(spark, dir)
      .select(col("doc_id"), col("logit")).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap
    val labels = graft.core.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("lang")).collect()
      .map(r => (r.getLong(0), r.getString(1) == "en"))
    val ranked = labels.map { case (id, pos) => (scores(id), pos) }
      .sortBy(_._1).zipWithIndex
    val avgRank = ranked.groupBy(_._1._1).toSeq.flatMap { case (_, g) =>
      val mean = g.map(_._2 + 1).sum.toDouble / g.length
      g.map(x => (x._1._2, mean))
    }
    val p = labels.count(_._2).toLong
    val n = labels.length - p
    assert(nPos === p && nNeg === n, "class counts")
    val expected =
      (avgRank.filter(_._1).map(_._2).sum - p.toDouble * (p + 1) / 2.0) /
        (p.toDouble * n.toDouble)
    assert(math.abs(auc - expected) < 1e-12, s"auc $auc vs $expected")
    // the synthetic corpus draws all langs from the same generator, so
    // the EN-stopword logit barely separates (AUC ≈ 0.44 at sf0.001) —
    // the operator under test is the tie-aware AUC computation itself
    assert(auc > 0.0 && auc < 1.0, "AUC strictly inside (0,1)")
  }

  // ------------------------------------------------------------ q256
  test("q256 blocking audit reconciles SNM candidates with LSH truth") {
    val Array(row) = Dedup.q256BlockingAudit(spark, dir).collect()
    val (nDocs, nTotal, nCand, nTruth, nCaught, rr, pc, pq) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3),
        row.getLong(4), row.getDouble(5), row.getDouble(6), row.getDouble(7))
    // in-memory SNM candidate set (the q187 blocking without verify)
    val d = graft.core.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getString(2).take(Integrity.SnmPrefixLen)))
    val cand = d.groupBy(_._2).values.flatMap { g =>
      val sorted = g.sortBy(x => (x._3, x._1)).map(_._1)
      sorted.indices.flatMap { i =>
        (math.max(0, i - Integrity.SnmWindow) until i).map { j =>
          val (a, b) = (sorted(j), sorted(i))
          (math.min(a, b), math.max(a, b))
        }
      }
    }.toSet
    val truth = Dedup.qMinhashPairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(nDocs === d.length.toLong)
    assert(nTotal === nDocs * (nDocs - 1) / 2)
    assert(nCand === cand.size.toLong, "SNM candidate volume")
    assert(nTruth === truth.size.toLong)
    assert(nCaught === truth.count(cand.contains).toLong)
    assert(rr === 1.0 - nCand.toDouble / nTotal)
    assert(pc === nCaught.toDouble / nTruth)
    assert(pq === nCaught.toDouble / nCand)
    // the whole point of blocking: far below all-pairs
    assert(rr > 0.9, s"reduction ratio $rr not sub-quadratic")
  }

  // ------------------------------------------------------------ q255
  test("q255 average precision matches a per-row sweep recompute") {
    val Array(row) = Curation.q255AvgPrecision(spark, dir).collect()
    val (nPos, nNeg, ap, prev) = (row.getLong(0), row.getLong(1),
      row.getDouble(2), row.getDouble(3))
    val scores = Curation.q97ModelScore(spark, dir)
      .select(col("doc_id"), col("logit")).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap
    val labeled = graft.core.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("lang")).collect()
      .map(r => (scores(r.getLong(0)), r.getString(1) == "en"))
    val p = labeled.count(_._2).toLong
    val n = labeled.length - p
    assert(nPos === p && nNeg === n)
    assert(math.abs(prev - p.toDouble / (p + n)) < 1e-15)
    // descending tie groups; each term quantized to 6 dp like dsum
    def q6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val groups = labeled.groupBy(_._1).toSeq.sortBy(-_._1)
    var (ctp, cfp) = (0L, 0L)
    var expAp = BigDecimal(0)
    groups.foreach { case (_, g) =>
      val tp = g.count(_._2).toLong
      ctp += tp; cfp += g.length - tp
      expAp += q6(tp.toDouble * ctp / (p.toDouble * (ctp + cfp)))
    }
    assert(ap === expAp.toDouble, s"ap $ap vs $expAp")
    // AP of a useful score beats nothing structural, but must be a
    // probability and the sweep must end at recall 1
    assert(ap >= 0.0 && ap <= 1.0)
    assert(ctp === p && cfp === n)
  }

  // ------------------------------------------------------------ q259
  test("q259 optimal-F1 threshold matches an exhaustive sweep") {
    val Array(row) = Curation.q259OptimalF1(spark, dir).collect()
    val (thr, tp, fp, fn, prec, rec, f1) = (row.getDouble(0), row.getLong(1),
      row.getLong(2), row.getLong(3), row.getDouble(4), row.getDouble(5),
      row.getDouble(6))
    val scores = Curation.q97ModelScore(spark, dir)
      .select(col("doc_id"), col("logit")).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap
    val labeled = graft.core.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("lang")).collect()
      .map(r => (scores(r.getLong(0)), r.getString(1) == "en"))
    val p = labeled.count(_._2).toLong
    val cands = labeled.map(_._1).distinct.map { t =>
      val etp = labeled.count(x => x._1 >= t && x._2).toLong
      val efp = labeled.count(x => x._1 >= t && !x._2).toLong
      (etp * 2.0 / (etp * 2 + efp + (p - etp)).toDouble, t, etp, efp)
    }
    val best = cands.maxBy(c => (c._1, c._2))
    assert(thr === best._2 && tp === best._3 && fp === best._4)
    assert(fn === p - best._3)
    assert(f1 === best._1)
    assert(math.abs(prec - tp.toDouble / (tp + fp)) < 1e-15)
    assert(math.abs(rec - tp.toDouble / p) < 1e-15)
    // the cut must be meaningful: it keeps something and drops something
    assert(tp + fp > 0L && fn + (labeled.length - p - fp) >= 0L)
  }

  // ------------------------------------------------------------ q250
  test("q250 ECE/Brier match an integer-exact in-memory recompute") {
    val got = Curation.q250Calibration(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
    val scores = Curation.q97ModelScore(spark, dir)
      .select(col("doc_id"), col("logit")).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap
    val rows = graft.core.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("lang")).collect()
      .map { r =>
        val pUs = math.min(math.max(
          math.round((scores(r.getLong(0)) + 4.0) * 125000.0), 0L), 1000000L)
        val y = if (r.getString(1) == "en") 1L else 0L
        (math.min(pUs * 10L / 1000000L, 9L), pUs, y)
      }
    val n = rows.length.toLong
    val bins = rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (b, g) =>
      (b, g.length.toLong,
        g.map(_._2).sum.toDouble / (g.length * 1e6),
        g.map(_._3).sum.toDouble / g.length)
    }
    val ece = rows.groupBy(_._1).values
      .map(g => math.abs(g.map(_._3).sum * 1000000L - g.map(_._2).sum))
      .sum.toDouble / (n * 1e6)
    val brier = rows.map { case (_, p, y) =>
      val d = p - y * 1000000L; BigInt(d) * BigInt(d)
    }.sum.toDouble / (n * 1e12)
    assert(got.map(t => (t._1, t._2, t._3, t._4)).toSeq === bins)
    got.foreach { t =>
      assert(t._5 === ece, s"ece ${t._5} vs $ece")
      assert(t._6 === brier, s"brier ${t._6} vs $brier")
    }
    // calibration sanity: ECE and Brier both live in [0, 1]
    assert(ece >= 0.0 && ece <= 1.0 && brier >= 0.0 && brier <= 1.0)
  }

  // ------------------------------------------------------------ q251
  test("q251 Mann-Whitney matches a midrank-based recompute") {
    val Array(row) = Curation.q251MannWhitney(spark, dir).collect()
    val (n1, n2, u1, z, rb) = (row.getLong(2), row.getLong(3),
      row.getDouble(4), row.getDouble(5), row.getDouble(6))
    val scores = Curation.q97ModelScore(spark, dir)
      .select(col("doc_id"), col("logit")).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap
    val pooled = graft.core.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("source")).collect()
      .map(r => (r.getString(1), scores(r.getLong(0))))
      .filter(t => t._1 == Curation.MwuSourceA || t._1 == Curation.MwuSourceB)
    // classic midrank recompute: sort pooled, average ranks over ties
    val sorted = pooled.sortBy(_._2).zipWithIndex
    val midrank = sorted.groupBy(_._1._2).values.flatMap { g =>
      val m = g.map(_._2 + 1).sum.toDouble / g.length
      g.map(x => (x._1._1, m))
    }.toSeq
    val en1 = pooled.count(_._1 == Curation.MwuSourceA).toLong
    val en2 = pooled.length - en1
    val r1 = midrank.filter(_._1 == Curation.MwuSourceA).map(_._2).sum
    val eu1 = r1 - en1.toDouble * (en1 + 1) / 2.0
    val nn = en1 + en2
    val tcorr = pooled.groupBy(_._2).values
      .map(g => { val t = g.length.toLong; t * t * t - t }).sum
    val sigma = math.sqrt(en1.toDouble * en2 / 12.0 *
      ((nn + 1).toDouble - tcorr.toDouble / (nn.toDouble * (nn - 1))))
    assert(n1 === en1 && n2 === en2)
    assert(math.abs(u1 - eu1) < 1e-9, s"u1 $u1 vs $eu1")
    assert(math.abs(z - (eu1 - en1.toDouble * en2 / 2.0) / sigma) < 1e-9)
    assert(math.abs(rb - (1.0 - 2.0 * eu1 / (en1.toDouble * en2))) < 1e-12)
    // U is bounded by n1*n2; the effect size by [-1, 1]
    assert(u1 >= 0.0 && u1 <= (en1 * en2).toDouble)
    assert(rb >= -1.0 && rb <= 1.0)
  }

  // ------------------------------------------------------------ q199
  test("q199 length buckets match an in-memory padding recompute") {
    val got = Curation.q199LengthBuckets(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    val caps = Curation.LengthBucketCaps.map(_.toLong)
    val lens = graft.core.Tables.load(spark, dir, "documents")
      .select(col("text")).collect()
      .map(r => math.min(r.getString(0).split(" ", -1).length.toLong,
        caps.last))
    val expected = lens.groupBy(n => caps.find(n <= _).getOrElse(caps.last))
      .toSeq.sortBy(_._1)
      .map { case (cap, ls) =>
        val real = ls.sum
        val padded = ls.length * cap
        (cap, ls.length.toLong, real, padded,
          1.0 - real.toDouble / padded.toDouble)
      }
    assert(got.toSeq === expected)
    assert(got.map(_._2).sum === lens.length.toLong, "every doc bucketed")
  }

  // ------------------------------------------------------------ q200
  test("q200 bigram cross-entropy matches a BigDecimal recompute") {
    val got = Curation.q200BigramXent(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toSeq
    val texts = graft.core.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1).toSeq))
    val allBigrams = texts.flatMap { case (_, t) => t.sliding(2).filter(_.length == 2).map(_.mkString(" ")) }
    val c12 = allBigrams.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val c1 = texts.flatMap { case (_, t) => t.dropRight(1) }
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val v = texts.flatMap(_._2).distinct.length.toLong
    val expected = texts.filter(_._2.length >= 2).map { case (id, t) =>
      val terms = t.sliding(2).filter(_.length == 2).map { bg =>
        val p = (c12(bg.mkString(" ")) + 1).toDouble / (c1(bg.head) + v).toDouble
        BigDecimal(math.log(p)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      }.toSeq
      val nll = -terms.sum.setScale(4, BigDecimal.RoundingMode.HALF_UP)
        .toDouble
      (id, t.length.toLong - 1, nll, nll / (t.length - 1).toDouble)
    }.sortBy(_._1)
    assert(got === expected)
  }

  // ------------------------------------------------------------ q201
  test("q201 split contamination reconciles with the q107 split") {
    val Array(row) = Dedup.q201SplitContam(spark, dir).collect()
    val (nTest, nContam, nShared, rate) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getDouble(3))
    val split = Curation.q107LeakSplit(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(2)))
    val testIds = split.filter(_._2 == "test").map(_._1).toSet
    assert(nTest === testIds.size.toLong, "test side matches q107's split")
    assert(nContam >= 0L && nContam <= nTest, "contam bound")
    assert(nShared >= nContam || nContam == 0L,
      "each contaminated doc has at least one shared shingle")
    assert(rate === nContam.toDouble / nTest.toDouble, "rate formula")
  }

  // ------------------------------------------------------------ q203
  test("q203 Fisher ratios match an in-memory ANOVA recompute") {
    val got = Similarity.q203FisherSep(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
    val rows = graft.core.Tables.load(spark, dir, "embeddings")
      .select(col("label"), col("embedding")).collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).map(_.toDouble)))
    val dim = rows.head._2.length
    got.foreach { case (p, n, nc, wv, bv, f) =>
      assert(p >= 0 && p < dim)
      assert(n === rows.length.toLong, s"dim $p population")
      assert(nc === rows.map(_._1).distinct.length.toLong, s"dim $p classes")
      assert(wv > 0.0 && bv >= 0.0 && f >= 0.0, s"dim $p variance signs")
      // independent one-way ANOVA on raw doubles (no quantization):
      // agreement within the 6-dp noise floor of the decimal pipeline
      val vs = rows.map { case (l, e) => (l, e(p)) }
      val grand = vs.map(_._2).sum / vs.length
      val byClass = vs.groupBy(_._1).values.toSeq
      val within = byClass.map(g => {
        val m = g.map(_._2).sum / g.length
        g.map(x => (x._2 - m) * (x._2 - m)).sum
      }).sum / (vs.length - byClass.length)
      val between = byClass.map(g => {
        val m = g.map(_._2).sum / g.length
        g.length * (m - grand) * (m - grand)
      }).sum / (byClass.length - 1)
      assert(math.abs(wv - within) < 1e-4, s"dim $p within $wv vs $within")
      assert(math.abs(bv - between) < 1e-4, s"dim $p between $bv vs $between")
      assert(math.abs(f - between / within) < 1e-3, s"dim $p fisher")
    }
    assert(got.length === dim, "one row per dimension")
  }

  // ------------------------------------------------------------ q204
  test("q204 Zipf slope matches an in-memory OLS on the same top-k") {
    val Array(row) = TextAnalysis.q204ZipfSlope(spark, dir).collect()
    val (k, slope, intercept) =
      (row.getLong(0), row.getDouble(1), row.getDouble(2))
    assert(slope < 0.0, "rank-frequency must decay")
    val freqs = graft.core.Tables.load(spark, dir, "documents")
      .select(col("text")).collect()
      .flatMap(_.getString(0).split(" ", -1)).filter(_.nonEmpty)
      .groupBy(identity).map { case (t, a) => (t, a.length.toLong) }.toSeq
      .sortBy { case (t, f) => (-f, t) }.take(TextAnalysis.ZipfK)
    // the fixture vocabulary can be smaller than K at tiny SF — the
    // cut is then the whole vocabulary, exactly as the engine sees it
    assert(k === freqs.length.toLong, "k covers the available top-k")
    val xy = freqs.zipWithIndex.map { case ((_, f), i) =>
      (math.log((i + 1).toDouble), math.log(f.toDouble))
    }
    val n = xy.length.toDouble
    val (sx, sy) = (xy.map(_._1).sum, xy.map(_._2).sum)
    val sxy = xy.map(p => p._1 * p._2).sum
    val sxx = xy.map(p => p._1 * p._1).sum
    val expSlope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val expIcpt = (sy - expSlope * sx) / n
    assert(math.abs(slope - expSlope) < 1e-4, s"slope $slope vs $expSlope")
    assert(math.abs(intercept - expIcpt) < 1e-4, "intercept")
  }

  // ------------------------------------------------------------ q252
  test("q252 Chao1/coverage match an exact frequency-spectrum recompute") {
    val got = TextAnalysis.q252VocabRichness(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6)))
    val bySource = graft.core.Tables.load(spark, dir, "documents")
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
      .groupBy(_._1)
    val expected = bySource.toSeq.sortBy(_._1).map { case (src, g) =>
      val freqs = g.flatMap(_._2.split(" ", -1)).filter(_.nonEmpty)
        .groupBy(identity).map(_._2.length.toLong).toSeq
      val n = freqs.sum
      val v = freqs.length.toLong
      val f1 = freqs.count(_ == 1L).toLong
      val f2 = freqs.count(_ == 2L).toLong
      (src, n, v, f1, f2,
        v.toDouble + (f1 * (f1 - 1)).toDouble / (2.0 * (f2 + 1).toDouble),
        1.0 - f1.toDouble / n.toDouble)
    }
    assert(got.toSeq === expected)
    // richness sanity: the estimator never shrinks the observed vocab
    // and coverage is a probability
    got.foreach { case (src, _, v, _, _, chao1, cov) =>
      assert(chao1 >= v.toDouble, s"$src chao1 below observed vocab")
      assert(cov >= 0.0 && cov <= 1.0, s"$src coverage out of range")
    }
  }

  // ------------------------------------------------------------ q253
  test("q253 Heaps fit matches an in-memory first-occurrence recompute") {
    val Array(row) = TextAnalysis.q253HeapsFit(spark, dir).collect()
    val (nTotal, k, beta, lnK) =
      (row.getLong(0), row.getLong(1), row.getDouble(2), row.getDouble(3))
    // replay the global token stream in doc_id order
    val stream = graft.core.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .sortBy(_._1)
      .flatMap(_._2.split(" ", -1).filter(_.nonEmpty))
    val n = stream.length.toLong
    assert(nTotal === n, "total token count")
    val firstPos = scala.collection.mutable.Map.empty[String, Long]
    stream.zipWithIndex.foreach { case (t, i) =>
      if (!firstPos.contains(t)) firstPos(t) = i + 1L
    }
    val pts = (1 to TextAnalysis.HeapsCheckpoints).map { j =>
      val cp = n * j / 10
      val vj = firstPos.valuesIterator.count(_ <= cp).toLong
      (math.log(cp.toDouble), math.log(vj.toDouble))
    }
    assert(k === pts.length.toLong)
    val kk = pts.length.toDouble
    val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
    val sxy = pts.map(p => p._1 * p._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val expBeta = (kk * sxy - sx * sy) / (kk * sxx - sx * sx)
    val expLnK = (sy - expBeta * sx) / kk
    assert(math.abs(beta - expBeta) < 1e-4, s"beta $beta vs $expBeta")
    assert(math.abs(lnK - expLnK) < 1e-4, "ln_k")
    // Heaps' law: sublinear growth, 0 < beta < 1 for natural text
    assert(beta > 0.0 && beta < 1.0, s"beta $beta outside (0,1)")
  }

  // ------------------------------------------------------------ q205
  test("q205 split-drift χ² reconciles with the q107 contingency table") {
    val got = Curation.q205SplitDrift(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6)))
    val split = Curation.q107LeakSplit(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(2))).toMap
    val langs = graft.core.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("lang")).collect()
      .map(r => (r.getString(1), split(r.getLong(0))))
    val obs = langs.groupBy(_._1).view.mapValues { g =>
      (g.count(_._2 == "train").toLong, g.count(_._2 == "test").toLong)
    }.toMap
    val totTrain = obs.values.map(_._1).sum
    val totTest = obs.values.map(_._2).sum
    val n = totTrain + totTest
    var chi2 = 0.0
    got.foreach { case (lang, nTr, nTe, eTr, eTe, contrib, _) =>
      val (oTr, oTe) = obs(lang)
      assert(nTr === oTr && nTe === oTe, s"$lang observed counts")
      val rowTot = oTr + oTe
      val expTr = rowTot.toDouble * totTrain.toDouble / n.toDouble
      val expTe = rowTot.toDouble * totTest.toDouble / n.toDouble
      assert(eTr === expTr && eTe === expTe, s"$lang expected counts")
      val c = (oTr.toDouble - expTr) * (oTr.toDouble - expTr) / expTr +
        (oTe.toDouble - expTe) * (oTe.toDouble - expTe) / expTe
      assert(contrib === c, s"$lang contribution")
      chi2 += c
    }
    got.foreach { case (_, _, _, _, _, _, c2) =>
      assert(math.abs(c2 - chi2) < 1e-5, "total chi2 on every row")
    }
    assert(got.map(_._1).toSet === obs.keySet, "every language present")
  }

  // ------------------------------------------------------------ q206
  test("q206 PC1 matches an in-memory power iteration") {
    val got = Similarity.q206Pc1Power(spark, dir).collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    val vecs = graft.core.Tables.load(spark, dir, "embeddings")
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val d = vecs.head.length
    val n = vecs.length
    assert(got.length === d, "one loading per dimension")
    // unit norm and the sign convention
    val loadings = got.sortBy(_._1).map(_._2)
    // norm deviates from 1 by ~quantum/Σw² (the shifted-decimal
    // quantum against a small eigenvalue) — ~1e-6 here by design
    val nrm = math.sqrt(loadings.map(x => x * x).sum)
    assert(math.abs(nrm - 1.0) < 1e-5, s"unit loading norm, got $nrm")
    val mx = loadings.indices.minBy(i => (-math.abs(loadings(i)), i))
    assert(loadings(mx) > 0.0, "largest-|loading| coordinate positive")
    // independent power iteration on the raw covariance (no decimal
    // quantization): agreement to the quantization noise floor
    val mean = Array.tabulate(d)(i => vecs.map(_(i)).sum / n)
    val cov = Array.tabulate(d, d) { (i, j) =>
      vecs.map(v => (v(i) - mean(i)) * (v(j) - mean(j))).sum / (n - 1)
    }
    var v = Array.fill(d)(1.0 / math.sqrt(d.toDouble))
    var lambda = 0.0
    for (_ <- 1 to Similarity.Pc1Rounds) {
      val w = Array.tabulate(d)(i =>
        (0 until d).map(j => cov(i)(j) * v(j)).sum)
      lambda = math.sqrt(w.map(x => x * x).sum)
      v = w.map(_ / lambda)
    }
    val sgn = if (v(v.indices.minBy(i => (-math.abs(v(i)), i))) < 0) -1.0
      else 1.0
    val expected = v.map(_ * sgn)
    loadings.zip(expected).zipWithIndex.foreach { case ((a, b), i) =>
      assert(math.abs(a - b) < 1e-2, s"loading $i: $a vs $b")
    }
    val (eig, share) = (got.head._3, got.head._4)
    assert(math.abs(eig - lambda) / lambda < 1e-2, s"eigenvalue $eig vs $lambda")
    val trace = (0 until d).map(i => cov(i)(i)).sum
    assert(math.abs(share - eig / trace) < 1e-3, "variance share")
    assert(got.forall(t => t._3 == eig && t._4 == share),
      "eigenvalue/share constant across rows")
  }

  // ------------------------------------------------------------ q202
  test("q202 fertility reconciles with q51's per-doc token counts") {
    val out = TextAnalysis.q202TokenizerFertility(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6)))
    val perDoc = TextAnalysis.qTokenBpe(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getInt(1).toLong, r.getInt(2).toLong))
      .toMap
    val docs = graft.core.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2).length.toLong))
    val expected = docs.groupBy(_._2).toSeq.sortBy(_._1).map {
      case (lang, ds) =>
        val bpe = ds.map(d => perDoc(d._1)._1).sum
        val ws = ds.map(d => perDoc(d._1)._2).sum
        val chars = ds.map(_._3).sum
        (lang, ds.length.toLong, bpe, ws, chars,
          bpe.toDouble / ws.toDouble, chars.toDouble / bpe.toDouble)
    }
    assert(out.toSeq === expected)
  }

  // ------------------------------------------------------------ q211
  test("q211 NB gate matches a BigDecimal train+apply recompute") {
    val got = Curation.q211NbGate(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3)))
    val docs = graft.core.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def q6(x: Double): BigDecimal =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val train = docs.filter(_._1 % 5 < 4)
    val trainTok = train.flatMap { case (_, lang, text) =>
      text.split(" ", -1).map(t => (t, lang == "en")) }
    val counts = trainTok.groupBy(_._1).map { case (t, xs) =>
      t -> (xs.count(_._2).toLong, xs.count(!_._2).toLong) }
    val (totEn, totNon) = (counts.values.map(_._1).sum,
      counts.values.map(_._2).sum)
    val v = counts.size.toLong
    val llr = counts.map { case (t, (ce, cn)) =>
      t -> q6(math.log((ce + 1).toDouble / (totEn + v).toDouble) -
        math.log((cn + 1).toDouble / (totNon + v).toDouble)) }
    val llrUnseen = q6(math.log(1.0 / (totEn + v).toDouble) -
      math.log(1.0 / (totNon + v).toDouble))
    val prior = q6(math.log(
      train.count(_._2 == "en").toDouble /
        train.count(_._2 != "en").toDouble))
    val cells = docs.filter(_._1 % 5 >= 4).map { case (_, lang, text) =>
      val score = prior + text.split(" ", -1).groupBy(identity)
        .map { case (t, xs) =>
          llr.getOrElse(t, llrUnseen) * BigDecimal(xs.length) }
        .sum
      val actual = if (lang == "en") "en" else "other"
      val pred = if (score >= 0) "en" else "other"
      ((actual, pred), score)
    }
    val expected = cells.groupBy(_._1).toSeq.sortBy(_._1).map {
      case ((a, p), xs) =>
        (a, p, xs.length.toLong, xs.map(_._2).sum.toDouble) }
    assert(got.toSeq === expected)
    assert(got.map(_._3).sum === docs.count(_._1 % 5 >= 4).toLong,
      "confusion covers every held-out doc")
  }

  // ------------------------------------------------------------ q212
  test("q212 DSIR selection matches a BigDecimal recompute") {
    val got = Curation.q212DsirSelect(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    val docs = graft.core.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("source"), col("lang"), col("text"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3)))
    def q6(x: Double): BigDecimal =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    def bkt(t: String): Int =
      ((if (t.isEmpty) 0 else t.codePointAt(0)) * 31 + t.length) % 64
    val all = docs.flatMap(d => d._4.split(" ", -1).map(t => (d._3, bkt(t))))
    val raw = all.groupBy(_._2).map { case (b, xs) => b -> xs.length.toLong }
    val tgt = all.filter(_._1 == "en").groupBy(_._2)
      .map { case (b, xs) => b -> xs.length.toLong }
    val (rTot, tTot) = (raw.values.sum, tgt.values.sum)
    val lr = raw.map { case (b, rc) =>
      b -> q6(math.log((tgt.getOrElse(b, 0L) + 1).toDouble /
        (tTot + 64).toDouble) -
        math.log((rc + 1).toDouble / (rTot + 64).toDouble)) }
    val scored = docs.map { case (_, src, _, text) =>
      val score = text.split(" ", -1).groupBy(bkt)
        .map { case (b, xs) => lr(b) * BigDecimal(xs.length) }.sum
      (src, score)
    }
    val expected = scored.groupBy(_._1).toSeq.sortBy(_._1).map {
      case (src, xs) =>
        (src, xs.length.toLong, xs.count(_._2 >= 0).toLong,
          xs.filter(_._2 >= 0).map(_._2).sum.toDouble) }
    assert(got.toSeq === expected)
  }

  // ------------------------------------------------------------ q213
  test("q213 prototype pruning matches an exact BigInt recompute") {
    val got = Similarity.q213PrototypePrune(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val vecs = graft.core.Tables.load(spark, dir, "embeddings").collect()
      .map(r => (r.getLong(0), r.getInt(2),
        r.getSeq[Float](1).map(f => BigDecimal(f.toDouble)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP)
          .*(BigDecimal(1000000)).toLongExact).toArray))
    val expected = vecs.groupBy(_._2).toSeq.sortBy(_._1).map {
      case (label, xs) =>
        val n = xs.length
        val dims = xs.head._3.length
        val sums = Array.tabulate(dims)(p => xs.map(_._3(p)).sum)
        val ranked = xs.map { case (id, _, qv) =>
          val d2n2 = (0 until dims).map { p =>
            val diff = BigInt(n) * qv(p) - sums(p)
            diff * diff
          }.sum
          (id, d2n2)
        }.sortBy(t => (t._2, t._1))
        val k = n / 4
        val kept = ranked.drop(k)
        (label, n.toLong, k.toLong, kept.length.toLong,
          kept.map(_._1).sum)
    }
    assert(got.toSeq === expected)
  }

  // ------------------------------------------------------------ q214
  test("q214 per-source KS matches an in-memory CDF recompute") {
    val got = Curation.q214SourceCalibration(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    // the score definition is q97's (shared scoredDocs); the KS
    // machinery is what this pin recomputes independently
    val scores = Curation.q97ModelScore(spark, dir)
      .select(col("doc_id"), col("logit")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val bySource = graft.core.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("source")).collect()
      .map(r => (r.getString(1), scores(r.getLong(0))))
    val grid = bySource.map(_._2).distinct.sorted
    val nG = bySource.length.toLong
    val expected = bySource.groupBy(_._1).toSeq.sortBy(_._1).map {
      case (src, xs) =>
        val nS = xs.length.toLong
        val ksNum = grid.map { x =>
          val scum = xs.count(_._2 <= x).toLong
          val gcum = bySource.count(_._2 <= x).toLong
          (scum * nG - gcum * nS).abs
        }.max
        (src, nS, nG, ksNum, ksNum.toDouble / (nS * nG).toDouble)
    }
    assert(got.toSeq === expected)
    assert(got.map(_._2).sum === nG, "sources partition the corpus")
    got.foreach { case (src, _, _, _, ks) =>
      assert(ks > 0.0 && ks <= 1.0, s"$src KS in (0,1]") }
  }

  /** (vec_id, label, embedding-as-doubles) for the in-memory ANN
    * recomputes below. */
  private def vecsInMemory: Array[(Long, Int, Array[Double])] =
    graft.core.Tables.load(spark, dir, "embeddings").collect()
      .map(r => (r.getLong(0), r.getInt(2),
        r.getSeq[Float](1).map(_.toDouble).toArray))

  private def cosine(a: Array[Double], b: Array[Double]): Double = {
    var (dot, na, nb, i) = (0.0, 0.0, 0.0, 0)
    while (i < a.length) {
      dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  // ------------------------------------------------------------ q215
  test("q215 label-noise audit matches an in-memory cell recompute") {
    val got = Similarity.q215LabelNoise(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val vecs = vecsInMemory
    // seed selection + assignment mirror the IVF contract (Knuth
    // hash picks the K seeds; argmax cosine with ties to lowest seed)
    def ivfHash(id: Long): Long = ((id % 2147483648L) * 2654435761L) %
      4294967296L
    val seeds = vecs.sortBy(v => (ivfHash(v._1), v._1))
      .take(Similarity.IvfSeedCount).sortBy(_._1)
    val cellOf = vecs.map { v =>
      v._1 -> seeds.maxBy(sd => (cosine(v._3, sd._3), -sd._1))._1
    }.toMap
    val byCell = vecs.groupBy(v => cellOf(v._1))
    val perVec = vecs.flatMap { v =>
      val peers = byCell(cellOf(v._1)).filter(_._1 != v._1)
      if (peers.isEmpty) None
      else {
        val top = peers.map(p => (p._1, p._2, cosine(v._3, p._3)))
          .sortBy(t => (-t._3, t._1)).take(5)
        Some((v._2, top.length.toLong,
          top.count(_._2 == v._2).toLong))
      }
    }
    val expected = perVec.groupBy(_._1).toSeq.sortBy(_._1).map {
      case (label, xs) =>
        (label, xs.length.toLong, xs.map(_._2).sum, xs.map(_._3).sum,
          xs.count(t => t._3 * 2 < t._2).toLong)
    }
    assert(got.toSeq === expected)
  }

  // ------------------------------------------------------------ q216
  test("q216 truncation recall matches an in-memory brute recompute") {
    val got = Similarity.q216TruncRecall(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val vecs = vecsInMemory
    def top5(dims: Int): Map[Long, Set[Long]] =
      vecs.filter(_._1 < 8).map { q =>
        q._1 -> vecs.filter(_._1 != q._1)
          .map(c => (c._1, cosine(q._3.take(dims), c._3.take(dims))))
          .sortBy(t => (-t._2, t._1)).take(5).map(_._1).toSet
      }.toMap
    val full = top5(vecs.head._3.length)
    val trunc = top5(Similarity.TruncDims)
    val expected = full.toSeq.sortBy(_._1).map { case (qid, f) =>
      val hits = (f & trunc(qid)).size.toLong
      (qid, hits, hits.toDouble / 5.0)
    }
    assert(got.toSeq === expected)
    assert(got.map(_._2).sum < 40L,
      "truncation must lose recall on non-MRL embeddings")
  }

  // ------------------------------------------------------------ q217
  test("q217 MMR matches an in-memory greedy recompute and diversifies") {
    val got = Similarity.q217MmrRerank(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    val vecs = vecsInMemory
    val byId = vecs.map(v => v._1 -> v._3).toMap
    val expected = vecs.filter(_._1 < 8).map(_._1).sorted.flatMap { qid =>
      val pool = vecs.filter(_._1 != qid)
        .map(c => (c._1, cosine(byId(qid), c._3)))
        .sortBy(t => (-t._2, t._1)).take(Similarity.MmrPoolK)
      var sel = List(pool.head)
      var rest = pool.tail.toList
      for (_ <- 2 to Similarity.MmrSelectK) {
        val next = rest.map { c =>
          val mx = sel.map(s => cosine(byId(c._1), byId(s._1))).max
          (c, 0.7 * c._2 - 0.3 * mx)
        }.minBy(t => (-t._2, t._1._1))._1
        sel = sel :+ next
        rest = rest.filterNot(_._1 == next._1)
      }
      sel.zipWithIndex.map { case ((cid, rel), i) => (qid, cid, rel, i + 1) }
    }
    assert(got.toSeq === expected.toSeq)
    // the property MMR exists for: the selected set is more diverse
    // (lower mean intra-set similarity) than the pure-relevance top-5
    val mmrDiv = expected.groupBy(_._1).values.map { xs =>
      val ids = xs.map(_._2)
      val ps = for (a <- ids; b <- ids if a < b)
        yield cosine(byId(a), byId(b))
      ps.sum / ps.length
    }.sum
    val relDiv = vecs.filter(_._1 < 8).map(_._1).map { qid =>
      val ids = vecs.filter(_._1 != qid)
        .map(c => (c._1, cosine(byId(qid), c._3)))
        .sortBy(t => (-t._2, t._1)).take(5).map(_._1)
      val ps = for (a <- ids; b <- ids if a < b)
        yield cosine(byId(a), byId(b))
      ps.sum / ps.length
    }.sum
    assert(mmrDiv < relDiv,
      s"MMR must reduce intra-set similarity: $mmrDiv vs $relDiv")
  }

  // ------------------------------------------------------------ q218
  test("q218 source keyness lift matches an in-memory recompute") {
    val got = TextAnalysis.q218StopwordLift(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6)))
    val occ = graft.core.Tables.load(spark, dir, "documents")
      .select(col("source"), col("text")).collect()
      .flatMap(r => r.getString(1).split(" ", -1).map(r.getString(0) -> _))
    val n = occ.length.toLong
    val srcN = occ.groupBy(_._1).map { case (sc, xs) =>
      sc -> xs.length.toLong }
    val cf = occ.groupBy(_._2).map { case (t, xs) => t -> xs.length.toLong }
    val top = cf.toSeq.sortBy { case (t, c) => (-c, t) }
      .take(TextAnalysis.StopwordTopK)
    val expected = top.flatMap { case (t, c) =>
      occ.filter(_._2 == t).groupBy(_._1).toSeq.map { case (src, xs) =>
        val cs = xs.length.toLong
        (t, src, c, cs, srcN(src), c.toDouble / n.toDouble,
          (cs.toDouble / srcN(src).toDouble) / (c.toDouble / n.toDouble))
      }
    }.sortBy(t => (t._1, t._2))
    assert(got.toSeq === expected)
    // the separation the op exists for: some term is source-bound,
    // some term is corpus-wide
    assert(got.exists(t => t._7 > 1.3), "some token must be source-bound")
    assert(got.exists(t => t._7 > 0.9 && t._7 < 1.1),
      "some token must be corpus-wide")
  }

  // ------------------------------------------------------------ q219
  test("q219 staleness audit matches an exact BigInt recompute") {
    val got = Similarity.q219IndexStaleness(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4)))
    val vecs = vecsInMemory
    def ivfHash(id: Long): Long = ((id % 2147483648L) * 2654435761L) %
      4294967296L
    val seeds = vecs.filter(_._1 % 5 < 4)
      .sortBy(v => (ivfHash(v._1), v._1))
      .take(Similarity.IvfSeedCount).sortBy(_._1)
    def q6u(x: Double): Long = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP)
      .*(BigDecimal(1000000)).toLongExact
    val assigned = vecs.map { v =>
      (seeds.maxBy(sd => (cosine(v._3, sd._3), -sd._1))._1, v._1 % 5 < 4,
        v._3.map(q6u))
    }
    val expected = assigned.groupBy(_._1).toSeq.sortBy(_._1).map {
      case (cell, xs) =>
        val dims = xs.head._3.length
        val (old, nAll) = (xs.filter(_._2), xs.length.toLong)
        val nOld = old.length.toLong
        val drift = (0 until dims).map { p =>
          val so = old.map(x => BigInt(x._3(p))).sum
          val sa = xs.map(x => BigInt(x._3(p))).sum
          val dn = BigInt(nAll) * so - BigInt(nOld) * sa
          dn * dn
        }.sum
        (cell, nOld, nAll - nOld,
          (nAll - nOld).toDouble / nOld.toDouble,
          drift.toDouble / ((nOld.toDouble * nAll.toDouble) *
            (nOld.toDouble * nAll.toDouble)))
    }
    assert(got.toSeq === expected)
    assert(got.map(t => t._2 + t._3).sum === vecs.length.toLong,
      "cells partition the corpus")
    got.foreach { case (cell, nOld, _, growth, drift) =>
      assert(nOld >= 1L, s"cell $cell must contain its own seed")
      assert(growth >= 0.0 && drift >= 0.0, s"cell $cell sane metrics")
    }
  }

  // ------------------------------------------------------------ q220
  test("q220 bloom bits and FPR match an in-memory filter recompute") {
    val r = Curation.q220BloomFpr(spark, dir).head()
    val ids = graft.core.Tables.load(spark, dir, "documents")
      .select(col("doc_id")).collect().map(_.getLong(0))
    val m = Curation.BloomBitsM
    def pos(x: Long, j: Int): Int = {
      val a = 1000003L * (j + 1) + 17L
      val b = 7919L * (j + 1) + 3L
      (((a * (x % 2147483647L) + b) % 2147483647L) % m).toInt
    }
    val bits = new java.util.BitSet(m)
    for (id <- ids; j <- 0 until Curation.BloomK) bits.set(pos(id, j))
    val fp = ids.count(id =>
      (0 until Curation.BloomK).forall(j => bits.get(pos(id + 1000000L, j))))
    assert(r.getAs[Long]("n_members") === ids.length.toLong)
    assert(r.getAs[Long]("n_probes") === ids.length.toLong)
    assert(r.getAs[Long]("bits_set") === bits.cardinality().toLong)
    assert(r.getAs[Long]("n_fp") === fp.toLong)
    assert(r.getAs[Double]("fpr") === fp.toDouble / ids.length.toDouble)
    // the calibration property: a filter this loaded must show real
    // false positives, and the measured rate must be in (0, 1)
    assert(r.getAs[Double]("load_factor") > 0.1)
    assert(r.getAs[Double]("fpr") > 0.0 && r.getAs[Double]("fpr") < 1.0)
  }

  // ------------------------------------------------------------ q221
  test("q221 CUSUM changepoints match an exact BigInt recompute") {
    val got = EventAnalytics.q221CusumChangepoint(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    val evs = graft.core.Tables.load(spark, dir, "events")
      .selectExpr("event_type", "ts div 1000 as tus", "event_id",
        "CAST(CAST(value AS DECIMAL(25,6)) * 1000000 AS BIGINT) as qv")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val expected = evs.groupBy(_._1).toSeq.sortBy(_._1).map {
      case (tpe, xs) =>
        val sorted = xs.sortBy(t => (t._2, t._3))
        val n = sorted.length.toLong
        val sn = sorted.map(t => BigInt(t._4)).sum
        var sk = BigInt(0)
        val ds = sorted.zipWithIndex.map { case (t, i) =>
          sk += t._4
          (i + 1L, t._2, (sk * n - BigInt(i + 1) * sn).abs)
        }
        val best = ds.maxBy(t => (t._3, -t._1))
        (tpe, n, best._1, best._2, best._3.toDouble)
    }
    assert(got.toSeq === expected)
    got.foreach { case (tpe, n, k, _, _) =>
      assert(k >= 1L && k <= n, s"$tpe changepoint index in range") }
  }

  // ------------------------------------------------------------ q222
  test("q222 consistent hashing: only the removed node's keys move") {
    val got = Curation.q222ConsistentHash(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val ids = graft.core.Tables.load(spark, dir, "documents")
      .select(col("doc_id")).collect().map(_.getLong(0))
    val p = 2147483647L
    val ring = for (node <- 0 until Curation.HashRingNodes;
        v <- 0 until Curation.HashRingVnodes) yield {
      val x = node.toLong * Curation.HashRingVnodes + v
      (node.toLong, (x * x * 999983L + x * 2654435761L + 17L) % p)
    }
    def route(rg: Seq[(Long, Long)], id: Long): Long = {
      val kp = ((id % p) * 1540483477L + 12345L) % p
      val succ = rg.filter(_._2 >= kp)
      val pick = if (succ.nonEmpty) succ else rg
      pick.minBy(t => (t._2, t._1))._1
    }
    val before = ids.map(route(ring, _))
    val after = ids.map(route(ring.filter(_._1 != 0L), _))
    val moved = before.zip(after).count(t => t._1 != t._2).toLong
    val expected = (0 until Curation.HashRingNodes).map { nd =>
      (nd.toLong, before.count(_ == nd.toLong).toLong,
        after.count(_ == nd.toLong).toLong, ids.length.toLong, moved)
    }
    assert(got.toSeq === expected)
    // THE consistent-hashing contract: removing node 0 moves exactly
    // node 0's keys and nothing else
    val n0 = got.find(_._1 == 0L).get
    assert(n0._3 === 0L, "removed node holds nothing after")
    assert(n0._2 === moved, "moved keys == the removed node's load")
    assert(before.zip(after).forall(t => t._1 == t._2 || t._1 == 0L),
      "keys on surviving nodes never move")
  }

  // ------------------------------------------------------------ q223
  test("q223 two-phase median equals brute sort; bins stay bounded") {
    val got = EventAnalytics.q223ExactMedian(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val evs = graft.core.Tables.load(spark, dir, "events")
      .selectExpr("event_type",
        "CAST(CAST(value AS DECIMAL(25,6)) * 1000000 AS BIGINT) as qv")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val expected = evs.groupBy(_._1).toSeq.sortBy(_._1).map {
      case (tpe, xs) =>
        val sorted = xs.map(_._2).sorted
        val n = sorted.length.toLong
        val k = (n + 1) / 2
        val (mn, mx) = (sorted.head, sorted.last)
        val med = sorted((k - 1).toInt)
        val bin = ((med - mn) * EventAnalytics.MedianBins) / (mx - mn + 1)
        val bc = sorted.count(v =>
          ((v - mn) * EventAnalytics.MedianBins) / (mx - mn + 1) == bin).toLong
        (tpe, n, k, bin, bc, med)
    }
    assert(got.toSeq === expected)
    // the scale claim: phase 2 sorts a bin, not the stream
    got.foreach { case (tpe, n, _, _, bc, _) =>
      assert(bc * 10 < n, s"$tpe bin must be far smaller than n") }
  }

  // ------------------------------------------------------- q272/q273
  /** Shared in-memory one-way ANOVA mirroring the engine's
    * quantization: per-group decimal moment sums, per-term q6 on the
    * cross-group sums, closed forms in double. */
  private def anovaInMemory(
      groups: Seq[(Seq[Double])]): (Long, Long, Double, Double, Double) = {
    def q6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val gm = groups.map { ys =>
      (ys.length.toLong, ys.map(q6).sum.toDouble,
        ys.map(y => q6(y * y)).sum.toDouble)
    }
    val gg = gm.length.toLong
    val nn = gm.map(_._1).sum
    val sn2 = gm.map(g => g._1 * g._1).sum
    val syt = gm.map(g => q6(g._2)).sum.toDouble
    val ybar = syt / nn
    val ssb = gm.map { case (n, sy, _) =>
      q6(n.toDouble * (sy / n - ybar) * (sy / n - ybar)) }.sum.toDouble
    val ssw = gm.map { case (n, sy, syy) =>
      q6(syy - sy * sy / n) }.sum.toDouble
    val msb = ssb / (gg - 1).toDouble
    val msw = ssw / (nn - gg).toDouble
    val k0 = (nn.toDouble - sn2.toDouble / nn) / (gg - 1).toDouble
    (nn, gg, k0, msb / msw, (msb - msw) / (msb + (k0 - 1.0) * msw))
  }

  test("q272 dup-group ICC matches an in-memory ANOVA recompute") {
    val Array(row) = Curation.q272DupGroupIcc(spark, dir).collect()
    val logits = Curation.q97ModelScore(spark, dir)
      .select(col("doc_id"), col("logit")).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap
    val groups = Dedup.qDedupGroups(spark, dir).collect()
      .map(r => (r.getLong(1), logits(r.getLong(0))))
      .groupBy(_._1).values.map(_.map(_._2).toSeq).filter(_.length >= 2)
      .toSeq
    val (nn, gg, k0, f, icc) = anovaInMemory(groups)
    assert(row.getLong(0) === nn && row.getLong(1) === gg)
    assert(row.getDouble(2) === k0)
    assert(row.getDouble(3) === f && row.getDouble(4) === icc)
    // ICC(1) is bounded by (-1/(k0-1), 1]
    assert(icc <= 1.0 && icc > -1.0 / (k0 - 1.0))
  }

  test("q273 source ANOVA matches an in-memory recompute") {
    val Array(row) = Curation.q273SourceAnova(spark, dir).collect()
    val scored = Curation.q97ModelScore(spark, dir)
      .select(col("doc_id"), col("logit")).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap
    val groups = graft.core.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("source")).collect()
      .map(r => (r.getString(1), scored(r.getLong(0))))
      .groupBy(_._1).values.map(_.map(_._2).toSeq).toSeq
    val (nn, gg, k0, f, icc) = anovaInMemory(groups)
    assert(row.getLong(0) === nn && row.getLong(1) === gg)
    assert(row.getDouble(2) === k0)
    assert(row.getDouble(3) === f && row.getDouble(4) === icc)
    assert(f >= 0.0, "F statistic must be nonnegative")
  }

  // ------------------------------------------------------------ q270
  test("q270 stupid-backoff scoring matches an in-memory LM replay") {
    val got = TextAnalysis.q270StupidBackoff(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4)))
    val docs = graft.core.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("source"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getString(2).split(" ", -1).filter(_.nonEmpty).toSeq))
    val train = docs.filter(_._1 % 2 == 0)
    val c1 = train.flatMap(_._3).groupBy(identity)
      .view.mapValues(_.length.toLong).toMap
    val c2 = train.flatMap(d => d._3.zip(d._3.tail)).groupBy(identity)
      .view.mapValues(_.length.toLong).toMap
    val nn = train.map(_._3.length.toLong).sum.toDouble
    def q6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val expected = docs.filter(_._1 % 2 == 1)
      .flatMap(d => d._3.zip(d._3.tail).map(bg => (d._2, bg)))
      .groupBy(_._1).toSeq.sortBy(_._1).map { case (src, bgs) =>
        val lps = bgs.map { case (_, (p, w)) =>
          c2.get((p, w)) match {
            case Some(c) => (false, math.log(c.toDouble / c1(p)))
            case None =>
              (true, math.log(
                0.4 * c1.get(w).map(_.toDouble).getOrElse(0.5) / nn))
          }
        }
        val nb = lps.count(_._1).toLong
        (src, lps.length.toLong, nb,
          lps.map(l => q6(l._2)).sum.toDouble / lps.length,
          nb.toDouble / lps.length)
      }
    assert(got.toSeq === expected)
    // the split makes the backoff path REAL: somewhere in the corpus
    // an unseen bigram must have fired it
    assert(got.map(_._3).sum > 0L, "backoff never fired — split broken?")
  }

  // ------------------------------------------------------------ q266
  test("q266 dataset card reconciles with an in-memory recompute") {
    val Array(row) = Curation.q266DatasetCard(spark, dir).collect()
    val docs = graft.core.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text"), col("lang"), col("source"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3)))
    val toks = docs.map(_._2.split(" ", -1).count(_.nonEmpty).toLong)
    assert(row.getLong(0) === docs.length.toLong)
    assert(row.getLong(1) === toks.sum)
    assert(row.getLong(2) === docs.map(_._3).distinct.length.toLong)
    assert(row.getLong(3) === docs.map(_._4).distinct.length.toLong)
    val nDup = docs.length - docs.map(_._2).distinct.length
    assert(row.getDouble(4) === nDup.toDouble / docs.length)
    // median tokens/doc: lower median over the sorted lengths
    val sorted = toks.sorted
    assert(row.getLong(6) === sorted((sorted.length + 1) / 2 - 1))
    // mean logit reconciles with the oracle-checked q97 output
    val logits = Curation.q97ModelScore(spark, dir)
      .select(col("logit")).collect().map(_.getDouble(0))
    def q6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val meanLogit = q6(
      logits.map(q6).sum.toDouble / logits.length).toDouble
    assert(row.getDouble(5) === meanLogit)
  }

  // ------------------------------------------------------------ q267
  test("q267 association rules match an in-memory basket recompute") {
    val out = EventAnalytics.q267AssocRules(spark, dir).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))))
      .toMap
    val evs = graft.core.Tables.load(spark, dir, "events")
      .selectExpr("user_id", "event_id", "ts div 1000 AS us", "event_type")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3)))
    // replay the q67 3h-gap sessionization in memory
    val baskets = evs.groupBy(_._1).toSeq.flatMap { case (_, g) =>
      val ordered = g.sortBy(x => (x._3, x._2))
      val sessions = scala.collection.mutable.ArrayBuffer(
        scala.collection.mutable.ArrayBuffer[String]())
      var prev = Long.MinValue
      ordered.foreach { e =>
        if (prev != Long.MinValue &&
          e._3 - prev > EventAnalytics.SessionGapUs)
          sessions += scala.collection.mutable.ArrayBuffer[String]()
        sessions.last += e._4
        prev = e._3
      }
      sessions.map(_.toSet)
    }
    val nSess = baskets.length.toLong
    val types = baskets.flatten.distinct.sorted
    val nT = types.map(t => t -> baskets.count(_.contains(t)).toLong).toMap
    for (t1 <- types; t2 <- types if t1 != t2) {
      val nAb = baskets.count(b => b.contains(t1) && b.contains(t2)).toLong
      out.get((t1, t2)) match {
        case None => assert(nAb === 0L, s"missing rule $t1->$t2")
        case Some((n, sup, conf, lift)) =>
          assert(n === nAb, s"$t1->$t2 count")
          assert(sup === nAb.toDouble / nSess)
          assert(conf === nAb.toDouble / nT(t1))
          assert(lift === nAb.toDouble * nSess / (nT(t1).toDouble * nT(t2)))
      }
    }
  }

  // ------------------------------------------------------------ q268
  test("q268 partial correlation matches a moment recompute") {
    val Array(row) = Curation.q268PartialCorr(spark, dir).collect()
    val (n, rab, rac, rbc, rabc) = (row.getLong(0), row.getDouble(1),
      row.getDouble(2), row.getDouble(3), row.getDouble(4))
    val feats = graft.core.Tables.load(spark, dir, "documents")
      .select(col("text")).collect().map { r =>
        val toks = r.getString(0).split(" ", -1)
        val stop = Set("the", "a", "of", "to", "and")
        (toks.count(stop).toDouble / toks.length,
          toks.distinct.length.toDouble / toks.length,
          toks.length.toDouble)
      }
    assert(n === feats.length.toLong)
    def q6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    def s1(f: ((Double, Double, Double)) => Double) =
      feats.map(t => q6(f(t))).sum.toDouble
    val nn = feats.length.toDouble
    val (sa, sb, sc) = (s1(_._1), s1(_._2), s1(_._3))
    val (saa, sbb, scc) = (s1(t => t._1 * t._1), s1(t => t._2 * t._2),
      s1(t => t._3 * t._3))
    val (sab, sac, sbc) = (s1(t => t._1 * t._2), s1(t => t._1 * t._3),
      s1(t => t._2 * t._3))
    def r(sxy: Double, sx: Double, sy: Double, sxx: Double, syy: Double) =
      (nn * sxy - sx * sy) /
        math.sqrt((nn * sxx - sx * sx) * (nn * syy - sy * sy))
    val (eab, eac, ebc) = (r(sab, sa, sb, saa, sbb), r(sac, sa, sc, saa, scc),
      r(sbc, sb, sc, sbb, scc))
    assert(rab === eab && rac === eac && rbc === ebc)
    assert(rabc === (eab - eac * ebc) /
      math.sqrt((1.0 - eac * eac) * (1.0 - ebc * ebc)))
    // the designed demonstration: TTR correlates with length, and
    // controlling for length moves the a-b correlation
    assert(math.abs(rbc) > 0.05, "TTR~length confound absent?")
  }

  // ------------------------------------------------------------ q269
  test("q269 source assortativity matches an edge recompute") {
    val got = Dedup.q269SourceAssortativity(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
    val srcOf = graft.core.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("source")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val edges = Dedup.qMinhashPairs(spark, dir)
      .filter(col("jaccard") >= 0.5).select(col("d1"), col("d2")).collect()
      .map(r => (srcOf(r.getLong(0)), srcOf(r.getLong(1))))
    val m = edges.length.toDouble
    val bySrc = edges.flatMap(e => Seq(e._1, e._2)).groupBy(identity)
      .view.mapValues(_.length.toLong).toMap
    def q6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val expQ = q6(bySrc.toSeq.map { case (s, as) =>
      val ess = edges.count(e => e._1 == s && e._2 == s).toLong
      q6(ess / m - (as / (2.0 * m)) * (as / (2.0 * m)))
    }.sum.toDouble).toDouble
    assert(got.map(_._1).toSeq === bySrc.keys.toSeq.sorted)
    got.foreach { case (s, ess, as, intra, expd, q) =>
      assert(as === bySrc(s))
      assert(ess === edges.count(e => e._1 == s && e._2 == s).toLong)
      assert(intra === ess / m)
      assert(expd === (as / (2.0 * m)) * (as / (2.0 * m)))
      assert(q === expQ)
    }
    // modularity is bounded
    got.foreach(t => assert(t._6 >= -1.0 && t._6 <= 1.0))
  }

  // ------------------------------------------------------------ q264
  test("q264 churn labels match a firewalled in-memory recompute") {
    val got = EventAnalytics.q264ChurnLabels(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val evs = graft.core.Tables.load(spark, dir, "events")
      .selectExpr("user_id", "ts div 1000 AS us").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val (mn, mx) = (evs.map(_._2).min, evs.map(_._2).max)
    val cut = mn + (mx - mn) * 4 / 5
    val byUser = evs.groupBy(_._1)
    val expected = byUser.toSeq.sortBy(_._1).flatMap { case (u, g) =>
      val feat = g.map(_._2).filter(_ < cut)
      if (feat.isEmpty) None
      else Some((u, feat.length.toLong,
        feat.map(_ / 86400000000L).distinct.length.toLong,
        cut - feat.min, cut - feat.max,
        if (g.exists(_._2 >= cut)) 0L else 1L))
    }
    assert(got.toSeq === expected)
    // the firewall: recency/tenure are measured AT the cutoff, so
    // they never go negative; both label classes should appear
    got.foreach { case (u, _, _, ten, rec, _) =>
      assert(ten >= rec && rec >= 0L, s"user $u windows inverted") }
    // dense tiny fixtures can have zero churners (every user stays
    // active past the cutoff) — that's data, not a bug; the firewall
    // contract itself is the exact recompute above
    assert(got.exists(_._6 == 0L), "nobody survives the cutoff?")
  }

  // ------------------------------------------------------------ q265
  test("q265 burstiness matches an exact gap-moment recompute") {
    val got = EventAnalytics.q265Burstiness(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4)))
    val evs = graft.core.Tables.load(spark, dir, "events")
      .selectExpr("user_id", "event_id", "ts div 1000 AS us").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expected = evs.groupBy(_._1).toSeq.sortBy(_._1).flatMap {
      case (u, g) =>
        val ordered = g.sortBy(x => (x._3, x._2)).map(_._3)
        val gaps = ordered.zip(ordered.tail).map(p => p._2 - p._1)
        if (gaps.length < 2) None
        else {
          val n = gaps.length.toDouble
          val sg = gaps.map(BigInt(_)).sum.toDouble
          val sgg = gaps.map(x => BigInt(x) * BigInt(x)).sum.toDouble
          val mu = sg / n
          val sigma = math.sqrt((n * sgg - sg * sg) / (n * n))
          Some((u, gaps.length.toLong, mu / 1e6, sigma / mu,
            (sigma - mu) / (sigma + mu)))
        }
    }
    assert(got.toSeq === expected)
    // burstiness lives in (-1, 1); CV is nonnegative
    got.foreach { case (u, _, _, cv, b) =>
      assert(cv >= 0.0, s"user $u negative CV")
      assert(b > -1.0 && b < 1.0, s"user $u burstiness out of range") }
  }

  // ------------------------------------------------------------ q261
  test("q261 Theil-Sen slope matches a pairwise median recompute") {
    val Array(row) = EventAnalytics.q261TheilSen(spark, dir).collect()
    val (nDays, nPairs, tsSlope, olsSlope) =
      (row.getLong(0), row.getLong(1), row.getDouble(2), row.getDouble(3))
    val evs = graft.core.Tables.load(spark, dir, "events")
      .selectExpr("ts div 1000 div 86400000000 AS day",
        "CAST(CAST(value AS DECIMAL(25,6)) * 1000000 AS BIGINT) AS us")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byDay = evs.groupBy(_._1).toSeq.sortBy(_._1).map { case (d, g) =>
      (d, g.map(x => BigInt(x._2)).sum.toDouble / (g.length * 1e6))
    }
    assert(nDays === byDay.length.toLong)
    val slopes = (for {
      i <- byDay.indices; j <- byDay.indices if byDay(i)._1 < byDay(j)._1
    } yield (byDay(j)._2 - byDay(i)._2) /
      (byDay(j)._1 - byDay(i)._1).toDouble).sorted
    assert(nPairs === slopes.length.toLong)
    assert(tsSlope === slopes((slopes.length + 1) / 2 - 1), "median slope")
    // exact-integer OLS: x centered at min day, y in rounded µ-units
    val mnd = byDay.map(_._1).min
    val pts = byDay.map { case (d, m) =>
      (BigInt(d - mnd), BigInt(BigDecimal(m * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong))
    }
    val n = pts.length.toDouble
    val sx = pts.map(_._1).sum.toDouble
    val sy = pts.map(_._2).sum.toDouble
    val sxy = pts.map(p => p._1 * p._2).sum.toDouble
    val sxx = pts.map(p => p._1 * p._1).sum.toDouble
    val expOls = (n * sxy - sx * sy) / ((n * sxx - sx * sx) * 1e6)
    assert(olsSlope === expOls, s"ols $olsSlope vs $expOls")
  }

  // ------------------------------------------------------------ q262
  test("q262 daily ACF matches a gap-filled series recompute") {
    val got = EventAnalytics.q262DailyAcf(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val days = graft.core.Tables.load(spark, dir, "events")
      .selectExpr("ts div 1000 div 86400000000 AS day").collect()
      .map(_.getLong(0))
    val counts = days.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val (mnd, mxd) = (days.min, days.max)
    val series = (mnd to mxd).map(d => counts.getOrElse(d, 0L))
    val mu = series.sum.toDouble / series.length
    def q6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val dev = series.map(_.toDouble - mu)
    val denom = dev.map(d => q6(d * d)).sum.toDouble
    got.foreach { case (lag, nTerms, acf) =>
      val terms = (0 until dev.length - lag.toInt)
        .map(i => q6(dev(i) * dev(i + lag.toInt)))
      assert(nTerms === terms.length.toLong, s"lag $lag terms")
      val exp = terms.sum.toDouble / denom
      assert(math.abs(acf - exp) < 1e-12, s"lag $lag acf $acf vs $exp")
      assert(acf >= -1.0 - 1e-9 && acf <= 1.0 + 1e-9)
    }
    assert(got.map(_._1).toSeq === (1L to EventAnalytics.AcfMaxLag).toSeq)
  }

  // ------------------------------------------------------------ q263
  test("q263 Hill tail index matches the top-k order-statistic MLE") {
    val Array(row) = TextAnalysis.q263HillTail(spark, dir).collect()
    val (kUsed, fTail, alpha) =
      (row.getLong(0), row.getLong(1), row.getDouble(2))
    val freqs = graft.core.Tables.load(spark, dir, "documents")
      .select(col("text")).collect()
      .flatMap(_.getString(0).split(" ", -1)).filter(_.nonEmpty)
      .groupBy(identity).map { case (t, a) => (t, a.length.toLong) }.toSeq
      .sortBy { case (t, f) => (-f, t) }.take(TextAnalysis.ZipfK)
    assert(kUsed === freqs.length.toLong)
    val fk = freqs.last._2
    assert(fTail === fk)
    def q6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val slr = freqs.init
      .map(f => q6(math.log(f._2.toDouble / fk.toDouble))).sum.toDouble
    val exp = if (slr > 0) (kUsed - 1).toDouble / slr else 0.0
    assert(math.abs(alpha - exp) < 1e-12, s"alpha $alpha vs $exp")
    assert(alpha > 0.0, "heavy tail must have a positive index")
  }

  // ------------------------------------------------------------ q260
  test("q260 decay score matches an exact power-of-two recompute") {
    val got = EventAnalytics.q260DecayScore(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val evs = graft.core.Tables.load(spark, dir, "events")
      .selectExpr("user_id", "ts div 1000 AS us").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val mx = evs.map(_._2).max
    val hl = math.max((mx - evs.map(_._2).min) / 8, 1L)
    val expected = evs.groupBy(_._1).toSeq.sortBy(_._1).map { case (u, g) =>
      val scaled = g.map { case (_, us) =>
        val k = math.min((mx - us) / hl, EventAnalytics.DecayMaxK.toLong)
        BigInt(1L << (EventAnalytics.DecayMaxK - k.toInt))
      }.sum
      (u, g.length.toLong,
        scaled.toDouble / EventAnalytics.DecayScale.toDouble)
    }
    assert(got.toSeq === expected)
    // decay structure: every score is positive and at most n_events
    // (weight 1 per event is the maximum), and at least one user has
    // visibly decayed mass (score strictly below its count)
    got.foreach { case (u, n, s) =>
      assert(s > 0.0 && s <= n.toDouble, s"user $u score out of range") }
    assert(got.exists { case (_, n, s) => s < n.toDouble },
      "no decay observed anywhere")
  }

  // ------------------------------------------------------------ q257
  test("q257 merged base+delta aggregate equals a one-pass recompute") {
    val got = EventAnalytics.q257IncrementalAgg(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    // the IVM correctness statement: merge(base, delta) == recompute
    val evs = graft.core.Tables.load(spark, dir, "events")
      .selectExpr("event_type",
        "CAST(CAST(value AS DECIMAL(25,6)) * 1000000 AS BIGINT) AS us")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val expected = evs.groupBy(_._1).toSeq.sortBy(_._1).map { case (t, g) =>
      (t, g.length.toLong, g.map(x => BigInt(x._2)).sum.toDouble / 1e6)
    }
    assert(got.map(t => (t._1, t._4, t._5)).toSeq === expected)
    // the split must be a real split: both sides contribute somewhere
    assert(got.map(_._2).sum > 0L, "base side empty")
    assert(got.map(_._3).sum > 0L, "delta side empty")
    got.foreach { case (t, nb, nd, n, _) =>
      assert(nb + nd === n, s"$t partial counts don't add up") }
  }

  // ------------------------------------------------------------ q249
  test("q249 MAD gate matches an integer-exact in-memory recompute") {
    val got = EventAnalytics.q249MadGate(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getLong(4), r.getDouble(5)))
    val evs = graft.core.Tables.load(spark, dir, "events")
      .selectExpr("event_type",
        "CAST(CAST(value AS DECIMAL(25,6)) * 1000000 AS BIGINT) as qv")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    def lowerMedian(xs: Seq[Long]): Long = {
      val s = xs.sorted; s(((s.length + 1) / 2 - 1))
    }
    val expected = evs.groupBy(_._1).toSeq.sortBy(_._1).map {
      case (tpe, xs) =>
        val vs = xs.map(_._2)
        val med = lowerMedian(vs)
        val mad = lowerMedian(vs.map(v => math.abs(v - med)))
        // the integer decision boundary: |z|>3.5 <=> 6745|x-med| > 35000*mad
        val out = if (mad == 0L) 0L
          else vs.count(v => math.abs(v - med) * 6745L > 35000L * mad).toLong
        (tpe, vs.length.toLong, med / 1e6, mad / 1e6, out,
          out.toDouble / vs.length.toDouble)
    }
    assert(got.toSeq === expected)
    // the robustness contract: every type has a nonzero MAD here, and
    // the gate flags a strict minority
    got.foreach { case (tpe, n, _, mad, out, _) =>
      assert(mad > 0.0, s"$tpe MAD degenerate")
      assert(out * 2 < n, s"$tpe gate flags a majority") }
  }

  // ------------------------------------------------- shared text hashing
  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString

  /** The engine's 60-bit hashed 3-gram shingle set, independently:
    * md5 of the space-joined trigram, first 15 hex chars as a long. */
  private def shingleHashes(text: String): Set[Long] = {
    val toks = text.split(" ", -1)
    if (toks.length < 3) Set.empty
    else (0 to toks.length - 3).map { i =>
      java.lang.Long.parseLong(
        md5hex(s"${toks(i)} ${toks(i + 1)} ${toks(i + 2)}").take(15), 16)
    }.toSet
  }

  // ------------------------------------------------------------ q224
  test("q224 RRF fusion matches an in-memory two-retriever recompute") {
    val got = Similarity.q224RrfFusion(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3),
        r.getInt(4), r.getDouble(5)))
    val vecs = vecsInMemory
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var (s, i) = (0.0, 0); while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    val norms = vecs.map(v => v._1 -> math.sqrt(dot(v._3, v._3))).toMap
    val byId = vecs.map(v => v._1 -> v._3).toMap
    val d = Similarity.RrfDepth
    val expected = vecs.map(_._1).filter(_ < 8).sorted.flatMap { qid =>
      val cands = vecs.map(_._1).filter(_ != qid)
      val cos = cands.map(c => c ->
        dot(byId(qid), byId(c)) / (norms(qid) * norms(c))).toMap
      val l2 = cands.map(c => c -> (norms(qid) * norms(qid) +
        norms(c) * norms(c) - 2.0 * dot(byId(qid), byId(c)))).toMap
      val rc = cands.sortBy(c => (-cos(c), c)).zipWithIndex
        .map { case (c, i) => c -> (i + 1) }.toMap
      val rl = cands.sortBy(c => (l2(c), c)).zipWithIndex
        .map { case (c, i) => c -> (i + 1) }.toMap
      val fused = cands.filter(c => rc(c) <= d || rl(c) <= d).map { c =>
        val sc = (if (rc(c) <= d) 1.0 / (Similarity.RrfK + rc(c)) else 0.0) +
          (if (rl(c) <= d) 1.0 / (Similarity.RrfK + rl(c)) else 0.0)
        (c, sc)
      }
      fused.sortBy(t => (-t._2, t._1)).take(10).zipWithIndex.map {
        case ((c, sc), i) => (qid, c, i + 1, rc(c), rl(c), sc)
      }
    }
    assert(got.toSeq === expected.toSeq)
    // consensus dominance: a candidate both retrievers rank #1 must
    // fuse #1 (2/(k+1) beats any split pair of deeper ranks)
    expected.groupBy(_._1).foreach { case (qid, rows) =>
      rows.find(r => r._4 == 1 && r._5 == 1).foreach { r =>
        assert(rows.find(_._3 == 1).get._2 === r._2,
          s"query $qid: double-#1 candidate must fuse first")
      }
    }
  }

  // ------------------------------------------------------------ q225
  test("q225 HLL estimates match an in-memory register recompute") {
    val got = Dedup.q225HllJaccard(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6), r.getDouble(7),
        r.getDouble(8), r.getDouble(9), r.getDouble(10), r.getDouble(11)))
    val docs = graft.core.Tables.load(spark, dir, "documents")
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val bySrc = docs.groupBy(_._1).map { case (src, xs) =>
      src -> xs.flatMap(x => shingleHashes(x._2)).toSet
    }
    val m = Dedup.HllRegisters
    val P = 2147483647L
    def regsOf(set: Set[Long]): Array[Int] = {
      val regs = Array.fill(m)(0)
      set.foreach { g =>
        val h = (1299709L * (g % P) + 104729L) % P
        val idx = (h % m).toInt
        val w = h / m
        val rho = if (w == 0L) Dedup.HllMaxRho
          else java.lang.Long.numberOfTrailingZeros(w) + 1
        if (rho > regs(idx)) regs(idx) = rho
      }
      regs
    }
    def q6(x: Double): Double = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def est(regs: Array[Int]): Double = {
      val ssum = regs.map(r => 1.0 / (1L << r).toDouble).sum
      val zeros = regs.count(_ == 0)
      val raw = 0.709 * m.toDouble * m.toDouble / ssum
      q6(if (raw <= 2.5 * m && zeros > 0)
        m * math.log(m.toDouble / zeros.toDouble) else raw)
    }
    val srcs = bySrc.keys.toSeq.sorted
    val expected = for (i <- srcs.indices; j <- i + 1 until srcs.length)
      yield {
        val (s1, s2) = (srcs(i), srcs(j))
        val (a, b) = (bySrc(s1), bySrc(s2))
        val (ra, rb) = (regsOf(a), regsOf(b))
        val ru = ra.zip(rb).map(t => math.max(t._1, t._2))
        val (e1, e2, eu) = (est(ra), est(rb), est(ru))
        val inter = (a & b).size.toLong
        val uni = a.size + b.size - inter
        val jx = inter.toDouble / uni.toDouble
        val je = q6(math.max(0.0, (e1 + e2 - eu) / eu))
        (s1, s2, a.size.toLong, b.size.toLong, inter, uni, jx,
          e1, e2, eu, je, q6(math.abs(je - jx)))
      }
    assert(got.toSeq === expected.toSeq)
    // the estimator must actually estimate: per-pair errors stay
    // inside a generous 4.5 sigma of HLL's ~1.04/sqrt(m) relative
    // error (at m=64 a 190-pair sample statistically produces ~3 sigma
    // outliers), and the MEDIAN error sits well inside 1.5 sigma
    val sigma = 1.04 / math.sqrt(m)
    val errs = got.map { case (s1, s2, _, _, _, uni, _, _, _, eu, _, _) =>
      val e = math.abs(eu - uni) / uni.toDouble
      assert(e < 4.5 * sigma, s"($s1,$s2) union estimate off by > 4.5 sigma")
      e
    }.sorted
    assert(errs(errs.length / 2) < 1.5 * sigma,
      "median union estimation error must be within 1.5 sigma")
  }

  // ------------------------------------------------------------ q226
  test("q226 B-cubed matches an in-memory contingency recompute") {
    val got = Dedup.q226B3Quality(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6)))
    val docs = graft.core.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("source"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    // independent simhash: majority vote per bit over the shingle set
    def simhash(text: String): Long = {
      val sh = shingleHashes(text)
      if (sh.isEmpty) -1L
      else (0 until Dedup.SimhashBits).map { j =>
        val v = sh.toSeq.map(h => if (((h >> j) & 1L) == 1L) 1 else -1).sum
        if (v >= 0) 1L << j else 0L
      }.sum
    }
    val items = docs.map { case (id, src, text) =>
      val gold = md5hex(text)
      val sh = simhash(text)
      val bucket = if (sh < 0) "-1" else (sh >> (Dedup.SimhashBits - 16)).toString
      (id, s"$src:$gold", bucket, gold)
    }
    def b3(rel: Seq[(String, String)]): (Long, Long, Long, Double, Double, Double) = {
      val n = rel.size.toLong
      val ct = rel.groupBy(identity).map { case (k, xs) => k -> xs.size.toLong }
      val nc = rel.groupBy(_._1).map { case (k, xs) => k -> xs.size.toLong }
      val nl = rel.groupBy(_._2).map { case (k, xs) => k -> xs.size.toLong }
      val sp = ct.map { case ((c, _), ncl) =>
        (BigInt(ncl) * ncl * 1000000 / nc(c)) }.sum
      val sr = ct.map { case ((_, l), ncl) =>
        (BigInt(ncl) * ncl * 1000000 / nl(l)) }.sum
      val p = sp.toDouble / 1000000.0 / n.toDouble
      val r = sr.toDouble / 1000000.0 / n.toDouble
      val f1 = BigDecimal(2.0 * p * r / (p + r))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (n, nc.size.toLong, nl.size.toLong, p, r, f1)
    }
    val shard = b3(items.toSeq.map(t => (t._2, t._4)))
    val bucket = b3(items.toSeq.map(t => (t._3, t._4)))
    assert(got.toSeq === Seq(
      ("shard_exact", shard._1, shard._2, shard._3, shard._4, shard._5,
        shard._6),
      ("simhash_b16", bucket._1, bucket._2, bucket._3, bucket._4, bucket._5,
        bucket._6)).sortBy(_._1))
    // the bracketing contract: shard dedup is a refinement of gold
    // (perfect precision, recall prices cross-shard misses); the coarse
    // bucket contains gold (perfect recall, precision prices over-merge)
    val se = got.find(_._1 == "shard_exact").get
    val sb = got.find(_._1 == "simhash_b16").get
    assert(se._5 === 1.0, "shard_exact precision must be exactly 1")
    assert(sb._6 === 1.0, "simhash_b16 recall must be exactly 1")
  }

  // ------------------------------------------------------------ q227
  test("q227 Gini and Lorenz match an exact grouped recompute") {
    val got = EventAnalytics.q227GiniActivity(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6)))
    val counts = graft.core.Tables.load(spark, dir, "events")
      .groupBy("user_id").count().collect().map(_.getLong(1))
    val n = counts.length.toLong
    val t = counts.map(BigInt(_)).sum
    val lv = counts.groupBy(identity).toSeq
      .map { case (c, xs) => (c, xs.length.toLong) }.sortBy(_._1)
    var (cumU, cumE, srx) = (0L, BigInt(0), BigInt(0))
    val expected = lv.map { case (c, nu) =>
      srx += BigInt(c) * (BigInt(nu) * cumU + BigInt(nu) * (nu + 1) / 2)
      val before = cumU
      cumU += nu; cumE += BigInt(c) * nu
      (c, nu, cumU, cumE.toLong,
        cumU.toDouble / n.toDouble, cumE.toDouble / t.toDouble, before)
    }
    val gini = (2 * srx - (BigInt(n) + 1) * t).toDouble /
      (BigInt(n) * t).toDouble
    assert(got.map(r => (r._1, r._2, r._3, r._4, r._5, r._6)).toSeq ===
      expected.map(e => (e._1, e._2, e._3, e._4, e._5, e._6)).toSeq)
    got.foreach(r => assert(math.abs(r._7 - gini) < 1e-12,
      "gini replicated per row"))
    // Lorenz curve contracts: ends at (1,1), convex (share below pop)
    assert(got.last._5 === 1.0 && got.last._6 === 1.0)
    got.foreach(r => assert(r._6 <= r._5 + 1e-12,
      "event share never exceeds population share on a sorted Lorenz"))
    assert(gini >= 0.0 && gini < 1.0)
  }

  // ------------------------------------------------------------ q228
  test("q228 kappa matches an in-memory contingency recompute") {
    val r = Curation.q228GateKappa(spark, dir).head()
    val docs = graft.core.Tables.load(spark, dir, "documents")
      .select(col("text")).collect().map(_.getString(0))
    val gates = docs.map { text =>
      val toks = text.split(" ", -1)
      val a = toks.count(t => t == "the" || t == "a") * 5 < toks.length
      val b = toks.length >= 30 && text.length <= 2000
      (a, b)
    }
    val n = gates.length.toLong
    val n11 = gates.count(g => g._1 && g._2).toLong
    val n10 = gates.count(g => g._1 && !g._2).toLong
    val n01 = gates.count(g => !g._1 && g._2).toLong
    val n00 = gates.count(g => !g._1 && !g._2).toLong
    val po = (n11 + n00).toDouble / n.toDouble
    val pe = (BigInt(n11 + n10) * (n11 + n01) +
      BigInt(n01 + n00) * (n10 + n00)).toDouble / (n.toDouble * n.toDouble)
    assert(r.getAs[Long]("n") === n)
    assert(r.getAs[Long]("n11") === n11)
    assert(r.getAs[Long]("n10") === n10)
    assert(r.getAs[Long]("n01") === n01)
    assert(r.getAs[Long]("n00") === n00)
    assert(r.getAs[Double]("po") === po)
    assert(r.getAs[Double]("pe") === pe)
    assert(r.getAs[Double]("kappa") === (po - pe) / (1.0 - pe))
    // chance correction must bite: kappa strictly below raw agreement
    assert(r.getAs[Double]("kappa") < po)
  }

  // ------------------------------------------------------------ q229
  test("q229 semantic leakage matches an in-memory cell recompute") {
    val r = Similarity.q229SemanticLeak(spark, dir).head()
    val vecs = vecsInMemory
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var (s, i) = (0.0, 0); while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    val norms = vecs.map(v => v._1 -> math.sqrt(dot(v._3, v._3))).toMap
    def ivfHash(id: Long): Long =
      ((id % 2147483648L) * 2654435761L) % 4294967296L
    val seeds = vecs.sortBy(v => (ivfHash(v._1), v._1))
      .take(Similarity.IvfSeedCount).sortBy(_._1)
    def cell(v: (Long, Int, Array[Double])): Long = {
      var (bc, bid) = (-2.0, -1L)
      seeds.foreach { sd =>
        val c = dot(v._3, sd._3) / (norms(v._1) * norms(sd._1))
        if (c > bc) { bc = c; bid = sd._1 }
      }
      bid
    }
    val tagged = vecs.map(v =>
      (v._1, cell(v), (v._1 * 1000003L) % 10 < 8))
    val byCell = tagged.groupBy(_._2)
    val byId = vecs.map(v => v._1 -> v._3).toMap
    val crossPairs = byCell.values.toSeq.map(_.toSeq).flatMap { xs =>
      xs.filter(_._3).flatMap { a =>
        xs.filter(!_._3).filter { b =>
          dot(byId(a._1), byId(b._1)) /
            (norms(a._1) * norms(b._1)) > Similarity.q229Tau
        }.map(b => (a._1, b._1))
      }
    }
    assert(r.getAs[Long]("n_train") === tagged.count(_._3).toLong)
    assert(r.getAs[Long]("n_test") === tagged.count(!_._3).toLong)
    assert(r.getAs[Long]("n_cross_pairs") === crossPairs.size.toLong)
    assert(r.getAs[Long]("n_leaky_test") ===
      crossPairs.map(_._2).distinct.size.toLong)
    // accounting invariants: leaky-test is a distinct count of the
    // pair list's test side, and the rate is its test-share
    assert(r.getAs[Long]("n_leaky_test") <= r.getAs[Long]("n_cross_pairs"))
    assert(r.getAs[Long]("n_leaky_test") <= r.getAs[Long]("n_test"))
    assert(r.getAs[Double]("leak_rate") ===
      r.getAs[Long]("n_leaky_test").toDouble /
        r.getAs[Long]("n_test").toDouble)
  }

  // ------------------------------------------------------------ q230
  test("q230 PSI matches an in-memory histogram recompute") {
    val got = Curation.q230PsiDrift(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getString(3)))
    val docs = graft.core.Tables.load(spark, dir, "documents")
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    def q6(x: Double): Double = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def logit(text: String): Double = {
      val toks = text.split(" ", -1)
      val stop = toks.count(t =>
        Set("the", "a", "of", "to", "and")(t)).toDouble / toks.length
      val nc = text.length.toDouble
      val digit = (nc - text.replaceAll("[0-9]", "").length) / nc
      val upper = (nc - text.replaceAll("[A-Z]", "").length) / nc
      q6(-1.5 + 6.0 * stop - 8.0 * digit - 4.0 * upper +
        0.01 * toks.length.toDouble)
    }
    def bin(l: Double): Long =
      math.min(math.max(math.floor((l + 4.0) * 1.25).toLong, 0L), 9L)
    val binned = docs.map { case (src, text) => (src, bin(logit(text))) }
    val na = binned.length.toLong
    val gBins = binned.groupBy(_._2).map { case (b, xs) =>
      b -> xs.length.toLong }
    val expected = binned.groupBy(_._1).toSeq.sortBy(_._1).map {
      case (src, xs) =>
        val n = xs.length.toLong
        val cBins = xs.groupBy(_._2).map { case (b, ys) =>
          b -> ys.length.toLong }
        val psi = (0L until 10L).map { b =>
          val p = (cBins.getOrElse(b, 0L) + 1).toDouble / (n + 10).toDouble
          val q = (gBins.getOrElse(b, 0L) + 1).toDouble / (na + 10).toDouble
          BigDecimal(q6((p - q) * math.log(p / q)))
        }.sum.toDouble
        val verdict = if (psi > 0.25) "shifted"
          else if (psi > 0.1) "watch" else "stable"
        (src, n, psi, verdict)
    }
    assert(got.toSeq === expected)
    // verdicts must follow the industry thresholds on the psi value
    got.foreach { case (src, _, psi, verdict) =>
      val want = if (psi > 0.25) "shifted"
        else if (psi > 0.1) "watch" else "stable"
      assert(verdict === want, s"$src verdict/threshold consistency")
      assert(psi >= 0.0, s"$src PSI non-negative")
    }
    // at sf0.001 sources hold ~10 docs, so Laplace small-n noise
    // dominates and verdicts land wherever the thresholds say — the
    // consistency check above is the contract; no distribution claim
  }

  // ------------------------------------------------------------ q231
  test("q231 source JSD matches an in-memory distribution recompute") {
    val got = TextAnalysis.q231SourceJsd(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
    val docs = graft.core.Tables.load(spark, dir, "documents")
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val toks = docs.flatMap { case (src, text) =>
      text.split(" ", -1).map(src -> _) }
    val top = toks.groupBy(_._2).toSeq
      .map { case (t, xs) => (t, xs.length.toLong) }
      .sortBy { case (t, c) => (-c, t) }.take(TextAnalysis.JsdVocab)
      .map(_._1).toSet
    val bucketed = toks.map { case (src, t) =>
      (src, if (top(t)) t else "<other>") }
    val v = TextAnalysis.JsdVocab + 1
    val buckets = top.toSeq :+ "<other>"
    def q6(x: Double): Double = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val bySrc = bucketed.groupBy(_._1)
    val srcs = bySrc.keys.toSeq.sorted
    val expected = (for (i <- srcs.indices; j <- i + 1 until srcs.length)
      yield {
        val (s1, s2) = (srcs(i), srcs(j))
        val (xs, ys) = (bySrc(s1), bySrc(s2))
        val (n1, n2) = (xs.length.toLong, ys.length.toLong)
        val ca = xs.groupBy(_._2).map { case (b, zs) =>
          b -> zs.length.toLong }
        val cb = ys.groupBy(_._2).map { case (b, zs) =>
          b -> zs.length.toLong }
        val jsd = buckets.map { b =>
          val p = (ca.getOrElse(b, 0L) + 1).toDouble / (n1 + v).toDouble
          val q = (cb.getOrElse(b, 0L) + 1).toDouble / (n2 + v).toDouble
          val m = (p + q) / 2.0
          BigDecimal(q6(0.5 * p * math.log(p / m) + 0.5 * q * math.log(q / m)))
        }.sum.toDouble
        (s1, s2, n1, n2, jsd, q6(jsd / math.log(2.0)))
      }).toSeq
    assert(got.toSeq === expected)
    // JSD bounds: non-negative, below ln 2; normalized in [0, 1]
    got.foreach { case (s1, s2, _, _, nats, norm) =>
      assert(nats >= 0.0 && nats <= math.log(2.0) + 1e-9, s"($s1,$s2) bounds")
      assert(norm >= 0.0 && norm <= 1.0, s"($s1,$s2) normalized bounds")
    }
  }

  // ------------------------------------------------------------ q232
  test("q232 Poisson bootstrap matches an in-memory replicate recompute") {
    val r = Curation.q232BootstrapCi(spark, dir).head()
    val docs = graft.core.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(x => (x.getLong(0), x.getString(1)))
    def q6(x: Double): Double = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def logitMicro(text: String): Long = {
      val toks = text.split(" ", -1)
      val stop = toks.count(t =>
        Set("the", "a", "of", "to", "and")(t)).toDouble / toks.length
      val nc = text.length.toDouble
      val digit = (nc - text.replaceAll("[0-9]", "").length) / nc
      val upper = (nc - text.replaceAll("[A-Z]", "").length) / nc
      (BigDecimal(q6(-1.5 + 6.0 * stop - 8.0 * digit - 4.0 * upper +
        0.01 * toks.length.toDouble)) * 1000000).toLongExact
    }
    val lms = docs.map { case (id, text) => (id, logitMicro(text)) }
    val P = 2147483647L
    val cdf = Array(0.36787944117144233, 0.7357588823428847,
      0.9196986029286058, 0.9810118431238462, 0.9963401531726563,
      0.9994058151824183, 0.9999167588507119)
    def multOf(id: Long, rep: Long): Long = {
      val x = ((id % P) * 2654435761L + 104729L) % P
      val u = (((x * (1000003L * (rep + 1) + 17L)) +
        (7919L * (rep + 1) + 3L)) % P).toDouble / P.toDouble
      val i = cdf.indexWhere(u < _)
      if (i < 0) 7L else i.toLong
    }
    val means = (0L until Curation.BootReps.toLong).map { rep =>
      val (ws, wc) = lms.foldLeft((0L, 0L)) { case ((s, c), (id, lm)) =>
        val mlt = multOf(id, rep)
        (s + mlt * lm, c + mlt)
      }
      (rep, q6(ws.toDouble / wc.toDouble / 1000000.0))
    }
    val ranked = means.sortBy(t => (t._2, t._1)).map(_._2)
    val sm = means.map(t => BigDecimal(t._2)).sum
    val sm2 = means.map(t => BigDecimal(t._2) * BigDecimal(t._2)).sum
    val reps = Curation.BootReps
    val se = q6(math.sqrt((sm2.toDouble - sm.toDouble * sm.toDouble /
      reps.toDouble) / (reps - 1).toDouble))
    val mean = q6(lms.map(_._2).sum.toDouble / lms.length.toDouble /
      1000000.0)
    assert(r.getAs[Long]("n_docs") === lms.length.toLong)
    assert(r.getAs[Double]("mean_score") === mean)
    assert(r.getAs[Long]("n_reps") === reps.toLong)
    assert(r.getAs[Double]("ci_lo") === ranked(1))
    assert(r.getAs[Double]("ci_hi") === ranked(reps - 2))
    assert(r.getAs[Double]("se_boot") === se)
    // a real interval: ordered bounds, positive spread, and the point
    // estimate consistent with the replicate cloud
    assert(r.getAs[Double]("ci_lo") <= r.getAs[Double]("ci_hi"))
    assert(se >= 0.0)
    assert(mean >= ranked.head - 3 * se && mean <= ranked.last + 3 * se)
  }

  // ------------------------------------------------------------ q233
  test("q233 Neyman allocation matches an exact in-memory recompute") {
    val got = Curation.q233NeymanAlloc(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getDouble(7)))
    val docs = graft.core.Tables.load(spark, dir, "documents")
      .select(col("source"), col("text")).collect()
      .map(x => (x.getString(0), x.getString(1)))
    def q6(x: Double): Double = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def logitMicro(text: String): Long = {
      val toks = text.split(" ", -1)
      val stop = toks.count(t =>
        Set("the", "a", "of", "to", "and")(t)).toDouble / toks.length
      val nc = text.length.toDouble
      val digit = (nc - text.replaceAll("[0-9]", "").length) / nc
      val upper = (nc - text.replaceAll("[A-Z]", "").length) / nc
      (BigDecimal(q6(-1.5 + 6.0 * stop - 8.0 * digit - 4.0 * upper +
        0.01 * toks.length.toDouble)) * 1000000).toLongExact
    }
    val strata = docs.groupBy(_._1).toSeq.sortBy(_._1).map {
      case (src, xs) =>
        val lms = xs.map(x => logitMicro(x._2))
        val n = lms.length.toLong
        val slm = lms.map(BigInt(_)).sum
        val slm2 = lms.map(x => BigInt(x) * x).sum
        val sd = q6(math.sqrt((slm2.toDouble -
          slm.toDouble * slm.toDouble / n.toDouble) / (n - 1).toDouble))
        val wq = (BigDecimal(q6(n.toDouble * sd)) * 1000000).toLongExact
        (src, n, sd, wq)
    }
    val b = Curation.NeymanBudget
    def hamilton(ws: Seq[(String, Long)]): Map[String, Long] = {
      val tot = math.max(ws.map(_._2).sum, 1L)
      val floors = ws.map { case (s, w) =>
        (s, (BigInt(w) * b / tot).toLong, (BigInt(w) * b % tot).toLong) }
      val left = b - floors.map(_._2).sum
      val ranked = floors.sortBy(t => (-t._3, t._1)).zipWithIndex
        .map { case ((s, f, _), i) =>
          s -> (f + (if (i + 1 <= left) 1L else 0L)) }
      ranked.toMap
    }
    val ney = hamilton(strata.map(t => (t._1, t._4)))
    val prop = hamilton(strata.map(t => (t._1, t._2)))
    val expected = strata.map { case (src, n, sd, wq) =>
      (src, n, q6(sd) / 1000000.0, wq, ney(src), prop(src),
        math.min(ney(src), n), ney(src).toDouble / n.toDouble)
    }
    assert(got.toSeq === expected)
    // apportionment contract: both allocations exactly exhaust the
    // budget, and higher-variance strata get a boost over proportional
    assert(got.map(_._5).sum === b, "Neyman quotas sum to budget")
    assert(got.map(_._6).sum === b, "proportional quotas sum to budget")
  }

  // ------------------------------------------------------------ q234
  test("q234 AMS sketch matches an exact in-memory recompute") {
    val r = TextAnalysis.q234AmsF2(spark, dir).head()
    val toks = graft.core.Tables.load(spark, dir, "documents")
      .select(col("text")).collect()
      .flatMap(_.getString(0).split(" ", -1))
    val P = 2147483647L
    def th(t: String): Long =
      java.lang.Long.parseLong(md5hex(t).take(15), 16)
    val zs = (0 until TextAnalysis.AmsEstimators).map { j =>
      val a = 1000003L * (j + 1) + 17L
      val b = 7919L * (j + 1) + 3L
      toks.map { t =>
        if (((a * (th(t) % P) + b) % P) % 2 == 0) 1L else -1L
      }.sum
    }
    val xs = zs.map(z => (BigInt(z) * z).toDouble)
    val mean = xs.sum / TextAnalysis.AmsEstimators.toDouble
    val median = xs.sorted.apply(TextAnalysis.AmsEstimators / 2 - 1)
    val counts = toks.groupBy(identity).map(_._2.length.toLong)
    val f2 = counts.map(c => BigInt(c) * c).sum.toDouble
    def q6(x: Double): Double = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Long]("n_tokens") === toks.length.toLong)
    assert(r.getAs[Long]("n_distinct") === counts.size.toLong)
    assert(r.getAs[Double]("exact_f2") === f2)
    assert(r.getAs[Double]("est_mean") === mean)
    assert(r.getAs[Double]("est_median") === median)
    assert(r.getAs[Double]("rel_err_median") ===
      q6(math.abs(median - f2) / f2))
    // an unbiased estimator in the right decade: the lower-median of
    // 8 draws with sd <= sqrt(2)*F2 stays within one order of F2
    assert(median > 0.0 && median < 10.0 * f2)
  }

  // ------------------------------------------------------------ q235
  test("q235 JL distortion matches an in-memory projection recompute") {
    val r = Similarity.q235JlDistortion(spark, dir).head()
    val vecs = vecsInMemory
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var (s, i) = (0.0, 0); while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    val k = Similarity.JlDims
    val signs = (0 until k).map { j =>
      (0 until 64).map { d =>
        val x = (d * k + j).toLong
        if (((x * x * 999983L + x * 2654435761L + 17L) % 2147483647L) % 2
          == 0) 1.0 else -1.0
      }
    }
    val proj = vecs.map { v =>
      v._1 -> signs.map(row =>
        row.indices.foldLeft(0.0)((acc, d) => acc + v._3(d) * row(d)) / 4.0)
    }.toMap
    val norms = vecs.map(v => v._1 -> math.sqrt(dot(v._3, v._3))).toMap
    val byId = vecs.map(v => v._1 -> v._3).toMap
    def q6(x: Double): Double = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val ratios = vecs.groupBy(_._2).values.toSeq.flatMap { xs =>
      val ids = xs.map(_._1).toSeq.sorted
      for (i <- ids.indices; j <- i + 1 until ids.length) yield (ids(i), ids(j))
    }.flatMap { case (d1, d2) =>
      val d2sq = norms(d1) * norms(d1) + norms(d2) * norms(d2) -
        2.0 * dot(byId(d1), byId(d2))
      if (d2sq > 0.0) {
        val p2sq = (0 until k).foldLeft(0.0) { (acc, j) =>
          val d = proj(d1)(j) - proj(d2)(j); acc + d * d
        }
        Some(p2sq / d2sq)
      } else None
    }
    assert(r.getAs[Long]("n_pairs") === ratios.size.toLong)
    assert(r.getAs[Double]("mean_ratio") ===
      q6(ratios.map(x => BigDecimal(q6(x))).sum.toDouble /
        ratios.size.toDouble))
    assert(r.getAs[Double]("min_ratio") === ratios.min)
    assert(r.getAs[Double]("max_ratio") === ratios.max)
    assert(r.getAs[Long]("n_within") ===
      ratios.count(x => math.abs(x - 1.0) <= 0.25).toLong)
    // the JL contract this audit exists to measure: distortion
    // concentrates around 1 for k=16 (per-pair sd ~ sqrt(2/k) = 0.35)
    assert(r.getAs[Double]("mean_ratio") > 0.7 &&
      r.getAs[Double]("mean_ratio") < 1.3)
    assert(r.getAs[Double]("frac_within_25") > 0.25)
  }

  // ------------------------------------------------------------ q236
  test("q236 k-core trajectory matches an in-memory peel to fixpoint") {
    val got = GraphOps.q236Kcore(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // peel the SAME edge relation in memory (the edge construction is
    // q63's oracle-checked artifact; this spec tests the peeling)
    val edges = graft.queries.Dedup.ccEdges(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    var alive = edges.map(_._1).toSet
    val traj = scala.collection.mutable.Buffer(alive.size.toLong)
    for (_ <- 1 to GraphOps.KcoreRounds) {
      val deg = edges
        .filter(e => alive(e._1) && alive(e._2))
        .groupBy(_._1).map { case (n, es) => n -> es.length }
      alive = deg.filter(_._2 >= GraphOps.KcoreK).keySet
      traj += alive.size.toLong
    }
    assert(got.toSeq === traj.toSeq.zipWithIndex
      .map { case (n, r) => (r.toLong, n) })
    // the trajectory must be a genuine peel: monotone non-increasing,
    // and CONVERGED within the unrolled rounds (true k-core reached —
    // continue peeling in memory and nothing more falls out)
    assert(got.map(_._2).toSeq === got.map(_._2).toSeq.sorted.reverse)
    assert(got(GraphOps.KcoreRounds)._2 ===
      got(GraphOps.KcoreRounds - 1)._2, "unrolled rounds must converge")
    var extra = alive
    var changed = true
    while (changed) {
      val deg = edges.filter(e => extra(e._1) && extra(e._2))
        .groupBy(_._1).map { case (n, es) => n -> es.length }
      val next = deg.filter(_._2 >= GraphOps.KcoreK).keySet
      changed = next != extra
      extra = next
    }
    assert(extra.size.toLong === got(GraphOps.KcoreRounds)._2,
      "fixed-round peel equals the true k-core on this fixture")
  }

  // ------------------------------------------------------------ q237
  test("q237 watermark drop matches the model and actually fires") {
    val got = StreamingQueries.q237WatermarkAudit(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val evs = graft.core.Tables.load(spark, dir, "events")
      .selectExpr("event_id", "ts div 1000 as tus", "event_type")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val (evens, odds) = evs.partition(_._1 % 2 == 0)
    val wmMs = evens.map(_._2).max / 1000 - StreamingQueries.WmDelayMs
    val kept2 = odds.filter(e =>
      (e._2 / 3600000000L) * 3600000000L + 3600000000L > wmMs * 1000)
    val expected = (evens ++ kept2)
      .groupBy(e => ((e._2 / 3600000000L) * 3600000000L, e._3))
      .map { case ((w, t), xs) => (w, t, xs.length.toLong) }
      .toSeq.sortBy(t => (t._1, t._2))
    assert(got.toSeq === expected)
    // the audit must have teeth: a real fraction of the odd half is
    // late (the fixture spans a month; the grace window is 17 min)
    val dropped = odds.length - kept2.length
    assert(dropped > odds.length / 2,
      s"most odd rows must be late (dropped=$dropped of ${odds.length})")
    assert(got.map(_._3).sum === (evs.length - dropped).toLong,
      "surviving event mass = corpus minus dropped")
  }

  // ------------------------------------------------------------ q238
  test("q238 MI features match an in-memory contingency recompute") {
    val got = TextAnalysis.q238MiFeatures(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    val docs = graft.core.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getString(2).split(" ", -1).toSet))
    val n = docs.length.toLong
    val nl = docs.groupBy(_._2).map { case (l, xs) => l -> xs.length.toLong }
    val df = docs.flatMap(d => d._3.map(_ -> d._1)).groupBy(_._1)
      .map { case (t, xs) => t -> xs.length.toLong }
    val cand = df.toSeq.sortBy { case (t, c) => (-c, t) }
      .take(TextAnalysis.MiCandidates)
    def q6(x: Double): Double = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def term(num: Long, pt: Long, pl: Long): BigDecimal =
      if (num == 0L) BigDecimal(0)
      else BigDecimal(q6(num.toDouble / n.toDouble *
        math.log(num.toDouble * n / (pt.toDouble * pl))))
    val mi = cand.map { case (t, d) =>
      val v = nl.keys.toSeq.map { l =>
        val ntl = docs.count(x => x._2 == l && x._3(t)).toLong
        term(ntl, d, nl(l)) + term(nl(l) - ntl, n - d, nl(l))
      }.sum.toDouble
      (t, d, v)
    }
    val expected = mi.sortBy { case (t, _, v) => (-v, t) }
      .take(TextAnalysis.MiTopK).zipWithIndex
      .map { case ((t, d, v), i) => (i + 1L, t, d, v) }
    assert(got.toSeq === expected)
    // MI is non-negative and the ranking is genuinely informative:
    // the top feature must beat the bottom by a strict margin
    assert(got.forall(_._4 >= 0.0))
    assert(got.head._4 > got.last._4)
  }

  // ------------------------------------------------------------ q239
  test("q239 mutual-NN pairs match an in-memory cell recompute") {
    val got = Similarity.q239MutualNn(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val vecs = vecsInMemory
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var (s, i) = (0.0, 0); while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    val norms = vecs.map(v => v._1 -> math.sqrt(dot(v._3, v._3))).toMap
    val byId = vecs.map(v => v._1 -> v._3).toMap
    def ivfHash(id: Long): Long =
      ((id % 2147483648L) * 2654435761L) % 4294967296L
    val seeds = vecs.sortBy(v => (ivfHash(v._1), v._1))
      .take(Similarity.IvfSeedCount).sortBy(_._1)
    def cell(id: Long): Long = {
      var (bc, bid) = (-2.0, -1L)
      seeds.foreach { sd =>
        val c = dot(byId(id), sd._3) / (norms(id) * norms(sd._1))
        if (c > bc) { bc = c; bid = sd._1 }
      }
      bid
    }
    val byCell = vecs.map(_._1).groupBy(cell)
    val nn = byCell.values.flatMap { ids =>
      ids.map { a =>
        val best = ids.filter(_ != a)
          .map(b => (b, dot(byId(a), byId(b)) / (norms(a) * norms(b))))
          .minBy { case (b, c) => (-c, b) }
        a -> best
      }
    }.toMap
    val expected = nn.toSeq.flatMap { case (a, (b, c)) =>
      if (a < b && nn(b)._1 == a) Some((a, b, c)) else None
    }.sortBy(_._1)
    assert(got.toSeq === expected)
    // reciprocity is strictly rarer than one-directional top-1
    assert(got.length * 2 <= nn.size)
    // every mutual pair's cosine is its endpoints' best-in-cell score
    got.foreach { case (d1, d2, c) =>
      assert(nn(d1) === ((d2, c)) && nn(d2)._1 === d1)
    }
  }

  // ------------------------------------------------------------ q240
  test("q240 skew pre-flight matches exact per-key accounting") {
    val got = EventAnalytics.q240SkewPreflight(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6), r.getLong(7)))
    def expect(rel: String, key: String,
        keys: Seq[String]): (String, String, Long, Long, Long, Double,
        Double, Long) = {
      val byK = keys.groupBy(identity).map { case (k, xs) =>
        k -> xs.length.toLong }
      val (n, nk, mx) = (keys.length.toLong, byK.size.toLong,
        byK.values.max)
      val avg = n.toDouble / nk.toDouble
      (rel, key, n, nk, mx, avg, mx.toDouble / avg,
        (BigInt(mx) * nk + n - 1).toLong / n)
    }
    val ev = graft.core.Tables.load(spark, dir, "events")
      .selectExpr("CAST(user_id AS STRING)", "event_type").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val src = graft.core.Tables.load(spark, dir, "documents")
      .select(col("source")).collect().map(_.getString(0))
    val expected = Seq(
      expect("documents", "source", src.toSeq),
      expect("events", "event_type", ev.map(_._2).toSeq),
      expect("events", "user_id", ev.map(_._1).toSeq))
    assert(got.toSeq === expected)
    // a salt of 1 means "no salting needed"; it can never be 0
    assert(got.forall(_._8 >= 1L))
  }

  // ------------------------------------------------------------ q241
  test("q241 Benford audit matches an exact digit recompute") {
    val got = EventAnalytics.q241Benford(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    val vals = graft.core.Tables.load(spark, dir, "events")
      .select(col("value")).collect().map(_.getDouble(0))
    def q6abs(x: Double): BigDecimal = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).abs
    val digits = vals.map(v => q6abs(v).bigDecimal.toPlainString
        .find(c => c >= '1' && c <= '9'))
      .collect { case Some(c) => (c - '0').toLong }
    val n = digits.length.toLong
    val byD = digits.groupBy(identity).map { case (d, xs) =>
      d -> xs.length.toLong }
    def q6(x: Double): Double = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val ps = (1 to 9).map(d => math.log10(1.0 + 1.0 / d))
    val chi = (1L to 9L).map { d =>
      val o = byD.getOrElse(d, 0L)
      val e = n * ps((d - 1).toInt)
      BigDecimal(q6((o.toDouble - e) * (o.toDouble - e) / e))
    }.sum.toDouble
    val expected = (1L to 9L).map { d =>
      val o = byD.getOrElse(d, 0L)
      (d, o, o.toDouble / n.toDouble, ps((d - 1).toInt), chi)
    }
    assert(got.toSeq === expected)
    // the audit's accounting identities (the verdict itself is
    // data-dependent — this fixture's wide-ranged values land chi2≈8,
    // consistent with Benford at the 0.05 level, which is exactly the
    // kind of answer the audit exists to report)
    assert(chi >= 0.0)
    assert(got.map(_._2).sum === n)
    assert(math.abs(got.map(_._3).sum - 1.0) < 1e-9,
      "observed shares sum to one")
    assert(math.abs(got.map(_._4).sum - 1.0) < 1e-9,
      "Benford expectations sum to one")
  }

  // ------------------------------------------------------------ q242
  test("q242 group k-fold matches an in-memory assignment recompute") {
    val got = Curation.q242GroupKfold(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getLong(5)))
    val groups = graft.queries.Dedup.qDedupGroups(spark, dir)
      .select(col("doc_id"), col("group_id")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val docs = graft.core.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1).length.toLong))
    val n = docs.length.toLong
    val assigned = docs.map { case (id, nt) =>
      val grp = groups.getOrElse(id, id)
      (grp * 1000003L % Curation.KFolds, grp, nt)
    }
    val expected = assigned.groupBy(_._1).toSeq.sortBy(_._1).map {
      case (f, xs) =>
        (f, xs.length.toLong, xs.map(_._2).distinct.length.toLong,
          xs.map(_._3).sum, xs.length.toDouble / n.toDouble, 0L)
    }
    assert(got.toSeq === expected)
    // the leakage contract: no dup group straddles folds, every doc
    // is in exactly one fold, shares sum to one
    assert(got.forall(_._6 === 0L), "no group may straddle folds")
    assert(got.map(_._2).sum === n)
    assert(math.abs(got.map(_._5).sum - 1.0) < 1e-9)
  }
}
