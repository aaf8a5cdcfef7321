package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** LSH band-key semantics for degenerate documents: a doc with < 3
  * tokens has an empty shingle set, all-NULL minhashes, and must get
  * NULL band keys. With `concat_ws` alone every short doc would share
  * the identical "" key per band — one quadratic all-pairs candidate
  * block at scale (and a divergence from the DuckDB twin, where `||`
  * over NULL yields NULL). NULL never equi-joins: short docs simply
  * drop out of candidate generation in both engines. */
class DedupBandSpec extends SparkSuite {

  test("empty-shingle docs get NULL bands; normal docs get real keys") {
    import spark.implicits._
    val docRows = Seq(
      (1L, "only two"),                          // < 3 tokens: no shingles
      (2L, ""),                                  // empty
      (3L, "a proper document with five tokens"),
      (4L, "a proper document with five tokens") // exact dup of 3
    ).toDF("doc_id", "text")
    val sig = Dedup.signaturesOf(docRows)
      .select(col("doc_id"), col("band0"), col("band1"), col("band2"), col("band3"))
      .collect().map(r => r.getLong(0) -> (1 to 4).map(r.isNullAt)).toMap

    assert(sig(1L).forall(identity), "short doc must have all-NULL bands")
    assert(sig(2L).forall(identity), "empty doc must have all-NULL bands")
    assert(sig(3L).forall(!_), "real doc must have non-NULL bands")
  }

  test("short docs never become LSH candidates (no all-pairs block)") {
    import spark.implicits._
    val docRows = (1L to 50L).map(i => (i, "tiny")).toDF("doc_id", "text")
    val sig = Dedup.signaturesOf(docRows)
    val a = sig.select(col("doc_id").as("d1"), col("band0").as("b"))
    val b = sig.select(col("doc_id").as("d2"), col("band0").as("b"))
    val cand = a.join(b, "b").filter(col("d1") < col("d2"))
    assert(cand.count() == 0,
      "50 short docs must produce 0 candidates, not 1225 all-pairs")
  }

  // the dataset-level dedup operators work over ARBITRARY relations —
  // caller-named id/text columns, extra columns riding through — not
  // just the fixture `documents` table
  private def corpus = {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog again and again"
    Seq(
      (101L, base, "keep-a"),
      (102L, base, "dup-of-101"),                       // exact dup
      (103L, base + " tail", "near-dup-of-101"),        // near dup
      (104L, "an entirely different sentence about spark shuffles and joins", "keep-b"),
      (105L, "zx", "short-doc")                         // no shingles
    ).toDF("my_id", "body", "tag")
  }

  test("general dedupNearLSH: caller columns, smaller id survives, extras intact") {
    import spark.implicits._
    val out = Dedup.dedupNearLSH(corpus, "body", "my_id", 0.5)
      .select($"my_id", $"tag").as[(Long, String)].collect().toMap
    assert(out.keySet == Set(101L, 104L, 105L),
      s"dups of 101 must die, unrelated + short docs survive: ${out.keySet}")
    assert(out(101L) == "keep-a", "non-key columns must ride through")
    assert(out.size == 3)
  }

  test("general dedupNearSimhash: kill rule on arbitrary relation, radius guard") {
    import spark.implicits._
    val out = Dedup.dedupNearSimhash(corpus, "body", "my_id", 2)
      .select($"my_id").as[Long].collect().toSet
    assert(out.contains(101L) && !out.contains(102L),
      s"identical simhash must kill the larger id: $out")
    assert(out.contains(104L) && out.contains(105L))
    // beyond the exhaustive Hamming-ball radius the result would be
    // bucket luck — rejected loudly
    intercept[IllegalArgumentException] {
      Dedup.dedupNearSimhash(corpus, "body", "my_id", 3)
    }
    Dedup.clearSignatureCache()
  }

  // The round-18 integer threshold gates (Dedup.minhashPairsFrom,
  // Curation q104/q148) flipped the degenerate BOTH-EMPTY-shingle-set
  // candidate from dropped to kept: the old double filters gave
  // NULL/error on 0/0, while `3*0 >= 0+0` (and the den/num forms) is
  // TRUE. That branch is unreachable only via the invariant that
  // zero-shingle docs get NULL band keys and never become candidates
  // — pinned here so a future shingle/banding change can't silently
  // activate it.
  test("identical zero-shingle docs never pair: the 0>=0 gate branch is unreachable") {
    import spark.implicits._
    val docRows = Seq(
      (1L, "zx"), (2L, "zx"),   // identical < 3-token docs: empty shingle sets
      (3L, ""), (4L, ""),       // identical empty docs
      (5L, "a genuinely long document with plenty of shingles inside")
    ).toDF("doc_id", "text")
    val sig = Dedup.signaturesOf(docRows)

    // 1. all band keys NULL for every zero-shingle doc, across ALL bands
    val bandCols = (0 until Dedup.NumBands).map(b => s"band$b")
    val shortBands = sig.filter(col("doc_id") < 5L)
      .select(bandCols.map(col): _*).collect()
    assert(shortBands.length == 4 &&
      shortBands.forall(r => bandCols.indices.forall(r.isNullAt)),
      "zero-shingle docs must have NULL band keys in every band")

    // 2. the real candidate generator emits NO pair for them
    val cand = graft.operators.LshBands.candidatePairs(
      sig.drop("sh"), "doc_id", bandCols).collect()
    assert(cand.isEmpty,
      s"identical zero-shingle docs must never become candidates: ${cand.toSeq}")

    // 3. end-to-end: the public operator keeps BOTH identical short
    // docs (the 0>=0 branch, if ever reached, would kill one)
    val out = Dedup.dedupNearLSH(docRows, "text", "doc_id", 0.5)
      .select($"doc_id").as[Long].collect().toSet
    assert(out == Set(1L, 2L, 3L, 4L, 5L),
      s"zero-shingle docs must all survive near-dedup: $out")

    // 4. canary: if the bands ever became non-NULL for empty-shingle
    // docs ("" is the concat_ws failure mode), the pair WOULD form and
    // the integer gate WOULD keep it — i.e. the invariant above is
    // load-bearing, not vacuous.
    val broken = bandCols.foldLeft(sig.drop("sh")) { (df, b) =>
      df.withColumn(b, coalesce(col(b), lit("")))
    }
    val brokenCand = graft.operators.LshBands.candidatePairs(
      broken, "doc_id", bandCols)
      .filter(col("d1") < 5L && col("d2") < 5L).count()
    assert(brokenCand > 0,
      "canary: non-NULL empty bands must produce candidate pairs — " +
        "if this fails the test above is no longer guarding anything")
    val zeroGateKeeps = spark.range(1).select(
      expr("3 * size(array_intersect(array(), array())) >= " +
        "size(CAST(array() AS ARRAY<BIGINT>)) + size(CAST(array() AS ARRAY<BIGINT>))")).first().getBoolean(0)
    assert(zeroGateKeeps,
      "canary: the integer gate evaluates 0>=0 = true on empty sets — " +
        "the NULL-band invariant is what keeps this branch unreachable")
    Dedup.clearSignatureCache() // dedupNearLSH persisted this corpus's signatures
  }

  test("threshold contract: short decimals (incl. sub-0.001) pass, computed doubles fail fast") {
    import spark.implicits._
    val df = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    // 4 decimal places renders as "1.0E-4" — must still be accepted
    Dedup.dedupNearLSH(df, "text", "doc_id", 0.0001)
    Dedup.clearSignatureCache()
    // a computed double (scale 17) must fail at plan time with the
    // contract named, not overflow the Long cross-multiplication later
    val e = intercept[IllegalArgumentException] {
      Dedup.dedupNearLSH(df, "text", "doc_id", 0.1 + 0.2)
    }
    assert(e.getMessage.contains("short decimal"), e.getMessage)
    Dedup.clearSignatureCache()
  }
}
