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
}
