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
}
