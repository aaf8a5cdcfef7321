package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Scale contract for the parameterized SRP-LSH band sizing (round 4
  * flagged the (8, 8) compile-time constants: 256 buckets/band is
  * sized for the ≤5·10^3-vector fixture and goes quadratic at 10^9
  * vectors — the knob existed but needed a recompile to turn).
  *
  *  - [[SrpConfig.forExpectedN]] implements the documented rule
  *    `bits ≈ log2(N / targetOccupancy)`: bucket count tracks N, so
  *    occupancy stays ~constant at any corpus size;
  *  - growing bitsPerBand genuinely widens the band key space on data:
  *    distinct band keys grow, candidate volume falls;
  *  - plane generation is prefix-stable: a wider config agrees with a
  *    narrower one on every shared hyperplane, so re-sizing never
  *    silently re-randomizes the family;
  *  - identical vectors collide in every band under any config — the
  *    recall floor LSH must never lose;
  *  - the fixture default stays (8, 8), pinning q55 oracle parity.
  */
class SrpScaleSpec extends SparkSuite {

  import spark.implicits._

  /** Deterministic pseudo-random 64-dim float vectors — hash-mixed per
    * (id, dim) so components are near-uniform in [-1, 1] (a sin ramp
    * makes every vector a phase shift of one wave, which defeats the
    * banding assertions). */
  private def corpus(n: Int): DataFrame =
    spark.range(n).select(col("id").as("vec_id"),
      expr("transform(sequence(1, 64), " +
        "i -> CAST(pmod(hash(id, i), 1000) / 499.5 - 1.0 AS FLOAT))")
        .as("embedding"))

  test("forExpectedN derives bits = clamp(ceil(log2(N / occupancy)))") {
    // fixture corpus: 5000 / 20 = 250 -> 8 bits (the shipped default)
    assert(SrpConfig.forExpectedN(5000L) == SrpConfig(8, 8))
    // 10^9 vectors: log2(5e7) = 25.6 -> clamped to MaxBits = 24
    assert(SrpConfig.forExpectedN(1000000000L).bitsPerBand == 24)
    // tiny corpora clamp up to MinBits, never degenerate 1-bit bands
    assert(SrpConfig.forExpectedN(10L).bitsPerBand == SrpConfig.MinBits)
    // monotone: more data never means fewer buckets
    val bitsBySize = Seq(1000L, 100000L, 10000000L, 1000000000L)
      .map(SrpConfig.forExpectedN(_).bitsPerBand)
    assert(bitsBySize == bitsBySize.sorted)
    // occupancy tracks the target once inside the clamp range
    val cfg = SrpConfig.forExpectedN(1000000L)
    assert(cfg.expectedOccupancy(1000000L) <= SrpConfig.DefaultTargetOccupancy)
  }

  test("fixture default stays (8, 8) — q55 oracle parity pin") {
    assert(SrpConfig.Default == SrpConfig(8, 8))
    assert(SrpConfig.Default.planes == 64)
  }

  test("wider bands widen the key space and shrink candidate volume") {
    val n = 2000
    val df = corpus(n)
    def distinctBandKeys(cfg: SrpConfig): Long =
      Similarity.srpBandedOf(df, "vec_id", "embedding", cfg)
        .select(countDistinct(col("srp0"))).as[Long].head()
    def candidates(cfg: SrpConfig): Long = {
      val banded = Similarity.srpBandedOf(df, "vec_id", "embedding", cfg)
      graft.operators.LshBands.candidatePairs(banded, "vec_id",
        (0 until cfg.bands).map(b => s"srp$b")).count()
    }
    val narrow = SrpConfig(2, 6)  // 64 buckets/band
    val wide = SrpConfig(2, 12)   // 4096 buckets/band
    val dNarrow = distinctBandKeys(narrow)
    val dWide = distinctBandKeys(wide)
    assert(dWide > dNarrow,
      s"wider band should spread keys: $dWide vs $dNarrow")
    // 64 buckets over 2000 rows saturate (~all 64 used)
    assert(dNarrow <= narrow.bucketsPerBand)
    val cNarrow = candidates(narrow)
    val cWide = candidates(wide)
    assert(cWide < cNarrow,
      s"wider bands must cut candidate volume: $cWide vs $cNarrow")
    // occupancy-driven bound: candidates ~ bands * N * occupancy / 2;
    // at 12 bits (occupancy < 1) the candidate set collapses to near
    //-true-positives only, two orders below the 6-bit volume
    assert(cWide < cNarrow / 10,
      s"12-bit bands should cut candidates >=10x: $cWide vs $cNarrow")
  }

  test("plane family is prefix-stable across config growth") {
    val df = corpus(200)
    // (1, 8) and (2, 8) share band 0's eight planes exactly
    val a = Similarity.srpBandedOf(df, "vec_id", "embedding", SrpConfig(1, 8))
      .select(col("vec_id"), col("srp0").as("a0"))
    val b = Similarity.srpBandedOf(df, "vec_id", "embedding", SrpConfig(2, 8))
      .select(col("vec_id"), col("srp0").as("b0"))
    assert(a.join(b, "vec_id").filter(col("a0") =!= col("b0")).count() == 0L)
  }

  test("identical vectors are candidates and verify at cosine 1 under any config") {
    // plant an exact duplicate pair in a 500-vector corpus
    val df = corpus(500).union(
      corpus(1).select(lit(9001L).as("vec_id"), col("embedding")))
    for (cfg <- Seq(SrpConfig(2, 6), SrpConfig(8, 8), SrpConfig(4, 12))) {
      val pairs = Similarity.srpNearDup(df, "vec_id", "embedding", 0.999, cfg)
        .select($"d1", $"d2").as[(Long, Long)].collect().toSet
      assert(pairs.contains((0L, 9001L)),
        s"exact dup must survive banding under $cfg")
    }
    Similarity.clearSrpCache()
  }

  test("oracle SQL renders from the same config (bands flow into both dialects)") {
    val cfg = SrpConfig(4, 6)
    val sql = Similarity.srpNearDupSql(cfg)
    assert((0 until 4).forall(b => sql.contains(s"AS srp$b")))
    assert(!sql.contains("AS srp4"))
    assert((0 until 4).forall(b => sql.contains(s"a.srp$b = b.srp$b")))
    // default rendering == the shipped q55 oracle
    assert(Similarity.srpNearDupSql(SrpConfig.Default) == Similarity.qSrpNearDupSql)
  }
}
