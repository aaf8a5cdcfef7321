package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Scale contract for the 60-bit simhash + Hamming-ball banding
  * (round 3 flagged the old 16-bit signature space: at 10^7 docs every
  * one of 65,536 values collides by pigeonhole and "shared signature"
  * stops meaning near-duplicate).
  *
  *  - the signature space is genuinely 60-bit wide (not 16);
  *  - the 3×20-bit band join is EXHAUSTIVE for Hamming ≤ 2 (pigeonhole:
  *    ≤2 flipped bits touch ≤2 bands, one band must match) and prunes
  *    signatures that differ in every band;
  *  - band-bucket occupancy tracks N/2^20, not N/65,536 — distinct band
  *    keys keep growing with N instead of saturating.
  */
class SimhashScaleSpec extends SparkSuite {

  import spark.implicits._

  private val base = 0x123456789ABCDEFL // < 2^60

  test("band join is exhaustive for Hamming <= 2 and prunes all-bands-touched pairs") {
    val sigs = Seq(
      (1L, base),
      (2L, base ^ (1L << 5)),                               // 1 bit, band 0
      (3L, base ^ (1L << 5) ^ (1L << 25)),                  // 2 bits, bands 0+1
      (4L, base ^ (1L << 5) ^ (1L << 25) ^ (1L << 45))      // 3 bits, all bands
    ).toDF("doc_id", "simhash")
    val pairs = Dedup.simhashBandPairs(sigs)
      .select($"d1", $"d2").as[(Long, Long)].collect().toSet
    // Hamming <= 2 pairs vs doc 1 are candidates (>= 1 untouched band)
    assert(pairs.contains((1L, 2L)) && pairs.contains((1L, 3L)))
    // doc 4 differs from doc 1 in every band -> correctly not a candidate
    assert(!pairs.contains((1L, 4L)))
    // docs 2/3/4 differ pairwise in <= 2 bands -> all candidates
    assert(pairs.contains((2L, 3L)) && pairs.contains((2L, 4L)) &&
      pairs.contains((3L, 4L)))
  }

  test("xor+popcount Hamming verify matches constructed distances") {
    val sigs = Seq(
      (1L, base),
      (2L, base ^ (1L << 5)),
      (3L, base ^ (1L << 5) ^ (1L << 25))).toDF("doc_id", "simhash")
    val verified = Dedup.simhashBandPairs(sigs)
      .withColumn("hamming", expr("bit_count(s1 ^ s2)"))
      .select($"d1", $"d2", $"hamming").as[(Long, Long, Int)]
      .collect().map { case (a, b, h) => (a, b) -> h }.toMap
    assert(verified((1L, 2L)) == 1)
    assert(verified((1L, 3L)) == 2)
    assert(verified((2L, 3L)) == 1)
  }

  test("band-bucket occupancy tracks N / 2^20 — no 16-bit saturation") {
    // 20,000 pseudo-random 60-bit signatures: with 2^20 buckets per
    // band, birthday collisions cost ~N^2/2^21 ≈ 190 duplicates, so
    // distinct band keys stay ~N. A 16-bit key space (65,536 buckets)
    // would already have collapsed to ≤ 17,300 distinct here — and to
    // 65,536 flat at any larger N.
    val n = 20000L
    val sigs = spark.range(n).withColumn("simhash",
      expr("CAST(conv(substring(md5(CAST(id AS STRING)), 1, 15), 16, 10) AS BIGINT)"))
    val distincts = (0 until Dedup.SimhashNumBands).map { b =>
      val shift = 1L << (b * Dedup.SimhashBandBits)
      val mod = 1L << Dedup.SimhashBandBits
      sigs.select(expr(s"(simhash div $shift) % $mod").as("sb"))
        .agg(countDistinct($"sb")).as[Long].head()
    }
    distincts.foreach(d => assert(d >= 19000L, s"band saturating: $d distinct of $n"))
  }

  test("real-corpus signatures span the wide space (not 16-bit)") {
    val maxSig = Dedup.signaturesOf(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet"))
      .agg(max($"simhash")).as[Long].head()
    assert(maxSig > (1L << 40), s"max simhash $maxSig should use high bits")
    assert(maxSig < (1L << 60), "simhash must stay within 60 bits")
  }
}
