package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Scale contract for the perceptual-hash banding (round 3 flagged the
  * old 4-nibble/16-bit band keys: 65,536 buckets per band means ~10^3+
  * rows per bucket at 10^8 blobs and a quadratic within-bucket join).
  *
  *  - band keys are ≥ 32 bits (8 nibbles of a 64-nibble hash);
  *  - the band join is exhaustive for the ≤2-nibble verify ball
  *    (pigeonhole over 8 bands) and prunes cross-group pairs;
  *  - band-bucket occupancy tracks N/2^32: distinct band keys ≈ N with
  *    no birthday saturation at any realistic N.
  */
class PhashScaleSpec extends SparkSuite {

  import spark.implicits._

  test("band keys are >= 32 bits and cover the hash exactly") {
    assert(Multimodal.PhashBandNibbles * 4 >= 32)
    assert(Multimodal.PhashNumBands * Multimodal.PhashBandNibbles ==
      Multimodal.PhashNibbles)
  }

  test("band join catches <= 2-nibble flips and prunes all-band differences") {
    val base = "0123456789abcdef" * 4 // 64 nibbles
    def flip(s: String, pos: Int): String =
      s.updated(pos, if (s(pos) == 'f') '0' else 'f')
    val hashed = Seq(
      (1L, base),
      (2L, flip(base, 3)),                 // 1 nibble, band 0
      (3L, flip(flip(base, 3), 11)),       // 2 nibbles, bands 0+1
      (4L, (0 until 8).foldLeft(base)((s, b) => flip(s, b * 8))) // every band
    ).toDF("doc_id", "ph")
    val pairs = Multimodal.phashBandPairs(hashed)
      .select($"d1", $"d2").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)) && pairs.contains((1L, 3L)))
    assert(!pairs.contains((1L, 4L)), "pair differing in every band must be pruned")
  }

  test("band-bucket occupancy tracks N / 2^32 — no 16-bit saturation") {
    // 20,000 pseudo-random 64-nibble hashes: 32-bit band keys give
    // ~N^2/2^33 ≈ 0.05 expected birthday collisions (distinct ≈ N).
    // The old 16-bit keys would cap at 65,536 and already sit at
    // ~17,300 distinct here.
    val n = 20000L
    val hashed = spark.range(n).withColumn("ph", expr(
      """array_join(transform(sequence(0, 3),
        |  i -> md5(concat('occ:', CAST(i AS STRING), ':', CAST(id AS STRING)))), '')""".stripMargin))
    val distincts = (0 until Multimodal.PhashNumBands).map { b =>
      hashed.select(substring($"ph", 1 + Multimodal.PhashBandNibbles * b,
        Multimodal.PhashBandNibbles).as("band"))
        .agg(countDistinct($"band")).as[Long].head()
    }
    distincts.foreach(d => assert(d >= 19990L, s"band saturating: $d distinct of $n"))
  }
}
