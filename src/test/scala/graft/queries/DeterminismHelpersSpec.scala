package graft.queries

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSuite

/** Property pins for the round-16 exact-rounding helpers
  * ([[Relational.dmean]]/[[Relational.dratio]]/[[Relational.DLIT]]):
  * the integer `(2p + q) div (2q)` forms must implement EXACTLY
  * "round the exact rational half-away-from-zero at `scale` dp" — a
  * sign or off-by-one slip would agree with DuckDB's mirrored formula
  * (same slip both sides) and still pass the oracle gate, so only a
  * reference recomputation pins the CLAIMED semantics. Reference =
  * java.math.BigDecimal division with RoundingMode.HALF_UP (which is
  * half-away-from-zero for signed values). */
class DeterminismHelpersSpec extends SparkSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  test("dmean == BigDecimal HALF_UP mean of exact 6-dp inputs") {
    // values in exact micro-units (the dsum contract: inputs quantize
    // to 6 dp before the sum), signs mixed, group sizes 1..40
    val vGen = Gen.chooseNum(-2000000000L, 2000000000L) // ±2000.000000
    val gGen = for {
      n <- Gen.chooseNum(1, 40)
      vs <- Gen.listOfN(n, vGen)
      scale <- Gen.chooseNum(0, 6)
    } yield (vs, scale)
    check(Prop.forAll(gGen) { case (unitsList, scale) =>
      import scala.jdk.CollectionConverters._
      val df = spark.createDataFrame(
        unitsList.map(u => org.apache.spark.sql.Row(u / 1e6)).asJava,
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("v",
            org.apache.spark.sql.types.DoubleType))))
      val got = df.agg(Relational.dmean(col("v"), scale)).head().getDouble(0)
      // reference: exact rational (sum of micro-units)/(n·10⁶), then
      // HALF_UP at `scale` (BigDecimal HALF_UP = half-away-from-zero)
      val sum = unitsList.foldLeft(JBigDecimal.ZERO)((a, u) =>
        a.add(new JBigDecimal(u)))
      val expect = sum
        .divide(new JBigDecimal(unitsList.size.toLong * 1000000L),
          scale, RoundingMode.HALF_UP)
        .doubleValue()
      got == expect ||
        (sys.error(s"dmean($unitsList, $scale): got $got expect $expect"))
    })
  }

  test("dratio == BigDecimal HALF_UP ratio of non-negative integers") {
    val gGen = for {
      q <- Gen.chooseNum(1L, 5000000L)
      p <- Gen.chooseNum(0L, q) // a rate: p/q in [0, 1]
      scale <- Gen.chooseNum(0, 9)
    } yield (p, q, scale)
    check(Prop.forAll(gGen) { case (p, q, scale) =>
      import scala.jdk.CollectionConverters._
      val df = spark.createDataFrame(
        List(org.apache.spark.sql.Row(p, q)).asJava,
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("p",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("q",
            org.apache.spark.sql.types.LongType))))
      val got = df.select(Relational.dratio(col("p"), col("q"), scale))
        .head().getDouble(0)
      val expect = new JBigDecimal(p)
        .divide(new JBigDecimal(q), scale, RoundingMode.HALF_UP)
        .doubleValue()
      got == expect ||
        (sys.error(s"dratio($p, $q, $scale): got $got expect $expect"))
    })
  }

  test("dfrac == BigDecimal HALF_UP ratio of SIGNED integers") {
    val gGen = for {
      q <- Gen.chooseNum(1L, 5000000L)
      p <- Gen.chooseNum(-2L * q, 2L * q) // signed, beyond ±1
      scale <- Gen.chooseNum(0, 9)
    } yield (p, q, scale)
    check(Prop.forAll(gGen) { case (p, q, scale) =>
      import scala.jdk.CollectionConverters._
      val df = spark.createDataFrame(
        List(org.apache.spark.sql.Row(p, q)).asJava,
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("p",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("q",
            org.apache.spark.sql.types.LongType))))
      val got = df.select(Relational.dfrac(col("p"), col("q"), scale))
        .head().getDouble(0)
      // BigDecimal HALF_UP is half-away-from-zero for signed values —
      // exactly the claimed dfrac contract
      val expect = new JBigDecimal(p)
        .divide(new JBigDecimal(q), scale, RoundingMode.HALF_UP)
        .doubleValue()
      got == expect ||
        (sys.error(s"dfrac($p, $q, $scale): got $got expect $expect"))
    })
  }

  test("known ties land half-up in both helpers") {
    // the r16 field cases: 0.616992/192 = 0.0032135 (q82),
    // 1/128 = 0.0078125 (the q258 class), 1/32 = 0.03125 at 4 dp
    import scala.jdk.CollectionConverters._
    def one(p: Long, q: Long, scale: Int): Double =
      spark.createDataFrame(
        List(org.apache.spark.sql.Row(p, q)).asJava,
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("p",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("q",
            org.apache.spark.sql.types.LongType))))
        .select(Relational.dratio(col("p"), col("q"), scale))
        .head().getDouble(0)
    assert(one(616992L, 192000000L, 6) === 0.003214) // q82's exact tie
    assert(one(1, 128, 6) === 0.007813)
    assert(one(1, 32, 4) === 0.0313)
    // r17 field cases: q176's score tie (n=16 tokens, 1 stopword,
    // short-doc penalty → (320−10−64)/320 = 0.76875, a real 5-dp tie
    // whose double round() Spark/DuckDB break oppositely) and the
    // signed dfrac mirror (half-AWAY-from-zero)
    def oneF(p: Long, q: Long, scale: Int): Double =
      spark.createDataFrame(
        java.util.List.of(org.apache.spark.sql.Row(p, q)),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("p",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("q",
            org.apache.spark.sql.types.LongType))))
        .select(Relational.dfrac(col("p"), col("q"), scale))
        .head().getDouble(0)
    assert(one(246, 320, 4) === 0.7688)
    assert(oneF(246, 320, 4) === 0.7688)
    assert(oneF(-246, 320, 4) === -0.7688)
    assert(oneF(-1, 128, 6) === -0.007813)
  }

  test("DLIT round-trips arbitrary doubles through DuckDB-style parse") {
    // DLIT must emit a literal whose strtod parse reproduces the
    // exact bits (that is the whole point vs DECIMAL literal parsing)
    val dGen = Gen.oneOf(
      Gen.chooseNum(-1e9, 1e9),
      Gen.chooseNum(-1.0, 1.0),
      Gen.oneOf(0.9477977920742495, 2.4999765625866033e-05, 0.0,
        1.0 / 3.0, math.Pi))
    check(Prop.forAll(dGen) { v: Double =>
      val lit = Relational.DLIT(v)
      // must carry an exponent so DuckDB parses it as DOUBLE
      (lit.contains("e") || lit.contains("E")) &&
        java.lang.Double.parseDouble(lit) == v
    })
  }
}
