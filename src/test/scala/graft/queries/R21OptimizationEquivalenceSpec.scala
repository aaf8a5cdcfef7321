package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.SparkSuite

/** Round-21 optimization equivalence pins: the restructured operators
  * replaced computations with forms argued bit-identical; this spec
  * pins the two arguments that are LOCAL algebra (not covered by a
  * plan audit or the oracle hash alone, and cheap to fuzz here).
  *
  *  - [[Relational.dmeanFinish]]: a mean finished over per-group
  *    decimal sums must equal [[Relational.dmean]] computed directly —
  *    the q254 single-pass restructure leans on decimal-addition
  *    associativity plus the shared integer tie-break.
  *  - q35's bitwise nibble-Hamming (8×32-bit words, XOR + nibble-flag
  *    fold + bit_count) must equal the interpreted substring-lambda
  *    count it replaced, including at the hamming ≤ 2 boundary.
  */
class R21OptimizationEquivalenceSpec extends SparkSuite {

  test("dmeanFinish over regrouped decimal sums equals direct dmean") {
    import spark.implicits._
    val rng = new scala.util.Random(2121)
    // values chosen to include real rounding ties (multiples of 1e-6)
    // and negatives; groups of uneven size
    val rows = (1 to 997).map { i =>
      (i % 13, math.round(rng.nextGaussian() * 1e6) / 1e6 *
        (if (i % 7 == 0) -1 else 1))
    }
    val df = rows.toDF("g", "x")
    for (scale <- Seq(0, 3, 6)) {
      val direct = df.agg(Relational.dmean(col("x"), scale)).head.getDouble(0)
      val regrouped = df.groupBy("g")
        .agg(sum(col("x").cast(DecimalType(25, 6))).as("s"),
          count(lit(1)).as("n"))
        .agg(Relational.dmeanFinish(sum(col("s")), sum(col("n")), scale))
        .head.getDouble(0)
      assert(java.lang.Double.doubleToLongBits(direct) ===
        java.lang.Double.doubleToLongBits(regrouped),
        s"scale $scale: direct $direct != regrouped $regrouped")
    }
  }

  test("bitwise nibble-Hamming equals the substring-lambda count") {
    import spark.implicits._
    val rng = new scala.util.Random(35)
    val hex = "0123456789abcdef"
    def randHash(): String = Seq.fill(64)(hex(rng.nextInt(16))).mkString
    // pairs at controlled distances 0,1,2,3 plus random far pairs —
    // the <=2 gate boundary is the value-bearing region
    def mutate(h: String, n: Int): String = {
      val idx = rng.shuffle((0 until 64).toList).take(n)
      idx.foldLeft(h) { (acc, i) =>
        val alt = hex((hex.indexOf(acc(i)) + 1 + rng.nextInt(15)) % 16)
        acc.updated(i, alt)
      }
    }
    val pairs = (0 until 40).flatMap { _ =>
      val a = randHash()
      Seq(0, 1, 2, 3, rng.nextInt(60) + 4).map(d => (a, mutate(a, d)))
    }
    val df = pairs.toDF("p1", "p2")
    val lambda = expr(
      "size(filter(sequence(1, 64, 1), i -> substring(p1, i, 1) != substring(p2, i, 1)))")
    val mask = java.lang.Long.parseLong("1111111111111111", 16)
    val words = (0 until 8).flatMap(i => Seq(
      expr(s"CAST(conv(substring(p1, ${8 * i + 1}, 8), 16, 10) AS BIGINT)")
        .as(s"pa$i"),
      expr(s"CAST(conv(substring(p2, ${8 * i + 1}, 8), 16, 10) AS BIGINT)")
        .as(s"pb$i")))
    val bitwise = expr((0 until 8).map { i =>
      val x = s"(pa$i ^ pb$i)"
      s"bit_count((($x | ($x >> 1) | ($x >> 2) | ($x >> 3)) & $mask))"
    }.mkString(" + "))
    val out = df.select(col("p1") +: col("p2") +: words: _*)
      .select(lambda.as("lam"), bitwise.as("bit"))
      .collect()
    out.foreach(r => assert(r.getInt(0) === r.getInt(1)))
  }
}
