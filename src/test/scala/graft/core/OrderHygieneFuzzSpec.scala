package graft.core

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property pin for the [[OrderHygiene]] scanner itself: a guard with
  * silent FALSE NEGATIVES grants false confidence, so the scanner's
  * recall is fuzzed — statements with a known number of planted
  * order-sensitive sites (top-k, window, ordered aggregate) mixed
  * with known non-sites (subquery sort without LIMIT, presentation
  * sort, quoted decoys) must scan back to exactly the planted sites
  * with exactly the planted trailing keys, across random identifiers,
  * directions, NULLS modifiers, frame clauses, function-call keys,
  * whitespace, and keyword case. */
class OrderHygieneFuzzSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(res.passed, res.status.toString)
  }

  private val ident: Gen[String] = for {
    h <- Gen.alphaLowerChar
    t <- Gen.listOfN(4, Gen.frequency(5 -> Gen.alphaLowerChar,
      1 -> Gen.const('_'), 1 -> Gen.numChar))
  } yield (h :: t).mkString

  private val dir: Gen[String] =
    Gen.oneOf("", " ASC", " DESC", " desc", " ASC NULLS LAST",
      " DESC NULLS FIRST")

  // a non-trailing key may be a bare column or a function call whose
  // arguments contain commas (the depth trap)
  private def headKey: Gen[String] = for {
    a <- ident; b <- ident
    k <- Gen.oneOf(a, s"coalesce($a, $b)", s"abs($a)", s"$a * 2")
    d <- dir
  } yield k + d

  /** A planted site: rendered keys + the expected trailing key. */
  private case class Planted(keys: String, trailing: String)

  private val keyList: Gen[Planted] = for {
    nHead <- Gen.chooseNum(0, 2)
    heads <- Gen.listOfN(nHead, headKey)
    last <- ident
    d <- dir
  } yield Planted((heads :+ (last + d)).mkString(", "), last)

  // rendered oracle SQL is post-stripMargin: whitespace but no '|'
  private val ws: Gen[String] = Gen.oneOf(" ", "  ", "\n  ", "\n\t")
  private val orderBy: Gen[String] =
    Gen.oneOf("ORDER BY", "order by", "Order  By")

  private def topk(p: Planted, w: String, ob: String): String =
    s"SELECT * FROM t $ob$w${p.keys}${w}LIMIT 5"

  private def window(p: Planted, w: String, ob: String): String = {
    val frame = " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
    s"SELECT sum(x) OVER (PARTITION BY g $ob$w${p.keys}$frame) FROM t"
  }

  private def agg(p: Planted, w: String, ob: String): String =
    s"SELECT array_agg(x $ob$w${p.keys}) FROM t"

  private def nonSite(w: String, ob: String): Gen[String] = for {
    k <- ident
    s <- Gen.oneOf(
      s"SELECT * FROM (SELECT * FROM t $ob$w$k DESC) q", // subquery, no LIMIT
      s"SELECT * FROM t WHERE s = 'x $ob y LIMIT 1'", // quoted decoy
      s"SELECT * FROM t") // no sort at all
  } yield s

  test("the scanner finds every planted site and nothing else") {
    val gen = for {
      kind <- Gen.oneOf("topk", "window", "agg")
      p <- keyList
      w <- ws
      ob <- orderBy
      noise <- nonSite(" ", "ORDER BY")
      // a trailing presentation sort must never register as a site
      tail <- Gen.oneOf("", " ORDER BY zzz DESC")
    } yield {
      val body = kind match {
        case "topk" => topk(p, w, ob)
        case "window" => window(p, w, ob)
        case "agg" => agg(p, w, ob)
      }
      // compose: noise subquery/decoy as a CTE-ish prefix line, then
      // the site statement, then an optional presentation sort
      (kind, p, s"$body /* ${""} */ $tail", noise)
    }
    check(Prop.forAll(gen) { case (kind, p, sql, noise) =>
      val found = OrderHygiene.sites(sql)
      val noiseFound = OrderHygiene.sites(noise)
      found.size == 1 &&
        found.head.kind == kind &&
        found.head.trailingKey == p.trailing &&
        noiseFound.isEmpty
    })
  }

  test("trailing-key extraction survives adversarial key lists") {
    // commas inside nested calls at any depth never split the keys
    val gen = for {
      a <- ident; b <- ident; c <- ident; last <- ident
      d <- dir
    } yield (last,
      s"SELECT * FROM t ORDER BY greatest($a, least($b, $c), 2), " +
        s"$last$d LIMIT 3")
    check(Prop.forAll(gen) { case (last, sql) =>
      val found = OrderHygiene.sites(sql)
      found.size == 1 && found.head.trailingKey == last
    })
  }
}
