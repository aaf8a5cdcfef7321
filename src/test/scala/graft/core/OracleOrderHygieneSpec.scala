package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Standing guard for the nondeterministic-order hazard class in the
  * oracle SQL: a top-k boundary (`ORDER BY score DESC LIMIT k`), a
  * window function (`row_number() OVER (... ORDER BY score DESC)`),
  * or an order-sensitive aggregate (`array_agg(x ORDER BY y)`) whose
  * sort ends on a non-unique expression picks ROWS (not just row
  * order) nondeterministically — the q82-class mechanism one level
  * up: instead of two engines rounding a tie oppositely, two engines
  * (or two scale factors) BREAK a sort tie oppositely and different
  * rows cross the boundary. Every such site in the codebase ends its
  * key list with a bare id column (vec_id, doc_id, tok, user_id, …)
  * precisely so the order is total; this spec mechanizes that
  * convention over every rendered `SparkEntry.oracleSql` statement so
  * a NEW un-tie-broken sort fails `sbt test` instead of surfacing as
  * a hash mismatch at some future fixture scale.
  *
  * What the rule can and cannot see: a bare trailing column from the
  * [[OrderHygiene.TieBreakKeys]] ledger is "tie-break-shaped" —
  * whether it is actually unique at the site (post-GROUP BY, a table
  * key, …) stays a human adjudication recorded on the ledger entry,
  * the same split OracleLiteralHygieneSpec uses. An intentional
  * exception goes in [[OrderHygiene.Exempt]] with its argument class.
  *
  * Scope: this spec covers the ORACLE side; the Spark side of the
  * same convention is walked at the analyzed-plan level by
  * `SparkOrderAuditSpec` against the SAME shared ledger. Ignored as
  * order-irrelevant: ORDER BY in a subquery without LIMIT, and the
  * statement-final presentation sort (the driver's compare sorts by
  * ALL columns before hashing). */
class OracleOrderHygieneSpec extends AnyFunSuite {
  import OrderHygiene.{sites, Exempt}

  test("every order-sensitive oracle sort ends in a ledgered tie-break key") {
    val scanned = graft.SparkEntry.oracleSql.toSeq.sortBy(_._1)
      .flatMap { case (name, sql) => sites(sql).map((name, _)) }
    // vacuity floor: the surface carries ~176 order-sensitive sites
    // (122 window / 51 top-k / 3 ordered-agg at pin time) — a scanner
    // regression that silently finds nothing must not pass this test
    // as an empty offender list
    assert(scanned.size >= 150,
      s"site population collapsed to ${scanned.size} — scanner regression?")
    val offenders = for {
      (name, site) <- scanned
      if !site.tieBroken &&
        !Exempt.getOrElse(name, Set.empty).contains(site.trailingKey)
    } yield s"$name [${site.kind}]: ORDER BY${site.keys.take(70)}"
    assert(offenders.isEmpty,
      "order-sensitive sorts without a trailing ledgered tie-break " +
        "column pick boundary rows nondeterministically across engines and " +
        "scale factors; append a unique id key (or adjudicate in " +
        "OrderHygiene.Exempt):\n  " + offenders.mkString("\n  "))
  }

  test("every oracle LIMIT is governed by an ORDER BY") {
    // the degenerate form of the same hazard: a LIMIT with NO sort at
    // all returns an arbitrary subset — every LIMIT token must be the
    // terminator of exactly one scanned top-k site
    val offenders = for {
      (name, sql) <- graft.SparkEntry.oracleSql.toSeq.sortBy(_._1)
      limits = raw"(?i)(?<![\w])LIMIT\b".r.findAllIn(
        sql.replaceAll(raw"'[^']*'", "''")).size
      topks = sites(sql).count(_.kind == "topk")
      if limits != topks
    } yield s"$name: $limits LIMIT token(s), $topks governed by ORDER BY"
    assert(offenders.isEmpty,
      "bare LIMIT without a governing ORDER BY returns an arbitrary row " +
        "subset:\n  " + offenders.mkString("\n  "))
  }

  test("the scanner classifies the hazard shapes it exists to catch") {
    // top-k without tie-break: the exact shape the rule forbids
    val bad = sites("SELECT * FROM t ORDER BY score DESC LIMIT 5")
    assert(bad.map(_.kind) === Seq("topk") && !bad.head.tieBroken)
    // top-k with a ledgered tie-break passes
    val good = sites("SELECT * FROM t ORDER BY score DESC, doc_id LIMIT 5")
    assert(good.head.tieBroken && good.head.trailingKey === "doc_id")
    // window with only a non-ledgered metric fails; with trailing id
    // (qualified, DESC — direction is irrelevant to totality) passes
    assert(!sites("SELECT row_number() OVER (PARTITION BY q ORDER BY c DESC) FROM t")
      .head.tieBroken)
    val w = sites("SELECT row_number() OVER (ORDER BY c DESC, n.vec_id DESC) FROM t n")
    assert(w.map(_.kind) === Seq("window") && w.head.tieBroken &&
      w.head.trailingKey === "n.vec_id")
    // order-sensitive aggregate is checked; NULLS tokens strip
    val a = sites("SELECT array_agg(x ORDER BY tok ASC NULLS LAST) FROM t")
    assert(a.map(_.kind) === Seq("agg") && a.head.tieBroken &&
      a.head.trailingKey === "tok")
    // the window FRAME clause is not part of the trailing key
    val fr = sites("SELECT sum(x) OVER (ORDER BY bin ROWS BETWEEN " +
      "UNBOUNDED PRECEDING AND 1 PRECEDING) FROM t")
    assert(fr.head.trailingKey === "bin" && fr.head.tieBroken)
    // an expression tie-break is NOT tie-break-shaped
    assert(!sites("SELECT * FROM t ORDER BY abs(v) LIMIT 1").head.tieBroken)
    // subquery sort without LIMIT and the final presentation sort are
    // order-irrelevant: not sites at all
    assert(sites("SELECT * FROM (SELECT * FROM t ORDER BY x DESC) ORDER BY y DESC")
      .isEmpty)
    // keys containing function calls keep commas inside parens intact
    val f = sites("SELECT * FROM t ORDER BY coalesce(a, b) DESC, doc_id LIMIT 3")
    assert(f.head.tieBroken && f.head.trailingKey === "doc_id")
    // quoted strings never hide an ORDER BY terminator
    assert(sites("SELECT * FROM t WHERE s = 'ORDER BY x LIMIT 1'").isEmpty)
    // a NAMED window clause is a window site (the round-17 ADVICE
    // gap: the walk-back word is AS, which the generic opener logic
    // dropped) — head position, comma continuation, and an
    // ORDER-BY-less companion in the same list
    val nw = sites("SELECT sum(x) OVER w FROM t " +
      "WINDOW w AS (PARTITION BY g ORDER BY v, doc_id)")
    assert(nw.map(_.kind) === Seq("window") && nw.head.tieBroken &&
      nw.head.trailingKey === "doc_id")
    val nw2 = sites("SELECT sum(x) OVER w2 FROM t WINDOW " +
      "w1 AS (PARTITION BY g), " +
      "w2 AS (PARTITION BY g ORDER BY v DESC, event_id)")
    assert(nw2.map(_.kind) === Seq("window") && nw2.head.tieBroken &&
      nw2.head.trailingKey === "event_id")
    // the identically-shaped CTE chain is NOT a window site: its
    // inner sort stays a plain subquery sort (order-irrelevant
    // without LIMIT)
    assert(sites("WITH a AS (SELECT 1), " +
      "b AS (SELECT * FROM t ORDER BY v) SELECT * FROM b").isEmpty)
  }
}
