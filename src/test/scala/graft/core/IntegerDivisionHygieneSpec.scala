package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Standing guard for the integer-division sign divergence: Spark's
  * `div` (and Catalyst IntegralDivide) truncates toward ZERO while
  * DuckDB's `//` FLOORS — identical for non-negative operands, off by
  * one for a negative numerator with a remainder (−7 div 2 = −3 vs
  * −7 // 2 = −4). Every mirrored div/`//` pair in the query surface
  * is therefore only engine-agreed if its numerator is non-negative
  * by construction (counts, ids, epochs, hashes, offsets, Morton
  * codes) — the sign-capable integer divisions all route through the
  * `Relational.dmean`/`dratio`/`dfrac` helpers, whose explicit
  * abs+sign split is property-pinned against BigDecimal HALF_UP in
  * DeterminismHelpersSpec. This spec pins that adjudication: the last
  * identifier token of every `//` numerator in the rendered oracle
  * SQL must be in the non-negative ledger below, so a NEW integer
  * division over a sign-capable quantity fails `sbt test` and forces
  * either a non-negativity argument here or a dfrac routing. */
class IntegerDivisionHygieneSpec extends AnyFunSuite {

  /** Adjudicated non-negative numerator tokens (last identifier before
    * `//`). Domains: epoch µs (us/ws/tus/ts_us/ts — fixture and any
    * realistic timestamps are post-1970), counts/lengths (n/nt/
    * n_chars/s), ids/positions (event_id/pos/tok_start/start_off/off),
    * hash/bit patterns (h/simhash/simh/z/blob_hex), pagerank mass
    * (pr/range — non-negative by the algorithm's invariant), budget
    * quotas (budget), affine-quant differences (qmn:
    * the numerator is `qv - qmn` with qmn = per-group MIN(qv), ≥ 0),
    * explicit sign-split branches (discordant: q258's tau CASE makes
    * each branch numerator `|c − d| · 2u + (c + d)`, ≥ 0 — the same
    * treatment the d-helpers use), and the d-helper cast type name
    * (HUGEINT — sign handled upstream by the abs+sign split, the one
    * adjudication that is NOT "non-negative input" but "sign split
    * before the divide"; these sites are NOT a free pass — the
    * HUGEINT-site test below additionally requires each one to carry
    * the d-helper half-up rendering shape and pins the population). */
  private val NonNegative: Set[String] = Set(
    "us", "ws", "tus", "ts_us", "ts",
    "n", "nt", "n_chars", "s",
    "event_id", "pos", "tok_start", "start_off", "off",
    "h", "simhash", "simh", "z", "blob_hex",
    "pr", "range", "budget",
    "qmn", "discordant", "HUGEINT")

  // audited 2026-08 (round 18): every site is a DFRAC or DRATIO
  // rendering (grep of src/main shows no literal `AS HUGEINT) //`
  // outside the two helpers)
  private val HugeintSites = 51
  private val HugeintQueries = 29

  test("HUGEINT-ending numerators are d-helper renderings, at their pinned population") {
    // the round-17 ADVICE gap: `HUGEINT` in the name ledger would
    // auto-pass ANY future `CAST(<sign-capable> AS HUGEINT) // q`
    // without the abs+sign split the entry certifies. Every legitimate
    // HUGEINT-ending site is a DFRAC/DRATIO rendering, whose numerator
    // is the half-up form `(2*u*<p-term> + CAST(<q> AS HUGEINT))` —
    // require that signature (`2*` scaling AND a `+ CAST(` addend
    // immediately before the cast that ends the numerator) in the
    // preceding window of each site, and pin the population so a new
    // site forces a re-audit here even if it fakes the shape.
    val site = raw"AS HUGEINT\)\s*\)*\s*//".r
    val hits = for {
      (name, sql) <- graft.SparkEntry.oracleSql.toSeq
      cleaned = sql.replaceAll(raw"'[^']*'", "''")
      m <- site.findAllMatchIn(cleaned)
    } yield (name, cleaned.substring(math.max(0, m.start - 400), m.start))
    val malformed = hits.collect {
      case (name, ctx) if !(ctx.contains("2*") && ctx.contains("+ CAST(")) =>
        s"$name: …${ctx.takeRight(60)}AS HUGEINT) //"
    }
    assert(malformed.isEmpty,
      "HUGEINT-cast // numerator without the d-helper half-up " +
        "signature — route sign-capable ratios through " +
        "Relational.dfrac/DFRAC instead of a bare cast:\n  " +
        malformed.mkString("\n  "))
    assert(hits.size === HugeintSites && hits.map(_._1).distinct.size === HugeintQueries,
      s"HUGEINT-cast // sites moved to ${hits.size} over " +
        s"${hits.map(_._1).distinct.size} queries (audited: $HugeintSites over " +
        s"$HugeintQueries) — verify the new/changed sites are d-helper " +
        "renderings and re-pin")
  }

  test("every oracle // numerator's trailing token is sign-adjudicated") {
    val tok = raw"([A-Za-z_][A-Za-z_0-9]*)\s*\)*\s*//".r
    val offenders = for {
      (name, sql) <- graft.SparkEntry.oracleSql.toSeq.sortBy(_._1)
      cleaned = sql.replaceAll(raw"'[^']*'", "''")
      m <- tok.findAllMatchIn(cleaned)
      t = m.group(1)
      if !NonNegative.contains(t)
    } yield s"$name: …$t //"
    assert(offenders.distinct.isEmpty,
      "integer division over a token not adjudicated non-negative — " +
        "Spark div truncates toward zero, DuckDB // floors, they " +
        "diverge on negatives; argue non-negativity here or route " +
        "through Relational.dfrac:\n  " +
        offenders.distinct.mkString("\n  "))
  }

  test("number-ending numerators stay at their audited population") {
    // the identifier ledger cannot name a numerator that ends in a
    // NUMBER token (`(COUNT(*) + 1) // 2`, `(x + 511) // 512`); those
    // 60 sites were audited by hand (2026-08): every one is a
    // min-subtracted difference, a ceil-division `x + n - 1` with
    // per-group n >= 1, an abs/sign-split d-helper form, or a scaled
    // count — all non-negative by construction. Pin the population so
    // a NEW number-ending site forces a re-audit here instead of
    // slipping past the name ledger.
    val tok = raw"([A-Za-z_0-9]+)\s*\)*\s*//".r
    val hits = for {
      (name, sql) <- graft.SparkEntry.oracleSql.toSeq
      m <- tok.findAllMatchIn(sql.replaceAll(raw"'[^']*'", "''"))
      if m.group(1).forall(_.isDigit)
    } yield name
    assert(hits.size === 60 && hits.distinct.size === 29,
      s"digit-ending // numerators moved to ${hits.size} sites over " +
        s"${hits.distinct.size} queries (audited: 60 over 29) — " +
        "re-audit the new/changed sites' sign domains and re-pin")
  }

  test("the ledger carries no unused adjudications") {
    // keep the allowance set exactly as large as the surface needs —
    // a stale entry is a free pass for a future sign-capable site
    // that happens to reuse the name
    val tok = raw"([A-Za-z_][A-Za-z_0-9]*)\s*\)*\s*//".r
    val used = (for {
      (_, sql) <- graft.SparkEntry.oracleSql.toSeq
      m <- tok.findAllMatchIn(sql.replaceAll(raw"'[^']*'", "''"))
    } yield m.group(1)).toSet
    val stale = NonNegative -- used
    assert(stale.isEmpty,
      s"prune unused ledger entries: ${stale.toSeq.sorted.mkString(", ")}")
  }
}
