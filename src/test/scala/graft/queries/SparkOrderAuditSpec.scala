package graft.queries

import graft.SparkSuite
import graft.core.OrderHygiene

import org.apache.spark.sql.catalyst.expressions.{AttributeReference, SortOrder}
import org.apache.spark.sql.catalyst.plans.logical

/** The Spark-side twin of OracleOrderHygieneSpec, one level deeper:
  * instead of regex over SQL text, walk each query's ANALYZED logical
  * plan and require every order-sensitive sort — a `Window` operator's
  * orderSpec, and the `Sort` feeding a `Limit` (the `.orderBy(…)
  * .limit(k)` top-k shape) — to end on an attribute from the SAME
  * shared [[OrderHygiene]] ledger the oracle guard uses. One ledger,
  * two enforcement points: the two sides of a query cannot drift
  * apart in what they consider a total order, and a Spark-side sort
  * whose tie-break was dropped fails `sbt test` even though the
  * sf-pinned sweeps would only catch it at a scale where the tie
  * materializes.
  *
  * Audited set: every query whose ORACLE statement has at least one
  * order-sensitive site (derived through [[OrderHygiene.sites]], so
  * the two specs audit the same population), minus the pipeline and
  * streaming families — their `fn` IS the work (fixture generation,
  * snapshot writes, micro-batch execution; see SparkEntry's PlanMemo
  * note), so building them here would run jobs, and their windowed
  * semantics are pinned end-to-end by their own suites instead.
  * Construction at sf0.001 is plan-only for the declarative families
  * (iterative constructions run small bounded jobs).
  *
  * Plain `Sort` nodes NOT under a Limit are presentation order — the
  * driver's compare sorts all columns before hashing — and windows
  * without an orderSpec are unordered aggregates; both are skipped. */
class SparkOrderAuditSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  /** The trailing sort key's auditable name: the attribute name for a
    * column reference, a marker for a computed expression (computed
    * trailing keys are never tie-break-shaped). */
  private def trailingName(order: Seq[SortOrder]): String =
    order.last.child match {
      case a: AttributeReference => a.name
      case e => s"<expr ${e.sql.take(40)}>"
    }

  /** The Sort that a Limit bounds, if any — analysis lowers
    * `.orderBy(…).limit(k)` to GlobalLimit(LocalLimit(Sort(…))), with
    * Project/SubqueryAlias possibly interleaved by a trailing select. */
  private def sortUnder(p: logical.LogicalPlan): Option[logical.Sort] =
    p match {
      case s: logical.Sort => Some(s)
      case l: logical.LocalLimit => sortUnder(l.child)
      case pr: logical.Project => sortUnder(pr.child)
      case sa: logical.SubqueryAlias => sortUnder(sa.child)
      case _ => None
    }

  test("every Spark-side order-sensitive sort ends in a ledgered tie-break key") {
    val skip = PipelineQueries.queries.keySet ++ StreamingQueries.queries.keySet
    val audit = graft.SparkEntry.oracleSql.toSeq.sortBy(_._1).collect {
      case (n, sql) if !skip(n) && OrderHygiene.sites(sql).nonEmpty => n
    }
    assert(audit.size >= 80, s"audit population collapsed: ${audit.size}")
    val offenders = scala.collection.mutable.ArrayBuffer.empty[String]
    for (name <- audit) {
      val plan = graft.SparkEntry.queries(name)(spark, dir)
        .queryExecution.analyzed
      // collectWithSubqueries so sorts inside still-undecorrelated
      // subquery EXPRESSIONS (scalar/lateral subqueries at analysis
      // time — q131/q132/q133) are walked too; LocalLimit is matched
      // directly because a correlated lateral limit has no GlobalLimit
      // above it (the duplicate hit under GlobalLimit(LocalLimit(…))
      // is deduped by the distinct below)
      plan.collectWithSubqueries {
        case w: logical.Window if w.orderSpec.nonEmpty =>
          val key = trailingName(w.orderSpec)
          if (!OrderHygiene.ledgered(name, key))
            offenders += s"$name [window]: …, $key"
        case gl: logical.GlobalLimit =>
          sortUnder(gl.child).foreach { s =>
            val key = trailingName(s.order)
            if (!OrderHygiene.ledgered(name, key))
              offenders += s"$name [topk]: …, $key"
          }
        case ll: logical.LocalLimit =>
          sortUnder(ll.child).foreach { s =>
            val key = trailingName(s.order)
            if (!OrderHygiene.ledgered(name, key))
              offenders += s"$name [topk]: …, $key"
          }
      }
    }
    assert(offenders.distinct.isEmpty,
      "Spark-side order-sensitive sorts whose trailing key is not in the " +
        "shared OrderHygiene ledger — append a unique id key (mirroring " +
        "the oracle SQL) or adjudicate in OrderHygiene.Exempt:\n  " +
        offenders.distinct.mkString("\n  "))
  }
}
