package graft.queries

import scala.collection.mutable

import org.apache.spark.sql.catalyst.expressions.{And, EqualTo, Expression, IsNotNull, IsNull, Or}
import org.apache.spark.sql.catalyst.plans._
import org.apache.spark.sql.catalyst.plans.logical.{Filter => LFilter, Join, LogicalPlan}
import org.apache.spark.sql.graftbridge.PlanBridge

import graft.SparkSuite

/** Machine check of the filter-inference exclusion's precondition
  * (round-18 verdict ask #2). `graft.core.Sessions.local` excludes
  * `InferFiltersFromConstraints`/`InferFiltersFromGenerate` engine-wide
  * (measured 17% board win — the rule's inlining re-evaluated expensive
  * aliases per row); the exclusion is safe only while the `IsNotNull`
  * predicates the rule would have synthesized on equi-join keys prune
  * ~zero rows. That was a comment ("keys are non-null by construction")
  * — this spec makes it a standing machine check over the whole audited
  * surface: for every equi-join in every optimized plan, every join key
  * on a side whose null-keyed rows are droppable must be
  *
  *   (a) non-nullable in the resolved schema, or
  *   (b) covered by an `IsNotNull` constraint (i.e. an EXPLICIT null
  *       filter or null-intolerant predicate already in the plan —
  *       constraint propagation is independent of the excluded rule), or
  *   (c) probed null-free in the actual fixture data — the keys that are
  *       "non-null by construction" (md5 shingles, generated ids,
  *       aggregate-derived keys): the probe runs `count(key IS NULL)`
  *       on the join side itself, deduplicated across queries.
  *
  * A key with REAL null rows and no explicit filter fails the suite:
  * those rows would ship through a 100 TB exchange to match nothing
  * (exactly what the excluded rule used to prevent). The fix is an
  * explicit `.isNotNull` filter at the operator — which also moves the
  * key from (c) to (b) here. Droppable sides per join type follow the
  * null-key match semantics: inner/semi both sides, left-outer/anti the
  * right side, right-outer the left side, full-outer neither.
  *
  * Audited set: every query except the pipeline + streaming families
  * (their `fn` IS the work — same exclusion and reasoning as
  * ExpensiveExprSweepSpec / SparkOrderAuditSpec).
  */
class JoinKeyNullabilitySpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  /** (left droppable, right droppable) for null-keyed rows. */
  private def droppable(jt: JoinType): (Boolean, Boolean) = jt match {
    case Inner | Cross  => (true, true)
    case LeftSemi       => (true, true)
    case LeftOuter      => (false, true)
    case RightOuter     => (true, false)
    case LeftAnti       => (false, true)
    case _: ExistenceJoin => (false, true)
    case _              => (false, false) // FullOuter: no side droppable
  }

  test("every equi-join key is non-nullable, null-filtered, or probed null-free") {
    assert(spark.conf.get("spark.sql.constraintPropagation.enabled") == "true",
      "constraint checks below assume constraint propagation")
    val skip = PipelineQueries.queries.keySet ++ StreamingQueries.queries.keySet
    val audit = (graft.SparkEntry.queries.keySet -- skip).toSeq.sorted
    assert(audit.size >= 200, s"audit population collapsed: ${audit.size}")

    case class Pending(where: String, side: LogicalPlan, keys: Seq[Expression])
    val pending = mutable.ArrayBuffer.empty[Pending]
    var joinsSeen = 0
    var keysSeen = 0
    for (name <- audit) {
      val opt = graft.SparkEntry.queries(name)(spark, dir)
        .queryExecution.optimizedPlan
      opt.foreach {
        case Join(left, right, jt, cond, _) =>
          joinsSeen += 1
          val eqs = cond.toSeq.flatMap(conjuncts).collect { case e: EqualTo => e }
          val (dl, dr) = droppable(jt)
          for (side <- Seq(left).filter(_ => dl) ++ Seq(right).filter(_ => dr)) {
            val keys = eqs.flatMap { case EqualTo(a, b) =>
              Seq(a, b).filter(k =>
                k.references.nonEmpty && k.references.subsetOf(side.outputSet))
            }
            keysSeen += keys.size
            val unproven = keys.filter(k =>
              k.nullable && !side.constraints.contains(IsNotNull(k)))
            if (unproven.nonEmpty)
              pending += Pending(s"$name ${jt.sql}", side, unproven)
          }
        case _ =>
      }
    }
    // population floors: the surface has hundreds of equi-joins — a
    // collapse here means the walk broke, not that the engine got clean
    assert(joinsSeen >= 100, s"join population collapsed: $joinsSeen")
    assert(keysSeen >= 200, s"key population collapsed: $keysSeen")

    // data probe, deduplicated on the (side plan, key set) — base
    // relations are memoized per (session, dir) so repeated dim-join
    // sides collapse to one count each
    val probed = mutable.Map.empty[(LogicalPlan, Seq[Expression]), Long]
    val offenders = mutable.ArrayBuffer.empty[String]
    for (p <- pending) {
      val nulls = probed.getOrElseUpdate((p.side, p.keys), {
        val pred = p.keys.map(k => IsNull(k): Expression).reduce(Or(_, _))
        PlanBridge.ofRows(spark, LFilter(pred, p.side)).count()
      })
      if (nulls > 0)
        offenders += s"${p.where}: $nulls null-key rows would ship through " +
          s"the exchange — keys ${p.keys.map(_.sql).mkString(", ")}"
    }
    assert(offenders.distinct.isEmpty,
      "a droppable join side carries REAL null-keyed rows with no " +
        "explicit null filter — with InferFiltersFromConstraints " +
        "excluded (Sessions.local) nothing prunes them before the " +
        "shuffle; add .isNotNull at the operator:\n  " +
        offenders.distinct.mkString("\n  "))
    info(s"audited $joinsSeen joins / $keysSeen keys; " +
      s"${pending.size} side-key sets probed (${probed.size} distinct counts)")
  }
}
