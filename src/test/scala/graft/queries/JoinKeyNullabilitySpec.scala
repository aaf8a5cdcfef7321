package graft.queries

import scala.collection.mutable

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{And, EqualTo, Expression, IsNotNull, IsNull, Or}
import org.apache.spark.sql.catalyst.plans._
import org.apache.spark.sql.catalyst.plans.logical.{Filter => LFilter, Join, LogicalPlan}
import org.apache.spark.sql.graftbridge.PlanBridge

import graft.SparkSuite

/** The audit core, shared with PipelinePlanSweepSpec (which applies the
  * same check to the export/streaming families' EXECUTED plans). */
private[queries] object JoinKeyAudit {

  case class Pending(where: String, side: LogicalPlan, keys: Seq[Expression])
  case class Walk(joins: Int, keys: Int, pending: Seq[Pending])

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

  /** Static pass: every equi-join key on a droppable side that is
    * nullable in the resolved schema AND not covered by an IsNotNull
    * constraint — the set that needs a data probe. Walks subquery
    * expression plans too (foreachWithSubqueries): an equi-join inside
    * a surviving scalar/correlated subquery ships its nulls through
    * its own exchange just the same. */
  def walk(tag: String, plan: LogicalPlan): Walk = {
    val pending = mutable.ArrayBuffer.empty[Pending]
    var joins = 0
    var keys = 0
    plan.foreachWithSubqueries {
      case Join(left, right, jt, cond, _) =>
        joins += 1
        val eqs = cond.toSeq.flatMap(conjuncts).collect { case e: EqualTo => e }
        val (dl, dr) = droppable(jt)
        for (side <- Seq(left).filter(_ => dl) ++ Seq(right).filter(_ => dr)) {
          val sideKeys = eqs.flatMap { case EqualTo(a, b) =>
            Seq(a, b).filter(k =>
              k.references.nonEmpty && k.references.subsetOf(side.outputSet))
          }
          keys += sideKeys.size
          val unproven = sideKeys.filter(k =>
            k.nullable && !side.constraints.contains(IsNotNull(k)))
          if (unproven.nonEmpty)
            pending += Pending(s"$tag ${jt.sql}", side, unproven)
        }
      case _ =>
    }
    Walk(joins, keys, pending.toSeq)
  }

  /** Data probe: count null-keyed rows on each pending join side,
    * deduplicated on (side plan, key set) via `memo` — base relations
    * are memoized per (session, dir), so repeated dim-join sides
    * collapse to one count each. Returns (offenders, unprobeable):
    * a side whose probe itself fails (e.g. an executed plan over a
    * temp fixture its query already cleaned up) is reported
    * separately, never silently passed. */
  def probe(spark: SparkSession, pending: Seq[Pending],
      memo: mutable.Map[(LogicalPlan, Seq[Expression]), Long])
      : (Seq[String], Seq[String]) = {
    val offenders = mutable.ArrayBuffer.empty[String]
    val unprobeable = mutable.ArrayBuffer.empty[String]
    for (p <- pending) {
      try {
        val nulls = memo.getOrElseUpdate((p.side, p.keys), {
          val pred = p.keys.map(k => IsNull(k): Expression).reduce(Or(_, _))
          PlanBridge.ofRows(spark, LFilter(pred, p.side)).count()
        })
        if (nulls > 0)
          offenders += s"${p.where}: $nulls null-key rows would ship " +
            s"through the exchange — keys ${p.keys.map(_.sql).mkString(", ")}"
      } catch {
        // NonFatal only: an OOM or interrupt during a probe count must
        // fail the run, not downgrade to an info-only 'unprobeable'
        // string (PipelinePlanSweepSpec treats unprobeable as info)
        case scala.util.control.NonFatal(e) =>
          unprobeable += s"${p.where}: keys " +
            s"${p.keys.map(_.sql).mkString(", ")} (${e.getClass.getSimpleName})"
      }
    }
    (offenders.toSeq.distinct, unprobeable.toSeq.distinct)
  }
}

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
  * Audited set: every query except the pipeline + streaming families;
  * THEIR executed plans get the same check inside PipelinePlanSweepSpec
  * (which runs them anyway and captures every internal execution).
  */
class JoinKeyNullabilitySpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  test("every equi-join key is non-nullable, null-filtered, or probed null-free") {
    assert(spark.conf.get("spark.sql.constraintPropagation.enabled") == "true",
      "constraint checks below assume constraint propagation")
    val skip = PipelineQueries.queries.keySet ++ StreamingQueries.queries.keySet
    val audit = (graft.SparkEntry.queries.keySet -- skip).toSeq.sorted
    assert(audit.size >= 200, s"audit population collapsed: ${audit.size}")

    var joinsSeen = 0
    var keysSeen = 0
    val pending = mutable.ArrayBuffer.empty[JoinKeyAudit.Pending]
    for (name <- audit) {
      val w = JoinKeyAudit.walk(name,
        graft.SparkEntry.queries(name)(spark, dir).queryExecution.optimizedPlan)
      joinsSeen += w.joins
      keysSeen += w.keys
      pending ++= w.pending
    }
    // population floors: the surface has hundreds of equi-joins — a
    // collapse here means the walk broke, not that the engine got clean
    assert(joinsSeen >= 100, s"join population collapsed: $joinsSeen")
    assert(keysSeen >= 200, s"key population collapsed: $keysSeen")

    val memo = mutable.Map.empty[(LogicalPlan, Seq[Expression]), Long]
    val (offenders, unprobeable) = JoinKeyAudit.probe(spark, pending.toSeq, memo)
    assert(offenders.isEmpty,
      "a droppable join side carries REAL null-keyed rows with no " +
        "explicit null filter — with InferFiltersFromConstraints " +
        "excluded (Sessions.local) nothing prunes them before the " +
        "shuffle; add .isNotNull at the operator:\n  " +
        offenders.mkString("\n  "))
    // on the declarative surface every side is reconstructible from
    // the fixture dir — a probe failure is a broken walk, not an
    // ephemeral fixture
    assert(unprobeable.isEmpty,
      s"probes failed on the declarative surface:\n  ${unprobeable.mkString("\n  ")}")
    info(s"audited $joinsSeen joins / $keysSeen keys; " +
      s"${pending.size} side-key sets probed (${memo.size} distinct counts)")
  }
}
