package graft.queries

import graft.SparkSuite

/** Plan-shape tripwire for the single-evaluation forms (round-17
  * commit "Single-evaluation forms for the converted rounding sites"):
  * `Relational.dratio` references its denominator operand TWICE, so
  * feeding it an inline window expression would get that window
  * planned (and paid) twice — the conversion names the window total
  * first. Same class for the one-decimal-aggregate derivations in
  * q167/q183. The A/B measured the converted plans neutral; these pins
  * keep them that way by counting the physical plan's Window and
  * HashAggregate operators, so an inadvertent inline-back fails
  * `sbt test` instead of silently doubling a shuffle-adjacent
  * operator. Counts are pinned against the Spark build in
  * /opt/spark/jars (the engine this repo rides); a Spark upgrade that
  * legitimately replans these may re-pin with a note. */
class SingleEvaluationPinSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  private def counts(name: String): (Int, Int) = {
    val p = graft.SparkEntry.queries(name)(spark, dir)
      .queryExecution.executedPlan.toString
    ("Window".r.findAllIn(p).size, "HashAggregate".r.findAllIn(p).size)
  }

  test("the Jaccard pair verifies evaluate array_intersect exactly once") {
    // |A∪B| = |A|+|B|−|A∩B| references the named `inter` column twice;
    // CollapseProject keeps non-cheap expressions single-evaluation,
    // so exactly ONE array_intersect must survive into the physical
    // plan — a Catalyst change that inlines it twice would silently
    // pay the intersect double AND lose the measured q197 win (A/B
    // 0.667 vs the union form)
    for (name <- Seq("q197_lsh_pr_curve", "q23_minhash_pairs")) {
      val p = graft.SparkEntry.queries(name)(spark, dir)
        .queryExecution.executedPlan.toString
      val n = "array_intersect".r.findAllIn(p).size
      assert(n === 1,
        s"$name physical plan evaluates array_intersect $n times — " +
          "the named `inter` projection must stay single-evaluation")
    }
  }

  test("the converted queries keep their single-evaluation plan shapes") {
    // (Window, HashAggregate) counts of the verified post-conversion
    // plans. The regression each pin trips: q180 at 3 windows / q80 at
    // 2 means the dratio denominator window got inlined (planned
    // twice); a HashAggregate rise on q167/q183 means the raw+rounded
    // (resp. moments+micro-unit) derivation split back into parallel
    // aggregate buffers.
    val pinned = Map(
      "q180_transitions" -> ((2, 2)), // lag window + NAMED row_total
      "q80_mix_report" -> ((1, 2)),
      "q167_bm25" -> ((1, 10)),
      "q183_dim_stats" -> ((1, 2)))
    for ((name, expected) <- pinned.toSeq.sortBy(_._1)) {
      val got = counts(name)
      assert(got === expected,
        s"$name plan shape drifted to (Window, HashAggregate) = $got " +
          s"(pinned $expected) — if dratio's denominator window was " +
          "inlined, re-name it; if Spark replanned legitimately, re-pin " +
          "with a note")
    }
  }
}
