package graft

import graft.core.Sessions

/** Benchmark main: runs every SparkEntry query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line.
  *
  * Throttle-resilient methodology: this VM CPU-throttles under
  * sustained load (a single-pass harness once reported 27.97 s for a
  * query that measures 6.53 s in isolation), so a one-shot timing
  * cannot distinguish a regression from a thermal event. Each query
  * gets one UNTIMED warmup pass (JIT + code cache + any managed
  * relation caches) followed by SPARK_GRAFT_BENCH_REPS timed passes
  * (default 3) run INTERLEAVED round-robin — pass 1 of every query,
  * then pass 2, then pass 3 — so a sustained throttle WINDOW inflates
  * one rep of many queries instead of every rep of a few (back-to-back
  * reps once shipped a 10.06 s artifact for a 0.12 s query because one
  * window covered all three of its reps; min-of-reps absorbs spikes,
  * only interleaving absorbs windows). The `queries` map reports the
  * per-query MINIMUM — the best observation is the least-throttled
  * one — and the `spread` map reports max-min per query. Queries whose
  * spread still exceeds 2× their min get one rescue rep (again
  * round-robin) so a window covering a whole interleaved pass cannot
  * pin the min high.
  *
  * Scaling curve: unless SPARK_GRAFT_SF_DIR2 is set empty, the same
  * warmup+interleaved-reps methodology runs a SECOND time at the
  * smaller scale (default /root/testdata/sf0.01) and the artifact
  * file carries `queries_sf2` plus a per-query `ratio` column
  * (primary/secondary wall time). At a 10× data ratio, ratio ≈ 10 is
  * linear scaling, ratio ≈ 1 is fixed-overhead-dominated (fixture
  * pipeline queries, streaming state-store commit rounds), and
  * ratio >> 10 is the superlinear smell the curve exists to catch —
  * those names land in `superlinear` and a count lands on stdout.
  *
  * Export-fixture curve: the export battery (PipelineQueries — q40…
  * q52, q88/q92, q207–q209) generates its fixtures at a fixed record
  * count, so the sf curve reads ≈ 1 for it regardless of plan quality.
  * Unless SPARK_GRAFT_EXPORT_N ≤ 10000, that family is re-measured at
  * the larger fixture (default 30k = 3×) via
  * `PipelineQueries.withFixtureN`, and `ratio_export` /
  * `superlinear_export` land in the artifact with the same
  * 1.5×-data-ratio alarm the sf curve uses.
  *
  * A query that throws is reported as -1 in the `queries` map (its
  * stack trace goes to stderr) so a broken query can never masquerade
  * as a fast one; `total` sums successful queries only.
  */
object Bench {

  private final case class Pass(samples: Map[String, Vector[Double]],
      warmups: Map[String, Option[Double]], failed: Set[String])

  // ---- machine-drift canary -------------------------------------
  // This VM's wall-clock drifts ±25-40 % on identical code within a
  // session (three same-code r13 boards: 128.5 / 160.8 / 149.3 s), so
  // raw round-over-round per-query ratios confound code changes with
  // machine state. The canary is a FIXED amount of sealed CPU work —
  // xorshift64* mixing, no IO, no allocation, no Spark — timed
  // interleaved with the board (one sample before each pass's warmup
  // and one before every timed rep pass), so each board carries its
  // own machine-speed measurement, in TWO legs (plus the un-anchored
  // Spark-stack leg below, covering what neither CPU kernel sees):
  //
  //  - single-threaded (`canary_s`): clock/thermal state. Min of
  //    samples — the least-throttled window, matching the min-of-reps
  //    query methodology — over `canary_ref_s` gives `drift`; a
  //    query's drift-normalized time is measured/drift
  //    (`queries_norm`), and cross-round comparisons divide
  //    normalized values.
  //  - multi-threaded (`canary_mt_s`): the same kernel on
  //    availableProcessors threads at once, reported as the mean
  //    per-thread seconds. The st leg is BLIND to core contention (a
  //    concurrent build, IO-scheduler pressure slow a 32-way board
  //    but not one register-bound thread — the r14 +21 %-on-steady-
  //    canary gap); mt/st divergence beyond the idle-machine baseline
  //    IS that contention, and `drift_mt` anchors it cross-round.
  //
  // `canary_p50`, the full per-leg sample lists, and the per-pass
  // mins (file artifact) expose intra-board throttle windows and
  // a throttled primary pass masked by a clean sf2 pass (or vice
  // versa) that the pooled min alone would hide. Reading rule:
  // `drift` (hence queries_norm/total_norm) uses the POOLED min for
  // cross-round definition stability — if canary_pass_min shows the
  // pooled min came from a NON-primary pass, the primary queries ran
  // under a worse machine state than drift credits; renormalize by
  // canary_pass_min["primary"] from the file artifact before
  // trusting per-query comparisons.
  private[graft] val CanaryIters = 200000000L
  /** Per-ITERATION anchors, so a retuned `CanaryIters` rescales the
    * reference seconds instead of silently corrupting `drift` and
    * every `*_norm` value (the ref/iters coupling is THROUGH these
    * constants now, not beside them). Values are pinned from
    * calibration runs on an otherwise idle VM and NOT re-derived per
    * round — drift is only meaningful against a fixed anchor:
    * st = 0.470 s / 2e8 iters (round 14); mt = 0.493 s / 2e8 iters
    * (round 15 calibration: idle-machine mt/st per-thread ratio
    * 1.0485 — the 32-thread SMT/turbo cost — times the st anchor, so
    * idle-machine drift_mt ≈ drift and a drift_mt EXCESS over drift
    * reads directly as core contention; the mt leg is intrinsically
    * noisier sample-to-sample, which min-of-samples absorbs).
    *
    * SCOPE: the mt anchor bakes in THIS 32-core board's idle mt/st
    * ratio while `canaryMtOnce` spawns `availableProcessors` threads,
    * so on any other core count drift_mt is mis-anchored and its
    * excess over drift misreads as contention. The artifact emits
    * `canary_mt_threads` beside `canary_mt_s` so a board reader can
    * reject (or re-anchor) mt comparisons when the count ≠ 32; st
    * drift is core-count-independent and stays valid everywhere. */
  private val CanaryRefSecPerIter = 0.470 / 2e8
  private val CanaryMtRefSecPerIter = 0.493 / 2e8
  val CanaryRefSec: Double = CanaryRefSecPerIter * CanaryIters
  val CanaryMtRefSec: Double = CanaryMtRefSecPerIter * CanaryIters
  @volatile private var canarySink = 0L // defeats dead-code elimination
  private def canaryKernel(): Double = {
    val t0 = System.nanoTime()
    var x = 0x9E3779B97F4A7C15L
    var acc = 0L
    var i = 0L
    while (i < CanaryIters) {
      // xorshift64* core: three shifts + a multiply per iteration —
      // pure register work, immune to memory/GC state
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17
      acc += x * 0x2545F4914F6CDD1DL
      i += 1
    }
    canarySink = acc
    (System.nanoTime() - t0) / 1e9
  }
  private def canaryMtOnce(): Double = {
    val n = Runtime.getRuntime.availableProcessors
    val times = new Array[Double](n)
    val threads = Array.tabulate(n)(i =>
      new Thread(() => times(i) = canaryKernel(), s"graft-canary-mt-$i"))
    threads.foreach(_.start())
    threads.foreach(_.join())
    times.sum / n
  }
  // ---- Spark-stack canary leg (round 18) ------------------------
  // The st/mt legs are register-bound probes; rounds 17-18 proved
  // they UNDER-measure board-wide windows: two same-code boards read
  // +22% raw vs round 16 while drift said 3-7% — the slowdown lived
  // in the parts of a query the CPU kernel never touches (task
  // scheduling, shuffle write/fetch, codegen, IO). This leg times a
  // FIXED tiny end-to-end Spark job — a 32-partition range scan,
  // hash projection, one 32-partition shuffle, tiny collect —
  // interleaved with the board like the other legs. Deliberately NO
  // ref anchor and NO participation in drift/total_norm (their
  // definitions stay cross-round stable, and an anchor calibrated in
  // the known-slow window this leg was born in would misread every
  // steady window as drift > 1): readers compare `canary_sp_s`
  // BETWEEN boards directly — when two boards' canary_sp_s diverge
  // far beyond their st drift gap, the window hit the Spark stack
  // and raw cross-board query ratios are not code-attributable.
  @volatile private var canarySparkSession: org.apache.spark.sql.SparkSession = _
  private def canarySparkOnce(): Double =
    if (canarySparkSession == null) -1.0
    else {
      val t0 = System.nanoTime()
      canarySparkSession.range(0L, 4000000L, 1L, 32)
        .selectExpr("xxhash64(id) % 1000 AS k", "id")
        .groupBy("k").count()
        .count()
      (System.nanoTime() - t0) / 1e9
    }

  // (pass label, single-thread seconds, mean per-thread mt seconds,
  //  spark-stack seconds)
  private val canarySamples =
    scala.collection.mutable.ArrayBuffer.empty[(String, Double, Double, Double)]
  private def sampleCanary(pass: String): Unit =
    canarySamples += ((pass, canaryKernel(), canaryMtOnce(), canarySparkOnce()))

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val sfDir2 = sys.env.getOrElse("SPARK_GRAFT_SF_DIR2",
      "/root/testdata/sf0.01") match {
      case d if d.isEmpty || d == sfDir => None
      case d if !java.nio.file.Files.isDirectory(java.nio.file.Path.of(d)) => None
      case d => Some(d)
    }
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt.max(1)
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
    canarySparkSession = spark

    // local-iteration aid, mirroring Verify: SPARK_GRAFT_BENCH_ONLY=q63,q147
    // benches only the named prefixes; absent = all (driver).
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.exists(n.startsWith)))

    def timeOnce(dir: String)(fn: (org.apache.spark.sql.SparkSession, String) =>
        org.apache.spark.sql.DataFrame): Option[Double] = {
      val t0 = System.nanoTime()
      try { fn(spark, dir).count(); Some((System.nanoTime() - t0) / 1e9) }
      catch {
        case e: Throwable =>
          System.err.println(s"[bench] FAILED: $e")
          e.printStackTrace()
          None
      }
    }

    /** One full warmup + interleaved-reps + rescue measurement of
      * `qnames` at `dir` (the round-robin methodology above); `pass`
      * labels this pass's canary samples for the per-pass mins. */
    def measure(dir: String, qnames: Seq[String] = names,
        pass: String = "primary"): Pass = {
      sampleCanary(pass) // machine-speed sample bracketing the warmup pass
      val warmups: Map[String, Option[Double]] =
        qnames.map(n => n -> timeOnce(dir)(SparkEntry.queries(n))).toMap
      val samples = scala.collection.mutable.Map.empty[String, Vector[Double]]
        .withDefaultValue(Vector.empty)
      val failed = scala.collection.mutable.Set.empty[String]
      failed ++= qnames.filter(warmups(_).isEmpty)
      for (_ <- 1 to reps) {
        sampleCanary(pass) // interleaved: one sample per timed rep pass
        for (n <- qnames if !failed(n))
          timeOnce(dir)(SparkEntry.queries(n)) match {
            case Some(t) => samples(n) = samples(n) :+ t
            case None => failed += n
          }
      }
      // rescue pass: one extra rep for queries whose spread exceeds 2x
      // their min (a throttle window spanning a whole interleaved pass)
      val noisy = qnames.filter { n =>
        !failed(n) && samples(n).size == reps && reps > 1 &&
          (samples(n).max - samples(n).min) > 2 * samples(n).min
      }
      if (noisy.nonEmpty)
        System.err.println(s"[bench] rescue rep at $dir for noisy: ${noisy.mkString(", ")}")
      for (n <- noisy)
        timeOnce(dir)(SparkEntry.queries(n)).foreach(t => samples(n) = samples(n) :+ t)
      Pass(samples.toMap.withDefaultValue(Vector.empty), warmups, failed.toSet)
    }

    val p1 = measure(sfDir)
    def ok(p: Pass)(n: String): Boolean = !p.failed(n) && p.samples(n).size >= reps
    def minOf(p: Pass)(n: String): Double = p.samples(n).min

    names.filterNot(ok(p1)).foreach(n =>
      System.err.println(s"[bench] $n FAILED (reported as -1)"))
    def fmt(d: Double): String = BigDecimal(d)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toString
    def jmap(pairs: Seq[(String, String)]): String =
      pairs.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")

    val qs = jmap(names.map(k =>
      k -> (if (ok(p1)(k)) fmt(minOf(p1)(k)) else "-1")))
    val spread = jmap(names.collect { case k if ok(p1)(k) =>
      k -> fmt(p1.samples(k).max - p1.samples(k).min) })
    // Cold-path observability: a cold-path regression moves
    // `warmup_total` even when the warm mins hold steady.
    val warmupsJson = jmap(names.collect { case k if p1.warmups(k).isDefined =>
      k -> fmt(p1.warmups(k).get) })
    val warmupTotal = p1.warmups.values.flatten.sum
    val total = names.collect { case k if ok(p1)(k) => minOf(p1)(k) }.sum
    val nFailed = names.count(!ok(p1)(_))
    if (nFailed > 0)
      System.err.println(s"[bench] $nFailed queries failed (reported as -1)")

    // ---- scaling curve at the secondary sf ----
    val p2 = sfDir2.map { d =>
      System.err.println(s"[bench] scaling-curve pass at $d")
      measure(d, names, "sf2")
    }
    val ratios: Map[String, Double] = (for {
      p <- p2.toSeq
      d2 <- sfDir2.toSeq
      n <- names
      if ok(p1)(n) && ok(p)(n) && minOf(p)(n) > 0
    } yield n -> minOf(p1)(n) / minOf(p)(n)).toMap
    // 10x data between sf0.1 and sf0.01: a query whose time grows
    // materially FASTER than the data is superlinear. 15 allows
    // constant-factor noise on sub-second denominators.
    val superlinear = names.filter(n => ratios.getOrElse(n, 0.0) > 15.0)
    if (superlinear.nonEmpty)
      System.err.println(s"[bench] superlinear vs $sfDir2: ${superlinear.mkString(", ")}")
    val sf2Part = (p2, sfDir2) match {
      case (Some(p), Some(d2)) =>
        val qs2 = jmap(names.map(k =>
          k -> (if (ok(p)(k)) fmt(minOf(p)(k)) else "-1")))
        val total2 = names.collect { case k if ok(p)(k) => minOf(p)(k) }.sum
        val ratioJson = jmap(names.collect { case k if ratios.contains(k) =>
          k -> fmt(ratios(k)) })
        val slJson = superlinear.map("\"" + _ + "\"").mkString("[", ",", "]")
        s""","sf2":"$d2","total_sf2":${fmt(total2)},"queries_sf2":$qs2""" +
          s""","ratio":$ratioJson,"superlinear":$slJson"""
      case _ => ""
    }

    // ---- export-fixture scaling curve ----
    // The parquet-backed sf curve can't see the export battery: its
    // fixtures are GENERATED at a fixed record count, so the sf ratio
    // ≈ 1 measures only fixed overhead. Re-measure just that family at
    // a larger fixture (default 30k = 3x the oracle size) under the
    // same methodology and alarm on superlinear growth the same way —
    // threshold 1.5x the data ratio, the slack the sf curve allows
    // (15 on 10x), floored at 3 for sub-second denominator noise.
    val exportN = sys.env.getOrElse("SPARK_GRAFT_EXPORT_N", "30000").toLong
    val exportNames = names.filter(graft.queries.PipelineQueries.queries.contains)
    val pE: Option[Pass] =
      if (exportN > 10000 && exportNames.nonEmpty) {
        System.err.println(s"[bench] export-scaling pass at fixture N=$exportN")
        Some(graft.queries.PipelineQueries.withFixtureN(exportN) {
          measure(sfDir, exportNames, "export")
        })
      } else None
    val exportDataRatio = exportN / 10000.0
    val ratiosE: Map[String, Double] = (for {
      p <- pE.toSeq
      n <- exportNames
      if ok(p1)(n) && ok(p)(n) && minOf(p1)(n) > 0
    } yield n -> minOf(p)(n) / minOf(p1)(n)).toMap
    val superlinearE = exportNames.filter(n =>
      ratiosE.getOrElse(n, 0.0) > math.max(3.0, 1.5 * exportDataRatio))
    if (superlinearE.nonEmpty)
      System.err.println(
        s"[bench] superlinear at fixture N=$exportN: ${superlinearE.mkString(", ")}")
    val exportPart = pE match {
      case Some(p) =>
        val qsE = jmap(exportNames.map(k =>
          k -> (if (ok(p)(k)) fmt(minOf(p)(k)) else "-1")))
        val ratioJson = jmap(exportNames.collect { case k if ratiosE.contains(k) =>
          k -> fmt(ratiosE(k)) })
        val slJson = superlinearE.map("\"" + _ + "\"").mkString("[", ",", "]")
        s""","export_n":$exportN,"queries_export":$qsE""" +
          s""","ratio_export":$ratioJson,"superlinear_export":$slJson"""
      case None => ""
    }

    // stdout gets the COMPACT line only: every shipped BENCH_r*.json
    // carries a 2000-char stdout tail, so if the driver parses within
    // that window the printed line must FIT it. With 166 queries the
    // full per-query map is ~5 KB — adaptively collapse queries faster
    // than a rising floor into {"fast_n","fast_sum"} until the line
    // fits 1800 chars (sbt noise can still precede it in the window);
    // the file copy below always carries the complete map.
    // With 180+ queries the fast-set collapse hides distribution
    // shifts (a floor-wide slowdown moves fast_sum but not which
    // queries are slow) — p50/p95 of the collapsed set restore that
    // signal at 2 scalars' cost.
    def pctl(sorted: Vector[Double], p: Double): Double =
      if (sorted.isEmpty) 0.0
      else sorted(((sorted.size - 1) * p).round.toInt.min(sorted.size - 1))
    // name the max carriers: ratio_max alone is unattributable from
    // the artifact (which query drifted?) — top3 (query → ratio,
    // descending) makes scaling drift diagnosable without a re-run
    def top3(rs: Map[String, Double]): String =
      jmap(rs.toSeq.sortBy(-_._2).take(3).map { case (k, v) => k -> fmt(v) })
    val ratioScalars = {
      val sf = if (ratios.isEmpty) ""
      else {
        val rs = ratios.values.toVector.sorted
        s""","ratio_p50":${fmt(pctl(rs, 0.5))},"ratio_max":${fmt(rs.last)}""" +
          s""","ratio_top3":${top3(ratios)}""" +
          s""","superlinear_n":${superlinear.size}"""
      }
      val ex = if (ratiosE.isEmpty) ""
      else {
        val rs = ratiosE.values.toVector.sorted
        s""","export_ratio_p50":${fmt(pctl(rs, 0.5))}""" +
          s""","export_ratio_max":${fmt(rs.last)}""" +
          s""","export_ratio_top3":${top3(ratiosE)}""" +
          s""","superlinear_export_n":${superlinearE.size}"""
      }
      sf + ex
    }
    // ---- drift canary scalars (methodology at the top of the file):
    // canary_s anchors this board's machine speed; drift = canary_s /
    // canary_ref_s; a cross-round comparison divides each board's
    // per-query numbers by ITS drift before taking ratios. total_norm
    // is the board total already so normalized. The mt leg reads core
    // contention: drift_mt >> drift means the board was slowed by
    // something the st leg can't see.
    sampleCanary("close") // closing sample
    val canaryStAll = canarySamples.map(_._2)
    val canaryMtAll = canarySamples.map(_._3)
    val canarySpAll = canarySamples.map(_._4).filter(_ >= 0)
    val canaryS = canaryStAll.min
    val canaryP50 = pctl(canaryStAll.sorted.toVector, 0.5)
    val drift = canaryS / CanaryRefSec
    val canaryMtS = canaryMtAll.min
    val driftMt = canaryMtS / CanaryMtRefSec
    val canarySpS = if (canarySpAll.isEmpty) -1.0 else canarySpAll.min
    val canarySpP50 =
      if (canarySpAll.isEmpty) -1.0
      else pctl(canarySpAll.sorted.toVector, 0.5)
    val canaryPart =
      s""","canary_s":${fmt(canaryS)},"canary_p50":${fmt(canaryP50)}""" +
        s""","canary_ref_s":${fmt(CanaryRefSec)},"drift":${fmt(drift)}""" +
        s""","canary_mt_s":${fmt(canaryMtS)},"drift_mt":${fmt(driftMt)}""" +
        s""","canary_mt_threads":${Runtime.getRuntime.availableProcessors}""" +
        s""","canary_sp_s":${fmt(canarySpS)},"canary_sp_p50":${fmt(canarySpP50)}""" +
        s""","total_norm":${fmt(total / drift)}"""
    def lineFor(floor: Double): String = {
      val kept = names.filter(n => !ok(p1)(n) || minOf(p1)(n) >= floor)
      val qsKept = jmap(kept.map(k =>
        k -> (if (ok(p1)(k)) fmt(minOf(p1)(k)) else "-1")))
      val fast = names.filter(n => ok(p1)(n) && minOf(p1)(n) < floor)
      val fastPart =
        if (fast.isEmpty) ""
        else {
          val sortedFast = fast.map(minOf(p1)).sorted.toVector
          s""","fast_n":${fast.size},"fast_sum":${fmt(sortedFast.sum)}""" +
            s""","fast_p50":${fmt(pctl(sortedFast, 0.5))}""" +
            s""","fast_p95":${fmt(pctl(sortedFast, 0.95))}"""
        }
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qsKept$fastPart$ratioScalars$canaryPart,"reps":$reps,"sf":"$sfDir"}"""
    }
    val line = Seq(0.0, 0.05, 0.1, 0.2, 0.5, 1.0, 2.0).map(lineFor)
      .find(_.length <= 1800).getOrElse(lineFor(Double.MaxValue))
    println(line)
    // The file copy carries the full diagnostics (spread = max-min per
    // query; warmup = the one cold pass; queries_sf2/ratio = the
    // scaling curve vs the secondary sf; queries_norm = min/drift per
    // query — the cross-round comparable; canary_samples = every
    // interleaved machine-speed observation, exposing throttle windows
    // within the board).
    val qsNorm = jmap(names.collect { case k if ok(p1)(k) =>
      k -> fmt(minOf(p1)(k) / drift) })
    def passMins(leg: ((String, Double, Double, Double)) => Double): String =
      jmap(canarySamples.map(_._1).distinct.toSeq.map { p =>
        // the sp leg records the -1.0 null-session sentinel when a
        // sample lands before canarySparkSession is assigned (or after
        // clear) — drop sentinels so every canary_*_pass_min shares
        // the valid-samples definition of canary_*_s/canary_*_p50; a
        // pass with zero valid samples reports -1 like canary_sp_s
        // does (the st/mt legs are raw timings, always >= 0, so the
        // filter is a no-op there)
        val vs = canarySamples.filter(_._1 == p).map(leg).filter(_ >= 0)
        p -> fmt(if (vs.isEmpty) -1.0 else vs.min)
      })
    val canaryFull = canaryPart +
      s""","canary_mt_ref_s":${fmt(CanaryMtRefSec)}""" +
      s""","canary_samples":${canaryStAll.map(fmt).mkString("[", ",", "]")}""" +
      s""","canary_mt_samples":${canaryMtAll.map(fmt).mkString("[", ",", "]")}""" +
      s""","canary_sp_samples":${canarySpAll.map(fmt).mkString("[", ",", "]")}""" +
      s""","canary_pass_min":${passMins(_._2)}""" +
      s""","canary_mt_pass_min":${passMins(_._3)}""" +
      s""","canary_sp_pass_min":${passMins(_._4)}""" +
      s""","queries_norm":$qsNorm"""
    val full =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"spread":$spread,"warmup":$warmupsJson,"warmup_total":${fmt(warmupTotal)}$sf2Part$exportPart$canaryFull,"reps":$reps,"sf":"$sfDir"}"""
    // a BENCH_ONLY-filtered iteration must never clobber the full-board
    // artifact the round workflow compares against — partial runs go to
    // a side file unless SPARK_GRAFT_BENCH_OUT overrides explicitly
    val defaultOut =
      if (only.isEmpty) "BENCH_LATEST.json" else "BENCH_PARTIAL.json"
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", defaultOut)
    try java.nio.file.Files.writeString(java.nio.file.Path.of(outFile), full + "\n")
    catch { case e: Exception => System.err.println(s"[bench] write $outFile: $e") }
    spark.stop()
  }
}
