package graft

/** Single-query A/B harness for cross-COMMIT comparisons (the q50
  * refactor-debt protocol): the same file is overlaid verbatim onto
  * both trees so each side carries an identical measurement loop AND
  * an identical machine-drift canary, regardless of what that tree's
  * `Bench` knew about. Runs SPARK_GRAFT_AB_QUERY (default q50) with
  * one untimed warmup then SPARK_GRAFT_AB_REPS timed passes, a canary
  * sample before each, and prints one JSON line with the raw min, the
  * canary min, and the drift-normalized min (canary anchor = the r14
  * constant, 0.470 s / 2e8 xorshift64* iterations — keep in sync with
  * [[Bench.CanaryRefSec]]). Interleave whole-process invocations of
  * the two trees A/B/A/B and compare `norm` min-of-runs. */
object ABBench {
  private[graft] val CanaryIters = 200000000L
  private[graft] val CanaryRefSec = 0.470
  @volatile private var sink = 0L
  private def canaryOnce(): Double = {
    val t0 = System.nanoTime()
    var x = 0x9E3779B97F4A7C15L
    var acc = 0L
    var i = 0L
    while (i < CanaryIters) {
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17
      acc += x * 0x2545F4914F6CDD1DL
      i += 1
    }
    sink = acc
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val q = sys.env.getOrElse("SPARK_GRAFT_AB_QUERY", "q50_equality_export")
    val reps = sys.env.getOrElse("SPARK_GRAFT_AB_REPS", "3").toInt.max(1)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val fn = SparkEntry.queries(q)
    def once(): Double = {
      val t0 = System.nanoTime()
      fn(spark, dir).count()
      (System.nanoTime() - t0) / 1e9
    }
    once() // untimed warmup (JIT, fixture generation, managed caches)
    val samples = (1 to reps).map(_ => (canaryOnce(), once()))
    val canaryS = samples.map(_._1).min
    val minS = samples.map(_._2).min
    val drift = canaryS / CanaryRefSec
    def f(d: Double) = BigDecimal(d)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toString
    println(s"""{"query":"$q","min":${f(minS)},"canary_s":${f(canaryS)}""" +
      s""","drift":${f(drift)},"norm":${f(minS / drift)}""" +
      s""","all":[${samples.map(s => f(s._2)).mkString(",")}]}""")
    spark.stop()
  }
}
