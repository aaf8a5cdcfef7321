package graft.tools

import graft.core.Sessions

/** Dev utility: time a subset of SparkEntry queries in isolation.
  * `sbt "runMain graft.tools.Probe q32_knn_ivf q23_minhash_pairs"`
  * (defaults to sf0.1; override with SPARK_GRAFT_SF_DIR). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = if (args.nonEmpty) args.toSeq else graft.SparkEntry.queries.keys.toSeq.sorted
    for (name <- names) {
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(name)(spark, dir).count()
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    spark.stop()
  }
}
