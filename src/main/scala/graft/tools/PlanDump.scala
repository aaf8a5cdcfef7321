package graft.tools

import graft.core.Sessions

/** Dev utility: dump `.explain("formatted")` for named SparkEntry
  * queries to text files — the plan-claim evidence for optimization
  * rounds (`plans/r{N}/<query>_<tag>.txt`).
  *
  * `sbt "runMain graft.tools.PlanDump plans/r21 before q197_lsh_pr_curve ..."`
  * (defaults: sf0.1 via SPARK_GRAFT_SF_DIR, 32 cpus via SPARK_GRAFT_CPUS).
  *
  * Side-effectful queries (export pipeline, streaming) run their work
  * during construction; the dumped plan is the plan of the RETURNED
  * DataFrame, which for those families is the final summary aggregate
  * only — noted in the file header so a reader is not misled.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <outDir> <tag> <query>...")
    val outDir = java.nio.file.Path.of(args(0))
    val tag = args(1)
    val names = args.drop(2).toSeq
    java.nio.file.Files.createDirectories(outDir)
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for (name <- names) {
      val df = graft.SparkEntry.queries(name)(spark, dir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val header = s"// $name @ $dir (${tag})\n" +
        "// explain(\"formatted\") of the DataFrame the query returns\n"
      java.nio.file.Files.writeString(
        outDir.resolve(s"${name}_$tag.txt"), header + txt)
      println(s"[plandump] wrote ${name}_$tag.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}
