package graft.queries
import org.apache.spark.sql.functions._
object Scratch {
  def main(args: Array[String]): Unit = {
    val s = graft.core.Sessions.local("32")
    val dir = "/root/testdata/sf0.1"
    def time[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime(); val r = body
      println(f"[scratch] $label%-24s ${(System.nanoTime()-t0)/1e9}%7.2f s  -> $r"); r
    }
    def size(label: String, df: org.apache.spark.sql.DataFrame): Unit =
      println(s"[scratch] $label nodes=" + df.queryExecution.analyzed.map(_ => 1).sum)
    time("groups-first")(Dedup.qDedupGroups(s, dir).count())
    Dedup.qDecontam(s, dir).count()
    size("q63", Dedup.qDedupGroups(s, dir))
    size("q201", Dedup.q201SplitContam(s, dir))
    size("q107", Curation.q107LeakSplit(s, dir))
    size("q147", GraphOps.q147TwoHop(s, dir))
    size("q111", GraphOps.q111Pagerank(s, dir))
    size("q136", Dedup.qDedupKeepBest(s, dir))
    time("q201-1")(Dedup.q201SplitContam(s, dir).count())
    time("q201-2")(Dedup.q201SplitContam(s, dir).count())
    time("q107-1")(Curation.q107LeakSplit(s, dir).count())
    time("q147-1")(GraphOps.q147TwoHop(s, dir).count())
    time("q136-1")(Dedup.qDedupKeepBest(s, dir).count())
    time("q205-1")(Curation.q205SplitDrift(s, dir).count())
    s.stop()
  }
}
