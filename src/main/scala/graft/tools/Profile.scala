package graft.tools

/** Driver-side phase profiler for one query — the diagnostic behind
  * the bench's fixed-overhead work: splits a warm rep into DataFrame
  * construction, analysis, physical planning, and execution (the
  * count() action, which includes its own re-plan), so "the board is
  * overhead-bound" can be attributed to a phase instead of guessed.
  *
  * Usage: `sbt "runMain graft.tools.Profile <sfDir> <query> [reps]"`.
  */
object Profile {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val qname = if (args.length > 1) args(1) else "q09_join_inner"
    val reps = if (args.length > 2) args(2).toInt else 5
    val spark = graft.core.Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    // conf experiments: SPARK_GRAFT_PROFILE_CONFS="k=v;k=v"
    sys.env.get("SPARK_GRAFT_PROFILE_CONFS").foreach(_.split(";")
      .filter(_.contains("=")).foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        spark.conf.set(k.trim, v.trim)
      })
    // streaming queries do their work inside fn (micro-batch runs):
    // surface each batch's duration breakdown so the driver-side gap
    // between batch jobs is attributable (planning vs offset/commit
    // WAL vs state-store commit vs addBatch execution)
    spark.streams.addListener(
      new org.apache.spark.sql.streaming.StreamingQueryListener {
        override def onQueryStarted(
            e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
        override def onQueryTerminated(
            e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit = ()
        override def onQueryProgress(
            e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit = {
          val p = e.progress
          val d = p.durationMs
          System.err.println(s"[profile-stream] batch=${p.batchId} " +
            s"rows=${p.numInputRows} durationMs=$d " +
            s"state=${p.stateOperators.map(so =>
              s"(commit=${so.commitTimeMs}ms mem=${so.memoryUsedBytes})").mkString(",")}")
        }
      })
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val tasks = new java.util.concurrent.atomic.AtomicInteger
    val taskNanos = new java.util.concurrent.atomic.AtomicLong
    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val jobSpans = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet(); jobStart.put(j.jobId, j.time); ()
        }
        override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          Option(jobStart.remove(j.jobId))
            .foreach(t0 => jobSpans.add(j.time - t0)); ()
        }
        override def onStageCompleted(s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          stages.incrementAndGet(); ()
        }
        override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          tasks.incrementAndGet()
          if (t.taskInfo != null)
            taskNanos.addAndGet(
              (t.taskInfo.finishTime - t.taskInfo.launchTime) * 1000000L)
          ()
        }
      })
    val fn = graft.SparkEntry.queries(qname)
    fn(spark, sfDir).count() // warmup: JIT + codegen cache + memos
    for (i <- 1 to reps) {
      jobs.set(0); stages.set(0); tasks.set(0); taskNanos.set(0)
      jobSpans.clear()
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      val t1 = System.nanoTime()
      df.queryExecution.assertAnalyzed()
      val t2 = System.nanoTime()
      df.queryExecution.executedPlan
      val t3 = System.nanoTime()
      val n = df.count()
      val t4 = System.nanoTime()
      // listener events drain async; give them a beat before reading
      Thread.sleep(150)
      println(f"[profile] $qname rep $i: build ${(t1 - t0) / 1e6}%7.1f ms  " +
        f"analyze ${(t2 - t1) / 1e6}%6.1f ms  plan ${(t3 - t2) / 1e6}%7.1f ms  " +
        f"count ${(t4 - t3) / 1e6}%7.1f ms  rows=$n  " +
        f"jobs=${jobs.get()} stages=${stages.get()} tasks=${tasks.get()} " +
        f"taskTime=${taskNanos.get() / 1e6}%.0f ms  " +
        s"jobWall=[${scala.jdk.CollectionConverters.IteratorHasAsScala(
          jobSpans.iterator()).asScala.mkString(",")}] ms")
    }
    spark.stop()
  }
}
