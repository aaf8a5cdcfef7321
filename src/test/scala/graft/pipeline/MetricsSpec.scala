package graft.pipeline

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Metrics surface spec (reference: MetricsConfiguration.kt counters +
  * PushGatewayServiceImpl push loop): executor effort off the listener
  * bus, job counters from data, Prometheus exposition output. */
class MetricsSpec extends SparkSuite {

  test("instrumented pipeline run yields task + data metrics and exposition output") {
    val ((nOk, nSkipped), reg) = Metrics.instrumented(spark) { reg =>
      val out = ExportPipeline.run(
        Fixture.generate(spark, 500, corrupt = true), Fixture.Topic,
        Fixture.keyService)
      val summary = ExportPipeline.skipSummary(out).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      // job-level counters come from DATA (not accumulators)
      reg.inc("graft_records_exported_total", summary.getOrElse("ok", 0L))
      summary.filterNot(_._1 == "ok").foreach { case (k, v) =>
        reg.inc(s"graft_records_skipped_total", v)
      }
      (summary("ok"), summary.filterNot(_._1 == "ok").values.sum)
    }
    assert(nOk == 485 && nSkipped == 15)
    assert(reg.counter("graft_records_exported_total") == 485)
    assert(reg.counter("graft_records_skipped_total") == 15)
    assert(reg.counter("graft_tasks_completed_total") > 0)
    assert(reg.counter("graft_executor_run_time_ms_total") > 0)

    val expo = reg.expositionFormat
    assert(expo.contains("# TYPE graft_records_exported_total counter"))
    assert(expo.contains("graft_records_exported_total 485"))

    val target = Files.createTempFile("graft-metrics", ".prom")
    reg.pushTo(target)
    assert(Files.readString(target).contains("graft_tasks_completed_total"))
  }

  test("gauges and repeated counter increments") {
    val reg = new Metrics.MetricsRegistry
    reg.inc("c", 2); reg.inc("c", 3)
    reg.setGauge("g", 1.5); reg.setGauge("g", 2.5)
    assert(reg.counter("c") == 5)
    assert(reg.gauge("g").contains(2.5))
    assert(reg.expositionFormat.contains("# TYPE g gauge\ng 2.5"))
  }
}
