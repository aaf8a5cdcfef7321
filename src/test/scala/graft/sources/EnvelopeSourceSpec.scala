package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.pipeline.{ExportPipeline, Fixture}

/** DSv2 source spec: key-range partition planning, ts-range pushdown,
  * column pruning, parity with the Dataset fixture, and the pipeline
  * running end-to-end over the source. */
class EnvelopeSourceSpec extends SparkSuite {

  private def read(opts: (String, String)*): DataFrame = {
    val r = spark.read.format("graft.sources.EnvelopeSource")
    opts.foldLeft(r) { case (b, (k, v)) => b.option(k, v) }.load()
  }

  test("reads the full corpus with the declared schema") {
    val df = read("n" -> "1000")
    assert(df.schema.fieldNames.toSeq == Seq("hbase_id", "ts", "value"))
    assert(df.count() == 1000)
  }

  test("plans one input partition per key-range slice (HBasePartitioner.kt:12-37)") {
    assert(read("n" -> "500", "scanWidth" -> "64").rdd.getNumPartitions == 4)
    assert(read("n" -> "500", "scanWidth" -> "128").rdd.getNumPartitions == 2)
    assert(read("n" -> "500", "scanWidth" -> "16").rdd.getNumPartitions == 16)
    // slices are disjoint + exhaustive: per-partition counts sum to n
    val df = read("n" -> "500", "scanWidth" -> "64")
    val perPart = df.groupBy(spark_partition_id()).count()
      .collect().map(_.getLong(1))
    assert(perPart.sum == 500 && perPart.length == 4)
  }

  test("time-range filter pushes into the scan (HBaseReader.kt:131-150)") {
    // ts = 1000 + i % 10 with tsSpread=10
    val df = read("n" -> "1000", "tsSpread" -> "10")
    val filtered = df.filter(col("ts") >= 1005L && col("ts") < 1008L)
    assert(filtered.count() == 300) // i%10 in {5,6,7}
    val planStr = filtered.queryExecution.executedPlan.toString
    assert(planStr.contains("PushedFilters") &&
      planStr.contains("GreaterThanOrEqual(ts,1005)"),
      s"expected pushed ts filters in:\n$planStr")
  }

  test("column pruning reaches the reader (ReadSchema)") {
    val df = read("n" -> "100").select("value")
    val scan = df.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("ReadSchema: struct<value:string>"), scan)
    assert(df.count() == 100)
  }

  test("rows are byte-identical to the Dataset fixture") {
    val viaSource = read("n" -> "200")
      .select(hex(col("hbase_id")).as("k"), col("value"))
    val viaFixture = Fixture.generate(spark, 200)
      .select(hex(col("hbase_id")).as("k"), col("value"))
    assert(viaSource.exceptAll(viaFixture).count() == 0)
    assert(viaFixture.exceptAll(viaSource).count() == 0)
  }

  test("export pipeline runs end-to-end over the DSv2 source") {
    val out = ExportPipeline.run(read("n" -> "1000"), Fixture.Topic,
      Fixture.keyService)
    val recs = ExportPipeline.records(out)
    assert(recs.count() == 1000)
    assert(recs.filter(col("doc").contains("d_oid")).count() == 500)
  }
}
