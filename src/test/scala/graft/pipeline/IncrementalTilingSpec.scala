package graft.pipeline

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Writer-level half of the q208 tiling invariant (README.md:83-84):
  * two consecutive incremental exports written through the byte-rolling
  * snapshot sink must ACCOUNT to the full export — record totals tile,
  * every manifest's line count matches its file accounting, and both
  * signed-byte key slices appear in each window's output. */
class IncrementalTilingSpec extends SparkSuite {

  private val N = 2000L

  private def export(lo: Long, hi: Long, snapshotType: String,
      outDir: String, manDir: String): Seq[SnapshotWriter.FileAccounting] = {
    val raw = spark.read.format("graft.sources.EnvelopeSource")
      .option("n", N).option("scanWidth", 128).option("tsSpread", 10)
      .load()
      .filter(col("ts") >= lo && col("ts") < hi)
    val recs = ExportPipeline.records(ExportPipeline.run(
      raw, Fixture.Topic, Fixture.keyService, snapshotType = snapshotType))
    val cfg = SnapshotWriter.Config(outDir, manDir, Fixture.Topic,
      maxBatchBytes = 100000, compression = "gz")
    SnapshotWriter.write(recs, cfg, Fixture.keyService).collect().toSeq
  }

  test("two incremental exports tile the full export's manifest accounting") {
    val dirs = (1 to 6).map(_ => Files.createTempDirectory("graft-tile"))
    val Seq(fullOut, fullMan, i1Out, i1Man, i2Out, i2Man) = dirs
    try {
      val full = export(1000L, 1010L, "full", fullOut.toString, fullMan.toString)
      val inc1 = export(1000L, 1005L, "incremental", i1Out.toString, i1Man.toString)
      val inc2 = export(1005L, 1010L, "incremental", i2Out.toString, i2Man.toString)

      // record totals tile exactly
      assert(full.map(_.records).sum === N)
      assert(inc1.map(_.records).sum + inc2.map(_.records).sum === N)

      // every manifest's line count matches its file accounting, in
      // every window — the reconciliation a downstream consumer runs
      for ((acct, manDir) <- Seq((full, fullMan), (inc1, i1Man), (inc2, i2Man));
           fa <- acct) {
        val lines = Files.readString(manDir.resolve(fa.manifest_file))
          .split("\n").count(_.nonEmpty)
        assert(lines === fa.records,
          s"${fa.manifest_file}: $lines manifest lines vs ${fa.records} records")
      }

      // both signed-byte key slices produce output in each window
      // (scanWidth=128 → slices 000-128 and 128-000)
      for (acct <- Seq(full, inc1, inc2))
        assert(acct.map(_.slice).distinct.sorted === Seq("000-128", "128-000"))

      // file decrypt+decompress round-trip: the tiled windows' DOC
      // multiset equals the full export's, read back from the files
      // themselves (not the in-memory relations)
      def docs(out: java.nio.file.Path,
          acct: Seq[SnapshotWriter.FileAccounting]): Seq[String] =
        acct.flatMap(fa => SnapshotWriter.readBack(out.toString, fa.file,
          "gz", Fixture.keyService))
      val fullDocs = docs(fullOut, full).groupBy(identity).view.mapValues(_.size)
      val incDocs = (docs(i1Out, inc1) ++ docs(i2Out, inc2))
        .groupBy(identity).view.mapValues(_.size)
      assert(fullDocs.toMap === incDocs.toMap,
        "tiled incremental files must re-read to the full export's docs")
    } finally dirs.foreach { d =>
      import scala.jdk.CollectionConverters._
      Files.walk(d).iterator().asScala.toSeq.reverse
        .foreach(Files.deleteIfExists(_))
    }
  }
}
