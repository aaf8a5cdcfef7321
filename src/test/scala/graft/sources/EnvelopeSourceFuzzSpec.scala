package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.pipeline.Fixture

/** Randomized sweep over the DSv2 envelope source's planning surface:
  * random corpus sizes × scan widths × version/ts-spread modes ×
  * pushed ts ranges × pushed point-probe sets, each checked against
  * the fixture's ARITHMETIC model (key i carries 1 + i%versions cell
  * versions from [[Fixture.CellTimestamp]], or one cell at
  * t0 + i%tsSpread; [[VersionSelect.latestIn]] is the winner rule).
  * What the fuzz exercises beyond the fixed specs: every
  * scanWidth/predicate combination plans the right partition count,
  * the ts range reaches the store at every width, and the probe plan
  * returns exactly the model's winners for arbitrary present/absent/
  * empty key mixes. */
class EnvelopeSourceFuzzSpec extends SparkSuite {

  private val t0 = Fixture.CellTimestamp

  test("random widths, versions, ts pushdowns, and probe sets match the arithmetic model") {
    val rnd = new scala.util.Random(20260815L)
    val ks = Fixture.keyService
    val dek = ks.batchDataKey().plaintextDataKey
    val encKey = ks.encryptKey(Fixture.MasterKeyId, dek)

    for (trial <- 0 until 6) {
      val n = 200L + 100L * rnd.nextInt(4)
      val scanWidth = Seq(8, 16, 32, 64, 128)(rnd.nextInt(5))
      val versions = 1 + rnd.nextInt(5)
      val tsSpread = if (versions == 1) 1 + rnd.nextInt(10) else 1
      val ctx = s"trial $trial n=$n w=$scanWidth v=$versions s=$tsSpread"

      def keyOf(i: Long): Array[Byte] =
        Fixture.cell(i, dek, encKey, corrupt = false, 0).hbase_id
      def winner(i: Long, range: TsRange): Option[Long] =
        if (versions > 1)
          VersionSelect.latestIn(1L + (i % versions), t0, range)
            .map(v => t0 + v)
        else Some(t0 + (if (tsSpread > 0) i % tsSpread else 0L))
          .filter(range.contains)

      val df = spark.read.format("graft.sources.EnvelopeSource")
        .option("n", n.toString).option("scanWidth", scanWidth.toString)
        .option("versions", versions.toString)
        .option("tsSpread", tsSpread.toString)
        .load()
      assert(df.rdd.getNumPartitions === 256 / scanWidth, ctx)

      // two random pushed ts ranges + the full scan
      val ranges = Seq(TsRange.All) ++ (0 until 2).map { _ =>
        val lo = t0 + rnd.nextInt(6) - 2
        TsRange(lo, lo + rnd.nextInt(6))
      }
      for (range <- ranges) {
        val filtered =
          if (range == TsRange.All) df
          else df.filter(col("ts") >= range.lo && col("ts") <= range.hi)
        if (range != TsRange.All) {
          val plan = filtered.queryExecution.executedPlan.toString
          assert(plan.contains(s"GreaterThanOrEqual(ts,${range.lo})"),
            s"$ctx ts range not pushed:\n${plan.take(600)}")
        }
        val got = filtered.select("hbase_id", "ts").collect()
          .map(r => r.getAs[Array[Byte]](0).toSeq -> r.getLong(1)).toMap
        val expected = (0L until n).flatMap(i =>
          winner(i, range).map(ts => keyOf(i).toSeq -> ts)).toMap
        assert(got === expected, s"$ctx range $range")
      }

      // random probe set: present + perturbed-absent + an empty key
      val presentIds = Seq.fill(6)(rnd.nextLong().abs % n).distinct
      val present = presentIds.map(keyOf)
      val absent = present.take(3).map { r =>
        val x = r.clone(); x(x.length - 1) = (x(x.length - 1) ^ 0x5a).toByte; x
      }
      val probeKeys: Seq[Array[Byte]] =
        present ++ absent ++ Seq(Array.emptyByteArray)
      val probed = df.filter(col("hbase_id").isin(probeKeys: _*))
      val plan = probed.queryExecution.executedPlan.toString
      assert(plan.contains("ProbedRows: "), s"$ctx probe not pushed")
      assert(probed.rdd.getNumPartitions <= present.size + absent.size, ctx)
      val gotProbe = probed.select("hbase_id", "ts").collect()
        .map(r => r.getAs[Array[Byte]](0).toSeq -> r.getLong(1)).toMap
      val expectProbe = presentIds.flatMap(i =>
        winner(i, TsRange.All).map(ts => keyOf(i).toSeq -> ts)).toMap
      assert(gotProbe === expectProbe, s"$ctx probe")
    }
  }
}
