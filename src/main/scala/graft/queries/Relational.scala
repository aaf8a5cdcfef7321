package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.Tables

/** Relational query surface (SURVEY.md §2.3 Q1–Q16).
  *
  * Rows 1–8 re-express reference semantics (range scan, time-range
  * incremental filter, mandatory-field skip, sanitisation, date
  * normalization, latest-version-per-key, partition accounting — see
  * citations per query); rows 9–16 complete the relational surface.
  *
  * Oracle-determinism rules used throughout (the driver hash-compares
  * against DuckDB on the same parquet):
  *  - SUM/AVG over doubles go through DECIMAL(25,6) (exact, associative)
  *    and back to DOUBLE, so shuffle/partial-agg order cannot change bits.
  *  - event time is truncated to MICROSECONDS (`ts div 1000`) because
  *    DuckDB reads the nanosecond parquet column as µs TIMESTAMP while
  *    Spark reads it as epoch-nanos long (see [[graft.core.Tables]]).
  *  - every result has a total ORDER BY (unique key suffix) in both
  *    engines, and no raw timestamp columns in the output schema.
  */
object Relational {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Exact, order-insensitive double SUM: route through DECIMAL(25,6). */
  private[queries] def dsum(c: Column): Column =
    sum(c.cast(DecimalType(25, 6))).cast(DoubleType)
  /** The DuckDB-side twin of [[dsum]]. */
  private[queries] def DSUM(x: String): String =
    s"CAST(SUM(CAST($x AS DECIMAL(25,6))) AS DOUBLE)"

  /** Exact, engine-agreed rounded mean: `round(sum(c)/n, scale)` with
    * the sum routed through DECIMAL(25,6) (order-free, the [[dsum]]
    * contract) and the final rounding done on the EXACT RATIONAL
    * sum/n in pure integer arithmetic — never on a double. The naive
    * `round(dsum(c)/count, scale)` divides in doubles and rounds the
    * double: when the true mean is a REAL tie at `scale` dp (e.g.
    * 0.616992/192 = 0.0032135 exactly — bit q82 at sf0.1), the
    * nearest double sits an ulp off the tie and the two engines'
    * round() break it oppositely. Here the tie is resolved
    * half-away-from-zero on the exact value in BOTH engines:
    * with S = sum·10⁶ (an exact integer, the decimal's unscaled
    * value) and d = n·10^(6−scale), the rounded mean in 10^-scale
    * units is sign(S)·((2|S| + d) div (2d)); the final
    * units→double division is a single correctly-rounded IEEE op on
    * exact integers. Operands ride DECIMAL(38,0), so the only range
    * bound is the LONG quotient: |mean|·10^scale < 2⁶³ — any real
    * mean. Twin: [[DMEAN]]. */
  private[queries] def dmean(c: Column, scale: Int): Column =
    dmeanFinish(sum(c.cast(DecimalType(25, 6))), count(lit(1)), scale)

  /** The [[dmean]] finisher over PRE-AGGREGATED inputs: `sDec` is the
    * DECIMAL(25,6)-routed sum (or any exact regrouping of it — decimal
    * addition is associative, so a sum of per-group decimal sums is
    * bit-identical to the direct sum) and `n` the matching row count.
    * Lets a query that needs BOTH per-group means and the overall mean
    * compute them from ONE aggregation pass (per-group (sum, count)
    * rows, then window/rollup totals) instead of re-executing the
    * input subtree per mean — same integer tie-break arithmetic, same
    * result bits. */
  private[queries] def dmeanFinish(sDec: Column, n: Column,
      scale: Int): Column = {
    require(scale >= 0 && scale <= 6, s"dmean scale $scale outside [0,6]")
    val d38 = DecimalType(38, 0)
    // (38,6) is a lossless widening of any decimal-routed sum type
    // (sum over (25,6) yields (35,6); window re-sums reach (38,6)) —
    // the finisher must not narrow below what [[dmean]]'s inline sum
    // carried, or large-magnitude sums would overflow here
    val s6 = (sDec.cast(DecimalType(38, 6)) * lit(1000000L)).cast(d38)
    val d = (n * lit(math.pow(10, 6 - scale).toLong)).cast(d38)
    val units = org.apache.spark.sql.graftbridge.ColumnBridge.div(
      abs(s6) * lit(2L) + d, d * lit(2L))
    (when(s6 < lit(0), -units).otherwise(units).cast(DoubleType) /
      lit(math.pow(10, scale)))
  }

  /** Exact, engine-agreed rounded ratio of two NON-NEGATIVE integer
    * columns: `round(p/q, scale)` with the tie resolved half-up on
    * the exact rational — the [[dmean]] integer form for plain count
    * ratios. `round(p.cast(double)/q, scale)` hits real ties whenever
    * q has only 2/5 factors beyond the scale (e.g. 1/32 = 0.03125 is
    * an exact 4-dp tie), and the engines' double round() break those
    * oppositely. Twin: [[DRATIO]]. */
  private[queries] def dratio(p: Column, q: Column, scale: Int): Column = {
    require(scale >= 0 && scale <= 9, s"dratio scale $scale outside [0,9]")
    val d38 = DecimalType(38, 0)
    val u = math.pow(10, scale).toLong
    val units = org.apache.spark.sql.graftbridge.ColumnBridge.div(
      p.cast(d38) * lit(2L * u) + q.cast(d38), q.cast(d38) * lit(2L))
    units.cast(DoubleType) / lit(math.pow(10, scale))
  }

  /** Exact, engine-agreed rounded SIGNED ratio of integer columns
    * (q > 0): [[dratio]] with sign support — `round(p/q, scale)`
    * resolved half-AWAY-FROM-ZERO on the exact rational in pure
    * integer arithmetic (the [[dmean]] sign treatment applied to a
    * scalar ratio). For rational-valued scores that can go negative —
    * linear feature combos over count ratios (q97's logit), quantized
    * sum-of-squares ratios (q203's variance forms). Twin: [[DFRAC]]. */
  private[queries] def dfrac(p: Column, q: Column, scale: Int): Column = {
    require(scale >= 0 && scale <= 9, s"dfrac scale $scale outside [0,9]")
    val d38 = DecimalType(38, 0)
    val u = math.pow(10, scale).toLong
    val pd = p.cast(d38)
    val qd = q.cast(d38)
    val units = org.apache.spark.sql.graftbridge.ColumnBridge.div(
      abs(pd) * lit(2L * u) + qd, qd * lit(2L))
    (when(pd < lit(0), -units).otherwise(units).cast(DoubleType) /
      lit(math.pow(10, scale)))
  }

  /** The DuckDB-side twin of [[dfrac]] — the sign split mirrors
    * [[DMEAN]]'s (HUGEINT `//` truncates toward zero for the
    * non-negative operands each branch feeds it). */
  private[queries] def DFRAC(p: String, q: String, scale: Int): String = {
    require(scale >= 0 && scale <= 9, s"DFRAC scale $scale outside [0,9]")
    val u = math.pow(10, scale).toLong
    val pp = s"CAST($p AS HUGEINT)"
    val qq = s"CAST($q AS HUGEINT)"
    s"(CAST(CASE WHEN $pp < 0 THEN -((2*$u*(-($pp)) + $qq) // (2*$qq)) " +
      s"ELSE (2*$u*($pp) + $qq) // (2*$qq) END AS DOUBLE) / " +
      s"${DLIT(math.pow(10, scale))})"
  }

  /** The DuckDB-side twin of [[dratio]]. */
  private[queries] def DRATIO(p: String, q: String, scale: Int): String = {
    require(scale >= 0 && scale <= 9, s"DRATIO scale $scale outside [0,9]")
    val u = math.pow(10, scale).toLong
    s"(CAST((2*$u*CAST($p AS HUGEINT) + CAST($q AS HUGEINT)) // " +
      s"(2*CAST($q AS HUGEINT)) AS DOUBLE) / ${DLIT(math.pow(10, scale))})"
  }

  /** The DuckDB-side twin of [[dmean]] — same integer arithmetic over
    * HUGEINT (`//` = integral division, floor = trunc on the
    * non-negative operands used here). */
  private[queries] def DMEAN(x: String, scale: Int): String = {
    require(scale >= 0 && scale <= 6, s"DMEAN scale $scale outside [0,6]")
    val p = math.pow(10, 6 - scale).toLong
    val s = s"CAST(SUM(CAST($x AS DECIMAL(25,6))) * 1000000 AS HUGEINT)"
    val d = s"(CAST(COUNT(*) AS HUGEINT) * $p)"
    s"(CAST(CASE WHEN $s < 0 THEN -((2*(-($s)) + $d) // (2*$d)) " +
      s"ELSE (2*($s) + $d) // (2*$d) END AS DOUBLE) / " +
      s"${DLIT(math.pow(10, scale))})"
  }

  /** Bit-exact DOUBLE literal for DuckDB-side SQL. A bare decimal
    * literal like `0.9477977920742495` parses as DECIMAL(17,16), and
    * DuckDB's wide-decimal→double conversion double-rounds (÷10^scale
    * via two inexact steps), landing one ulp off the JVM double the
    * Spark side carries. E-notation (`…e0`) forces a DOUBLE literal
    * through DuckDB's correctly-rounded strtod, and Double.toString's
    * round-trip guarantee then reproduces the exact bits. Use this
    * for ANY interpolated Double whose shortest representation may
    * exceed ~15 significant digits. */
  private[queries] def DLIT(v: Double): String = {
    // Double.toString(NaN) → "NaNe0", Infinity → "Infinitye0": both
    // unparseable SQL that would surface as a DuckDB error far from
    // the interpolation site — fail loud here instead.
    require(java.lang.Double.isFinite(v),
      s"DLIT requires a finite double, got $v")
    val t = v.toString
    if (t.contains("E")) t.replace("E", "e")
    else if (t.contains("e")) t
    else t + "e0"
  }

  /** Compare a timestamp column against a date literal without losing
    * parquet filter pushdown (cast the literal, not the column). */
  private def tsLit(df: DataFrame, colName: String, v: String): Column =
    lit(v).cast(df.schema(colName).dataType)

  // ---------------------------------------------------------------- Q1
  // Full scan + count (ref: whole-table export, README.md:5).
  def q01Scan(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem").agg(
      count(lit(1)).as("n_rows"),
      dsum(col("l_quantity")).as("sum_qty"),
      countDistinct(col("l_orderkey")).as("n_orders"))

  val q01Sql: String =
    s"""SELECT COUNT(*) AS n_rows, ${DSUM("l_quantity")} AS sum_qty,
       |COUNT(DISTINCT l_orderkey) AS n_orders FROM lineitem""".stripMargin

  // ---------------------------------------------------------------- Q2
  // Projection + time-range filter = the incremental-export scan
  // (ref: batch/HBaseReader.kt:145-150 sets the HBase scan time range).
  def q02ProjFilter(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    o.filter(col("o_orderdate") >= tsLit(o, "o_orderdate", "1996-01-01") &&
             col("o_orderdate") <  tsLit(o, "o_orderdate", "1997-01-01"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
              date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_date"))
      .orderBy("o_orderkey")
  }

  val q02Sql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice,
      |strftime(o_orderdate, '%Y-%m-%d') AS o_date FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      |AND o_orderdate < TIMESTAMP '1997-01-01' ORDER BY o_orderkey""".stripMargin

  // ---------------------------------------------------------------- Q3
  // Key-range pruning = start/stop-row scan (ref: HBaseReader.kt:156-160,
  // HBasePartitioner.kt:12-37 key-prefix slices).
  def q03RangePrune(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .filter(col("c_custkey") >= 100 && col("c_custkey") <= 1000)
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      .orderBy("c_custkey")

  val q03Sql: String =
    """SELECT c_custkey, c_name, c_acctbal FROM customer
      |WHERE c_custkey BETWEEN 100 AND 1000 ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------- Q4
  // Mandatory-field skip accounting (ref: HBaseResultProcessor.kt:97-102
  // throws MissingFieldException; JobConfiguration.kt:57-61 skips it).
  def q04Mandatory(s: SparkSession, dir: String): DataFrame = {
    val ok = col("event_type").isNotNull && col("props").isNotNull &&
      col("value").isNotNull
    t(s, dir, "events").select(ok.as("ok")).agg(
      count(lit(1)).as("n_total"),
      count(when(col("ok"), 1)).as("n_kept"),
      count(when(!col("ok"), 1)).as("n_dropped"))
  }

  val q04Sql: String =
    """WITH f AS (SELECT (event_type IS NOT NULL AND props IS NOT NULL
      |AND value IS NOT NULL) AS ok FROM events)
      |SELECT COUNT(*) AS n_total, COUNT(CASE WHEN ok THEN 1 END) AS n_kept,
      |COUNT(CASE WHEN NOT ok THEN 1 END) AS n_dropped FROM f""".stripMargin

  // ---------------------------------------------------------------- Q5
  // Sanitisation chain, order-sensitive — an *analogy* of the reference
  // chain (SanitisationProcessor.kt:14,17-44) over `events.props`:
  // strips literal CR/LF control chars where the reference removes the
  // escaped two-char `\r`/`\n` sequences (and the escaped-unicode NUL) from serialized
  // JSON. The reference-exact regex chain lives in
  // [[graft.pipeline.Sanitise]] with golden unit tests.
  def q05Sanitise(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events").select(
      col("event_id"),
      replace(
        replace(
          replace(regexp_replace(col("props"), "[\\r\\n]+", ""),
            lit("$"), lit("d_")),
          lit("_archivedDateTime"), lit("_removedDateTime")),
        lit("_archived"), lit("_removed")).as("doc"),
      upper(col("event_type")).as("etype"))
      .orderBy("event_id")

  val q05Sql: String =
    """SELECT event_id,
      |replace(replace(replace(regexp_replace(props, '[\r\n]+', '', 'g'),
      |'$', 'd_'), '_archivedDateTime', '_removedDateTime'),
      |'_archived', '_removed') AS doc,
      |upper(event_type) AS etype FROM events ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------- Q6
  // Date normalization: epoch -> ISO-with-millis 'Z' format and back
  // (ref: Validator.kt:24-27,153-170 dual-format parse + reformat).
  def q06DateNormalize(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .withColumn("ts_us", expr("ts div 1000"))
      .withColumn("iso", date_format(expr("timestamp_micros(ts_us)"),
        "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'"))
      .select(
        col("event_id"), col("ts_us"), col("iso"),
        // dual-format fallback parse, second format never matches here
        coalesce(
          unix_millis(try_to_timestamp(col("iso"),
            lit("yyyy-MM-dd'T'HH:mm:ss.SSS'Z'"))),
          unix_millis(try_to_timestamp(col("iso"),
            lit("yyyy-MM-dd HH:mm:ss")))).as("parsed_ms"))
      .orderBy("event_id")

  val q06Sql: String =
    """SELECT event_id, epoch_us(ts) AS ts_us,
      |strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%dT%H:%M:%S.%gZ') AS iso,
      |COALESCE(
      |  epoch_ms(try_strptime(strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%dT%H:%M:%S.%gZ'), '%Y-%m-%dT%H:%M:%S.%gZ')),
      |  epoch_ms(try_strptime(strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%dT%H:%M:%S.%gZ'), '%Y-%m-%d %H:%M:%S'))
      |) AS parsed_ms
      |FROM events ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------- Q7
  // Latest version per key — the core "selects the latest records"
  // semantics (ref: README.md:5; HBaseReader.kt:145-150 latest cell).
  // Ordered at µs granularity (oracle parity), event_id tiebreak.
  def q07LatestVersion(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts_us").desc, col("event_id").desc)
    t(s, dir, "events")
      .withColumn("ts_us", expr("ts div 1000"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id"), col("event_type"),
              col("value"), col("ts_us"))
      .orderBy("user_id")
  }

  val q07Sql: String =
    """SELECT user_id, event_id, event_type, value, epoch_us(ts) AS ts_us
      |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
      |ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn FROM events)
      |WHERE rn = 1 ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------- Q8
  // Per-partition-range record accounting (ref: manifest/file counters,
  // S3StreamingWriter.kt:133-138; partition ranges HBasePartitioner.kt).
  def q08PartitionCount(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(expr("event_id div 1000").as("bucket"))
      .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("n_users"))
      .orderBy("bucket")

  val q08Sql: String =
    """SELECT event_id // 1000 AS bucket, COUNT(*) AS n,
      |COUNT(DISTINCT user_id) AS n_users FROM events
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------- Q9
  // Inner equi-join + aggregate (fact ⋈ fact).
  def q09JoinInner(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val o = t(s, dir, "orders")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("revenue"))
      .orderBy("o_orderpriority")
  }

  val q09Sql: String =
    s"""SELECT o_orderpriority, COUNT(*) AS n_items,
       |${DSUM("l_extendedprice * (1 - l_discount)")} AS revenue
       |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // --------------------------------------------------------------- Q10
  // Left outer join (customers with zero orders kept).
  def q10JoinLeft(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("n_orders"),
        coalesce(dsum(col("o_totalprice")), lit(0.0)).as("total_price"))
      .orderBy("c_custkey")
  }

  val q10Sql: String =
    s"""SELECT c_custkey, COUNT(o_orderkey) AS n_orders,
       |COALESCE(${DSUM("o_totalprice")}, 0.0) AS total_price
       |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
       |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin

  // --------------------------------------------------------------- Q11
  // Left semi join (EXISTS).
  def q11JoinSemi(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders").filter(col("o_totalprice") > 200000)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy("c_custkey")
  }

  val q11Sql: String =
    """SELECT c_custkey, c_name FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
      |AND o_totalprice > 200000) ORDER BY c_custkey""".stripMargin

  // --------------------------------------------------------------- Q12
  // Left anti join (NOT EXISTS).
  def q12JoinAnti(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy("c_custkey")
  }

  val q12Sql: String =
    """SELECT c_custkey, c_name, c_mktsegment FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |ORDER BY c_custkey""".stripMargin

  // --------------------------------------------------------------- Q13
  // Grouped aggregation battery: sum/avg/min/max/count(distinct).
  def q13AggStats(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        (dsum(col("l_extendedprice")) / count(lit(1))).as("avg_price"),
        min(col("l_discount")).as("min_disc"),
        max(col("l_discount")).as("max_disc"),
        countDistinct(col("l_orderkey")).as("n_orders"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag", "l_linestatus")

  val q13Sql: String =
    s"""SELECT l_returnflag, l_linestatus,
       |${DSUM("l_quantity")} AS sum_qty,
       |${DSUM("l_extendedprice")} / COUNT(*) AS avg_price,
       |MIN(l_discount) AS min_disc, MAX(l_discount) AS max_disc,
       |COUNT(DISTINCT l_orderkey) AS n_orders, COUNT(*) AS n_rows
       |FROM lineitem GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // --------------------------------------------------------------- Q14
  // ROLLUP over (nation, year) revenue.
  def q14Rollup(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val o = t(s, dir, "orders")
    val c = t(s, dir, "customer")
    val n = t(s, dir, "nation")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .select(col("n_name"),
        year(col("o_orderdate")).cast(StringType).as("o_year"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))
      .rollup(col("n_name"), col("o_year"))
      .agg(count(lit(1)).as("n_rows"), dsum(col("rev")).as("revenue"))
      .select(
        coalesce(col("n_name"), lit("ALL")).as("grp_nation"),
        coalesce(col("o_year"), lit("ALL")).as("grp_year"),
        col("n_rows"), col("revenue"))
      .orderBy("grp_nation", "grp_year")
  }

  val q14Sql: String =
    s"""WITH j AS (
       |SELECT n_name, CAST(year(o_orderdate) AS VARCHAR) AS o_year,
       |l_extendedprice * (1 - l_discount) AS rev
       |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation ON c_nationkey = n_nationkey)
       |SELECT COALESCE(n_name, 'ALL') AS grp_nation,
       |COALESCE(o_year, 'ALL') AS grp_year,
       |COUNT(*) AS n_rows, ${DSUM("rev")} AS revenue
       |FROM j GROUP BY ROLLUP (n_name, o_year)
       |ORDER BY grp_nation, grp_year""".stripMargin

  // --------------------------------------------------------------- Q15
  // Window functions: ranking + running + sliding frame.
  def q15Window(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val dec = col("o_totalprice").cast(DecimalType(25, 6))
    t(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        row_number().over(w).as("rn"),
        sum(dec).over(w.rowsBetween(Window.unboundedPreceding, 0))
          .cast(DoubleType).as("running"),
        sum(dec).over(w.rowsBetween(-2, 0))
          .cast(DoubleType).as("sliding"))
      .orderBy("o_custkey", "o_orderkey")
  }

  val q15Sql: String =
    """SELECT o_custkey, o_orderkey,
      |ROW_NUMBER() OVER w AS rn,
      |CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running,
      |CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS sliding
      |FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  // --------------------------------------------------------------- Q16
  // Set operations over customer key sets of two order years.
  // Single-pass plan: one scan of `orders` with per-key presence flags
  // (max-of-boolean), then all three set-op counts from the same grouped
  // result — vs rebuilding each key set per op (3 extra scans + 3
  // shuffles). Semantically identical to EXCEPT/INTERSECT/UNION on the
  // two distinct key sets; the oracle keeps the literal set-op SQL.
  def q16SetOps(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val inA = col("o_orderdate") >= tsLit(o, "o_orderdate", "1996-01-01") &&
      col("o_orderdate") < tsLit(o, "o_orderdate", "1997-01-01")
    val inB = col("o_orderdate") >= tsLit(o, "o_orderdate", "1997-01-01") &&
      col("o_orderdate") < tsLit(o, "o_orderdate", "1998-01-01")
    o.filter(inA || inB)
      .select(col("o_custkey").as("k"), inA.as("a"), inB.as("b"))
      .groupBy("k").agg(max(col("a")).as("a"), max(col("b")).as("b"))
      .agg(
        count(when(col("a") && !col("b"), 1)).as("n_except"),
        count(when(col("a") && col("b"), 1)).as("n_intersect"),
        count(lit(1)).as("n_union"))
      .select(explode(array(
        struct(lit("except").as("op"), col("n_except").as("n")),
        struct(lit("intersect").as("op"), col("n_intersect").as("n")),
        struct(lit("union").as("op"), col("n_union").as("n")))).as("r"))
      .select(col("r.op").as("op"), col("r.n").as("n"))
      .orderBy("op")
  }

  val q16Sql: String =
    """WITH a AS (SELECT DISTINCT o_custkey AS k FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'),
      |b AS (SELECT DISTINCT o_custkey AS k FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01')
      |SELECT 'except' AS op, COUNT(*) AS n FROM (SELECT k FROM a EXCEPT SELECT k FROM b)
      |UNION ALL SELECT 'intersect', COUNT(*) FROM (SELECT k FROM a INTERSECT SELECT k FROM b)
      |UNION ALL SELECT 'union', COUNT(*) FROM (SELECT k FROM a UNION SELECT k FROM b)
      |ORDER BY op""".stripMargin

  // --------------------------------------------------------------- Q17
  // TPC-H Q1 (pricing summary report) as end-to-end sentinel.
  def q17TpchQ1(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val disc = col("l_extendedprice") * (lit(1) - col("l_discount"))
    val charge = disc * (lit(1) + col("l_tax"))
    li.filter(col("l_shipdate") <= tsLit(li, "l_shipdate", "2000-09-02"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(disc).as("sum_disc_price"),
        dsum(charge).as("sum_charge"),
        (dsum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
        (dsum(col("l_extendedprice")) / count(lit(1))).as("avg_price"),
        (dsum(col("l_discount")) / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  val q17Sql: String =
    s"""SELECT l_returnflag, l_linestatus,
       |${DSUM("l_quantity")} AS sum_qty,
       |${DSUM("l_extendedprice")} AS sum_base_price,
       |${DSUM("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
       |${DSUM("l_extendedprice * (1 - l_discount) * (1 + l_tax)")} AS sum_charge,
       |${DSUM("l_quantity")} / COUNT(*) AS avg_qty,
       |${DSUM("l_extendedprice")} / COUNT(*) AS avg_price,
       |${DSUM("l_discount")} / COUNT(*) AS avg_disc,
       |COUNT(*) AS count_order
       |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-09-02'
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // --------------------------------------------------------------- Q18
  // TPC-H Q3 (shipping priority, adapted to available columns): top-10
  // unshipped-revenue orders for one market segment.
  def q18TpchQ3(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
    val o = t(s, dir, "orders")
    val li = t(s, dir, "lineitem")
    li.filter(col("l_shipdate") > tsLit(li, "l_shipdate", "1997-06-01"))
      .join(o.filter(col("o_orderdate") < tsLit(o, "o_orderdate", "1997-06-01")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_date"),
        col("o_orderpriority"))
      .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
        .as("revenue"))
      .select(col("l_orderkey"), col("revenue"), col("o_date"),
        col("o_orderpriority"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  val q18Sql: String =
    s"""SELECT l_orderkey, ${DSUM("l_extendedprice * (1 - l_discount)")} AS revenue,
       |strftime(o_orderdate, '%Y-%m-%d') AS o_date, o_orderpriority
       |FROM customer JOIN orders ON c_custkey = o_custkey
       |JOIN lineitem ON l_orderkey = o_orderkey
       |WHERE c_mktsegment = 'BUILDING'
       |AND o_orderdate < TIMESTAMP '1997-06-01'
       |AND l_shipdate > TIMESTAMP '1997-06-01'
       |GROUP BY l_orderkey, o_date, o_orderpriority
       |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin

  // --------------------------------------------------------------- Q45
  // TPC-H Q5 (local supplier volume, adapted): revenue per nation from
  // lineitems where the customer and supplier share a nation, for one
  // region + one order year. Exercises the 6-way join: the big
  // fact⋈fact (lineitem⋈orders) shuffles; all four dimension tables
  // broadcast; filters reach every scan.
  def q45TpchQ5(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val o = t(s, dir, "orders")
    val c = t(s, dir, "customer")
    val su = t(s, dir, "supplier")
    val n = t(s, dir, "nation")
    val r = t(s, dir, "region").filter(col("r_name") === "ASIA")
    li.join(o.filter(
        col("o_orderdate") >= tsLit(o, "o_orderdate", "1996-01-01") &&
        col("o_orderdate") < tsLit(o, "o_orderdate", "1997-01-01")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(su),
        col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
        .as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  val q45Sql: String =
    s"""SELECT n_name, ${DSUM("l_extendedprice * (1 - l_discount)")} AS revenue
       |FROM customer, orders, lineitem, supplier, nation, region
       |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
       |AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
       |AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
       |AND r_name = 'ASIA'
       |AND o_orderdate >= TIMESTAMP '1996-01-01'
       |AND o_orderdate < TIMESTAMP '1997-01-01'
       |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin

  // --------------------------------------------------------------- Q46
  // TPC-H Q14 (promotion effect, adapted): share of revenue from PROMO
  // parts in one ship month. Broadcast dim join + conditional aggregate.
  def q46TpchQ14(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val p = t(s, dir, "part")
    val rev = col("l_extendedprice") * (lit(1) - col("l_discount"))
    li.filter(col("l_shipdate") >= tsLit(li, "l_shipdate", "1996-09-01") &&
        col("l_shipdate") < tsLit(li, "l_shipdate", "1996-10-01"))
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .agg(
        (lit(100.0) *
          dsum(when(col("p_type").startsWith("PROMO"), rev).otherwise(0.0)) /
          dsum(rev)).as("promo_revenue_pct"),
        count(lit(1)).as("n_items"))
  }

  val q46Sql: String =
    s"""SELECT 100.0 * ${DSUM("CASE WHEN p_type LIKE 'PROMO%' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END")} /
       |${DSUM("l_extendedprice * (1 - l_discount)")} AS promo_revenue_pct,
       |COUNT(*) AS n_items
       |FROM lineitem JOIN part ON l_partkey = p_partkey
       |WHERE l_shipdate >= TIMESTAMP '1996-09-01'
       |AND l_shipdate < TIMESTAMP '1996-10-01'""".stripMargin

  // --------------------------------------------------------------- Q53
  // As-of join over the events stream: each purchase matched to the
  // user's most recent signup at-or-before purchase time — the
  // state-at-event-time operator Spark lacks as a built-in
  // (graft.operators.AsofJoin: tag + union + running last() window,
  // ONE shuffle, no range explosion). Oracle = DuckDB's native
  // ASOF JOIN, whose inclusive `l.ts >= r.ts` semantics the operator's
  // tie-break reproduces. ts stays out of the output (nanos in Spark
  // vs µs in DuckDB — only the ORDER matters for the join, and
  // nanos→µs is order-preserving on this corpus).
  def q53AsofJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("l_id"), col("user_id"), col("ts"))
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
    graft.operators.AsofJoin.asof(purchases, signups, "user_id", "ts",
      Seq("event_id", "value"))
      .select(col("l_id"), col("user_id"),
        col("r_event_id").as("r_id"), col("r_value"))
      .orderBy("l_id")
  }

  val q53Sql: String =
    """SELECT l.event_id AS l_id, l.user_id AS user_id,
      |r.event_id AS r_id, r.value AS r_value
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') l
      |ASOF JOIN (SELECT * FROM events WHERE event_type = 'signup') r
      |  ON l.user_id = r.user_id AND l.ts >= r.ts
      |ORDER BY l_id""".stripMargin

  // --------------------------------------------------------------- Q54
  // Range (point-in-interval) join: clicks inside the hour after an
  // error by the same user. The naive inequality join plans as a
  // BroadcastNestedLoopJoin; graft.operators.RangeJoin buckets time at
  // the max interval width so it runs as a hash equi-join on
  // (user_id, bucket) + exact post-filter. Oracle = DuckDB's plain
  // inequality join (its IEJoin handles it natively). ts arithmetic is
  // nanos in Spark vs TIMESTAMP+INTERVAL in DuckDB — equivalent on
  // this µs-precision corpus.
  def q54RangeJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val hourNanos = 3600L * 1000L * 1000L * 1000L
    val points = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("p_id"), col("user_id"), col("ts"))
    val intervals = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("ts").as("start_ts"),
        (col("ts") + hourNanos).as("end_ts"), col("event_id").as("int_id"))
    // intervals are constructed ts + hourNanos, so the max length is
    // known a priori: declare it and skip the eager guard scan
    graft.operators.RangeJoin.pointInInterval(points, intervals,
      "user_id", "ts", "start_ts", "end_ts", Seq("int_id"), hourNanos,
      knownMaxInterval = Some(hourNanos))
      .select(col("p_id"), col("user_id"), col("i_int_id").as("i_id"))
      .orderBy("p_id", "i_id")
  }

  val q54Sql: String =
    """SELECT p.event_id AS p_id, p.user_id AS user_id, i.event_id AS i_id
      |FROM (SELECT * FROM events WHERE event_type = 'click') p
      |JOIN (SELECT * FROM events WHERE event_type = 'error') i
      |  ON p.user_id = i.user_id
      | AND p.ts >= i.ts AND p.ts <= i.ts + INTERVAL 1 HOUR
      |ORDER BY p_id, i_id""".stripMargin

  // -------------------------------------------------------------- Q106
  // Interval-OVERLAP join (interval×interval, vs q54's point-in-
  // interval): error windows [ts, ts+1h] × purchase windows
  // [ts-30m, ts+30m] for the same user — "which purchases happened
  // close enough to an error to be affected". The naive double-
  // inequality join is a BroadcastNestedLoopJoin;
  // graft.operators.OverlapJoin buckets BOTH sides at the max
  // interval length so it runs as a hash equi-join on (user_id,
  // bucket) with ≤2× replication and a canonical-bucket filter in
  // place of a dedup shuffle. Both windows are constructed with a
  // known span, so the guard scans are skipped via knownMaxInterval.
  // Oracle = DuckDB's plain inequality join over the same windows.
  def q106OverlapJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val hourNanos = 3600L * 1000L * 1000L * 1000L
    val halfHourNanos = hourNanos / 2
    val errors = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("l_id"), col("user_id"),
        col("ts").as("l_start"), (col("ts") + hourNanos).as("l_end"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"),
        (col("ts") - halfHourNanos).as("p_start"),
        (col("ts") + halfHourNanos).as("p_end"))
    graft.operators.OverlapJoin.overlap(errors, purchases, "user_id",
      "l_start", "l_end", "p_start", "p_end", Seq("event_id"),
      bucketWidth = hourNanos, knownMaxInterval = Some(hourNanos))
      .select(col("l_id"), col("user_id"), col("r_event_id").as("r_id"))
      .orderBy("l_id", "r_id")
  }

  val q106Sql: String =
    """SELECT e.event_id AS l_id, e.user_id AS user_id, p.event_id AS r_id
      |FROM (SELECT * FROM events WHERE event_type = 'error') e
      |JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      |  ON e.user_id = p.user_id
      | AND e.ts <= p.ts + INTERVAL 30 MINUTE
      | AND p.ts - INTERVAL 30 MINUTE <= e.ts + INTERVAL 1 HOUR
      |ORDER BY l_id, r_id""".stripMargin

  // -------------------------------------------------------------- Q112
  // 2-D skyline (Pareto frontier): customers not dominated on
  // (order count, total spend) — dominated = another customer ≥ on
  // both and > on one. The quadratic NOT EXISTS form never runs on
  // the big side: dominance against the whole set only needs, per
  // distinct x, the max y at that x and the strict-prefix max over
  // larger x. So: one map-side-combined aggregation to per-customer
  // points, one tiny aggregation to |distinct n_orders| rows, a
  // window over THOSE (bounded by construction — order counts, not
  // customers), and a broadcast join back. Spend stays DECIMAL
  // through every comparison (bit-stable across engines/partition-
  // ings); the oracle is DuckDB's literal NOT-EXISTS-free rewrite of
  // the same frontier.
  def q112Skyline(s: SparkSession, dir: String): DataFrame = {
    val pts = t(s, dir, "orders")
      .groupBy(col("o_custkey").as("custkey"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast(DecimalType(25, 6))).as("spend_d"))
    val perX = pts.groupBy(col("n_orders"))
      .agg(max(col("spend_d")).as("max_y"))
      .withColumn("m", max(col("max_y")).over(
        Window.orderBy(col("n_orders").desc)
          .rowsBetween(Window.unboundedPreceding, -1)))
    pts.join(broadcast(perX), "n_orders")
      .filter(col("spend_d") === col("max_y") &&
        (col("m").isNull || col("spend_d") > col("m")))
      .select(col("custkey"), col("n_orders"),
        col("spend_d").cast(DoubleType).as("spend"))
      .orderBy("custkey")
  }

  val q112Sql: String =
    """WITH pts AS (SELECT o_custkey AS custkey, COUNT(*) AS n_orders,
      |  SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS spend_d FROM orders GROUP BY 1),
      |px AS (SELECT n_orders, MAX(spend_d) AS max_y FROM pts GROUP BY 1),
      |pm AS (SELECT n_orders, max_y, MAX(max_y) OVER
      |  (ORDER BY n_orders DESC ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS m
      |  FROM px)
      |SELECT custkey, pts.n_orders, CAST(spend_d AS DOUBLE) AS spend
      |FROM pts JOIN pm ON pts.n_orders = pm.n_orders
      |WHERE spend_d = max_y AND (m IS NULL OR spend_d > m)
      |ORDER BY custkey""".stripMargin

  // -------------------------------------------------------------- Q113
  // Columnar-format interop: the engine's tables round-trip through
  // ORC (Spark's second first-class columnar format — a lake that
  // mixes parquet and ORC inputs is routine) with pushdown intact.
  // The lineitem projection is written to ORC ONCE per fixture dir
  // (memoized like q24's bucketed layout — re-writing per bench rep
  // would measure ingest, not the scan), then the query reads it back
  // with a date filter that must reach the ORC reader as a pushed
  // predicate (PlanAuditSpec asserts it) and aggregates through the
  // DECIMAL route. Oracle = the identical aggregate over the original
  // parquet — so the round-trip is value-exact, not just row-count
  // equal.
  /** Per-fixture-dir temp-layout memo (shared by the format-interop
    * and layout queries q113/q121/q123/q125): write an alternative
    * physical layout of a fixture table ONCE per dir — rewriting per
    * bench rep would measure ingest, not the scan the query
    * demonstrates (the q24 bucketed-layout argument). A dir switch
    * drops the previous layout from disk before building the new one. */
  private final class LayoutMemo(prefix: String,
      write: (SparkSession, String, java.nio.file.Path) => Unit) {
    @transient private var cur: Option[(String, java.nio.file.Path)] = None
    def ensure(s: SparkSession, dir: String): String = synchronized {
      cur match {
        case Some((d, p)) if d == dir => p.toString
        case prev =>
          prev.foreach { case (_, p) =>
            org.apache.commons.io.FileUtils.deleteQuietly(p.toFile)
          }
          val p = java.nio.file.Files.createTempDirectory(prefix)
          write(s, dir, p)
          cur = Some((dir, p))
          p.toString
      }
    }
  }

  private val orcLayout = new LayoutMemo("graft-q113", (s, dir, p) =>
    t(s, dir, "lineitem")
      .select("l_orderkey", "l_shipdate", "l_extendedprice", "l_returnflag")
      .write.mode("overwrite").orc(s"$p/lineitem_orc"))
  private[queries] def ensureOrc(s: SparkSession, dir: String): String =
    orcLayout.ensure(s, dir)

  def q113OrcRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val base = ensureOrc(s, dir)
    val li = s.read.orc(s"$base/lineitem_orc")
    li.filter(col("l_shipdate") >= tsLit(li, "l_shipdate", "1996-01-01"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), dsum(col("l_extendedprice")).as("revenue"))
      .orderBy("l_returnflag")
  }

  val q113Sql: String =
    s"""SELECT l_returnflag, COUNT(*) AS n,
       |${DSUM("l_extendedprice")} AS revenue
       |FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-01-01'
       |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // --------------------------------------------------------------- Q19
  // Skew-salted equi-join, oracle-checked for EXACTNESS: lineitem ⋈
  // orders revenue-by-priority computed through
  // graft.operators.SkewJoin.saltedEquiJoin must equal the plain join.
  // Salting only re-routes rows (the left side's random salt meets a
  // right side replicated across every salt value), so the result set
  // is identical while one hot key spreads over `buckets` reducers —
  // the manual fallback when AQE skew splitting can't apply.
  def q19SkewJoin(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .select(col("l_orderkey").as("orderkey"), col("l_extendedprice"))
    val ord = t(s, dir, "orders")
      .select(col("o_orderkey").as("orderkey"), col("o_orderpriority"))
    graft.operators.SkewJoin.saltedEquiJoin(li, ord, "orderkey", buckets = 8)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), dsum(col("l_extendedprice")).as("revenue"))
      .orderBy("o_orderpriority")
  }

  val q19Sql: String =
    s"""SELECT o_orderpriority, COUNT(*) AS n,
       |${DSUM("l_extendedprice")} AS revenue
       |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // --------------------------------------------------------------- Q24
  // Co-located join via bucketing, oracle-checked: both sides written
  // bucketed by the join key, then joined with broadcast disabled —
  // Spark must plan a SortMergeJoin with NO Exchange on either side
  // (at 100 TB this is the fact⋈fact join without the double shuffle).
  // The plan property itself is part of the oracle row (no_exchange),
  // not just the values: a regression to a shuffling plan fails the
  // correctness gate, not only the bench.
  // Bucketed-layout memo: writing both sides bucketed is the
  // AMORTIZED setup of the pattern (a production warehouse buckets its
  // fact tables once, at ingest) — rewriting them per call measured
  // the ingest, not the exchange-free join the operator demonstrates.
  // Keyed by fixture dir; a dir switch drops and rebuilds.
  @transient private var bucketedFor: Option[(String, java.nio.file.Path)] = None
  private def ensureBucketed(s: SparkSession, dir: String): Unit =
    synchronized {
      bucketedFor match {
        case Some((d, _)) if d == dir => ()
        case prev =>
          prev.foreach { case (_, wh) =>
            s.sql("DROP TABLE IF EXISTS graft_q24_li")
            s.sql("DROP TABLE IF EXISTS graft_q24_o")
            org.apache.commons.io.FileUtils.deleteQuietly(wh.toFile)
          }
          val wh = java.nio.file.Files.createTempDirectory("graft-q24")
          t(s, dir, "lineitem").select("l_orderkey", "l_extendedprice")
            .write.mode("overwrite").option("path", s"$wh/li")
            .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
            .saveAsTable("graft_q24_li")
          t(s, dir, "orders").select("o_orderkey", "o_orderpriority")
            .write.mode("overwrite").option("path", s"$wh/o")
            .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
            .saveAsTable("graft_q24_o")
          bucketedFor = Some((dir, wh))
      }
    }

  def q24BucketedJoin(s: SparkSession, dir: String): DataFrame = {
    ensureBucketed(s, dir)
    graft.core.Sessions.withConfs(s,
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val joined = s.table("graft_q24_li").join(s.table("graft_q24_o"),
        col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      val noExchange =
        if (plan.contains("SortMergeJoin") && !plan.contains("Exchange")) 1L
        else 0L
      val agg = joined.agg(count(lit(1)).as("n"),
        dsum(col("l_extendedprice")).as("revenue")).head()
      import s.implicits._
      Seq((agg.getLong(0), agg.getDouble(1), noExchange))
        .toDF("n", "revenue", "no_exchange")
    }
  }

  val q24Sql: String =
    s"""SELECT COUNT(*) AS n, ${DSUM("l_extendedprice")} AS revenue,
       |CAST(1 AS BIGINT) AS no_exchange
       |FROM lineitem JOIN orders ON l_orderkey = o_orderkey""".stripMargin

  // -------------------------------------------------------- q75 pivot
  /** Pivot: per-user event counts spread into one column per event
    * type (the reshape step of a feature table). Spark's `pivot` with
    * an EXPLICIT value list — the values become output columns, so at
    * scale the list must be bounded and known (with an implicit list
    * Spark runs a distinct scan first and the schema becomes
    * data-dependent; both are wrong for a 100 TB pipeline). One
    * shuffle on the group key; counts fill 0 for absent combos (the
    * conditional-aggregation twin's semantic). */
  val PivotEventTypes: Seq[String] =
    Seq("click", "error", "purchase", "signup", "view")

  def q75Pivot(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(col("user_id"))
      .pivot("event_type", PivotEventTypes)
      .agg(count(lit(1)))
      .na.fill(0L, PivotEventTypes)
      .orderBy("user_id")

  val q75Sql: String = {
    val cols = PivotEventTypes.map(et =>
      s"""COUNT(*) FILTER (WHERE event_type = '$et') AS "$et"""").mkString(",\n")
    s"""SELECT user_id,
       |$cols
       |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin
  }

  // ------------------------------------------------------ q76 unpivot
  /** Unpivot (melt): the wide per-user feature table back to long
    * (user_id, event_type, n_events) rows — Spark's `unpivot` against
    * a UNION ALL twin. Scan-local (no shuffle beyond the upstream
    * pivot's): each wide row explodes to `|value columns|` narrow
    * rows in place. */
  def q76Unpivot(s: SparkSession, dir: String): DataFrame =
    q75Pivot(s, dir)
      .unpivot(Array(col("user_id")),
        PivotEventTypes.map(col).toArray, "event_type", "n_events")
      .orderBy("user_id", "event_type")

  val q76Sql: String = {
    val branches = PivotEventTypes.map(et =>
      s"""SELECT user_id, '$et' AS event_type, "$et" AS n_events FROM wide""")
      .mkString("\n  UNION ALL\n")
    s"""WITH wide AS (${q75Sql.replace("ORDER BY user_id", "")})
       |$branches
       |ORDER BY user_id, event_type""".stripMargin
  }

  // --------------------------------------------------------- q77 cube
  /** CUBE grouping over (lang, source): all four aggregation levels in
    * one pass (per-cell, per-lang, per-source, grand total) with
    * `grouping(...)` flags disambiguating rolled-up NULLs from data
    * NULLs. Spark expands the cube in the partial aggregate —
    * map-side combine still applies, one shuffle. */
  def q77Cube(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .cube(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        (grouping(col("lang")) * 2 + grouping(col("source")))
          .cast(LongType).as("gid"))
      .orderBy("gid", "lang", "source")

  val q77Sql: String =
    """SELECT lang, source, COUNT(*) AS n_docs,
      |CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
      |CAST(GROUPING(lang) * 2 + GROUPING(source) AS BIGINT) AS gid
      |FROM documents GROUP BY CUBE (lang, source)
      |ORDER BY gid, lang, source""".stripMargin

  // -------------------------------------------------------- q78 ntile
  /** Ranking-window battery: quartile (`ntile`) and `percent_rank` of
    * order value within each priority class. The ORDER BY carries the
    * unique key as tie-break, so both rank functions are total-order
    * deterministic in both engines. One shuffle on the partition key.
    * percent_rank = (rank−1)/(n−1) is a pure integer ratio, so the
    * 6-dp presentation rounds via [[dratio]] on the exact rational —
    * round(double) breaks its real ties (n−1 with only 2/5 factors)
    * engine-differently; n>1 guaranteed per priority class, but the
    * n=1 → 0.0 convention is kept explicit anyway. */
  def q78Ntile(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    val pw = Window.partitionBy("o_orderpriority")
    val n = count(lit(1)).over(pw)
    t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"),
        ntile(4).over(w).as("quartile"),
        when(n > 1, dratio(rank().over(w) - 1, n - 1, 6))
          .otherwise(lit(0.0)).as("pr"))
      .orderBy("o_orderkey")
  }

  val q78Sql: String =
    s"""SELECT o_orderkey, o_orderpriority,
       |NTILE(4) OVER w AS quartile,
       |CASE WHEN COUNT(*) OVER p > 1
       |  THEN ${DRATIO("RANK() OVER w - 1", "COUNT(*) OVER p - 1", 6)}
       |  ELSE CAST(0 AS DOUBLE) END AS pr
       |FROM orders
       |WINDOW w AS (PARTITION BY o_orderpriority
       |             ORDER BY o_totalprice, o_orderkey),
       |       p AS (PARTITION BY o_orderpriority)
       |ORDER BY o_orderkey""".stripMargin

  // --------------------------------------------- q86 bloom-join
  /** Bloom-prefiltered join: build a Bloom filter over the (filtered)
    * dimension keys, prefilter the fact scan with it, then run the
    * EXACT join on the survivors. False positives pass the prefilter
    * but are dropped by the verify join, so the result is exactly the
    * plain join's — the filter only cuts what crosses the shuffle.
    * At 100 TB this is the difference between shuffling the corpus
    * and shuffling the ~matching fraction: the sketch is a few
    * hundred KB broadcast regardless of key count (a broadcast HASH
    * side needs the actual keys), and Spark's own runtime bloom
    * pushdown (`spark.sql.optimizer.runtime.bloomFilter.*`) applies
    * the same trick automatically when stats justify it — this
    * operator is the explicit, caller-controlled form. The
    * driver-side `stat.bloomFilter` build is a bounded-size sketch
    * aggregation (like any broadcast build), not a data collect. */
  def q86BloomJoin(s: SparkSession, dir: String): DataFrame = {
    val urgent = t(s, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    val bloom = urgent.stat.bloomFilter("o_orderkey",
      expectedNumItems = 100000L, fpp = 0.01)
    val bc = s.sparkContext.broadcast(bloom)
    val mightContain = udf((k: Long) => bc.value.mightContainLong(k))
    t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_extendedprice"))
      .filter(mightContain(col("l_orderkey")))
      .join(urgent, col("l_orderkey") === col("o_orderkey"))
      .agg(count(lit(1)).as("n"),
        dsum(col("l_extendedprice")).as("revenue"))
  }

  val q86Sql: String =
    s"""SELECT COUNT(*) AS n, ${DSUM("l_extendedprice")} AS revenue
       |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |WHERE o_orderpriority = '1-URGENT'""".stripMargin

  // ----------------------------------------------- q94 data profile
  /** Column-profiling battery — the first pass over any new dataset
    * (null rates, cardinalities, lexicographic ranges feed schema
    * inference, partition-key selection, and quality gates). One
    * aggregate pass PER COLUMN, unioned: each is map-side combined,
    * and Spark executes the union's branches over the same scan
    * (ReusedExchange / scan reuse), so the corpus reads once per
    * branch at worst — at 100 TB the multi-column variant folds into
    * a single agg with one struct per column; the per-column UNION
    * here keeps the long-format output the oracle can pin.
    * Profiled columns are int/string only: double and timestamp
    * rendering differs across engines, so their profile goes through
    * typed mins (q13) instead of string casts. */
  val ProfileCols: Seq[String] =
    Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")

  def q94Profile(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    ProfileCols.map { c =>
      o.agg(
        count(lit(1)).as("n_rows"),
        count(when(col(c).isNull, 1)).as("n_null"),
        countDistinct(col(c)).as("n_distinct"),
        min(col(c).cast("string")).as("min_s"),
        max(col(c).cast("string")).as("max_s"))
        .select(lit(c).as("column"), col("n_rows"), col("n_null"),
          col("n_distinct"), col("min_s"), col("max_s"))
    }.reduce(_.union(_)).orderBy("column")
  }

  val q94Sql: String = {
    val branches = ProfileCols.map { c =>
      s"""SELECT '$c' AS "column", COUNT(*) AS n_rows,
         |  COUNT(*) FILTER (WHERE $c IS NULL) AS n_null,
         |  COUNT(DISTINCT $c) AS n_distinct,
         |  MIN(CAST($c AS VARCHAR)) AS min_s,
         |  MAX(CAST($c AS VARCHAR)) AS max_s FROM orders""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""$branches\nORDER BY "column""""
  }

  // -------------------------------------------------------------- Q117
  // GROUPING SETS — the general form rollup/cube (q14/q77) specialize:
  // an EXPLICIT, non-hierarchical set list ((nation, year), (year), ())
  // that deliberately skips the (nation) level, so neither rollup nor
  // cube can express it. One Expand + one map-side-combined aggregate
  // (identical physical shape to rollup — the set list only changes the
  // projection fan-out); grouping() flags disambiguate rolled-up NULLs.
  def q117GroupingSets(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val c = t(s, dir, "customer")
    val n = t(s, dir, "nation")
    o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .select(col("n_name"),
        year(col("o_orderdate")).cast(StringType).as("o_year"),
        col("o_totalprice"))
      .groupingSets(
        Seq(Seq(col("n_name"), col("o_year")), Seq(col("o_year")), Seq()),
        col("n_name"), col("o_year"))
      .agg(count(lit(1)).as("n_rows"), dsum(col("o_totalprice")).as("revenue"),
        (grouping(col("n_name")) * 2 + grouping(col("o_year")))
          .cast(LongType).as("gid"))
      .select(
        coalesce(col("n_name"), lit("ALL")).as("grp_nation"),
        coalesce(col("o_year"), lit("ALL")).as("grp_year"),
        col("gid"), col("n_rows"), col("revenue"))
      .orderBy("grp_nation", "grp_year", "gid")
  }

  val q117Sql: String =
    s"""SELECT COALESCE(n_name, 'ALL') AS grp_nation,
       |  COALESCE(o_year, 'ALL') AS grp_year,
       |  CAST(GROUPING(n_name) * 2 + GROUPING(o_year) AS BIGINT) AS gid,
       |  COUNT(*) AS n_rows, ${DSUM("o_totalprice")} AS revenue
       |FROM (SELECT n_name, CAST(year(o_orderdate) AS VARCHAR) AS o_year,
       |        o_totalprice
       |      FROM orders JOIN customer ON o_custkey = c_custkey
       |      JOIN nation ON c_nationkey = n_nationkey)
       |GROUP BY GROUPING SETS ((n_name, o_year), (o_year), ())
       |ORDER BY grp_nation, grp_year, gid""".stripMargin

  // -------------------------------------------------------------- Q118
  // Multi-DISTINCT aggregation: several COUNT(DISTINCT ...) over
  // different columns in ONE grouped query. Catalyst lowers this to a
  // single Expand (one replicated row per distinct-column) + two-level
  // aggregate — one pass over the fact table instead of one scan per
  // distinct column, which is the difference that matters at 100 TB.
  def q118MultiDistinct(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        countDistinct(col("l_orderkey")).as("n_orders"),
        count(lit(1)).as("n_rows"),
        dsum(col("l_quantity")).as("sum_qty"))
      .orderBy("l_returnflag")

  val q118Sql: String =
    s"""SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts,
       |COUNT(DISTINCT l_suppkey) AS n_supps,
       |COUNT(DISTINCT l_orderkey) AS n_orders, COUNT(*) AS n_rows,
       |${DSUM("l_quantity")} AS sum_qty
       |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // -------------------------------------------------------------- Q121
  // Row-format interop: orders round-trips through gzip'd JSON-lines —
  // the interchange format of every crawl/export pipeline (and the
  // reference's own output format, README.md:5-6) — then reads back
  // under an EXPLICIT schema (schema inference would burn a full scan
  // before the real one; at 100 TB the contract travels with the data,
  // never derived from it). JSON carries no pushdown or row-group
  // stats, which is exactly the point of the comparison with q113/ORC:
  // same values, no scan-level pruning — the format-choice lesson the
  // layout docs teach. Doubles survive byte-exactly (writers emit the
  // shortest round-trip decimal form). Oracle = the identical
  // aggregate over the original parquet, so the round-trip is
  // value-exact.
  private val jsonlLayout = new LayoutMemo("graft-q121", (s, dir, p) =>
    t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_date"))
      .write.mode("overwrite").option("compression", "gzip")
      .json(s"$p/orders_jsonl"))
  private def ensureJsonl(s: SparkSession, dir: String): String =
    jsonlLayout.ensure(s, dir)

  // ------------------------------------------- q174 csv roundtrip
  /** CSV format interop — the remaining common interchange format
    * beside parquet (native), ORC (q113), and JSONL (q121): customer
    * rows round-trip gzip CSV with a header and a deliberately
    * delimiter-laden note column (`"name, segment"`), so the writer
    * MUST quote and the reader MUST unquote for the aggregate to
    * match the oracle computed from the raw strings. Explicit schema
    * on read (no inference scan — the q121 rule); doubles survive via
    * shortest-round-trip rendering. Like q121 and unlike q113: no
    * pushdown, no stats, no pruning — the format-choice lesson,
    * stated for one more format. */
  private val csvLayout = new LayoutMemo("graft-q174", (s, dir, p) =>
    t(s, dir, "customer")
      .select(col("c_custkey"), col("c_name"),
        concat_ws(", ", col("c_name"), col("c_mktsegment")).as("c_note"),
        col("c_acctbal"), col("c_nationkey"))
      .write.mode("overwrite").option("header", "true")
      .option("compression", "gzip").csv(s"$p/customer_csv"))

  def q174CsvRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val base = csvLayout.ensure(s, dir)
    val schema = StructType(Seq(
      StructField("c_custkey", LongType), StructField("c_name", StringType),
      StructField("c_note", StringType),
      StructField("c_acctbal", DoubleType),
      StructField("c_nationkey", IntegerType)))
    s.read.schema(schema).option("header", "true").csv(s"$base/customer_csv")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n"),
        dsum(col("c_acctbal")).as("balance"),
        max(length(col("c_note"))).as("max_note_len"),
        min(col("c_name")).as("first_name"))
      .orderBy("c_nationkey")
  }

  val q174Sql: String =
    s"""SELECT c_nationkey, COUNT(*) AS n, ${DSUM("c_acctbal")} AS balance,
       |MAX(length(c_name || ', ' || c_mktsegment)) AS max_note_len,
       |MIN(c_name) AS first_name
       |FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin

  def q121JsonlRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val base = ensureJsonl(s, dir)
    val schema = StructType(Seq(
      StructField("o_orderkey", LongType), StructField("o_custkey", LongType),
      StructField("o_orderstatus", StringType),
      StructField("o_totalprice", DoubleType),
      StructField("o_date", StringType)))
    s.read.schema(schema).json(s"$base/orders_jsonl")
      .filter(col("o_date") >= "1996-01-01")
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("revenue"),
        min(col("o_date")).as("d_min"), max(col("o_date")).as("d_max"))
      .orderBy("o_orderstatus")
  }

  val q121Sql: String =
    s"""SELECT o_orderstatus, COUNT(*) AS n,
       |${DSUM("o_totalprice")} AS revenue,
       |MIN(strftime(o_orderdate, '%Y-%m-%d')) AS d_min,
       |MAX(strftime(o_orderdate, '%Y-%m-%d')) AS d_max
       |FROM orders WHERE strftime(o_orderdate, '%Y-%m-%d') >= '1996-01-01'
       |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  // -------------------------------------------------------------- Q123
  // Hive-style partitioned layout + partition PRUNING: documents is
  // written once per fixture dir partitioned by `lang` (the
  // write-time layout decision for any predicate that ships with most
  // queries — at 100 TB, lang='en' then reads ~1/5 of the files
  // WITHOUT opening the rest, vs row-group stats which still list
  // every file). The query filters on the partition column and the
  // oracle row carries `pruned` = whether the scan's PartitionFilters
  // actually captured the predicate (the q24 no_exchange pattern: a
  // regression to a full-scan plan fails CORRECTNESS, not just the
  // bench). PlanAuditSpec additionally pins zero data-filters — the
  // predicate must resolve entirely at planning time.
  private val partitionedLayout = new LayoutMemo("graft-q123", (s, dir, p) =>
    t(s, dir, "documents")
      .write.mode("overwrite").partitionBy("lang")
      .parquet(s"$p/documents_by_lang"))
  private def ensurePartitioned(s: SparkSession, dir: String): String =
    partitionedLayout.ensure(s, dir)

  def q123PartitionPruning(s: SparkSession, dir: String): DataFrame = {
    val base = ensurePartitioned(s, dir)
    val filtered = s.read.parquet(s"$base/documents_by_lang")
      .filter(col("lang") === "en")
    val plan = filtered.queryExecution.executedPlan.toString
    val pruned =
      if ("PartitionFilters: \\[[^\\]]".r.findFirstIn(plan).isDefined) 1L
      else 0L
    filtered.groupBy("source")
      .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("sum_chars"))
      .withColumn("pruned", lit(pruned))
      .orderBy("source")
  }

  val q123Sql: String =
    """SELECT source, COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
      |CAST(1 AS BIGINT) AS pruned
      |FROM documents WHERE lang = 'en'
      |GROUP BY source ORDER BY source""".stripMargin

  // -------------------------------------------------------------- Q125
  // Schema evolution: a table ingested in two batches whose schemas
  // differ (the early batch predates the `source` column — the routine
  // lake situation after a field is added upstream). The read merges
  // the schemas (`mergeSchema`: early rows surface NULL source), which
  // is `unionByName(allowMissingColumns)` done by the reader. Scale
  // note: mergeSchema reconciles footers across files — on a 100 TB
  // table pin the merged schema in a metastore/contract instead and
  // pass it explicitly; the per-file union semantics stay identical.
  // Oracle: doc_id parity encodes which batch a row landed in, so
  // plain SQL over the original table reproduces the merged view.
  private val evolvedLayout = new LayoutMemo("graft-q125", (s, dir, p) => {
    val docs = t(s, dir, "documents")
    docs.filter(col("doc_id") % 2 === 0).drop("source")
      .write.mode("overwrite").parquet(s"$p/docs/batch=a")
    docs.filter(col("doc_id") % 2 === 1)
      .write.mode("overwrite").parquet(s"$p/docs/batch=b")
  })
  private def ensureEvolved(s: SparkSession, dir: String): String =
    evolvedLayout.ensure(s, dir)

  def q125SchemaEvolution(s: SparkSession, dir: String): DataFrame = {
    val base = ensureEvolved(s, dir)
    s.read.option("mergeSchema", "true").parquet(s"$base/docs")
      .groupBy("lang")
      .agg(count(lit(1)).as("n"),
        sum(when(col("source").isNotNull, 1L).otherwise(0L))
          .as("n_with_source"),
        sum(col("n_chars")).as("sum_chars"))
      .orderBy("lang")
  }

  val q125Sql: String =
    """SELECT lang, COUNT(*) AS n,
      |CAST(SUM(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
      |  AS n_with_source,
      |CAST(SUM(n_chars) AS BIGINT) AS sum_chars
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin

  // -------------------------------------------------------------- Q127
  // Date-function battery: every calendar part the reference's date
  // handling touches (Validator.kt's dual-format parse/reformat is
  // q06) plus the parts a warehouse query needs — year/quarter/month/
  // day/day-of-year/day-of-week/ISO week, end-of-month, and calendar
  // month arithmetic (add_months clamps to month end exactly like
  // DuckDB's INTERVAL addition). All scan-local expressions; the only
  // cross-engine trap is day-of-week numbering (Spark 1=Sunday,
  // DuckDB 0=Sunday) — aligned explicitly, not by luck.
  def q127DateParts(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("yr"),
        quarter(col("o_orderdate")).cast("long").as("qtr"),
        month(col("o_orderdate")).cast("long").as("mon"),
        dayofmonth(col("o_orderdate")).cast("long").as("dom"),
        dayofyear(col("o_orderdate")).cast("long").as("doy"),
        dayofweek(col("o_orderdate")).cast("long").as("dow1"),
        weekofyear(col("o_orderdate")).cast("long").as("isoweek"),
        date_format(last_day(col("o_orderdate")), "yyyy-MM-dd").as("eom"),
        date_format(add_months(col("o_orderdate"), 1), "yyyy-MM-dd")
          .as("next_month"))
      .orderBy("o_orderkey")

  val q127Sql: String =
    """SELECT o_orderkey,
      |  CAST(year(o_orderdate) AS BIGINT) AS yr,
      |  CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
      |  CAST(month(o_orderdate) AS BIGINT) AS mon,
      |  CAST(day(o_orderdate) AS BIGINT) AS dom,
      |  CAST(dayofyear(o_orderdate) AS BIGINT) AS doy,
      |  CAST(dayofweek(o_orderdate) + 1 AS BIGINT) AS dow1,
      |  CAST(weekofyear(o_orderdate) AS BIGINT) AS isoweek,
      |  strftime(last_day(o_orderdate), '%Y-%m-%d') AS eom,
      |  strftime(o_orderdate + INTERVAL 1 MONTH, '%Y-%m-%d') AS next_month
      |FROM orders ORDER BY o_orderkey""".stripMargin

  // -------------------------------------------------------------- Q128
  // String-function battery beyond the sanitisation chain (q05):
  // case mapping, padding, reversal, slicing, substring search,
  // literal replace, multi-column concatenation with separator, and
  // token extraction — the everyday scalar-string surface. All
  // scan-local, codegen'd, byte-deterministic (pure ASCII inputs; no
  // locale-sensitive ops).
  def q128StringFuncs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .select(col("p_partkey"),
        upper(col("p_name")).as("up"),
        length(col("p_name")).cast("long").as("len"),
        lpad(col("p_name"), 20, "*").as("padded"),
        reverse(col("p_name")).as("rev"),
        substring(col("p_name"), 1, 3).as("first3"),
        instr(col("p_name"), "a").cast("long").as("pos_a"),
        regexp_replace(col("p_name"), "a", "@").as("repl"),
        concat_ws("-", col("p_brand"), col("p_type")).as("brand_type"),
        element_at(split(col("p_name"), " "), 1).as("tok1"))
      .orderBy("p_partkey")

  val q128Sql: String =
    """SELECT p_partkey,
      |  upper(p_name) AS up,
      |  CAST(length(p_name) AS BIGINT) AS len,
      |  lpad(p_name, 20, '*') AS padded,
      |  reverse(p_name) AS rev,
      |  substring(p_name, 1, 3) AS first3,
      |  CAST(strpos(p_name, 'a') AS BIGINT) AS pos_a,
      |  replace(p_name, 'a', '@') AS repl,
      |  concat_ws('-', p_brand, p_type) AS brand_type,
      |  split_part(p_name, ' ', 1) AS tok1
      |FROM part ORDER BY p_partkey""".stripMargin

  // -------------------------------------------------------------- Q130
  // Aggregate-to-collection battery: ordered set aggregation rendered
  // as a canonical string (string_agg/group_concat — the only
  // engine-portable rendering of a collected list), plus min_by /
  // max_by (argmin/argmax). The min_by ordering key is made UNIQUE
  // (DECIMAL cents ‖ partkey) because ties in the raw price would make
  // argmin nondeterministic in BOTH engines — same discipline as every
  // window tie-break in this file. collect_set order is undefined in
  // any engine, so the sort happens explicitly before rendering.
  def q130CollectAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .withColumn("price_key",
        col("p_retailprice").cast(DecimalType(18, 2)) * 1000000 +
          col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n"),
        array_join(array_sort(collect_set(col("p_type"))), ",")
          .as("types_csv"),
        min_by(col("p_name"), col("price_key")).as("cheapest"),
        max_by(col("p_name"), col("price_key")).as("dearest"),
        countDistinct(col("p_type")).as("n_types"))
      .orderBy("p_brand")

  val q130Sql: String =
    """SELECT p_brand, COUNT(*) AS n,
      |  string_agg(DISTINCT p_type, ',' ORDER BY p_type) AS types_csv,
      |  arg_min(p_name, CAST(p_retailprice AS DECIMAL(18,2)) * 1000000
      |    + p_partkey) AS cheapest,
      |  arg_max(p_name, CAST(p_retailprice AS DECIMAL(18,2)) * 1000000
      |    + p_partkey) AS dearest,
      |  COUNT(DISTINCT p_type) AS n_types
      |FROM part GROUP BY p_brand ORDER BY p_brand""".stripMargin

  // -------------------------------------------------------------- Q131
  // Correlated subquery in WHERE — "each customer's maximum-value
  // order". Catalyst DECORRELATES the per-row subquery into one
  // aggregate + one join (RewriteCorrelatedScalarSubquery); the naive
  // reading would re-scan orders per row, which is the difference
  // between O(n) and O(n²) at 100 TB. MAX is comparison-only (no
  // arithmetic), so the equality predicate is float-exact in both
  // engines. Expressed in SQL because correlated subqueries are a SQL
  // surface — the DataFrame twin is the window rewrite (q07's shape).
  def q131CorrelatedMax(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "orders").createOrReplaceTempView("graft_q131_orders")
    s.sql(
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM graft_q131_orders o
        |WHERE o_totalprice = (SELECT MAX(o2.o_totalprice)
        |                      FROM graft_q131_orders o2
        |                      WHERE o2.o_custkey = o.o_custkey)
        |ORDER BY o_orderkey""".stripMargin)
  }

  val q131Sql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice
      |FROM orders o
      |WHERE o_totalprice = (SELECT MAX(o2.o_totalprice) FROM orders o2
      |                      WHERE o2.o_custkey = o.o_custkey)
      |ORDER BY o_orderkey""".stripMargin

  // -------------------------------------------------------------- Q132
  // Correlated scalar subqueries in the SELECT list — per-customer
  // order count and big-order count pulled from another table inline.
  // Each decorrelates to a left outer aggregate join (COUNT over no
  // rows must surface 0, not NULL — the classic COUNT-bug case
  // Catalyst handles in RewriteCorrelatedScalarSubquery); `has_big`
  // derives from the count, exercising the decorrelated result in a
  // downstream expression. Customers with no orders pin the
  // empty-group path.
  def q132ScalarSubqueries(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "orders").createOrReplaceTempView("graft_q132_orders")
    t(s, dir, "customer").createOrReplaceTempView("graft_q132_customer")
    s.sql(
      """SELECT c_custkey,
        |  (SELECT COUNT(*) FROM graft_q132_orders o
        |   WHERE o.o_custkey = c.c_custkey) AS n_orders,
        |  (SELECT COUNT(*) FROM graft_q132_orders o
        |   WHERE o.o_custkey = c.c_custkey
        |     AND o.o_totalprice > 400000) AS n_big,
        |  (SELECT COUNT(*) FROM graft_q132_orders o
        |   WHERE o.o_custkey = c.c_custkey
        |     AND o.o_totalprice > 400000) > 0 AS has_big
        |FROM graft_q132_customer c
        |ORDER BY c_custkey""".stripMargin)
  }

  val q132Sql: String =
    """SELECT c_custkey,
      |  (SELECT COUNT(*) FROM orders o
      |   WHERE o.o_custkey = c.c_custkey) AS n_orders,
      |  (SELECT COUNT(*) FROM orders o
      |   WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000) AS n_big,
      |  (SELECT COUNT(*) FROM orders o
      |   WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000) > 0
      |    AS has_big
      |FROM customer c ORDER BY c_custkey""".stripMargin

  // -------------------------------------------------------------- Q133
  // LATERAL join — the per-row dependent subquery with its own ORDER
  // BY + LIMIT: "each customer's two highest-value orders". The
  // correlated limit CANNOT be expressed as a plain join; Catalyst
  // decorrelates it into a partitioned window filter (the q07 shape),
  // which is exactly what a user would hand-write — the point is the
  // engine does the rewrite, so the declarative per-row form stays
  // O(n log k), never a per-row re-scan. Ties broken by orderkey so
  // both engines pick identical rows.
  def q133LateralTopk(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "orders").createOrReplaceTempView("graft_q133_orders")
    t(s, dir, "customer").createOrReplaceTempView("graft_q133_customer")
    s.sql(
      """SELECT c.c_custkey, l.o_orderkey, l.o_totalprice
        |FROM graft_q133_customer c,
        |LATERAL (SELECT o_orderkey, o_totalprice
        |         FROM graft_q133_orders o
        |         WHERE o.o_custkey = c.c_custkey
        |         ORDER BY o_totalprice DESC, o_orderkey
        |         LIMIT 2) l
        |ORDER BY c.c_custkey, l.o_totalprice DESC, l.o_orderkey""".stripMargin)
  }

  val q133Sql: String =
    """SELECT c.c_custkey, l.o_orderkey, l.o_totalprice
      |FROM customer c,
      |LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
      |         WHERE o.o_custkey = c.c_custkey
      |         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) l
      |ORDER BY c.c_custkey, l.o_totalprice DESC, l.o_orderkey""".stripMargin

  // -------------------------------------------------------------- Q134
  // NULL-semantics battery on a derived nullable key (`nullif` injects
  // NULLs deterministically — the fixture has none): (a) GROUP BY must
  // collect all NULL keys into ONE group; (b) the join back to the
  // group's label uses NULL-SAFE equality (Spark `<=>` ≡ DuckDB
  // IS NOT DISTINCT FROM) so the NULL group finds its label row — a
  // plain `=` would silently drop it; (c) the output order pins NULL
  // placement EXPLICITLY (asc_nulls_first ≡ NULLS FIRST) because the
  // engines' defaults disagree (Spark: NULLS FIRST asc; DuckDB: NULLS
  // LAST). Null-safe joins happen on the aggregated (bounded) side
  // only — null-safe-joining two fact tables would cross-product the
  // NULL partitions.
  def q134NullSemantics(s: SparkSession, dir: String): DataFrame = {
    val g = t(s, dir, "events")
      .select(expr("nullif(user_id % 10, 4)").as("k"), col("value"))
      .groupBy("k")
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
    val labels = g.select(col("k").as("k2"))
      .withColumn("tag", coalesce(concat(lit("grp_"), col("k2")), lit("grp_NULL")))
    g.join(labels, col("k") <=> col("k2"))
      .select(col("k"), col("tag"), col("n"), col("sum_value"))
      .orderBy(col("k").asc_nulls_first)
  }

  val q134Sql: String =
    """WITH g AS (
      |  SELECT nullif(user_id % 10, 4) AS k, COUNT(*) AS n,
      |    CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS sum_value
      |  FROM events GROUP BY 1),
      |labels AS (SELECT k AS k2,
      |  COALESCE('grp_' || CAST(k AS VARCHAR), 'grp_NULL') AS tag FROM g)
      |SELECT k, tag, n, sum_value FROM g JOIN labels
      |  ON g.k IS NOT DISTINCT FROM labels.k2
      |ORDER BY k NULLS FIRST""".stripMargin

  // -------------------------------------------------------------- Q135
  // Multiset set-ops: INTERSECT ALL / EXCEPT ALL respect
  // MULTIPLICITY (a supplier appearing 5× in A and 3× in B survives
  // EXCEPT ALL twice) — a different operator from q16's distinct set
  // algebra, lowered by Spark to a count-difference aggregate instead
  // of a dedup join. Output aggregated per key so the oracle row is
  // bounded and totally ordered.
  def q135SetopsAll(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val a = li.filter(col("l_returnflag") === "R").select(col("l_suppkey").as("k"))
    val b = li.filter(col("l_linestatus") === "F").select(col("l_suppkey").as("k"))
    val ex = a.exceptAll(b).groupBy("k").agg(count(lit(1)).as("n"))
      .withColumn("op", lit("except_all"))
    val in = a.intersectAll(b).groupBy("k").agg(count(lit(1)).as("n"))
      .withColumn("op", lit("intersect_all"))
    ex.unionByName(in)
      .select(col("op"), col("k"), col("n"))
      .orderBy("op", "k")
  }

  val q135Sql: String =
    """WITH a AS (SELECT l_suppkey AS k FROM lineitem WHERE l_returnflag = 'R'),
      |b AS (SELECT l_suppkey AS k FROM lineitem WHERE l_linestatus = 'F'),
      |ex AS (SELECT 'except_all' AS op, k, COUNT(*) AS n
      |  FROM (SELECT k FROM a EXCEPT ALL SELECT k FROM b) GROUP BY k),
      |ia AS (SELECT 'intersect_all' AS op, k, COUNT(*) AS n
      |  FROM (SELECT k FROM a INTERSECT ALL SELECT k FROM b) GROUP BY k)
      |SELECT op, k, n FROM ex UNION ALL SELECT op, k, n FROM ia
      |ORDER BY op, k""".stripMargin

  // -------------------------------------------------------------- Q144
  // Value-window battery: first_value / last_value / nth_value over an
  // explicit FULL-PARTITION frame (the default RANGE..CURRENT ROW
  // frame silently truncates last_value to the current row — the
  // classic window-frame bug, avoided identically in both dialects by
  // spelling the frame out), plus lag/lead with defaults. The ORDER BY
  // carries the unique key so every value function is total-order
  // deterministic.
  def q144ValueWindows(s: SparkSession, dir: String): DataFrame = {
    val order = Seq(col("o_totalprice"), col("o_orderkey"))
    val full = Window.partitionBy("o_orderpriority")
      .orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val seq = Window.partitionBy("o_orderpriority").orderBy(order: _*)
    t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"),
        first(col("o_orderkey")).over(full).as("first_key"),
        last(col("o_orderkey")).over(full).as("last_key"),
        nth_value(col("o_orderkey"), 3).over(full).as("third_key"),
        lag(col("o_orderkey"), 1, -1L).over(seq).as("prev_key"),
        lead(col("o_orderkey"), 1, -1L).over(seq).as("next_key"))
      .orderBy("o_orderkey")
  }

  val q144Sql: String =
    """SELECT o_orderkey, o_orderpriority,
      |  first_value(o_orderkey) OVER wf AS first_key,
      |  last_value(o_orderkey) OVER wf AS last_key,
      |  nth_value(o_orderkey, 3) OVER wf AS third_key,
      |  lag(o_orderkey, 1, -1) OVER ws AS prev_key,
      |  lead(o_orderkey, 1, -1) OVER ws AS next_key
      |FROM orders
      |WINDOW wf AS (PARTITION BY o_orderpriority
      |    ORDER BY o_totalprice, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING),
      |  ws AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
      |ORDER BY o_orderkey""".stripMargin

  // -------------------------------------------------------------- Q145
  // Bitwise-aggregate battery: BIT_AND / BIT_OR / BIT_XOR over grouped
  // integers plus per-row bit_count — the flag-mask rollup pattern
  // (permission masks, feature flags, bloom-ish membership words).
  // All integer ops: engine-exact by construction, map-side combined.
  def q145BitwiseAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        expr("bit_and(l_linenumber)").as("band"),
        expr("bit_or(l_linenumber)").as("bor"),
        expr("bit_xor(l_linenumber)").as("bxor"),
        sum(expr("bit_count(l_linenumber)")).as("total_bits"))
      .orderBy("l_returnflag")

  val q145Sql: String =
    """SELECT l_returnflag, COUNT(*) AS n,
      |  CAST(bit_and(l_linenumber) AS INTEGER) AS band,
      |  CAST(bit_or(l_linenumber) AS INTEGER) AS bor,
      |  CAST(bit_xor(l_linenumber) AS INTEGER) AS bxor,
      |  CAST(SUM(bit_count(l_linenumber)) AS BIGINT) AS total_bits
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ------------------------------------------------------------ wiring
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q94_profile" -> (q94Profile _),
    "q86_bloom_join" -> (q86BloomJoin _),
    "q75_pivot" -> (q75Pivot _),
    "q76_unpivot" -> (q76Unpivot _),
    "q77_cube" -> (q77Cube _),
    "q78_ntile" -> (q78Ntile _),
    "q01_scan" -> (q01Scan _),
    "q02_proj_filter" -> (q02ProjFilter _),
    "q03_range_prune" -> (q03RangePrune _),
    "q04_mandatory" -> (q04Mandatory _),
    "q05_sanitise" -> (q05Sanitise _),
    "q06_date_normalize" -> (q06DateNormalize _),
    "q07_latest_version" -> (q07LatestVersion _),
    "q08_partition_count" -> (q08PartitionCount _),
    "q09_join_inner" -> (q09JoinInner _),
    "q10_join_left" -> (q10JoinLeft _),
    "q11_join_semi" -> (q11JoinSemi _),
    "q12_join_anti" -> (q12JoinAnti _),
    "q13_agg_stats" -> (q13AggStats _),
    "q14_rollup" -> (q14Rollup _),
    "q15_window" -> (q15Window _),
    "q16_setops" -> (q16SetOps _),
    "q17_tpch_q1" -> (q17TpchQ1 _),
    "q18_tpch_q3" -> (q18TpchQ3 _),
    "q19_skew_join" -> (q19SkewJoin _),
    "q24_bucketed_join" -> (q24BucketedJoin _),
    "q45_tpch_q5" -> (q45TpchQ5 _),
    "q46_tpch_q14" -> (q46TpchQ14 _),
    "q53_asof_join" -> (q53AsofJoin _),
    "q54_range_join" -> (q54RangeJoin _),
    "q106_overlap_join" -> (q106OverlapJoin _),
    "q112_skyline" -> (q112Skyline _),
    "q113_orc_roundtrip" -> (q113OrcRoundtrip _),
    "q117_grouping_sets" -> (q117GroupingSets _),
    "q118_multi_distinct" -> (q118MultiDistinct _),
    "q121_jsonl_roundtrip" -> (q121JsonlRoundtrip _),
    "q174_csv_roundtrip" -> (q174CsvRoundtrip _),
    "q123_partition_pruning" -> (q123PartitionPruning _),
    "q125_schema_evolution" -> (q125SchemaEvolution _),
    "q127_date_parts" -> (q127DateParts _),
    "q128_string_funcs" -> (q128StringFuncs _),
    "q130_collect_agg" -> (q130CollectAgg _),
    "q131_correlated_max" -> (q131CorrelatedMax _),
    "q132_scalar_subqueries" -> (q132ScalarSubqueries _),
    "q133_lateral_topk" -> (q133LateralTopk _),
    "q134_null_semantics" -> (q134NullSemantics _),
    "q135_setops_all" -> (q135SetopsAll _),
    "q144_value_windows" -> (q144ValueWindows _),
    "q145_bitwise_agg" -> (q145BitwiseAgg _))

  val oracles: Map[String, String] = Map(
    "q94_profile" -> q94Sql,
    "q86_bloom_join" -> q86Sql,
    "q75_pivot" -> q75Sql,
    "q76_unpivot" -> q76Sql,
    "q77_cube" -> q77Sql,
    "q78_ntile" -> q78Sql,
    "q01_scan" -> q01Sql,
    "q02_proj_filter" -> q02Sql,
    "q03_range_prune" -> q03Sql,
    "q04_mandatory" -> q04Sql,
    "q05_sanitise" -> q05Sql,
    "q06_date_normalize" -> q06Sql,
    "q07_latest_version" -> q07Sql,
    "q08_partition_count" -> q08Sql,
    "q09_join_inner" -> q09Sql,
    "q10_join_left" -> q10Sql,
    "q11_join_semi" -> q11Sql,
    "q12_join_anti" -> q12Sql,
    "q13_agg_stats" -> q13Sql,
    "q14_rollup" -> q14Sql,
    "q15_window" -> q15Sql,
    "q16_setops" -> q16Sql,
    "q17_tpch_q1" -> q17Sql,
    "q18_tpch_q3" -> q18Sql,
    "q19_skew_join" -> q19Sql,
    "q24_bucketed_join" -> q24Sql,
    "q45_tpch_q5" -> q45Sql,
    "q46_tpch_q14" -> q46Sql,
    "q53_asof_join" -> q53Sql,
    "q54_range_join" -> q54Sql,
    "q106_overlap_join" -> q106Sql,
    "q112_skyline" -> q112Sql,
    "q113_orc_roundtrip" -> q113Sql,
    "q117_grouping_sets" -> q117Sql,
    "q118_multi_distinct" -> q118Sql,
    "q121_jsonl_roundtrip" -> q121Sql,
    "q174_csv_roundtrip" -> q174Sql,
    "q123_partition_pruning" -> q123Sql,
    "q125_schema_evolution" -> q125Sql,
    "q127_date_parts" -> q127Sql,
    "q128_string_funcs" -> q128Sql,
    "q130_collect_agg" -> q130Sql,
    "q131_correlated_max" -> q131Sql,
    "q132_scalar_subqueries" -> q132Sql,
    "q133_lateral_topk" -> q133Sql,
    "q134_null_semantics" -> q134Sql,
    "q135_setops_all" -> q135Sql,
    "q144_value_windows" -> q144Sql,
    "q145_bitwise_agg" -> q145Sql)
}
