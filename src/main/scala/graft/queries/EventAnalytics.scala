package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.core.Tables
import graft.queries.Relational.{dsum, DSUM, dmean, DMEAN}

/** Event-stream analytics over `events`: sessionization, exact
  * grouped quantiles, z-score outlier gating, exact per-group heavy
  * hitters, and semi-structured JSON extraction. These are the
  * behavioral-telemetry operators a training-data pipeline runs
  * upstream of corpus selection (e.g. sessionizing interaction logs
  * into dialogue episodes, gating anomalous metric rows, extracting
  * typed fields from raw JSON payloads).
  *
  * Scale notes (100 TB):
  *  - Every operator here shuffles at most ONCE, on its natural key
  *    (`user_id` for sessions, `event_type` for the grouped stats);
  *    window functions then run inside the shuffled partitions.
  *  - The z-score gate joins per-GROUP stats (|event_type| rows)
  *    back to the fact side via broadcast — the 100 TB side never
  *    reshuffles.
  *  - Heavy hitters is partial-agg-friendly (map-side combine on
  *    (type, user)) and the per-group top-k is a window over the
  *    already-grouped counts, NOT a global sort. For cardinality
  *    beyond memory per group, swap in a sketch (Misra-Gries /
  *    count-min) — exact form here is the oracle-checkable variant.
  *
  * `events.ts` is epoch-nanos LongType on the Spark side and µs
  * TIMESTAMP in DuckDB — see [[graft.core.Tables]]; all event-time
  * math below goes through `ts div 1000` ≡ `epoch_us(ts)`.
  */
object EventAnalytics {

  private def events(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")

  // ----------------------------------------------------- q67 sessions
  /** Sessionization: per user, a new session starts when the gap to
    * the previous event exceeds 3 hours. The classic telemetry
    * operator (and the dialogue-episode splitter in conversation-log
    * curation). One shuffle on `user_id`; the lag + running-sum
    * windows and the per-session aggregation all share that
    * partitioning (Catalyst plans a single Exchange; the final
    * groupBy on (user_id, session_idx) is a sub-key of the window
    * partitioning so AQE keeps it co-located). */
  val SessionGapUs: Long = 3L * 3600 * 1000000

  def q67Sessionize(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    events(s, dir)
      .select(col("event_id"), expr("ts div 1000").as("ts_us"), col("user_id"))
      .withColumn("brk",
        when(lag(col("ts_us"), 1).over(w).isNull ||
          col("ts_us") - lag(col("ts_us"), 1).over(w) > SessionGapUs, 1L)
          .otherwise(0L))
      .withColumn("session_idx",
        sum(col("brk")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        expr("min(ts_us) div 1000000").as("start_sec"),
        expr("max(ts_us) div 1000000").as("end_sec"))
      .orderBy("user_id", "session_idx")
  }

  val q67Sql: String =
    s"""WITH e AS (SELECT event_id, epoch_us(ts) AS ts_us, user_id FROM events),
       |g AS (SELECT user_id, ts_us, event_id,
       |  CASE WHEN lag(ts_us) OVER w IS NULL
       |       OR ts_us - lag(ts_us) OVER w > $SessionGapUs THEN 1 ELSE 0 END AS brk
       |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
       |sx AS (SELECT user_id, ts_us,
       |  CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
       |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx FROM g)
       |SELECT user_id, session_idx, COUNT(*) AS n_events,
       |  MIN(ts_us) // 1000000 AS start_sec, MAX(ts_us) // 1000000 AS end_sec
       |FROM sx GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ---------------------------------------------------- q69 quantiles
  /** Exact grouped percentiles (linear interpolation — Spark
    * `percentile` ≡ DuckDB `quantile_cont`). One shuffle on the group
    * key; within a group the values sort locally. At 100 TB per-group
    * value sets that exceed executor memory move to
    * `percentile_approx` (t-digest) — the exact form is the
    * oracle-checkable variant and the accuracy baseline. */
  def q69Quantiles(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(expr("percentile(value, 0.5)"), 4).as("p50"),
        round(expr("percentile(value, 0.9)"), 4).as("p90"),
        round(expr("percentile(value, 0.99)"), 4).as("p99"))
      .orderBy("event_type")

  val q69Sql: String =
    """SELECT event_type, COUNT(*) AS n,
      |round(quantile_cont(value, 0.5), 4) AS p50,
      |round(quantile_cont(value, 0.9), 4) AS p90,
      |round(quantile_cont(value, 0.99), 4) AS p99
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // ----------------------------------------------------- q71 outliers
  /** Z-score outlier gate: flag events whose value sits more than 3
    * sample standard deviations from its event-type mean — the
    * numeric-quality filter of a metrics-ingest pipeline. Mean and
    * variance derive from order-independent decimal sums
    * ([[Relational.dsum]]: Σv and Σv² at DECIMAL(25,6)), so the
    * per-group stats are bit-identical across partitionings AND
    * engines — a plain double `stddev` would be partition-order
    * dependent and could flip rows sitting exactly at the threshold.
    * The stats side is |event_type| rows → broadcast back onto the
    * fact scan; the big side never shuffles. */
  val OutlierZ: Double = 3.0

  def q71OutlierZscore(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir).select(col("event_id"), col("event_type"), col("value"))
    val st = e.groupBy(col("event_type")).agg(
      dsum(col("value")).as("sv"),
      dsum(col("value") * col("value")).as("svv"),
      count(lit(1)).as("n"))
    val z: Column = (col("value") - col("sv") / col("n")) /
      sqrt((col("svv") - col("sv") * col("sv") / col("n")) / (col("n") - 1))
    e.join(broadcast(st), "event_type")
      .withColumn("z", z)
      .filter(abs(col("z")) > OutlierZ)
      .select(col("event_id"), col("event_type"), round(col("z"), 4).as("z"))
      .orderBy("event_id")
  }

  val q71Sql: String =
    s"""WITH st AS (SELECT event_type,
       |  CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS sv,
       |  CAST(SUM(CAST(value*value AS DECIMAL(25,6))) AS DOUBLE) AS svv,
       |  COUNT(*) AS n FROM events GROUP BY event_type)
       |SELECT event_id, event_type,
       |  round((value - sv/n) / sqrt((svv - sv*sv/n)/(n-1)), 4) AS z
       |FROM events JOIN st USING (event_type)
       |WHERE abs((value - sv/n) / sqrt((svv - sv*sv/n)/(n-1))) > $OutlierZ
       |ORDER BY event_id""".stripMargin

  // ------------------------------------------------ q72 heavy hitters
  /** Exact per-group top-k: the 5 most active users per event type,
    * ties broken by user_id. Map-side combine collapses the fact scan
    * to |type × user| counts before the one shuffle; the top-k is a
    * window over the grouped counts (partition-local sort), never a
    * global sort. */
  val HeavyHittersK: Int = 5

  def q72HeavyHitters(s: SparkSession, dir: String): DataFrame = {
    val cnt = events(s, dir)
      .groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
    val w = Window.partitionBy("event_type")
      .orderBy(col("n_events").desc, col("user_id").asc)
    cnt.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= HeavyHittersK)
      .orderBy("event_type", "rnk")
  }

  val q72Sql: String =
    s"""SELECT event_type, user_id, n_events, rnk FROM (
       |  SELECT event_type, user_id, COUNT(*) AS n_events,
       |    ROW_NUMBER() OVER (PARTITION BY event_type
       |      ORDER BY COUNT(*) DESC, user_id) AS rnk
       |  FROM events GROUP BY event_type, user_id)
       |WHERE rnk <= $HeavyHittersK ORDER BY event_type, rnk""".stripMargin

  // ------------------------------------------------- q73 json extract
  /** Semi-structured extraction: pull the typed `$$.k` field out of
    * the raw JSON `props` payload and aggregate it per event type.
    * `get_json_object` is a scan-local expression (no UDF, no
    * shuffle); the aggregate is one map-side-combined shuffle on
    * `event_type`. Long sums are exact, so no decimal detour is
    * needed. At scale, repeated extraction of many fields moves to a
    * single `from_json` with an explicit schema (one parse per row
    * instead of one per field). */
  def q73JsonExtract(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"),
        countDistinct(col("k")).as("n_distinct_k"))
      .orderBy("event_type")

  val q73Sql: String =
    """SELECT event_type, COUNT(*) AS n,
      |CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
      |MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
      |COUNT(DISTINCT CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_distinct_k
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // --------------------------------------------------- q124 variant
  /** The same extraction as q73, but through Spark 4's VARIANT type:
    * `parse_json` shreds the payload once into the binary variant
    * encoding, then `variant_get` does typed path access — the
    * open-schema column type for semi-structured lakes (one parse
    * feeds ANY number of later path reads, vs `get_json_object`
    * re-parsing per field; and variant columns can be stored shredded
    * in parquet, giving back columnar pruning on dynamic schemas).
    * A null-vs-missing probe (`$.missing`) pins the type's tri-state
    * semantics. The DuckDB twin reads the same paths with its JSON
    * functions — values must agree exactly since everything is
    * integer-typed. */
  def q124Variant(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .select(col("event_type"),
        parse_json(col("props")).as("v"))
      .select(col("event_type"),
        expr("variant_get(v, '$.k', 'long')").as("k"),
        expr("variant_get(v, '$.missing', 'long')").as("miss"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("k")).as("sum_k"),
        sum(when(col("k") > 50, 1L).otherwise(0L)).as("n_gt50"),
        sum(when(col("miss").isNull, 1L).otherwise(0L)).as("n_missing"))
      .orderBy("event_type")

  val q124Sql: String =
    """SELECT event_type, COUNT(*) AS n,
      |CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |CAST(SUM(CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
      |  THEN 1 ELSE 0 END) AS BIGINT) AS n_gt50,
      |CAST(SUM(CASE WHEN json_extract_string(props, '$.missing') IS NULL
      |  THEN 1 ELSE 0 END) AS BIGINT) AS n_missing
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // ----------------------------------------- q138 sliding window agg
  /** SLIDING event-time windows in batch: 1-hour windows every 30
    * minutes, so each event lands in exactly TWO windows — Spark's
    * `window(col, len, slide)` lowers to an Expand (per-row fan-out to
    * its windows) + one map-side-combined aggregate, the same frame
    * the streaming engine uses. This is the overlap the tumbling q57
    * window cannot express (a spike straddling an hour boundary is
    * visible in the offset window). The DuckDB twin materializes both
    * candidate window starts per event with integer µs arithmetic —
    * epoch-aligned exactly like Spark's window start computation. */
  def q138SlidingWindow(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .select(expr("timestamp_micros(ts div 1000)").as("et"),
        col("user_id"), col("value"))
      .groupBy(window(col("et"), "1 hour", "30 minutes"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("n_users"),
        graft.queries.Relational.dsum(col("value")).as("sum_value"))
      .select(unix_timestamp(col("window.start")).as("w_start_sec"),
        col("n"), col("n_users"), col("sum_value"))
      .orderBy("w_start_sec")

  val q138Sql: String =
    """WITH e AS (SELECT epoch_us(ts) AS tus, user_id, value FROM events),
      |w AS (SELECT tus, user_id, value,
      |  unnest([(tus // 1800000000) * 1800000000,
      |          (tus // 1800000000) * 1800000000 - 1800000000]) AS ws
      |  FROM e)
      |SELECT ws // 1000000 AS w_start_sec, COUNT(*) AS n,
      |  COUNT(DISTINCT user_id) AS n_users,
      |  CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS sum_value
      |FROM w WHERE tus >= ws AND tus < ws + 3600000000
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // ------------------------------------------- q139 min-max normalize
  /** Per-group min-max feature normalization: x' = (x − min)/(max −
    * min) per event_type — the scaling step before any numeric
    * feature enters training. Unlike z-scoring, it needs NO sqrt (not
    * exactly specified by IEEE; libm results differ across platforms),
    * so the normalized values are bit-identical across engines —
    * min/max are comparisons and the rescale is one subtract + one
    * divide. Stats are |group| rows broadcast back onto the fact scan
    * (the q71 shape); degenerate groups (max = min) emit 0.5 by
    * convention in both dialects. */
  def q139MinmaxNorm(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir)
      .select(col("event_id"), col("event_type"), col("value"))
    val st = e.groupBy("event_type")
      .agg(min(col("value")).as("vmin"), max(col("value")).as("vmax"))
    e.join(broadcast(st), "event_type")
      .select(col("event_id"), col("event_type"),
        when(col("vmax") === col("vmin"), lit(0.5))
          .otherwise((col("value") - col("vmin")) /
            (col("vmax") - col("vmin"))).as("value_norm"))
      .orderBy("event_id")
  }

  val q139Sql: String =
    """WITH st AS (SELECT event_type, MIN(value) AS vmin, MAX(value) AS vmax
      |  FROM events GROUP BY 1)
      |SELECT event_id, e.event_type,
      |  CASE WHEN vmax = vmin THEN 0.5
      |       ELSE (value - vmin) / (vmax - vmin) END AS value_norm
      |FROM events e JOIN st ON e.event_type = st.event_type
      |ORDER BY event_id""".stripMargin

  // -------------------------------------------- q140 equi-depth bins
  /** Equi-depth (equal-frequency) binning — the complement of q90's
    * equal-width histogram and the feature-bucketing primitive:
    * boundaries are the exact deciles, rows are assigned by range
    * comparison against the BROADCAST boundary list (a lambda fold
    * over 9 values), never by a global-sort ntile — the global window
    * is the single-partition trap at 100 TB, while the two-pass
    * (quantiles, then scan-local assignment) shape scales. Boundaries
    * are rounded to 6 dp IN BOTH dialects before comparison (the q69
    * precedent: interpolated quantiles agree between engines only
    * after rounding — an unrounded boundary could differ by 1 ulp and
    * flip a knife-edge row's bin). */
  def q140EquidepthBins(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir).select(col("event_id"), col("value"))
    val ps = (1 to 9).map(_ / 10.0).mkString(", ")
    val bounds = e.agg(
      expr(s"transform(percentile(value, array($ps)), b -> round(b, 6))")
        .as("bs"))
    e.crossJoin(broadcast(bounds))
      .withColumn("bin",
        expr("1 + aggregate(bs, 0, (a, b) -> a + (CASE WHEN value > b " +
          "THEN 1 ELSE 0 END))"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"),
        min(col("value")).as("vmin"), max(col("value")).as("vmax"))
      .orderBy("bin")
  }

  val q140Sql: String = {
    val ps = (1 to 9).map(_ / 10.0).mkString(", ")
    s"""WITH bounds AS (
       |  SELECT list_transform(quantile_cont(value, [$ps]),
       |    b -> round(b, 6)) AS bs FROM events),
       |binned AS (
       |  SELECT event_id, value,
       |    1 + list_sum(list_transform(bs,
       |      b -> CASE WHEN value > b THEN 1 ELSE 0 END)) AS bin
       |  FROM events, bounds)
       |SELECT CAST(bin AS INTEGER) AS bin, COUNT(*) AS n,
       |  MIN(value) AS vmin, MAX(value) AS vmax
       |FROM binned GROUP BY 1 ORDER BY 1""".stripMargin
  }

  // ----------------------------------------- q142 retention cohorts
  /** Weekly retention cohort matrix: users grouped by their FIRST
    * active week (the cohort), counted in every later week they
    * reappear, keyed by week offset — the standard product-analytics
    * triangle, and the user-activity analogue of incremental-corpus
    * freshness tracking. Weeks are integer epoch-µs divisions (no
    * calendar functions → no timezone/week-numbering divergence
    * between engines). Two shuffles: the per-user first-week
    * aggregate (user-keyed), then the (cohort, offset) matrix over
    * the distinct user-week relation; the first-week table is
    * user-count-sized and joins back user-keyed — at 100 TB both
    * stages hash-partition on user_id, so AQE plans one exchange. */
  private val WeekUs: Long = 7L * 86400 * 1000000

  def q142Retention(s: SparkSession, dir: String): DataFrame = {
    val uw = events(s, dir)
      .select(col("user_id"), expr(s"(ts div 1000) div $WeekUs").as("wk"))
      .distinct()
    val cohorts = uw.groupBy("user_id").agg(min(col("wk")).as("cohort_wk"))
    uw.join(cohorts, "user_id")
      .groupBy(col("cohort_wk"), (col("wk") - col("cohort_wk")).as("offset_wk"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy("cohort_wk", "offset_wk")
  }

  val q142Sql: String =
    s"""WITH uw AS (SELECT DISTINCT user_id, epoch_us(ts) // $WeekUs AS wk
       |  FROM events),
       |c AS (SELECT user_id, MIN(wk) AS cohort_wk FROM uw GROUP BY 1)
       |SELECT cohort_wk, wk - cohort_wk AS offset_wk,
       |  COUNT(DISTINCT uw.user_id) AS n_users
       |FROM uw JOIN c ON uw.user_id = c.user_id
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // --------------------------------------------- q143 temporal drift
  /** Temporal label-distribution drift: split the event stream at the
    * midpoint of its time range and compare each event_type's share
    * of the early half vs the late half — the drift audit run before
    * trusting a model trained on the early period (the corpus-side
    * analogue of q105's declared-vs-actual mix check). The split
    * boundary is integer µs arithmetic from a broadcast one-row
    * (min, max) aggregate — never a driver constant; shares and the
    * drift are single correctly-rounded IEEE divides/subtracts of
    * exact counts. */
  def q143DriftAudit(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir)
      .select(col("event_type"), expr("ts div 1000").as("tus"))
    val span = e.agg(min(col("tus")).as("t0"), max(col("tus")).as("t1"))
    val halves = e.crossJoin(broadcast(span))
      .withColumn("late", (col("tus") * 2 >= col("t0") + col("t1")).cast("int"))
    val counts = halves.groupBy("event_type")
      .agg(sum(lit(1) - col("late")).cast("long").as("n_early"),
        sum(col("late")).cast("long").as("n_late"))
    val tot = counts.agg(sum(col("n_early")).as("te"), sum(col("n_late")).as("tl"))
    counts.crossJoin(broadcast(tot))
      .select(col("event_type"), col("n_early"), col("n_late"),
        (col("n_early").cast("double") / col("te").cast("double"))
          .as("share_early"),
        (col("n_late").cast("double") / col("tl").cast("double"))
          .as("share_late"),
        abs(col("n_early").cast("double") / col("te").cast("double") -
          col("n_late").cast("double") / col("tl").cast("double"))
          .as("drift"))
      .orderBy("event_type")
  }

  val q143Sql: String =
    """WITH e AS (SELECT event_type, epoch_us(ts) AS tus FROM events),
      |span AS (SELECT MIN(tus) AS t0, MAX(tus) AS t1 FROM e),
      |h AS (SELECT event_type,
      |  CASE WHEN tus * 2 >= t0 + t1 THEN 1 ELSE 0 END AS late FROM e, span),
      |c AS (SELECT event_type,
      |  CAST(SUM(1 - late) AS BIGINT) AS n_early,
      |  CAST(SUM(late) AS BIGINT) AS n_late FROM h GROUP BY 1),
      |t AS (SELECT SUM(n_early) AS te, SUM(n_late) AS tl FROM c)
      |SELECT event_type, n_early, n_late,
      |  CAST(n_early AS DOUBLE) / CAST(te AS DOUBLE) AS share_early,
      |  CAST(n_late AS DOUBLE) / CAST(tl AS DOUBLE) AS share_late,
      |  abs(CAST(n_early AS DOUBLE) / CAST(te AS DOUBLE) -
      |      CAST(n_late AS DOUBLE) / CAST(tl AS DOUBLE)) AS drift
      |FROM c, t ORDER BY event_type""".stripMargin

  // ------------------------------------------- q146 co-occurrence
  /** Pairwise event-type co-occurrence (the association-rules /
    * market-basket support count): for every unordered pair of event
    * types, how many users performed BOTH. The per-user distinct
    * type set is tiny (≤ |types|), so pair generation is a scan-local
    * fan-out of at most C(|types|,2) rows per user after ONE user_id
    * shuffle — the classic a-priori support pass, never a fact×fact
    * self-join (which would square the event table; the per-user
    * aggregate-then-expand shape is what scales). Support counts are
    * exact; the pair key is ordered (t1 < t2) in both dialects. */
  def q146Cooccurrence(s: SparkSession, dir: String): DataFrame = {
    val perUser = events(s, dir)
      .select(col("user_id"), col("event_type")).distinct()
    perUser.as("a")
      .join(perUser.as("b"), col("a.user_id") === col("b.user_id") &&
        col("a.event_type") < col("b.event_type"))
      .groupBy(col("a.event_type").as("t1"), col("b.event_type").as("t2"))
      .agg(countDistinct(col("a.user_id")).as("support"))
      .orderBy("t1", "t2")
  }

  val q146Sql: String =
    """WITH pu AS (SELECT DISTINCT user_id, event_type FROM events)
      |SELECT a.event_type AS t1, b.event_type AS t2,
      |  COUNT(DISTINCT a.user_id) AS support
      |FROM pu a JOIN pu b
      |  ON a.user_id = b.user_id AND a.event_type < b.event_type
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ----------------------------------------------- q84 pruned top-k
  /** The 5 highest-value events per type via
    * [[graft.operators.TopKPerGroup]] — the map-side-pruned exact
    * top-k. Same result as the q72-style window form, but the shuffle
    * carries ≤ k·partitions·groups rows instead of the corpus (the
    * per-group analogue of TakeOrderedAndProject; see the operator's
    * scaladoc). The oracle is the plain window SQL — the pruned plan
    * must equal it row for row. */
  def q84TopkPruned(s: SparkSession, dir: String): DataFrame =
    graft.operators.TopKPerGroup(
      events(s, dir).select(col("event_id"), col("event_type"), col("value")),
      Seq("event_type"), "value", "event_id", k = 5)
      .select(col("event_type"), col("rnk"), col("event_id"), col("value"))
      .orderBy("event_type", "rnk")

  val q84Sql: String =
    """SELECT event_type, rnk, event_id, value FROM (
      |  SELECT event_type, event_id, value,
      |    ROW_NUMBER() OVER (PARTITION BY event_type
      |      ORDER BY value DESC, event_id) AS rnk
      |  FROM events)
      |WHERE rnk <= 5 ORDER BY event_type, rnk""".stripMargin

  // -------------------------------------------- q85 approx distinct
  /** HyperLogLog++ distinct-user counts per event type beside the
    * exact counts — THE cardinality operator at 100 TB (exact
    * distinct shuffles every key; the sketch is constant-size per
    * group and merges associatively, so it map-side combines). The
    * sketch is deterministic for a given dataset (hash-based, no
    * RNG), but its estimate has no SQL-expressible twin — so the
    * ORACLE-CHECKED projection carries the exact columns plus
    * `approx_ok`, the HLL accuracy contract evaluated IN the engine
    * (relative error < 5% at the 1% rsd setting) against an oracle
    * literal 1: if the sketch ever breaks its bound, the row hash
    * fails — a full driver-side signal instead of the old rows-only
    * channel. [[q85ApproxDistinctFull]] keeps the raw estimate for
    * the spec's tighter error-pin. */
  def q85ApproxDistinctFull(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        approx_count_distinct(col("user_id"), rsd = 0.01).as("approx_users"),
        countDistinct(col("user_id")).as("exact_users"))
      .orderBy("event_type")

  def q85ApproxDistinct(s: SparkSession, dir: String): DataFrame =
    q85ApproxDistinctFull(s, dir)
      .select(col("event_type"), col("n"), col("exact_users"),
        (abs(col("approx_users") - col("exact_users")).cast("double") <
          col("exact_users").cast("double") * 0.05).cast("int").as("approx_ok"))
      .orderBy("event_type")

  val q85Sql: String =
    """SELECT event_type, COUNT(*) AS n,
      |COUNT(DISTINCT user_id) AS exact_users, 1 AS approx_ok
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // ------------------------------------------------ q87 gap fill
  /** Time-series densify + forward-fill: hourly per-type activity on a
    * complete (hour × type) spine — absent cells get count 0 and carry
    * the last seen hourly average forward (the standard prep before
    * feeding metrics to anomaly detection or training curves; gaps
    * would otherwise read as missing rows, not as zeros).
    *
    * Plan: the corpus aggregates FIRST (one map-side-combined shuffle
    * to |hours × types| rows); the spine is the cross of two tiny
    * distincts (broadcast nested-loop over a handful of rows — never
    * the corpus), the left join back is hash, and the forward-fill
    * window runs over spine-sized data. Leading cells before a type's
    * first event keep NULL fill — both engines agree. */
  def q87GapFill(s: SparkSession, dir: String): DataFrame = {
    val agg = events(s, dir)
      .select(expr("((ts div 1000) div 3600000000) * 3600").as("h_sec"),
        col("event_type"), col("value"))
      .groupBy(col("h_sec"), col("event_type"))
      .agg(count(lit(1)).as("n_raw"),
        dmean(col("value"), 6).as("avg_v"))
    val hrs = agg.select(col("h_sec")).distinct()
    val typ = agg.select(col("event_type")).distinct()
    val spine = hrs.crossJoin(broadcast(typ))
    val w = Window.partitionBy("event_type").orderBy("h_sec")
      .rowsBetween(Window.unboundedPreceding, 0)
    spine.join(agg, Seq("h_sec", "event_type"), "left")
      .select(col("h_sec"), col("event_type"),
        coalesce(col("n_raw"), lit(0L)).as("n"),
        last(col("avg_v"), ignoreNulls = true).over(w).as("v_ff"))
      .orderBy("event_type", "h_sec")
  }

  val q87Sql: String =
    s"""WITH agg AS (SELECT epoch_us(date_trunc('hour', ts)) // 1000000 AS h_sec,
      |  event_type, COUNT(*) AS n_raw,
      |  ${DMEAN("value", 6)} AS avg_v
      |  FROM events GROUP BY 1, 2),
      |hrs AS (SELECT DISTINCT h_sec FROM agg),
      |typ AS (SELECT DISTINCT event_type FROM agg),
      |spine AS (SELECT h_sec, event_type FROM hrs CROSS JOIN typ)
      |SELECT s.h_sec, s.event_type, COALESCE(a.n_raw, 0) AS n,
      |  last_value(a.avg_v IGNORE NULLS) OVER (PARTITION BY s.event_type
      |    ORDER BY s.h_sec ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_ff
      |FROM spine s LEFT JOIN agg a
      |  ON s.h_sec = a.h_sec AND s.event_type = a.event_type
      |ORDER BY s.event_type, s.h_sec""".stripMargin

  // ------------------------------------------------- q90 histogram
  /** Fixed-width value histogram with the cumulative distribution —
    * the one-pass shape summary behind threshold picking and drift
    * monitoring. The corpus collapses to |bins| rows in one map-side-
    * combined shuffle; the running-total window then runs over the
    * BINS (bounded by value-range/width, here ~20 rows), so the
    * unpartitioned window is deliberate, not a scale bug. Bin edges
    * are exact (floor of value/width on doubles — same IEEE op in
    * both engines); cum_frac is a count ratio (cum_n/total) that CAN
    * tie exactly at 6 dp, so it rounds via [[Relational.dratio]]. */
  val HistWidth: Double = 25.0

  def q90Histogram(s: SparkSession, dir: String): DataFrame = {
    val bins = events(s, dir)
      .select(floor(col("value") / HistWidth).cast("long").as("bin"))
      .groupBy(col("bin")).agg(count(lit(1)).as("n"))
    val w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    bins
      .withColumn("cum_n", sum(col("n")).over(w))
      .withColumn("cum_frac", graft.queries.Relational.dratio(
        col("cum_n"), sum(col("n")).over(Window.partitionBy()), 6))
      .orderBy("bin")
  }

  val q90Sql: String =
    s"""WITH b AS (SELECT CAST(floor(value / $HistWidth) AS BIGINT) AS bin,
       |  COUNT(*) AS n FROM events GROUP BY 1)
       |SELECT bin, n,
       |CAST(SUM(n) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_n,
       |${graft.queries.Relational.DRATIO(
           "SUM(n) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING)",
           "SUM(n) OVER ()", 6)} AS cum_frac
       |FROM b ORDER BY bin""".stripMargin

  // ------------------------------------------- q108 trailing window
  /** Trailing time-RANGE window: for every event, the count and exact
    * sum of `value` over the same user's preceding hour (including
    * the row) — the rolling-feature primitive (rate limiting, burst
    * detection, per-entity trailing stats). A rows-frame can't
    * express "the last hour" (event spacing is irregular); Spark's
    * `rangeBetween` over epoch-micros is the native form, and the
    * frame attaches to the one user_id shuffle — no self-join, no
    * interval explosion (the self-join rewrite of this query is q54's
    * BNLJ trap). The framed sum routes through DECIMAL(25,6): range
    * frames are evaluated by retracting/segment-tree strategies that
    * differ between engines, so only an order-independent-exact sum
    * is comparable. Ties at the same microsecond are fine: a RANGE
    * frame includes ALL peers of the current timestamp in both
    * engines. */
  def q108TrailingWindow(s: SparkSession, dir: String): DataFrame = {
    val hourUs = 3600L * 1000L * 1000L
    val w = Window.partitionBy("user_id").orderBy("ts_us")
      .rangeBetween(-hourUs, 0)
    events(s, dir)
      .select(col("event_id"), col("user_id"),
        expr("ts div 1000").as("ts_us"),
        col("value").cast(DecimalType(25, 6)).as("v"))
      .withColumn("n_1h", count(lit(1)).over(w))
      .withColumn("sum_1h", sum(col("v")).over(w).cast("double"))
      .select("event_id", "user_id", "n_1h", "sum_1h")
      .orderBy("event_id")
  }

  val q108Sql: String =
    """SELECT event_id, user_id,
      |COUNT(*) OVER w AS n_1h,
      |CAST(SUM(CAST(value AS DECIMAL(25,6))) OVER w AS DOUBLE) AS sum_1h
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
      |  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
      |ORDER BY event_id""".stripMargin

  // ----------------------------------------------- q110 winsorize
  /** Winsorized per-group statistics: clip `value` to its group's
    * [p05, p95] (exact interpolated percentiles — the q69 primitive),
    * then report the clipped mean beside the raw mean — the robust-
    * stats gate that tames heavy tails before z-scoring or model
    * features. Two passes over one user-invisible shuffle key
    * (event_type): pass 1 aggregates the clip bounds (map-side
    * combined), pass 2 re-scans with the BOUNDS BROADCAST back — the
    * fact side never reshuffles (the q71 stats-broadcast shape).
    * Clipping compares doubles against the interpolated bound — the
    * same IEEE compare in both engines; the clipped sum then routes
    * through DECIMAL so the means are bit-stable. */
  def q110Winsorize(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir).select(col("event_type"), col("value"))
    val bounds = ev.groupBy("event_type").agg(
      expr("percentile(value, 0.05)").as("p05"),
      expr("percentile(value, 0.95)").as("p95"))
    ev.join(broadcast(bounds), "event_type")
      .withColumn("clipped", least(greatest(col("value"), col("p05")), col("p95")))
      .groupBy("event_type").agg(
        count(lit(1)).as("n"),
        round(first(col("p05")), 4).as("p05"),
        round(first(col("p95")), 4).as("p95"),
        dmean(col("value"), 4).as("mean_raw"),
        dmean(col("clipped"), 4).as("mean_wins"))
      .orderBy("event_type")
  }

  val q110Sql: String =
    s"""WITH b AS (SELECT event_type, quantile_cont(value, 0.05) AS p05,
      |  quantile_cont(value, 0.95) AS p95 FROM events GROUP BY 1)
      |SELECT e.event_type, COUNT(*) AS n,
      |round(ANY_VALUE(b.p05), 4) AS p05, round(ANY_VALUE(b.p95), 4) AS p95,
      |${DMEAN("e.value", 4)} AS mean_raw,
      |${DMEAN("least(greatest(e.value, b.p05), b.p95)", 4)} AS mean_wins
      |FROM events e JOIN b ON e.event_type = b.event_type
      |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin

  // ------------------------------------------------ q175 MAD outliers
  /** Robust (MAD-based) outlier gate — the breakdown-resistant
    * complement of q71's z-score: a single wild value inflates the
    * mean and stddev enough to MASK other outliers (the masking
    * effect), while the median and the median absolute deviation have
    * a 50% breakdown point. Flag |x − med| > 3 · MAD per event type.
    *
    * Determinism: both medians quantize to 6 dp (round-on-output of
    * `percentile` ≡ `quantile_cont`, the q69 parity + the q140
    * knife-edge rule) BEFORE any downstream arithmetic, so the
    * threshold compare sees identical doubles in both engines.
    *
    * Plan shape: two grouped median passes (the second over |x − med|
    * after a broadcast join of the |event_type|-row med table) + one
    * final broadcast back onto the fact scan — the fact side never
    * shuffles, the q71 shape doubled. At 100 TB exact per-group
    * medians move to `percentile_approx` (t-digest) with this exact
    * form as the accuracy baseline. */
  val MadK: Double = 3.0

  def q175MadOutliers(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir)
      .select(col("event_id"), col("event_type"), col("value"))
    val med = e.groupBy(col("event_type"))
      .agg(round(expr("percentile(value, 0.5)"), 6).as("med"))
    val dev = e.join(broadcast(med), "event_type")
      .withColumn("adev", abs(col("value") - col("med")))
    val mad = dev.groupBy(col("event_type"))
      .agg(round(expr("percentile(adev, 0.5)"), 6).as("mad"))
    dev.join(broadcast(mad), "event_type")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        min(col("med")).as("med"), min(col("mad")).as("mad"),
        sum(when(col("adev") > lit(MadK) * col("mad"), 1L).otherwise(0L))
          .as("n_outliers"),
        round(max(col("adev")), 4).as("max_abs_dev"))
      .orderBy("event_type")
  }

  val q175Sql: String =
    s"""WITH med AS (SELECT event_type,
       |  round(quantile_cont(value, 0.5), 6) AS med
       |  FROM events GROUP BY 1),
       |dev AS (SELECT e.event_id, e.event_type, e.value,
       |  abs(e.value - m.med) AS adev, m.med
       |  FROM events e JOIN med m ON e.event_type = m.event_type),
       |mad AS (SELECT event_type, round(quantile_cont(adev, 0.5), 6) AS mad
       |  FROM dev GROUP BY 1)
       |SELECT d.event_type, COUNT(*) AS n,
       |MIN(d.med) AS med, MIN(a.mad) AS mad,
       |CAST(SUM(CASE WHEN d.adev > $MadK * a.mad THEN 1 ELSE 0 END)
       |  AS BIGINT) AS n_outliers,
       |round(MAX(d.adev), 4) AS max_abs_dev
       |FROM dev d JOIN mad a ON d.event_type = a.event_type
       |GROUP BY d.event_type ORDER BY d.event_type""".stripMargin

  // -------------------------------------- q178 rank-function battery
  /** The remaining standard ranking window functions in one row set:
    * percent_rank, cume_dist, rank and dense_rank over value within
    * event type (q78 covers ntile, q144 the value-window family).
    * Both engines define percent_rank = (rank−1)/(n−1) and cume_dist =
    * |rows ≤ current| / n from exact integers — and because those are
    * pure integer ratios, the 6-dp presentation rounds the exact
    * rationals via [[Relational.dratio]] (with the unique tie-break,
    * rank = row_number and the peer group is a single row, so
    * cume_dist = rn/n exactly); round(double) would break real 7-dp
    * ties engine-differently. Output bounded to a deterministic id
    * sample (the battery pattern — full window state, sampled
    * emission). One shuffle on event_type; all functions share it. */
  def q178RankFuncs(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("value"), col("event_id"))
    val pw = Window.partitionBy(col("event_type"))
    val n = count(lit(1)).over(pw)
    events(s, dir)
      .select(col("event_id"), col("event_type"), col("value"))
      .withColumn("rnk", rank().over(w))
      .withColumn("drnk", dense_rank().over(w))
      .withColumn("prnk", when(n > 1,
        graft.queries.Relational.dratio(rank().over(w) - 1, n - 1, 6))
        .otherwise(lit(0.0)))
      .withColumn("cdist",
        graft.queries.Relational.dratio(row_number().over(w), n, 6))
      .filter(col("event_id") % 199 === 0)
      .select(col("event_id"), col("event_type"), col("rnk"), col("drnk"),
        col("prnk"), col("cdist"))
      .orderBy("event_id")
  }

  val q178Sql: String =
    s"""SELECT event_id, event_type, rnk, drnk, prnk, cdist FROM (
       |  SELECT event_id, event_type,
       |  RANK() OVER w AS rnk, DENSE_RANK() OVER w AS drnk,
       |  CASE WHEN COUNT(*) OVER p > 1 THEN ${graft.queries.Relational
            .DRATIO("RANK() OVER w - 1", "COUNT(*) OVER p - 1", 6)}
       |    ELSE CAST(0 AS DOUBLE) END AS prnk,
       |  ${graft.queries.Relational.DRATIO("ROW_NUMBER() OVER w",
            "COUNT(*) OVER p", 6)} AS cdist
       |  FROM events
       |  WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id),
       |         p AS (PARTITION BY event_type))
       |WHERE event_id % 199 = 0 ORDER BY event_id""".stripMargin

  // ------------------------------------------- q179 pearson drift
  /** Exact-moment Pearson correlation of value vs event time per type
    * — the numeric drift detector beside q143's categorical shares
    * (and the linear complement of q122's rank-based Spearman). The
    * builtin `corr` accumulates doubles partition-order-dependently;
    * here every moment (Σx, Σy, Σxy, Σx², Σy²) routes through
    * DECIMAL ([[Relational.dsum]]) over integer-µs x and double y, so
    * r = (nΣxy − ΣxΣy) / (sqrt(nΣx²−(Σx)²) · sqrt(nΣy²−(Σy)²)) is
    * computed from bit-identical moments with only IEEE-exact ops
    * (*, −, /, sqrt — sqrt IS correctly rounded per IEEE-754).
    * Time re-bases to hours from the global min (broadcast one-row
    * aggregate) so the decimal moments stay far from overflow.
    * One map-side-combined shuffle; |event_type| result rows. */
  def q179PearsonDrift(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir).select(col("event_type"),
      expr("ts div 1000").as("us"), col("value"))
    val t0 = e.agg(min(col("us")).as("us0"))
    val based = e.crossJoin(broadcast(t0))
      .withColumn("x", (col("us") - col("us0")).cast("double") / lit(3.6e9))
    val m = based.groupBy(col("event_type")).agg(
      count(lit(1)).cast("double").as("n"),
      dsum(col("x")).as("sx"), dsum(col("value")).as("sy"),
      dsum(col("x") * col("value")).as("sxy"),
      dsum(col("x") * col("x")).as("sxx"),
      dsum(col("value") * col("value")).as("syy"))
    m.select(col("event_type"), col("n").cast("long").as("n"),
      round((col("n") * col("sxy") - col("sx") * col("sy")) /
        (sqrt(col("n") * col("sxx") - col("sx") * col("sx")) *
          sqrt(col("n") * col("syy") - col("sy") * col("sy"))), 6).as("r"))
      .orderBy("event_type")
  }

  val q179Sql: String =
    s"""WITH t0 AS (SELECT MIN(epoch_us(ts)) AS us0 FROM events),
       |b AS (SELECT event_type,
       |  CAST(epoch_us(ts) - us0 AS DOUBLE) / 3.6e9 AS x, value
       |  FROM events, t0),
       |m AS (SELECT event_type, CAST(COUNT(*) AS DOUBLE) AS n,
       |  ${DSUM("x")} AS sx, ${DSUM("value")} AS sy,
       |  ${DSUM("x * value")} AS sxy, ${DSUM("x * x")} AS sxx,
       |  ${DSUM("value * value")} AS syy
       |  FROM b GROUP BY event_type)
       |SELECT event_type, CAST(n AS BIGINT) AS n,
       |round((n * sxy - sx * sy) /
       |  (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6) AS r
       |FROM m ORDER BY event_type""".stripMargin

  // ------------------------------------- q180 transition matrix
  /** Per-user event-type transition counts (the first-order Markov
    * matrix of the behavior stream) with each transition's share of
    * its source row — the behavioral counterpart of q100's text
    * bigram LM, and the input to session-flow anomaly detection.
    * Transitions are consecutive events per user in (ts, event_id)
    * order; ONE shuffle on user_id feeds the lag window, then the
    * |types|² matrix aggregates map-side. Row shares divide exact
    * counts (one integer division per cell — bit-stable). */
  def q180Transitions(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    val trans = events(s, dir)
      .select(col("event_id"), col("user_id"),
        expr("ts div 1000").as("ts_us"), col("event_type"))
      .withColumn("prev", lag(col("event_type"), 1).over(w))
      .filter(col("prev").isNotNull)
    trans.groupBy(col("prev").as("from_type"), col("event_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
      // count ratio → exact integer rounding (real 6-dp ties exist
      // whenever a row total has only 2/5 factors — the q82 class).
      // The window total is NAMED first: dratio references its q
      // operand twice, and an inline window expression would be
      // planned (and paid) twice.
      .withColumn("row_total",
        sum(col("n")).over(Window.partitionBy(col("from_type"))))
      .withColumn("row_share",
        graft.queries.Relational.dratio(col("n"), col("row_total"), 6))
      .select(col("from_type"), col("to_type"), col("n"), col("row_share"))
      .orderBy("from_type", "to_type")
  }

  val q180Sql: String =
    s"""WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type
       |  FROM events),
       |tr AS (SELECT user_id, event_type,
       |  lag(event_type) OVER (PARTITION BY user_id
       |    ORDER BY ts_us, event_id) AS prev FROM e),
       |m AS (SELECT prev AS from_type, event_type AS to_type, COUNT(*) AS n
       |  FROM tr WHERE prev IS NOT NULL GROUP BY 1, 2)
       |SELECT from_type, to_type, n,
       |${graft.queries.Relational.DRATIO("n",
           "SUM(n) OVER (PARTITION BY from_type)", 6)} AS row_share
       |FROM m ORDER BY from_type, to_type""".stripMargin

  // --------------------------------------- q182 episode dedup
  /** Trajectory-level dedup accounting: sessionize (q67's 3-hour gap
    * rule), render each session as its ordered event-type sequence,
    * fingerprint it, and report how many DISTINCT behavioral episodes
    * each episode-length bucket holds — the dedup signal for
    * agent-trajectory / dialogue-log training data (whole-trajectory
    * repeats are the q20 of behavior streams).
    *
    * Determinism: collect_list order is partition-dependent, so the
    * sequence is assembled by sorting an array of (ts, event_id, type)
    * structs AFTER collection (sort_array on struct = lexicographic —
    * the total order both engines share via ORDER BY ts, event_id).
    * One user_id shuffle (sessionization windows + the episode
    * aggregate share it); the bucket report is tiny. */
  def q182EpisodeDedup(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    val sessions = events(s, dir)
      .select(col("event_id"), expr("ts div 1000").as("ts_us"),
        col("user_id"), col("event_type"))
      .withColumn("brk",
        when(lag(col("ts_us"), 1).over(w).isNull ||
          col("ts_us") - lag(col("ts_us"), 1).over(w) > SessionGapUs, 1L)
          .otherwise(0L))
      .withColumn("session_idx",
        sum(col("brk")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
    val episodes = sessions
      .groupBy(col("user_id"), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        md5(expr(
          """array_join(transform(
            |  sort_array(collect_list(struct(ts_us, event_id, event_type))),
            |  s -> s.event_type), ' ')""".stripMargin).cast("binary"))
          .as("episode_fp"))
    episodes.groupBy(col("n_events"))
      .agg(count(lit(1)).as("n_episodes"),
        countDistinct(col("episode_fp")).as("n_distinct"),
        Relational.dratio(count(lit(1)) - countDistinct(col("episode_fp")),
          count(lit(1)), 4).as("dup_rate"))
      .orderBy("n_events")
  }

  val q182Sql: String =
    s"""WITH e AS (SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type
       |  FROM events),
       |g AS (SELECT user_id, ts_us, event_id, event_type,
       |  CASE WHEN lag(ts_us) OVER w IS NULL
       |       OR ts_us - lag(ts_us) OVER w > $SessionGapUs THEN 1 ELSE 0 END
       |    AS brk
       |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
       |sx AS (SELECT user_id, ts_us, event_id, event_type,
       |  CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
       |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx FROM g),
       |ep AS (SELECT user_id, session_idx, COUNT(*) AS n_events,
       |  md5(array_to_string(
       |    list(event_type ORDER BY ts_us, event_id), ' ')) AS episode_fp
       |  FROM sx GROUP BY 1, 2)
       |SELECT n_events, COUNT(*) AS n_episodes,
       |COUNT(DISTINCT episode_fp) AS n_distinct,
       |${Relational.DRATIO("COUNT(*) - COUNT(DISTINCT episode_fp)",
           "COUNT(*)", 4)} AS dup_rate
       |FROM ep GROUP BY n_events ORDER BY n_events""".stripMargin

  // -------------------------------------- q221 CUSUM changepoint
  /** Offline changepoint detection per event stream — the CUSUM
    * estimator `k* = argmax_k |S_k − (k/n)·S_n|` over each event
    * type's time-ordered value series, the monitor that catches a
    * level shift in an ingest metric (a source going bad mid-crawl, a
    * schema change flipping a value's unit) before it contaminates a
    * training mix. Emits per type the change index, its timestamp,
    * and the normalized statistic.
    *
    * Exactness: values quantize once to 6-dp micro-units; prefix sums
    * are exact integers; the argmax key is the cross-multiplied
    * integer `|S_k·n − k·S_n|` lifted into DECIMAL(38,0)/HUGEINT
    * before the products (overflow-safe past int64 corpora), ties to
    * the earliest k. The one division produces the reported double.
    *
    * Scale: one shuffle on event_type; the prefix sum and argmax run
    * inside that partitioning in time order — the layout event data
    * already has. Type cardinality bounds the output. */
  def q221CusumChangepoint(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir).select(col("event_type"),
      expr("ts div 1000").as("tus"), col("event_id"),
      expr("CAST(CAST(value AS DECIMAL(25,6)) * 1000000 AS BIGINT)")
        .as("qv"))
    val w = Window.partitionBy("event_type").orderBy("tus", "event_id")
    val wAll = Window.partitionBy("event_type")
    val scored = e
      .withColumn("k", row_number().over(w))
      .withColumn("sk", sum(col("qv")).over(w))
      .withColumn("n", count(lit(1)).over(wAll))
      .withColumn("sn", sum(col("qv")).over(wAll))
      .withColumn("d", expr(
        "abs(CAST(sk AS DECIMAL(38,0)) * n - CAST(k AS DECIMAL(38,0)) * sn)"))
    val pick = Window.partitionBy("event_type")
      .orderBy(col("d").desc, col("k"))
    scored.withColumn("rn", row_number().over(pick))
      .filter(col("rn") === 1)
      .select(col("event_type"), col("n"), col("k").cast("long").as("cp_k"),
        col("tus").as("cp_tus"),
        col("d").cast("double").as("d_num"),
        (col("d").cast("double") /
          (col("n").cast("double") * col("n").cast("double")))
          .as("stat_uu"))
      .orderBy("event_type")
  }

  val q221Sql: String =
    """WITH e AS (SELECT event_type, epoch_us(ts) AS tus, event_id,
      |  CAST(CAST(value AS DECIMAL(25,6)) * 1000000 AS BIGINT) AS qv
      |  FROM events),
      |p AS (SELECT *,
      |  CAST(ROW_NUMBER() OVER (PARTITION BY event_type
      |    ORDER BY tus, event_id) AS BIGINT) AS k,
      |  CAST(SUM(qv) OVER (PARTITION BY event_type
      |    ORDER BY tus, event_id) AS BIGINT) AS sk,
      |  CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n,
      |  CAST(SUM(qv) OVER (PARTITION BY event_type) AS BIGINT) AS sn
      |  FROM e),
      |d AS (SELECT *,
      |  abs(CAST(sk AS HUGEINT) * n - CAST(k AS HUGEINT) * sn) AS dd
      |  FROM p),
      |top AS (SELECT * FROM (SELECT *, ROW_NUMBER() OVER
      |  (PARTITION BY event_type ORDER BY dd DESC, k) AS rn FROM d)
      |  WHERE rn = 1)
      |SELECT event_type, n, k AS cp_k, tus AS cp_tus,
      |  CAST(dd AS DOUBLE) AS d_num,
      |  CAST(dd AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))
      |    AS stat_uu
      |FROM top ORDER BY event_type""".stripMargin

  // ----------------------------------- q223 exact two-phase median
  /** Exact k-th order statistic (the lower median) WITHOUT a global
    * sort — the two-phase histogram-refinement selection a 100 TB
    * column demands: phase 1 buckets each event type's micro-unit
    * values into 256 equi-width bins (map-side-combined counts, one
    * tiny relation) and locates via prefix sum the bin holding the
    * k-th value plus the residual rank inside it; phase 2 sorts ONLY
    * that bin's rows — bounded by the bin count, not n. q69/q102
    * answer quantiles approximately or by per-group sort; this is the
    * exact-selection plan that scales, with the bin accounting in the
    * output so the boundedness claim is itself oracle-checked.
    *
    * Exactness: everything through the bin search is integer; the
    * within-bin rank selects an exact micro-unit value; ties inside a
    * bin cannot change the k-th VALUE (duplicate values are
    * interchangeable at the same ranks), so no tie-break is needed
    * for determinism.
    *
    * Scale: two scans of the column; the only per-row state is a bin
    * id; the sort in phase 2 touches n/256-ish rows per type (the
    * output proves it); nothing corpus-sized is globally ordered. */
  val MedianBins = 256

  def q223ExactMedian(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir).select(col("event_type"),
      expr("CAST(CAST(value AS DECIMAL(25,6)) * 1000000 AS BIGINT)")
        .as("qv"))
    val span = e.groupBy("event_type").agg(count(lit(1)).as("n"),
      min("qv").as("mn"), max("qv").as("mx"))
      .withColumn("k", expr("(n + 1) div 2"))
    val binned = e.join(broadcast(span), "event_type")
      .withColumn("bin", expr(
        s"((qv - mn) * $MedianBins) div (mx - mn + 1)"))
    val hist = binned.groupBy("event_type", "n", "k", "bin")
      .agg(count(lit(1)).as("bc"))
    val wcum = Window.partitionBy("event_type").orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, -1)
    val target = hist
      .withColumn("cum_before", coalesce(sum("bc").over(wcum), lit(0L)))
      .filter(col("cum_before") < col("k") &&
        col("k") <= col("cum_before") + col("bc"))
      .select(col("event_type"), col("n"), col("k"), col("bin"),
        col("bc").as("bin_count"), (col("k") - col("cum_before")).as("kk"))
    val win = Window.partitionBy("event_type").orderBy("qv")
    binned.select("event_type", "bin", "qv")
      .join(broadcast(target), Seq("event_type", "bin"))
      .withColumn("rn", row_number().over(win))
      .filter(col("rn") === col("kk"))
      .select(col("event_type"), col("n"), col("k"), col("bin"),
        col("bin_count"), col("qv").as("median_us"),
        (col("qv").cast("double") / lit(1000000.0)).as("median"))
      .orderBy("event_type")
  }

  val q223Sql: String =
    s"""WITH e AS (SELECT event_type,
       |  CAST(CAST(value AS DECIMAL(25,6)) * 1000000 AS BIGINT) AS qv
       |  FROM events),
       |span AS (SELECT event_type, COUNT(*) AS n,
       |  MIN(qv) AS mn, MAX(qv) AS mx, (COUNT(*) + 1) // 2 AS k
       |  FROM e GROUP BY 1),
       |b AS (SELECT e.event_type, e.qv, s.n, s.k,
       |  ((e.qv - s.mn) * $MedianBins) // (s.mx - s.mn + 1) AS bin
       |  FROM e JOIN span s USING (event_type)),
       |h AS (SELECT event_type, n, k, bin, COUNT(*) AS bc
       |  FROM b GROUP BY 1, 2, 3, 4),
       |c AS (SELECT *, COALESCE(CAST(SUM(bc) OVER (PARTITION BY event_type
       |  ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
       |  AS BIGINT), 0) AS cum_before FROM h),
       |t AS (SELECT event_type, n, k, bin, bc AS bin_count,
       |  k - cum_before AS kk FROM c
       |  WHERE cum_before < k AND k <= cum_before + bc),
       |g AS (SELECT event_type, qv, ROW_NUMBER() OVER
       |  (PARTITION BY event_type ORDER BY qv) AS rn FROM e),
       |m AS (SELECT g.event_type, g.qv FROM g
       |  JOIN span s ON g.event_type = s.event_type AND g.rn = s.k)
       |SELECT t.event_type, t.n, t.k, t.bin, t.bin_count,
       |  m.qv AS median_us,
       |  CAST(m.qv AS DOUBLE) / 1000000.0 AS median
       |FROM t JOIN m USING (event_type) ORDER BY event_type""".stripMargin

  // ----------------------------- q267 session association rules
  /** Directed association rules A→B over session baskets (sessions =
    * q67's 3-hour-gap semantics; basket = the session's distinct
    * event types): support, confidence, and lift for every ordered
    * type pair — the market-basket read on behavioral logs (q146
    * counts user-lifetime co-occurrence; baskets are WITHIN-session,
    * the actionable horizon for sequencing/recommendation features).
    *
    * Determinism: session boundaries come from the q67 integer-µs
    * lag rule; all basket counts are exact integers; support /
    * confidence / lift are IEEE divisions of those integers.
    *
    * Scale: one user-keyed window shuffle (shared with q67's shape),
    * one distinct over (session, type) bounded by sessions × |types|,
    * and a session-keyed self-join whose per-session fan-out is
    * |types|² — a constant; outputs |types|² rows. */
  def q267AssocRules(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    val sess = events(s, dir)
      .select(col("event_id"), expr("ts div 1000").as("ts_us"),
        col("user_id"), col("event_type"))
      .withColumn("brk",
        when(lag(col("ts_us"), 1).over(w).isNull ||
          col("ts_us") - lag(col("ts_us"), 1).over(w) > SessionGapUs, 1L)
          .otherwise(0L))
      .withColumn("session_idx",
        sum(col("brk")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .select(col("user_id"), col("session_idx"), col("event_type"))
      .distinct()
    val nSess = sess.select("user_id", "session_idx").distinct()
      .agg(count(lit(1)).as("n_sessions"))
    val typeCount = sess.groupBy("event_type")
      .agg(count(lit(1)).as("n_t"))
    val a = sess.select(col("user_id"), col("session_idx"),
      col("event_type").as("t1"))
    val b = sess.select(col("user_id"), col("session_idx"),
      col("event_type").as("t2"))
    a.join(b, Seq("user_id", "session_idx"))
      .filter(col("t1") =!= col("t2"))
      .groupBy("t1", "t2").agg(count(lit(1)).as("n_ab"))
      .join(broadcast(typeCount.select(col("event_type").as("t1"),
        col("n_t").as("n_a"))), "t1")
      .join(broadcast(typeCount.select(col("event_type").as("t2"),
        col("n_t").as("n_b"))), "t2")
      .crossJoin(broadcast(nSess))
      .select(col("t1"), col("t2"), col("n_ab"),
        (col("n_ab").cast("double") / col("n_sessions").cast("double"))
          .as("support"),
        (col("n_ab").cast("double") / col("n_a").cast("double"))
          .as("confidence"),
        (col("n_ab").cast("double") * col("n_sessions").cast("double") /
          (col("n_a").cast("double") * col("n_b").cast("double")))
          .as("lift"))
      .orderBy("t1", "t2")
  }

  val q267Sql: String =
    s"""WITH e AS (SELECT event_id, epoch_us(ts) AS ts_us, user_id,
       |  event_type FROM events),
       |g AS (SELECT user_id, event_type,
       |  CASE WHEN lag(ts_us) OVER w IS NULL
       |       OR ts_us - lag(ts_us) OVER w > $SessionGapUs
       |    THEN 1 ELSE 0 END AS brk, ts_us, event_id
       |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
       |sx AS (SELECT user_id, event_type,
       |  SUM(brk) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
       |  FROM g),
       |sess AS (SELECT DISTINCT user_id, session_idx, event_type FROM sx),
       |ns AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions FROM
       |  (SELECT DISTINCT user_id, session_idx FROM sess)),
       |tc AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_t
       |  FROM sess GROUP BY 1),
       |ab AS (SELECT a.event_type AS t1, b.event_type AS t2,
       |  CAST(COUNT(*) AS BIGINT) AS n_ab
       |  FROM sess a JOIN sess b USING (user_id, session_idx)
       |  WHERE a.event_type <> b.event_type GROUP BY 1, 2)
       |SELECT t1, t2, n_ab,
       |  CAST(n_ab AS DOUBLE) / CAST(ns.n_sessions AS DOUBLE) AS support,
       |  CAST(n_ab AS DOUBLE) / CAST(ta.n_t AS DOUBLE) AS confidence,
       |  CAST(n_ab AS DOUBLE) * CAST(ns.n_sessions AS DOUBLE) /
       |    (CAST(ta.n_t AS DOUBLE) * CAST(tb.n_t AS DOUBLE)) AS lift
       |FROM ab JOIN tc ta ON ab.t1 = ta.event_type
       |        JOIN tc tb ON ab.t2 = tb.event_type
       |        CROSS JOIN ns
       |ORDER BY t1, t2""".stripMargin

  // ------------------------------- q264 leakage-safe churn labels
  /** Churn-label generation with a hard temporal firewall: features
    * come ONLY from the first 80% of the time range, the label ONLY
    * from the rest (churned = zero events after the cutoff) — the
    * label/feature split that makes a churn training set valid
    * (computing recency against the label window is the classic
    * leak; here recency is measured AT the cutoff). Users born after
    * the cutoff are excluded — they have no feature view.
    *
    * Determinism: the cutoff is the q257 integer-µs arithmetic;
    * counts, distinct-day counts, and recency are exact integers;
    * no floating point anywhere.
    *
    * Scale: two per-user map-side-combined aggregations (the label
    * side reads only the post-cutoff slice — partition-prunable) and
    * one |users|-row left join. */
  def q264ChurnLabels(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir).select(col("user_id"), expr("ts div 1000").as("us"))
    val cut = e.agg(min("us").as("mn"), max("us").as("mx"))
      .select(expr("mn + (mx - mn) * 4 div 5").as("cut"))
    val tagged = e.crossJoin(broadcast(cut))
    val feat = tagged.filter(col("us") < col("cut"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events_feat"),
        countDistinct(expr("us div 86400000000")).as("active_days_feat"),
        max(expr("cut - us")).as("tenure_us"),
        min(expr("cut - us")).as("recency_us"))
    val label = tagged.filter(col("us") >= col("cut"))
      .groupBy("user_id").agg(count(lit(1)).as("n_label"))
    feat.join(label, Seq("user_id"), "left")
      .select(col("user_id"), col("n_events_feat"),
        col("active_days_feat"), col("tenure_us"), col("recency_us"),
        when(col("n_label").isNull, 1L).otherwise(0L).as("churned"))
      .orderBy("user_id")
  }

  val q264Sql: String =
    """WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events),
      |mm AS (SELECT MIN(us) AS mn, MAX(us) AS mx FROM e),
      |t AS (SELECT e.*, mm.mn + (mm.mx - mm.mn) * 4 // 5 AS cut
      |  FROM e CROSS JOIN mm),
      |f AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events_feat,
      |  CAST(COUNT(DISTINCT us // 86400000000) AS BIGINT)
      |    AS active_days_feat,
      |  CAST(MAX(cut - us) AS BIGINT) AS tenure_us,
      |  CAST(MIN(cut - us) AS BIGINT) AS recency_us
      |  FROM t WHERE us < cut GROUP BY 1),
      |lb AS (SELECT user_id, COUNT(*) AS n_label FROM t
      |  WHERE us >= cut GROUP BY 1)
      |SELECT f.user_id, f.n_events_feat, f.active_days_feat,
      |  f.tenure_us, f.recency_us,
      |  CASE WHEN lb.n_label IS NULL THEN 1 ELSE 0 END AS churned
      |FROM f LEFT JOIN lb USING (user_id)
      |ORDER BY user_id""".stripMargin

  // ----------------------------------- q265 inter-event burstiness
  /** Per-user inter-arrival burstiness: coefficient of variation and
    * the Goh–Barabási burstiness B = (σ−μ)/(σ+μ) of the gap
    * distribution — B ≈ 0 for a Poisson user, → 1 for bursty
    * sessions, < 0 for metronomic bots. The behavioral-shape feature
    * a fraud/bot filter reads next to q67's session counts (volume
    * says HOW MUCH, burstiness says IN WHAT RHYTHM).
    *
    * Determinism: gaps are exact integer µs off a (ts, event_id)
    * total-order lag; Σg and Σg² accumulate in DECIMAL(38,0) (g² can
    * pass 2^63); μ, σ, CV, B are IEEE arithmetic over the
    * bit-identical decimal-cast operands — population variance via
    * the closed form (n·Σg² − (Σg)²)/n².
    *
    * Scale: one user-keyed window (the q180 shuffle) + one map-side
    * combined per-user aggregation; users with < 3 events carry no
    * gap variance and are excluded deterministically. */
  def q265Burstiness(s: SparkSession, dir: String): DataFrame = {
    // (18,0) operands keep the g*g product inside DuckDB's 38-digit
    // cap ((38,0)^2 would not typecheck there); gaps are < 1e12 us
    val dec18 = org.apache.spark.sql.types.DecimalType(18, 0)
    val w = Window.partitionBy("user_id").orderBy("us", "event_id")
    val gaps = events(s, dir)
      .select(col("user_id"), col("event_id"), expr("ts div 1000").as("us"))
      .withColumn("prev", lag(col("us"), 1).over(w))
      .filter(col("prev").isNotNull)
      .select(col("user_id"), (col("us") - col("prev")).as("g"))
    gaps.groupBy("user_id")
      .agg(count(lit(1)).as("n_gaps"),
        sum(col("g").cast(dec18)).cast("double").as("sg"),
        sum(col("g").cast(dec18) * col("g").cast(dec18)).cast("double")
          .as("sgg"))
      .filter(col("n_gaps") >= 2L)
      .withColumn("mu", col("sg") / col("n_gaps").cast("double"))
      .withColumn("sigma", sqrt(
        (col("n_gaps").cast("double") * col("sgg") - col("sg") * col("sg")) /
          (col("n_gaps").cast("double") * col("n_gaps").cast("double"))))
      .select(col("user_id"), col("n_gaps"),
        (col("mu") / 1e6).as("mean_gap_s"),
        (col("sigma") / col("mu")).as("cv"),
        ((col("sigma") - col("mu")) / (col("sigma") + col("mu")))
          .as("burstiness"))
      .orderBy("user_id")
  }

  val q265Sql: String =
    """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
      |g AS (SELECT user_id,
      |  us - LAG(us) OVER (PARTITION BY user_id ORDER BY us, event_id)
      |    AS g FROM e),
      |a AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_gaps,
      |  CAST(SUM(CAST(g AS HUGEINT)) AS DOUBLE) AS sg,
      |  CAST(SUM(CAST(g AS HUGEINT) * CAST(g AS HUGEINT))
      |    AS DOUBLE) AS sgg
      |  FROM g WHERE g IS NOT NULL GROUP BY 1 HAVING COUNT(*) >= 2),
      |m AS (SELECT user_id, n_gaps, sg / CAST(n_gaps AS DOUBLE) AS mu,
      |  sqrt((CAST(n_gaps AS DOUBLE) * sgg - sg * sg) /
      |    (CAST(n_gaps AS DOUBLE) * CAST(n_gaps AS DOUBLE))) AS sigma
      |  FROM a)
      |SELECT user_id, n_gaps, mu / 1e6 AS mean_gap_s, sigma / mu AS cv,
      |  (sigma - mu) / (sigma + mu) AS burstiness
      |FROM m ORDER BY user_id""".stripMargin

  // ------------------------------- q261 Theil–Sen robust drift slope
  /** Robust trend of the daily mean event value: the Theil–Sen
    * estimator (lower median of all pairwise day-to-day slopes) next
    * to the OLS slope — the drift detector that one bad day cannot
    * drag (OLS has breakdown point 0; Theil–Sen survives ~29%
    * contamination). The q221 CUSUM finds WHEN a shift happened; this
    * reports the sustained RATE, robustly.
    *
    * Determinism: daily means are one IEEE division of a
    * DECIMAL(38,0) micro-unit sum by an integer count; each pairwise
    * slope is IEEE arithmetic on those identical doubles; the median
    * slope is the (n+1)/2-th ORDER STATISTIC by value — engine order
    * among equal doubles cannot change which VALUE sits at that rank.
    * OLS runs on (day − min_day, round(mean·1e6)) with EXACT decimal
    * integer sums; only the final closed form is double, over
    * bit-identical operands in both engines.
    *
    * Scale: the corpus collapses to |days| rows in one
    * map-side-combined shuffle; the O(days²) pair join runs on that
    * bounded relation (a decade is ~7 k²/2 pairs), never on events.
    * `byDay` has FIVE consumers (both pair-join sides, the histogram
    * stats, the OLS xy, and the min-day broadcast) and `binned` two
    * (the 256-bin histogram and the bin-local rank) — each is pinned
    * ([[graft.core.Sessions.pin]]) so the corpus is scanned exactly
    * once and the |days|²/2 binning runs exactly once, however many
    * derivations read them. */
  def q261TheilSen(s: SparkSession, dir: String): DataFrame = {
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val byDay = graft.core.Sessions.pin(events(s, dir)
      .select(expr("ts div 1000 div 86400000000").as("day"),
        expr("CAST(CAST(value AS DECIMAL(25,6)) * 1000000 AS BIGINT)")
          .as("v_us"))
      .groupBy("day")
      .agg(count(lit(1)).as("n"), sum(col("v_us").cast(dec38)).as("sv"))
      .select(col("day"), col("n"), col("sv"),
        (col("sv").cast("double") / (col("n").cast("double") * 1e6)).as("m")),
      parts = 1)
    val a = byDay.select(col("day").as("d1"), col("m").as("m1"))
    val b = byDay.select(col("day").as("d2"), col("m").as("m2"))
    val slopes = a.join(b, col("d1") < col("d2"))
      .select(((col("m2") - col("m1")) /
        (col("d2") - col("d1")).cast("double")).as("slope"))
    // median slope via the q223 two-phase histogram-refinement
    // selection instead of a single-partition global rank window: the
    // pair relation is |days|²/2 rows (bounded by construction, but
    // ~6.7 M at a decade of days), so phase 1 bins the slopes (256
    // equi-width bins, map-side-combined counts) and locates the
    // median's bin by prefix sum over the 256-row histogram; phase 2
    // rank-sorts ONLY that bin's ~1/256 share. The k-th order
    // statistic is selection-method-independent, so the oracle value
    // is unchanged.
    val bins = 256
    val stats = slopes.agg(count(lit(1)).as("n_pairs"),
        min("slope").as("mn"), max("slope").as("mx"))
      .withColumn("k", expr("(n_pairs + 1) div 2"))
    val binned = graft.core.Sessions.pin(slopes.crossJoin(broadcast(stats))
      .withColumn("bin", when(col("mx") === col("mn"), lit(0L))
        .otherwise(least(floor((col("slope") - col("mn")) /
          (col("mx") - col("mn")) * bins), lit((bins - 1).toDouble))
          .cast("long"))),
      parts = 8)
    val hist = binned.groupBy("bin", "k", "n_pairs")
      .agg(count(lit(1)).as("bc"))
      .withColumn("g", lit(0))
    val wcum = Window.partitionBy("g").orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, -1)
    val target = hist
      .withColumn("cum_before", coalesce(sum("bc").over(wcum), lit(0L)))
      .filter(col("cum_before") < col("k") &&
        col("k") <= col("cum_before") + col("bc"))
      .select(col("bin"), col("n_pairs"),
        (col("k") - col("cum_before")).as("kk"))
    val medianSlope = binned.select("bin", "slope")
      .join(broadcast(target), "bin")
      .withColumn("rn",
        row_number().over(Window.partitionBy("bin").orderBy("slope")))
      .filter(col("rn") === col("kk"))
      .select(col("slope").as("ts_slope"), col("n_pairs"))
    // OLS over (day − mnd, round(sv/n)) — EXACT integer sums in
    // decimal, cast to double only for the final closed form, so both
    // engines combine bit-identical operands (quantizing the raw
    // x·y products instead diverged at the rounding boundary). yus
    // rounds the exact integer ratio sv/n via dfrac, never the double
    // m·1e6: the daily mean in micro-units is a rational whose true
    // half-integer ties round(double) breaks engine-differently.
    val d18 = org.apache.spark.sql.types.DecimalType(18, 0)
    val xy = byDay
      .crossJoin(broadcast(byDay.agg(min("day").as("mnd"))))
      .select((col("day") - col("mnd")).cast(d18).as("x"),
        graft.queries.Relational.dfrac(col("sv"), col("n"), 0)
          .cast(d18).as("yus"))
    val ols = xy
      .agg(count(lit(1)).as("n_days"),
        sum(col("x")).cast("double").as("sx"),
        sum(col("yus")).cast("double").as("sy"),
        sum(col("x") * col("yus")).cast("double").as("sxy"),
        sum(col("x") * col("x")).cast("double").as("sxx"))
      .select(col("n_days"),
        ((col("n_days") * col("sxy") - col("sx") * col("sy")) /
          ((col("n_days") * col("sxx") - col("sx") * col("sx")) * 1e6))
          .as("ols_slope"))
    ols.crossJoin(broadcast(medianSlope))
      .select("n_days", "n_pairs", "ts_slope", "ols_slope")
  }

  val q261Sql: String =
    s"""WITH byday AS (SELECT epoch_us(ts) // 86400000000 AS day,
       |  COUNT(*) AS n,
       |  SUM(CAST(CAST(CAST(value AS DECIMAL(25,6)) * 1000000
       |    AS BIGINT) AS DECIMAL(38,0))) AS sv,
       |  CAST(SUM(CAST(CAST(CAST(value AS DECIMAL(25,6)) * 1000000
       |    AS BIGINT) AS DECIMAL(38,0))) AS DOUBLE) /
       |    (CAST(COUNT(*) AS DOUBLE) * 1e6) AS m
       |  FROM events GROUP BY 1),
       |sl AS (SELECT (b.m - a.m) / CAST(b.day - a.day AS DOUBLE) AS slope
       |  FROM byday a JOIN byday b ON a.day < b.day),
       |r AS (SELECT slope, ROW_NUMBER() OVER (ORDER BY slope) AS rn,
       |  COUNT(*) OVER () AS np FROM sl),
       |med AS (SELECT slope AS ts_slope, CAST(np AS BIGINT) AS n_pairs
       |  FROM r WHERE rn = (np + 1) // 2),
       |mn AS (SELECT MIN(day) AS mnd FROM byday),
       |xy AS (SELECT CAST(day - mnd AS DECIMAL(18,0)) AS x,
       |  CAST(${graft.queries.Relational.DFRAC("sv", "n", 0)}
       |    AS DECIMAL(18,0)) AS yus
       |  FROM byday CROSS JOIN mn),
      |o AS (SELECT COUNT(*) AS n_days,
      |  CAST(SUM(x) AS DOUBLE) AS sx,
      |  CAST(SUM(yus) AS DOUBLE) AS sy,
      |  CAST(SUM(x * yus) AS DOUBLE) AS sxy,
      |  CAST(SUM(x * x) AS DOUBLE) AS sxx
      |  FROM xy)
      |SELECT o.n_days, med.n_pairs, med.ts_slope,
      |  (o.n_days * o.sxy - o.sx * o.sy) /
      |    ((o.n_days * o.sxx - o.sx * o.sx) * 1e6) AS ols_slope
      |FROM o CROSS JOIN med""".stripMargin

  // ------------------------------ q262 daily-count autocorrelation
  /** Lag-1..7 autocorrelation of the gap-filled daily event count —
    * the seasonality probe behind ingest-rate monitoring (a weekly
    * rhythm shows as a lag-7 peak; q221 detects level SHIFTS, this
    * detects PERIODICITY). Missing days enter as exact zeros via a
    * generated day spine, because skipping them silently shifts every
    * lag.
    *
    * Determinism: counts and the day spine are integers; the mean is
    * one IEEE division; every (dev·dev) product quantizes to
    * DECIMAL(25,6) before its sum (order-free); each ACF value is one
    * division of two such decimal-derived doubles.
    *
    * Scale: the corpus collapses to |days| rows in one shuffle; the
    * lag joins run on the bounded day spine with a broadcast 7-row
    * lag relation. */
  val AcfMaxLag = 7

  def q262DailyAcf(s: SparkSession, dir: String): DataFrame = {
    val byDay = events(s, dir)
      .select(expr("ts div 1000 div 86400000000").as("day"))
      .groupBy("day").agg(count(lit(1)).as("c"))
    val spine = byDay.agg(min("day").as("mnd"), max("day").as("mxd"))
      .select(explode(expr("sequence(mnd, mxd)")).as("day"))
    val series = spine.join(byDay, Seq("day"), "left")
      .select(col("day"), coalesce(col("c"), lit(0L)).as("c"))
    val stats = series.agg(count(lit(1)).as("nd"), sum("c").as("tot"))
    val dev = series.crossJoin(broadcast(stats))
      .withColumn("dev", col("c").cast("double") -
        col("tot").cast("double") / col("nd").cast("double"))
      .select("day", "dev")
    val denom = dev.agg(
      Relational.dsum(col("dev") * col("dev")).as("denom"))
    val lags = s.range(1, AcfMaxLag + 1).toDF("lag")
    val right = dev.select(col("day").as("day2"), col("dev").as("dev2"))
    dev.crossJoin(broadcast(lags))
      .withColumn("day2", col("day") + col("lag"))
      .join(right, Seq("day2"))
      .groupBy("lag")
      .agg(count(lit(1)).as("n_terms"),
        Relational.dsum(col("dev") * col("dev2")).as("num"))
      .crossJoin(broadcast(denom))
      .select(col("lag"), col("n_terms"),
        (col("num") / col("denom")).as("acf"))
      .orderBy("lag")
  }

  val q262Sql: String =
    s"""WITH bd AS (SELECT epoch_us(ts) // 86400000000 AS day,
       |  CAST(COUNT(*) AS BIGINT) AS c FROM events GROUP BY 1),
       |sp AS (SELECT MIN(day) AS mnd, MAX(day) AS mxd FROM bd),
       |alld AS (SELECT unnest(generate_series(mnd, mxd)) AS day FROM sp),
       |series AS (SELECT a.day, COALESCE(b.c, 0) AS c
       |  FROM alld a LEFT JOIN bd b USING (day)),
       |st AS (SELECT COUNT(*) AS nd, CAST(SUM(c) AS BIGINT) AS tot
       |  FROM series),
       |wd AS (SELECT day, CAST(c AS DOUBLE) -
       |  CAST(st.tot AS DOUBLE) / CAST(st.nd AS DOUBLE) AS dev
       |  FROM series CROSS JOIN st),
       |dn AS (SELECT CAST(SUM(CAST(dev * dev AS DECIMAL(25,6))) AS DOUBLE)
       |  AS denom FROM wd),
       |lg AS (SELECT unnest(generate_series(1, $AcfMaxLag)) AS lag),
       |pr AS (SELECT lg.lag, a.dev AS d1, b.dev AS d2
       |  FROM wd a CROSS JOIN lg JOIN wd b ON b.day = a.day + lg.lag)
       |SELECT pr.lag, CAST(COUNT(*) AS BIGINT) AS n_terms,
       |  CAST(SUM(CAST(d1 * d2 AS DECIMAL(25,6))) AS DOUBLE) / dn.denom
       |    AS acf
       |FROM pr CROSS JOIN dn GROUP BY pr.lag, dn.denom
       |ORDER BY pr.lag""".stripMargin

  // ----------------------------- q260 exponential-decay engagement
  /** Time-decayed per-user engagement score: each event contributes
    * 2^−k where k = how many half-lives before the corpus horizon it
    * happened — the freshness-weighted activity counter behind decay
    * rankings and churn features (q142's retention is cohort-bucketed;
    * this is the continuous-decay form, QUANTIZED to half-life steps
    * so it stays exact). The half-life is (range div 8) of the
    * observed time span, so the fixture exercises ~8 decay levels.
    *
    * Exactness: the decay ladder never touches libm pow — each weight
    * is the exact integer 2^(50−k) (one shiftleft; k clamped to 50,
    * older mass deterministically 0), summed in DECIMAL(38,0) and
    * divided by 2^50 once at the end: one IEEE rounding, identical in
    * both engines. The memory-bank rule "1/2^k terms are exact" made
    * load-bearing.
    *
    * Scale: scan-local weight assignment (broadcast one-row horizon),
    * one map-side-combined per-user aggregation — the shape survives
    * any corpus size; the horizon/span one-row aggregate is the only
    * non-linear piece. */
  val DecayMaxK = 50
  val DecayScale = 1L << DecayMaxK

  def q260DecayScore(s: SparkSession, dir: String): DataFrame = {
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val e = events(s, dir).select(col("user_id"), expr("ts div 1000").as("us"))
    val hor = e.agg(min("us").as("mn"), max("us").as("mx"))
      .select(col("mx"), greatest(expr("(mx - mn) div 8"), lit(1L)).as("hl"))
    e.crossJoin(broadcast(hor))
      .withColumn("k",
        least(expr("(mx - us) div hl"), lit(DecayMaxK.toLong)))
      .withColumn("w",
        expr(s"shiftleft(CAST(1 AS BIGINT), $DecayMaxK - CAST(k AS INT))"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        (sum(col("w").cast(dec38)).cast("double") /
          lit(DecayScale.toDouble)).as("decayed_score"))
      .orderBy("user_id")
  }

  val q260Sql: String =
    s"""WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events),
       |h AS (SELECT MAX(us) AS mx,
       |  greatest((MAX(us) - MIN(us)) // 8, 1) AS hl FROM e),
       |w AS (SELECT e.user_id,
       |  (CAST(1 AS BIGINT) << ($DecayMaxK -
       |    CAST(least((h.mx - e.us) // h.hl, $DecayMaxK) AS INT))) AS w
       |  FROM e CROSS JOIN h)
       |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
       |  CAST(SUM(CAST(w AS DECIMAL(38,0))) AS DOUBLE) /
       |    CAST($DecayScale AS DOUBLE) AS decayed_score
       |FROM w GROUP BY 1 ORDER BY user_id""".stripMargin

  // --------------------------- q257 incremental aggregate maintenance
  /** Materialized-view refresh by DELTA MERGE: split the event log at
    * a time cutoff (first 80% of the time range = the "already
    * materialized" base, the rest = the newly arrived delta), compute
    * each side's partial aggregate independently, and MERGE them with
    * a full-outer coalesce-add — the incremental-view-maintenance
    * shape that refreshes a 100 TB aggregate by touching ONLY the new
    * partition (q44/q104/q208 maintain pipelines incrementally; this
    * is the engine-level additive-aggregate merge itself). The oracle
    * recomputes the same aggregate in one pass — the equality IS the
    * IVM correctness statement (counts and decimal sums are the
    * canonical self-maintainable aggregates).
    *
    * Determinism: the cutoff is integer µs arithmetic
    * (mn + (mx − mn)·4 div 5); per-side sums are exact
    * DECIMAL(25,6) — decimal addition is associative, so
    * base ⊕ delta is bit-equal to the one-pass sum.
    *
    * Scale: two map-side-combined partial aggregates (each reading
    * only its time slice — at scale, partition pruning makes the base
    * read free because it is already materialized) and one
    * |event_types|-row full-outer merge. */
  def q257IncrementalAgg(s: SparkSession, dir: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(25, 6)
    val e = events(s, dir).select(col("event_type"),
      expr("ts div 1000").as("us"),
      col("value").cast(dec).as("v"))
    val cut = e.agg(min("us").as("mn"), max("us").as("mx"))
      .select(expr("mn + (mx - mn) * 4 div 5").as("cut"))
    val tagged = e.crossJoin(broadcast(cut))
    val zero = lit(0).cast(org.apache.spark.sql.types.DecimalType(35, 6))
    val base = tagged.filter(col("us") < col("cut")).groupBy("event_type")
      .agg(count(lit(1)).as("n_base"), sum("v").as("s_base"))
    val delta = tagged.filter(col("us") >= col("cut")).groupBy("event_type")
      .agg(count(lit(1)).as("n_delta"), sum("v").as("s_delta"))
    base.join(delta, Seq("event_type"), "full_outer")
      .select(col("event_type"),
        coalesce(col("n_base"), lit(0L)).as("n_base"),
        coalesce(col("n_delta"), lit(0L)).as("n_delta"),
        (coalesce(col("n_base"), lit(0L)) + coalesce(col("n_delta"), lit(0L)))
          .as("n_events"),
        (coalesce(col("s_base"), zero) + coalesce(col("s_delta"), zero))
          .cast("double").as("total_value"))
      .orderBy("event_type")
  }

  val q257Sql: String =
    """WITH e AS (SELECT event_type, epoch_us(ts) AS us,
      |  CAST(value AS DECIMAL(25,6)) AS v FROM events),
      |mm AS (SELECT MIN(us) AS mn, MAX(us) AS mx FROM e),
      |tagged AS (SELECT e.*, mm.mn + (mm.mx - mm.mn) * 4 // 5 AS cut
      |  FROM e CROSS JOIN mm),
      |b AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_base,
      |  SUM(v) AS s_base FROM tagged WHERE us < cut GROUP BY 1),
      |d AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_delta,
      |  SUM(v) AS s_delta FROM tagged WHERE us >= cut GROUP BY 1)
      |SELECT event_type,
      |  COALESCE(b.n_base, 0) AS n_base,
      |  COALESCE(d.n_delta, 0) AS n_delta,
      |  COALESCE(b.n_base, 0) + COALESCE(d.n_delta, 0) AS n_events,
      |  CAST(COALESCE(b.s_base, 0) + COALESCE(d.s_delta, 0) AS DOUBLE)
      |    AS total_value
      |FROM b FULL OUTER JOIN d USING (event_type)
      |ORDER BY event_type""".stripMargin

  // ------------------------------------ q249 MAD robust outlier gate
  /** Median-absolute-deviation outlier gate — the ROBUST counterpart
    * of q71's z-score (a mean/σ gate moves when the outliers it hunts
    * contaminate the stats; median/MAD has a 50% breakdown point):
    * per event type, the modified z-score |0.6745·(x − median)/MAD|
    * flags values beyond 3.5 (Iglewicz–Hoaglin). Both medians are the
    * EXACT lower medians via q223's two-phase histogram-refinement
    * selection — the plan that never globally sorts — applied twice
    * (values, then absolute deviations).
    *
    * Exactness: the outlier predicate is evaluated ENTIRELY in
    * integers — |z| > 3.5 over micro-unit values is
    * `6745·|x_us − med_us| > 35000·mad_us` (both sides < 2^63 for any
    * |value| < ~10^8) — so the decision boundary cannot diverge
    * between engines even by one ulp; degenerate MAD = 0 (over half
    * the values identical) deterministically flags nothing. */
  val MadZCut = 3.5

  /** Exact lower median (micro-units) per event_type via the q223
    * two-phase plan: histogram locate + single-bin sort. */
  private def exactMedianUs(e: DataFrame, out: String): DataFrame = {
    val span = e.groupBy("event_type").agg(count(lit(1)).as("n"),
      min("qv").as("mn"), max("qv").as("mx"))
      .withColumn("k", expr("(n + 1) div 2"))
    val binned = e.join(broadcast(span), "event_type")
      .withColumn("bin", expr(
        s"((qv - mn) * $MedianBins) div (mx - mn + 1)"))
    val hist = binned.groupBy("event_type", "k", "bin")
      .agg(count(lit(1)).as("bc"))
    val wcum = Window.partitionBy("event_type").orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, -1)
    val target = hist
      .withColumn("cum_before", coalesce(sum("bc").over(wcum), lit(0L)))
      .filter(col("cum_before") < col("k") &&
        col("k") <= col("cum_before") + col("bc"))
      .select(col("event_type"), col("bin"),
        (col("k") - col("cum_before")).as("kk"))
    val win = Window.partitionBy("event_type").orderBy("qv")
    binned.select("event_type", "bin", "qv")
      .join(broadcast(target), Seq("event_type", "bin"))
      .withColumn("rn", row_number().over(win))
      .filter(col("rn") === col("kk"))
      .select(col("event_type"), col("qv").as(out))
  }

  def q249MadGate(s: SparkSession, dir: String): DataFrame = {
    // |event_types|-row medians materialize to LOCAL relations (the
    // qKmeans pattern): the final gate otherwise re-embeds the whole
    // two-phase selection pipeline per reference, and the second
    // median would nest the first's plan inside its own — pure
    // fixed-cost replanning, zero data-scale benefit
    def localize(df: DataFrame): DataFrame = {
      val rows = df.collect()
      s.createDataFrame(s.sparkContext.parallelize(rows.toIndexedSeq, 1),
        df.schema)
    }
    val e = events(s, dir).select(col("event_type"),
      expr("CAST(CAST(value AS DECIMAL(25,6)) * 1000000 AS BIGINT)")
        .as("qv"))
    val med = localize(exactMedianUs(e, "med_us"))
    val dev = e.join(broadcast(med), "event_type")
      .select(col("event_type"), abs(col("qv") - col("med_us")).as("qv"))
    val mad = localize(exactMedianUs(dev, "mad_us"))
    e.join(broadcast(med), "event_type")
      .join(broadcast(mad), "event_type")
      .groupBy(col("event_type"), col("med_us"), col("mad_us"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("mad_us") > 0L &&
          abs(col("qv") - col("med_us")) * 6745L > lit(35000L) * col("mad_us"),
          1L).otherwise(0L)).as("n_outliers"))
      .select(col("event_type"), col("n"),
        (col("med_us").cast("double") / 1e6).as("median"),
        (col("mad_us").cast("double") / 1e6).as("mad"),
        col("n_outliers"),
        (col("n_outliers").cast("double") / col("n").cast("double"))
          .as("outlier_frac"))
      .orderBy("event_type")
  }

  val q249Sql: String =
    """WITH e AS (SELECT event_type,
      |  CAST(CAST(value AS DECIMAL(25,6)) * 1000000 AS BIGINT) AS qv
      |  FROM events),
      |med AS (SELECT event_type, qv AS med_us FROM
      |  (SELECT event_type, qv, ROW_NUMBER() OVER (PARTITION BY event_type
      |     ORDER BY qv) AS rn, COUNT(*) OVER (PARTITION BY event_type) AS n
      |   FROM e) WHERE rn = (n + 1) // 2),
      |dev AS (SELECT e.event_type, abs(e.qv - m.med_us) AS dv
      |  FROM e JOIN med m USING (event_type)),
      |mad AS (SELECT event_type, dv AS mad_us FROM
      |  (SELECT event_type, dv, ROW_NUMBER() OVER (PARTITION BY event_type
      |     ORDER BY dv) AS rn, COUNT(*) OVER (PARTITION BY event_type) AS n
      |   FROM dev) WHERE rn = (n + 1) // 2)
      |SELECT e.event_type, COUNT(*) AS n,
      |  CAST(m.med_us AS DOUBLE) / 1000000.0 AS median,
      |  CAST(d.mad_us AS DOUBLE) / 1000000.0 AS mad,
      |  CAST(SUM(CASE WHEN d.mad_us > 0 AND
      |    abs(e.qv - m.med_us) * 6745 > 35000 * d.mad_us
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
      |  CAST(SUM(CASE WHEN d.mad_us > 0 AND
      |    abs(e.qv - m.med_us) * 6745 > 35000 * d.mad_us
      |    THEN 1 ELSE 0 END) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
      |    AS outlier_frac
      |FROM e JOIN med m USING (event_type) JOIN mad d USING (event_type)
      |GROUP BY 1, 3, 4 ORDER BY 1""".stripMargin

  // --------------------------------------- q227 Gini / Lorenz activity
  /** Gini coefficient + Lorenz curve of per-user event activity — the
    * concentration audit behind "is this corpus a long tail or a few
    * whales": a training mix dominated by a handful of users (or
    * domains) inherits their biases and their PII risk, and the
    * rebalancing ops (q105/q176/q196) need this number to decide
    * whether to act. Emits one row per DISTINCT activity level (the
    * grouped Lorenz curve: cumulative user share vs cumulative event
    * share) with the corpus Gini replicated per row.
    *
    * Exactness: Gini over grouped data — for a block of `n_u` users
    * with equal activity `c` spanning sorted ranks `(N0, N0+n_u]`,
    * `Σ rank·x = c·(n_u·N0 + n_u(n_u+1)/2)` exactly; blocks sum in
    * DECIMAL(38,0) (overflow-safe past int64 corpora) and
    * `G = (2·Σ rank·x − (n+1)·T) / (n·T)` divides to double once.
    * Ties carry no ambiguity: equal values are interchangeable under
    * every rank assignment, so the grouped form IS the exact Gini.
    *
    * Scale: one user_id shuffle (map-side-combined count), one tiny
    * shuffle to activity levels (distinct-activity-bounded — hundreds
    * of rows, not users), and the prefix windows run over THAT
    * relation; no corpus-sized global sort, which is what makes the
    * grouped formula the 100 TB plan (the textbook per-item
    * `row_number` form is a full sort of all users). */
  def q227GiniActivity(s: SparkSession, dir: String): DataFrame = {
    val u = events(s, dir).groupBy("user_id").agg(count(lit(1)).as("c"))
    val lv = u.groupBy("c").agg(count(lit(1)).as("n_users"))
    val wc = Window.orderBy("c")
      .rowsBetween(Window.unboundedPreceding, -1)
    val blocks = lv
      .withColumn("cum_before", coalesce(sum("n_users").over(wc), lit(0L)))
      .withColumn("cum_users", col("cum_before") + col("n_users"))
      .withColumn("ev", expr("CAST(c AS DECIMAL(38,0)) * n_users"))
      .withColumn("rx", expr(
        """CAST(c AS DECIMAL(38,0)) * (CAST(n_users AS DECIMAL(38,0)) *
          |cum_before + (CAST(n_users AS DECIMAL(38,0)) * (n_users + 1))
          |/ 2)""".stripMargin))
    val tot = blocks.agg(sum("n_users").as("n"), sum("ev").as("t"),
      sum("rx").as("srx"))
    val wev = Window.orderBy("c")
      .rowsBetween(Window.unboundedPreceding, 0)
    blocks
      .withColumn("cum_events", sum("ev").over(wev))
      .crossJoin(broadcast(tot))
      .select(col("c").as("events_per_user"), col("n_users"),
        col("cum_users"),
        col("cum_events").cast("decimal(38,0)").cast("long")
          .as("cum_events"),
        expr("CAST(cum_users AS DOUBLE) / CAST(n AS DOUBLE)")
          .as("pop_share"),
        expr("CAST(cum_events AS DOUBLE) / CAST(t AS DOUBLE)")
          .as("lorenz_share"),
        expr("""CAST((2 * srx - (CAST(n AS DECIMAL(38,0)) + 1) * t)
          |AS DOUBLE) / CAST(CAST(n AS DECIMAL(38,0)) * t AS DOUBLE)"""
          .stripMargin).as("gini"))
      .orderBy("events_per_user")
  }

  val q227Sql: String =
    """WITH u AS (SELECT user_id, COUNT(*) AS c FROM events GROUP BY 1),
      |lv AS (SELECT c, COUNT(*) AS n_users FROM u GROUP BY 1),
      |b AS (SELECT c, n_users,
      |  COALESCE(CAST(SUM(n_users) OVER (ORDER BY c
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
      |    AS cum_before,
      |  CAST(c AS HUGEINT) * n_users AS ev
      |  FROM lv),
      |bb AS (SELECT *, cum_before + n_users AS cum_users,
      |  CAST(c AS HUGEINT) * (CAST(n_users AS HUGEINT) * cum_before +
      |    (CAST(n_users AS HUGEINT) * (n_users + 1)) // 2) AS rx,
      |  SUM(ev) OVER (ORDER BY c
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_events
      |  FROM b),
      |tot AS (SELECT CAST(SUM(n_users) AS BIGINT) AS n, SUM(ev) AS t,
      |  SUM(rx) AS srx FROM bb)
      |SELECT c AS events_per_user, n_users, cum_users,
      |  CAST(cum_events AS BIGINT) AS cum_events,
      |  CAST(cum_users AS DOUBLE) / CAST(n AS DOUBLE) AS pop_share,
      |  CAST(cum_events AS DOUBLE) / CAST(t AS DOUBLE) AS lorenz_share,
      |  CAST(2 * srx - (CAST(n AS HUGEINT) + 1) * t AS DOUBLE) /
      |    CAST(CAST(n AS HUGEINT) * t AS DOUBLE) AS gini
      |FROM bb CROSS JOIN tot ORDER BY events_per_user""".stripMargin

  // --------------------------------------- q240 join-skew pre-flight
  /** Shuffle-skew pre-flight report over the join keys this engine
    * actually shuffles on — the measurement q19's salted join and
    * AQE's skew thresholds consume, produced BEFORE the join runs: per
    * (relation, key): row count, key cardinality, the hottest key's
    * row count, the skew factor `max/avg`, and the integer salt
    * factor `ceil(max/avg)` that would flatten the hottest partition
    * to average. A 1000-executor shuffle lives or dies on this number;
    * computing it is one map-side-combined count per key column.
    *
    * Exactness: everything through the salt recommendation is integer
    * (`ceil(max·n_keys/n_rows)` as `(max·n_keys + n_rows − 1) div
    * n_rows`, DECIMAL-lifted product); avg and skew are single double
    * divisions of exact integers. */
  def q240SkewPreflight(s: SparkSession, dir: String): DataFrame = {
    def audit(df: DataFrame, rel: String, key: String): DataFrame =
      df.groupBy(col(key).cast("string").as("k"))
        .agg(count(lit(1)).as("c"))
        .agg(sum("c").as("n_rows"), count(lit(1)).as("n_keys"),
          max("c").as("max_per_key"))
        .select(lit(rel).as("relation"), lit(key).as("key"),
          col("n_rows"), col("n_keys"), col("max_per_key"))
    val ev = events(s, dir)
    val docs = Tables.load(s, dir, "documents")
    audit(ev, "events", "user_id")
      .unionAll(audit(ev, "events", "event_type"))
      .unionAll(audit(docs, "documents", "source"))
      .withColumn("avg_per_key",
        col("n_rows").cast("double") / col("n_keys").cast("double"))
      .withColumn("skew_factor",
        col("max_per_key").cast("double") / (col("n_rows").cast("double") /
          col("n_keys").cast("double")))
      .withColumn("salt_factor", expr(
        """CAST((CAST(max_per_key AS DECIMAL(38,0)) * n_keys + n_rows - 1)
          |div n_rows AS BIGINT)""".stripMargin))
      .orderBy("relation", "key")
  }

  val q240Sql: String = {
    def audit(tbl: String, key: String) =
      s"""SELECT '$tbl' AS relation, '$key' AS key,
         |  CAST(SUM(c) AS BIGINT) AS n_rows, COUNT(*) AS n_keys,
         |  CAST(MAX(c) AS BIGINT) AS max_per_key
         |FROM (SELECT CAST($key AS VARCHAR) AS k, COUNT(*) AS c
         |      FROM $tbl GROUP BY 1)""".stripMargin
    s"""WITH u AS (${audit("events", "user_id")}
       |UNION ALL ${audit("events", "event_type")}
       |UNION ALL ${audit("documents", "source")})
       |SELECT relation, key, n_rows, n_keys, max_per_key,
       |  CAST(n_rows AS DOUBLE) / CAST(n_keys AS DOUBLE) AS avg_per_key,
       |  CAST(max_per_key AS DOUBLE) /
       |    (CAST(n_rows AS DOUBLE) / CAST(n_keys AS DOUBLE))
       |    AS skew_factor,
       |  CAST((CAST(max_per_key AS HUGEINT) * n_keys + n_rows - 1)
       |    // n_rows AS BIGINT) AS salt_factor
       |FROM u ORDER BY relation, key""".stripMargin
  }

  // ------------------------------------------- q241 Benford audit
  /** Benford first-significant-digit audit of the event value column —
    * the forensic screen for fabricated or unit-mangled numeric feeds
    * (naturally-arising multiplicative data follows
    * `P(d) = log10(1+1/d)`; synthetic, truncated, or unit-shifted
    * feeds don't, and the chi-square against Benford flags them
    * before they pollute a metric): per digit 1–9 the observed count
    * and share beside the Benford expectation, plus the chi-square
    * statistic. The fixture's wide-ranged values land chi² ≈ 8 —
    * consistent with Benford at the 0.05 level — which is itself the
    * informative answer; a truncated or unit-shifted feed lands in
    * the hundreds.
    *
    * Determinism: the first significant digit comes from the FIXED
    * 6-dp DECIMAL string (both engines render scale-6 decimals
    * identically) via the same `[1-9]` regexp — no libm log10 digit
    * math to diverge at powers of ten; Benford expectations are
    * build-time literals embedded in both dialects; chi-square terms
    * quantize through DECIMAL(25,6) before the exact sum.
    *
    * Scale: scan-local digit extraction + one 9-bucket map-side-
    * combined count; everything after is 9 rows. */
  private lazy val benfordP: IndexedSeq[Double] =
    (1 to 9).map(d => math.log10(1.0 + 1.0 / d))

  def q241Benford(s: SparkSession, dir: String): DataFrame = {
    val digits = events(s, dir)
      .select(expr(
        """regexp_extract(CAST(abs(CAST(value AS DECIMAL(25,6)))
          |AS STRING), '[1-9]', 0)""".stripMargin).as("ds"))
      .filter(col("ds") =!= "")
      .select(col("ds").cast("long").as("digit"))
    val grid = s.range(1, 10).select(col("id").as("digit"))
    val obs = grid.join(
        digits.groupBy("digit").agg(count(lit(1)).as("n_obs")),
        Seq("digit"), "left")
      .withColumn("n_obs", coalesce(col("n_obs"), lit(0L)))
      .crossJoin(broadcast(digits.agg(count(lit(1)).as("n"))))
    val expCase = benfordP.zipWithIndex.foldLeft(lit(0.0)) {
      case (acc, (p, i)) => when(col("digit") === (i + 1), lit(p))
        .otherwise(acc)
    }
    val scored = obs.withColumn("exp_frac", expCase)
      .withColumn("obs_frac",
        col("n_obs").cast("double") / col("n").cast("double"))
      .withColumn("chi_term", expr(
        """CAST((CAST(n_obs AS DOUBLE) - n * exp_frac) *
          |(CAST(n_obs AS DOUBLE) - n * exp_frac) / (n * exp_frac)
          |AS DECIMAL(25,6))""".stripMargin))
    val chi = scored.agg(sum("chi_term").as("chi_d"))
      .select(expr("CAST(chi_d AS DOUBLE)").as("chi2"))
    scored.crossJoin(broadcast(chi))
      .select(col("digit"), col("n_obs"), col("obs_frac"),
        col("exp_frac"), col("chi2"))
      .orderBy("digit")
  }

  val q241Sql: String = {
    // CAST('…' AS DOUBLE), not a bare literal: DuckDB types bare
    // decimal literals as DECIMAL and the re-cast can land one ulp off
    // the Scala double Spark gets via lit(p)
    val expCase = benfordP.zipWithIndex
      .map { case (p, i) => s"WHEN digit = ${i + 1} THEN CAST('$p' AS DOUBLE)" }
      .mkString("CASE ", " ", " ELSE CAST(0 AS DOUBLE) END")
    s"""WITH d AS (SELECT CAST(regexp_extract(
       |    CAST(abs(CAST(value AS DECIMAL(25,6))) AS VARCHAR),
       |    '[1-9]', 0) AS BIGINT) AS digit
       |  FROM events
       |  WHERE regexp_extract(CAST(abs(CAST(value AS DECIMAL(25,6)))
       |    AS VARCHAR), '[1-9]', 0) <> ''),
       |tot AS (SELECT COUNT(*) AS n FROM d),
       |obs AS (SELECT g.range AS digit, COALESCE(o.n_obs, 0) AS n_obs,
       |  tot.n
       |  FROM range(1, 10) g
       |  LEFT JOIN (SELECT digit, COUNT(*) AS n_obs FROM d GROUP BY 1) o
       |    ON g.range = o.digit CROSS JOIN tot),
       |sc AS (SELECT digit, n_obs, n,
       |  CAST(n_obs AS DOUBLE) / CAST(n AS DOUBLE) AS obs_frac,
       |  CAST($expCase AS DOUBLE) AS exp_frac
       |  FROM obs),
       |terms AS (SELECT *,
       |  CAST((CAST(n_obs AS DOUBLE) - n * exp_frac) *
       |    (CAST(n_obs AS DOUBLE) - n * exp_frac) / (n * exp_frac)
       |    AS DECIMAL(25,6)) AS chi_term
       |  FROM sc),
       |chi AS (SELECT CAST(SUM(chi_term) AS DOUBLE) AS chi2 FROM terms)
       |SELECT digit, n_obs, obs_frac, exp_frac, chi2
       |FROM terms CROSS JOIN chi ORDER BY digit""".stripMargin
  }

  // ------------------------------------------------------------ wiring
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q241_benford" -> (q241Benford _),
    "q240_skew_preflight" -> (q240SkewPreflight _),
    "q227_gini_activity" -> (q227GiniActivity _),
    "q223_exact_median" -> (q223ExactMedian _),
    "q249_mad_gate" -> (q249MadGate _),
    "q257_incremental_agg" -> (q257IncrementalAgg _),
    "q260_decay_score" -> (q260DecayScore _),
    "q261_theil_sen" -> (q261TheilSen _),
    "q262_daily_acf" -> (q262DailyAcf _),
    "q264_churn_labels" -> (q264ChurnLabels _),
    "q265_burstiness" -> (q265Burstiness _),
    "q267_assoc_rules" -> (q267AssocRules _),
    "q221_cusum_changepoint" -> (q221CusumChangepoint _),
    "q182_episode_dedup" -> (q182EpisodeDedup _),
    "q180_transitions" -> (q180Transitions _),
    "q178_rank_funcs" -> (q178RankFuncs _),
    "q179_pearson_drift" -> (q179PearsonDrift _),
    "q175_mad_outliers" -> (q175MadOutliers _),
    "q108_trailing_window" -> (q108TrailingWindow _),
    "q110_winsorize" -> (q110Winsorize _),
    "q90_histogram" -> (q90Histogram _),
    "q87_gap_fill" -> (q87GapFill _),
    "q85_approx_distinct" -> (q85ApproxDistinct _),
    "q84_topk_pruned" -> (q84TopkPruned _),
    "q67_sessionize" -> (q67Sessionize _),
    "q69_quantiles" -> (q69Quantiles _),
    "q71_outlier_z" -> (q71OutlierZscore _),
    "q72_heavy_hitters" -> (q72HeavyHitters _),
    "q73_json_extract" -> (q73JsonExtract _),
    "q124_variant" -> (q124Variant _),
    "q138_sliding_window" -> (q138SlidingWindow _),
    "q139_minmax_norm" -> (q139MinmaxNorm _),
    "q140_equidepth_bins" -> (q140EquidepthBins _),
    "q142_retention" -> (q142Retention _),
    "q143_drift_audit" -> (q143DriftAudit _),
    "q146_cooccurrence" -> (q146Cooccurrence _))

  val oracles: Map[String, String] = Map(
    "q241_benford" -> q241Sql,
    "q240_skew_preflight" -> q240Sql,
    "q227_gini_activity" -> q227Sql,
    "q221_cusum_changepoint" -> q221Sql,
    "q223_exact_median" -> q223Sql,
    "q249_mad_gate" -> q249Sql,
    "q257_incremental_agg" -> q257Sql,
    "q260_decay_score" -> q260Sql,
    "q261_theil_sen" -> q261Sql,
    "q262_daily_acf" -> q262Sql,
    "q264_churn_labels" -> q264Sql,
    "q265_burstiness" -> q265Sql,
    "q267_assoc_rules" -> q267Sql,
    "q85_approx_distinct" -> q85Sql,
    "q182_episode_dedup" -> q182Sql,
    "q180_transitions" -> q180Sql,
    "q178_rank_funcs" -> q178Sql,
    "q179_pearson_drift" -> q179Sql,
    "q175_mad_outliers" -> q175Sql,
    "q108_trailing_window" -> q108Sql,
    "q110_winsorize" -> q110Sql,
    "q90_histogram" -> q90Sql,
    "q87_gap_fill" -> q87Sql,
    "q84_topk_pruned" -> q84Sql,
    "q67_sessionize" -> q67Sql,
    "q69_quantiles" -> q69Sql,
    "q71_outlier_z" -> q71Sql,
    "q72_heavy_hitters" -> q72Sql,
    "q73_json_extract" -> q73Sql,
    "q124_variant" -> q124Sql,
    "q138_sliding_window" -> q138Sql,
    "q139_minmax_norm" -> q139Sql,
    "q140_equidepth_bins" -> q140Sql,
    "q142_retention" -> q142Sql,
    "q143_drift_audit" -> q143Sql,
    "q146_cooccurrence" -> q146Sql)
}
