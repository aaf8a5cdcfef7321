package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

import graft.core.Tables

/** Data-lifecycle integrity operators: CDC merge (upsert-apply), a
  * declarative data-quality audit, an exact edit-distance-1 fuzzy
  * self-join, and exact Spearman rank correlation.
  *
  * Scale notes (100 TB):
  *  - q115's merge is ONE full-outer hash join between the base table
  *    and the (much smaller) deduplicated change set; latest-change-
  *    wins is a window over the change set only, never the base. At
  *    warehouse scale the change side is typically < 1% of base, so
  *    AQE broadcasts it and the base never shuffles.
  *  - q116's checks are map-side-combined conditional counts (one
  *    scan per table) plus NOT-EXISTS anti-joins whose key sides are
  *    dimension-sized → broadcast; nothing wide ever shuffles.
  *  - q120 is the deletion-neighborhood trick (SymSpell): a word of
  *    length L expands to L+1 variant keys, so the candidate join is
  *    a hash equi-join on variants — |vocab|·avg_len keys total —
  *    instead of the |vocab|² cross product; `levenshtein` verifies
  *    survivors. Deletion neighborhoods of radius 1 intersect IFF
  *    edit distance ≤ 1, so the join is exact, not approximate.
  *  - q122 shuffles once on the group key; both rank windows sort
  *    locally inside that partitioning, and rho comes from exact
  *    integer aggregates through single correctly-rounded IEEE
  *    divides — bit-identical across engines (no libm).
  */
object Integrity {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  // ------------------------------------------------------ q115 merge
  /** CDC merge / upsert-apply: a deterministic change feed (inserts,
    * updates with a later-wins sequence, deletes) derived from
    * `orders` is applied to the base table — the MERGE INTO primitive
    * every mutable-source ingest needs (the reference's incremental
    * export ships the change feed; this operator is the consumer
    * side). Change rows: key%10==1 gets TWO updates (seq 2 wins),
    * %10==3 one update, %10==2 a delete, %10==7 an insert under a
    * fresh key. All price arithmetic stays DECIMAL so applied values
    * are bit-stable across engines. */
  def q115CdcMerge(s: SparkSession, dir: String): DataFrame = {
    val dec = DecimalType(26, 6)
    val ord = t(s, dir, "orders").select(
      col("o_orderkey").as("k"),
      col("o_totalprice").cast(DecimalType(25, 6)).as("bp"),
      col("o_orderstatus").as("bs"))
    def change(filterMod: Int, seq: Int, op: String,
        nPrice: DataFrame => org.apache.spark.sql.Column,
        nStatus: String, keyShift: Long = 0L): DataFrame = {
      val src = ord.filter(col("k") % 10 === filterMod)
      src.select((col("k") + keyShift).as("k"), lit(seq).as("seq"),
        lit(op).as("op"), nPrice(src).cast(dec).as("np"),
        (if (nStatus == null) lit(null).cast("string") else lit(nStatus)).as("ns"))
    }
    val changes =
      change(1, 1, "U", _ => col("bp") + lit(BigDecimal("100.50")), "X")
        .union(change(1, 2, "U", _ => col("bp") + lit(BigDecimal("200.25")), "Y"))
        .union(change(3, 1, "U", _ => col("bp") + lit(BigDecimal("100.50")), "X"))
        .union(change(2, 1, "D", _ => lit(null).cast(dec), null))
        .union(change(7, 1, "I", _ => lit(BigDecimal("1000.99")), "N",
          keyShift = 100000000L))
    val latest = changes
      .withColumn("rn", row_number().over(
        Window.partitionBy("k").orderBy(col("seq").desc)))
      .filter(col("rn") === 1).drop("rn")
    ord.join(latest, Seq("k"), "full_outer")
      .filter(coalesce(col("op"), lit("")) =!= "D")
      .select(col("k").as("o_orderkey"),
        coalesce(col("np"), col("bp")).cast(DoubleType).as("price"),
        coalesce(col("ns"), col("bs")).as("status"))
      .orderBy("o_orderkey")
  }

  val q115Sql: String =
    """WITH base AS (SELECT o_orderkey AS k,
      |  CAST(o_totalprice AS DECIMAL(25,6)) AS bp, o_orderstatus AS bs FROM orders),
      |ch AS (
      |  SELECT k, 1 AS seq, 'U' AS op, CAST(bp + 100.50 AS DECIMAL(26,6)) AS np,
      |    'X' AS ns FROM base WHERE k % 10 = 1
      |  UNION ALL SELECT k, 2, 'U', CAST(bp + 200.25 AS DECIMAL(26,6)), 'Y'
      |    FROM base WHERE k % 10 = 1
      |  UNION ALL SELECT k, 1, 'U', CAST(bp + 100.50 AS DECIMAL(26,6)), 'X'
      |    FROM base WHERE k % 10 = 3
      |  UNION ALL SELECT k, 1, 'D', CAST(NULL AS DECIMAL(26,6)), CAST(NULL AS VARCHAR)
      |    FROM base WHERE k % 10 = 2
      |  UNION ALL SELECT k + 100000000, 1, 'I', CAST(1000.99 AS DECIMAL(26,6)), 'N'
      |    FROM base WHERE k % 10 = 7),
      |latest AS (SELECT * FROM (SELECT *, row_number() OVER
      |  (PARTITION BY k ORDER BY seq DESC) AS rn FROM ch) WHERE rn = 1)
      |SELECT COALESCE(b.k, c.k) AS o_orderkey,
      |  CAST(COALESCE(c.np, b.bp) AS DOUBLE) AS price,
      |  COALESCE(c.ns, b.bs) AS status
      |FROM base b FULL OUTER JOIN latest c ON b.k = c.k
      |WHERE COALESCE(c.op, '') <> 'D' ORDER BY o_orderkey""".stripMargin

  // ------------------------------------------------------ q116 audit
  /** Declarative data-quality audit (the Deequ/expectations pattern):
    * each constraint yields one (check, violations) row — primary-key
    * uniqueness, referential integrity, mandatory-field nulls, value
    * ranges, empty documents. Violation COUNTS (not violating rows)
    * so the output is bounded by the checklist, never the data. */
  def q116QualityAudit(s: SparkSession, dir: String): DataFrame = {
    val orders = t(s, dir, "orders")
    val customer = t(s, dir, "customer")
    val lineitem = t(s, dir, "lineitem")
    val events = t(s, dir, "events")
    val docs = t(s, dir, "documents")
    def row(name: String, d: DataFrame): DataFrame =
      d.select(lit(name).as("check"), col("violations").cast("long"))
    val pkDup = orders.groupBy("o_orderkey").agg(count(lit(1)).as("c"))
      .filter(col("c") > 1).agg(count(lit(1)).as("violations"))
    val fkCust = orders.join(customer,
        orders("o_custkey") === customer("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("violations"))
    val fkOrd = lineitem.join(orders,
        lineitem("l_orderkey") === orders("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("violations"))
    val qtyRange = lineitem
      .agg(sum(when(col("l_quantity") < 1 || col("l_quantity") > 50, 1L)
        .otherwise(0L)).as("violations"))
    val evNull = events
      .agg(sum(when(col("user_id").isNull || col("event_type").isNull, 1L)
        .otherwise(0L)).as("violations"))
    val docEmpty = docs
      .agg(sum(when(length(col("text")) === 0, 1L).otherwise(0L))
        .as("violations"))
    row("documents_empty_text", docEmpty)
      .union(row("events_null_mandatory", evNull))
      .union(row("lineitem_fk_orders", fkOrd))
      .union(row("lineitem_qty_range", qtyRange))
      .union(row("orders_fk_customer", fkCust))
      .union(row("orders_pk_dup", pkDup))
      .orderBy("check")
  }

  val q116Sql: String =
    """SELECT 'documents_empty_text' AS check, CAST(
      |  (SELECT COALESCE(SUM(CASE WHEN length(text) = 0 THEN 1 ELSE 0 END), 0)
      |   FROM documents) AS BIGINT) AS violations
      |UNION ALL SELECT 'events_null_mandatory', CAST(
      |  (SELECT COALESCE(SUM(CASE WHEN user_id IS NULL OR event_type IS NULL
      |   THEN 1 ELSE 0 END), 0) FROM events) AS BIGINT)
      |UNION ALL SELECT 'lineitem_fk_orders', CAST(
      |  (SELECT COUNT(*) FROM lineitem l WHERE NOT EXISTS
      |   (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)) AS BIGINT)
      |UNION ALL SELECT 'lineitem_qty_range', CAST(
      |  (SELECT COALESCE(SUM(CASE WHEN l_quantity < 1 OR l_quantity > 50
      |   THEN 1 ELSE 0 END), 0) FROM lineitem) AS BIGINT)
      |UNION ALL SELECT 'orders_fk_customer', CAST(
      |  (SELECT COUNT(*) FROM orders o WHERE NOT EXISTS
      |   (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)) AS BIGINT)
      |UNION ALL SELECT 'orders_pk_dup', CAST(
      |  (SELECT COUNT(*) FROM (SELECT o_orderkey FROM orders
      |   GROUP BY 1 HAVING COUNT(*) > 1)) AS BIGINT)
      |ORDER BY "check"""".stripMargin

  // ------------------------------------------------- q120 fuzzy join
  /** Exact edit-distance-1 fuzzy self-join over the document token
    * vocabulary — the typo-clustering/entity-blocking primitive. The
    * deletion-neighborhood expansion makes it a hash equi-join (see
    * the object scaladoc); the DuckDB twin is the brute-force
    * quadratic join with the same predicates, so the oracle proves
    * the expansion loses nothing. Bounded to lengths 3..12 (shorter
    * words near-dup everything; the bound is a caller policy, not a
    * correctness device). */
  val FuzzyMinLen = 3
  val FuzzyMaxLen = 12

  def q120FuzzyJoin(s: SparkSession, dir: String): DataFrame = {
    val vocab = t(s, dir, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .union(t(s, dir, "part")
        .select(explode(split(col("p_name"), " ")).as("w")))
      .filter(length(col("w")).between(FuzzyMinLen, FuzzyMaxLen))
      .distinct()
    // w itself + each single-deletion variant: radius-1 neighborhoods
    // intersect iff levenshtein <= 1 (identity covered by `w` itself).
    val keyed = vocab.select(col("w"), explode(expr(
      "array_union(array(w), transform(sequence(0, length(w) - 1), " +
        "i -> concat(substring(w, 1, i), substring(w, i + 2))))")).as("v"))
    keyed.as("a").join(keyed.as("b"),
        col("a.v") === col("b.v") && col("a.w") < col("b.w"))
      .select(col("a.w").as("w1"), col("b.w").as("w2"))
      .distinct()
      .filter(levenshtein(col("w1"), col("w2")) <= 1)
      .orderBy("w1", "w2")
  }

  val q120Sql: String =
    s"""WITH tok AS (
       |  SELECT DISTINCT w FROM (
       |    SELECT unnest(string_split(text, ' ')) AS w FROM documents
       |    UNION SELECT unnest(string_split(p_name, ' ')) FROM part)),
       |v AS (SELECT w FROM tok
       |  WHERE length(w) BETWEEN $FuzzyMinLen AND $FuzzyMaxLen)
       |SELECT a.w AS w1, b.w AS w2 FROM v a JOIN v b
       |  ON a.w < b.w AND abs(length(a.w) - length(b.w)) <= 1
       |  AND levenshtein(a.w, b.w) <= 1
       |ORDER BY w1, w2""".stripMargin

  // -------------------------------------------------- q122 spearman
  /** Exact Spearman rank correlation of `value` vs event time per
    * event_type — the monotone-association check a feature pipeline
    * runs before trusting a drift metric. Ranks are `row_number` with
    * a total order (value/ts, then event_id), so both engines agree
    * on every rank; rho = 1 − 6Σd²/(n(n²−1)) from exact integer
    * aggregates through one mul + one divide in doubles (correctly
    * rounded, engine-independent). */
  def q122Spearman(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
      .filter(col("value").isNotNull)
      .select(col("event_type"), col("event_id"),
        expr("ts div 1000").as("ts_us"), col("value"))
    val wv = Window.partitionBy("event_type").orderBy(col("value"), col("event_id"))
    val wt = Window.partitionBy("event_type").orderBy(col("ts_us"), col("event_id"))
    // ranks go LONG before the square: Int d² overflows at |d| ≥ 46341
    // (ANSI throw or silent wrap depending on mode); the d² sum routes
    // through DECIMAL(38,0) (long sums overflow near n ≈ 2×10⁶ per
    // group — sd2 ≤ n³). sd2 is emitted as BIGINT, exact to n ≈ 2M
    // rows/group; beyond that emit the decimal itself. The rho
    // denominator is computed IN DOUBLES in both dialects (single
    // correctly-rounded ops) — n³ as integer would overflow BIGINT at
    // n ≥ 2,097,152.
    e.withColumn("rx", row_number().over(wv).cast("long"))
      .withColumn("ry", row_number().over(wt).cast("long"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(((col("rx") - col("ry")) * (col("rx") - col("ry")))
          .cast(DecimalType(38, 0))).as("sd2d"))
      .select(col("event_type"), col("n"),
        col("sd2d").cast("long").as("sd2"),
        (lit(1.0) - lit(6.0) * col("sd2d").cast(DoubleType) /
          (col("n").cast(DoubleType) *
            (col("n").cast(DoubleType) * col("n").cast(DoubleType) - 1)))
          .as("rho"))
      .orderBy("event_type")
  }

  val q122Sql: String =
    """WITH e AS (SELECT event_type, event_id, epoch_us(ts) AS ts_us, value
      |  FROM events WHERE value IS NOT NULL),
      |r AS (SELECT event_type,
      |  row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rx,
      |  row_number() OVER (PARTITION BY event_type ORDER BY ts_us, event_id) AS ry
      |  FROM e),
      |a AS (SELECT event_type, COUNT(*) AS n,
      |  CAST(SUM((rx - ry) * (rx - ry)) AS BIGINT) AS sd2 FROM r GROUP BY 1)
      |SELECT event_type, n, sd2,
      |  1.0 - 6.0 * CAST(sd2 AS DOUBLE) /
      |    (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) - 1)) AS rho
      |FROM a ORDER BY event_type""".stripMargin

  // -------------------------------------------------- q129 table diff
  /** Snapshot diff / anti-entropy reconciliation: compare two versions
    * of a table and emit every difference typed `added` / `removed` /
    * `changed` — the audit that validates an incremental export or a
    * CDC apply (q115) actually converged, and the first debugging tool
    * when two pipelines disagree. The "new" version is derived
    * deterministically from `orders` (key%7==0 re-priced, %7==1
    * dropped, fresh keys inserted), so the oracle can rebuild both
    * sides. ONE full-outer hash join on the key; the value comparison
    * is DECIMAL-exact. At 100 TB both sides shuffle once on the key —
    * or zero times if both snapshots are bucket-layouted (q24) — and
    * the diff output is change-sized, not table-sized. */
  def q129TableDiff(s: SparkSession, dir: String): DataFrame = {
    val dec = DecimalType(25, 6)
    val old = t(s, dir, "orders").select(col("o_orderkey").as("k"),
      col("o_totalprice").cast(dec).as("old_price"),
      col("o_orderstatus").as("old_status"))
    // the "new" version derives from `old` (one definition, one story —
    // the q115 shape), not a second independent scan
    val base = old.select(col("k"), col("old_price").as("p"),
      col("old_status").as("st"))
    val newV = base.filter(col("k") % 7 =!= 1)
      .select(col("k"),
        when(col("k") % 7 === 0, col("p") + lit(BigDecimal("50.25")))
          .otherwise(col("p")).as("new_price"),
        col("st").as("new_status"))
      .union(base.filter(col("k") % 7 === 2)
        .select((col("k") + 200000000L).as("k"),
          lit(BigDecimal("999.99")).cast(dec).as("new_price"),
          lit("A").as("new_status")))
    old.join(newV, Seq("k"), "full_outer")
      .withColumn("change_type",
        when(col("old_price").isNull, lit("added"))
          .when(col("new_price").isNull, lit("removed"))
          .when(col("old_price") =!= col("new_price") ||
            col("old_status") =!= col("new_status"), lit("changed")))
      .filter(col("change_type").isNotNull)
      .select(col("k").as("o_orderkey"), col("change_type"),
        col("old_price").cast(DoubleType).as("old_price"),
        col("new_price").cast(DoubleType).as("new_price"))
      .orderBy("o_orderkey")
  }

  val q129Sql: String =
    """WITH old AS (SELECT o_orderkey AS k,
      |  CAST(o_totalprice AS DECIMAL(25,6)) AS old_price,
      |  o_orderstatus AS old_status FROM orders),
      |newv AS (
      |  SELECT k,
      |    CASE WHEN k % 7 = 0 THEN CAST(old_price + 50.25 AS DECIMAL(25,6))
      |         ELSE old_price END AS new_price,
      |    old_status AS new_status
      |  FROM old WHERE k % 7 <> 1
      |  UNION ALL
      |  SELECT k + 200000000, CAST(999.99 AS DECIMAL(25,6)), 'A'
      |  FROM old WHERE k % 7 = 2),
      |d AS (
      |  SELECT COALESCE(o.k, n.k) AS o_orderkey,
      |    CASE WHEN o.old_price IS NULL THEN 'added'
      |         WHEN n.new_price IS NULL THEN 'removed'
      |         WHEN o.old_price <> n.new_price
      |           OR o.old_status <> n.new_status THEN 'changed'
      |    END AS change_type,
      |    CAST(o.old_price AS DOUBLE) AS old_price,
      |    CAST(n.new_price AS DOUBLE) AS new_price
      |  FROM old o FULL OUTER JOIN newv n ON o.k = n.k)
      |SELECT * FROM d WHERE change_type IS NOT NULL
      |ORDER BY o_orderkey""".stripMargin

  // -------------------------------------- q187 sorted neighborhood
  /** Sorted-neighborhood record-linkage blocking (Hernández &
    * Stolfo's merge/purge method — the classic alternative to LSH for
    * near-dup candidate generation): sort each language's documents by
    * a sort key (the text's 24-char prefix), then compare each record
    * only against its `SnmWindow` predecessors in sort order, verifying
    * survivors with an exact `levenshtein` over the prefixes. A
    * near-dup pair whose texts share a long prefix lands adjacent in
    * the sort regardless of corpus size, so candidate volume is
    * O(N·w) — never quadratic.
    *
    * Determinism: the sort key order is pinned to (pfx, doc_id) — both
    * engines order strings by binary codepoint, and the id tiebreak
    * makes ranks unique, so rank distance (and thus the candidate set)
    * is identical. `levenshtein` is exact integer DP in both engines.
    *
    * Scale: rank is a per-lang window — the single shuffle. A corpus
    * whose lang partitions are themselves huge range-partitions on the
    * sort key and runs the same window per range (the standard SNM
    * sharding); the window width w is a constant, so the candidate
    * join ships N·w narrow rows. The predecessor probe is generated by
    * a w-element `sequence` explode — no self-cross on rank. */
  val SnmWindow = 3
  val SnmPrefixLen = 24
  val SnmMaxLev = 3

  def q187SortedNeighborhood(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents").select(col("doc_id"), col("lang"),
      substring(col("text"), 1, SnmPrefixLen).as("pfx"))
    val w = Window.partitionBy("lang").orderBy(col("pfx"), col("doc_id"))
    val r = d.withColumn("rn", row_number().over(w).cast("long"))
    val probe = r.select(col("lang"), col("doc_id").as("d2"),
      col("pfx").as("p2"),
      explode(expr(s"sequence(rn - $SnmWindow, rn - 1)")).as("rn"))
      .filter(col("rn") >= 1L)
    r.join(probe, Seq("lang", "rn"))
      .withColumn("lev", levenshtein(col("pfx"), col("p2")))
      .filter(col("lev") <= SnmMaxLev)
      .select(col("lang"), col("doc_id").as("d1"), col("d2"), col("lev"))
      .orderBy("lang", "d1", "d2")
  }

  val q187Sql: String =
    s"""WITH r AS (SELECT doc_id, lang,
       |  substr(text, 1, $SnmPrefixLen) AS pfx,
       |  ROW_NUMBER() OVER (PARTITION BY lang
       |    ORDER BY substr(text, 1, $SnmPrefixLen), doc_id) AS rn
       |  FROM documents)
       |SELECT a.lang AS lang, a.doc_id AS d1, b.doc_id AS d2,
       |  levenshtein(a.pfx, b.pfx) AS lev
       |FROM r a JOIN r b ON a.lang = b.lang
       |  AND b.rn - a.rn BETWEEN 1 AND $SnmWindow
       |WHERE levenshtein(a.pfx, b.pfx) <= $SnmMaxLev
       |ORDER BY 1, d1, d2""".stripMargin

  // ------------------------------------------------------------ wiring
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q187_sorted_neighborhood" -> (q187SortedNeighborhood _),
    "q115_cdc_merge" -> (q115CdcMerge _),
    "q116_quality_audit" -> (q116QualityAudit _),
    "q120_fuzzy_join" -> (q120FuzzyJoin _),
    "q122_spearman" -> (q122Spearman _),
    "q129_table_diff" -> (q129TableDiff _))

  val oracles: Map[String, String] = Map(
    "q187_sorted_neighborhood" -> q187Sql,
    "q115_cdc_merge" -> q115Sql,
    "q116_quality_audit" -> q116Sql,
    "q120_fuzzy_join" -> q120Sql,
    "q122_spearman" -> q122Sql,
    "q129_table_diff" -> q129Sql)
}
