package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.Tables
import graft.queries.Relational.{dsum, DSUM}

/** TPC-H completion battery (q149–q166): the 18 TPC-H queries not
  * already on the surface (Q1/Q3/Q5/Q14 live in [[Relational]] as
  * q17/q18/q45/q46), adapted to the driver's reduced star schema
  * (TESTDATA.md has no `partsupp`, no `l_commitdate`/`l_receiptdate`/
  * `l_shipmode`, no `c_phone`/`p_container`). Where a query needs a
  * missing table/column the adaptation is documented per query; the
  * SHAPE of each plan (join graph, correlation pattern, agg structure)
  * is preserved, which is what makes the suite a useful scale sentinel:
  * together the 22 queries exercise every TPC-H plan pattern —
  * min-per-group over a bridge, EXISTS/NOT EXISTS, scalar subqueries,
  * correlated averages, anti-join "no orders", OR-of-conjuncts
  * pushdown, group-HAVING semi chains.
  *
  * Scale notes (100 TB contract), uniform across the battery:
  *  - dimension tables (`part`, `supplier`, `customer`, `nation`,
  *    `region`) broadcast — the only shuffles are on fact keys;
  *  - the supplier↔part bridge (TPC-H's `partsupp` stand-in) is
  *    `lineitem.select(l_partkey, l_suppkey).distinct()` — one shuffle,
  *    map-side combined, output ~|partsupp| ≪ |lineitem|;
  *  - correlated subqueries become window functions over the SAME
  *    partition key the surrounding join already shuffles on (Q17), or
  *    broadcast one-row aggregates (Q11/Q15/Q22) — never a re-scan per
  *    outer row;
  *  - double aggregates route through DECIMAL(25,6) ([[Relational.dsum]])
  *    so partial-agg order can't change bits; ratios divide the two
  *    exact doubles (IEEE division is deterministic in both engines).
  *
  * Reference provenance: the reference engine has no relational query
  * surface (it is a full-table exporter — `HBaseReader.kt` scan →
  * transform → S3 sink), so this battery is graft's own extension
  * per the build brief ("the query and data-processing capabilities a
  * user would need"), oracle-checked like everything else.
  */
object TpchSuite {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Cast the literal, not the column (keeps parquet pushdown). */
  private def tsL(df: DataFrame, colName: String, v: String): Column =
    lit(v).cast(df.schema(colName).dataType)

  /** The `partsupp` stand-in: observed supplier↔part relationships.
    * One distinct-shuffle over the two int keys; everything downstream
    * joins this ~|partsupp|-sized bridge, not raw lineitem. */
  private def bridge(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem").select(col("l_partkey"), col("l_suppkey")).distinct()

  private val bridgeSql =
    "(SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)"

  // ------------------------------------------------------------- q149
  // TPC-H Q2 (minimum-cost supplier, adapted): for EUROPE suppliers of
  // size-25 LARGE parts, pick per part the best supplier — no
  // ps_supplycost, so "best" = max s_acctbal (tie: min s_suppkey).
  // Plan: bridge distinct + broadcast dims + row_number over the
  // part key. The window partitions on p_partkey, which the bridge
  // join already co-locates — no extra shuffle at scale.
  def q149TpchQ2(s: SparkSession, dir: String): DataFrame = {
    val b = bridge(s, dir)
    val p = t(s, dir, "part")
      .filter(col("p_size") === 25 && col("p_type") === "LARGE")
    val su = t(s, dir, "supplier")
    val n = t(s, dir, "nation")
    val r = t(s, dir, "region").filter(col("r_name") === "EUROPE")
    val rn = row_number().over(
      Window.partitionBy(col("p_partkey"))
        .orderBy(col("s_acctbal").desc, col("s_suppkey")))
    b.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(broadcast(su), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"),
        col("p_partkey"), col("p_brand"), col("s_suppkey"))
      .withColumn("rn", rn)
      .filter(col("rn") === 1).drop("rn", "s_suppkey")
      .orderBy(col("s_acctbal").desc, col("p_partkey"))
      .limit(20)
  }

  val q149Sql: String =
    s"""SELECT s_acctbal, s_name, n_name, p_partkey, p_brand FROM (
       |SELECT s_acctbal, s_name, n_name, p_partkey, p_brand,
       |row_number() OVER (PARTITION BY p_partkey
       |ORDER BY s_acctbal DESC, s_suppkey) AS rn
       |FROM $bridgeSql b
       |JOIN part ON p_partkey = l_partkey
       |JOIN supplier ON s_suppkey = l_suppkey
       |JOIN nation ON s_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |WHERE p_size = 25 AND p_type = 'LARGE' AND r_name = 'EUROPE')
       |WHERE rn = 1 ORDER BY s_acctbal DESC, p_partkey LIMIT 20""".stripMargin

  // ------------------------------------------------------------- q150
  // TPC-H Q4 (order priority checking): orders in 1997Q1 with at least
  // one lineitem shipped after the order date (the late-commit EXISTS,
  // adapted to the available dates). EXISTS = left-semi join on the
  // order key with the non-equi ship-date predicate; counts per
  // priority. At scale: one fact⋈fact semi shuffle, then a 5-group agg.
  def q150TpchQ4(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val li = t(s, dir, "lineitem")
    o.filter(col("o_orderdate") >= tsL(o, "o_orderdate", "1997-01-01") &&
        col("o_orderdate") < tsL(o, "o_orderdate", "1997-04-01"))
      .join(li, col("o_orderkey") === col("l_orderkey") &&
        col("l_shipdate") > col("o_orderdate"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  val q150Sql: String =
    """SELECT o_orderpriority, COUNT(*) AS order_count FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      |AND o_orderdate < TIMESTAMP '1997-04-01'
      |AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey
      |AND l_shipdate > o_orderdate)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // ------------------------------------------------------------- q151
  // TPC-H Q6 (forecasting revenue change): pure scan-side conjunctive
  // filter + one global agg — the pushdown sentinel of the suite
  // (every predicate reaches the parquet scan; zero shuffles besides
  // the final single-row agg).
  def q151TpchQ6(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    li.filter(col("l_shipdate") >= tsL(li, "l_shipdate", "1996-01-01") &&
        col("l_shipdate") < tsL(li, "l_shipdate", "1997-01-01") &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(dsum(col("l_extendedprice") * col("l_discount")).as("revenue"),
        count(lit(1)).as("n_items"))
  }

  val q151Sql: String =
    s"""SELECT ${DSUM("l_extendedprice * l_discount")} AS revenue,
       |COUNT(*) AS n_items FROM lineitem
       |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
       |AND l_shipdate < TIMESTAMP '1997-01-01'
       |AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin

  // ------------------------------------------------------------- q152
  // TPC-H Q7 (volume shipping): bilateral trade NATION_1 ↔ NATION_2 by
  // ship year. Two broadcast dimension chains hang off the one
  // lineitem⋈orders shuffle; the nation-pair disjunction prunes early
  // (applied to the broadcast-joined nation names before the agg).
  def q152TpchQ7(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val o = t(s, dir, "orders")
    val c = t(s, dir, "customer")
    val su = t(s, dir, "supplier")
    val n1 = t(s, dir, "nation").select(
      col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    val n2 = t(s, dir, "nation").select(
      col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
    li.filter(col("l_shipdate") >= tsL(li, "l_shipdate", "1996-01-01") &&
        col("l_shipdate") < tsL(li, "l_shipdate", "1998-01-01"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(su), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
      .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
      .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
              (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
        .as("revenue"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  val q152Sql: String =
    s"""SELECT supp_nation, cust_nation, l_year,
       |${DSUM("volume")} AS revenue FROM (
       |SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       |CAST(year(l_shipdate) AS INT) AS l_year,
       |l_extendedprice * (1 - l_discount) AS volume
       |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN supplier ON l_suppkey = s_suppkey
       |JOIN nation sn ON s_nationkey = sn.n_nationkey
       |JOIN nation cn ON c_nationkey = cn.n_nationkey
       |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
       |AND l_shipdate < TIMESTAMP '1998-01-01'
       |AND ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
       |  OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1')))
       |GROUP BY supp_nation, cust_nation, l_year
       |ORDER BY supp_nation, cust_nation, l_year""".stripMargin

  // ------------------------------------------------------------- q153
  // TPC-H Q8 (national market share): NATION_3's share of ECONOMY-part
  // revenue sold to ASIA customers, by order year. The share divides
  // two DECIMAL-exact sums as doubles (IEEE-deterministic in both
  // engines); the conditional numerator is a when() inside the same agg.
  def q153TpchQ8(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val o = t(s, dir, "orders")
    val c = t(s, dir, "customer")
    val su = t(s, dir, "supplier")
    val p = t(s, dir, "part").filter(col("p_type") === "ECONOMY")
    val n1 = t(s, dir, "nation").select(
      col("n_nationkey").as("c_nk"), col("n_regionkey"))
    val r = t(s, dir, "region").filter(col("r_name") === "ASIA")
    val n2 = t(s, dir, "nation").select(
      col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    val vol = col("l_extendedprice") * (lit(1) - col("l_discount"))
    li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(o.filter(
        col("o_orderdate") >= tsL(o, "o_orderdate", "1996-01-01") &&
        col("o_orderdate") < tsL(o, "o_orderdate", "1998-01-01")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n1), col("c_nationkey") === col("c_nk"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .join(broadcast(su), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n2), col("s_nationkey") === col("s_nk"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg((dsum(when(col("supp_nation") === "NATION_3", vol).otherwise(0.0)) /
        dsum(vol)).as("mkt_share"))
      .orderBy(col("o_year"))
  }

  val q153Sql: String =
    s"""SELECT o_year,
       |${DSUM("CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0.0 END")} /
       |${DSUM("volume")} AS mkt_share FROM (
       |SELECT CAST(year(o_orderdate) AS INT) AS o_year,
       |l_extendedprice * (1 - l_discount) AS volume,
       |sn.n_name AS supp_nation
       |FROM lineitem JOIN part ON l_partkey = p_partkey
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation cn ON c_nationkey = cn.n_nationkey
       |JOIN region ON cn.n_regionkey = r_regionkey
       |JOIN supplier ON l_suppkey = s_suppkey
       |JOIN nation sn ON s_nationkey = sn.n_nationkey
       |WHERE p_type = 'ECONOMY' AND r_name = 'ASIA'
       |AND o_orderdate >= TIMESTAMP '1996-01-01'
       |AND o_orderdate < TIMESTAMP '1998-01-01')
       |GROUP BY o_year ORDER BY o_year""".stripMargin

  // ------------------------------------------------------------- q154
  // TPC-H Q9 (product type profit, adapted): profit per supplier nation
  // per order year over parts named '%widget%'. No ps_supplycost, so
  // cost = 0.6 * p_retailprice * l_quantity (fixed-margin proxy —
  // keeps the profit expression a join of part attrs with lineitem
  // quantities, which is the plan shape Q9 exists to test).
  def q154TpchQ9(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val o = t(s, dir, "orders")
    val su = t(s, dir, "supplier")
    val p = t(s, dir, "part").filter(col("p_name").contains("widget"))
    val n = t(s, dir, "nation")
    val amount = col("l_extendedprice") * (lit(1) - col("l_discount")) -
      lit(0.6) * col("p_retailprice") * col("l_quantity")
    li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(su), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"))
      .agg(dsum(amount).as("sum_profit"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  val q154Sql: String =
    s"""SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
       |${DSUM("l_extendedprice * (1 - l_discount) - 0.6 * p_retailprice * l_quantity")} AS sum_profit
       |FROM lineitem JOIN part ON l_partkey = p_partkey
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN supplier ON l_suppkey = s_suppkey
       |JOIN nation ON s_nationkey = n_nationkey
       |WHERE p_name LIKE '%widget%'
       |GROUP BY n_name, o_year ORDER BY nation, o_year DESC""".stripMargin

  // ------------------------------------------------------------- q155
  // TPC-H Q10 (returned item reporting): top-20 customers by returned
  // revenue in 1996Q4. The limit plans TakeOrderedAndProject over the
  // grouped result — never a global sort of all customers.
  def q155TpchQ10(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
    val o = t(s, dir, "orders")
    val c = t(s, dir, "customer")
    val n = t(s, dir, "nation")
    li.join(o.filter(
        col("o_orderdate") >= tsL(o, "o_orderdate", "1996-10-01") &&
        col("o_orderdate") < tsL(o, "o_orderdate", "1997-01-01")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
      .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
        .as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  val q155Sql: String =
    s"""SELECT c_custkey, c_name, c_acctbal, n_name,
       |${DSUM("l_extendedprice * (1 - l_discount)")} AS revenue
       |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation ON c_nationkey = n_nationkey
       |WHERE l_returnflag = 'R'
       |AND o_orderdate >= TIMESTAMP '1996-10-01'
       |AND o_orderdate < TIMESTAMP '1997-01-01'
       |GROUP BY c_custkey, c_name, c_acctbal, n_name
       |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin

  // ------------------------------------------------------------- q156
  // TPC-H Q11 (important stock, adapted): per-part shipped value
  // (l_quantity × p_retailprice) from NATION_5 suppliers; keep parts
  // whose value exceeds 0.1% of the total. The scalar subquery becomes
  // a broadcast one-row aggregate; the HAVING comparison stays in
  // DECIMAL on both sides (value × 1000 > total) — no double rounding
  // at the cut boundary.
  def q156TpchQ11(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val su = t(s, dir, "supplier")
    val n = t(s, dir, "nation").filter(col("n_name") === "NATION_5")
    val p = t(s, dir, "part")
    val dec = (col("l_quantity") * col("p_retailprice")).cast(DecimalType(25, 6))
    val perPart = li
      .join(broadcast(su), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_partkey"))
      .agg(sum(dec).as("value_dec"))
    val total = perPart.agg(sum(col("value_dec")).as("total_dec"))
    perPart.crossJoin(broadcast(total))
      .filter(col("value_dec") * 1000 > col("total_dec"))
      .select(col("p_partkey"), col("value_dec").cast(DoubleType).as("value"))
      .orderBy(col("value").desc, col("p_partkey"))
  }

  val q156Sql: String =
    """WITH pv AS (
      |SELECT p_partkey, SUM(CAST(l_quantity * p_retailprice AS DECIMAL(25,6))) AS value_dec
      |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN part ON l_partkey = p_partkey
      |WHERE n_name = 'NATION_5' GROUP BY p_partkey)
      |SELECT p_partkey, CAST(value_dec AS DOUBLE) AS value FROM pv
      |WHERE value_dec * 1000 > (SELECT SUM(value_dec) FROM pv)
      |ORDER BY value DESC, p_partkey""".stripMargin

  // ------------------------------------------------------------- q157
  // TPC-H Q12 (shipping modes, adapted): no l_shipmode, so the grouping
  // key is l_linestatus and "late" = shipped ≥ 30 days after the order
  // date; counts split high-priority (1-URGENT/2-HIGH) vs low. The
  // interval arithmetic happens join-side on the already-shuffled pair
  // — no extra pass.
  def q157TpchQ12(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val o = t(s, dir, "orders")
    val hi = col("o_orderpriority") === "1-URGENT" ||
      col("o_orderpriority") === "2-HIGH"
    li.filter(col("l_shipdate") >= tsL(li, "l_shipdate", "1996-01-01") &&
        col("l_shipdate") < tsL(li, "l_shipdate", "1997-01-01"))
      .join(o, col("l_orderkey") === col("o_orderkey") &&
        col("l_shipdate") >= col("o_orderdate") + expr("INTERVAL 30 DAYS"))
      .groupBy(col("l_linestatus"))
      .agg(count(when(hi, 1)).as("high_line_count"),
        count(when(!hi, 1)).as("low_line_count"))
      .orderBy(col("l_linestatus"))
  }

  val q157Sql: String =
    """SELECT l_linestatus,
      |COUNT(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 END) AS high_line_count,
      |COUNT(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 END) AS low_line_count
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |AND l_shipdate < TIMESTAMP '1997-01-01'
      |AND l_shipdate >= o_orderdate + INTERVAL 30 DAY
      |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin

  // ------------------------------------------------------------- q158
  // TPC-H Q13 (customer distribution): orders-per-customer histogram
  // including zero-order customers (left join, count of non-null
  // order keys), then a second agg over the counts. Two shuffles by
  // construction (custkey, then c_count) — the minimum for this shape.
  def q158TpchQ13(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders")
      .filter(col("o_orderpriority") =!= "4-NOT SPECIFIED")
    c.join(o, col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  val q158Sql: String =
    """SELECT c_count, COUNT(*) AS custdist FROM (
      |SELECT c_custkey, COUNT(o_orderkey) AS c_count
      |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |AND o_orderpriority <> '4-NOT SPECIFIED'
      |GROUP BY c_custkey)
      |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin

  // ------------------------------------------------------------- q159
  // TPC-H Q15 (top supplier): suppliers whose 1996Q1 revenue equals the
  // maximum. The scalar-subquery max broadcasts as a one-row aggregate;
  // equality compares the DECIMAL sums (exact), output converts to
  // double after the comparison.
  def q159TpchQ15(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val su = t(s, dir, "supplier")
    val dec = (col("l_extendedprice") * (lit(1) - col("l_discount")))
      .cast(DecimalType(25, 6))
    val rev = li
      .filter(col("l_shipdate") >= tsL(li, "l_shipdate", "1996-01-01") &&
        col("l_shipdate") < tsL(li, "l_shipdate", "1996-04-01"))
      .groupBy(col("l_suppkey"))
      .agg(sum(dec).as("rev_dec"))
    val mx = rev.agg(max(col("rev_dec")).as("max_dec"))
    rev.crossJoin(broadcast(mx))
      .filter(col("rev_dec") === col("max_dec"))
      .join(broadcast(su), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        col("rev_dec").cast(DoubleType).as("total_revenue"))
      .orderBy(col("s_suppkey"))
  }

  val q159Sql: String =
    """WITH rev AS (
      |SELECT l_suppkey, SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6))) AS rev_dec
      |FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |AND l_shipdate < TIMESTAMP '1996-04-01' GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, CAST(rev_dec AS DOUBLE) AS total_revenue
      |FROM rev JOIN supplier ON l_suppkey = s_suppkey
      |WHERE rev_dec = (SELECT MAX(rev_dec) FROM rev)
      |ORDER BY s_suppkey""".stripMargin

  // ------------------------------------------------------------- q160
  // TPC-H Q16 (parts/supplier relationship, adapted): distinct supplier
  // count per (brand, type, size) over the bridge, excluding one brand,
  // PROMO parts, and "complaint" suppliers (negative acctbal — the
  // c_comment LIKE stand-in), via NOT IN ≡ broadcast anti-join on the
  // tiny supplier dim.
  def q160TpchQ16(s: SparkSession, dir: String): DataFrame = {
    val b = bridge(s, dir)
    val p = t(s, dir, "part").filter(col("p_brand") =!= "Brand#13" &&
      !col("p_type").startsWith("PROMO") &&
      col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35))
    val bad = t(s, dir, "supplier").filter(col("s_acctbal") < 0)
      .select(col("s_suppkey"))
    b.join(broadcast(bad), col("l_suppkey") === col("s_suppkey"), "left_anti")
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
        col("p_size"))
  }

  val q160Sql: String =
    s"""SELECT p_brand, p_type, p_size,
       |COUNT(DISTINCT l_suppkey) AS supplier_cnt
       |FROM $bridgeSql b JOIN part ON p_partkey = l_partkey
       |WHERE p_brand <> 'Brand#13' AND p_type NOT LIKE 'PROMO%'
       |AND p_size IN (1,5,10,15,20,25,30,35)
       |AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
       |GROUP BY p_brand, p_type, p_size
       |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin

  // ------------------------------------------------------------- q161
  // TPC-H Q17 (small-quantity-order revenue): Brand#21 lineitems whose
  // quantity is below half the part's average. The correlated per-part
  // average becomes a window over l_partkey — computed on the SAME
  // shuffle the brand join restricts, not a second scan. The average
  // divides a DECIMAL sum by a count as doubles; the 0.5× threshold
  // comparison is then double-vs-double in both engines.
  def q161TpchQ17(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val p = t(s, dir, "part").filter(col("p_brand") === "Brand#21")
    val w = Window.partitionBy(col("l_partkey"))
    val avgQty = (sum(col("l_quantity").cast(DecimalType(25, 6))).over(w)
      .cast(DoubleType) / count(lit(1)).over(w))
    li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .withColumn("avg_qty", avgQty)
      .filter(col("l_quantity") < lit(0.5) * col("avg_qty"))
      .agg((dsum(col("l_extendedprice")) / 7.0).as("avg_yearly"),
        count(lit(1)).as("n_small"))
  }

  val q161Sql: String =
    s"""WITH j AS (
       |SELECT l_partkey, l_quantity, l_extendedprice,
       |CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) OVER (PARTITION BY l_partkey) AS DOUBLE)
       | / COUNT(*) OVER (PARTITION BY l_partkey) AS avg_qty
       |FROM lineitem JOIN part ON l_partkey = p_partkey
       |WHERE p_brand = 'Brand#21')
       |SELECT ${DSUM("l_extendedprice")} / 7.0 AS avg_yearly,
       |COUNT(*) AS n_small FROM j WHERE l_quantity < 0.5 * avg_qty""".stripMargin

  // ------------------------------------------------------------- q162
  // TPC-H Q18 (large volume customers): orders whose total quantity
  // exceeds 150. The HAVING runs on the grouped fact BEFORE the joins
  // (tiny survivor set), then broadcast-joins orders+customer.
  def q162TpchQ18(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val o = t(s, dir, "orders")
    val c = t(s, dir, "customer")
    val big = li.groupBy(col("l_orderkey"))
      .agg(dsum(col("l_quantity")).as("sum_qty"))
      .filter(col("sum_qty") > 150)
    big.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_date"),
        col("o_totalprice"), col("sum_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
  }

  val q162Sql: String =
    s"""SELECT c_name, c_custkey, o_orderkey,
       |strftime(o_orderdate, '%Y-%m-%d') AS o_date, o_totalprice, sum_qty
       |FROM (SELECT l_orderkey, ${DSUM("l_quantity")} AS sum_qty
       |FROM lineitem GROUP BY l_orderkey) g
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |WHERE sum_qty > 150
       |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin

  // ------------------------------------------------------------- q163
  // TPC-H Q19 (discounted revenue): OR of three (brand, size-range,
  // quantity-range) conjunct branches — the disjunctive-pushdown
  // sentinel (Catalyst pushes the common l_partkey join key and the
  // per-branch part predicates survive into the broadcast filter).
  def q163TpchQ19(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val p = t(s, dir, "part")
    val b1 = col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
      col("l_quantity").between(1, 11)
    val b2 = col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
      col("l_quantity").between(10, 20)
    val b3 = col("p_brand") === "Brand#34" && col("p_size").between(1, 15) &&
      col("l_quantity").between(20, 30)
    li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .filter(b1 || b2 || b3)
      .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
        .as("revenue"), count(lit(1)).as("n_items"))
  }

  val q163Sql: String =
    s"""SELECT ${DSUM("l_extendedprice * (1 - l_discount)")} AS revenue,
       |COUNT(*) AS n_items
       |FROM lineitem JOIN part ON l_partkey = p_partkey
       |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5 AND l_quantity BETWEEN 1 AND 11)
       |OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
       |OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)""".stripMargin

  // ------------------------------------------------------------- q164
  // TPC-H Q20 (potential part promotion, adapted): NATION_7 suppliers
  // who shipped >50 units of some PROMO part in 1997 (the 99th-pctile
  // of per-(supplier,part) volume on this corpus). The HAVING chain
  // reduces on (suppkey, partkey) first; the supplier semi-join
  // consumes only distinct survivor keys.
  def q164TpchQ20(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val p = t(s, dir, "part").filter(col("p_type") === "PROMO")
    val su = t(s, dir, "supplier")
    val n = t(s, dir, "nation").filter(col("n_name") === "NATION_7")
    val heavy = li
      .filter(col("l_shipdate") >= tsL(li, "l_shipdate", "1997-01-01") &&
        col("l_shipdate") < tsL(li, "l_shipdate", "1998-01-01"))
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_suppkey"), col("l_partkey"))
      .agg(sum(col("l_quantity").cast(DecimalType(25, 6))).as("qty_dec"))
      .filter(col("qty_dec") > 50)
      .select(col("l_suppkey")).distinct()
    su.join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(heavy, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select(col("s_name"), col("s_acctbal"))
      .orderBy(col("s_name"))
  }

  val q164Sql: String =
    """SELECT s_name, s_acctbal
      |FROM supplier JOIN nation ON s_nationkey = n_nationkey
      |WHERE n_name = 'NATION_7' AND s_suppkey IN (
      |SELECT l_suppkey FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE p_type = 'PROMO'
      |AND l_shipdate >= TIMESTAMP '1997-01-01'
      |AND l_shipdate < TIMESTAMP '1998-01-01'
      |GROUP BY l_suppkey, l_partkey
      |HAVING SUM(CAST(l_quantity AS DECIMAL(25,6))) > 50)
      |ORDER BY s_name""".stripMargin

  // ------------------------------------------------------------- q165
  // TPC-H Q21 (suppliers who kept orders waiting, adapted): NATION_9
  // suppliers late on a finished multi-supplier order (shipped ≥60 days
  // after the order date) where every OTHER supplier on the order was
  // on time — EXISTS(other supplier) ∧ NOT EXISTS(other late supplier),
  // i.e. a semi- and an anti-join, both on the order key with a
  // supplier-inequality residual. Pairs are made distinct first so the
  // count is per (order, supplier), deterministic under duplicates.
  def q165TpchQ21(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders").filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey"), col("o_orderdate"))
    val li = t(s, dir, "lineitem")
    val su = t(s, dir, "supplier")
    val n = t(s, dir, "nation").filter(col("n_name") === "NATION_9")
    val pairs = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"),
        (col("l_shipdate") >= col("o_orderdate") + expr("INTERVAL 60 DAYS"))
          .as("late"))
      .groupBy(col("ok"), col("sk"))
      .agg(max(col("late")).as("late"))
    val latePairs = pairs.filter(col("late"))
    val l2 = pairs.select(col("ok").as("ok2"), col("sk").as("sk2"))
    val l3 = latePairs.select(col("ok").as("ok3"), col("sk").as("sk3"))
    latePairs
      .join(su, col("sk") === col("s_suppkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(l2, col("ok") === col("ok2") && col("sk2") =!= col("sk"),
        "left_semi")
      .join(l3, col("ok") === col("ok3") && col("sk3") =!= col("sk"),
        "left_anti")
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(20)
  }

  val q165Sql: String =
    """WITH pairs AS (
      |SELECT l_orderkey AS ok, l_suppkey AS sk,
      |MAX(l_shipdate >= o_orderdate + INTERVAL 60 DAY) AS late
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE o_orderstatus = 'F' GROUP BY ok, sk)
      |SELECT s_name, COUNT(*) AS numwait
      |FROM pairs p1 JOIN supplier ON sk = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |WHERE n_name = 'NATION_9' AND p1.late
      |AND EXISTS (SELECT 1 FROM pairs p2 WHERE p2.ok = p1.ok AND p2.sk <> p1.sk)
      |AND NOT EXISTS (SELECT 1 FROM pairs p3 WHERE p3.ok = p1.ok
      |AND p3.sk <> p1.sk AND p3.late)
      |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin

  // ------------------------------------------------------------- q166
  // TPC-H Q22 (global sales opportunity, adapted): odd-nation customers
  // with above-average positive balances and no orders. No c_phone, so
  // "country code" = the nation key (odd subset). The global average
  // broadcasts as a one-row (count, sum) aggregate and the comparison
  // stays in DECIMAL (balance × n > total) — exact at the boundary;
  // "no orders" becomes "no orders in the last two data years" (every
  // customer on this corpus has SOME order), an anti-join on the
  // date-pruned order fact.
  def q166TpchQ22(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
      .filter(col("c_nationkey").isin(1, 3, 5, 7, 9, 11, 13))
    val oAll = t(s, dir, "orders")
    val o = oAll
      .filter(col("o_orderdate") >= tsL(oAll, "o_orderdate", "2000-01-01"))
      .select(col("o_custkey"))
    val pos = c.filter(col("c_acctbal") > 0.0)
      .agg(count(lit(1)).as("n_pos"),
        sum(col("c_acctbal").cast(DecimalType(25, 6))).as("sum_pos"))
    c.crossJoin(broadcast(pos))
      .filter(col("c_acctbal").cast(DecimalType(25, 6)) * col("n_pos") >
        col("sum_pos"))
      .join(o, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey").as("cntrycode"))
      .agg(count(lit(1)).as("numcust"), dsum(col("c_acctbal")).as("totacctbal"))
      .orderBy(col("cntrycode"))
  }

  val q166Sql: String =
    s"""WITH cs AS (SELECT * FROM customer
       |WHERE c_nationkey IN (1,3,5,7,9,11,13)),
       |avgc AS (SELECT COUNT(*) AS n_pos,
       |SUM(CAST(c_acctbal AS DECIMAL(25,6))) AS sum_pos
       |FROM cs WHERE c_acctbal > 0.0)
       |SELECT c_nationkey AS cntrycode, COUNT(*) AS numcust,
       |${DSUM("c_acctbal")} AS totacctbal
       |FROM cs, avgc
       |WHERE CAST(c_acctbal AS DECIMAL(25,6)) * n_pos > sum_pos
       |AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
       |AND o_orderdate >= TIMESTAMP '2000-01-01')
       |GROUP BY cntrycode ORDER BY cntrycode""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q149_tpch_q2" -> (q149TpchQ2 _),
    "q150_tpch_q4" -> (q150TpchQ4 _),
    "q151_tpch_q6" -> (q151TpchQ6 _),
    "q152_tpch_q7" -> (q152TpchQ7 _),
    "q153_tpch_q8" -> (q153TpchQ8 _),
    "q154_tpch_q9" -> (q154TpchQ9 _),
    "q155_tpch_q10" -> (q155TpchQ10 _),
    "q156_tpch_q11" -> (q156TpchQ11 _),
    "q157_tpch_q12" -> (q157TpchQ12 _),
    "q158_tpch_q13" -> (q158TpchQ13 _),
    "q159_tpch_q15" -> (q159TpchQ15 _),
    "q160_tpch_q16" -> (q160TpchQ16 _),
    "q161_tpch_q17" -> (q161TpchQ17 _),
    "q162_tpch_q18" -> (q162TpchQ18 _),
    "q163_tpch_q19" -> (q163TpchQ19 _),
    "q164_tpch_q20" -> (q164TpchQ20 _),
    "q165_tpch_q21" -> (q165TpchQ21 _),
    "q166_tpch_q22" -> (q166TpchQ22 _))

  val oracles: Map[String, String] = Map(
    "q149_tpch_q2" -> q149Sql,
    "q150_tpch_q4" -> q150Sql,
    "q151_tpch_q6" -> q151Sql,
    "q152_tpch_q7" -> q152Sql,
    "q153_tpch_q8" -> q153Sql,
    "q154_tpch_q9" -> q154Sql,
    "q155_tpch_q10" -> q155Sql,
    "q156_tpch_q11" -> q156Sql,
    "q157_tpch_q12" -> q157Sql,
    "q158_tpch_q13" -> q158Sql,
    "q159_tpch_q15" -> q159Sql,
    "q160_tpch_q16" -> q160Sql,
    "q161_tpch_q17" -> q161Sql,
    "q162_tpch_q18" -> q162Sql,
    "q163_tpch_q19" -> q163Sql,
    "q164_tpch_q20" -> q164Sql,
    "q165_tpch_q21" -> q165Sql,
    "q166_tpch_q22" -> q166Sql)
}
