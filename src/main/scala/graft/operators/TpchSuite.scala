package graft.operators

import graft.{OSQL, U}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The rest of the TPC-H suite (Q1/Q3/Q5/Q7/Q18 live in
  * [[Aggregations]]/[[SqlText]]), adapted to the fixture subset of the
  * TPC-H schema (FIXTURES.md: no partsupp table; lineitem carries no
  * shipmode/commitdate/receiptdate; customer no phone). Where a column is
  * missing the query keeps the ORIGINAL plan shape and swaps the predicate
  * to an existing column:
  *
  *  - Q2/Q11/Q16/Q20: partsupp is emulated as the DISTINCT
  *    (l_partkey, l_suppkey) pairs observed in lineitem — same join
  *    topology, derived instead of stored.
  *  - Q4/Q12/Q21: "late" = l_shipdate > o_orderdate + lag, replacing the
  *    commit/receipt-date comparison.
  *  - Q12 groups by l_linestatus (no l_shipmode); Q22 keys on c_nationkey
  *    (no phone country code) and scopes the NOT EXISTS to recent orders
  *    (every fixture customer has SOME order).
  *
  * Every text is dialect-portable: the IDENTICAL string runs on Spark and
  * on the DuckDB oracle, with money math in the exact integer-cents domain
  * ([[OSQL.cents]]) so partial-aggregation order cannot skew doubles.
  * These queries are the planner's stress suite at 100 TB: snowflake join
  * reordering + dim broadcasts (Q8/Q9), EXISTS/NOT EXISTS decorrelation
  * into semi/anti joins (Q4/Q21/Q22), correlated scalar aggregates
  * (Q2/Q17), CTE reuse (Q11/Q15), and OR-of-ANDs pushdown (Q19).
  */
object TpchSuite {

  private val rev =
    s"CAST(SUM(${OSQL.cents("l_extendedprice")} * " +
      s"(100 - ${OSQL.cents("l_discount")})) AS DOUBLE) / 10000.0"

  /** Q2: min-acctbal supplier per STANDARD/size-15 part in ASIA, over the
    * emulated supply relation; correlated MIN subquery like the original's
    * min supplycost. */
  private val q2 =
    "WITH supply AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) " +
      "SELECT s_acctbal, s_name, n_name, p_partkey, p_name " +
      "FROM part JOIN supply ON p_partkey = l_partkey " +
      "JOIN supplier ON s_suppkey = l_suppkey " +
      "JOIN nation ON s_nationkey = n_nationkey " +
      "JOIN region ON n_regionkey = r_regionkey " +
      "WHERE p_size = 15 AND p_type = 'STANDARD' AND r_name = 'ASIA' " +
      "AND s_acctbal = (SELECT MIN(s2.s_acctbal) FROM supply sp2 " +
      "JOIN supplier s2 ON s2.s_suppkey = sp2.l_suppkey " +
      "JOIN nation nx ON s2.s_nationkey = nx.n_nationkey " +
      "JOIN region rx ON nx.n_regionkey = rx.r_regionkey " +
      "WHERE sp2.l_partkey = p_partkey AND rx.r_name = 'ASIA') " +
      "ORDER BY s_acctbal, n_name, s_name, p_partkey"

  /** Q4: order-priority checking — EXISTS a line shipped >90 days after the
    * order date; Catalyst decorrelates to a left-semi join. */
  private val q4 =
    "SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count " +
      "FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' " +
      "AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00' " +
      "AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey " +
      "AND l_shipdate > o_orderdate + INTERVAL 90 DAY) " +
      "GROUP BY o_orderpriority ORDER BY o_orderpriority"

  /** Q6: forecasting revenue change — the pure scan+filter+agg probe; at
    * 100 TB this is the "did every predicate reach the parquet reader"
    * check (all three filters are min/max prunable). */
  private val q6 =
    s"SELECT CAST(SUM(${OSQL.cents("l_extendedprice")} * " +
      s"${OSQL.cents("l_discount")}) AS DOUBLE) / 10000.0 AS revenue, " +
      "CAST(COUNT(*) AS BIGINT) AS n_lines " +
      "FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' " +
      "AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00' " +
      "AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24"

  /** Q8: national market share — the 8-table snowflake with nation in two
    * roles; share = exact-cents volume ratio per order year. */
  private val q8 =
    "SELECT o_year, CAST(SUM(CASE WHEN n2_name = 'NATION_3' THEN vol " +
      "ELSE 0 END) AS DOUBLE) / CAST(SUM(vol) AS DOUBLE) AS mkt_share " +
      "FROM (SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year, " +
      s"${OSQL.cents("l_extendedprice")} * " +
      s"(100 - ${OSQL.cents("l_discount")}) AS vol, n2.n_name AS n2_name " +
      "FROM part JOIN lineitem ON p_partkey = l_partkey " +
      "JOIN supplier ON s_suppkey = l_suppkey " +
      "JOIN orders ON l_orderkey = o_orderkey " +
      "JOIN customer ON o_custkey = c_custkey " +
      "JOIN nation n1 ON c_nationkey = n1.n_nationkey " +
      "JOIN region ON n1.n_regionkey = r_regionkey " +
      "JOIN nation n2 ON s_nationkey = n2.n_nationkey " +
      "WHERE r_name = 'ASIA' AND p_type = 'ECONOMY' " +
      "AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' " +
      "AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00') t " +
      "GROUP BY o_year ORDER BY o_year"

  /** Q9: product-type profit by supplier nation and year (no supplycost
    * column — profit is the discounted revenue term of the original). */
  private val q9 =
    "SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) / 10000.0 " +
      "AS sum_profit FROM (SELECT n_name AS nation, " +
      "CAST(year(o_orderdate) AS BIGINT) AS o_year, " +
      s"${OSQL.cents("l_extendedprice")} * " +
      s"(100 - ${OSQL.cents("l_discount")}) AS amount " +
      "FROM part JOIN lineitem ON p_partkey = l_partkey " +
      "JOIN supplier ON s_suppkey = l_suppkey " +
      "JOIN orders ON o_orderkey = l_orderkey " +
      "JOIN nation ON s_nationkey = n_nationkey " +
      "WHERE p_name LIKE '%red%') t " +
      "GROUP BY nation, o_year ORDER BY nation, o_year DESC"

  /** Q10: returned-item reporting — top 20 customers by returned revenue
    * in a quarter. */
  private val q10 =
    s"SELECT c_custkey, c_name, $rev AS revenue, c_acctbal, n_name " +
      "FROM customer JOIN orders ON c_custkey = o_custkey " +
      "JOIN lineitem ON l_orderkey = o_orderkey " +
      "JOIN nation ON c_nationkey = n_nationkey " +
      "WHERE o_orderdate >= TIMESTAMP '1996-10-01 00:00:00' " +
      "AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00' " +
      "AND l_returnflag = 'R' " +
      "GROUP BY c_custkey, c_name, c_acctbal, n_name " +
      "ORDER BY revenue DESC, c_custkey LIMIT 20"

  /** Q11: important parts — per-part revenue for one nation's suppliers,
    * kept where above 1/1000 of that nation's total (CTE used twice:
    * grouped rows + scalar total). */
  private val q11 =
    "WITH pv AS (SELECT l_partkey, " +
      s"CAST(SUM(${OSQL.cents("l_extendedprice")}) AS BIGINT) " +
      "AS value_cents FROM lineitem " +
      "JOIN supplier ON l_suppkey = s_suppkey " +
      "JOIN nation ON s_nationkey = n_nationkey " +
      "WHERE n_name = 'NATION_3' GROUP BY l_partkey) " +
      "SELECT l_partkey, CAST(value_cents AS DOUBLE) / 100.0 AS value " +
      "FROM pv WHERE CAST(value_cents AS DOUBLE) > " +
      "CAST((SELECT SUM(value_cents) FROM pv) AS DOUBLE) / 1000.0 " +
      "ORDER BY value DESC, l_partkey"

  /** Q12: late lines by linestatus, split into high/low-priority counts
    * (CASE-sum pivot kept from the original). */
  private val q12 =
    "SELECT l_linestatus, " +
      "CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') " +
      "THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count, " +
      "CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') " +
      "THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count " +
      "FROM orders JOIN lineitem ON o_orderkey = l_orderkey " +
      "WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY " +
      "AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' " +
      "AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00' " +
      "GROUP BY l_linestatus ORDER BY l_linestatus"

  /** Q13: customer order-count distribution (left join so zero-order
    * customers survive into the c_count=0 bucket). */
  private val q13 =
    "SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist " +
      "FROM (SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) " +
      "AS c_count FROM customer " +
      "LEFT JOIN orders ON c_custkey = o_custkey GROUP BY c_custkey) t " +
      "GROUP BY c_count ORDER BY custdist DESC, c_count DESC"

  /** Q14: promo revenue share for one ship month; both sums stay in exact
    * cents until the single final double division. */
  private val q14 =
    "SELECT 100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN vol " +
      "ELSE 0 END) AS DOUBLE) / CAST(SUM(vol) AS DOUBLE) " +
      "AS promo_revenue FROM (SELECT " +
      s"${OSQL.cents("l_extendedprice")} * " +
      s"(100 - ${OSQL.cents("l_discount")}) AS vol, p_type " +
      "FROM lineitem JOIN part ON l_partkey = p_partkey " +
      "WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00' " +
      "AND l_shipdate < TIMESTAMP '1996-10-01 00:00:00') t"

  /** Q15: top supplier — the revenue CTE is read twice (join + scalar MAX);
    * the tie-safe equality is on exact integer cents, never on doubles. */
  private val q15 =
    "WITH revenue AS (SELECT l_suppkey AS supplier_no, " +
      s"CAST(SUM(${OSQL.cents("l_extendedprice")} * " +
      s"(100 - ${OSQL.cents("l_discount")})) AS BIGINT) AS total_cents " +
      "FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' " +
      "AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00' " +
      "GROUP BY l_suppkey) " +
      "SELECT s_suppkey, s_name, CAST(total_cents AS DOUBLE) / 10000.0 " +
      "AS total_revenue FROM supplier " +
      "JOIN revenue ON s_suppkey = supplier_no " +
      "WHERE total_cents = (SELECT MAX(total_cents) FROM revenue) " +
      "ORDER BY s_suppkey"

  /** Q16: supplier count by brand/type/size over the emulated supply
    * relation, with the original's NOT IN supplier exclusion. */
  private val q16 =
    "SELECT p_brand, p_type, p_size, " +
      "CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt " +
      "FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps " +
      "JOIN part ON p_partkey = l_partkey " +
      "WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO' " +
      "AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22) " +
      "AND l_suppkey NOT IN " +
      "(SELECT s_suppkey FROM supplier WHERE s_acctbal < 0) " +
      "GROUP BY p_brand, p_type, p_size " +
      "ORDER BY supplier_cnt DESC, p_brand, p_type, p_size"

  /** Q17: small-quantity-order revenue — correlated 0.2·AVG threshold per
    * part; quantities are integer-valued doubles so the AVG is exact. */
  private val q17 =
    s"SELECT CAST(SUM(${OSQL.cents("l_extendedprice")}) AS DOUBLE) " +
      "/ 700.0 AS avg_yearly " +
      "FROM lineitem JOIN part ON p_partkey = l_partkey " +
      "WHERE p_brand = 'Brand#3' " +
      "AND l_quantity < (SELECT 0.2 * AVG(l2.l_quantity) " +
      "FROM lineitem l2 WHERE l2.l_partkey = p_partkey)"

  /** Q19: discounted revenue under three disjunctive brand/size/quantity
    * bands — the OR-of-ANDs join-condition pushdown probe. */
  private val q19 =
    s"SELECT $rev AS revenue, CAST(COUNT(*) AS BIGINT) AS n_lines " +
      "FROM lineitem JOIN part ON p_partkey = l_partkey " +
      "WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5 " +
      "AND l_quantity >= 1 AND l_quantity <= 11) " +
      "OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 " +
      "AND l_quantity >= 10 AND l_quantity <= 20) " +
      "OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15 " +
      "AND l_quantity >= 20 AND l_quantity <= 30)"

  /** Q20: suppliers who moved >100 units of red parts in a year — the
    * original's nested-IN shape over the emulated supply stream. */
  private val q20 =
    "SELECT s_name, s_acctbal FROM supplier WHERE s_suppkey IN " +
      "(SELECT l_suppkey FROM lineitem WHERE l_partkey IN " +
      "(SELECT p_partkey FROM part WHERE p_name LIKE 'red%') " +
      "AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' " +
      "AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00' " +
      "GROUP BY l_suppkey HAVING SUM(l_quantity) > 100) " +
      "ORDER BY s_name"

  /** Q21: suppliers who kept orders waiting — sole-late-supplier detection
    * via EXISTS (another supplier on the order) + NOT EXISTS (another LATE
    * supplier); the lateness in the anti side recomputes against its own
    * orders row so the correlation stays equi-join decorrelatable. */
  private val q21 =
    "SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait " +
      "FROM supplier JOIN lineitem l1 ON s_suppkey = l1.l_suppkey " +
      "JOIN orders ON o_orderkey = l1.l_orderkey " +
      "WHERE o_orderstatus = 'F' " +
      "AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY " +
      "AND EXISTS (SELECT 1 FROM lineitem l2 " +
      "WHERE l2.l_orderkey = l1.l_orderkey " +
      "AND l2.l_suppkey <> l1.l_suppkey) " +
      "AND NOT EXISTS (SELECT 1 FROM lineitem l3 " +
      "JOIN orders o2 ON o2.o_orderkey = l3.l_orderkey " +
      "WHERE l3.l_orderkey = l1.l_orderkey " +
      "AND l3.l_suppkey <> l1.l_suppkey " +
      "AND l3.l_shipdate > o2.o_orderdate + INTERVAL 90 DAY) " +
      "GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 10"

  /** Q22: wealthy customers gone quiet — above-average balance (exact-cents
    * AVG), no order since 1999; country code is c_nationkey here. */
  private val q22 =
    "SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS numcust, " +
      s"CAST(SUM(${OSQL.cents("c_acctbal")}) AS DOUBLE) / 100.0 " +
      "AS totacctbal FROM customer WHERE c_acctbal > " +
      s"(SELECT CAST(SUM(${OSQL.cents("c2.c_acctbal")}) AS DOUBLE) " +
      "/ (100.0 * COUNT(*)) FROM customer c2 WHERE c2.c_acctbal > 0.0) " +
      "AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey " +
      "AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00') " +
      "GROUP BY c_nationkey ORDER BY c_nationkey"

  private val texts: Map[String, String] = Map(
    "sql_q2_min_supplier" -> q2,
    "sql_q4_priority" -> q4,
    "sql_q6_forecast" -> q6,
    "sql_q8_mktshare" -> q8,
    "sql_q9_profit" -> q9,
    "sql_q10_returns" -> q10,
    "sql_q11_important_parts" -> q11,
    "sql_q12_late_lines" -> q12,
    "sql_q13_custdist" -> q13,
    "sql_q14_promo" -> q14,
    "sql_q15_top_supplier" -> q15,
    "sql_q16_supplier_cnt" -> q16,
    "sql_q17_small_qty" -> q17,
    "sql_q19_disc_revenue" -> q19,
    "sql_q20_red_suppliers" -> q20,
    "sql_q21_waiting" -> q21,
    "sql_q22_idle_customers" -> q22)

  private val allTables =
    Seq("part", "orders", "lineitem", "supplier", "customer", "nation",
      "region")

  private def run(text: String)(s: SparkSession, d: String): DataFrame = {
    for (t <- allTables) U.tbl(s, d, t).createOrReplaceTempView(t)
    s.sql(text)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    texts.map { case (name, text) => name -> (run(text) _) }

  val oracleSql: Map[String, String] = texts
}
