package graft.operators

import graft.U
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY.md §2.6 — sorts, limits, top-k, set operations.
  *
  * `limit_topk` deliberately uses orderBy().limit(k) so Catalyst plans
  * TakeOrderedAndProject — per-partition top-k then a k-row merge on the
  * driver, no global sort — the only top-k shape that survives 100 TB.
  * `distinct_drop` uses the window-pick-first form instead of
  * dropDuplicates(), whose survivor is partition-order-dependent and would
  * break the exact oracle hash.
  */
object SetOps {

  private def sortMulti(s: SparkSession, d: String): DataFrame =
    U.tbl(s, d, "orders")
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      .orderBy(col("o_orderstatus").desc, col("o_totalprice").asc, col("o_orderkey").asc)

  private def limitTopk(s: SparkSession, d: String): DataFrame =
    U.tbl(s, d, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      .limit(25)

  private def setUnion(s: SparkSession, d: String): DataFrame = {
    val o = U.tbl(s, d, "orders")
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    o.filter(col("o_totalprice") < 50000.0)
      .unionAll(o.filter(col("o_orderstatus") === "O"))
      .orderBy("o_orderkey", "o_totalprice", "o_orderstatus")
  }

  private def setIntersect(s: SparkSession, d: String): DataFrame = {
    val buyers = U.tbl(s, d, "orders")
      .filter(col("o_totalprice") > 150000.0)
      .select(col("o_custkey").as("custkey"))
    val machinery = U.tbl(s, d, "customer")
      .filter(col("c_mktsegment") === "MACHINERY")
      .select(col("c_custkey").as("custkey"))
    buyers.intersect(machinery).orderBy("custkey")
  }

  private def setExcept(s: SparkSession, d: String): DataFrame = {
    val all = U.tbl(s, d, "customer").select(col("c_custkey").as("custkey"))
    val buyers = U.tbl(s, d, "orders").select(col("o_custkey").as("custkey"))
    all.except(buyers).orderBy("custkey")
  }

  /** MULTISET set ops (`INTERSECT ALL` / `EXCEPT ALL`): bag semantics keep
    * duplicate multiplicities — min(countL, countR) and countL − countR
    * copies respectively — which is what reconciliation jobs actually want
    * ("how many rows of each kind are in both extracts?"). Spark plans both
    * as a count-compare aggregate + generate, no distinct collapse. */
  private def setIntersectAll(s: SparkSession, d: String): DataFrame = {
    val o = U.tbl(s, d, "orders")
    val big = o.filter(col("o_totalprice") > 100000.0)
      .select(col("o_custkey").as("custkey"))
    val open = o.filter(col("o_orderstatus") === "O")
      .select(col("o_custkey").as("custkey"))
    big.intersectAll(open).orderBy("custkey")
  }

  private def setExceptAll(s: SparkSession, d: String): DataFrame = {
    val o = U.tbl(s, d, "orders")
    val all = o.select(col("o_custkey").as("custkey"))
    val open = o.filter(col("o_orderstatus") === "O")
      .select(col("o_custkey").as("custkey"))
    all.exceptAll(open).orderBy("custkey")
  }

  /** Deduplicate by (user_id, event_type), deterministically keeping the
    * earliest event — window-pick-first, not dropDuplicates. */
  private def distinctDrop(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    U.events(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type"), col("event_id"), col("ts"), col("value"))
      .orderBy("user_id", "event_type")
  }

  /** UNPIVOT/melt: wide money columns to (metric, val) long form. */
  private def setUnpivot(s: SparkSession, d: String): DataFrame =
    U.tbl(s, d, "lineitem")
      .unpivot(Array(col("l_orderkey"), col("l_linenumber")),
        Array(col("l_extendedprice"), col("l_discount"), col("l_tax")),
        "metric", "val")
      .orderBy("l_orderkey", "l_linenumber", "metric", "val")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "set_unpivot" -> setUnpivot _,
    "sort_multi" -> sortMulti _,
    "limit_topk" -> limitTopk _,
    "set_union" -> setUnion _,
    "set_intersect" -> setIntersect _,
    "set_except" -> setExcept _,
    "set_intersect_all" -> setIntersectAll _,
    "set_except_all" -> setExceptAll _,
    "distinct_drop" -> distinctDrop _)

  val oracleSql: Map[String, String] = Map(
    "set_intersect_all" ->
      ("SELECT o_custkey AS custkey FROM orders " +
        "WHERE o_totalprice > 100000.0 " +
        "INTERSECT ALL SELECT o_custkey FROM orders " +
        "WHERE o_orderstatus = 'O' ORDER BY custkey"),
    "set_except_all" ->
      ("SELECT o_custkey AS custkey FROM orders " +
        "EXCEPT ALL SELECT o_custkey FROM orders " +
        "WHERE o_orderstatus = 'O' ORDER BY custkey"),
    "set_unpivot" ->
      ("SELECT * FROM (" +
        "SELECT l_orderkey, l_linenumber, 'l_extendedprice' AS metric, " +
        "l_extendedprice AS val FROM lineitem UNION ALL " +
        "SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem " +
        "UNION ALL SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem) " +
        "ORDER BY l_orderkey, l_linenumber, metric, val"),
    "sort_multi" ->
      ("SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders " +
        "ORDER BY o_orderstatus DESC, o_totalprice ASC, o_orderkey ASC"),
    "limit_topk" ->
      ("SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem " +
        "ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 25"),
    "set_union" ->
      ("SELECT * FROM (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders " +
        "WHERE o_totalprice < 50000.0 UNION ALL " +
        "SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders " +
        "WHERE o_orderstatus = 'O') ORDER BY o_orderkey, o_totalprice, o_orderstatus"),
    "set_intersect" ->
      ("SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 150000.0 " +
        "INTERSECT SELECT c_custkey AS custkey FROM customer " +
        "WHERE c_mktsegment = 'MACHINERY' ORDER BY custkey"),
    "set_except" ->
      ("SELECT c_custkey AS custkey FROM customer EXCEPT " +
        "SELECT o_custkey AS custkey FROM orders ORDER BY custkey"),
    "distinct_drop" ->
      ("SELECT user_id, event_type, event_id, ts, value FROM " +
        "(SELECT *, row_number() OVER (PARTITION BY user_id, event_type " +
        "ORDER BY ts, event_id) AS rn FROM events) WHERE rn = 1 " +
        "ORDER BY user_id, event_type"))
}
