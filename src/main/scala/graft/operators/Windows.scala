package graft.operators

import graft.{OSQL, U}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SURVEY.md §2.5 — window functions.
  *
  * Each query keeps to ONE sort order per partition key (multiple frames
  * share a window spec), so the physical plan is a single
  * shuffle-by-partition-key + sort — the scalable shape; extra specs would
  * each add a full re-sort. Ranking functions that admit ties are computed
  * over the tie-permitting order (deterministic output values), while
  * row_number/ntile get a tie-broken unique order.
  */
object Windows {

  private def winRank(s: SparkSession, d: String): DataFrame = {
    val tied = Window.partitionBy(col("c_mktsegment")).orderBy(col("c_acctbal").desc)
    val uniq = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    U.tbl(s, d, "customer").select(
      col("c_mktsegment"), col("c_custkey"), col("c_acctbal"),
      row_number().over(uniq).cast(LongType).as("rn"),
      rank().over(tied).cast(LongType).as("rk"),
      dense_rank().over(tied).cast(LongType).as("drk"),
      ntile(4).over(uniq).cast(LongType).as("quartile"),
      percent_rank().over(tied).as("prk"))
      .orderBy("c_mktsegment", "c_custkey")
  }

  private def winAnalytic(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    U.events(s, d).select(
      col("user_id"), col("event_id"), col("ts"), col("value"),
      lag(col("value"), 1).over(w).as("prev_value"),
      lead(col("value"), 1).over(w).as("next_value"),
      first(col("value")).over(w).as("first_value"),
      last(col("value")).over(full).as("last_value"),
      cume_dist().over(w).as("cd"))
      .orderBy("event_id")
  }

  /** 7-row moving average per user (ROWS frame) in exact cents. */
  private def winFrameRows(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(-6, 0)
    U.events(s, d).select(
      col("user_id"), col("event_id"), col("ts"),
      (sum(U.cents(col("value"))).over(w).cast(DoubleType) /
        (lit(100.0) * count(lit(1)).over(w))).as("mov_avg"))
      .orderBy("event_id")
  }

  /** Cumulative sum with a RANGE frame (ties share the running total). */
  private def winFrameRange(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"))
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    U.tbl(s, d, "orders").select(
      col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
      (sum(U.cents(col("o_totalprice"))).over(w).cast(DoubleType) / lit(100.0))
        .as("cum_spend"))
      .orderBy("o_orderkey")
  }

  private def winTopkGroup(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    U.tbl(s, d, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        row_number().over(w).cast(LongType).as("rn"))
      .filter(col("rn") <= 3)
      .orderBy("o_custkey", "rn")
  }

  /** nth_value + lag-with-default over the full partition frame. */
  private def winNth(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    U.events(s, d).select(
      col("user_id"), col("event_id"), col("value"),
      nth_value(col("value"), 3).over(full).as("third_value"),
      lag(col("value"), 2, -1.0).over(w).as("lag2_or_default"))
      .orderBy("event_id")
  }

  /** Same result through the custom whole-operator plan
    * ([[graft.plans.GroupedTopK]]): per-partition bounded heaps instead of
    * Exchange→full-sort→Window→Filter — O(n log k), no sort buffers. Shares
    * win_topk_group's oracle; PlanSpec asserts the Window-free plan. */
  private def winTopkNative(s: SparkSession, d: String): DataFrame =
    graft.plans.GroupedTopKApi(
      U.tbl(s, d, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice")),
      groupBy = Seq("o_custkey"),
      orderBy = Seq(("o_totalprice", true), ("o_orderkey", false)),
      k = 3, rankName = "rn")
      .orderBy("o_custkey", "rn")

  /** Gaps-and-islands: maximal runs of consecutive active days per user.
    * The classic row_number anchor trick (day − rn·1day is constant within a
    * run) keeps it one shuffle+sort per user plus a hash agg — no self-join,
    * so the shape is linear at any scale. Day arithmetic in exact integer
    * microseconds (engine date-subtraction semantics differ and are avoided). */
  private def winGapsIslands(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
    U.events(s, d)
      .select(col("user_id"), date_trunc("DAY", col("ts")).as("day"))
      .distinct()
      .withColumn("rn", row_number().over(w))
      .withColumn("anchor", expr("unix_micros(day) - rn * 86400000000"))
      .groupBy(col("user_id"), col("anchor"))
      .agg(min(col("day")).as("island_start"), max(col("day")).as("island_end"),
        count(lit(1)).as("n_days"))
      .select(col("user_id"), col("island_start"), col("island_end"), col("n_days"))
      .orderBy("user_id", "island_start")
  }

  /** Running distinct event-type count per user (incremental cardinality —
    * "how fast does each user's behavioral repertoire grow"): windowed
    * COUNT(DISTINCT) doesn't exist in either engine, so the scalable
    * identity is used instead — a value's FIRST occurrence flags 1
    * (row_number over (user, type) = 1), and the running sum of flags IS
    * the running distinct count. Both windows share the user partitioning:
    * one exchange, two in-partition sorts. */
  private def winRunningDistinct(s: SparkSession, d: String): DataFrame = {
    val firstW = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    val runW = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    U.events(s, d)
      .withColumn("is_first",
        when(row_number().over(firstW) === 1, 1L).otherwise(0L))
      .withColumn("n_types_seen", sum(col("is_first")).over(runW))
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"),
        col("n_types_seen"))
      .orderBy("user_id", "ts", "event_id")
  }

  /** Forward-fill over genuinely sparse data (IGNORE NULLS as a declared
    * surface, not just an as-of-join internal): customers left-joined to
    * their latest order date — the no-order customers carry NULL — then
    * `last(..., ignoreNulls)` over the segment's custkey order drags the
    * most recent non-null value forward, the classic sparse-column fill.
    * The order summary is restricted to 1995 so a fifth of customers are
    * genuinely NULL at every SF (spec-asserted — fully-covered input
    * would make IGNORE NULLS vacuous). One shuffle + one sort per
    * segment; the left join is a broadcast of the per-customer summary
    * at this scale and a plain shuffle join past it. */
  private def winFillForward(s: SparkSession, d: String): DataFrame = {
    val lastOrder = U.tbl(s, d, "orders")
      .filter(year(col("o_orderdate")) === 1995)
      .groupBy(col("o_custkey")).agg(max(col("o_orderdate")).as("last_order"))
    val w = Window.partitionBy(col("c_mktsegment")).orderBy(col("c_custkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    U.tbl(s, d, "customer")
      .join(lastOrder, col("c_custkey") === col("o_custkey"), "left_outer")
      .select(col("c_mktsegment"), col("c_custkey"), col("last_order"))
      .withColumn("filled_last_order",
        last(col("last_order"), ignoreNulls = true).over(w))
      .orderBy("c_mktsegment", "c_custkey")
  }

  /** 2-D Pareto frontier (skyline) per market segment: an order is on the
    * frontier iff NO earlier order in its segment priced higher-or-equal —
    * the record-breaking subsequence under (date asc, price max), the
    * classic skyline specialization a running max solves without any pair
    * enumeration. All comparisons in exact cents over a total order
    * (orderdate, orderkey); one window pass per segment, output frontier
    * size O(records), never O(n²) dominance pairs. */
  private def winSkyline(s: SparkSession, d: String): DataFrame = {
    val vc = U.cents(col("o_totalprice"))
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, -1)
    U.tbl(s, d, "orders")
      .join(U.tbl(s, d, "customer").select(col("c_custkey"), col("c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .withColumn("prior_max", max(vc).over(w))
      .filter(col("prior_max").isNull || vc > col("prior_max"))
      .select(col("c_mktsegment"), col("o_orderkey"), col("o_orderdate"),
        col("o_totalprice"))
      .orderBy("c_mktsegment", "o_orderkey")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "win_skyline" -> winSkyline _,
    "win_fill_forward" -> winFillForward _,
    "win_running_distinct" -> winRunningDistinct _,
    "win_gaps_islands" -> winGapsIslands _,
    "win_topk_native" -> winTopkNative _,
    "win_nth" -> winNth _,
    "win_rank" -> winRank _,
    "win_analytic" -> winAnalytic _,
    "win_frame_rows" -> winFrameRows _,
    "win_frame_range" -> winFrameRange _,
    "win_topk_group" -> winTopkGroup _)

  val oracleSql: Map[String, String] = Map(
    "win_skyline" -> {
      val c = OSQL.cents("o_totalprice")
      s"WITH j AS (SELECT c_mktsegment, o_orderkey, o_orderdate, " +
        s"o_totalprice, $c AS vc FROM orders " +
        "JOIN customer ON o_custkey = c_custkey), " +
        "m AS (SELECT *, MAX(vc) OVER (PARTITION BY c_mktsegment " +
        "ORDER BY o_orderdate, o_orderkey " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prior_max " +
        "FROM j) " +
        "SELECT c_mktsegment, o_orderkey, o_orderdate, o_totalprice FROM m " +
        "WHERE prior_max IS NULL OR vc > prior_max " +
        "ORDER BY c_mktsegment, o_orderkey"
    },
    "win_fill_forward" ->
      ("WITH lo AS (SELECT o_custkey, MAX(o_orderdate) AS last_order " +
        "FROM orders WHERE year(o_orderdate) = 1995 GROUP BY o_custkey) " +
        "SELECT c_mktsegment, c_custkey, last_order, " +
        "last_value(last_order IGNORE NULLS) OVER " +
        "(PARTITION BY c_mktsegment ORDER BY c_custkey " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) " +
        "AS filled_last_order " +
        "FROM customer LEFT JOIN lo ON c_custkey = o_custkey " +
        "ORDER BY c_mktsegment, c_custkey"),
    "win_running_distinct" ->
      ("WITH f AS (SELECT user_id, ts, event_id, event_type, " +
        "CASE WHEN row_number() OVER (PARTITION BY user_id, event_type " +
        "ORDER BY ts, event_id) = 1 THEN 1 ELSE 0 END AS is_first " +
        "FROM events) " +
        "SELECT user_id, ts, event_id, event_type, " +
        "CAST(SUM(is_first) OVER (PARTITION BY user_id " +
        "ORDER BY ts, event_id) AS BIGINT) AS n_types_seen " +
        "FROM f ORDER BY user_id, ts, event_id"),
    "win_gaps_islands" ->
      ("WITH days AS (SELECT DISTINCT user_id, " +
        "CAST(date_trunc('day', ts) AS TIMESTAMP) AS day FROM events), " +
        "r AS (SELECT user_id, day, epoch_us(day) - " +
        "row_number() OVER (PARTITION BY user_id ORDER BY day) * 86400000000 " +
        "AS anchor FROM days) " +
        "SELECT user_id, MIN(day) AS island_start, MAX(day) AS island_end, " +
        "COUNT(*) AS n_days FROM r GROUP BY user_id, anchor " +
        "ORDER BY user_id, island_start"),
    "win_nth" ->
      ("SELECT user_id, event_id, value, " +
        "nth_value(value, 3) OVER (PARTITION BY user_id ORDER BY ts, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS third_value, " +
        "lag(value, 2, -1.0) OVER (PARTITION BY user_id ORDER BY ts, event_id) " +
        "AS lag2_or_default FROM events ORDER BY event_id"),
    "win_rank" ->
      ("SELECT c_mktsegment, c_custkey, c_acctbal, " +
        "row_number() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS rn, " +
        "rank() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC) AS rk, " +
        "dense_rank() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC) AS drk, " +
        "ntile(4) OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS quartile, " +
        "percent_rank() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC) AS prk " +
        "FROM customer ORDER BY c_mktsegment, c_custkey"),
    "win_analytic" ->
      ("SELECT user_id, event_id, ts, value, " +
        "lag(value, 1) OVER w AS prev_value, " +
        "lead(value, 1) OVER w AS next_value, " +
        "first_value(value) OVER w AS first_value, " +
        "last_value(value) OVER (PARTITION BY user_id ORDER BY ts, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_value, " +
        "cume_dist() OVER w AS cd FROM events " +
        "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id) ORDER BY event_id"),
    "win_frame_rows" ->
      ("SELECT user_id, event_id, ts, " +
        s"CAST(SUM(${OSQL.cents("value")}) OVER w AS DOUBLE) / (100.0 * COUNT(*) OVER w) AS mov_avg " +
        "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id " +
        "ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) ORDER BY event_id"),
    "win_frame_range" ->
      ("SELECT o_custkey, o_orderkey, o_orderdate, " +
        s"CAST(SUM(${OSQL.cents("o_totalprice")}) OVER (PARTITION BY o_custkey ORDER BY o_orderdate " +
        "RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) / 100.0 AS cum_spend " +
        "FROM orders ORDER BY o_orderkey"),
    "win_topk_group" -> topkSql,
    "win_topk_native" -> topkSql)

  /** One oracle pins both the window and the native-operator formulation. */
  private lazy val topkSql =
    "SELECT * FROM (SELECT o_custkey, o_orderkey, o_totalprice, " +
      "row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn " +
      "FROM orders) WHERE rn <= 3 ORDER BY o_custkey, rn"
}
