package graft.operators

import graft.{OSQL, U}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Encoder case classes — top-level so Catalyst derives product encoders. */
case class OrderRow(o_orderkey: Long, o_custkey: Long, o_orderstatus: String,
  o_totalprice: Double)
case class CustOpen(o_custkey: Long, n_open: Long, open_value: Double)
case class CustRow(c_custkey: Long, c_name: String, c_mktsegment: String)
case class BigOrder(o_orderkey: Long, c_name: String, c_mktsegment: String,
  o_totalprice: Double)
case class StatusAgg(n_orders: Long, total_value: Double)

/** Associative (count, cents) buffer — round(x·100) equals the
  * DECIMAL(12,2)-cast cents for any 2-decimal double (the fixture
  * guarantee), so partial-agg order cannot perturb the total. */
object OrderCentsAgg
    extends org.apache.spark.sql.expressions.Aggregator[OrderRow, (Long, Long), StatusAgg] {
  def zero: (Long, Long) = (0L, 0L)
  def reduce(b: (Long, Long), o: OrderRow): (Long, Long) =
    (b._1 + 1, b._2 + math.round(o.o_totalprice * 100.0))
  def merge(a: (Long, Long), b: (Long, Long)): (Long, Long) =
    (a._1 + b._1, a._2 + b._2)
  def finish(b: (Long, Long)): StatusAgg =
    StatusAgg(b._1, b._2.toDouble / 100.0)
  def bufferEncoder: org.apache.spark.sql.Encoder[(Long, Long)] =
    org.apache.spark.sql.Encoders.tuple(
      org.apache.spark.sql.Encoders.scalaLong,
      org.apache.spark.sql.Encoders.scalaLong)
  def outputEncoder: org.apache.spark.sql.Encoder[StatusAgg] =
    org.apache.spark.sql.Encoders.product[StatusAgg]
}

/** The TYPED half of the API surface: `Dataset[T]` with case-class
  * encoders, lambda filters, and `groupByKey`/`mapGroups` — the
  * type-safe entry point users reach for when per-group logic outgrows
  * SQL expressions. Deliberately ONE query: typed lambdas are opaque to
  * Catalyst (no predicate pushdown through a `filter(f: T => Boolean)`,
  * no partial aggregation through `mapGroups`), which is exactly why the
  * rest of this library states its logic in DataFrame expressions. The
  * group fold keeps money in integer cents (associative; iteration order
  * inside a group cannot change the sum), so even the typed path stays
  * hash-exact against the SQL oracle. */
object TypedApi {

  private def typedPipeline(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ds: Dataset[OrderRow] = U.tbl(s, d, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"))
      .as[OrderRow]
    ds.filter((o: OrderRow) => o.o_orderstatus == "O")
      .groupByKey(_.o_custkey)
      .mapGroups { (k: Long, it: Iterator[OrderRow]) =>
        var n = 0L
        var cents = 0L
        // round(x*100) == the DECIMAL(12,2)-cast cents for any 2-decimal
        // double (the fixture guarantee), keeping the oracle exact
        it.foreach { o => n += 1; cents += math.round(o.o_totalprice * 100.0) }
        CustOpen(k, n, cents.toDouble / 100.0)
      }
      .toDF()
      .orderBy("o_custkey")
  }

  /** The second typed entry point: `Dataset.joinWith` — the join that
    * returns TUPLES of whole typed rows instead of a flattened row, so
    * downstream lambdas keep both sides' types. Kept to one broadcast-dim
    * typed join + a tuple-consuming map; the tuple encoder round-trip is
    * what this query exists to exercise (everything else in the library
    * flattens through columns on purpose — Catalyst sees nothing inside
    * `_._1`/`_._2` lambdas). */
  private def typedJoinWith(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val orders = U.tbl(s, d, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice")).as[OrderRow]
    val cust = U.tbl(s, d, "customer")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .as[CustRow]
    // customer is an SF-scaling TPC-H dim (150k·SF rows) — broadcast only
    // below the row cap; the count is answered from parquet footers
    val custSide =
      if (cust.count() <= U.BroadcastRowCap) broadcast(cust)
      else cust.hint("shuffle_hash")
    orders.filter((o: OrderRow) => o.o_totalprice > 400000.0)
      .joinWith(custSide, col("o_custkey") === col("c_custkey"))
      .map { case (o, c) =>
        BigOrder(o.o_orderkey, c.c_name, c.c_mktsegment, o.o_totalprice) }
      .toDF()
      .orderBy("o_orderkey")
  }

  /** The third typed entry point: a typed `Aggregator` through
    * `groupByKey(...).agg(aggregator.toColumn)` — the typed path that
    * SCALES, unlike [[typedPipeline]]'s mapGroups: an Aggregator's
    * reduce/merge pair gives Catalyst map-side partial aggregation, so
    * the shuffle carries one (n, cents) buffer per (partition, status)
    * instead of every row. Money stays in associative integer cents
    * through the buffer; the exact division happens once in finish. */
  private def typedAgg(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    U.tbl(s, d, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"))
      .as[OrderRow]
      .groupByKey(_.o_orderstatus)
      .agg(OrderCentsAgg.toColumn.name("agg"))
      .select(col("key").as("o_orderstatus"),
        col("agg.n_orders").as("n_orders"),
        col("agg.total_value").as("total_value"))
      .orderBy("o_orderstatus")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "typed_agg" -> typedAgg _,
    "typed_joinwith" -> typedJoinWith _,
    "typed_pipeline" -> typedPipeline _)

  val oracleSql: Map[String, String] = Map(
    "typed_agg" ->
      ("SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n_orders, " +
        s"CAST(SUM(${OSQL.cents("o_totalprice")}) AS DOUBLE) / 100.0 " +
        "AS total_value FROM orders GROUP BY o_orderstatus " +
        "ORDER BY o_orderstatus"),
    "typed_joinwith" ->
      ("SELECT o_orderkey, c_name, c_mktsegment, o_totalprice " +
        "FROM orders JOIN customer ON o_custkey = c_custkey " +
        "WHERE o_totalprice > 400000.0 ORDER BY o_orderkey"),
    "typed_pipeline" ->
      ("SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_open, " +
        s"CAST(SUM(${OSQL.cents("o_totalprice")}) AS DOUBLE) / 100.0 " +
        "AS open_value FROM orders WHERE o_orderstatus = 'O' " +
        "GROUP BY o_custkey ORDER BY o_custkey"))
}
