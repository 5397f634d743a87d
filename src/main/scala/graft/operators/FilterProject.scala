package graft.operators

import graft.{OSQL, U}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SURVEY.md §2.2 — projection, filters, predicates.
  *
  * All predicates are plain `Column` expressions (no UDFs), so Catalyst
  * pushes them into the parquet scan (`PushedFilters`) and prunes columns —
  * the property that matters at 100 TB. Derived money columns use the exact
  * integer-cents domain (see [[graft.U]]).
  */
object FilterProject {

  /** select + derived columns: revenue = price*(1-disc), charge = price*(1+tax). */
  private def projectCompute(s: SparkSession, d: String): DataFrame =
    U.tbl(s, d, "lineitem").select(
      col("l_orderkey"), col("l_linenumber"),
      ((U.cents(col("l_extendedprice")) * (lit(100L) - U.cents(col("l_discount"))))
        .cast(DoubleType) / lit(10000.0)).as("revenue"),
      ((U.cents(col("l_extendedprice")) * (lit(100L) + U.cents(col("l_tax"))))
        .cast(DoubleType) / lit(10000.0)).as("charge"))
      .orderBy("l_orderkey", "l_linenumber", "revenue", "charge")

  /** comparison + AND/OR + BETWEEN + IN, pushed down to the scan. */
  private def filterPred(s: SparkSession, d: String): DataFrame =
    U.tbl(s, d, "orders")
      .filter(col("o_totalprice").between(10000.0, 200000.0) &&
        col("o_orderstatus").isin("O", "F") &&
        (col("o_orderdate") >= lit("1996-01-01").cast(TimestampType) ||
          col("o_orderpriority") === "1-URGENT"))
      .orderBy("o_orderkey")

  /** LIKE / RLIKE / regexp_extract over part + customer names. */
  private def filterLikeRegex(s: SparkSession, d: String): DataFrame =
    U.tbl(s, d, "part")
      .filter(col("p_name").like("%gear%") ||
        col("p_name").rlike("^(red|blue) .*"))
      .select(col("p_partkey"), col("p_name"), col("p_brand"),
        regexp_extract(col("p_name"), "^(\\w+) ", 1).as("first_word"),
        regexp_extract(col("p_brand"), "#(\\d+)$", 1).as("brand_num"))
      .orderBy("p_partkey")

  /** IS NULL / NULLIF / COALESCE semantics (fixtures are null-free, so nulls
    * are manufactured with NULLIF on zero tax). */
  private def filterNull(s: SparkSession, d: String): DataFrame =
    U.tbl(s, d, "lineitem").select(
      col("l_orderkey"), col("l_linenumber"),
      expr("nullif(l_tax, CAST(0.0 AS DOUBLE))").as("tax_or_null"))
      .withColumn("tax_filled", coalesce(col("tax_or_null"), lit(-1.0)))
      .withColumn("is_tax_free", col("tax_or_null").isNull)
      .orderBy("l_orderkey", "l_linenumber", "tax_filled")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "project_compute" -> projectCompute _,
    "filter_pred" -> filterPred _,
    "filter_like_regex" -> filterLikeRegex _,
    "filter_null" -> filterNull _)

  val oracleSql: Map[String, String] = Map(
    "project_compute" ->
      (s"SELECT l_orderkey, l_linenumber, " +
        s"CAST(${OSQL.cents("l_extendedprice")} * (100 - ${OSQL.cents("l_discount")}) AS DOUBLE) / 10000.0 AS revenue, " +
        s"CAST(${OSQL.cents("l_extendedprice")} * (100 + ${OSQL.cents("l_tax")}) AS DOUBLE) / 10000.0 AS charge " +
        "FROM lineitem ORDER BY l_orderkey, l_linenumber, revenue, charge"),
    "filter_pred" ->
      ("SELECT * FROM orders WHERE o_totalprice BETWEEN 10000.0 AND 200000.0 " +
        "AND o_orderstatus IN ('O', 'F') " +
        "AND (o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' " +
        "OR o_orderpriority = '1-URGENT') ORDER BY o_orderkey"),
    "filter_like_regex" ->
      ("SELECT p_partkey, p_name, p_brand, " +
        "regexp_extract(p_name, '^(\\w+) ', 1) AS first_word, " +
        "regexp_extract(p_brand, '#(\\d+)$', 1) AS brand_num " +
        "FROM part WHERE p_name LIKE '%gear%' " +
        "OR regexp_matches(p_name, '^(red|blue) .*') ORDER BY p_partkey"),
    "filter_null" ->
      ("SELECT l_orderkey, l_linenumber, " +
        "nullif(l_tax, CAST(0.0 AS DOUBLE)) AS tax_or_null, " +
        "coalesce(nullif(l_tax, CAST(0.0 AS DOUBLE)), -1.0) AS tax_filled, " +
        "nullif(l_tax, CAST(0.0 AS DOUBLE)) IS NULL AS is_tax_free " +
        "FROM lineitem ORDER BY l_orderkey, l_linenumber, tax_filled"))
}
