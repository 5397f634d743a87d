package graft

import org.apache.spark.sql.functions._

/** Scale-headroom probe: the exact-arithmetic design means aggregates over
  * k-times replicated input must equal EXACTLY k times the originals (Long/
  * decimal sums are associative; no float drift allowed). Runs the flagship
  * shape over an 8x self-union — more partitions, bigger shuffles, same
  * invariants. */
class StressSpec extends SparkTestBase {

  test("q1 aggregates over 8x replicated lineitem scale exactly by 8") {
    val base = operators.Aggregations.q1Pricing(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val li = U.tbl(spark, sfDir, "lineitem")
    val li8 = (1 to 8).map(_ => li).reduce(_ unionAll _)
    // same query shape, over the 8x frame via a scratch parquet round-trip
    val scratch = U.scratch(sfDir, "stress_li8")
    li8.write.mode("overwrite").parquet(scratch)
    // point the query at a dir where lineitem.parquet IS the 8x data
    val d8 = U.scratch(sfDir, "stress_sf")
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(d8), true)
    fs.mkdirs(new org.apache.hadoop.fs.Path(d8))
    fs.rename(new org.apache.hadoop.fs.Path(scratch),
      new org.apache.hadoop.fs.Path(s"$d8/lineitem.parquet"))
    val big = operators.Aggregations.q1Pricing(spark, d8).collect()
    assert(big.nonEmpty)
    big.foreach { r =>
      val key = (r.getString(0), r.getString(1))
      val b = base(key)
      assert(r.getAs[Long]("count_order") == 8L * b.getAs[Long]("count_order"))
      // integer-exact sums scale exactly; averages are invariant
      assert(r.getAs[Double]("sum_qty") == 8.0 * b.getAs[Double]("sum_qty"))
      assert(r.getAs[Double]("sum_charge") == 8.0 * b.getAs[Double]("sum_charge"))
      assert(math.abs(r.getAs[Double]("avg_price") - b.getAs[Double]("avg_price")) < 1e-9)
    }
  }

  test("imperative-path queries are value-deterministic run-over-run") {
    // the operators with hand-written sequential kernels (mapPartitions
    // LTTB, single-task union-find, power iteration, integer PageRank) —
    // exactly where nondeterminism would sneak in if ordering assumptions
    // broke; DataFrame-only queries are covered by the oracle gate
    for (name <- Seq("ts_lttb", "dedup_clusters", "emb_top_eigvec",
        "graph_pagerank", "agg_weighted_median", "graph_cc")) {
      val f = SparkEntry.queries(name)
      val r1 = f(spark, sfDir).collect().map(_.toString)
      val r2 = f(spark, sfDir).collect().map(_.toString)
      assert(r1.sameElements(r2), s"$name differs run-over-run")
    }
  }
}
