package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Watermark semantics under controlled micro-batches (SURVEY.md §2.9/§5):
  * MemoryStream lets each addData = one batch, so the watermark trajectory
  * is exact: wm = max(event time seen) - delay, updated between batches;
  * append emits a window only once wm passes its end; later rows older than
  * wm are dropped from stateful aggregation. */
class StreamingSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("append window: late row beyond watermark is dropped, on-time kept") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long)]
    val agg = in.toDF().toDF("ts", "v")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("wstart"), col("n"))
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("wm_test").start()
    try {
      // batch 1: two rows in the 10:00 window, one at 12:05 => wm -> 11:55
      in.addData((ts("2024-01-01 10:10:00"), 1L), (ts("2024-01-01 10:20:00"), 2L),
        (ts("2024-01-01 12:05:00"), 3L))
      q.processAllAvailable()
      // batch 2: a LATE row for the already-finalized 10:00 window (dropped)
      // and an on-time row at 12:10
      in.addData((ts("2024-01-01 10:30:00"), 4L), (ts("2024-01-01 12:10:00"), 5L))
      q.processAllAvailable()
      // batch 3: advance event time so the 12:00 window finalizes too
      in.addData((ts("2024-01-01 14:00:00"), 6L))
      q.processAllAvailable()
      val out = spark.table("wm_test").collect()
        .map(r => r.getAs[Timestamp]("wstart").toString -> r.getAs[Long]("n")).toMap
      assert(out("2024-01-01 10:00:00.0") == 2L,
        s"late row must NOT count into the finalized window: $out")
      assert(out("2024-01-01 12:00:00.0") == 2L,
        s"on-time rows of the 12:00 window must both count: $out")
    } finally q.stop()
  }

  test("session_window merges events within gap, splits across it") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long)]
    val agg = in.toDF().toDF("ts", "user_id")
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("session_window.start").as("s"), col("user_id"), col("n"))
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("sess_test").start()
    try {
      in.addData((ts("2024-01-01 10:00:00"), 1L), (ts("2024-01-01 10:20:00"), 1L),
        (ts("2024-01-01 11:30:00"), 1L)) // > 30min after 10:20 => new session
      q.processAllAvailable()
      in.addData((ts("2024-01-01 15:00:00"), 1L)) // advance wm to close all
      q.processAllAvailable()
      val sessions = spark.table("sess_test").collect()
        .map(r => (r.getAs[Timestamp]("s").toString, r.getAs[Long]("n"))).sorted
      assert(sessions.contains(("2024-01-01 10:00:00.0", 2L)),
        s"first session should merge two events: ${sessions.mkString(",")}")
      assert(sessions.exists(s => s._1 == "2024-01-01 11:30:00.0" && s._2 == 1L),
        s"gap must split sessions: ${sessions.mkString(",")}")
    } finally q.stop()
  }

  test("declared streaming queries run a real streaming pipeline end-to-end") {
    val df = graft.streaming.StreamingQueries.queries("stream_stateful")(spark, sfDir)
    val rows = df.collect()
    assert(rows.nonEmpty)
    // running_n within each user is 1..k in event order
    rows.groupBy(_.getAs[Long]("user_id")).foreach { case (_, rs) =>
      val ns = rs.map(_.getAs[Long]("running_n")).sorted
      assert(ns.sameElements(1L to ns.length), "running counter must be dense")
    }
  }
}
