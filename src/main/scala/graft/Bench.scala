package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // UTC explicitly (not only via the sbt -D flag): timestamp-literal
      // casts must select the same rows here as in the t2-verified plans
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the JVM/codegen/scan paths once so the first timed query doesn't
    // absorb session bring-up (~3-4s JIT + filesystem metadata).
    try {
      spark.range(1000000L).selectExpr("sum(id)").collect()
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .selectExpr("sum(l_quantity)").collect()
    } catch { case _: Throwable => }
    // a failed query must NOT pass as a fast timing: record it and surface
    // the failure list in the JSON (a plan-time crash is milliseconds and
    // would otherwise make a broken suite look faster than a working one)
    val failed = scala.collection.mutable.ListBuffer[String]()
    // local-iteration subset filter (comma-separated names); the driver sets
    // no env, so its invocation always times the full suite
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val results = SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() }
      catch { case e: Throwable =>
        failed += name
        System.err.println(s"[bench] $name failed: $e")
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failedJson,"sf":"$sfDir"}"""
    println(json)
    // The driver's stdout parse has failed twice (BENCH_r01/r02 "parsed":
    // null) despite a well-formed line — sbt interleaves its own output, so
    // also persist the JSON to stable paths the driver/judge can read.
    for (p <- Seq("/tmp/graft_bench.json", "bench_latest.json") if only.isEmpty) {
      try {
        val w = new java.io.PrintWriter(new java.io.File(p))
        try w.println(json) finally w.close()
      } catch { case _: Throwable => }
    }
    spark.stop()
  }
}
