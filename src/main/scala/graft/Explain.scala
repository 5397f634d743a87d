package graft

import org.apache.spark.sql.SparkSession

/** Plan-inspection harness: `runMain graft.Explain <sfDir> <name> [name…]`
  * prints each query's formatted physical plan and two timed `count()`s
  * (cold + warm) — the .explain-and-iterate loop SURVEY.md §4 prescribes,
  * packaged so it runs under the same session config as Bench. */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = args.drop(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- names) {
      println(s"===== $n =====")
      val df = SparkEntry.queries(n)(spark, sfDir)
      df.explain("formatted")
      val t0 = System.nanoTime(); df.count()
      println(s"cold: ${(System.nanoTime() - t0) / 1e9}s")
      val t1 = System.nanoTime(); df.count()
      println(s"warm: ${(System.nanoTime() - t1) / 1e9}s")
    }
    spark.stop()
  }
}
