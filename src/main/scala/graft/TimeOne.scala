package graft
import org.apache.spark.sql.SparkSession
object TimeOne {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    args.foreach { q =>
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(q)(spark, d).collect().length
      U.releaseTracked()
      println(f"TIMING $q ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
      val t1 = System.nanoTime()
      val n2 = SparkEntry.queries(q)(spark, d).collect().length
      U.releaseTracked()
      println(f"TIMING-WARM $q ${(System.nanoTime() - t1) / 1e9}%.2f s ($n2 rows)")
    }
    spark.stop()
  }
}
