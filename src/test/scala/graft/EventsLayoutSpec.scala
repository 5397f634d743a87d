package graft

import java.nio.file.{Files, Paths}
import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, Types}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Fixture-layout contract for `U.events` (the one reader every ts query goes
  * through). The driver has regenerated `events.parquet` with a different
  * physical `ts` encoding once already — nanos → tz-less micros — and the
  * silent schema change took out 32 queries before any test went red. This
  * spec writes a tiny parquet in each of the three observed layouts and
  * asserts they all come back as µs-precision `TimestampType` with identical
  * instants, so the NEXT regeneration breaks here first, with an exact
  * message, instead of in the driver sweep. */
class EventsLayoutSpec extends SparkTestBase {

  // Two instants with sub-second precision; micros since epoch (UTC).
  private val instantsMicros = Seq(1704067200123456L, 1717240496987654L)

  private def layoutDir(tag: String): String = {
    val d = s"/tmp/graft_test_layouts/$tag"
    val p = Paths.get(d)
    if (Files.exists(p)) {
      Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.delete(f))
    }
    d
  }

  /** Spark cannot write TIMESTAMP(NANOS); use parquet-mr's example writer. */
  private def writeNanosFixture(dir: String): Unit = {
    val schema: MessageType = Types.buildMessage()
      .required(PrimitiveTypeName.INT64).named("event_id")
      .required(PrimitiveTypeName.INT64)
      .as(LogicalTypeAnnotation.timestampType(true, LogicalTypeAnnotation.TimeUnit.NANOS))
      .named("ts")
      .named("events")
    Files.createDirectories(Paths.get(s"$dir/events.parquet"))
    val writer = ExampleParquetWriter
      .builder(new Path(s"$dir/events.parquet/part-0.parquet"))
      .withType(schema)
      .build()
    val factory = new SimpleGroupFactory(schema)
    instantsMicros.zipWithIndex.foreach { case (us, i) =>
      val g = factory.newGroup()
      g.add("event_id", i.toLong)
      g.add("ts", us * 1000L) // nanos
      writer.write(g)
    }
    writer.close()
  }

  private def writeMicrosFixture(dir: String, utc: Boolean): Unit = {
    import spark.implicits._
    val tsType = if (utc) TimestampType else TimestampNTZType
    instantsMicros.zipWithIndex.map { case (us, i) => (i.toLong, us) }
      .toDF("event_id", "us")
      .withColumn("ts", timestamp_micros(col("us")).cast(tsType))
      .select("event_id", "ts")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  private def readInstants(dir: String): Seq[Long] = {
    val df = U.events(spark, dir)
    assert(df.schema("ts").dataType == TimestampType,
      s"U.events($dir) returned ts as ${df.schema("ts").dataType}, expected TimestampType")
    df.orderBy("event_id")
      .select(unix_micros(col("ts")))
      .collect().map(_.getLong(0)).toSeq
  }

  test("all three observed ts layouts read back as identical µs TimestampType instants") {
    // session TZ is UTC (SparkTestBase), matching Bench/Verify — the NTZ cast
    // is instant-preserving only under that pin, which is the contract.
    val nanosDir = layoutDir("nanos"); writeNanosFixture(nanosDir)
    val ntzDir = layoutDir("micros_naive"); writeMicrosFixture(ntzDir, utc = false)
    val utcDir = layoutDir("micros_utc"); writeMicrosFixture(utcDir, utc = true)

    assert(readInstants(nanosDir) == instantsMicros, "nanos layout mangled instants")
    assert(readInstants(ntzDir) == instantsMicros, "naive-micros (NTZ) layout mangled instants")
    assert(readInstants(utcDir) == instantsMicros, "utc-micros layout mangled instants")
  }

  test("the shipped fixture itself reads as µs TimestampType") {
    val df = U.events(spark, sfDir)
    assert(df.schema("ts").dataType == TimestampType,
      s"shipped events fixture reads as ${df.schema("ts").dataType} — " +
        "a fixture regeneration changed the ts physical layout; extend U.events")
    assert(df.limit(1).count() == 1)
  }

  test("an unrecognized ts read type fails loudly instead of passing through") {
    val dir = layoutDir("string_ts")
    import spark.implicits._
    Seq((1L, "2024-01-01")).toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val e = intercept[IllegalStateException] { U.events(spark, dir) }
    assert(e.getMessage.contains("layout dispatch"))
  }

  test("micros layouts do not leak the nanosAsLong legacy conf into the session") {
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val ntzDir = layoutDir("micros_naive_conf"); writeMicrosFixture(ntzDir, utc = false)
    // start from a clean slate; U.events must not set it for a micros read
    // (getOption reports the registered default "false" when unset)
    spark.conf.unset(key)
    U.events(spark, ntzDir).limit(1).count()
    assert(!spark.conf.getOption(key).contains("true"),
      "U.events set the session-wide nanos legacy conf for a micros-layout read")
  }
}
