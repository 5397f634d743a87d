package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 WRITE path (the mirror of [[DeterministicSource]]'s read
  * path): a sink that aggregates (count, cent-sum) per write task and
  * combines the partials in the driver-side commit — the full connector
  * write protocol (WriteBuilder → BatchWrite → DataWriterFactory →
  * DataWriter → WriterCommitMessage → commit/abort) with exactly-once
  * semantics via the commit barrier: partials from failed/speculative
  * tasks are never combined because only Spark-committed messages reach
  * `commit()`.
  *
  * This is the aggregation-pushdown-to-sink shape (metrics sinks, manifest
  * builders, index writers): per-task partials are O(1), the driver
  * combine is O(tasks), and the payload never lands anywhere — at 100 TB
  * the same protocol carries file manifests instead of two longs.
  */
class StatsSink extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    StatsSink.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new StatsSinkTable(properties.getOrDefault("run", "default"))
}

object StatsSink {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("cents", LongType, nullable = false)))
  /** run-tag → (row count, cent sum) as combined by BatchWrite.commit. */
  val committed = new java.util.concurrent.ConcurrentHashMap[String, (Long, Long)]()
  /** (run-tag, epochId) → per-epoch partial, combined by StreamingWrite
    * .commit — keyed by epoch so a replayed epoch OVERWRITES rather than
    * double-counts (the idempotent-commit half of exactly-once). */
  val epochs = new java.util.concurrent.ConcurrentHashMap[(String, Long), (Long, Long)]()
  def streamedTotal(run: String): (Long, Long) = {
    var n = 0L; var sum = 0L
    epochs.forEach { (k, v) => if (k._1 == run) { n += v._1; sum += v._2 } }
    (n, sum)
  }
}

private class StatsSinkTable(run: String) extends Table with SupportsWrite {
  override def name(): String = s"stats_sink($run)"
  override def schema(): StructType = StatsSink.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE,
      TableCapability.STREAMING_WRITE)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new StatsBatchWrite(run)
        override def toStreaming: StreamingWrite = new StatsStreamingWrite(run)
      }
    }
}

/** Epoch-committed streaming write: per-task partials arrive per epoch;
  * commit(epochId, …) stores the epoch's combined partial under its id, so
  * a retried epoch replaces itself instead of double-counting. */
private class StatsStreamingWrite(run: String) extends StreamingWrite {
  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory =
    StatsStreamingWriterFactory
  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    var n = 0L; var sum = 0L
    messages.foreach { case StatsPartial(pn, ps) => n += pn; sum += ps }
    StatsSink.epochs.put((run, epochId), (n, sum))
  }
  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    StatsSink.epochs.remove((run, epochId))
}

private object StatsStreamingWriterFactory extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private var n = 0L
      private var sum = 0L
      override def write(row: InternalRow): Unit = { n += 1; sum += row.getLong(1) }
      override def commit(): WriterCommitMessage = StatsPartial(n, sum)
      override def abort(): Unit = ()
      override def close(): Unit = ()
    }
}

private case class StatsPartial(n: Long, sum: Long) extends WriterCommitMessage

private class StatsBatchWrite(run: String) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    StatsWriterFactory
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    // Long sums are associative: any task/partition order combines to the
    // same totals, so the committed value is deterministic
    var n = 0L; var sum = 0L
    messages.foreach { case StatsPartial(pn, ps) => n += pn; sum += ps }
    StatsSink.committed.put(run, (n, sum))
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit =
    StatsSink.committed.remove(run)
}

private object StatsWriterFactory extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private var n = 0L
      private var sum = 0L
      override def write(row: InternalRow): Unit = { n += 1; sum += row.getLong(1) }
      override def commit(): WriterCommitMessage = StatsPartial(n, sum)
      override def abort(): Unit = ()
      override def close(): Unit = ()
    }
}
