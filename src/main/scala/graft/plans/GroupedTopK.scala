package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, AttributeSet, Descending, Expression, JoinedRow, RowOrdering, SortOrder, SpecificInternalRow, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.LongType

/** Whole-operator custom plan (SURVEY §2.11 path (c)): grouped top-k as a
  * first-class physical operator — LogicalPlan node + SparkStrategy +
  * SparkPlan, registered per-session via experimental.extraStrategies.
  *
  * Spark plans per-group top-k as Exchange → FULL SORT of every group →
  * Window(row_number) → Filter(rn <= k): at 100 TB the sort touches every
  * row of every group. This operator replaces sort+window+filter with
  * per-partition BOUNDED HEAPS (k rows per group live at once): one pass,
  * O(n log k) comparisons, no sort buffers, no spill pressure — the same
  * Exchange, nothing else. The window formulation stays as the
  * value-oracle (WindowsSpec cross-checks both paths row-for-row).
  */
case class GroupedTopK(groupCols: Seq[Expression], order: Seq[SortOrder],
    k: Int, rankAttr: Attribute, child: LogicalPlan) extends UnaryNode {
  require(k > 0, "GroupedTopK requires k > 0")
  override def output: Seq[Attribute] = child.output :+ rankAttr
  // rn originates HERE, not from the child — exempts it from the
  // missing-input analysis check
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)
  override protected def withNewChildInternal(c: LogicalPlan): GroupedTopK =
    copy(child = c)
}

object GroupedTopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case GroupedTopK(g, o, k, r, child) =>
      GroupedTopKExec(g, o, k, r, planLater(child)) :: Nil
    case _ => Nil
  }
}

case class GroupedTopKExec(groupCols: Seq[Expression], order: Seq[SortOrder],
    k: Int, rankAttr: Attribute, child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)
  // the one shuffle the operator needs: co-locate each group's rows
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(groupCols) :: Nil
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override protected def withNewChildInternal(c: SparkPlan): GroupedTopKExec =
    copy(child = c)

  override protected def doExecute(): RDD[InternalRow] = {
    val kk = k
    val groupExprs = groupCols
    val sortOrder = order
    val childOutput = child.output
    val rank = rankAttr
    child.execute().mapPartitions({ it =>
      val keyProj = UnsafeProjection.create(groupExprs, childOutput)
      // total rank order (caller supplies the tiebreak); heap head = the
      // row that would be evicted first (greatest under the rank order)
      val ord = RowOrdering.create(sortOrder, childOutput)
      val heaps = scala.collection.mutable.LinkedHashMap[
        UnsafeRow, scala.collection.mutable.PriorityQueue[InternalRow]]()
      while (it.hasNext) {
        val row = it.next()
        val key = keyProj(row)
        heaps.get(key) match {
          case Some(h) =>
            if (h.size < kk) h.enqueue(row.copy())
            else if (ord.compare(row, h.head) < 0) {
              h.dequeue(); h.enqueue(row.copy())
            }
          case None =>
            val h = scala.collection.mutable.PriorityQueue.empty[InternalRow](ord)
            h.enqueue(row.copy())
            heaps.put(key.copy(), h)
        }
      }
      val outProj = UnsafeProjection.create(childOutput :+ rank, childOutput :+ rank)
      val rankRow = new SpecificInternalRow(Seq(LongType))
      val joined = new JoinedRow
      heaps.iterator.flatMap { case (_, h) =>
        // dequeueAll emits greatest-first => reverse is rank order 1..k
        val ranked: Seq[InternalRow] = h.dequeueAll.reverse
        ranked.iterator.zipWithIndex.map { case (r, i) =>
          rankRow.setLong(0, i + 1L)
          outProj(joined(r, rankRow))
        }
      }
    }, preservesPartitioning = true)
  }
}

/** DataFrame-level entry point. Attributes are resolved BY NAME against the
  * analyzed child (Spark 4 Columns carry lazy column nodes that only the
  * standard analyzer rules unwrap — a custom node must hand the analyzer an
  * already-resolved tree). orderBy = (column, descending?) pairs; supply a
  * total order (unique tiebreak) for deterministic output. */
object GroupedTopKApi {
  def apply(df: DataFrame, groupBy: Seq[String], orderBy: Seq[(String, Boolean)],
      k: Int, rankName: String): DataFrame = {
    val spark = df.sparkSession
    register(spark)
    val child = df.queryExecution.analyzed
    def attr(n: String): Attribute = child.output.filter(_.name == n) match {
      case Seq(a) => a
      case Seq() => throw new IllegalArgumentException(
        s"grouped_topk: no column '$n' in ${child.output.map(_.name)}")
      case many => throw new IllegalArgumentException(
        // mirror the analyzer's ambiguous-reference error rather than
        // silently binding to the first match (common after joins)
        s"grouped_topk: ambiguous column '$n' (${many.size} matches); " +
          "disambiguate with select/alias first")
    }
    val order = orderBy.map { case (n, desc) =>
      SortOrder(attr(n), if (desc) Descending else Ascending)
    }
    val rankAttr = AttributeReference(rankName, LongType, nullable = false)()
    org.apache.spark.sql.graftbridge.Bridge.ofRows(spark,
      GroupedTopK(groupBy.map(attr), order, k, rankAttr, child))
  }

  /** Idempotent per-session strategy registration. */
  def register(spark: SparkSession): Unit = {
    val exp = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].experimental
    if (!exp.extraStrategies.contains(GroupedTopKStrategy))
      exp.extraStrategies = exp.extraStrategies :+ GroupedTopKStrategy
  }
}
