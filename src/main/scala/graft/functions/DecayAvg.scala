package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Custom typed aggregate (SURVEY.md §2.4 `agg_custom_udaf`): time-weighted
  * average where each value is weighted by an integer recency weight (days
  * since a fixed epoch). Inputs arrive pre-scaled to exact integer cents, so
  * the whole merge tree is associative Long addition — deterministic under
  * any partial-aggregation order — and only the final `evaluate` divides in
  * double space (mirrored 1:1 by the oracle SQL).
  */
case class WeightedIn(w: Long, xc: Long)

object DecayAvgAggregator extends Aggregator[WeightedIn, (Long, Long), Double] {
  override def zero: (Long, Long) = (0L, 0L)
  override def reduce(b: (Long, Long), a: WeightedIn): (Long, Long) =
    (b._1 + a.w * a.xc, b._2 + a.w)
  override def merge(b1: (Long, Long), b2: (Long, Long)): (Long, Long) =
    (b1._1 + b2._1, b1._2 + b2._2)
  override def finish(r: (Long, Long)): Double =
    r._1.toDouble / (100.0 * r._2.toDouble)
  override def bufferEncoder: Encoder[(Long, Long)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
