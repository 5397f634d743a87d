package graft.operators

import org.apache.spark.sql.DataFrame

/** Shared connected-components kernel (used by the co-purchase graph's
  * `graph_cc` and the near-dup `dedup_clusters` fast path).
  *
  * Single-task disjoint-set union over a (small) edge list: one executor
  * core unions all edges and emits (node, min-id-of-component) — identical
  * output to a min-label propagation fixpoint. The size gate lives at the
  * callers: a VERIFIED pair/edge set is orders of magnitude smaller than
  * the base table, so below [[graft.llm.Dedup.DsuEdgeCap]] one task beats
  * the iterative loop's ~6 shuffles per round + driver sync per convergence
  * check; past the cap the distributed propagation loop (see
  * `Dedup.clusterAssignLoop`) computes the same labeling.
  */
private[graft] object Components {

  /** (u, v) edges → (node, component) with component = min node id
    * reachable. Mirrored/duplicate edges are harmless (same unions). */
  def dsuLabels(edges: DataFrame): DataFrame = {
    val s = edges.sparkSession
    import s.implicits._
    edges.as[(Long, Long)]
      .coalesce(1)
      .mapPartitions { it =>
        val parent = scala.collection.mutable.Map.empty[Long, Long]
        def find(x: Long): Long = {
          var r = x
          while (parent(r) != r) { parent(r) = parent(parent(r)); r = parent(r) }
          r
        }
        val seen = scala.collection.mutable.ArrayBuffer.empty[Long]
        for ((u, v) <- it) {
          for (n <- Seq(u, v)) if (!parent.contains(n)) { parent(n) = n; seen += n }
          val (ru, rv) = (find(u), find(v))
          if (ru != rv) parent(ru) = rv
        }
        val minOf = scala.collection.mutable.Map.empty[Long, Long]
        for (n <- seen) {
          val r = find(n)
          minOf(r) = math.min(minOf.getOrElse(r, Long.MaxValue), n)
        }
        seen.iterator.map(n => (n, minOf(find(n))))
      }
      .toDF("node", "component")
  }
}
