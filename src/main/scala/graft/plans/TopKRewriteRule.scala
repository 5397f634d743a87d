package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Cast, Expression, LessThan, LessThanOrEqual, Literal, NamedExpression, RowNumber, SortOrder, WindowExpression, WindowSpecDefinition}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Injected optimizer rule (SURVEY §4): rewrites the per-group top-k idiom
  * into the native [[GroupedTopK]] operator.
  *
  * By the time user rules run (`experimental.extraOptimizations` /
  * `injectOptimizerRule` both execute after the main batch), Spark has
  * already canonicalized the idiom: the rank cast is pulled into a Project
  * above the Filter, and InferWindowGroupLimit has inserted its own
  * WindowGroupLimit below the Window (which LIMITS rows per group but still
  * fully sorts them — twice, around the shuffle). The shape this rule
  * matches is therefore
  *
  *   Project([.., cast(_we as bigint) AS rn],
  *     Filter(_we <= k,
  *       Window([row_number() AS _we], part, order,
  *         [WindowGroupLimit(part, order, row_number, k,)] child)))
  *
  * and it collapses everything below the Project into GroupedTopK(part,
  * order, k) — same Exchange, bounded heaps instead of the two sorts.
  * Values are identical by construction; PlanSpec asserts this against the
  * un-rewritten plan.
  *
  * Opt-in: active in [[GraftExtensions]]-built sessions or when added to
  * `experimental.extraOptimizations` — declared queries run WITHOUT it so
  * the window formulation stays an independent oracle path.
  */
object TopKRewriteRule extends Rule[LogicalPlan] {

  /** cond is `rank <= k` / `rank < k+1` on a bare attribute => (rank, k). */
  private def topkBound(cond: Expression): Option[(Attribute, Long)] = cond match {
    case LessThanOrEqual(a: Attribute, Literal(k: Long, LongType)) => Some((a, k))
    case LessThanOrEqual(a: Attribute, Literal(k: Int, IntegerType)) => Some((a, k.toLong))
    case LessThan(a: Attribute, Literal(k: Long, LongType)) => Some((a, k - 1))
    case LessThan(a: Attribute, Literal(k: Int, IntegerType)) => Some((a, k.toLong - 1))
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p @ Project(projList, Filter(cond, w: Window))
        if w.windowExpressions.size == 1 =>
      (topkBound(cond), w.windowExpressions.head) match {
        case (Some((rank, k)),
            al @ Alias(WindowExpression(RowNumber(),
              WindowSpecDefinition(part, order, _)), _))
            if rank.exprId == al.exprId && part.nonEmpty && order.nonEmpty &&
              k >= 1 && k <= Int.MaxValue =>
          // part.nonEmpty: a GLOBAL top-k (empty PARTITION BY) would make
          // requiredChildDistribution = ClusteredDistribution(Nil), which
          // Spark rejects — and without that require the per-partition heaps
          // would silently emit per-partition top-k. Spark already plans the
          // global case well (WindowGroupLimit / TakeOrderedAndProject).
          // our operator subsumes Spark's sort-based per-group limit
          val child = w.child match {
            case wgl: WindowGroupLimit if wgl.limit >= k => wgl.child
            case c => c
          }
          val rankAttr =
            AttributeReference(al.name, LongType, nullable = false)()
          val topk = GroupedTopK(part, order, k.toInt, rankAttr, child)
          // rank references above: cast(int-rank as bigint) becomes the
          // operator's long rank directly; a bare int reference re-narrows.
          // A bare rank attribute at the ROOT of a projection item must stay
          // a NamedExpression — alias the cast under the original name/exprId
          // instead of substituting a naked Cast.
          val newProj = projList.map {
            case a: Attribute if a.exprId == rank.exprId =>
              Alias(Cast(rankAttr, IntegerType), a.name)(exprId = a.exprId)
            case ne => ne.transform {
              case Cast(a: Attribute, LongType, _, _) if a.exprId == rank.exprId =>
                rankAttr
              case a: Attribute if a.exprId == rank.exprId =>
                Cast(rankAttr, IntegerType)
            }.asInstanceOf[NamedExpression]
          }
          Project(newProj, topk)
        case _ => p
      }
  }
}
