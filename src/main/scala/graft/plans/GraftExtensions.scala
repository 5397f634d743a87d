package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SparkSessionExtensions registrar: exposes the custom codegen expressions
  * as SQL functions, so `spark.sql("SELECT graft_poly_hash(text, 7) ...")`
  * works anywhere the Column API does. Activate with
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")` or
  * `.withExtensions(new GraftExtensions)`; [[GraftExtensions.registerAll]]
  * installs the same functions into an already-built session (used by the
  * declared `sql_registered_fns` query, since the driver's Verify session
  * is constructed without extensions).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    // whole-operator surface: the GroupedTopK strategy + the optimizer rule
    // rewriting Filter(rn<=k, Window(row_number)) into it
    ext.injectPlannerStrategy(_ => GroupedTopKStrategy)
    ext.injectOptimizerRule(_ => TopKRewriteRule)
    GraftExtensions.functions.foreach(ext.injectFunction)
  }
}

object GraftExtensions {

  private def longLit(e: Expression, fn: String): Long = e match {
    case Literal(v: Long, _) => v
    case Literal(v: Int, _) => v.toLong
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal integer seed, got $other")
  }

  /** The injectFunction tuples — shared between extension-built sessions
    * and post-hoc registration into an existing session. */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_fixed_dot"),
      new ExpressionInfo(classOf[FixedDot].getName, "graft_fixed_dot"),
      (args: Seq[Expression]) => FixedDot(args(0), args(1))),
    (FunctionIdentifier("graft_poly_hash"),
      new ExpressionInfo(classOf[PolyHash].getName, "graft_poly_hash"),
      (args: Seq[Expression]) => PolyHash(args(0), longLit(args(1), "graft_poly_hash"))),
    (FunctionIdentifier("graft_poly_hash_array"),
      new ExpressionInfo(classOf[PolyHashArray].getName, "graft_poly_hash_array"),
      (args: Seq[Expression]) =>
        PolyHashArray(args(0), longLit(args(1), "graft_poly_hash_array"))),
    (FunctionIdentifier("graft_simhash60"),
      new ExpressionInfo(classOf[SimHash60].getName, "graft_simhash60"),
      (args: Seq[Expression]) => SimHash60(args(0))),
    (FunctionIdentifier("graft_minhash_sigs"),
      new ExpressionInfo(classOf[MinHashSigs].getName, "graft_minhash_sigs"),
      (args: Seq[Expression]) =>
        MinHashSigs(args(0), longLit(args(1), "graft_minhash_sigs").toInt)),
    (FunctionIdentifier("graft_shingles3"),
      new ExpressionInfo(classOf[Shingles3].getName, "graft_shingles3"),
      (args: Seq[Expression]) => Shingles3(args(0))),
    (FunctionIdentifier("graft_zorder2"),
      new ExpressionInfo(classOf[ZOrder2].getName, "graft_zorder2"),
      (args: Seq[Expression]) => ZOrder2(args(0), args(1))))

  /** Install the graft_* SQL functions into an existing session (idempotent
    * — re-registration overwrites with the identical builder). */
  def registerAll(s: SparkSession): Unit =
    functions.foreach { case (id, info, builder) =>
      s.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}
