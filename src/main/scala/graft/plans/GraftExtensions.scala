package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SparkSessionExtensions registrar: exposes the custom codegen expressions
  * as SQL functions, so `spark.sql("SELECT graft_poly_hash(text, 7) ...")`
  * works anywhere the Column API does. Activate with
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")` or
  * `.withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def longLit(e: Expression, fn: String): Long = e match {
    case Literal(v: Long, _) => v
    case Literal(v: Int, _) => v.toLong
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal integer seed, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    // whole-operator surface: the GroupedTopK strategy + the optimizer rule
    // rewriting Filter(rn<=k, Window(row_number)) into it
    ext.injectPlannerStrategy(_ => GroupedTopKStrategy)
    ext.injectOptimizerRule(_ => TopKRewriteRule)
    ext.injectFunction((FunctionIdentifier("graft_fixed_dot"),
      new ExpressionInfo(classOf[FixedDot].getName, "graft_fixed_dot"),
      (args: Seq[Expression]) => FixedDot(args(0), args(1))))
    ext.injectFunction((FunctionIdentifier("graft_poly_hash"),
      new ExpressionInfo(classOf[PolyHash].getName, "graft_poly_hash"),
      (args: Seq[Expression]) => PolyHash(args(0), longLit(args(1), "graft_poly_hash"))))
    ext.injectFunction((FunctionIdentifier("graft_poly_hash_array"),
      new ExpressionInfo(classOf[PolyHashArray].getName, "graft_poly_hash_array"),
      (args: Seq[Expression]) =>
        PolyHashArray(args(0), longLit(args(1), "graft_poly_hash_array"))))
    ext.injectFunction((FunctionIdentifier("graft_simhash60"),
      new ExpressionInfo(classOf[SimHash60].getName, "graft_simhash60"),
      (args: Seq[Expression]) => SimHash60(args(0))))
    ext.injectFunction((FunctionIdentifier("graft_minhash_sigs"),
      new ExpressionInfo(classOf[MinHashSigs].getName, "graft_minhash_sigs"),
      (args: Seq[Expression]) =>
        MinHashSigs(args(0), longLit(args(1), "graft_minhash_sigs").toInt)))
    ext.injectFunction((FunctionIdentifier("graft_shingles3"),
      new ExpressionInfo(classOf[Shingles3].getName, "graft_shingles3"),
      (args: Seq[Expression]) => Shingles3(args(0))))
  }
}
