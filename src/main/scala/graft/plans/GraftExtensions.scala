package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Session-extensions entry point: registers graft's native
  * expressions so SQL users get them without touching the Scala API.
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)   // or
  *   .config("spark.sql.extensions", "graft.plans.GraftExtensions")
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDotProduct].getName, "vec_dot"),
      exprs => VecDotProduct(exprs(0), exprs(1))))
    // heap-based per-group top-k: rewrites the
    // Filter-over-row_number-Window shape and plans it without the
    // full per-group sort. Gated behind spark.graft.topk.enabled
    // (default off) because the heap state lives in task memory
    // without spill — see TopKPerGroup.EnabledKey.
    e.injectOptimizerRule(_ => TopKRewriteRule)
    e.injectPlannerStrategy(_ => TopKStrategy)
  }
}
