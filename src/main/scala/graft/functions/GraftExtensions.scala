package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SparkSessionExtensions entry point: registers the engine's native
  * expressions at session build time, so a cluster can enable them with
  * `spark.sql.extensions=graft.functions.GraftExtensions` (no driver code).
  *
  *   SparkSession.builder().withExtensions(new GraftExtensions) …
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("graft_token_count"),
      new ExpressionInfo(classOf[TokenCount].getName, "graft_token_count"),
      exprs => TokenCount(GraftFunctions.unary("graft_token_count", exprs))))
    e.injectFunction((
      FunctionIdentifier("graft_simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "graft_simhash64"),
      exprs => SimHash64(GraftFunctions.unary("graft_simhash64", exprs))))
  }
}
