package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.CosineSimilarity

/** Session extensions: registers the engine's native functions for SQL use
  * (`SELECT cosine_similarity(a, b) ...`). Activate with
  * `spark.sql.extensions=graft.plans.GraftExtensions` or pass to
  * `SparkSession.builder.withExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("cosine_similarity"),
      new ExpressionInfo(classOf[CosineSimilarity].getName,
        "cosine_similarity"),
      (exprs: Seq[Expression]) =>
        CosineSimilarity(exprs.head, exprs(1))))
  }
}
