package graft.plans

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graftshim.Shims

/** Session-extension injection for the engine's native expressions —
  * `spark.sql("SELECT cosine_sim(a, b)")` works after either
  * `.withExtensions(new GraftExtensions)` at build time or
  * `GraftExtensions.register(spark)` on a live session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.cosineSimDescriptor)
    ext.injectOptimizerRule(GlobalRankRewrite(_))
  }
}

object GraftExtensions {
  private val cosineSimDescriptor: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("cosine_sim"),
    new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
    (children: Seq[Expression]) => {
      require(children.length == 2, "cosine_sim expects exactly 2 arguments")
      CosineSimilarity(children.head, children.last)
    })

  /** Register on an existing session (tests / REPL): the function AND the
    * ranking rewrite (idempotent — skips if already attached). */
  def register(spark: SparkSession): Unit = {
    val (id, info, builder) = cosineSimDescriptor
    spark.sessionState.functionRegistry.registerFunction(id, info,
      (exprs: Seq[Expression]) => builder(exprs))
    if (!spark.experimental.extraOptimizations
        .exists(_.isInstanceOf[GlobalRankRewrite]))
      spark.experimental.extraOptimizations ++= Seq(GlobalRankRewrite(spark))
  }

  /** Column-API entry point. */
  def cosineSim(a: Column, b: Column): Column =
    Shims.column(CosineSimilarity(Shims.expression(a), Shims.expression(b)))
}
