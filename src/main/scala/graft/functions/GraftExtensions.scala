package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session-extension entry point (`spark.sql.extensions`): injects the
  * engine's native expressions into every session built with it — the
  * registration path a deployment uses (vs the per-session
  * [[CosineSim.register]] convenience used in tests/queries).
  *
  * Custom Rules/Strategies would be injected here too; per SURVEY §4 the
  * engine deliberately needs none — built-in Catalyst covers the plan
  * space, and the only custom code is expression-level.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "cosine_sim takes exactly 2 arguments")
        CosineSim(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("cosine_sim_i8"),
      new ExpressionInfo(classOf[CosineSimI8].getName, "cosine_sim_i8"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "cosine_sim_i8 takes exactly 2 arguments")
        CosineSimI8(children.head, children(1))
      }))
    ext.injectFunction(IcebergHash.info)
    ext.injectFunction(ZOrder2.info)
    ext.injectFunction(DupBigramCount.info)
  }
}
