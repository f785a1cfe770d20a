package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Registration for the engine's native expressions — both wiring
  * styles Spark supports:
  *
  *  - `spark.sql.extensions=graft.GraftExtensions` at session build
  *    (the SparkSessionExtensions path, used by Main);
  *  - [[GraftFunctions.register]] on a live session (idempotent; called
  *    by query entry points so the library works on any session).
  *
  * Either way `graft_dot_f32(a, b)` becomes available to SQL and to
  * `call_function` in the DataFrame API.
  */
object GraftFunctions {

  private val fns: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (new FunctionIdentifier("graft_dot_f32"),
      new ExpressionInfo(classOf[DotProductF32].getName, "graft_dot_f32"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "graft_dot_f32 takes exactly 2 arguments")
        DotProductF32(children.head, children(1))
      }))

  /** Idempotent runtime registration into the session's function
    * registry. */
  def register(spark: SparkSession): Unit =
    fns.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }

  private[functions] def inject(ext: SparkSessionExtensions): Unit =
    fns.foreach(ext.injectFunction(_))
}

/** `spark.sql.extensions` entry point. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.inject(ext)
}
