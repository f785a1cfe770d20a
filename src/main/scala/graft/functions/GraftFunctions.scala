package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

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
      }),
    (new FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "graft_minhash"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "graft_minhash takes (array<long>, k)")
        val k = children(1) match {
          case Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"graft_minhash k must be an integer literal, got $other")
        }
        MinHashSignature(children.head, k)
      }),
    (new FunctionIdentifier("graft_simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "graft_simhash64"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "graft_simhash64 takes exactly 1 argument")
        SimHash64(children.head)
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
