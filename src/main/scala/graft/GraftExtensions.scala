package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Divide, Expression,
  ExpressionInfo, Multiply, Sqrt}

/** SQL-surface registration for graft's native expressions (SURVEY.md
  * §7.6): makes `dot_product(a, b)` and `cosine_sim(a, b)` callable from
  * `spark.sql` — the same codegen'd [[DotProduct]] the DataFrame helpers
  * use, so SQL users get the native loop, not an interpreted HOF fold.
  *
  * Two registration paths:
  *  - `spark.sql.extensions=graft.GraftExtensions` at session build
  *    (the production/cluster path);
  *  - [[GraftExtensions.register]] on an already-built session (the
  *    library path — [[Sql.registerTables]] calls it, so any SQL entry
  *    point resolves the functions regardless of session origin).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(e.injectFunction)
}

object GraftExtensions {

  private def cosineExpr(args: Seq[Expression]): Expression = {
    val (a, b) = (args(0), args(1))
    // exact same tree as Functions.cosine → bit-parity with the oracles
    new Divide(DotProduct(a, b),
               new Multiply(Sqrt(DotProduct(a, a)), Sqrt(DotProduct(b, b))))
  }

  val functions: Seq[(FunctionIdentifier, ExpressionInfo,
                      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("dot_product"),
     new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
     (args: Seq[Expression]) => DotProduct(args(0), args(1))),
    (FunctionIdentifier("cosine_sim"),
     new ExpressionInfo(classOf[DotProduct].getName, "cosine_sim"),
     cosineExpr _))

  /** Idempotent registration on an existing session. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}
