package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Add, ArrayAggregate,
  Divide, Expression, ExpressionInfo, LambdaFunction, Literal, Multiply,
  NamedLambdaVariable, Sqrt, ZipWith}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

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
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach(e.injectFunction)
    e.injectOptimizerRule(_ => RewriteHofDotProduct)
    e.injectOptimizerRule(_ => BoundedLevenshtein)
    e.injectOptimizerRule(_ => ProjectionRouter)
  }
}

/** Optimizer rule: rewrite the interpreted higher-order-function dot
  * product — `aggregate(zip_with(a, b, (x, y) => x * y), 0.0,
  * (acc, v) => acc + v)` — into the codegen'd [[DotProduct]]. The HOF
  * fold evaluates its lambdas interpreted (~20× slower on the all-pairs
  * scans); both spellings accumulate left-to-right in double, so the
  * rewrite is bit-exact. Conservative: fires only on the canonical
  * double-array shape (float arrays insert casts and keep the fold).
  */
object RewriteHofDotProduct extends Rule[LogicalPlan] {

  private def isIdentity(f: Expression): Boolean = f match {
    case LambdaFunction(body: NamedLambdaVariable,
                        Seq(arg: NamedLambdaVariable), _) =>
      body.exprId == arg.exprId
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(a, b, LambdaFunction(
              Multiply(x: NamedLambdaVariable, y: NamedLambdaVariable, _),
              Seq(xa: NamedLambdaVariable, ya: NamedLambdaVariable), _)),
            Literal(0.0, DoubleType),
            LambdaFunction(
              Add(acc: NamedLambdaVariable, v: NamedLambdaVariable, _),
              Seq(acca: NamedLambdaVariable, va: NamedLambdaVariable), _),
            finish)
          if x.exprId == xa.exprId && y.exprId == ya.exprId &&
             acc.exprId == acca.exprId && v.exprId == va.exprId &&
             isIdentity(finish) =>
        DotProduct(a, b)
    }
}

/** Optimizer rule: bound thresholded edit distance. A predicate
  * `levenshtein(a, b) <= k` (k a literal) computes the FULL O(|a|·|b|) DP
  * for every pair only to compare the result once. The rewrite
  *
  *   `abs(length(a) - length(b)) <= k AND levenshtein(a, b, k) >= 0`
  *
  * (1) short-circuits on the free length lower bound (edit distance ≥
  * length difference — most candidate pairs die on two length reads), and
  * (2) passes k into Spark's thresholded Levenshtein, whose banded DP is
  * O(k·min(len)) with early exit (it returns -1 past the threshold, hence
  * the `>= 0` comparison). Null behavior is identical: every conjunct
  * null-propagates from the same inputs. Fires only on the plain 2-arg
  * form, so the rewrite can't re-match its own output.
  */
object BoundedLevenshtein extends Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.{Abs, GreaterThanOrEqual,
    LessThanOrEqual, Length, Levenshtein, Subtract}
  import org.apache.spark.sql.types.IntegerType

  private def bounded(a: Expression, b: Expression, k: Int): Expression = {
    val lengthGuard = LessThanOrEqual(
      Abs(Subtract(Length(a), Length(b))), Literal(k))
    val thresholded = GreaterThanOrEqual(
      Levenshtein(a, b, Some(Literal(k))), Literal(0))
    org.apache.spark.sql.catalyst.expressions.And(lengthGuard, thresholded)
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case LessThanOrEqual(Levenshtein(a, b, None), Literal(k: Int, IntegerType)) =>
        bounded(a, b, k)
      case GreaterThanOrEqual(Literal(k: Int, IntegerType), Levenshtein(a, b, None)) =>
        bounded(a, b, k)
    }
}

object GraftExtensions {

  private def cosineExpr(args: Seq[Expression]): Expression = {
    val (a, b) = (args(0), args(1))
    // exact same tree as Functions.cosine → bit-parity with the oracles
    new Divide(DotProduct(a, b),
               new Multiply(Sqrt(DotProduct(a, a)), Sqrt(DotProduct(b, b))))
  }

  private def zorderExpr(args: Seq[Expression]): Expression = {
    import org.apache.spark.sql.catalyst.expressions.{BitwiseAnd, BitwiseOr,
      Cast, ShiftLeft}
    import org.apache.spark.sql.types.LongType
    // same spread steps as Relational.zorder2, built as a raw Catalyst
    // tree (the Column DSL produces lazily-resolved nodes the function
    // registry can't host)
    def spread(x0: Expression): Expression = {
      val steps = Seq(
        (16, 0x0000FFFF0000FFFFL), (8, 0x00FF00FF00FF00FFL),
        (4, 0x0F0F0F0F0F0F0F0FL), (2, 0x3333333333333333L),
        (1, 0x5555555555555555L))
      steps.foldLeft(Cast(x0, LongType): Expression) { case (acc, (s, m)) =>
        BitwiseAnd(BitwiseOr(acc, ShiftLeft(acc, Literal(s))), Literal(m))
      }
    }
    BitwiseOr(spread(args(0)), ShiftLeft(spread(args(1)), Literal(1)))
  }

  val functions: Seq[(FunctionIdentifier, ExpressionInfo,
                      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("dot_product"),
     new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
     (args: Seq[Expression]) => DotProduct(args(0), args(1))),
    (FunctionIdentifier("cosine_sim"),
     new ExpressionInfo(classOf[DotProduct].getName, "cosine_sim"),
     cosineExpr _),
    (FunctionIdentifier("zorder2"),
     new ExpressionInfo(Relational.getClass.getName, "zorder2"),
     zorderExpr _))

  /** Idempotent registration on an existing session. */
  def register(spark: SparkSession): Unit = {
    functions.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
    val rules = Seq(RewriteHofDotProduct, BoundedLevenshtein,
                    ProjectionRouter)
      .filterNot(spark.experimental.extraOptimizations.contains)
    if (rules.nonEmpty)
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations ++ rules
  }
}
