package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Codegen'd dot product over two array<double> columns.
  *
  * The composable formulation — aggregate(zip_with(a, b, _*_), 0.0, _+_) —
  * allocates an intermediate array per row and evaluates the lambda through
  * interpreted HigherOrderFunction paths; on a brute-force pair join that is
  * the entire runtime (37s of a 93s bench at sf0.1). This expression is the
  * Catalyst-native replacement: a fused loop over the two ArrayData buffers,
  * participating in whole-stage codegen, with arithmetic order identical to
  * the sequential aggregate (s += a[i]*b[i], left to right) so results are
  * bit-for-bit unchanged and the DuckDB oracle (list_dot_product on
  * DOUBLE[]) still matches.
  *
  * Escape-hatch preference order (SURVEY.md §7.3 / builder brief): compose
  * built-ins first, custom Expression second — this is the second case,
  * taken only after the composed version measured 20x slower.
  */
case class ArrayDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_dot expects two array<double>, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_dot"
}

object ArrayDotProduct {

  val NAME = "graft_dot"

  /** Idempotently register in the session's function registry (the public
    * path to Column construction from a custom Expression in Spark 4).
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      NAME, exprs => ArrayDotProduct(exprs(0), exprs(1)), "built-in")

  def dot(a: Column, b: Column): Column = call_function(NAME, a, b)
}
