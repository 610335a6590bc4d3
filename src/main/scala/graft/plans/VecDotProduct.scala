package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** Native codegen'd float-vector dot product.
  *
  * The declarative alternative (`aggregate(zip_with(...))`) runs
  * interpreted — Spark's higher-order functions don't participate in
  * whole-stage codegen and box every element; measured ~7-10× slower on
  * the ANN pair scan. This expression compiles to a tight primitive
  * loop inside the surrounding WholeStageCodegen stage.
  *
  * Used as the *prefilter* scorer; exact-decimal reduction (oracle
  * semantics, see SURVEY.md §4) is applied afterwards to the few
  * surviving pairs. Array elements must be non-null.
  */
case class VecDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(_.dataType == ArrayType(FloatType, containsNull = true)) ||
        Seq(left, right).forall(_.dataType == ArrayType(FloatType, containsNull = false)))
      TypeCheckResult.TypeCheckSuccess
    else if (Seq(left, right).forall(_.dataType.isInstanceOf[ArrayType]) &&
        Seq(left, right).forall(_.dataType.asInstanceOf[ArrayType].elementType == FloatType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot expects array<float> inputs, got ${left.dataType} / ${right.dataType}")

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDotProduct =
    copy(left = newLeft, right = newRight)
}

object VecDotProduct {
  /** Registers `vec_dot` in the session's function registry (public
    * extension path — Column construction from a raw Expression is
    * private[sql] in Spark 4). Idempotent. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot", exprs => VecDotProduct(exprs(0), exprs(1)), "built-in")

  /** Column-level API: fast approximate (double) dot product. Requires
    * [[register]] on the session first. */
  def vec_dot(a: Column, b: Column): Column = call_function("vec_dot", a, b)
}
