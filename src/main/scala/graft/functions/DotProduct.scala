package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for the embedding dot product
  * (SURVEY §2.2 L3 similarity): `Σ aᵢ·bᵢ` over two array<float|double>
  * columns with full whole-stage-codegen support — the tier-(b)
  * extension path (custom `Expression` beats a Scala UDF beats anything
  * else): no boxing, no Row conversion, a tight primitive loop reading
  * the columnar ArrayData directly. The interpreted fallback
  * (`nullSafeEval`) matches the generated code bit-for-bit (same
  * left-to-right double accumulation as [[VectorFns.dot]]).
  */
case class DotProductFloat(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def elemType(t: DataType): Option[DataType] = t match {
    case ArrayType(FloatType, _) => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _ => None
  }

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (elemType(left.dataType).isDefined && elemType(right.dataType).isDefined)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_dot expects array<float|double> inputs, got " +
          s"${left.dataType.catalogString} / ${right.dataType.catalogString}")

  private def get(a: ArrayData, t: DataType, i: Int): Double = t match {
    case FloatType => a.getFloat(i).toDouble
    case _ => a.getDouble(i)
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val lt = elemType(left.dataType).get
    val rt = elemType(right.dataType).get
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += get(x, lt, i) * get(y, rt, i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      def read(arr: String, t: DataType, idx: String): String = t match {
        case FloatType => s"(double) $arr.getFloat($idx)"
        case _ => s"$arr.getDouble($idx)"
      }
      val la = read(a, elemType(left.dataType).get, i)
      val rb = read(b, elemType(right.dataType).get, i)
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $la * $rb;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductFloat =
    copy(left = newLeft, right = newRight)
}

object DotProduct {

  /** Column-level entry point: `graft_dot(a, b)`. */
  def dotNative(a: Column, b: Column): Column =
    Bridge.column(DotProductFloat(Bridge.expression(a), Bridge.expression(b)))

  /** SQL registration (`SELECT graft_dot(e1, e2) ...`). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    Bridge.registerFunction(spark, "graft_dot",
      exprs => DotProductFloat(exprs(0), exprs(1)))
}
