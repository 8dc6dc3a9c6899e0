package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Unit-normalize an `array<double>` in one native pass: norm =
  * sqrt(left-fold sum of squares), each element divided by it — the
  * exact formula of the oracle's `list_transform(v, x -> x /
  * sqrt(list_reduce(...)))`, but O(d) per vector. The higher-order-
  * function form re-evaluates the interpreted dot+sqrt lambda body for
  * EVERY element (O(d²)), and no projection restructuring reliably stops
  * Catalyst from inlining the norm back into the lambda — hence native.
  */
case class NormalizeVector(child: Expression) extends UnaryExpression
  with ExpectsInputTypes {

  // Strict array<double>; see DotProduct for the no-coercion rationale.
  override def inputTypes: Seq[org.apache.spark.sql.graft.ColumnBridge.AbstractType] = Seq(ArrayType(DoubleType))

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    NormalizeVector.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NormalizeVector.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "normalize_vector"
}

object NormalizeVector {
  def compute(a: ArrayData): ArrayData = {
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) { val x = a.getDouble(i); s += x * x; i += 1 }
    val nrm = math.sqrt(s)
    val out = new Array[Double](n)
    i = 0
    while (i < n) { out(i) = a.getDouble(i) / nrm; i += 1 }
    new GenericArrayData(out)
  }
}
