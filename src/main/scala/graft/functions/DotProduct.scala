package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Sequential-fold dot product of two `array<double>` columns.
  *
  * Replaces `aggregate(zip_with(a, b, _*_), 0.0, _+_)`: the higher-order
  * form is CodegenFallback (interpreted lambdas, boxed doubles, a
  * materialized zipped array per row) — this is the hot inner loop of
  * cosine similarity search, so it gets a native expression with a tight
  * primitive loop. Accumulation order is the same left fold, so results
  * are bit-identical to the HOF form and to the DuckDB oracle's
  * `list_reduce`.
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression
  with ExpectsInputTypes {

  // Strict array<double> on both sides (nullability ignored by the
  // sameType check). float embeddings must be cast explicitly — an
  // implicit float→double coercion here would hide a silent precision
  // change from the oracle's all-double arithmetic.
  override def inputTypes: Seq[org.apache.spark.sql.graft.ColumnBridge.AbstractType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any =
    DotProduct.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.DotProduct.compute($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "dot_product"
}

object DotProduct {
  def compute(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    s
  }
}
