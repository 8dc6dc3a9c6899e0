package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The portable 48-bit text hash (first 6 md5 bytes, big-endian) as a
  * single native expression.
  *
  * Exactly equal to the composed declarative form
  * `conv(substring(md5(c), 1, 12), 16, 10) :: long` (TextOps
  * .portableHash64 / the oracle's hSql fold) but skips the hex-string
  * render, substring, and base-16 string re-parse — one digest over the
  * UTF-8 bytes, six byte shifts. GraftOptimization.NativePortableHash
  * rewrites the composed form to this node, so user code can stay
  * declarative and still get the native inner loop.
  */
case class PortableHash48(child: Expression) extends UnaryExpression
  with ExpectsInputTypes {

  // Strict (non-coercing) input check: a wrong-typed SQL call like
  // portable_hash48(id) must fail at ANALYSIS time, not as a runtime
  // ClassCastException / Janino failure. Deliberately not
  // ImplicitCastInputTypes — numeric→string coercion would silently
  // accept (and hash the rendering of) non-text columns.
  override def inputTypes: Seq[org.apache.spark.sql.graft.ColumnBridge.AbstractType] = Seq(StringType)

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    PortableHash48.hash(input.asInstanceOf[UTF8String])

  // NOTE: the static entry must NOT be named `eval` — a companion method
  // whose name collides with an inherited member (Expression.eval) gets
  // no static forwarder from scalac, so generated code referencing it
  // fails Janino compilation and the whole stage silently runs
  // interpreted (the exact fallback this expression exists to avoid).
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PortableHash48.hash($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "portable_hash48"
}

object PortableHash48 {
  /** Static entry for generated code. UTF8String.getBytes IS the UTF-8
    * encoding, so this equals hash48(s.toString) without the copy when
    * the backing array is exact.
    */
  def hash(s: UTF8String): Long = ShingleHashes.hash48bytes(s.getBytes)
}
