package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.DataType

/** Identity wrapper marked non-deterministic — the supported
  * "evaluate once" barrier (the mechanism behind
  * `UserDefinedFunction.asNondeterministic`, used the same way by
  * [[ParseCombinedLog]]): CollapseProject and filter pushdown refuse to
  * duplicate or reorder non-deterministic expressions, so an expensive
  * pure expression wrapped in this evaluates exactly once per row in its
  * own projection instead of being inlined into every consumer.
  *
  * The expression IS pure — determinism is only disclaimed to pin its
  * evaluation point.
  */
case class EvalBarrier(child: Expression) extends UnaryExpression {

  override lazy val deterministic: Boolean = false

  override def dataType: DataType = child.dataType

  override def nullable: Boolean = child.nullable

  override def eval(input: InternalRow): Any = child.eval(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "eval_once"
}
