package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Cast, Conv, Expression, Literal, Md5, Substring}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{BinaryType, LongType, StringType}

import graft.functions.PortableHash48

/** Optimizer rule: rewrite the declarative portable-hash pattern
  *
  *   cast(conv(substring(md5(c), 1, 12), 16, 10) as bigint)
  *
  * (TextOps.portableHash64 — also what a SQL user writes by hand) to the
  * native [[PortableHash48]] expression: one md5 digest + six byte
  * shifts instead of digest → 32-char hex render → substring → base-16
  * string parse → long cast. Value-identical by construction (the first
  * 12 hex chars ARE the first 6 bytes big-endian), null-for-null alike.
  *
  * This is the extension-point showcase: user code stays composed from
  * built-ins; the session extension swaps in the fast path, the same way
  * Catalyst's own ReplaceExpressions lowers RuntimeReplaceable.
  */
case class NativePortableHash() extends Rule[LogicalPlan] {

  private def unwrapToString(e: Expression): Option[Expression] = e match {
    case Cast(s, BinaryType, _, _) if s.dataType == StringType => Some(s)
    case s if s.dataType == StringType => Some(s)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case Cast(
        Conv(Substring(Md5(input), Literal(1, _), Literal(12, _)),
          Literal(16, _), Literal(10, _), _),
        LongType, _, _) if unwrapToString(input).isDefined =>
      PortableHash48(unwrapToString(input).get)
  }
}
