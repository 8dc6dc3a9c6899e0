package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Rabin-Karp rolling-hash document fingerprint: the minimum hash over
  * all `w`-char windows of the text.
  *
  * h(window) = fold over its chars: (acc * B + codepoint) mod M, with
  * B = 257, M = 1e9+7. The native implementation rolls in O(n) (drop the
  * leading char's B^(w-1) term, shift, add) — mathematically identical
  * to recomputing each window, which is what the DuckDB oracle does with
  * a nested list fold. Null when the text is shorter than the window.
  *
  * This is the robust-to-local-edit fingerprint of content-defined
  * chunking/winnowing schemes: a single edit only perturbs the w windows
  * covering it, so min-hash fingerprints of near-identical documents
  * usually coincide.
  */
case class RollingHashMin(child: Expression, w: Int) extends UnaryExpression
  with ExpectsInputTypes {

  // Strict: text only; see PortableHash48 for the no-coercion rationale.
  override def inputTypes: Seq[org.apache.spark.sql.graft.ColumnBridge.AbstractType] = Seq(StringType)

  override def dataType: DataType = LongType

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    RollingHashMin.compute(input.asInstanceOf[UTF8String], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("rollMin")
      s"""
         |Long $r = graft.functions.RollingHashMin.compute($c, $w);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.longValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "rolling_hash_min"
}

object RollingHashMin {
  val B = 257L
  val M = 1000000007L

  /** Boxed so generated code can branch on null (text shorter than w).
    *
    * Iterates Unicode CODEPOINTS, not UTF-16 code units: the DuckDB
    * oracle folds `ord(substr(s, i, 1))` with `length(s)` counted in
    * codepoints, so a supplementary-plane char (emoji etc.) must be one
    * window element with its full codepoint value on both sides.
    */
  def compute(text: UTF8String, w: Int): java.lang.Long = {
    val cps = text.toString.codePoints().toArray
    val n = cps.length
    if (n < w) return null
    // B^(w-1) mod M
    var pw = 1L
    var i = 0
    while (i < w - 1) { pw = pw * B % M; i += 1 }
    var h = 0L
    i = 0
    while (i < w) { h = (h * B + cps(i)) % M; i += 1 }
    var best = h
    i = w
    while (i < n) {
      h = ((h - cps(i - w) * pw % M + M) % M * B + cps(i)) % M
      if (h < best) best = h
      i += 1
    }
    java.lang.Long.valueOf(best)
  }
}
