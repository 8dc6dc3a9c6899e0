package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Codegen'd membership probe of a BROADCAST `BloomFilter` sketch over a
  * string column — the native replacement for the Scala UDF closure in
  * the Bloom-gated corpus dedup (`Dedup.exactVersusCorpusBloom`), which
  * planned a `ScalaUDF` node: per-row boxing + an interpreted call on
  * the hot batch-side scan.
  *
  * The broadcast HANDLE rides the expression (tiny, serializable); each
  * executor resolves the sketch once per codegen'd operator instance via
  * a mutable-state slot, so the per-row work is exactly one xxhash probe
  * of the local bits. Probing uses the UTF-8 bytes directly
  * (`mightContainBinary(getBytes)` == `mightContainString(toString)` —
  * the sketch hashes the UTF-8 encoding either way) to skip the
  * per-row String allocation a UDF forces.
  *
  * Spark's own `BloomFilterMightContain` (the runtime-filter expression)
  * is long-keyed (`might_contain(bloom, xxhash64(x))`) and wants the
  * serialized sketch inlined as a literal — re-serializing a corpus
  * Bloom (~GBs at 10⁹ keys) into every task binary is exactly what the
  * broadcast avoids, hence this expression instead.
  */
case class BloomMightContainString(
    child: Expression,
    bloom: Broadcast[BloomFilter]) extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[org.apache.spark.sql.graft.ColumnBridge.AbstractType] =
    Seq(StringType)

  override def dataType: DataType = BooleanType

  override def nullSafeEval(input: Any): Any =
    BloomMightContainString.contains(bloom.value, input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("bloomBc", bloom,
      classOf[Broadcast[_]].getName)
    // resolve the broadcast ONCE per operator instance, not per row —
    // Broadcast.value() takes a lock on its first-read path
    val bfType = classOf[BloomFilter].getName
    val bfVar = ctx.addMutableState(bfType, "graftBloom",
      v => s"$v = ($bfType)$bcRef.value();")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BloomMightContainString.contains($bfVar, $c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "bloom_might_contain"
}

object BloomMightContainString {
  /** Static entry for generated code. `UTF8String.getBytes` IS the
    * UTF-8 encoding, so this equals `bf.mightContainString(s.toString)`
    * without materializing the java.lang.String.
    */
  def contains(bf: BloomFilter, s: UTF8String): Boolean =
    bf.mightContainBinary(s.getBytes)
}

/** Long-keyed twin of [[BloomMightContainString]] — the probe side of
  * the manual runtime-filter join (`ops.RuntimeFilter`), where join
  * keys are integers (orderkeys, doc ids) and the per-row work must be
  * exactly one primitive-long hash of the broadcast-local bits.
  */
case class BloomMightContainLong(
    child: Expression,
    bloom: Broadcast[BloomFilter]) extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[org.apache.spark.sql.graft.ColumnBridge.AbstractType] =
    Seq(LongType)

  override def dataType: DataType = BooleanType

  override def nullSafeEval(input: Any): Any =
    bloom.value.mightContainLong(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("bloomBc", bloom,
      classOf[Broadcast[_]].getName)
    val bfType = classOf[BloomFilter].getName
    val bfVar = ctx.addMutableState(bfType, "graftBloomL",
      v => s"$v = ($bfType)$bcRef.value();")
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $bfVar.mightContainLong($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "bloom_might_contain_long"
}
