package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** text → array of portable 48-bit hashes of its DISTINCT word n-gram
  * shingles, in one native pass.
  *
  * Semantics contract (mirrored by the DuckDB oracle, and equal to the
  * composed built-ins it replaces):
  *   tokens   = split(trim(text), "\\s+")
  *   shingles = distinct n-grams "w_i w_i+1 ... w_i+n-1" (empty if <n tokens)
  *   hash(g)  = first 12 hex chars of md5(g) as a long
  *              (= first 6 md5 bytes, big-endian)
  *
  * Why native: the built-in form (`transform(sequence(...), concat_ws)`
  * + `array_distinct` + `conv(substring(md5))`) runs as interpreted
  * lambda expressions (higher-order functions are CodegenFallback) and
  * gets re-evaluated by every consumer. This expression generates one
  * static call, stays inside whole-stage codegen, and reuses a
  * thread-local MessageDigest. It is the hot inner loop of MinHash/LSH
  * dedup at 100 TB — shingle hashing is ~all the CPU of that pipeline.
  */
case class ShingleHashes(child: Expression, n: Int) extends UnaryExpression
  with ExpectsInputTypes {

  // Strict: reject non-text input at analysis time (no implicit
  // numeric→string coercion; hashing a rendered number is never intended).
  override def inputTypes: Seq[org.apache.spark.sql.graft.ColumnBridge.AbstractType] = Seq(StringType)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    ShingleHashes.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleHashes.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "shingle_hashes"
}

object ShingleHashes {

  private val digest: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** First 6 bytes of md5(s) as an unsigned big-endian long — exactly the
    * fold of the first 12 hex chars (TextOps.portableHash64 / oracle hSql).
    */
  def hash48(s: String): Long = hash48bytes(s.getBytes("UTF-8"))

  def hash48bytes(utf8: Array[Byte]): Long = {
    val md = digest.get()
    md.reset()
    val d = md.digest(utf8)
    ((d(0) & 0xffL) << 40) | ((d(1) & 0xffL) << 32) | ((d(2) & 0xffL) << 24) |
      ((d(3) & 0xffL) << 16) | ((d(4) & 0xffL) << 8) | (d(5) & 0xffL)
  }

  /** SQL-`trim` + split, exactly as Spark `split(trim(c), "\\s+")` and
    * DuckDB `string_split_regex(trim(t), '\s+')` tokenize: trim strips
    * ONLY spaces (not \t/\n/\r like Java's String.trim), and the split
    * keeps leading/trailing empty tokens (limit -1; both engines do).
    */
  private[graft] def sqlTokens(s: String): Array[String] = {
    var b = 0
    var e = s.length
    while (b < e && s.charAt(b) == ' ') b += 1
    while (e > b && s.charAt(e - 1) == ' ') e -= 1
    s.substring(b, e).split("\\s+", -1)
  }

  def compute(text: UTF8String, n: Int): ArrayData = {
    val tokens = sqlTokens(text.toString)
    if (tokens.length < n) return new GenericArrayData(Array.emptyLongArray)
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    val sb = new java.lang.StringBuilder(64)
    while (i <= tokens.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(tokens(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Long](seen.size())
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = hash48(it.next()); k += 1 }
    new GenericArrayData(out)
  }
}
