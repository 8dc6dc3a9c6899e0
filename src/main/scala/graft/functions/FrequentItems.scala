package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries frequent-items (heavy hitters) sketch as a
  * `TypedImperativeAggregate` — the native path for mergeable sketch
  * state (mutable buffer, binary spill format, map-side partial merge).
  *
  * Guarantees (mergeable-summaries form): with k counters over n rows,
  * every item with true frequency > n/(k+1) is present in the output,
  * and each reported count c satisfies true - n/(k+1) <= c <= true.
  * When the column has at most k distinct values no decrement ever
  * fires, so counts are EXACT and deterministic — the regime
  * q_freq_items oracle-checks; FrequentItemsSpec property-tests the
  * bound in the approximate regime.
  *
  * Scale shape: state is at most k (item, count) pairs per partition
  * buffer regardless of input size; the shuffle carries one serialized
  * sketch per group per partition — heavy-hitter mining over 100 TB of
  * tokens/URLs without a full group-by of the universe.
  */
case class FrequentItems(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]]
  with UnaryLike[Expression]
  with ExpectsInputTypes {

  require(k > 0, "freq_items: k must be positive")

  // Strict string input: `update` stringifies the catalyst value, and
  // internal representations of non-string types (date ints, decimal
  // unscaled longs) would stringify to surprising keys — reject them at
  // analysis time instead.
  override def inputTypes: Seq[org.apache.spark.sql.graft.ColumnBridge.AbstractType] = Seq(StringType)

  override def dataType: DataType = ArrayType(new StructType()
    .add("item", StringType).add("cnt", LongType), containsNull = false)

  override def nullable: Boolean = false

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  private def addWeighted(buf: mutable.HashMap[String, Long], item: String, w: Long): Unit = {
    buf.get(item) match {
      case Some(c) => buf.update(item, c + w)
      case None =>
        buf.update(item, w)
        if (buf.size > k) {
          // Misra-Gries step: shed the (k+1)-th largest count from all
          val cut = buf.values.toSeq.sorted.apply(buf.size - k - 1)
          buf.toSeq.foreach { case (key, c) =>
            if (c - cut <= 0) buf.remove(key) else buf.update(key, c - cut)
          }
        }
    }
  }

  override def update(buf: mutable.HashMap[String, Long], input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) addWeighted(buf, v.toString, 1L)
    buf
  }

  override def merge(b1: mutable.HashMap[String, Long], b2: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b2.foreach { case (item, c) => addWeighted(b1, item, c) }
    b1
  }

  /** (item, cnt) pairs, count desc then item asc — deterministic. */
  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val rows = buf.toSeq.sortBy { case (item, c) => (-c, item) }.map { case (item, c) =>
      InternalRow(UTF8String.fromString(item), c)
    }
    new GenericArrayData(rows.toArray[Any])
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (item, c) =>
      val b = item.getBytes(StandardCharsets.UTF_8)
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.update(new String(b, StandardCharsets.UTF_8), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FrequentItems =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): FrequentItems =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(newChild: Expression): FrequentItems =
    copy(child = newChild)

  override def prettyName: String = "freq_items"
}
