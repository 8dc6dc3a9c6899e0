package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.ColumnBridge

/** Column-level entry points for graft's native Catalyst expressions. */
object GraftFunctions {

  /** One-pass combined-log parse → struct of the 9 record fields
    * (null struct when the line is not combined-format).
    */
  def parse_log(line: Column): Column =
    ColumnBridge.column(ParseCombinedLog(ColumnBridge.expression(line)))

  /** Distinct word n-gram shingles → portable 48-bit hashes, one native
    * pass (see [[ShingleHashes]]).
    */
  def shingle_hashes(text: Column, n: Int): Column =
    ColumnBridge.column(ShingleHashes(ColumnBridge.expression(text), n))

  /** Evaluate-once barrier for an expensive pure expression (see
    * [[EvalBarrier]]) — stops CollapseProject/pushdown duplication.
    */
  def eval_once(c: Column): Column =
    ColumnBridge.column(EvalBarrier(ColumnBridge.expression(c)))

  /** Native portable 48-bit hash (= conv(substring(md5(c),1,12),16,10)
    * as long, in one digest — see [[PortableHash48]]).
    */
  def portable_hash48(text: Column): Column =
    ColumnBridge.column(PortableHash48(ColumnBridge.expression(text)))

  /** Native sequential-fold dot product of two array<double> columns. */
  def dot_product(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Min Rabin-Karp rolling hash over w-char windows (see [[RollingHashMin]]). */
  def rolling_hash_min(text: Column, w: Int): Column =
    ColumnBridge.column(RollingHashMin(ColumnBridge.expression(text), w))

  /** One-pass unit normalization of an array<double> (see [[NormalizeVector]]). */
  def normalize_vector(v: Column): Column =
    ColumnBridge.column(NormalizeVector(ColumnBridge.expression(v)))

  /** Misra-Gries heavy-hitters aggregate: array<struct<item,cnt>> of at
    * most k frequent items (see [[FrequentItems]]); exact when the
    * column has <= k distinct values.
    */
  def freq_items(c: Column, k: Int): Column =
    ColumnBridge.column(FrequentItems(ColumnBridge.expression(c), k)
      .toAggregateExpression())

  /** One-pass synthetic combined-log-line renderer (see [[RenderLogLine]]). */
  def render_log_line(evStruct: Column): Column =
    ColumnBridge.column(RenderLogLine(ColumnBridge.expression(evStruct)))

  /** Codegen'd probe of a broadcast BloomFilter over a string column
    * (see [[BloomMightContainString]]).
    */
  def bloom_might_contain(
      bloom: org.apache.spark.broadcast.Broadcast[org.apache.spark.util.sketch.BloomFilter],
      c: Column): Column =
    ColumnBridge.column(BloomMightContainString(ColumnBridge.expression(c), bloom))

  /** Long-keyed Bloom probe — see [[BloomMightContainLong]]. */
  def bloom_might_contain_long(
      bloom: org.apache.spark.broadcast.Broadcast[org.apache.spark.util.sketch.BloomFilter],
      c: Column): Column =
    ColumnBridge.column(BloomMightContainLong(ColumnBridge.expression(c), bloom))

  /** Partition key for windows that are single-partition BY DESIGN
    * (group-count-bounded inputs: scalar totals, running sums over a
    * day table, complete-mode Top-N state). `pmod(hash(c), 1)` is
    * always 0 but OPAQUE to the optimizer — an arithmetic constant key
    * like `c * 0` gets folded when `c` is non-nullable, the folded key
    * is then eliminated from the partition spec, and WindowExec falls
    * back to the unpartitioned path with its "No Partition Defined"
    * WARN. This key keeps the plan an ordinary 1-key hashpartitioning:
    * same execution, intent stated, no WARN (verified by Prof winscan:
    * identical timing and row parity vs the empty spec).
    */
  def singleton_key(c: Column): Column =
    org.apache.spark.sql.functions.pmod(
      org.apache.spark.sql.functions.hash(c), org.apache.spark.sql.functions.lit(1))
}
