package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{IntegerType, LongType}

import graft.functions._
import graft.plans.{AsOfJoinStrategy, NativePortableHash}

/** The library's `SparkSessionExtensions` entry point — activate with
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * (or `.withExtensions(new GraftExtensions)`). Installs:
  *  - SQL bindings for every graft native expression, so `spark.sql`
  *    users get the same codegen'd fast paths as the Column API;
  *  - the NativePortableHash optimizer rule (composed md5/conv hash
  *    pattern → one-pass native digest);
  *  - the AsOfJoin planner strategy (custom logical operator → sorted
  *    merge exec).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intLit(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case Literal(v: Long, LongType) if v.isValidInt => v.toInt
    case other => throw new IllegalArgumentException(
      s"$fn: expected an int-range integer literal argument, got $other")
  }

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("shingle_hashes"),
      info("shingle_hashes", "shingle_hashes(text, n)"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "shingle_hashes(text, n)")
        ShingleHashes(args.head, intLit(args(1), "shingle_hashes"))
      }))

    ext.injectFunction((FunctionIdentifier("portable_hash48"),
      info("portable_hash48", "portable_hash48(text)"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "portable_hash48(text)")
        PortableHash48(args.head)
      }))

    ext.injectFunction((FunctionIdentifier("rolling_hash_min"),
      info("rolling_hash_min", "rolling_hash_min(text, w)"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "rolling_hash_min(text, w)")
        RollingHashMin(args.head, intLit(args(1), "rolling_hash_min"))
      }))

    ext.injectFunction((FunctionIdentifier("dot_product"),
      info("dot_product", "dot_product(a, b)"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "dot_product(a, b)")
        DotProduct(args.head, args(1))
      }))

    ext.injectFunction((FunctionIdentifier("normalize_vector"),
      info("normalize_vector", "normalize_vector(v)"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "normalize_vector(v)")
        NormalizeVector(args.head)
      }))

    ext.injectFunction((FunctionIdentifier("parse_log"),
      info("parse_log", "parse_log(line)"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "parse_log(line)")
        ParseCombinedLog(args.head)
      }))

    ext.injectFunction((FunctionIdentifier("render_log_line"),
      info("render_log_line", "render_log_line(struct)"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "render_log_line(struct)")
        RenderLogLine(args.head)
      }))

    ext.injectFunction((FunctionIdentifier("eval_once"),
      info("eval_once", "eval_once(expr) — evaluate-once barrier: stops CollapseProject/pushdown from duplicating an expensive expression into every consumer"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "eval_once(expr)")
        EvalBarrier(args.head)
      }))

    ext.injectFunction((FunctionIdentifier("freq_items"),
      info("freq_items", "freq_items(col, k)"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "freq_items(col, k)")
        FrequentItems(args.head, intLit(args(1), "freq_items")).toAggregateExpression()
      }))

    ext.injectOptimizerRule(_ => NativePortableHash())
    ext.injectPlannerStrategy(_ => AsOfJoinStrategy())
  }
}
