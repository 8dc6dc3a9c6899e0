package graft.functions

import java.time.format.DateTimeFormatter
import java.time.{Instant, ZoneOffset}
import java.util.Locale

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass renderer for graft's synthetic combined log lines.
  *
  * SEMANTIC CONTRACT: must produce byte-identical output to the
  * documented deterministic mapping in graft.logs.LogGen (which the
  * DuckDB oracles recompute from `events` directly — `q_parse_fields`
  * cross-checks every field of every line, so any drift fails the gate).
  * Native because the composed concat/CASE/date_format tree costs ~10µs
  * per row and dominates the three log-analytics queries.
  *
  * Input: struct(event_id long, user_id long, event_type string,
  * ts timestamp/micros).
  */
case class RenderLogLine(child: Expression) extends UnaryExpression {

  // Positional struct contract: (id long, user long, type string,
  // ts timestamp). Checked structurally (field names free) so a
  // wrong-shaped SQL call fails analysis, not codegen/runtime.
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val expected = Seq(LongType, LongType, StringType, TimestampType)
    child.dataType match {
      case StructType(fields) if fields.length == 4 &&
        fields.map(_.dataType).zip(expected).forall { case (a, b) => org.apache.spark.sql.graft.ColumnBridge.sameType(a, b) } =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"render_log_line expects struct<event_id:bigint,user_id:bigint," +
            s"event_type:string,ts:timestamp>, got ${other.catalogString}")
    }
  }

  override def dataType: DataType = StringType

  /** Can return null for null struct FIELDS even though the struct
    * itself (the child) is never null.
    */
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    RenderLogLine.render(input.asInstanceOf[InternalRow])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.RenderLogLine.render($c);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "render_log_line"
}

object RenderLogLine {

  private val dtFmt = DateTimeFormatter
    .ofPattern("dd/MMM/yyyy:HH:mm:ss", Locale.US)
    .withZone(ZoneOffset.UTC)

  /** row = (event_id, user_id, event_type, ts_micros).
    *
    * Null semantics mirror the composed expression tree exactly:
    * the `when(id % 97 = 0)` branch reads ONLY event_id, so a malformed
    * line renders even when user_id/ts are null; otherwise null
    * id/user_id/ts propagate to a NULL line (concat semantics); a null
    * event_type falls into the CASE's `otherwise` (ajax) branch.
    */
  def render(row: InternalRow): UTF8String = {
    if (row.isNullAt(0)) return null
    val id = row.getLong(0)
    if (id % 97 == 0) return UTF8String.fromString(s"### malformed #$id ###")
    if (row.isNullAt(1) || row.isNullAt(3)) return null
    val u = row.getLong(1)
    val eventType = if (row.isNullAt(2)) null else row.getUTF8String(2).toString
    val tsMicros = row.getLong(3)

    val sb = new java.lang.StringBuilder(192)
    sb.append("10.").append(u % 250).append('.').append(u * 7 % 250)
      .append('.').append(1 + u * 13 % 250)
    sb.append(" - - [")
    sb.append(dtFmt.format(Instant.ofEpochSecond(Math.floorDiv(tsMicros, 1000000L))))
    sb.append(" +0000] \"")

    val emptyReq = id % 89 == 0
    if (emptyReq) sb.append('-')
    else {
      sb.append(if (eventType == "purchase") "POST " else "GET ")
      eventType match {
        case "view" =>
          sb.append("/forum.php?mod=viewthread&tid=").append(1 + id % 40).append("&extra=page%3D1")
        case "purchase" =>
          sb.append("/forum.php?mod=viewthread&tid=").append(1 + id % 40).append("&from=fav")
        case "click" =>
          sb.append("/forum.php?mod=forumdisplay&fid=").append(1 + id % 15)
        case "signup" =>
          sb.append("/member.php?mod=register")
        case _ =>
          sb.append("/forum.php?mod=ajax&action=checknew&fid=").append(1 + id % 15)
      }
      sb.append(" HTTP/1.1")
    }
    sb.append("\" ")
    sb.append(
      if (emptyReq) "408"
      else if (id % 10 == 0) "404"
      else if (id % 7 == 3) "500"
      else "200")
    sb.append(' ')
    if (emptyReq || id % 13 == 0) sb.append('-') else sb.append(200 + id % 9000)
    sb.append(" \"")
    if (id % 3 == 0) sb.append('-')
    else sb.append("http://kms-4/forum.php?mod=forumdisplay&fid=").append(1 + id % 15)
    sb.append("\" \"Mozilla/5.0 (compatible; GraftBot/").append(u % 5).append(".0)\"")
    UTF8String.fromString(sb.toString)
  }
}
