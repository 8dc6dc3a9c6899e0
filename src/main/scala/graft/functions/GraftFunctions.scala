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
}
