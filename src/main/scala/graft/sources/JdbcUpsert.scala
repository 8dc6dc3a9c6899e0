package graft.sources

import java.sql.Connection

import org.apache.spark.sql.DataFrame

/** JDBC PK-upsert writer — the reference's sink connector semantics
  * (`PRIMARY KEY ... NOT ENFORCED` + continuous upsert,
  * `LogAnalysis.java:100-115,156-171,220-237`; MySQL DDL
  * `README.md:248-272`) as a `foreachBatch` body.
  *
  * Executor-side layout: `foreachPartition` opens ONE connection per
  * partition, addBatch in chunks of `batchSize` — the same shape a JDBC
  * sink uses on a 1000-executor cluster (connections scale with
  * partitions, not rows; the aggregate changelog is small anyway).
  *
  * `connect` is injectable so tests can hand in an embedded/fake
  * connection; production passes a MySQL DriverManager thunk.
  */
class JdbcUpsert(
    table: String,
    columns: Seq[String],
    keyCols: Seq[String],
    connect: () => Connection,
    batchSize: Int = 500) extends Serializable {

  require(keyCols.forall(columns.contains), "key columns must be part of the column list")

  /** MySQL-dialect upsert statement:
    * INSERT INTO t (c1,c2,...) VALUES (?,?,...)
    * ON DUPLICATE KEY UPDATE c2=VALUES(c2), ...   (non-key columns only)
    */
  val upsertSql: String = {
    val cols = columns.mkString(", ")
    val placeholders = columns.map(_ => "?").mkString(", ")
    val updates = columns.filterNot(keyCols.contains)
      .map(c => s"$c = VALUES($c)").mkString(", ")
    s"INSERT INTO $table ($cols) VALUES ($placeholders) ON DUPLICATE KEY UPDATE $updates"
  }

  /** foreachBatch entry: upsert one micro-batch (or batch write) output. */
  def write(df: DataFrame, batchId: Long): Unit = {
    val sql = upsertSql
    val colNames = columns
    val bs = batchSize
    val mkConn = connect
    df.select(colNames.map(org.apache.spark.sql.functions.col): _*)
      .foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
        if (rows.hasNext) {
          val conn = mkConn()
          try {
            conn.setAutoCommit(false)
            val st = conn.prepareStatement(sql)
            var n = 0
            rows.foreach { r =>
              var i = 0
              while (i < colNames.length) { st.setObject(i + 1, r.get(i)); i += 1 }
              st.addBatch()
              n += 1
              if (n % bs == 0) st.executeBatch()
            }
            st.executeBatch()
            conn.commit()
          } finally conn.close()
        }
      }
  }
}
