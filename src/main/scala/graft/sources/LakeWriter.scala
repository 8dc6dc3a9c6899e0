package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Output layout for the data lake — where 100 TB efficiency is decided
  * before any query runs:
  *
  *   - [[writeDatePartitioned]]: hive-style `dt=YYYY-MM-DD/` directories;
  *     date-bounded queries then touch only matching partitions
  *     (partition pruning shows as `PartitionFilters` in the scan).
  *   - [[writeBucketed]]: pre-hash rows into N buckets on the join/agg
  *     key; bucketed⋈bucketed on that key needs NO exchange on either
  *     side — the co-located join for fact⋈fact workloads.
  */
object LakeWriter {

  /** Write parquet partitioned by the date of `tsCol`. */
  def writeDatePartitioned(df: DataFrame, tsCol: String, path: String): Unit =
    df.withColumn("dt", date_format(col(tsCol), "yyyy-MM-dd"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("dt")
      .parquet(path)

  /** Idempotent backfill: overwrite ONLY the date partitions present in
    * `df` (dynamic partition overwrite), leaving every other partition
    * untouched. This is the lake reprocessing contract — re-running a
    * day's batch replaces that day exactly, never duplicates it and
    * never clears the table the way static overwrite mode would.
    */
  def overwriteDatePartitions(df: DataFrame, tsCol: String, path: String): Unit = {
    val spark = df.sparkSession
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      df.withColumn("dt", date_format(col(tsCol), "yyyy-MM-dd"))
        .write.mode(SaveMode.Overwrite)
        .partitionBy("dt")
        .parquet(path)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }

  /** Write parquet partitioned by an ANN index's coarse-cell column —
    * the IVFADC vector-store layout (codes + cell id on disk): a
    * probed-cell filter on read touches only nprobe of ncells
    * directories, so each query's scan IS the pruning
    * (`PartitionFilters` in the scan node; asserted by PlanSpec's
    * q_ann_ivfpq_pruned check). At 100 TB the code table is the only
    * corpus-sized index artifact and this layout is what turns
    * nprobe/ncells from a join selectivity into an IO bound.
    */
  def writeCellPartitioned(df: DataFrame, cellCol: String, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(cellCol).parquet(path)

  /** Write as a bucketed managed table (bucket pruning + shuffle-free
    * joins between tables bucketed the same way on the same key).
    */
  def writeBucketed(df: DataFrame, key: String, buckets: Int, table: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Interchange formats for ingest/export edges (the lake interior
    * stays parquet): CSV with header + explicit schema on read (never
    * inferSchema — a schema-inference pass over 100 TB is a full extra
    * scan), JSON lines likewise. Compression is gzip (the codec every
    * Hadoop build ships; swap for zstd where the native lib exists).
    */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("header", "true").option("compression", "gzip").csv(path)

  def readCsv(spark: org.apache.spark.sql.SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(path)

  def writeJsonLines(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("compression", "gzip").json(path)

  def readJsonLines(spark: org.apache.spark.sql.SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** ORC — the other columnar lake format (Hive-ecosystem interop).
    * Same pushdown/pruning properties as parquet in Spark's scan; zlib
    * is ORC's universally-available codec.
    */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("compression", "zlib").orc(path)

  def readOrc(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    spark.read.orc(path)
}
