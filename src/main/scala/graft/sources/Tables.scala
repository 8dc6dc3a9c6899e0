package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Batch readers over the driver's parquet testdata.
  *
  * The reference engine's sources are Kafka + JDBC (see SURVEY.md §2.1
  * S1-S3, citing reference `LogAnalysis.java:54-70,138-152`); the batch
  * analog for this harness is parquet. All reads go through here so that:
  *
  *   - `events.ts` is normalized to a session-TZ (UTC) micro-precision
  *     TIMESTAMP whatever the parquet physical type: INT64
  *     TIMESTAMP(NANOS) (early driver drops; Spark 4.x refuses nano
  *     timestamps unless `spark.sql.legacy.parquet.nanosAsLong=true`, so
  *     we set that conf and rebuild from the raw longs) or timestamp[us]
  *     without UTC adjustment (later drops; arrives as TIMESTAMP_NTZ and
  *     is cast — value-preserving under the pinned UTC session).
  *   - Column pruning / predicate pushdown stay effective: we return the
  *     raw scan and let Catalyst prune (no eager .cache, no select(*) with
  *     extra derived columns except the ts fix).
  *
  * At cluster scale the same normalization is a cheap projection over the
  * vectorized parquet reader — no shuffle, fully codegen'd.
  */
object Tables {

  /** Set once per session; dynamic SQL confs, safe to set repeatedly.
    * UTC is part of graft's determinism contract: every timestamp
    * format/parse in the query surface (and its DuckDB oracle, which is
    * timezone-naive) assumes it — a session on a non-UTC default would
    * silently shift every rendered wall-clock string.
    */
  private def enableNanoReads(spark: SparkSession): Unit = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
  }

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    enableNanoReads(spark)
    // Base relations memoized per (session, path): the testdata is
    // read-only, so the parquet schema inference + file listing that
    // `spark.read.parquet` performs on every call is paid once per
    // session instead of once per query (~10 footer reads × 77 queries
    // otherwise). The cached object is only the analyzed read plan —
    // pruning/pushdown still specialize per query.
    SessionMemo(spark, ("table", sfDir, name)) {
      val df = spark.read.parquet(s"$sfDir/$name.parquet")
      if (name == "events")
        df.schema("ts").dataType match {
          case org.apache.spark.sql.types.LongType =>
            // nanos since epoch under nanosAsLong; truncate to micros
            // with INTEGER division (`div`). Column./ is floating-point:
            // ~1.7e18 exceeds double's 53-bit mantissa, so
            // (ts / 1000).cast("long") lands 1µs low on ~1.5% of values.
            df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
          case org.apache.spark.sql.types.TimestampNTZType =>
            df.withColumn("ts", col("ts").cast("timestamp"))
          case _ => df
        }
      else df
    }
  }

  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame = table(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}

/** Session-scoped DataFrame memo — one home for the idiom shared by
  * [[Tables]] (analyzed read plans) and the query surface's persisted
  * intermediates (e.g. the LSH pair table).
  *
  * Lifecycle, honestly: the cached DataFrames strongly reference their
  * SparkSession, so a WeakHashMap entry whose value lives in the map can
  * never be reclaimed by the weak key alone (value → key pin). That is
  * acceptable in this engine's intended layout — ONE session per JVM
  * (the driver-contract mains and the shared test session) — where
  * entries are supposed to live until process exit. A JVM that cycles
  * many sessions must release explicitly via [[clear]].
  */
private[graft] object SessionMemo {
  private val caches =
    new java.util.WeakHashMap[SparkSession, java.util.concurrent.ConcurrentHashMap[Any, DataFrame]]()

  private def sessionCache(spark: SparkSession) = caches.synchronized {
    var m = caches.get(spark)
    if (m == null) {
      m = new java.util.concurrent.ConcurrentHashMap[Any, DataFrame]()
      caches.put(spark, m)
    }
    m
  }

  /** Build OUTSIDE the map lock: an entry's builder may itself consult
    * this memo (the LSH pair table reads base tables through it), and
    * nested updates inside `computeIfAbsent` are forbidden by
    * ConcurrentHashMap — under concurrent queries they deadlock. The
    * race is benign: builders are pure plan construction (a loser's
    * un-executed `persist()` holds no blocks), and `putIfAbsent` keeps
    * exactly one winner.
    */
  def apply(spark: SparkSession, key: Any)(build: => DataFrame): DataFrame = {
    val m = sessionCache(spark)
    val existing = m.get(key)
    if (existing != null) existing
    else {
      val built =
        if (!recording.get) build
        else {
          // Bench attribution mode: pay the memo's materialization HERE
          // (an eager count on persisted frames — the cost a first-user
          // query would otherwise absorb into its own timing) and log
          // (key, seconds) so Bench can report memo builds as their own
          // line instead of charging them to whichever query runs first.
          val t0 = System.nanoTime()
          val b = build
          if (b.storageLevel != org.apache.spark.storage.StorageLevel.NONE) b.count()
          buildLog.add(keyLabel(key) -> (System.nanoTime() - t0) / 1e9)
          b
        }
      val raced = m.putIfAbsent(key, built)
      if (raced != null) raced else built
    }
  }

  // --- memo-build attribution (Bench-only; off by default) ---
  private val recording = new java.util.concurrent.atomic.AtomicBoolean(false)
  private val buildLog =
    new java.util.concurrent.ConcurrentLinkedQueue[(String, Double)]()

  /** Human label for a memo key: the name component of the (name, sfDir,
    * ...) tuples every call site uses, not the path-bearing toString.
    */
  private def keyLabel(key: Any): String = key match {
    case p: Product if p.productArity >= 1 => p.productIterator.next().toString
    case other => other.toString
  }

  /** Turn memo-build timing on/off (Bench sets it around its passes). */
  def record(on: Boolean): Unit = recording.set(on)

  /** Drain and return the (key, seconds) build events logged since the
    * last drain. Bench calls this after each timed query and subtracts
    * the drained seconds from that query's wall time.
    */
  def drainBuildLog(): Seq[(String, Double)] = {
    val out = scala.collection.mutable.ArrayBuffer[(String, Double)]()
    var e = buildLog.poll()
    while (e != null) { out += e; e = buildLog.poll() }
    out.toSeq
  }

  /** Drop a session's entries (does not unpersist cached data — callers
    * owning persisted frames should `spark.catalog.clearCache()` too,
    * or use [[release]] which does both).
    */
  def clear(spark: SparkSession): Unit = caches.synchronized { caches.remove(spark) }

  /** Evict one entry, unpersisting its frame if it was persisted
    * (no-op otherwise). The targeted hook for a caller done with a
    * heavyweight memo (tri_edges, pagerank_edges, bm25_perdoc) in a
    * session that keeps running other work.
    */
  def evict(spark: SparkSession, key: Any): Unit = {
    val m = caches.synchronized { caches.get(spark) }
    if (m != null) {
      val df = m.remove(key)
      if (df != null) df.unpersist(blocking = false)
    }
  }

  /** Drop a session's entries AND unpersist their frames — the
    * storage-pressure eviction hook for long-lived sessions cycling
    * many SFs. `unpersist` is a no-op on never-persisted plans, so
    * this is safe to call unconditionally (Soak does, between modes).
    */
  def release(spark: SparkSession): Unit = {
    val m = caches.synchronized { caches.remove(spark) }
    if (m != null)
      m.values.forEach(df => df.unpersist(blocking = false))
  }
}
