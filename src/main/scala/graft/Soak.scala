package graft

import org.apache.spark.sql.SparkSession

/** Determinism soak (not part of the driver contract): run every harness
  * query N times in ONE session and fail on any run-to-run difference.
  * The DuckDB oracle gate compares one Spark run against DuckDB; this
  * catches what it cannot — nondeterminism BETWEEN Spark runs (sketch
  * merge order, cached-vs-recomputed paths like the LSH pair table,
  * accumulation-order noise that rounding failed to absorb).
  *
  * Run: `sbt "runMain graft.Soak [sfDir] [rounds]"` — exits non-zero on
  * any instability.
  */
object Soak {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val rounds = if (args.length > 1) args(1).toInt else 2
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def fingerprint(name: String): String = {
      val df = SparkEntry.queries(name)(spark, sfDir)
      // order-insensitive, value-exact: sorted row renderings
      df.collect().map(_.toString).sorted.mkString("\n")
    }
    var unstable = List.empty[String]
    val first = SparkEntry.queries.keys.toSeq.sorted.map(n => n -> fingerprint(n)).toMap
    for (r <- 2 to rounds; n <- first.keys.toSeq.sorted) {
      if (fingerprint(n) != first(n)) {
        unstable ::= s"$n (round $r)"
        println(s"[soak] UNSTABLE $n round $r")
      }
    }
    // Concurrency round: all queries at once from separate threads (the
    // BI-concurrency shape) — exercises thread safety of the shared
    // session, SessionMemo, and persisted intermediates, and that
    // results still match the sequential fingerprints.
    if (args.length > 2 && args(2) == "par") {
      import scala.concurrent.{Await, ExecutionContext, Future}
      import scala.concurrent.duration._
      implicit val ec: ExecutionContext =
        ExecutionContext.fromExecutor(java.util.concurrent.Executors.newFixedThreadPool(8))
      val results = Await.result(
        Future.sequence(first.keys.toSeq.sorted.map(n => Future(n -> fingerprint(n)))),
        20.minutes).toMap
      val parBad = results.filter { case (n, fp) => fp != first(n) }.keys.toSeq.sorted
      parBad.foreach(n => println(s"[soak] UNSTABLE $n (parallel)"))
      unstable :::= parBad.map(n => s"$n (parallel)").toList
      if (parBad.isEmpty) println(s"[soak] all ${first.size} queries stable under 8-way concurrency")
    }
    if (unstable.isEmpty) println(s"[soak] all ${first.size} queries stable over $rounds runs")
    spark.stop()
    if (unstable.nonEmpty) sys.exit(1)
  }
}
