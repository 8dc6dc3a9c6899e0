package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.1"
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$name%-28s ${(System.nanoTime()-t0)/1e9}%8.2f s   rows=$n")
    }
    time("warmup")(graft.sources.Tables.events(spark, sf).count())
    // agg + collect so column pruning can't strip the line rendering
    time("loggen_only")(graft.logs.LogGen.logLines(spark, sf).agg(sum(length(col("line")))).collect()(0).getLong(0))
    time("loggen_2")(graft.logs.LogGen.logLines(spark, sf).agg(sum(length(col("line")))).collect()(0).getLong(0))
    time("parse_tuples")(graft.analytics.ForumAnalytics.parsedLogs(spark, sf).count())
    time("parse_2")(graft.analytics.ForumAnalytics.parsedLogs(spark, sf).count())
    time("hot_article_1")(Queries.hotArticle(spark, sf).count())
    time("hot_article_2")(Queries.hotArticle(spark, sf).count())
    time("hot_section_2")(Queries.hotSection(spark, sf).count())
    spark.stop()
  }
}
