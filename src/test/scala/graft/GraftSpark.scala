package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (lazy — built on first use).
  * Built through [[GraftSession]] so the tests run the exact session
  * posture the shipped entry points do; nanosAsLong is pre-set here
  * (dynamic conf, also set by Tables on first read) so suites that
  * read events.parquet directly don't depend on call order.
  */
object GraftSpark {
  lazy val spark: SparkSession = {
    val s = GraftSession.build("local[4]", "4", appName = "graft-test")
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s
  }
}
