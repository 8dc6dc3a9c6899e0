package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.GraftConfig
import graft.sources.LogSources

/** Pins the Kafka reader wiring (S1) against the reference consumer
  * config — option-for-option, no live broker needed. Reference:
  * `LogAnalysis.java:54-63` (bootstrap kms-2/3/4:9092, topic
  * `user_access_logs`, `auto.offset.reset=earliest`; group id is
  * Spark-checkpoint-managed, deliberately absent here).
  */
class KafkaConfigSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark

  test("kafka reader options mirror the reference consumer config") {
    // GraftConfig.load() honors GRAFT_* env overrides by design — this
    // test pins the DEFAULTS against the reference, so it only runs
    // where no override is present (otherwise it would fail spuriously)
    assume(Seq("GRAFT_KAFKA_BROKERS", "GRAFT_KAFKA_TOPIC",
      "GRAFT_KAFKA_STARTING_OFFSETS").forall(v => sys.env.get(v).isEmpty))
    val (fmt, opts) = LogSources.kafkaReaderConfig(GraftConfig.load())
    assert(fmt == "kafka")
    assert(opts == Map(
      "kafka.bootstrap.servers" -> "kms-2:9092,kms-3:9092,kms-4:9092",
      "subscribe" -> "user_access_logs",
      "startingOffsets" -> "earliest"))
  }

  test("config overrides flow through to the reader options") {
    val cfg = GraftConfig.load().copy(
      kafkaBrokers = "broker1:9092",
      kafkaTopic = "other_topic",
      kafkaStartingOffsets = "latest")
    val (_, opts) = LogSources.kafkaReaderConfig(cfg)
    assert(opts("kafka.bootstrap.servers") == "broker1:9092")
    assert(opts("subscribe") == "other_topic")
    assert(opts("startingOffsets") == "latest")
  }

  test("kafkaLines reaches the real kafka source factory lookup") {
    // No kafka connector jar ships in this environment, so the honest
    // end of the executable path is DataSource resolution: the failure
    // must be the missing-data-source error naming `kafka` — NOT an
    // option/validation error, which would mean the wiring broke before
    // the factory lookup.
    val ex = intercept[Exception] { LogSources.kafkaLines(spark) }
    val msg = ex.toString.toLowerCase
    assert(msg.contains("kafka"), msg)
    assert(msg.contains("failed to find") || msg.contains("data_source_not_found")
      || msg.contains("datasource"), msg)
  }
}
