package graft

import org.apache.spark.storage.StorageLevel
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.SessionMemo

/** Lifecycle contract of the session memo: build-once reuse, targeted
  * evict (unpersists + forces a rebuild), and release (bulk unpersist —
  * what Soak's concurrency round and Bench's between-pass reset call).
  */
class SessionMemoSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark

  test("memoizes per key; evict unpersists and forces a rebuild") {
    var builds = 0
    def build() = SessionMemo(spark, ("memo_spec", "k1")) {
      builds += 1
      spark.range(10).toDF("n").persist(StorageLevel.MEMORY_AND_DISK)
    }
    val first = build()
    first.count()
    assert(builds == 1)
    assert(build() eq first) // same instance, no rebuild
    assert(builds == 1)
    assert(first.storageLevel != StorageLevel.NONE)

    SessionMemo.evict(spark, ("memo_spec", "k1"))
    assert(first.storageLevel == StorageLevel.NONE) // unpersisted
    build()
    assert(builds == 2) // evicted key rebuilds
    SessionMemo.evict(spark, ("memo_spec", "k1"))
  }

  test("release unpersists every memoized frame and clears the session's entries") {
    var builds = 0
    def build() = SessionMemo(spark, ("memo_spec", "k2")) {
      builds += 1
      spark.range(5).toDF("n").persist(StorageLevel.MEMORY_AND_DISK)
    }
    val df = build()
    df.count()
    assert(df.storageLevel != StorageLevel.NONE)
    SessionMemo.release(spark)
    assert(df.storageLevel == StorageLevel.NONE)
    build()
    assert(builds == 2)
    SessionMemo.evict(spark, ("memo_spec", "k2"))
  }
}
