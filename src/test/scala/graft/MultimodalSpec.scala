package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Multimodal

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark

  test("synthetic payloads decode back to their generating metadata") {
    val media = Multimodal.syntheticMedia(spark, 300, parts = 4)
    val meta = Multimodal.decodeStub(media).collect()
    assert(meta.length == 300)
    meta.foreach { m =>
      assert(m.kind == Multimodal.Kinds((m.media_id % 3).toInt))
      assert(m.width == 64 + (m.media_id % 192).toInt)
      assert(m.height == 64 + (m.media_id % 128).toInt)
      val expFrames = if (m.media_id % 3 == 2) 8 + (m.media_id % 24).toInt else 1
      assert(m.n_frames == expFrames)
      assert(m.payload_bytes == 15 + 256 + (m.media_id % 512).toInt)
      assert(m.brightness > 0.0 && m.brightness < 1.0)
    }
  }

  test("decode is deterministic across partition layouts") {
    val a = Multimodal.decodeStub(Multimodal.syntheticMedia(spark, 100, parts = 1))
      .collect().sortBy(_.media_id).toSeq
    val b = Multimodal.decodeStub(Multimodal.syntheticMedia(spark, 100, parts = 7))
      .collect().sortBy(_.media_id).toSeq
    assert(a == b)
  }

  test("frame sampling explodes only videos at the requested stride") {
    val meta = Multimodal.decodeStub(Multimodal.syntheticMedia(spark, 60, parts = 2))
    val frames = Multimodal.sampleFrames(meta, everyN = 4)
    val byKind = frames.groupBy("kind").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byKind.keySet == Set("video"))
    val one = frames.filter(col("media_id") === 2).select("frame_idx")
      .collect().map(_.getInt(0)).sorted
    assert(one.head == 0 && one.forall(_ % 4 == 0))
  }

  test("feature extraction: fixed dim, unit range, partition-layout invariant") {
    val emb = Multimodal.featureExtractStub(Multimodal.syntheticMedia(spark, 40, parts = 3))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](2)).toMap
    assert(emb.size == 40)
    emb.values.foreach { v =>
      assert(v.length == 8)
      assert(v.forall(x => x >= 0.0 && x <= 1.0), v)
    }
    // different partitioning -> byte-identical embeddings
    val emb2 = Multimodal.featureExtractStub(Multimodal.syntheticMedia(spark, 40, parts = 7))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](2)).toMap
    assert(emb2 == emb)
    // identical payloads (same id) are exact embedding duplicates;
    // different ids differ (filler is id-dependent)
    assert(emb(1L) != emb(2L))
  }

  test("metadata resize preserves aspect and caps the max dimension") {
    val meta = Multimodal.decodeStub(Multimodal.syntheticMedia(spark, 50, parts = 2))
    Multimodal.resizeMeta(meta, 100).collect().foreach { r =>
      val (w, h, ow, oh) = (r.getInt(2), r.getInt(3), r.getInt(4), r.getInt(5))
      assert(ow <= 100 && oh <= 100)
      if (w <= 100 && h <= 100) assert(ow == w && oh == h)
      else assert(math.max(ow, oh) == 100 || math.max(ow, oh) == 99) // floor rounding
    }
  }
}
