package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns for training-data pipelines: media as opaque
  * `binary` payloads + typed metadata, with decode / feature-extract /
  * frame-sample as partition-wise batch operations.
  *
  * The Spark-side plumbing is real — binary columns, fixed header
  * layout, `mapPartitions` batch decode (one decoder init per partition,
  * exactly how a JNI codec or an ONNX session is amortized at scale),
  * typed Datasets end to end. The codec itself is a STUB: this container
  * has no image/audio libraries, so `decodeStub` parses graft's
  * deterministic header + computes a brightness stand-in instead of real
  * pixel decode. Swap `decodeStub`'s body for the real codec call; every
  * schema/partitioning/batching decision stays valid.
  *
  * Payload layout (big-endian):
  *   bytes 0-3   magic "GRFT"
  *   byte  4     kind (0=image, 1=audio, 2=video)
  *   bytes 5-8   width   (image/video) | sample rate/1000 (audio)
  *   bytes 9-12  height  (image/video) | channels (audio)
  *   bytes 13-14 n_frames
  *   bytes 15+   deterministic filler ("pixels")
  */
object Multimodal {

  val Magic: Array[Byte] = "GRFT".getBytes("UTF-8")
  val Kinds: Seq[String] = Seq("image", "audio", "video")

  case class Media(media_id: Long, kind: String, payload: Array[Byte])
  case class MediaMeta(media_id: Long, kind: String, width: Int, height: Int,
      n_frames: Int, payload_bytes: Int, brightness: Double)
  case class Frame(media_id: Long, kind: String, frame_idx: Int, frame_brightness: Double)

  private def beInt(v: Int): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def readInt(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) | ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  /** Deterministic synthetic media table (`n` rows, `parts` partitions).
    * Payload content is a pure function of media_id — reproducible across
    * runs and cluster layouts.
    */
  def syntheticMedia(spark: SparkSession, n: Int, parts: Int = 8): Dataset[Media] = {
    import spark.implicits._
    spark.range(0, n, 1, parts).map { id =>
      val kindId = (id % 3).toInt
      val width = 64 + (id % 192).toInt
      val height = 64 + (id % 128).toInt
      val frames = if (kindId == 2) 8 + (id % 24).toInt else 1
      val fillerLen = 256 + (id % 512).toInt
      val header = Magic ++ Array(kindId.toByte) ++ beInt(width) ++ beInt(height) ++
        Array(((frames >> 8) & 0xff).toByte, (frames & 0xff).toByte)
      val filler = Array.tabulate(fillerLen)(i => ((id * 31 + i * 7) % 256).toByte)
      Media(id, Kinds(kindId), header ++ filler)
    }
  }

  /** Partition-wise batch decode: header parse + brightness stand-in.
    * One "decoder" per partition (the `val decoder = ...` line is where a
    * real codec/session would be initialized once and reused).
    */
  def decodeStub(media: Dataset[Media]): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      val decoder = new Object // real codec/ONNX session init goes here, once per partition
      it.map { m =>
        require(decoder != null)
        val b = m.payload
        require(b.take(4).sameElements(Magic), s"bad magic for media ${m.media_id}")
        val width = readInt(b, 5)
        val height = readInt(b, 9)
        val frames = ((b(13) & 0xff) << 8) | (b(14) & 0xff)
        var sum = 0L
        var i = 15
        while (i < b.length) { sum += (b(i) & 0xff); i += 1 }
        val brightness = if (b.length > 15) sum.toDouble / (b.length - 15) / 255.0 else 0.0
        MediaMeta(m.media_id, m.kind, width, height, frames, b.length,
          math.rint(brightness * 1e6) / 1e6)
      }
    }
  }

  /** Batched feature extraction: payload bytes → fixed-dim embedding
    * (here: per-lane byte means over the filler — a deterministic stand-
    * in for a real image/audio feature model, which would initialize
    * once per partition where `model` is). The output column feeds the
    * similarity stack directly (normalize → DotProduct top-k / IVF):
    * media dedup-by-embedding is this composed with
    * Similarity.blockedNearDup.
    *
    * Lane math is exact-integer sums + one double division per lane, so
    * the DuckDB oracle regenerates bit-identical values from the id.
    */
  def featureExtractStub(media: Dataset[Media], lanes: Int = 8): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      val model = new Object // real feature model / ONNX session init goes here, once per partition
      it.map { m =>
        require(model != null)
        val b = m.payload
        val sums = new Array[Long](lanes)
        val counts = new Array[Long](lanes)
        var i = 15
        while (i < b.length) {
          val j = (i - 15) % lanes
          sums(j) += (b(i) & 0xff)
          counts(j) += 1
          i += 1
        }
        val emb = Array.tabulate(lanes)(j =>
          if (counts(j) == 0) 0.0 else sums(j).toDouble / counts(j) / 255.0)
        (m.media_id, m.kind, emb)
      }
    }.toDF("media_id", "kind", "embedding")
  }

  /** Frame sampling for video payloads: every `everyN`-th frame index,
    * with a per-frame feature from the corresponding filler slice.
    */
  def sampleFrames(meta: Dataset[MediaMeta], everyN: Int): DataFrame =
    meta.toDF()
      .filter(col("kind") === "video")
      .select(col("media_id"), col("kind"), col("brightness"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(everyN))).as("frame_idx"))
      .select(col("media_id"), col("kind"), col("frame_idx"),
        round(col("brightness") * (lit(1.0) + col("frame_idx") / lit(100.0)), 6).as("frame_brightness"))

  /** Perceptual-hash stand-in over the payload: 64 strided byte-sum
    * cells over the filler, bit c = [cell mean > global mean] decided by
    * exact integer cross-multiplication (cs·tn > ts·cn — no division,
    * no float), packed into two 32-bit half-words (one 64-bit word
    * would overflow a checked signed add at bit 63 when replayed in
    * SQL). A real pHash swaps the cell statistic for DCT coefficients;
    * every downstream banding/Hamming decision is statistic-agnostic.
    * mapPartitions for the same reason as [[decodeStub]]: per-partition
    * decoder amortization over an opaque binary codec.
    */
  case class PHash(media_id: Long, hi: Long, lo: Long)
  def phash64(media: Dataset[Media]): Dataset[PHash] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      val decoder = new Object // real codec init goes here, once per partition
      it.map { m =>
        require(decoder != null)
        val b = m.payload
        val n = b.length - 15
        val cs = new Array[Long](64)
        val cn = new Array[Long](64)
        var i = 0
        while (i < n) {
          val c = i % 64
          cs(c) += (b(15 + i) & 0xff)
          cn(c) += 1
          i += 1
        }
        var ts = 0L; var tn = 0L
        var c = 0
        while (c < 64) { ts += cs(c); tn += cn(c); c += 1 }
        var hi = 0L; var lo = 0L
        c = 0
        while (c < 64) {
          val bit = if (cs(c) * tn > ts * cn(c)) 1L else 0L
          if (c < 32) lo |= bit << c else hi |= bit << (c - 32)
          c += 1
        }
        PHash(m.media_id, hi, lo)
      }
    }
  }

  /** Metadata-level resize: scale (width,height) to fit `maxDim`,
    * preserving aspect (integer floor math — deterministic).
    */
  def resizeMeta(meta: Dataset[MediaMeta], maxDim: Int): DataFrame =
    meta.toDF().withColumn("scale",
        least(lit(1.0), lit(maxDim) / greatest(col("width"), col("height"))))
      .select(col("media_id"), col("kind"), col("width"), col("height"),
        floor(col("width") * col("scale")).cast("int").as("out_width"),
        floor(col("height") * col("scale")).cast("int").as("out_height"))
}
