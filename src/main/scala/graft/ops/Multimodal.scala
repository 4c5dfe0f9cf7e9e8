package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video as opaque `binary` payloads
  * with typed metadata, processed in partition-batched typed operators.
  *
  * The decode step is STUBBED (this container has no image/audio
  * codecs): `decodeStub` produces a deterministic fake "decode" — a
  * 16-bin byte histogram — so the Spark-side plumbing (schema,
  * partitioning, batch shape, feature vectors joining into the
  * embedding ops) is real and tested while the codec call is a single
  * clearly-marked seam to swap for libjpeg/ffmpeg on a real cluster.
  *
  * At 100 TB the payloads dominate: the operators never shuffle binary
  * columns — features are extracted in the scan stage (mapPartitions on
  * the co-located payload), and only the small (ref, features) rows move.
  */
object Multimodal {

  case class MediaRow(media_ref: String, kind: String, payload: Array[Byte],
      width: Int, height: Int)
  case class MediaFeatures(media_ref: String, kind: String,
      n_bytes: Int, features: Array[Float])

  /** Deterministic synthetic payloads (pure function of the ref). */
  def mediaBinary(spark: SparkSession, n: Int, partitions: Int = 8): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).map { i =>
      val kind = Seq("image", "audio", "video")((i % 3).toInt)
      val len = 512 + (i % 7).toInt * 128
      val bytes = Array.tabulate(len)(j =>
        (((i * 2654435761L + j * 40503L) >>> 7) & 0xff).toByte)
      MediaRow(s"MEDIA-$i", kind, bytes, 64 + (i % 4).toInt * 32, 64)
    }
  }

  /** STUB decode: byte histogram over 16 buckets, L1-normalized.
    * Replace the body with a real codec (libjpeg/ffmpeg/soundfile) on a
    * cluster with the native libs — the signature and batch shape stay.
    */
  def decodeStub(payload: Array[Byte]): Array[Float] = {
    val hist = new Array[Float](16)
    payload.foreach(b => hist((b & 0xff) >> 4) += 1f)
    val total = math.max(payload.length, 1).toFloat
    hist.map(_ / total)
  }

  /** Partition-batched feature extraction: one pass per partition, no
    * shuffle of payloads, small feature rows out.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(m =>
      MediaFeatures(m.media_ref, m.kind, m.payload.length, decodeStub(m.payload))))
  }

  /** STUB resize: keeps every k-th byte, recomputes metadata — stands in
    * for an image resample with the same dataflow shape.
    */
  def resizeStub(media: Dataset[MediaRow], factor: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.map { m =>
      val kept = m.payload.zipWithIndex.collect {
        case (b, idx) if idx % factor == 0 => b
      }
      m.copy(payload = kept, width = math.max(m.width / factor, 1),
        height = math.max(m.height / factor, 1))
    }
  }

  /** Frame sampling for "video": every frameSize-byte block is a frame;
    * emit every k-th frame as its own row (explode at the typed layer).
    */
  def frameSample(media: Dataset[MediaRow], frameSize: Int, everyK: Int)
      : DataFrame = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { m =>
      m.payload.grouped(frameSize).zipWithIndex.collect {
        case (frame, idx) if idx % everyK == 0 =>
          (m.media_ref, idx, frame.length, decodeStub(frame))
      }
    }.toDF("media_ref", "frame_idx", "frame_bytes", "features")
  }

  /** Bridge into the similarity ops: media features as an embedding
    * table compatible with Similarity.* (cosine near-dup over decoded
    * features).
    */
  def featureTable(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    extractFeatures(media)
      .select(col("media_ref"), col("kind"), col("features").as("embedding"))
  }
}
