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

  /** The codec seam: payload bytes → fixed-width feature vector. Every
    * media operator takes one of these (defaulting to [[decodeStub]]),
    * so swapping in libjpeg/ffmpeg on a real cluster is a one-argument
    * change — proven drop-in by [[decodePpm]], a REAL second codec
    * implemented in-repo, running through the identical operators in
    * MultimodalSpec.
    */
  type Codec = Array[Byte] => Array[Float]

  /** STUB decode: byte histogram over 16 buckets, L1-normalized.
    * Replace with a real codec (libjpeg/ffmpeg/soundfile) on a cluster
    * with the native libs — the signature and batch shape stay.
    */
  val decodeStub: Codec = payload => {
    val hist = new Array[Float](16)
    payload.foreach(b => hist((b & 0xff) >> 4) += 1f)
    val total = math.max(payload.length, 1).toFloat
    hist.map(_ / total)
  }

  /** Second codec, fully functional and dependency-free: a binary PPM
    * (P6) image decoder. Parses the real NetPBM header (magic,
    * whitespace/comment-tolerant width/height/maxval) and the raw RGB
    * raster, and emits the same 16-float feature shape as the stub:
    * [meanR, meanG, meanB, 13-bin luminance histogram], channel means
    * normalized by maxval, histogram L1-normalized over pixels.
    * Malformed payloads yield an all-zero vector (a decode failure is a
    * data row, not a job abort — at 100 TB some payloads WILL be
    * corrupt).
    */
  val decodePpm: Codec = payload => {
    val out = new Array[Float](16)
    try {
      var pos = 0
      def skipWs(): Unit = {
        var in = true
        while (in && pos < payload.length) {
          val c = payload(pos).toChar
          if (c == '#') { while (pos < payload.length && payload(pos) != '\n') pos += 1 }
          else if (c.isWhitespace) pos += 1
          else in = false
        }
      }
      def token(): String = {
        skipWs()
        val start = pos
        while (pos < payload.length && !payload(pos).toChar.isWhitespace) pos += 1
        new String(payload, start, pos - start, "US-ASCII")
      }
      require(token() == "P6", "not a P6 ppm")
      val w = token().toInt
      val h = token().toInt
      val maxval = token().toInt
      require(w > 0 && h > 0 && maxval > 0 && maxval < 65536, "bad ppm header")
      pos += 1 // single whitespace after maxval, per spec
      val bytesPerSample = if (maxval < 256) 1 else 2
      // size arithmetic in Long: a corrupt header like 65536x65536
      // overflows Int (w*h = 0) and would sail past the truncation
      // guard into garbage features instead of the zero vector
      val nL = w.toLong * h.toLong
      require(nL * 3L * bytesPerSample <= (payload.length - pos).toLong,
        "truncated raster")
      val n = nL.toInt
      def sample(idx: Int): Int =
        if (bytesPerSample == 1) payload(pos + idx) & 0xff
        else ((payload(pos + 2 * idx) & 0xff) << 8) | (payload(pos + 2 * idx + 1) & 0xff)
      var i = 0
      var sr = 0L; var sg = 0L; var sb = 0L
      val hist = new Array[Float](13)
      while (i < n) {
        val r = sample(3 * i); val g = sample(3 * i + 1); val b = sample(3 * i + 2)
        sr += r; sg += g; sb += b
        // integer Rec.601-ish luma, scaled into 13 bins
        val luma = (299 * r + 587 * g + 114 * b) / 1000
        hist(math.min(luma * 13 / (maxval + 1), 12)) += 1f
        i += 1
      }
      out(0) = sr.toFloat / n / maxval
      out(1) = sg.toFloat / n / maxval
      out(2) = sb.toFloat / n / maxval
      var k = 0
      while (k < 13) { out(3 + k) = hist(k) / n; k += 1 }
      out
    } catch { case _: Exception => new Array[Float](16) }
  }

  /** Partition-batched feature extraction: one pass per partition, no
    * shuffle of payloads, small feature rows out.
    */
  def extractFeatures(media: Dataset[MediaRow],
      codec: Codec = decodeStub): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(m =>
      MediaFeatures(m.media_ref, m.kind, m.payload.length, codec(m.payload))))
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
  def frameSample(media: Dataset[MediaRow], frameSize: Int, everyK: Int,
      codec: Codec = decodeStub): DataFrame = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { m =>
      m.payload.grouped(frameSize).zipWithIndex.collect {
        case (frame, idx) if idx % everyK == 0 =>
          (m.media_ref, idx, frame.length, codec(frame))
      }
    }.toDF("media_ref", "frame_idx", "frame_bytes", "features")
  }

  /** Bridge into the similarity ops: media features as an embedding
    * table compatible with Similarity.* (cosine near-dup over decoded
    * features).
    */
  def featureTable(media: Dataset[MediaRow],
      codec: Codec = decodeStub): DataFrame = {
    import media.sparkSession.implicits._
    extractFeatures(media, codec)
      .select(col("media_ref"), col("kind"), col("features").as("embedding"))
  }

  /** Deterministic in-repo P6 PPM payload generator (valid NetPBM bytes,
    * incl. a comment line — the parser must skip it like a real file's).
    * Pixel (x, y) of image `seed` has channels derived from the same
    * LCG family as [[mediaBinary]].
    */
  def ppmPayload(w: Int, h: Int, seed: Long): Array[Byte] = {
    val header = s"P6\n# graft synthetic $seed\n$w $h\n255\n".getBytes("US-ASCII")
    val raster = new Array[Byte](w * h * 3)
    var i = 0
    while (i < w * h * 3) {
      raster(i) = (((seed * 2654435761L + i * 40503L) >>> 9) & 0xff).toByte
      i += 1
    }
    header ++ raster
  }
}
