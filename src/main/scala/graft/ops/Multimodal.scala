package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video as opaque `binary` payloads
  * with typed metadata, processed in partition-batched typed operators.
  *
  * The codec seam carries FOUR decoders: `decodeStub` (deterministic
  * fake — 16-bin byte histogram — for payload kinds with no in-repo
  * codec, e.g. audio/video), and three REAL image decoders built on
  * nothing but the JDK: `decodePpm` (NetPBM P6), `decodePng` (zlib
  * IDAT + full filter reconstruction via `java.util.zip.Inflater`),
  * and `decodeJpeg` (baseline JPEG via the JDK's bundled ImageIO
  * reader). All share one feature shape, so swapping codecs is a
  * one-argument change — and ffmpeg/soundfile would slot into the same
  * seam on a cluster with native libs.
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

  /** Third codec, a REAL compressed-image decoder with zero external
    * dependencies: PNG (ISO/IEC 15948) via the JDK's zlib binding
    * (`java.util.zip.Inflater`). Supports the dominant web shapes —
    * 8-bit depth, color types 0 (gray), 2 (RGB), 6 (RGBA), non-
    * interlaced — with full filter reconstruction (None/Sub/Up/Average/
    * Paeth). Emits the same 16-float shape as [[decodePpm]]:
    * [meanR, meanG, meanB, 13-bin luminance histogram] (gray replicates
    * the channel; alpha is ignored), so PNG and PPM payloads of the
    * same raster produce bit-identical features (pinned in
    * MultimodalSpec). Malformed/unsupported payloads (bad magic, bad
    * CRC is NOT checked — tolerant like libpng's default — but
    * truncated or non-zlib IDAT, interlace, 16-bit, palette) yield the
    * zero vector: a decode failure is a data row, not a job abort.
    */
  val decodePng: Codec = payload => {
    val out = new Array[Float](16)
    try {
      val sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
      require(payload.length > 8 && payload.take(8).sameElements(sig), "bad magic")
      def be32(p: Int): Int =
        ((payload(p) & 0xff) << 24) | ((payload(p + 1) & 0xff) << 16) |
          ((payload(p + 2) & 0xff) << 8) | (payload(p + 3) & 0xff)
      // walk chunks: IHDR first, concatenate IDAT data, stop at IEND
      var pos = 8
      var w = 0; var h = 0; var colorType = -1
      val idat = new java.io.ByteArrayOutputStream()
      var done = false
      while (!done && pos + 8 <= payload.length) {
        val len = be32(pos)
        val ctype = new String(payload, pos + 4, 4, "US-ASCII")
        require(len >= 0 && pos + 12 + len <= payload.length, "truncated chunk")
        ctype match {
          case "IHDR" =>
            require(len == 13, "bad IHDR")
            w = be32(pos + 8); h = be32(pos + 12)
            val bitDepth = payload(pos + 16) & 0xff
            colorType = payload(pos + 17) & 0xff
            val interlace = payload(pos + 20) & 0xff
            require(w > 0 && h > 0 && bitDepth == 8 && interlace == 0 &&
              (colorType == 0 || colorType == 2 || colorType == 6),
              "unsupported png shape")
            require(w.toLong * h.toLong <= (1L << 26), "raster too large")
          case "IDAT" => idat.write(payload, pos + 8, len)
          case "IEND" => done = true
          case _ => () // ancillary chunks skipped
        }
        pos += 12 + len
      }
      require(colorType >= 0 && idat.size > 0, "missing IHDR/IDAT")
      val channels = colorType match { case 0 => 1; case 2 => 3; case _ => 4 }
      val stride = w * channels
      val raw = new Array[Byte](h * (1 + stride))
      val inf = new java.util.zip.Inflater()
      inf.setInput(idat.toByteArray)
      var off = 0
      while (off < raw.length && !inf.finished()) {
        val k = inf.inflate(raw, off, raw.length - off)
        // k == 0 with the stream not finished means a truncated or
        // preset-dictionary stream — bail instead of spinning
        if (k == 0) require(inf.finished(), "bad zlib stream")
        off += k
      }
      inf.end()
      require(off == raw.length, "short raster")
      // filter reconstruction in place: prev = reconstructed row above
      def paeth(a: Int, b: Int, c: Int): Int = {
        val p = a + b - c
        val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
        if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
      }
      val img = new Array[Int](h * stride)
      var y = 0
      while (y < h) {
        val ft = raw(y * (1 + stride)) & 0xff
        require(ft <= 4, "bad filter type")
        var x = 0
        while (x < stride) {
          val v = raw(y * (1 + stride) + 1 + x) & 0xff
          val a = if (x >= channels) img(y * stride + x - channels) else 0
          val b = if (y > 0) img((y - 1) * stride + x) else 0
          val c = if (y > 0 && x >= channels) img((y - 1) * stride + x - channels) else 0
          img(y * stride + x) = (ft match {
            case 0 => v
            case 1 => v + a
            case 2 => v + b
            case 3 => v + (a + b) / 2
            case 4 => v + paeth(a, b, c)
          }) & 0xff
          x += 1
        }
        y += 1
      }
      // identical feature arithmetic to decodePpm at maxval = 255
      val n = w * h
      var sr = 0L; var sg = 0L; var sb = 0L
      val hist = new Array[Float](13)
      var i = 0
      while (i < n) {
        val base = i * channels
        val r = img(base)
        val g = if (channels >= 3) img(base + 1) else r
        val b = if (channels >= 3) img(base + 2) else r
        sr += r; sg += g; sb += b
        val luma = (299 * r + 587 * g + 114 * b) / 1000
        hist(math.min(luma * 13 / 256, 12)) += 1f
        i += 1
      }
      out(0) = sr.toFloat / n / 255
      out(1) = sg.toFloat / n / 255
      out(2) = sb.toFloat / n / 255
      var k = 0
      while (k < 13) { out(3 + k) = hist(k) / n; k += 1 }
      out
    } catch { case _: Exception => new Array[Float](16) }
  }

  /** The shared feature arithmetic over a decoded ARGB raster —
    * identical to decodePpm/decodePng at maxval 255: [meanR, meanG,
    * meanB, 13-bin integer Rec.601 luma histogram].
    */
  private def featuresOf(img: java.awt.image.BufferedImage): Array[Float] = {
    val w = img.getWidth; val h = img.getHeight; val n = w * h
    val out = new Array[Float](16)
    if (n == 0) return out
    var sr = 0L; var sg = 0L; var sb = 0L
    val hist = new Array[Float](13)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
        sr += r; sg += g; sb += b
        val luma = (299 * r + 587 * g + 114 * b) / 1000
        hist(math.min(luma * 13 / 256, 12)) += 1f
        x += 1
      }
      y += 1
    }
    out(0) = sr.toFloat / n / 255
    out(1) = sg.toFloat / n / 255
    out(2) = sb.toFloat / n / 255
    var k = 0
    while (k < 13) { out(3 + k) = hist(k) / n; k += 1 }
    out
  }

  /** Fourth codec — REAL baseline JPEG decode via the JDK's bundled
    * ImageIO reader (`java.desktop` ships a libjpeg-equivalent decoder;
    * still zero external dependencies). Same 16-float feature shape as
    * the PPM/PNG codecs. JPEG is LOSSY, so unlike the PNG gate the
    * features are not formula-exact — the mm_jpeg_features driver gate
    * hashes the DECODED dimensions (exact: they come from the parsed
    * SOF header) plus a bounded-reconstruction-error flag, and
    * MultimodalSpec pins the error bound. Malformed payloads yield the
    * zero vector: a decode failure is a data row, not a job abort.
    */
  val decodeJpeg: Codec = payload => {
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      require(img != null, "not a decodable image")
      featuresOf(img)
    } catch { case _: Exception => new Array[Float](16) }
  }

  /** Deterministic in-repo JPEG encoder (JDK ImageIO writer, explicit
    * quality): the SAME raster formula as [[pngPayload]] (RGB,
    * [[pngRaster]]), so a decode can be compared against the formula's
    * channel means within a lossy tolerance.
    */
  def jpegPayload(w: Int, h: Int, seed: Long, quality: Float = 0.95f): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val src = pngRaster(w, h, seed, 3)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val base = (y * w + x) * 3
        img.setRGB(x, y, (src(base) << 16) | (src(base + 1) << 8) | src(base + 2))
        x += 1
      }
      y += 1
    }
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val params = writer.getDefaultWriteParam
    params.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    params.setCompressionQuality(quality)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), params)
    } finally { writer.dispose(); ios.close() }
    bos.toByteArray
  }

  /** Media rows whose payloads are REAL JPEG bytes (24×16 RGB, seed =
    * row id, same raster formula as [[pngMedia]]) — the fixture behind
    * the mm_jpeg_features driver gate.
    */
  def jpegMedia(spark: SparkSession, n: Int, partitions: Int = 8): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).map(i =>
      MediaRow(s"JPEG-$i", "image", jpegPayload(24, 16, i), 24, 16))
  }

  /** JPEG gate rows, one decode per payload in the scan stage:
    * (media_ref, decoded width, decoded height, within_tol). The
    * dimensions come from the DECODED image (parsed SOF header, exact);
    * within_tol compares the decoded channel means against the source
    * raster formula's means — |err| ≤ tol per channel, the bounded
    * reconstruction error a lossy codec guarantees. A failed decode
    * emits (-1, -1, false), turning the gate hash red.
    */
  def jpegFeatures(media: Dataset[MediaRow], tol: Float = 0.03f): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { m =>
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(m.payload))
        catch { case _: Exception => null }
      if (img == null) (m.media_ref, -1, -1, false)
      else {
        val feats = featuresOf(img)
        // the fixture's seed is the ref suffix (JPEG-<i>)
        val seed = m.media_ref.substring(m.media_ref.lastIndexOf('-') + 1).toLong
        val src = pngRaster(m.width, m.height, seed, 3)
        val sums = new Array[Long](3)
        var k = 0
        while (k < src.length) { sums(k % 3) += src(k); k += 1 }
        val npx = m.width * m.height
        val ok = (0 until 3).forall(c =>
          math.abs(feats(c) - sums(c).toFloat / npx / 255f) <= tol)
        (m.media_ref, img.getWidth, img.getHeight, ok)
      }
    }).toDF("media_ref", "width", "height", "within_tol")
  }

  /** Fifth codec — the AUDIO twin of decodePng: a real RIFF/WAVE PCM16
    * decoder (chunk walk, fmt validation, little-endian samples),
    * dependency-free and LOSSLESS, so the mm_wav_features gate is
    * formula-exact like the PNG one. Feature shape (16 floats):
    * [mean signed amplitude /2^15, mean |amplitude| /2^15,
    * zero-crossing rate, 13-bin histogram of the unsigned sample].
    * Only PCM (format 1), 16-bit, mono is decoded; anything else —
    * truncated chunks, float WAV, stereo — yields the zero vector
    * (a data row, not a job abort).
    */
  val decodeWav: Codec = payload => {
    val out = new Array[Float](16)
    try {
      def le32(p: Int): Int =
        (payload(p) & 0xff) | ((payload(p + 1) & 0xff) << 8) |
          ((payload(p + 2) & 0xff) << 16) | ((payload(p + 3) & 0xff) << 24)
      def le16(p: Int): Int = (payload(p) & 0xff) | ((payload(p + 1) & 0xff) << 8)
      def tag(p: Int): String = new String(payload, p, 4, "US-ASCII")
      require(payload.length >= 44 && tag(0) == "RIFF" && tag(8) == "WAVE",
        "not a RIFF/WAVE payload")
      // walk chunks: fmt must precede data per spec, but tolerate order
      var pos = 12
      var fmtOk = false
      var dataPos = -1; var dataLen = 0
      while (pos + 8 <= payload.length && (dataPos < 0 || !fmtOk)) {
        val id = tag(pos); val len = le32(pos + 4)
        require(len >= 0 && pos + 8 + len <= payload.length, "truncated chunk")
        id match {
          case "fmt " =>
            require(len >= 16, "short fmt")
            val audioFormat = le16(pos + 8); val channels = le16(pos + 10)
            val bits = le16(pos + 22)
            require(audioFormat == 1 && channels == 1 && bits == 16,
              "unsupported wav shape")
            fmtOk = true
          case "data" => dataPos = pos + 8; dataLen = len
          case _ => () // ancillary chunks (LIST, fact, ...) skipped
        }
        pos += 8 + len + (len & 1) // chunks are word-aligned
      }
      require(fmtOk && dataPos >= 0 && dataLen >= 2, "missing fmt/data")
      val n = dataLen / 2
      var i = 0
      var sumSigned = 0L; var sumAbs = 0L; var zc = 0L
      var prevNeg = false
      val hist = new Array[Float](13)
      while (i < n) {
        val u = le16(dataPos + 2 * i)
        val s = if (u >= 32768) u - 65536 else u
        sumSigned += s; sumAbs += math.abs(s)
        val neg = s < 0
        if (i > 0 && neg != prevNeg) zc += 1
        prevNeg = neg
        hist(math.min(u * 13 / 65536, 12)) += 1f
        i += 1
      }
      out(0) = sumSigned.toFloat / n / 32768
      out(1) = sumAbs.toFloat / n / 32768
      out(2) = zc.toFloat / n
      var k = 0
      while (k < 13) { out(3 + k) = hist(k) / n; k += 1 }
      out
    } catch { case _: Exception => new Array[Float](16) }
  }

  /** Deterministic in-repo WAV encoder (valid RIFF bytes incl. an
    * ancillary LIST chunk the parser must skip): PCM16 mono 8 kHz,
    * sample j of clip `seed` is the SAME LCG family as the rasters,
    * masked to 16 bits — so oracles recompute expected features from
    * the formula without touching the bytes.
    */
  def wavPayload(nSamples: Int, seed: Long): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def w32(v: Int): Unit = {
      bos.write(v & 0xff); bos.write((v >>> 8) & 0xff)
      bos.write((v >>> 16) & 0xff); bos.write((v >>> 24) & 0xff)
    }
    def w16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >>> 8) & 0xff) }
    def tag(s: String): Unit = bos.write(s.getBytes("US-ASCII"))
    val dataLen = nSamples * 2
    // odd-length chunk: RIFF requires a pad byte after it — the parser
    // must word-align, so the fixture exercises that path deliberately
    val info = "graft synthetic".getBytes("US-ASCII")
    val listLen = info.length + 4
    val listPad = listLen & 1
    tag("RIFF"); w32(4 + (8 + 16) + (8 + listLen + listPad) + (8 + dataLen))
    tag("WAVE")
    tag("fmt "); w32(16)
    w16(1); w16(1); w32(8000); w32(16000); w16(2); w16(16)
    tag("LIST"); w32(listLen); tag("INFO"); bos.write(info)
    if (listPad == 1) bos.write(0)
    tag("data"); w32(dataLen)
    var j = 0
    while (j < nSamples) {
      w16((((seed * 2654435761L + j * 40503L) >>> 9) & 0xffff).toInt)
      j += 1
    }
    bos.toByteArray
  }

  /** Media rows whose payloads are REAL WAV bytes (256 PCM16 samples,
    * seed = row id) — the fixture behind the mm_wav_features gate.
    * 256 samples keeps every feature exactly recoverable from float32
    * (sums ≤ 2^23 fit the mantissa; /256 and /32768 are exact).
    */
  def wavMedia(spark: SparkSession, n: Int, partitions: Int = 8): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).map(i =>
      MediaRow(s"WAV-$i", "audio", wavPayload(256, i), 0, 0))
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

  /** Media rows whose payloads are REAL PNG bytes (24×16 RGB, seed = row
    * id) — the fixture behind the mm_png_features driver gate: the
    * oracle recomputes expected features from [[pngRaster]]'s formula,
    * so a wrong inflate/unfilter/decode anywhere turns the gate red.
    */
  def pngMedia(spark: SparkSession, n: Int, partitions: Int = 8): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).map(i =>
      MediaRow(s"PNG-$i", "image", pngPayload(24, 16, i), 24, 16))
  }

  /** The deterministic raster behind [[pngPayload]] — the SAME LCG family
    * as [[ppmPayload]], exposed so oracles/tests can recompute expected
    * features from the formula without touching compressed bytes.
    */
  def pngRaster(w: Int, h: Int, seed: Long, channels: Int): Array[Int] =
    Array.tabulate(w * h * channels)(i =>
      (((seed * 2654435761L + i * 40503L) >>> 9) & 0xff).toInt)

  /** Deterministic in-repo PNG encoder (valid ISO 15948 bytes): 8-bit
    * gray / RGB / RGBA, zlib IDAT via `java.util.zip.Deflater`, CRC32'd
    * chunks, and — deliberately — a DIFFERENT filter type per scanline
    * (row % 5: None, Sub, Up, Average, Paeth) so a decoder round-trip
    * exercises every reconstruction path, not just filter 0.
    */
  def pngPayload(w: Int, h: Int, seed: Long, colorType: Int = 2): Array[Byte] = {
    require(colorType == 0 || colorType == 2 || colorType == 6)
    val channels = colorType match { case 0 => 1; case 2 => 3; case _ => 4 }
    val stride = w * channels
    val img = pngRaster(w, h, seed, channels)
    def paeth(a: Int, b: Int, c: Int): Int = {
      val p = a + b - c
      val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
      if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
    }
    val raw = new Array[Byte](h * (1 + stride))
    var y = 0
    while (y < h) {
      val ft = y % 5
      raw(y * (1 + stride)) = ft.toByte
      var x = 0
      while (x < stride) {
        val v = img(y * stride + x)
        val a = if (x >= channels) img(y * stride + x - channels) else 0
        val b = if (y > 0) img((y - 1) * stride + x) else 0
        val c = if (y > 0 && x >= channels) img((y - 1) * stride + x - channels) else 0
        val pred = ft match {
          case 0 => 0
          case 1 => a
          case 2 => b
          case 3 => (a + b) / 2
          case 4 => paeth(a, b, c)
        }
        raw(y * (1 + stride) + 1 + x) = ((v - pred) & 0xff).toByte
        x += 1
      }
      y += 1
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw)
    deflater.finish()
    val zbuf = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](8192)
    while (!deflater.finished()) zbuf.write(tmp, 0, deflater.deflate(tmp))
    deflater.end()
    def chunk(ctype: String, data: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      def be32(v: Int): Unit = {
        out.write((v >>> 24) & 0xff); out.write((v >>> 16) & 0xff)
        out.write((v >>> 8) & 0xff); out.write(v & 0xff)
      }
      be32(data.length)
      val tb = ctype.getBytes("US-ASCII")
      out.write(tb); out.write(data)
      val crc = new java.util.zip.CRC32()
      crc.update(tb); crc.update(data)
      be32(crc.getValue.toInt)
      out.toByteArray
    }
    val ihdr = new Array[Byte](13)
    def put32(p: Int, v: Int): Unit = {
      ihdr(p) = ((v >>> 24) & 0xff).toByte; ihdr(p + 1) = ((v >>> 16) & 0xff).toByte
      ihdr(p + 2) = ((v >>> 8) & 0xff).toByte; ihdr(p + 3) = (v & 0xff).toByte
    }
    put32(0, w); put32(4, h)
    ihdr(8) = 8; ihdr(9) = colorType.toByte; ihdr(10) = 0; ihdr(11) = 0; ihdr(12) = 0
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte) ++
      chunk("IHDR", ihdr) ++ chunk("IDAT", zbuf.toByteArray) ++
      chunk("IEND", Array.emptyByteArray)
  }
}
