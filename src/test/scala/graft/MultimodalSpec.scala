package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Multimodal

/** Codec-seam contract tests: `Multimodal.Codec` is the single
  * clearly-marked swap point for a real codec (libjpeg/ffmpeg/
  * soundfile, absent from this container). These tests pin the CONTRACT
  * a drop-in replacement must keep — signature
  * `Array[Byte] => Array[Float]`, fixed feature width, L1
  * normalization, determinism — plus golden outputs for the stub, AND
  * prove the swap is genuinely drop-in by running a second, fully
  * functional in-repo codec (`decodePpm`, a real NetPBM P6 parser)
  * through the identical operators.
  */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("decodeStub golden: uniform payload → uniform 16-bin histogram") {
    // every byte value 0..255 twice → each 16-value bucket holds 32/512
    val payload = Array.tabulate(512)(j => (j % 256).toByte)
    val f = Multimodal.decodeStub(payload)
    assert(f.length == 16, "feature width contract: 16 floats")
    f.foreach(x => assert(math.abs(x - 0.0625f) < 1e-6f, f.mkString(",")))
  }

  test("decodeStub golden: skewed payload + L1 normalization + empty safety") {
    val zeros = Array.fill(100)(0.toByte)
    val f = Multimodal.decodeStub(zeros)
    assert(f(0) == 1.0f && f.drop(1).forall(_ == 0f), f.mkString(","))
    assert(math.abs(f.sum - 1f) < 1e-5f, "L1-normalized contract")
    // empty payload must not divide by zero
    val e = Multimodal.decodeStub(Array.empty[Byte])
    assert(e.length == 16 && e.forall(_ == 0f))
  }

  test("decodeStub golden: pinned histogram for a fixed synthetic payload") {
    // the exact bucket counts for mediaBinary ref MEDIA-0 (len 512) —
    // the same closed form the mm_features DuckDB oracle reproduces; a
    // codec swap that accidentally changes the synthetic path fails here
    val m = Multimodal.mediaBinary(spark, 1, 1).collect().head
    val counts = Multimodal.decodeStub(m.payload).map(s => math.round(s * m.payload.length))
    assert(counts.sum == 512)
    val want = Array.tabulate(512) { j =>
      (((0L * 2654435761L + j * 40503L) >>> 7) & 0xff).toInt >> 4
    }.groupBy(identity).view.mapValues(_.length).toMap
    (0 until 16).foreach(b =>
      assert(counts(b) == want.getOrElse(b, 0), s"bucket $b"))
  }

  test("feature extraction keeps the contract through the typed plan") {
    val media = Multimodal.mediaBinary(spark, 30, 4)
    val feats = Multimodal.extractFeatures(media).collect()
    assert(feats.length == 30)
    feats.foreach { f =>
      assert(f.features.length == 16)
      assert(math.abs(f.features.sum - 1f) < 1e-4f)
      assert(f.n_bytes >= 512)
    }
    // deterministic across partitionings (payloads are pure functions of
    // the ref; the plan must not perturb them)
    val again = Multimodal.extractFeatures(Multimodal.mediaBinary(spark, 30, 2))
      .collect()
    assert(feats.sortBy(_.media_ref).map(_.features.toSeq).toSeq ==
      again.sortBy(_.media_ref).map(_.features.toSeq).toSeq)
  }

  test("frame sampling decodes per frame with the same codec seam") {
    val media = Multimodal.mediaBinary(spark, 12, 2)
    val frames = Multimodal.frameSample(media, frameSize = 128, everyK = 2)
    val rows = frames.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getInt(1) % 2 == 0) // every 2nd frame
      assert(r.getSeq[Float](3).length == 16)
    }
  }

  test("decodePpm: a real P6 decoder honors the NetPBM format") {
    // constant-color 4×3 image: means are exact, luma lands in one bin
    val w = 4; val h = 3
    val header = s"P6\n# comment to skip\n$w $h\n255\n".getBytes("US-ASCII")
    val raster = Array.fill(w * h)(Array(200.toByte, 100.toByte, 50.toByte)).flatten
    val f = Multimodal.decodePpm(header ++ raster)
    assert(f.length == 16, "same feature-width contract as the stub")
    assert(math.abs(f(0) - 200f / 255f) < 1e-6f, s"meanR ${f(0)}")
    assert(math.abs(f(1) - 100f / 255f) < 1e-6f, s"meanG ${f(1)}")
    assert(math.abs(f(2) - 50f / 255f) < 1e-6f, s"meanB ${f(2)}")
    val luma = (299 * 200 + 587 * 100 + 114 * 50) / 1000
    val bin = math.min(luma * 13 / 256, 12)
    (0 until 13).foreach(k =>
      assert(f(3 + k) == (if (k == bin) 1f else 0f), s"luma bin $k"))
    // malformed payloads are data rows, not job aborts
    assert(Multimodal.decodePpm("P5\n1 1\n255\n!".getBytes).forall(_ == 0f))
    assert(Multimodal.decodePpm(header.dropRight(10)).forall(_ == 0f))
    assert(Multimodal.decodePpm(Array.empty[Byte]).forall(_ == 0f))
    // adversarial header whose w*h overflows Int (65536^2 = 0 in Int
    // arithmetic) must hit the truncation guard, not emit garbage
    assert(Multimodal.decodePpm(
      ("P6\n65536 65536\n255\n" + "x" * 100).getBytes).forall(_ == 0f))
  }

  test("codec swap is drop-in: both codecs run through the SAME operators") {
    import spark.implicits._
    // media rows whose payloads are real PPM images
    val media = spark.range(0, 10, 1, 3).map { i =>
      Multimodal.MediaRow(s"PPM-$i", "image",
        Multimodal.ppmPayload(8, 6, i), 8, 6)
    }
    // one-argument swap — identical operator, schema, and partitioning
    val viaStub = Multimodal.extractFeatures(media).collect()
    val viaPpm = Multimodal.extractFeatures(media, Multimodal.decodePpm).collect()
    assert(viaStub.length == 10 && viaPpm.length == 10)
    assert(viaStub.head.features.length == viaPpm.head.features.length)
    // the PPM decode is a genuine decode: channel means in (0,1) and the
    // luma histogram L1-normalizes over pixels
    viaPpm.foreach { r =>
      assert(r.features.take(3).forall(x => x > 0f && x < 1f), r.features.mkString(","))
      assert(math.abs(r.features.drop(3).sum - 1f) < 1e-4f)
    }
    // featureTable bridge accepts the swapped codec too
    val tbl = Multimodal.featureTable(media, Multimodal.decodePpm)
    assert(tbl.columns.toSeq == Seq("media_ref", "kind", "embedding"))
    assert(tbl.count() == 10)
  }

  test("decodePng: real zlib round-trip, all five filters, equals the PPM twin") {
    // the encoder cycles filter types per row (None/Sub/Up/Average/
    // Paeth), so h ≥ 5 exercises every reconstruction branch; the PNG
    // and PPM payloads of the SAME raster must produce bit-identical
    // features (identical arithmetic at maxval = 255)
    (0L until 6L).foreach { seed =>
      val png = Multimodal.decodePng(Multimodal.pngPayload(24, 16, seed))
      val ppm = Multimodal.decodePpm(Multimodal.ppmPayload(24, 16, seed))
      assert(png.toSeq == ppm.toSeq, s"seed $seed: PNG ${png.mkString(",")}")
      assert(png.take(3).forall(x => x > 0f && x < 1f), "means are a real decode")
      assert(math.abs(png.drop(3).sum - 1f) < 1e-4f, "luma hist L1-normalized")
    }
  }

  test("decodePng: gray and RGBA color types decode; alpha is ignored") {
    // gray: r = g = b = the single channel
    val g = Multimodal.decodePng(Multimodal.pngPayload(9, 7, 3L, colorType = 0))
    assert(g(0) == g(1) && g(1) == g(2) && g(0) > 0f, g.mkString(","))
    // RGBA shares the RGB prefix per pixel only in its own raster
    // indexing; just pin that it decodes to a valid feature vector
    val a = Multimodal.decodePng(Multimodal.pngPayload(9, 7, 3L, colorType = 6))
    assert(a.take(3).forall(x => x > 0f && x < 1f))
    assert(math.abs(a.drop(3).sum - 1f) < 1e-4f)
  }

  test("decodePng: malformed payloads are data rows, not job aborts") {
    val good = Multimodal.pngPayload(8, 8, 1L)
    assert(Multimodal.decodePng(Array.empty[Byte]).forall(_ == 0f))
    assert(Multimodal.decodePng("not a png at all".getBytes).forall(_ == 0f))
    // truncated mid-IDAT: short zlib stream must not spin or throw
    assert(Multimodal.decodePng(good.dropRight(20)).forall(_ == 0f))
    // corrupt the zlib stream body
    val corrupt = good.clone()
    corrupt(good.length - 30) = (corrupt(good.length - 30) ^ 0x5a).toByte
    val c = Multimodal.decodePng(corrupt)
    assert(c.length == 16) // zero vector or a decode — never an abort
    // unsupported shapes (16-bit depth) refuse cleanly
    val deep = good.clone()
    deep(8 + 8 + 8) = 16 // IHDR bit-depth byte
    assert(Multimodal.decodePng(deep).forall(_ == 0f))
  }

  test("decodePng runs through the identical operator chain (drop-in #3)") {
    import spark.implicits._
    val media = spark.range(0, 8, 1, 3).map { i =>
      Multimodal.MediaRow(s"PNG-$i", "image",
        Multimodal.pngPayload(24, 16, i), 24, 16)
    }
    val viaPng = Multimodal.extractFeatures(media, Multimodal.decodePng)
      .collect().sortBy(_.media_ref)
    assert(viaPng.length == 8)
    // distributed decode equals local decode (pure function of payload)
    viaPng.zipWithIndex.foreach { case (r, _) =>
      val seed = r.media_ref.stripPrefix("PNG-").toLong
      assert(r.features.toSeq ==
        Multimodal.decodePng(Multimodal.pngPayload(24, 16, seed)).toSeq)
    }
  }

  test("decodeJpeg: real lossy decode — exact dims, bounded channel-mean error") {
    // lossless-ish case first: a solid color survives JPEG almost
    // exactly (DC-only blocks), so means land within 1.5/255
    val solid = {
      val img = new java.awt.image.BufferedImage(
        16, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until 16).foreach(y => (0 until 16).foreach(x =>
        img.setRGB(x, y, (100 << 16) | (150 << 8) | 200)))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    val sf = Multimodal.decodeJpeg(solid)
    assert(math.abs(sf(0) - 100f / 255) < 1.5f / 255, sf.mkString(","))
    assert(math.abs(sf(1) - 150f / 255) < 1.5f / 255)
    assert(math.abs(sf(2) - 200f / 255) < 1.5f / 255)
    // formula-raster fixtures: means within the gate tolerance, luma
    // histogram still L1-normalized, dims recovered exactly
    (0L until 6L).foreach { seed =>
      val f = Multimodal.decodeJpeg(Multimodal.jpegPayload(24, 16, seed))
      val src = Multimodal.pngRaster(24, 16, seed, 3)
      val sums = new Array[Long](3)
      src.indices.foreach(k => sums(k % 3) += src(k))
      (0 until 3).foreach { c =>
        val want = sums(c).toFloat / (24 * 16) / 255f
        assert(math.abs(f(c) - want) <= 0.03f,
          s"seed $seed ch $c: got ${f(c)}, want $want")
      }
      assert(math.abs(f.drop(3).sum - 1f) < 1e-4f, "luma hist L1-normalized")
    }
    // malformed payloads are data rows, not job aborts
    assert(Multimodal.decodeJpeg(Array.empty[Byte]).forall(_ == 0f))
    assert(Multimodal.decodeJpeg("not a jpeg".getBytes).forall(_ == 0f))
  }

  test("jpegFeatures gate rows: exact dims, all within tolerance, distributed") {
    val rows = Multimodal.jpegFeatures(Multimodal.jpegMedia(spark, 10, 3))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getBoolean(3)))
    assert(rows.length == 10)
    rows.foreach { case (ref, w, h, ok) =>
      assert(w == 24 && h == 16 && ok, s"$ref: ${w}x$h ok=$ok")
    }
    // a corrupted payload flips the flag instead of aborting the job
    import spark.implicits._
    val bad = spark.createDataset(Seq(
      Multimodal.MediaRow("JPEG-0", "image", "garbage".getBytes, 24, 16)))
    val r = Multimodal.jpegFeatures(bad).collect().head
    assert(!r.getBoolean(3) && r.getInt(1) == -1)
  }

  test("decodeWav: real RIFF PCM16 decode equals the sample formula") {
    (0L until 6L).foreach { seed =>
      val f = Multimodal.decodeWav(Multimodal.wavPayload(256, seed))
      // recompute expected features from the formula
      var sumS = 0L; var sumA = 0L; var zcs = 0L; var prevNeg = false
      val hist = new Array[Int](13)
      (0 until 256).foreach { j =>
        val u = (((seed * 2654435761L + j * 40503L) >>> 9) & 0xffff).toInt
        val s = if (u >= 32768) u - 65536 else u
        sumS += s; sumA += math.abs(s)
        if (j > 0 && (s < 0) != prevNeg) zcs += 1
        prevNeg = s < 0
        hist(math.min(u * 13 / 65536, 12)) += 1
      }
      assert(f(0) == sumS.toFloat / 256 / 32768, s"seed $seed mean")
      assert(f(1) == sumA.toFloat / 256 / 32768, s"seed $seed meanabs")
      assert(f(2) == zcs.toFloat / 256, s"seed $seed zc")
      (0 until 13).foreach(k =>
        assert(f(3 + k) == hist(k).toFloat / 256, s"seed $seed bin $k"))
    }
    // malformed / unsupported payloads are data rows, not job aborts
    assert(Multimodal.decodeWav(Array.empty[Byte]).forall(_ == 0f))
    assert(Multimodal.decodeWav("RIFFgarbage".getBytes).forall(_ == 0f))
    val good = Multimodal.wavPayload(64, 1L)
    assert(Multimodal.decodeWav(good.dropRight(10)).forall(_ == 0f))
    // stereo refuses cleanly (fmt channels byte)
    val stereo = good.clone(); stereo(22) = 2
    assert(Multimodal.decodeWav(stereo).forall(_ == 0f))
  }

  test("decodeWav runs through the identical operator chain (drop-in #4)") {
    val via = Multimodal.extractFeatures(
      Multimodal.wavMedia(spark, 8, 3), Multimodal.decodeWav)
      .collect().sortBy(_.media_ref)
    assert(via.length == 8 && via.forall(_.kind == "audio"))
    via.foreach { r =>
      val seed = r.media_ref.stripPrefix("WAV-").toLong
      assert(r.features.toSeq ==
        Multimodal.decodeWav(Multimodal.wavPayload(256, seed)).toSeq)
      assert(r.features.exists(_ != 0f), "decode produced a real vector")
    }
  }
}
