package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Multimodal

/** Codec-seam contract tests: `Multimodal.decodeStub` is the single
  * clearly-marked swap point for a real codec (libjpeg/ffmpeg/
  * soundfile, absent from this container). These tests pin the CONTRACT
  * a drop-in replacement must keep — signature
  * `Array[Byte] => Array[Float]`, fixed feature width, L1
  * normalization, determinism — plus golden outputs for the stub
  * itself, so swapping the body is verified by re-running this suite
  * with new goldens and nothing else changes.
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
}
