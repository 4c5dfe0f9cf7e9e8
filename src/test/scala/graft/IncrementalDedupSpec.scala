package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, IncrementalDedup}
import graft.ops.IncrementalDedup.LshConfig
import graft.sources.SnapshotTable

/** Incremental MinHash-LSH maintenance: per-increment emissions union
  * to the batch pair set, order-invariant; keyed replays no-op; the
  * cap-at-ingest semantics and its divergence from batch's retroactive
  * cap are pinned explicitly.
  */
class IncrementalDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = "/root/testdata/sf0.001"
  private val cfg = LshConfig(k = 4, rowsPerBand = 2, threshold = 0.8)

  private def docs() = spark.read.parquet(s"$dir/documents.parquet")

  private def batchPairs(): Set[(Long, Long)] =
    Dedup.minhashLsh(docs(), "doc_id", "text", k = cfg.k,
        rowsPerBand = cfg.rowsPerBand, threshold = cfg.threshold,
        maxBucket = 0)
      .select(col("id_a"), col("id_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  private def pairsOf(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select(col("id_a"), col("id_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("3-increment ingest emits exactly the batch pair set, each pair once") {
    val tmp = java.nio.file.Files.createTempDirectory("incdedup").toString
    val d = docs()
    val emitted = (0 until 3).map { i =>
      pairsOf(IncrementalDedup.update(spark, tmp,
        d.filter(col("doc_id") % 3 === i), "doc_id", "text", s"b$i", cfg))
    }
    // disjoint emissions (each pair exactly once, at its later doc's batch)
    assert(emitted(0).intersect(emitted(1)).isEmpty)
    assert(emitted(0).intersect(emitted(2)).isEmpty)
    assert(emitted(1).intersect(emitted(2)).isEmpty)
    val union = emitted.reduce(_ ++ _)
    val batch = batchPairs()
    assert(union == batch,
      s"missing=${(batch -- union).size} extra=${(union -- batch).size}")
    assert(batch.nonEmpty, "no near-dups in fixture — test is vacuous")
    // the accumulated emission log agrees
    assert(pairsOf(IncrementalDedup.pairsFromTable(spark, tmp)) == batch)
    // jaccard values in the log match the batch pipeline's (round-6)
    val logJ = IncrementalDedup.pairsFromTable(spark, tmp)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6)).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    Dedup.minhashLsh(d, "doc_id", "text", k = cfg.k,
        rowsPerBand = cfg.rowsPerBand, threshold = cfg.threshold, maxBucket = 0)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6)).collect()
      .foreach(r => assert(
        logJ((r.getLong(0), r.getLong(1))) == r.getDouble(2), r.toString))
  }

  test("emission set is invariant to the increment split") {
    val tmp = java.nio.file.Files.createTempDirectory("incdedup2").toString
    val d = docs()
    // a different, uneven split: 1 doc, then everything else
    val first = d.filter(col("doc_id") < 1)
    val rest = d.filter(col("doc_id") >= 1)
    val e1 = pairsOf(IncrementalDedup.update(spark, tmp, first, "doc_id",
      "text", "s0", cfg))
    val e2 = pairsOf(IncrementalDedup.update(spark, tmp, rest, "doc_id",
      "text", "s1", cfg))
    assert((e1 ++ e2) == batchPairs())
  }

  test("keyed replay re-derives identical pairs and appends nothing") {
    val tmp = java.nio.file.Files.createTempDirectory("incdedup3").toString
    val d = docs()
    val half = d.filter(col("doc_id") % 2 === 0)
    val once = pairsOf(IncrementalDedup.update(spark, tmp, half, "doc_id",
      "text", "h0", cfg))
    val hists = Seq("postings", "arrays", "pairs")
      .map(t => SnapshotTable.history(s"$tmp/$t").length)
    val again = pairsOf(IncrementalDedup.update(spark, tmp, half, "doc_id",
      "text", "h0", cfg))
    assert(again == once)
    val histsAfter = Seq("postings", "arrays", "pairs")
      .map(t => SnapshotTable.history(s"$tmp/$t").length)
    assert(histsAfter == hists, s"replay appended: $hists -> $histsAfter")
    // emission log unchanged too (no duplicate rows)
    assert(pairsOf(IncrementalDedup.pairsFromTable(spark, tmp)) == once)
  }

  test("crash between appends (partial state) heals on retry") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("incdedup4").toString
    val d = docs()
    val b0 = d.filter(col("doc_id") % 2 === 0)
    val b1 = d.filter(col("doc_id") % 2 === 1)
    IncrementalDedup.update(spark, tmp, b0, "doc_id", "text", "c0", cfg)
    // simulate a crash that committed ONLY b1's postings append: write
    // it with b1's key, then run the full update with the same key —
    // the postings append must no-op while arrays/pairs complete
    val toks = Dedup.docTokensHashed(b1, "doc_id", "text", cfg.minTokenLen)
    val postings = Dedup.lshBands(
      Dedup.minhashSignatures(toks, cfg.k), cfg.k, cfg.rowsPerBand)
    SnapshotTable.write(postings, s"$tmp/postings", mode = "append",
      idempotencyKey = "c1")
    val postingsSnaps = SnapshotTable.history(s"$tmp/postings").length
    val e1 = pairsOf(IncrementalDedup.update(spark, tmp, b1, "doc_id",
      "text", "c1", cfg))
    assert(SnapshotTable.history(s"$tmp/postings").length == postingsSnaps,
      "retry re-appended postings despite the committed key")
    val all = pairsOf(IncrementalDedup.pairsFromTable(spark, tmp))
    assert(all == batchPairs(), "post-crash retry lost or duplicated pairs")
    assert(e1.subsetOf(all))
  }

  test("out-of-order retry precondition is enforced, not just documented") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("incdedup5").toString
    val d = docs()
    val b0 = d.filter(col("doc_id") % 3 === 0)
    val b1 = d.filter(col("doc_id") % 3 === 1)
    IncrementalDedup.update(spark, tmp, b0, "doc_id", "text", "o0", cfg)
    // simulate batch o1 crashing after ONLY its postings append
    val toks = Dedup.docTokensHashed(b1, "doc_id", "text", cfg.minTokenLen)
    val postings = Dedup.lshBands(
      Dedup.minhashSignatures(toks, cfg.k), cfg.k, cfg.rowsPerBand)
    SnapshotTable.write(postings, s"$tmp/postings", mode = "append",
      idempotencyKey = "o1")
    // 1) ingesting the NEXT batch while o1 is partially committed must
    //    fail loudly at the violating ingest, before any append
    val pairsSnaps = SnapshotTable.history(s"$tmp/pairs").length
    val e = intercept[IllegalStateException] {
      IncrementalDedup.update(spark, tmp,
        d.filter(col("doc_id") % 3 === 2), "doc_id", "text", "o2", cfg)
    }
    assert(e.getMessage.contains("partially committed"), e.getMessage)
    assert(SnapshotTable.history(s"$tmp/pairs").length == pairsSnaps,
      "rejected ingest still appended to the emission log")
    // 2) the in-order retry of the crashed o1 completes normally...
    IncrementalDedup.update(spark, tmp, b1, "doc_id", "text", "o1", cfg)
    // ...and the previously-rejected o2 now ingests cleanly
    IncrementalDedup.update(spark, tmp,
      d.filter(col("doc_id") % 3 === 2), "doc_id", "text", "o2", cfg)
    assert(pairsOf(IncrementalDedup.pairsFromTable(spark, tmp)) == batchPairs())
    // 3) a TOO-LATE retry of o1 (after o2 committed) must also fail —
    //    its probe would re-form o1×o2 pairs the completed o2 already
    //    emitted
    val e2 = intercept[IllegalStateException] {
      IncrementalDedup.update(spark, tmp, b1, "doc_id", "text", "o1", cfg)
    }
    assert(e2.getMessage.contains("out-of-order retry"), e2.getMessage)
  }

  test("embedding twin: 3-increment sign-LSH ingest equals the batch pair set") {
    import graft.ops.{IncrementalDedup => ID, Similarity}
    val tmp = java.nio.file.Files.createTempDirectory("incvec").toString
    val vcfg = ID.VecLshConfig(planes = 4, bands = 2, threshold = 0.4)
    val v = spark.read.parquet(s"$dir/embeddings.parquet")
    val emitted = (0 until 3).map { i =>
      pairsOf(ID.updateVectors(spark, tmp, v.filter(col("vec_id") % 3 === i),
        "vec_id", "embedding", s"v$i", vcfg))
    }
    assert(emitted(0).intersect(emitted(1)).isEmpty)
    assert(emitted(0).intersect(emitted(2)).isEmpty)
    assert(emitted(1).intersect(emitted(2)).isEmpty)
    val union = emitted.reduce(_ ++ _)
    val batch = pairsOf(Similarity.signLshPairs(v, "vec_id", "embedding",
      planes = vcfg.planes, bands = vcfg.bands, threshold = vcfg.threshold))
    assert(union == batch,
      s"missing=${(batch -- union).size} extra=${(union -- batch).size}")
    assert(batch.nonEmpty, "no near-dup vectors in fixture — vacuous")
    assert(pairsOf(ID.vecPairsFromTable(spark, tmp)) == batch)
    // keyed replay: same pairs, nothing appended
    val hist = SnapshotTable.history(s"$tmp/vec_pairs").length
    val again = pairsOf(ID.updateVectors(spark, tmp,
      v.filter(col("vec_id") % 3 === 2), "vec_id", "embedding", "v2", vcfg))
    assert(again == emitted(2))
    assert(SnapshotTable.history(s"$tmp/vec_pairs").length == hist)
  }

  test("compaction preserves state content and later increments still agree") {
    val tmp = java.nio.file.Files.createTempDirectory("incdedup6").toString
    val d = docs()
    IncrementalDedup.update(spark, tmp, d.filter(col("doc_id") % 3 === 0),
      "doc_id", "text", "m0", cfg)
    IncrementalDedup.update(spark, tmp, d.filter(col("doc_id") % 3 === 1),
      "doc_id", "text", "m1", cfg)
    val before = pairsOf(IncrementalDedup.pairsFromTable(spark, tmp))
    IncrementalDedup.compactState(spark, tmp, numFiles = 1)
    assert(pairsOf(IncrementalDedup.pairsFromTable(spark, tmp)) == before)
    // ingest continues on the compacted state and still lands on batch
    IncrementalDedup.update(spark, tmp, d.filter(col("doc_id") % 3 === 2),
      "doc_id", "text", "m2", cfg)
    assert(pairsOf(IncrementalDedup.pairsFromTable(spark, tmp)) == batchPairs())
  }

  test("cap-at-ingest: capped run emits a subset; uncapped equals batch") {
    val tmp = java.nio.file.Files.createTempDirectory("incdedup5").toString
    val d = docs()
    val capped = cfg.copy(maxBucket = 2)
    val e = (0 until 2).map { i =>
      pairsOf(IncrementalDedup.update(spark, tmp,
        d.filter(col("doc_id") % 2 === i), "doc_id", "text", s"k$i", capped))
    }.reduce(_ ++ _)
    // capped emissions never invent pairs...
    assert(e.subsetOf(batchPairs()))
    // ...and the cap genuinely drops something on this fixture (buckets
    // of near-identical docs exceed 2 members), or the test is vacuous
    assert(e != batchPairs(), "maxBucket=2 dropped nothing — vacuous")
  }
}
