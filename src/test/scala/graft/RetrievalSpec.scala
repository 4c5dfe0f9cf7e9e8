package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Retrieval

/** Inverted-index and BM25 operator semantics + plan-shape gates
  * (DuckDB value parity is the driver gate `tx_inverted_index` /
  * `tx_bm25_topk`; these pin the invariants and the plan posture).
  */
class RetrievalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def corpus = Seq(
    (1L, "apple banana apple cherry"),
    (2L, "banana banana banana"),
    (3L, "apple durian"),
    (4L, "durian durian cherry apple banana"),
    (5L, "")).toDF("doc_id", "text")

  test("invertedIndex: exact postings, sorted, one entry per doc") {
    val (idx, ledger) = Retrieval.invertedIndex(corpus, "doc_id", "text")
    val got = idx.collect().map(r => (r.getString(0), r.getLong(1),
      r.getSeq[Long](2).toList)).sortBy(_._1)
    assert(got.toList == List(
      ("apple", 3L, List(1L, 3L, 4L)),
      ("banana", 3L, List(1L, 2L, 4L)),
      ("cherry", 2L, List(1L, 4L)),
      ("durian", 2L, List(3L, 4L))))
    val l = ledger.head()
    assert(l.getLong(0) == 4 && l.getLong(1) == 4 && l.getLong(2) == 0)
  }

  test("invertedIndex: df cap drops hot terms BEFORE lists build, ledger accounts") {
    val (idx, ledger) = Retrieval.invertedIndex(corpus, "doc_id", "text", maxDf = 2)
    val kept = idx.collect().map(_.getString(0)).toSet
    assert(kept == Set("cherry", "durian"))
    val l = ledger.head()
    // 4 terms total, 2 kept, 3+3 postings dropped (apple + banana)
    assert(l.getLong(0) == 4 && l.getLong(1) == 2 && l.getLong(2) == 6)
    // the cap must act before collect_list: the plan's aggregation
    // over postings sees only rows that survived the broadcast join
    val plan = idx.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("bm25TopK: tf and length norm order as BM25 orders") {
    val top = Retrieval.bm25TopK(corpus, "doc_id", "text",
      Seq("banana"), k = 5).collect()
    // doc 2 (tf=3, dl=3) beats doc 1 (tf=1) and doc 4 (tf=1, longer);
    // doc 1 (dl=4) beats doc 4 (dl=5) on length norm alone
    assert(top.map(_.getLong(0)).take(3).toList == List(2L, 1L, 4L))
    // docs without the term score EXACTLY zero, tiebroken by id
    assert(top.drop(3).map(r => (r.getLong(0), r.getDouble(top.head.length - 1)))
      .toList == List((3L, 0.0), (5L, 0.0)))
    // scores strictly descending over the positive prefix
    val scores = top.map(_.getDouble(top.head.length - 1))
    assert(scores.take(3).sliding(2).forall(p => p(0) > p(1)), scores.toList)
  }

  test("bm25TopK: multi-term sum, rational idf favors rarer terms") {
    // controlled idf comparison: doc 4 holds 'cherry' (df=2) and
    // 'banana' (df=3) at the SAME tf=1 and the same dl — the rarer
    // term must score strictly higher
    val byRare = Retrieval.bm25TopK(corpus, "doc_id", "text",
      Seq("cherry"), k = 5).collect()
      .find(_.getLong(0) == 4L).get.getDouble(3)
    val byHot = Retrieval.bm25TopK(corpus, "doc_id", "text",
      Seq("banana"), k = 5).collect()
      .find(_.getLong(0) == 4L).get.getDouble(3)
    assert(byRare > byHot)
    // a two-term query scores the sum of its single-term parts
    val both = Retrieval.bm25TopK(corpus, "doc_id", "text",
      Seq("durian", "banana"), k = 5).collect()
      .find(_.getLong(0) == 4L).get
    val d = Retrieval.bm25TopK(corpus, "doc_id", "text", Seq("durian"), k = 5)
      .collect().find(_.getLong(0) == 4L).get.getDouble(3)
    val b = Retrieval.bm25TopK(corpus, "doc_id", "text", Seq("banana"), k = 5)
      .collect().find(_.getLong(0) == 4L).get.getDouble(3)
    assert(both.getDouble(4) == d + b)
  }

  test("bm25TopK plan: TakeOrdered top-k, broadcast stats, no sort-merge join") {
    val df = Retrieval.bm25TopK(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet"),
      "doc_id", "text", Seq("vector", "customer"), k = 10)
    df.count()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastHashJoin"), plan)
  }
}
