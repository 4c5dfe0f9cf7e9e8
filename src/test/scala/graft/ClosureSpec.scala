package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Closure

/** Path-doubling transitive closure: exactness (pairs AND min-depths)
  * against the semi-naive fixpoint reference on structured and
  * pseudo-random DAGs, and the log-round depth-coverage contract.
  */
class ClosureSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def close(edges: Seq[(String, String)], rounds: Int) =
    Closure.transitive(edges.toDF("child", "parent"), rounds)
      .as[(String, String, Long)].collect().toSet

  private def naive(edges: Seq[(String, String)]) =
    Closure.naive(edges.toDF("child", "parent"), 40)
      .as[(String, String, Long)].collect().toSet

  test("chain: all ancestor pairs with exact depths") {
    val chain = Seq("a" -> "b", "b" -> "c", "c" -> "d", "d" -> "e")
    val got = close(chain, 2) // 2^2 = 4 ≥ max depth 4
    val want = Set(
      ("a", "b", 1L), ("a", "c", 2L), ("a", "d", 3L), ("a", "e", 4L),
      ("b", "c", 1L), ("b", "d", 2L), ("b", "e", 3L),
      ("c", "d", 1L), ("c", "e", 2L), ("d", "e", 1L))
    assert(got === want)
  }

  test("diamond: min-depth wins over the longer derivation") {
    // a→b→d and a→c→d plus a shortcut a→d: depth(a,d) must be 1
    val dag = Seq("a" -> "b", "a" -> "c", "b" -> "d", "c" -> "d", "a" -> "d")
    val got = close(dag, 3)
    assert(got.collect { case ("a", "d", depth) => depth } === Set(1L))
    assert(got === naive(dag))
  }

  test("pseudo-random DAGs match the semi-naive fixpoint exactly") {
    // layered topological ids make cycles impossible; edges picked by a
    // deterministic hash so the spec is rerun-stable
    for (seed <- 1 to 3) {
      val n = 24
      val edges = for {
        i <- 0 until n; j <- (i + 1) until n
        if ((i * 2654435761L + j * 40503L + seed) % 7) == 0
      } yield (s"n$i", s"n$j")
      assert(edges.nonEmpty)
      assert(close(edges, 5) === naive(edges), s"seed=$seed")
    }
  }

  test("under-provisioned rounds cover exactly min-depth ≤ 2^rounds") {
    val chain = Seq("a" -> "b", "b" -> "c", "c" -> "d", "d" -> "e")
    val got = close(chain, 1) // covers min-depth ≤ 2 only
    assert(got.map(_._3).max === 2L)
    assert(!got.exists { case (s, t, _) => s == "a" && t == "e" })
  }
}
