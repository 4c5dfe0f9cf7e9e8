package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Brandes

/** Brandes dependency accumulation against hand-computed values — an
  * independent check that the engine AND the SQL oracle (which both
  * implement Brandes) haven't converged on a shared bug.
  */
class BrandesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def deps(edges: Seq[(String, String)], sources: Seq[String]) =
    Brandes.dependencies(edges.toDF("u", "v"), sources.toDF("hub"))
      .as[(String, String, Double)].collect()
      .map { case (h, n, d) => (h, n) -> d }.toMap

  test("path graph: interior nodes accumulate downstream dependency") {
    // a-b-c-d from source a: δ(c)=1·(1+δ(d))=1, δ(b)=1·(1+δ(c))=2
    val d = deps(Seq("a" -> "b", "b" -> "c", "c" -> "d"), Seq("a"))
    assert(d === Map(("a", "b") -> 2.0, ("a", "c") -> 1.0, ("a", "d") -> 0.0))
  }

  test("diamond: dependency splits across the two shortest paths") {
    // a-b-d and a-c-d: σ(d)=2, δ(b)=δ(c)=(1/2)·(1+0)=0.5
    val d = deps(Seq("a" -> "b", "a" -> "c", "b" -> "d", "c" -> "d"),
      Seq("a"))
    assert(d === Map(("a", "b") -> 0.5, ("a", "c") -> 0.5,
      ("a", "d") -> 0.0))
  }

  test("two sources accumulate independently; star center dominates") {
    // star: center x, leaves p q r. From source p: δ(x)=2 (covers q,r).
    val star = Seq("x" -> "p", "x" -> "q", "x" -> "r")
    val d = deps(star, Seq("p", "q"))
    assert(d(("p", "x")) === 2.0 && d(("q", "x")) === 2.0)
    assert(d(("p", "q")) === 0.0 && d(("p", "r")) === 0.0)
  }

  test("sigma multiplicities: 2-wide then rejoin then split") {
    // a-{b,c}-d-e: σ(d)=2, σ(e)=2; δ(d)=(2/2)·(1+0)=1... plus e's own
    // dependency: δ(d)=σ(d)/σ(e)·(1+δ(e))=1; δ(b)=1/2·(1+δ(d))=1
    val g = Seq("a" -> "b", "a" -> "c", "b" -> "d", "c" -> "d", "d" -> "e")
    val d = deps(g, Seq("a"))
    assert(d(("a", "d")) === 1.0)
    assert(d(("a", "b")) === 1.0 && d(("a", "c")) === 1.0)
    assert(d(("a", "e")) === 0.0)
  }
}
