package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.kg.Canonical

/** Large-star/small-star connected components vs a union-find oracle on
  * seeded random graphs (SURVEY §5.2 property tests).
  */
class CanonicalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  def unionFind(n: Int, edges: Seq[(Int, Int)]): Map[Int, Int] = {
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // path-compress to min label
    (0 until n).map(x => x -> find(x)).toMap
  }

  def check(n: Int, edges: Seq[(Int, Int)]): Unit = {
    val df = edges.map { case (a, b) => (f"N$a%05d", f"N$b%05d") }.toDF("src", "dst")
    val got = Canonical.connectedComponents(df)
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    val want = unionFind(n, edges)
    // engine covers nodes that appear in edges; min-label components
    val nodesInEdges = edges.flatMap(e => Seq(e._1, e._2)).toSet
    nodesInEdges.foreach { x =>
      assert(got(f"N$x%05d") == f"N${want(x)}%05d",
        s"node $x: got ${got(f"N$x%05d")} want ${want(x)}")
    }
  }

  test("CC matches union-find on seeded random graphs") {
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 4) {
      val n = 50 + trial * 40
      val m = n * 2
      val edges = Seq.fill(m)((rnd.nextInt(n), rnd.nextInt(n))).filter(e => e._1 != e._2)
      check(n, edges)
    }
  }

  test("CC handles a long path graph (worst case for label propagation)") {
    val edges = (0 until 63).map(i => (i, i + 1))
    check(64, edges)
  }

  test("CC handles a star hub (skew case)") {
    val edges = (1 until 200).map(i => (0, i))
    check(200, edges)
  }

  test("canonicalizeTriples broadcast is row-count-guarded") {
    import org.apache.spark.sql.functions._
    val mapping = Seq(("Q1", "Q1"), ("Q2", "Q1")).toDF("node", "component")
    val triples = Seq(
      (graft.kg.Model.WD + "Q2", "p", "x", false, ""),
      (graft.kg.Model.WD + "Q3", "p", graft.kg.Model.WD + "Q2", false, ""))
      .toDF("subj", "pred", "obj", "objIsLiteral", "objDatatype")
    // dictionary-sized mapping: the hint is applied (logical plan carries
    // the broadcast join hint before AQE can second-guess it)
    val small = Canonical.canonicalizeTriples(triples, mapping)
    assert(small.queryExecution.optimizedPlan.toString
      .toLowerCase.contains("broadcast"),
      small.queryExecution.optimizedPlan.toString.take(1500))
    // above the guard: NO forced hint — the planner keeps its freedom to
    // fall back to a shuffle join when the entity space is corpus-scale
    val big = Canonical.canonicalizeTriples(triples, mapping, maxBroadcastRows = 0L)
    assert(!big.queryExecution.optimizedPlan.toString
      .toLowerCase.contains("strategy=broadcast"),
      big.queryExecution.optimizedPlan.toString.take(1500))
    // semantics identical either way
    assert(small.collect().map(_.toSeq).toSet == big.collect().map(_.toSeq).toSet)
    val out = small.collect().map(r => (r.getString(0), r.getString(2))).toSet
    assert(out == Set((graft.kg.Model.WD + "Q1", "x"),
      (graft.kg.Model.WD + "Q3", graft.kg.Model.WD + "Q1")))
  }

  test("CC survives a 10^5-degree hub without a per-node neighbor buffer") {
    // one celebrity node with 100k neighbors: the min+join star steps
    // stream it; the old collect_set formulation materialized the whole
    // neighbor list in one aggregation buffer
    val n = 100001
    val edges = (1 until n).map(i => (f"N$i%06d", "N000000")).toDF("src", "dst")
    val mapping = Canonical.connectedComponents(edges)
    import org.apache.spark.sql.functions._
    val comps = mapping.select(countDistinct(col("component")).cast("long"),
      count(lit(1)).cast("long")).head()
    assert(comps.getLong(0) == 1L)
    assert(comps.getLong(1) == n.toLong)
  }
}
