package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Shacl
import graft.kg.Model

/** SHACL-lite validator: each constraint kind (minCount, maxCount,
  * exact-count, nodeKind IRI, datatype) detects its violation on a toy
  * graph with a known-bad node per shape, non-target nodes are ignored,
  * and the report carries zero-violation shapes explicitly.
  */
class ShaclSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val T = "http://ex/Thing"
  private def triples = Seq(
    // GOOD: typed, one p, IRI q-object, integer r-literal
    ("good", Model.RDF_TYPE, T, false, ""),
    ("good", "p", "x1", false, ""),
    ("good", "q", "http://ex/ok", false, ""),
    ("good", "r", "42", true, Model.XSD_INTEGER),
    // BAD-missing: typed but no p at all (minCount)
    ("bad_missing", Model.RDF_TYPE, T, false, ""),
    // BAD-multi: typed, two p values (maxCount)
    ("bad_multi", Model.RDF_TYPE, T, false, ""),
    ("bad_multi", "p", "x2", false, ""),
    ("bad_multi", "p", "x3", false, ""),
    // BAD-literal-q: q object is a literal (nodeKind IRI)
    ("bad_litq", "q", "oops", true, Model.XSD_STRING),
    // BAD-datatype: r carries a string literal
    ("bad_dt", "r", "nan", true, Model.XSD_STRING),
    // untyped node with zero p: NOT a minCount violation (no target)
    ("untyped", "q", "http://ex/ok2", false, ""))
    .toDF("subj", "pred", "obj", "objIsLiteral", "objDatatype")

  private val card = Seq(Shacl.CardShape("p_exactly1", T, "p", 1L, 1L))
  private val iri = Seq(Shacl.IriShape("q_iri", "q"))
  private val dt = Seq(Shacl.DatatypeShape("r_int", "r", Model.XSD_INTEGER))

  test("each constraint kind flags exactly its violating subjects") {
    val v = Shacl.violations(triples, card, iri, dt)
      .as[(String, String)].collect().toSet
    assert(v === Set(
      ("p_exactly1", "bad_missing"),
      ("p_exactly1", "bad_multi"),
      ("q_iri", "bad_litq"),
      ("r_int", "bad_dt")))
  }

  test("report: counts + order-independent fingerprint, zeros explicit") {
    val r = Shacl.report(triples,
        card :+ Shacl.CardShape("never_violated", T, "q", 0L, 99L),
        iri, dt)
      .as[(String, Long, Long)].collect()
    assert(r.map(_._1).toSeq ===
      Seq("never_violated", "p_exactly1", "q_iri", "r_int"))
    val byId = r.map(x => x._1 -> x).toMap
    assert(byId("never_violated") === ("never_violated", 0L, 0L))
    assert(byId("p_exactly1")._2 === 2L)
    // fingerprint is xor of the two violating subjects' hash60s
    val h = graft.ops.Dedup.hash60(org.apache.spark.sql.functions.col("s"))
    val expFp = Seq("bad_missing", "bad_multi").toDF("s").select(h)
      .as[Long].collect().reduce(_ ^ _)
    assert(byId("p_exactly1")._3 === expFp)
  }

  test("sh:class range shape flags objects lacking the type triple") {
    // good's q-object (http://ex/ok) is untyped → violation;
    // typedq's object (good) IS typed Thing → clean
    val withTyped = triples.union(Seq(
      ("typedq", "q2", "good", false, ""))
      .toDF("subj", "pred", "obj", "objIsLiteral", "objDatatype"))
    val v = Shacl.violations(withTyped, Nil, Nil, Nil,
      cls = Seq(Shacl.ClassShape("q_range_thing", "q", T),
        Shacl.ClassShape("q2_range_thing", "q2", T)))
      .as[(String, String)].collect().toSet
    assert(v === Set(
      ("q_range_thing", "good"),
      ("q_range_thing", "bad_litq"),
      ("q_range_thing", "untyped")))
  }

  test("maxCount-only shape ignores absent property (count 0 is legal)") {
    val r = Shacl.report(triples,
      Seq(Shacl.CardShape("p_max1", T, "p", maxCount = 1L)))
      .as[(String, Long, Long)].collect()
    assert(r.head._2 === 1L) // only bad_multi
  }
}
