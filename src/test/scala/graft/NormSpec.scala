package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.kg.Model
import graft.kg.Materialize

/** Leaf-function parity pinned against recorded outputs of the Python
  * reference (urllib.parse.quote, utils.preprocess_term,
  * globi_entity_matcher count_biological_sex — goldens generated from
  * the reference's exact regex chains).
  */
class NormSpec extends AnyFunSuite {

  test("Model.quote matches python urllib.parse.quote(s, safe='')") {
    val golden = Seq(
      "Taxon 12" -> "Taxon%2012",
      "a b/c:d?e#f" -> "a%20b%2Fc%3Ad%3Fe%23f",
      "Ĝ uni-ço∂e" -> "%C4%9C%20uni-%C3%A7o%E2%88%82e",
      "under_score.dot~tilde-dash" -> "under_score.dot~tilde-dash",
      "quote'paren(x)" -> "quote%27paren%28x%29",
      "plus+star*" -> "plus%2Bstar%2A",
      "" -> "")
    golden.foreach { case (in, out) => assert(Model.quote(in) == out, s"quote($in)") }
  }

  test("preprocessTerm matches utils.preprocess_term") {
    val golden = Seq(
      "Leaves " -> "leave", "monocots" -> "monocots", "autos" -> "autos",
      "GRASS" -> "gras", "s" -> "", "" -> "", "stems" -> "stem")
    golden.foreach { case (in, out) =>
      assert(Model.preprocessTerm(in) == out, s"preprocess($in)")
    }
  }

  test("countBiologicalSex matches the reference parse") {
    val sexMap = Map(
      "male" -> "PATO_0000384", "female" -> "PATO_0000383",
      "hermaphrodite" -> "PATO_0001340", "unknown" -> "PATO_0001827")
    val golden: Seq[(String, Map[String, Int])] = Seq(
      "male" -> Map("PATO_0000384" -> 1),
      "female" -> Map("PATO_0000383" -> 1),
      "2 females and 1 male" -> Map("PATO_0000384" -> 1, "PATO_0000383" -> 2),
      "3 males, 2 females" -> Map("PATO_0000384" -> 3, "PATO_0000383" -> 2),
      "maybe female" -> Map("PATO_0000383" -> 1),
      "unknown" -> Map("PATO_0001827" -> 1),
      "hermaphrodites" -> Map("PATO_0001340" -> 1),
      "m&f" -> Map("PATO_0001827" -> 2),
      "" -> Map("PATO_0001827" -> 1),
      "female 3 male" -> Map("PATO_0000383" -> 3),
      "ADULTS; 2 Males" -> Map("PATO_0000384" -> 2, "PATO_0001827" -> 1),
      "(unknown)" -> Map("PATO_0001827" -> 1),
      // reversed number-word arm
      "females 2" -> Map("PATO_0000383" -> 2),
      // both F6 arms in one string
      "1 male and females 2" -> Map("PATO_0000384" -> 1, "PATO_0000383" -> 2),
      // multi-`or` conjunction: or-words removed, no sub-term split, the
      // joined residue matches nothing → unknown
      "male or female or unknown" -> Map("PATO_0001827" -> 1))
    golden.foreach { case (in, out) =>
      assert(Materialize.countBiologicalSex(in, sexMap).toMap == out, s"sex($in)")
    }
  }

  test("lookupTerm strips tortere/juvenil prefixes before the retry") {
    val v = Materialize.termVocab()
    val wing = Materialize.lookupTerm("tortere wing", "s:1", "p:1", "T", v)
    assert(wing.exists(t => t.pred == "p:1" &&
      t.obj == "http://purl.obolibrary.org/obo/UBERON_0000023"), wing.toString)
    val pupa = Materialize.lookupTerm("juvenil pupa", "s:1", "p:1", "T", v)
    assert(pupa.exists(t => t.pred == "p:1" &&
      t.obj == "http://purl.obolibrary.org/obo/UBERON_0000070"), pupa.toString)
  }

  test("widened-null predicate matches utils.is_none_na_or_empty") {
    assert(!Model.isPresent(null))
    assert(!Model.isPresent(""))
    assert(!Model.isPresent("\\N"))
    assert(!Model.isPresent("no:match"))
    assert(!Model.isPresent("ĜLOBI:123"))
    assert(Model.isPresent("GLOBI:123")) // only the mojibake form is null-like
    assert(Model.isPresent("x"))
  }
}
