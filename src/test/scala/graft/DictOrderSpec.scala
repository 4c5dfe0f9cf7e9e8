package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import org.apache.spark.sql.types.{StructField, StructType, StringType}
import graft.kg.{Link, Trydb}

/** Dictionary key-collision order semantics: pandas dict build is
  * last-occurrence-wins in COLUMN-MAJOR melt order (matcher.py:117-130)
  * and FILE order for the lineage dict (matcher.py:344-352). These
  * fixtures are built so lexicographic value order CONTRADICTS build
  * order (mixed-length Q-ids), which the deterministic corpus never
  * exercises.
  */
class DictOrderSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  val cols = Seq("WdID", "eol", "gbif", "ncbi", "ott", "itis", "irmng",
    "col", "nbn", "worms", "bold", "plazi", "apni", "msw3", "iNat",
    "eppo", "WdName")

  def wdFixture(rows: Seq[Seq[String]]) = {
    val schema = StructType(cols.map(StructField(_, StringType, nullable = true)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(Row.fromSeq), 1), schema)
  }

  test("idMaps: later ROW wins within a column (mixed-length Q-ids)") {
    def row(wdid: String, eol: String, name: String): Seq[String] =
      Seq(wdid, eol) ++ Seq.fill(14)(null) :+ name
    // both rows share eol id 77; row order says Q123 wins, lexicographic
    // value order would say Q7
    val prepped = Link.prepWdSparql(wdFixture(Seq(
      row("http://www.wikidata.org/entity/Q7", "77", "Zebra"),
      row("http://www.wikidata.org/entity/Q123", "77", "Ant"))))
    val (idMap, idMapWd) = Link.idMaps(prepped)
    val wd = idMapWd.filter($"key" === "EOL:77").select("value").head().getString(0)
    assert(wd == "Wikidata:Q123", s"expected last-row Q123, got $wd")
    val nm = idMap.filter($"key" === "EOL:77").select("value").head().getString(0)
    assert(nm == "Ant")
  }

  test("idMaps: later COLUMN wins across columns (column-major melt)") {
    // row0's raw WdID string collides with row1's prefixed eol id: the
    // eol column melts after the WdID column, so row1's name wins even
    // though row0 comes first in file order
    val prepped = Link.prepWdSparql(wdFixture(Seq(
      Seq[String]("EOL:99") ++ Seq.fill(15)(null) :+ "First",
      (Seq("http://www.wikidata.org/entity/Q5", "99") ++
        Seq.fill(14)(null)) :+ "Second")))
    val (idMap, _) = Link.idMaps(prepped)
    val nm = idMap.filter($"key" === "EOL:99").select("value").head().getString(0)
    assert(nm == "Second", s"expected later-column 'Second', got $nm")
  }

  test("matchSpecies: later lineage FILE row wins (not lexicographic WdID)") {
    val lineage = Seq(
      ("http://www.wikidata.org/entity/Q7", "Shared name", "Plantae"),
      ("http://www.wikidata.org/entity/Q123", "Shared name", "Plantae"))
      .toDF("WdID", "WdName", "kingdom")
    val out = Trydb.matchSpecies(
      Seq("Shared name").toDF("TRY_AccSpeciesName"), lineage)
      .select("WdID").head().getString(0)
    assert(out == "Q123", s"expected file-order-last Q123, got $out")
  }
}
