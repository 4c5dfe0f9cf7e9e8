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

  def wdFixture(rows: Seq[Seq[String]], slices: Int = 1) = {
    val schema = StructType(cols.map(StructField(_, StringType, nullable = true)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(Row.fromSeq), slices), schema)
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

  test("idMaps: column-major order survives >=128 input partitions") {
    // monotonically_increasing_id packs the partition id into bits >=33,
    // so partition 128+ of column 0 reaches 2^40 — a PACKED
    // colIdx*2^40+rowIdx ordinal would let a late-partition column-0 key
    // outrank column 1. The (colIdx, rowIdx) struct ordering must not.
    // Key collision: the raw-WdID cell of the LAST row (partition ~199)
    // vs the eol column of the FIRST row — eol melts later, so
    // "RightWinner" must win regardless of partition id.
    val rows =
      (Seq[String]("http://www.wikidata.org/entity/Q5", "99") ++
        Seq.fill(14)(null) :+ "RightWinner") +:
      (1 until 199).map(i =>
        Seq[String](s"http://www.wikidata.org/entity/Q${1000 + i}") ++
          Seq.fill(15)(null) :+ s"Filler$i") :+
      (Seq[String]("EOL:99") ++ Seq.fill(15)(null) :+ "WrongWinner")
    val (idMap, _) = Link.idMaps(Link.prepWdSparql(wdFixture(rows, slices = 200)))
    val nm = idMap.filter($"key" === "EOL:99").select("value").head().getString(0)
    assert(nm == "RightWinner", s"column-major order corrupted: got $nm")
    // and the whole dict equals the single-partition build
    val (one, _) = Link.idMaps(Link.prepWdSparql(wdFixture(rows, slices = 1)))
    assert(idMap.collect().map(r => (r.getString(0), r.getString(1))).toSet ==
      one.collect().map(r => (r.getString(0), r.getString(1))).toSet)
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
