package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.PercentEncode
import graft.kg.Model

class PercentEncodeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  val cases = Seq("Taxon 12", "a b/c:d?e#f", "Ĝ uni-ço∂e",
    "under_score.dot~tilde-dash", "quote'paren(x)", "plus+star*", "",
    "ORGANISM-Taxon 3", "100% sure")

  test("native expression equals Model.quote (python parity) in eval and codegen") {
    PercentEncode.register(spark)
    // spark.range source (not a LocalRelation) so the projection is not
    // constant-folded away — the expression must go through codegen
    val df = spark.range(cases.length)
      .select(element_at(typedLit(cases), col("id").cast("int") + 1).as("v"))
      .select(col("v"), PercentEncode(col("v")).as("e"))
    val got = df.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    cases.foreach(c => assert(got(c) == Model.quote(c), s"case '$c'"))
    // whole-stage codegen actually compiles the expression (no fallback)
    assert(df.queryExecution.executedPlan.toString.contains("*("))
  }

  test("SQL registration via functionRegistry and GraftExtensions builder") {
    PercentEncode.register(spark)
    val r = spark.sql("SELECT percent_encode('Taxon 12') AS e").head().getString(0)
    assert(r == "Taxon%2012")
  }

  test("null propagates (nullIntolerant)") {
    val r = Seq[(Integer, String)]((1, null)).toDF("i", "v")
      .select(PercentEncode(col("v"))).head()
    assert(r.isNullAt(0))
  }

  test("turtle_literal native expression: eval==codegen==scala impl, codegen'd") {
    import graft.functions.TurtleLiteral
    import graft.kg.Sources
    TurtleLiteral.register(spark)
    val lits = Seq(
      ("plain", Model.XSD_STRING),
      ("line\nbreak \"q\" \\ tab\t", Model.XSD_STRING),
      ("42", Model.XSD_INTEGER),
      ("12.5", Model.XSD_DOUBLE),
      ("no-dt", ""))
    val df = spark.range(lits.length)
      .select(
        element_at(typedLit(lits.map(_._1)), col("id").cast("int") + 1).as("v"),
        element_at(typedLit(lits.map(_._2)), col("id").cast("int") + 1).as("dt"))
      .select(col("v"), col("dt"), TurtleLiteral(col("v"), col("dt")).as("r"))
    val got = df.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getString(2)).toMap
    lits.foreach { case (v, dt) =>
      assert(got((v, dt)) == Sources.turtleLiteral(v, dt), s"case '$v'^^$dt")
    }
    assert(df.queryExecution.executedPlan.toString.contains("*("))
    assert(spark.sql("SELECT turtle_literal('a\"b', '') AS r").head().getString(0)
      == "\"a\\\"b\"")
  }
}
