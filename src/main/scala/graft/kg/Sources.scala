package graft.kg

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructType, StructField, StringType}

/** Sources & sinks matching the reference's I/O surface (SURVEY §2.1).
  *
  * All string-typed (dtype=str everywhere in the reference); gzip comes
  * free from the .gz extension (Hadoop codecs).
  */
object Sources {

  /** S1/S2 — verbatim GloBI TSV scan (matcher.py:138-150): tab
    * separator, QUOTE_NONE (quote disabled), backslash escape,
    * ISO-8859-1, header, every column string. Column pruning is
    * Catalyst's job — select() after read reaches the scan.
    */
  def readVerbatimTsv(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("sep", "\t")
      .option("header", "true")
      .option("quote", "")
      .option("escape", "\\")
      .option("encoding", "ISO-8859-1")
      .option("lineSep", "\n")
      .option("inferSchema", "false")
      .csv(path)

  /** S3 — comma CSV scan with an explicit all-string schema. */
  def readCsv(spark: SparkSession, path: String, columns: Seq[String]): DataFrame =
    spark.read
      .option("header", "true")
      .schema(StructType(columns.map(StructField(_, StringType, nullable = true))))
      .csv(path)

  /** S5 — filtered re-write (wikidata_fetcher.py:161-199): keep rows
    * whose rank is in the accepted set, write back compressed.
    */
  def filterByRank(df: DataFrame, rankCol: String, ranks: Seq[String],
      outPath: String): Unit =
    df.filter(col(rankCol).isin(ranks: _*))
      .write.mode("overwrite")
      .option("header", "true")
      .option("compression", "gzip")
      .csv(outPath)

  /** S7 — matched-taxa sinks (matcher.py:473-475, 406-409). */
  def writeCsvGz(df: DataFrame, outPath: String, sep: String = ","): Unit =
    df.write.mode("overwrite")
      .option("header", "true")
      .option("sep", sep)
      .option("compression", "gzip")
      .csv(outPath)

  /** S6 — Turtle sink: N-Triples-shaped Turtle (a valid Turtle subset,
    * matching what the reference's custom serializer emits modulo
    * prefix abbreviation — turtle_custom/serializer.py). Formatting is
    * a per-partition projection; output is gzip text, one file per
    * range partition ordered by (pred, subj) like the parquet layout.
    */
  def turtleLiteral(value: String, datatype: String): String = {
    val escaped = value.flatMap {
      case '\\' => "\\\\"
      case '"' => "\\\""
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c => c.toString
    }
    if (datatype == Model.XSD_STRING || datatype.isEmpty) s""""$escaped""""
    else s""""$escaped"^^<$datatype>"""
  }

  def writeTurtle(triples: DataFrame, outPath: String, partitions: Int = 8): Unit = {
    val line = concat(
      lit("<"), col("subj"), lit("> <"), col("pred"), lit("> "),
      when(col("objIsLiteral"),
        udfTurtleLit(col("obj"), col("objDatatype")))
        .otherwise(concat(lit("<"), col("obj"), lit(">"))),
      lit(" ."))
    triples
      .repartitionByRange(partitions, col("pred"), col("subj"))
      .sortWithinPartitions(col("pred"), col("subj"))
      .select(line.as("value"))
      .write.mode("overwrite")
      .option("compression", "gzip")
      .text(outPath)
  }

  // literal escaping needs per-char logic → one small scalar UDF on the
  // literal branch only (IRIs stay pure-Catalyst)
  private val udfTurtleLit =
    org.apache.spark.sql.functions.udf(turtleLiteral _)
}
