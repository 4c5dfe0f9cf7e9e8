package graft.kg

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
  def turtleLiteral(value: String, datatype: String): String =
    graft.functions.TurtleLiterals.render(
      org.apache.spark.unsafe.types.UTF8String.fromString(value),
      org.apache.spark.unsafe.types.UTF8String.fromString(
        Option(datatype).getOrElse(""))).toString

  /** Literal rendering as a native Catalyst expression (codegen'd —
    * replaces the former scalar UDF, the engine's last).
    */
  private def turtleLit(spark: SparkSession, value: org.apache.spark.sql.Column,
      datatype: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    graft.functions.TurtleLiteral.register(spark)
    graft.functions.TurtleLiteral(value, datatype)
  }

  def writeTurtle(triples: DataFrame, outPath: String, partitions: Int = 8): Unit = {
    val line = concat(
      lit("<"), col("subj"), lit("> <"), col("pred"), lit("> "),
      when(col("objIsLiteral"),
        turtleLit(triples.sparkSession, col("obj"), col("objDatatype")))
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

  // ---- S6b — prefix-abbreviated Turtle + round-trip parser --------------

  /** Prefix table matching the reference's header + binds
    * (globi_kg_generator.py:155-165,174-181, trydb_kg_generator.py:77-87)
    * plus the OBO namespaces (which rdflib would auto-prefix); ordered
    * longest-namespace-first for longest-match abbreviation. The two
    * qudt namespaces (http:// schema vs the trydb generator's https://)
    * get distinct prefixes here — a documented deviation from the
    * reference, which binds both to "qudt" in different files.
    */
  val turtlePrefixes: Seq[(String, String)] = (Seq(
    "" -> Model.EMIBOX,
    "emi" -> Model.EMI,
    "emiUnit" -> Model.EMIUNIT,
    "sosa" -> Model.SOSA,
    "dcterms" -> Model.DCTERMS,
    "wd" -> Model.WD,
    "rdf" -> Model.RDF,
    "rdfs" -> Model.RDFS,
    "xsd" -> Model.XSD,
    "prov" -> Model.PROV,
    "wgs84" -> Model.WGS84,
    "qudt" -> Model.QUDT,
    "qudts" -> Model.QUDT_TRY) ++
    Model.prefixToNamespace.toSeq.map { case (p, ns) =>
      p.stripSuffix(":").toLowerCase -> ns
    }).distinct.sortBy(-_._2.length)

  /** Conservative PN_LOCAL subset: abbreviate only locals made of
    * [A-Za-z0-9_-] and %XX escapes (no dots — a trailing dot is illegal
    * and mid-dot rules are fiddly); anything else stays a full <IRI>.
    */
  private val pnLocalRe = "[A-Za-z0-9_](?:[A-Za-z0-9_\\-]|%[0-9A-Fa-f]{2})*"

  private def abbrevIri(c: Column): Column =
    turtlePrefixes.foldRight(concat(lit("<"), c, lit(">"))) {
      case ((p, ns), acc) =>
        val local = c.substr(lit(ns.length + 1), length(c))
        when(c.startsWith(ns) && local.rlike(s"^$pnLocalRe$$"),
          concat(lit(p + ":"), local)).otherwise(acc)
    }

  def turtleHeader(prefixes: Seq[(String, String)] = turtlePrefixes): String =
    prefixes.sortBy(_._1).map { case (p, ns) => s"@prefix $p: <$ns> ." }
      .mkString("", "\n", "\n")

  /** Prefix-abbreviated Turtle sink (parity target:
    * turtle_custom/serializer.py + the generators' manual headers):
    * subject-grouped blocks with `;` predicate lists, 4-space indent,
    * rdf:type as `a`, one blank line between blocks, @prefix header at
    * the top of every part file (each part is standalone valid Turtle —
    * re-declared prefixes are legal). Predicate order within a block
    * follows rdflib's convention (rdf:type first, then lexicographic),
    * and numeric literals use rdflib's bare shorthand when the lexical
    * form makes the datatype recoverable (xsd:integer with an INTEGER
    * lexical, xsd:double with an exponent lexical — Turtle's own
    * datatype inference rules), else the explicit "lex"^^xsd:… form.
    * Round-trip triple-set equality is the contract (SourcesSpec).
    *
    * Plan shape: range-partition + sort by subject, one groupBy(subj)
    * into sorted (pred, obj) arrays — the only shuffle; block rendering
    * is pure Catalyst string work.
    */
  def writeTurtlePrefixed(triples: DataFrame, outPath: String,
      partitions: Int = 8): Unit = {
    val spark = triples.sparkSession
    import spark.implicits._
    // bare numeric shorthand — only where Turtle's numeric grammar maps
    // the token back to exactly this datatype (INTEGER ⇒ xsd:integer,
    // DOUBLE-with-exponent ⇒ xsd:double), so the round trip is lossless
    val bareInt = col("objDatatype") === Model.XSD_INTEGER &&
      col("obj").rlike("^[+-]?[0-9]+$")
    val bareDouble = col("objDatatype") === Model.XSD_DOUBLE &&
      col("obj").rlike("^[+-]?([0-9]+(\\.[0-9]*)?|\\.[0-9]+)[eE][+-]?[0-9]+$")
    val objCol = when(col("objIsLiteral"),
      when(bareInt || bareDouble, col("obj"))
        .otherwise(turtleLit(spark, col("obj"), col("objDatatype"))))
      .otherwise(abbrevIri(col("obj")))
    val predCol = when(col("pred") === Model.RDF_TYPE, lit("a"))
      .otherwise(abbrevIri(col("pred")))
    // predicate order within a block: rdf:type ('a') first, then
    // lexicographic — rdflib's predicateOrder puts rdf:type first; the
    // rank field makes sort_array reproduce that
    val blocks = triples
      .select(abbrevIri(col("subj")).as("s"), predCol.as("p"), objCol.as("o"))
      // one corpus-scale hash shuffle for the subject grouping, then a
      // block-scale range repartition for the sorted file layout
      .groupBy(col("s"))
      .agg(sort_array(collect_list(struct(
        when(col("p") === "a", 0).otherwise(1).as("rank"),
        col("p"), col("o")))).as("po"))
      .repartitionByRange(partitions, col("s"))
      .select(concat(
        col("s"), lit(" "),
        concat_ws(" ;\n    ",
          transform(col("po"), x => concat(x.getField("p"), lit(" "),
            x.getField("o")))),
        lit(" .\n")).as("value"))
      .sortWithinPartitions(col("value"))
    val header = turtleHeader()
    blocks.as[String]
      .mapPartitions(it => Iterator(header) ++ it)
      .toDF("value")
      .write.mode("overwrite")
      .option("compression", "gzip")
      .text(outPath)
  }

  private def unescapeTurtle(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'n' => sb += '\n'; case 'r' => sb += '\r'; case 't' => sb += '\t'
          case '"' => sb += '"'; case '\\' => sb += '\\'
          case other => sb += other
        }
        i += 2
      } else { sb += c; i += 1 }
    }
    sb.toString
  }

  /** Round-trip Turtle reader for the subset writeTurtlePrefixed emits:
    * blocks are newline-newline separated (so `lineSep="\n\n"` makes one
    * row per block — distributed, no whole-file parse), @prefix blocks
    * build the expansion map, subject blocks split on the fixed
    * ` ;\n    ` separator (literals cannot contain a raw newline — the
    * writer escapes them).
    */
  def readTurtle(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val raw = spark.read.option("lineSep", "\n\n").text(path)
      .as[String].map(_.trim).filter(_.nonEmpty)
    val prefixLine = "@prefix\\s+([A-Za-z0-9]*):\\s+<([^>]*)>\\s*\\.".r
    val prefixMap = raw.filter(_.startsWith("@prefix"))
      .flatMap(_.split("\n").toSeq)
      .collect()
      .flatMap(l => prefixLine.findFirstMatchIn(l).map(m => m.group(1) -> m.group(2)))
      .toMap
    val bc = spark.sparkContext.broadcast(prefixMap)
    def expand(tok: String): String =
      if (tok.startsWith("<")) tok.substring(1, tok.length - 1)
      else if (tok == "a") Model.RDF_TYPE
      else {
        val idx = tok.indexOf(':')
        bc.value.getOrElse(tok.substring(0, idx), tok.substring(0, idx) + ":") +
          tok.substring(idx + 1)
      }
    raw.filter(b => !b.startsWith("@prefix"))
      .flatMap { block =>
        val body = block.stripSuffix(".").stripSuffix(" .").trim
          .stripSuffix(" .") // blocks end " .\n"; trim handles the \n
        val firstSpace = body.indexOf(' ')
        val subj = expand(body.substring(0, firstSpace))
        body.substring(firstSpace + 1).stripSuffix(" .").split(" ;\n    ", -1)
          .toSeq.map { po =>
            val sp = po.indexOf(' ')
            val pred = expand(po.substring(0, sp))
            val o = po.substring(sp + 1).trim.stripSuffix(" .").stripSuffix(".").trim
            if (o.startsWith("\"")) {
              // find closing quote respecting escapes
              var j = 1; var close = -1
              while (close < 0 && j < o.length) {
                if (o.charAt(j) == '\\') j += 2
                else if (o.charAt(j) == '"') close = j
                else j += 1
              }
              val lex = unescapeTurtle(o.substring(1, close))
              val rest = o.substring(close + 1)
              val dt =
                if (rest.startsWith("^^")) expand(rest.substring(2).trim)
                else Model.XSD_STRING
              (subj, pred, lex, true, dt)
            } else if (o.matches("[+-]?[0-9]+"))
              (subj, pred, o, true, Model.XSD_INTEGER) // Turtle INTEGER
            else if (o.matches("[+-]?([0-9]+(\\.[0-9]*)?|\\.[0-9]+)[eE][+-]?[0-9]+"))
              (subj, pred, o, true, Model.XSD_DOUBLE) // Turtle DOUBLE
            else (subj, pred, expand(o), false, "")
          }
      }
      .toDF("subj", "pred", "obj", "objIsLiteral", "objDatatype")
  }
}
