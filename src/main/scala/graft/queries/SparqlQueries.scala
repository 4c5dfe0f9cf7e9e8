package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.kg._
import graft.ops.Bucketing

/** The reference's SERVING workload: the three SPARQL metric queries it
  * runs against the published graph (metrics/query_globi_records.txt,
  * metrics/query_globi_wikidata_ids.txt, metrics/query_trydb_metrics.txt)
  * re-expressed as multiway self-joins over the materialized triple
  * table.
  *
  * Plan shape: the triple tables are written BUCKETED BY subj (16
  * buckets, sorted) once per (session, scale) in [[Materialized]]; every
  * triple pattern is a pred-filtered scan of that table, so all
  * same-subject pattern joins (the star patterns ?intxn p1/p2/p3,
  * ?source p4/p5 …) are exchange-free sort-merge joins, and only the
  * cross-variable hops (pattern.obj = pattern.subj) shuffle the
  * dimension-sized binding sets. That is the plan a 100 TB triple store
  * wants: the corpus-scale table never re-shuffles, repeated self-joins
  * reuse the write-time clustering.
  *
  * The DuckDB oracles run the same relational formulation over the same
  * triple parquet (the side-channel written by Materialized), so the
  * driver hash-verifies the join semantics end to end.
  */
object SparqlQueries {

  import Materialized.{globiTable, trydbTable, EMI, RDFS_LABEL, RDF_TYPE,
    SOSA, RDF}

  /** One triple pattern: pred-filtered scan with (subj, obj) renamed to
    * the SPARQL variable names.
    */
  private def pat(t: DataFrame, pred: String, s: String, o: String): DataFrame =
    t.filter(col("pred") === pred)
      .select(col("subj").as(s), col("obj").as(o))

  /** query_globi_records.txt:3-12 — 7-pattern join through
    * ?intxn/?source/?target, COUNT(*).
    */
  def globiRecords(spark: SparkSession, dir: String): DataFrame = {
    val t = spark.table(globiTable(spark, dir))
    val intxn = pat(t, EMI + "hasSource", "intxn", "source")
      .join(pat(t, EMI + "hasTarget", "intxn", "target"), Seq("intxn"))
      .join(pat(t, EMI + "isClassifiedWith", "intxn", "itype"), Seq("intxn"))
    val withType = intxn.join(pat(t, RDFS_LABEL, "itype", "intxnLabel"), Seq("itype"))
    val src = pat(t, EMI + "inTaxon", "source", "wdxSource")
      .join(pat(t, RDFS_LABEL, "source", "sourceName"), Seq("source"))
    val tgt = pat(t, EMI + "inTaxon", "target", "wdxTarget")
      .join(pat(t, RDFS_LABEL, "target", "targetName"), Seq("target"))
    withType.join(src, Seq("source")).join(tgt, Seq("target"))
      .agg(count(lit(1)).as("rowCount"))
  }

  /** query_globi_wikidata_ids.txt:3-17 — same pattern block + a UNION
    * merging source/target taxa into one variable, COUNT(DISTINCT ?wdx).
    */
  def globiWikidataIds(spark: SparkSession, dir: String): DataFrame = {
    val t = spark.table(globiTable(spark, dir))
    val intxn = pat(t, EMI + "hasSource", "intxn", "source")
      .join(pat(t, EMI + "hasTarget", "intxn", "target"), Seq("intxn"))
      .join(pat(t, EMI + "isClassifiedWith", "intxn", "itype"), Seq("intxn"))
      .join(pat(t, RDFS_LABEL, "itype", "intxnLabel"), Seq("itype"))
      .join(pat(t, EMI + "inTaxon", "source", "wdxSource")
        .join(pat(t, RDFS_LABEL, "source", "sourceName"), Seq("source")), Seq("source"))
      .join(pat(t, EMI + "inTaxon", "target", "wdxTarget")
        .join(pat(t, RDFS_LABEL, "target", "targetName"), Seq("target")), Seq("target"))
    val inTaxon = pat(t, EMI + "inTaxon", "s", "wdx")
    // SPARQL's UNION of the source-side and target-side bindings, as ONE
    // pass over the star join: explode each interaction row into its two
    // taxon ends, then probe inTaxon once. The naive per-arm formulation
    // referenced `intxn` twice and executed the whole 7-pattern join
    // subtree once per arm — at corpus scale that doubles the most
    // expensive serving join.
    val ends = intxn.select(explode(array(col("source"), col("target"))).as("s"))
    ends.join(inTaxon, Seq("s"))
      .agg(countDistinct(col("wdx")).as("totalDistinctTaxa"))
  }

  /** query_trydb_metrics.txt:6-22 — chain join + two OPTIONAL type
    * patterns (left joins) + three conditional COUNT DISTINCTs.
    */
  def trydbMetrics(spark: SparkSession, dir: String): DataFrame = {
    val t = spark.table(trydbTable(spark, dir))
    val chain = pat(t, EMI + "inTaxon", "trySpName", "wdx")
      .join(pat(t, SOSA + "isSampleOf", "trySpObs", "trySpName"), Seq("trySpName"))
      .join(pat(t, SOSA + "isFeatureOfInterestOf", "trySpObs", "tryObId"),
        Seq("trySpObs"))
      .join(pat(t, SOSA + "hasResult", "tryObId", "tryData"), Seq("tryObId"))
      .join(pat(t, RDFS_LABEL, "tryData", "tryDataLab"), Seq("tryData"))
      .join(pat(t, RDF + "value", "tryData", "tryDataVal"), Seq("tryData"))
    val isTrait = t.filter(col("pred") === RDF_TYPE && col("obj") === EMI + "Trait")
      .select(col("subj").as("tryData"), col("subj").as("traitData"))
    val isNonTrait = t.filter(col("pred") === RDF_TYPE && col("obj") === EMI + "NonTrait")
      .select(col("subj").as("tryData"), col("subj").as("nonTraitData"))
    chain
      .join(isTrait, Seq("tryData"), "left")
      .join(isNonTrait, Seq("tryData"), "left")
      .agg(
        countDistinct(col("trySpName")).as("speciesCount"),
        countDistinct(col("traitData")).as("traitCount"),
        countDistinct(col("nonTraitData")).as("nonTraitCount"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "kg_sparql_records" -> ((s: SparkSession, dir: String) => globiRecords(s, dir)),
    "kg_sparql_wdids" -> ((s: SparkSession, dir: String) => globiWikidataIds(s, dir)),
    "kg_sparql_trydb_metrics" -> ((s: SparkSession, dir: String) => trydbMetrics(s, dir)))

  // ---- DuckDB oracles over the same side-channel triple parquet --------

  /** n_docs-filtered view of a side-channel triple dump (written by
    * Materialized for exactly this run's scale; n_docs = |orders|/3 is
    * the datagen contract).
    */
  private def side(nameGlob: String): String =
    s"""(SELECT subj, pred, obj FROM '${Materialized.SideDir}/$nameGlob/*.parquet'
        WHERE n_docs = (SELECT COUNT(*) // 3 FROM orders))"""

  private val globiPatterns =
    s"""hs AS (SELECT subj AS intxn, obj AS source FROM g WHERE pred = '${EMI}hasSource'),
        ht AS (SELECT subj AS intxn, obj AS target FROM g WHERE pred = '${EMI}hasTarget'),
        cw AS (SELECT subj AS intxn, obj AS itype FROM g WHERE pred = '${EMI}isClassifiedWith'),
        lbl AS (SELECT subj, obj FROM g WHERE pred = '$RDFS_LABEL'),
        tax AS (SELECT subj, obj AS wdx FROM g WHERE pred = '${EMI}inTaxon'),
        bound AS (
          SELECT hs.intxn, hs.source, ht.target, cw.itype
          FROM hs JOIN ht ON ht.intxn = hs.intxn
                 JOIN cw ON cw.intxn = hs.intxn
                 JOIN lbl tl ON tl.subj = cw.itype
                 JOIN tax ts ON ts.subj = hs.source
                 JOIN lbl sl ON sl.subj = hs.source
                 JOIN tax tt ON tt.subj = ht.target
                 JOIN lbl gl ON gl.subj = ht.target)"""

  val oracle: Map[String, String] = Map(
    "kg_sparql_records" ->
      s"""WITH g AS (SELECT * FROM ${side("globi_triples_n*")}),
          $globiPatterns
          SELECT COUNT(*) AS rowCount FROM bound""",

    "kg_sparql_wdids" ->
      s"""WITH g AS (SELECT * FROM ${side("globi_triples_n*")}),
          $globiPatterns
          SELECT COUNT(DISTINCT wdx) AS totalDistinctTaxa FROM (
            SELECT t.wdx FROM bound b JOIN tax t ON t.subj = b.source
            UNION ALL
            SELECT t.wdx FROM bound b JOIN tax t ON t.subj = b.target)""",

    "kg_sparql_trydb_metrics" ->
      s"""WITH g AS (SELECT * FROM ${side("trydb_triples_n*")}),
          tax AS (SELECT subj AS trySpName, obj AS wdx FROM g WHERE pred = '${EMI}inTaxon'),
          iso AS (SELECT subj AS trySpObs, obj AS trySpName FROM g WHERE pred = '${SOSA}isSampleOf'),
          ifo AS (SELECT subj AS trySpObs, obj AS tryObId FROM g WHERE pred = '${SOSA}isFeatureOfInterestOf'),
          hr  AS (SELECT subj AS tryObId, obj AS tryData FROM g WHERE pred = '${SOSA}hasResult'),
          lbl AS (SELECT subj AS tryData, obj AS lab FROM g WHERE pred = '$RDFS_LABEL'),
          val AS (SELECT subj AS tryData, obj AS v FROM g WHERE pred = '${RDF}value'),
          tt  AS (SELECT subj AS tryData, subj AS traitData FROM g
                  WHERE pred = '$RDF_TYPE' AND obj = '${EMI}Trait'),
          nt  AS (SELECT subj AS tryData, subj AS nonTraitData FROM g
                  WHERE pred = '$RDF_TYPE' AND obj = '${EMI}NonTrait'),
          bound AS (
            SELECT tax.trySpName, hr.tryData
            FROM tax JOIN iso ON iso.trySpName = tax.trySpName
                     JOIN ifo ON ifo.trySpObs = iso.trySpObs
                     JOIN hr  ON hr.tryObId = ifo.tryObId
                     JOIN lbl ON lbl.tryData = hr.tryData
                     JOIN val ON val.tryData = hr.tryData)
          SELECT COUNT(DISTINCT b.trySpName) AS speciesCount,
                 COUNT(DISTINCT tt.traitData) AS traitCount,
                 COUNT(DISTINCT nt.nonTraitData) AS nonTraitCount
          FROM bound b
          LEFT JOIN tt ON tt.tryData = b.tryData
          LEFT JOIN nt ON nt.tryData = b.tryData""")
}
