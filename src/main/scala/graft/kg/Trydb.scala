package graft.kg

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Model._

/** TRY-db branch: species matching (matcher.py:339-412) + trait-triple
  * generation (trydb_kg_generator.py) — fully relational, pure Catalyst.
  *
  * Unlike the GloBI branch there is no per-row minted index: every IRI
  * is content-derived, so emission is an array-of-conditional-triples
  * projection + explode — whole-stage codegen end to end, no typed
  * flatMap needed.
  */
object Trydb {

  // ---- fixtures (datagen) -------------------------------------------------

  val qudtUnitMap: Seq[(String, String)] =
    Seq("g" -> "GM", "gram" -> "GM", "m2" -> "M2")
  val emiUnitMap: Seq[(String, String)] = Seq(
    "kg" -> "https://w3id.org/emi/unit#KG",
    "metre" -> "https://w3id.org/emi/unit#M")

  val traitNames = Seq("Leaf area", "Plant height", "", "Seed mass", "")
  val origValues = Seq("12.5", "3.0E+4", "-7", "tall", "", "0.25")
  val origUnits = Seq("g", "m2", "weird", "", "kg", "g")
  val unitNames = Seq("gram", "metre", "", "gram", "", "")

  case class TrydbRow(
      AccSpeciesName: String, AccSpeciesID: String, ObservationID: String,
      ObsDataID: String, Dataset: String, DatasetID: String, Reference: String,
      TraitName: String, TraitID: String, DataName: String, DataID: String,
      OrigValueStr: String, OrigUnitStr: String, UnitName: String)

  def trydbRow(t: Long): TrydbRow = {
    def pick[T](s: Seq[T], j: Long): T = s((j % s.size).toInt)
    val name =
      if (t % 6 == 5) s"Unknown plant ${t % 9}"
      else DataGen.taxonName(((t * 31) % DataGen.K).toInt)
    TrydbRow(
      AccSpeciesName = name,
      AccSpeciesID = s"${1000 + t % 500}",
      ObservationID = s"OBS${t % 200}",
      ObsDataID = s"$t",
      Dataset = s"Dataset ${t % 7}",
      DatasetID = s"${t % 7}",
      Reference = s"Ref ${t % 13}",
      TraitName = pick(traitNames, t),
      TraitID = if (t % 4 == 0) s"T${t % 50}" else "",
      DataName = if (t % 3 == 0) s"Data ${t % 40}" else "",
      DataID = if (t % 5 == 0) s"D${t % 60}" else "",
      OrigValueStr = pick(origValues, t),
      OrigUnitStr = pick(origUnits, t),
      UnitName = pick(unitNames, t + 1))
  }

  def trydbData(spark: SparkSession, n: Long, partitions: Int = 32): DataFrame = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).map(trydbRow(_)).toDF()
  }

  /** TRY-db lineage view (matcher.py:344-352): kingdom "" → null, third
    * kingdom bucket empty to exercise the (name, null) fallback.
    */
  def trydbLineage(spark: SparkSession): DataFrame = {
    import spark.implicits._
    (0 until DataGen.K).map { k =>
      val kd = k % 3 match { case 0 => "Plantae"; case 1 => "Animalia"; case _ => null }
      (s"http://www.wikidata.org/entity/${DataGen.qid(k)}", DataGen.taxonName(k), kd)
    }.toDF("WdID", "WdName", "kingdom")
  }

  // ---- species matcher (matcher.py:339-379) ------------------------------

  /** (WdName, kingdom) → WdID with Plantae-then-null priority; WdID
    * stripped to the bare Q-id; later lineage rows win on key collision
    * (pandas dict build order = FILE order, matcher.py:344-352) —
    * reproduced with an explicit row ordinal from
    * monotonically_increasing_id (order-faithful for single-file
    * dimension reads; partition id in the high bits keeps multi-split
    * reads file-major), NOT lexicographic WdID (false for mixed-length
    * Q-ids). Unlike Link.idMaps there is NO column-index packing here,
    * so the raw id is safe at any partition count — it stays monotone
    * in (partitionId, offset) however many partitions the read splits
    * into.
    */
  def matchSpecies(speciesNames: DataFrame, lineage: DataFrame): DataFrame = {
    val l = lineage
      .withColumn("_ord", monotonically_increasing_id())
      .select(
        regexp_replace(col("WdID"), "http://www\\.wikidata\\.org/entity/", "").as("wd"),
        col("WdName"),
        when(col("kingdom") === "", lit(null)).otherwise(col("kingdom")).as("kingdom"),
        col("_ord"))
    def dictFor(kingdomFilter: Column, keyName: String): DataFrame =
      l.filter(kingdomFilter)
        .groupBy(col("WdName").as(keyName))
        .agg(max_by(col("wd"), col("_ord")).as(s"${keyName}_wd"))
    val plantae = dictFor(col("kingdom") === "Plantae", "k_pl")
    val nullK = dictFor(col("kingdom").isNull, "k_null")
    val anyName = l.select(col("WdName").as("k_any")).distinct()
    speciesNames
      .join(broadcast(anyName), col("TRY_AccSpeciesName") === col("k_any"), "left")
      .join(broadcast(plantae), col("TRY_AccSpeciesName") === col("k_pl"), "left")
      .join(broadcast(nullK), col("TRY_AccSpeciesName") === col("k_null"), "left")
      .select(
        col("TRY_AccSpeciesName"),
        when(col("k_any").isNotNull, coalesce(col("k_pl_wd"), col("k_null_wd")))
          .as("WdID"),
        when(col("k_any").isNotNull, lit("ID-MATCHED-BY-NAME-direct"))
          .otherwise(lit("NAME-NOT-MATCHED")).as("Match_Status"),
        when(col("k_any").isNotNull,
          when(col("k_pl_wd").isNotNull, lit("Plantae")).otherwise(lit("None")))
          .as("kingdom"))
  }

  // ---- triple emission (trydb_kg_generator.py:89-176) --------------------

  private def present(c: Column): Column = graft.normalize.Norm.isPresent(c)

  /** Pure-Catalyst emission: per row an array of conditional triple
    * structs (null when the guard fails), exploded and null-filtered.
    * The unit cascade reproduces the reference's asymmetric elif chain
    * (trydb_kg_generator.py:149-166) exactly.
    */
  def triples(merged: DataFrame, qudtMap: Map[String, String],
      emiMap: Map[String, String]): DataFrame = {
    val q = graft.normalize.Norm.formatUri _
    def tr(guard: Column, s: Column, p: String, o: Column, isLit: Boolean,
        dt: String): Column =
      when(guard, struct(s.as("subj"), lit(p).as("pred"), o.as("obj"),
        lit(isLit).as("objIsLiteral"), lit(dt).as("objDatatype")))

    val sample = concat(lit(EMIBOX + "SAMPLE-"), q(col("AccSpeciesName")),
      lit("-"), col("ObservationID"))
    val dataset = concat(lit(EMIBOX + "DATASET-"), q(col("Dataset")))
    val observation = concat(lit(EMIBOX + "OBSERVATION-"), q(col("ObservationID")))
    val organism = concat(lit(EMIBOX + "ORGANISM-"), q(col("AccSpeciesName")))
    val result = concat(lit(EMIBOX + "RESULT-"), col("ObsDataID"))
    val hasDataset = present(col("Dataset"))
    val hasResult = hasDataset // result minted iff Dataset present (:108)
    val traitP = present(col("TraitName"))
    val numeric = graft.normalize.Norm.isNumericLiteral(col("OrigValueStr"))

    // unit cascade (:149-166)
    val qudtLit = typedLit(qudtMap)
    val emiLit = typedLit(emiMap)
    val unitStr = col("OrigUnitStr"); val unitName = col("UnitName")
    val unitUri =
      when(element_at(qudtLit, unitStr).isNotNull,
        concat(lit(QUDT_UNIT), element_at(qudtLit, unitStr)))
        .when(present(unitName) && element_at(qudtLit, unitName).isNotNull,
          concat(lit(QUDT_UNIT), element_at(qudtLit, unitName)))
        .when(present(unitName) && element_at(emiLit, unitName).isNotNull,
          element_at(emiLit, unitName))
        .when(!present(unitName) && element_at(emiLit, unitStr).isNotNull,
          element_at(emiLit, unitStr))

    // Inverse augmentation is INLINE: of the IRI-object triples emitted
    // below, exactly four predicates appear in Model.inverseRelations
    // (sosa:isSampleOf, sosa:isFeatureOfInterestOf, dcterms:isPartOf,
    // sosa:hasResult — rdf:type, qudt:hasUnit and emi:inTaxon have no
    // inverse entry), so their inverses ride the same array under the
    // same guards. The former Materialize.addInverses pass referenced
    // the emission output twice (base ∪ inverses), executing the whole
    // datagen → match → emission subtree twice per action; TrydbSpec and
    // the kg_trydb_triples oracle pin the result set unchanged.
    val ts = array(
      tr(lit(true), sample, RDF_TYPE, lit(SOSA + "Sample"), false, ""),
      tr(lit(true), sample, RDFS_LABEL, col("AccSpeciesName"), true, XSD_STRING),
      tr(lit(true), sample, SOSA + "isSampleOf", organism, false, ""),
      tr(lit(true), organism, SOSA + "hasSample", sample, false, ""),
      tr(lit(true), sample, SOSA + "isFeatureOfInterestOf", observation, false, ""),
      tr(lit(true), observation, SOSA + "hasFeatureOfInterest", sample, false, ""),
      tr(hasDataset, sample, DCTERMS + "isPartOf", dataset, false, ""),
      tr(hasDataset, dataset, DCTERMS + "hasPart", sample, false, ""),
      tr(hasDataset, dataset, DCTERMS + "bibliographicCitation",
        col("Reference"), true, XSD_STRING),
      tr(hasDataset, dataset, DCTERMS + "identifier",
        concat(lit("TRYdb-"), q(col("DatasetID"))), true, XSD_STRING),
      tr(hasResult, observation, SOSA + "hasResult", result, false, ""),
      tr(hasResult, result, SOSA + "isResultOf", observation, false, ""),
      tr(hasResult && traitP, result, RDF_TYPE, lit(EMI + "Trait"), false, ""),
      tr(hasResult && traitP && present(col("TraitID")),
        lit(EMI + "Trait"), DCTERMS + "identifier",
        concat(lit("TRYdb-"), q(col("TraitID"))), true, XSD_STRING),
      tr(hasResult && traitP && present(col("OrigValueStr")) && numeric,
        result, RDF_VALUE, col("OrigValueStr"), true, XSD_DOUBLE),
      tr(hasResult && traitP && present(col("OrigValueStr")) && !numeric,
        result, RDF_VALUE, col("OrigValueStr"), true, XSD_STRING),
      tr(hasResult && !traitP, result, RDF_TYPE, lit(EMI + "NonTrait"), false, ""),
      tr(hasResult && !traitP && present(col("OrigValueStr")),
        result, RDF_VALUE, col("OrigValueStr"), true, XSD_STRING),
      tr(hasResult && present(col("DataName")), result, RDFS_LABEL,
        col("DataName"), true, XSD_STRING),
      tr(hasResult && present(col("DataID")), result, DCTERMS + "identifier",
        concat(lit("TRYdb-"), q(col("DataID"))), true, XSD_STRING),
      tr(present(unitStr) && unitUri.isNotNull, result,
        QUDT_TRY + "hasUnit", unitUri, false, ""),
      tr(present(unitStr), result, RDFS_COMMENT, trim(unitStr), true, XSD_STRING),
      tr(col("WdID").isNotNull, organism, EMI + "inTaxon",
        concat(lit(WD), q(col("WdID"))), false, ""),
      tr(col("AccSpeciesID").isNotNull && col("AccSpeciesID") =!= "",
        organism, DCTERMS + "identifier",
        concat(lit("TRYdb-"), q(col("AccSpeciesID"))), true, XSD_STRING))

    merged.select(explode(ts).as("t")).filter(col("t").isNotNull)
      .select(col("t.*"))
  }

  /** Full TRY-db pipeline: trydb rows ⟕ species matcher (hub species skew
    * handled by AQE + optional salting), optional ENPKG semi filter,
    * emission, inverse augmentation, global distinct.
    */
  def run(spark: SparkSession, trydb: DataFrame, lineage: DataFrame,
      enpkg: Option[DataFrame] = None): DataFrame = {
    val speciesNames = trydb.select(col("AccSpeciesName").as("TRY_AccSpeciesName"))
      .distinct()
    val matched = matchSpecies(speciesNames, lineage)
    val merged0 = trydb.join(
      broadcast(matched.select(col("TRY_AccSpeciesName"), col("WdID"))),
      trydb("AccSpeciesName") === col("TRY_AccSpeciesName"), "left")
      .drop("TRY_AccSpeciesName")
    val merged = enpkg match {
      case Some(e) => merged0.join(e.select(col("wd_taxon_id").as("WdID")),
        Seq("WdID"), "left_semi")
      case None => merged0
    }
    // inverses are emitted inline by triples() — see the ts array note
    triples(merged, qudtUnitMap.toMap, emiUnitMap.toMap)
      .dropDuplicates("subj", "pred", "obj", "objIsLiteral", "objDatatype")
  }
}
