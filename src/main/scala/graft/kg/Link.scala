package graft.kg

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.normalize.Norm
import Model._

/** Stage 2 — entity linking: the reference's taxonomy matcher
  * (src/taxonomy_matching/matcher.py) re-expressed as broadcast joins +
  * a scored disambiguation join.
  *
  * Dictionary semantics made relational:
  *  - pandas "dict build, later row wins" → groupBy(key).max_by(value, rowIdx)
  *  - "drop_duplicates keeps first" → groupBy(all cols).min(rowIdx)
  *  - scored argmax with first-insertion tiebreak → max_by over
  *    struct(score, -groupIdx)  (matcher.py:264-280)
  * Every dictionary is a small table ⇒ broadcast joins, no shuffle on
  * the big side except the final dedup.
  */
object Link {

  private def nonEmpty(c: Column): Column = c.isNotNull && c =!= ""

  /** Prefix external-id columns positionally, normalize Wikidata URIs and
    * strip quotes (matcher.py:108-114).
    */
  def prepWdSparql(wdSparql: DataFrame): DataFrame = {
    val cols = wdSparql.columns
    val prefixed = wdSparql.select(cols.zipWithIndex.map { case (c, idx) =>
      val base =
        if (idx >= 1 && idx <= 15)
          when(col(c).isNotNull, concat(lit(externalPrefixes(idx - 1)), col(c)))
            .otherwise(col(c))
        else col(c)
      regexp_replace(
        regexp_replace(base, "http://www\\.wikidata\\.org/entity/", "Wikidata:"),
        "\"", "").as(c)
    }: _*)
    prefixed
  }

  /** globi_id_map: any id column (WdID + 15 externals) → WdName;
    * globi_id_map_wd: external id → WdID (matcher.py:117-130).
    */
  def idMaps(prepped: DataFrame): (DataFrame, DataFrame) = {
    // pandas melt→to_dict is LAST-occurrence-wins in COLUMN-MAJOR order
    // (matcher.py:117-130: the melt stacks column by column, dict build
    // keeps the later entry). Reproduce it with an explicit ordinal
    // (colIdx, rowIdx) STRUCT and max_by over its lexicographic order —
    // a packed `colIdx·2^40 + rowIdx` long would silently corrupt the
    // column-major order once the input has ≥128 partitions, because
    // monotonically_increasing_id puts the partition id in bits ≥33 and
    // partition 128 of column 0 would outrank column 1.
    // rowIdx comes from monotonically_increasing_id() over the input —
    // order-faithful for the single-file dimension reads this table
    // comes from (partition id occupies the high bits, so multi-split
    // reads stay ordered file-major, matching the reference's
    // concatenated read).
    val withIdx = prepped.withColumn("_rowIdx", monotonically_increasing_id())
    val cols = prepped.columns
    val wdIdCol = cols.head; val wdNameCol = cols.last
    val keyCols = cols.dropRight(1) // includes WdID (matcher.py:116)
    val extCols = cols.drop(1).dropRight(1)
    // single-pass melt: one explode over the key columns (no 16-way
    // union → one job instead of sixteen)
    def melt(keys: Seq[String], valueCol: String): DataFrame =
      withIdx
        .select(explode(array(keys.zipWithIndex.map { case (k, ci) =>
          struct(col(k).as("key"),
            struct(lit(ci).as("ci"), col("_rowIdx").as("ri")).as("ord"))
        }: _*)).as("kv"), col(valueCol).as("value"))
        .select(col("kv.key").as("key"), col("kv.ord").as("ord"), col("value"))
        .filter(col("key").isNotNull)
        .groupBy(col("key"))
        .agg(max_by(col("value"), col("ord")).as("value"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    (melt(keyCols, wdNameCol), melt(extCols, wdIdCol))
  }

  /** Stack source/target taxon frames, normalize ids/urls, dedup keeping
    * first occurrence, unpack rank paths (matcher.py:133-180).
    * rowIdx: source rows get recNum, target rows get nDocs+recNum —
    * reproduces pandas concat order without any positional state.
    */
  def stackTaxa(records: DataFrame, nDocs: Long): DataFrame = {
    // one scan: both sides as a 2-element struct array, exploded —
    // pandas concat order reproduced by the rowIdx arithmetic, without
    // reading the corpus twice (union of two projections = two scans)
    def side(p: String, base: Column): Column = struct(
      col(s"${p}TaxonId").as("TaxonId"),
      col(s"${p}TaxonName").as("TaxonName"),
      col(s"${p}TaxonPathNames").as("TaxonPathName"),
      col(s"${p}TaxonPathRankNames").as("TaxonRankName"),
      (col("recNum") + base).as("rowIdx"))
    val stacked = records
      .select(explode(array(side("source", lit(0L)), side("target", lit(nDocs))))
        .as("t"))
      .select(col("t.*"))
    val norm = stacked.select(
      Seq("TaxonId", "TaxonName", "TaxonPathName", "TaxonRankName")
        .map(c => Norm.normalizeUri(col(c)).as(c)) :+ col("rowIdx"): _*)
    val dedup = norm
      .groupBy(col("TaxonId"), col("TaxonName"), col("TaxonPathName"), col("TaxonRankName"))
      .agg(min(col("rowIdx")).as("rowIdx"))
    unpackRanks(dedup)
  }

  /** Rank-path unpack (matcher.py:416-427) over a distinct-taxa table:
    * zip ranks with names positionally, zip_longest-style "" fill when
    * names run short. Duplicate rank names are LAST-WINS
    * (dict(zip_longest) semantics, matcher.py:419,
    * = LocalMatcher.extractRanks .toMap) — a plain map_from_arrays
    * would throw under mapKeyDedupPolicy=EXCEPTION on noisy paths like
    * "kingdom|kingdom|family". Factored out of stackTaxa so the
    * ACCUMULATED taxa state (which stores only the 5 base columns) can
    * re-enter the distributed matcher without re-stacking the corpus.
    */
  def unpackRanks(dedup: DataFrame): DataFrame = {
    val ranksArr = transform(split(col("TaxonRankName"), "\\|"), r => trim(r))
    val namesArr = transform(split(col("TaxonPathName"), "\\|"), n => trim(n))
    val entries = transform(sequence(lit(1), size(ranksArr)), i =>
      struct(element_at(ranksArr, i).as("k"),
        coalesce(element_at(namesArr, i), lit("")).as("v"), i.as("i")))
    val lastWins = filter(entries, e =>
      !exists(entries, e2 =>
        e2.getField("k") === e.getField("k") && e2.getField("i") > e.getField("i")))
    val m = map_from_entries(transform(lastWins, e =>
      struct(e.getField("k"), e.getField("v"))))
    val withRanks = predefinedRanks.foldLeft(dedup.withColumn("_rankmap", m)) {
      case (df, rank) =>
        df.withColumn(rank, coalesce(element_at(col("_rankmap"), rank), lit("")))
    }
    withRanks.drop("_rankmap")
  }

  /** Initial ID-based match + status lattice (matcher.py:184-205). */
  def initialMatch(taxa: DataFrame, idMap: DataFrame, idMapWd: DataFrame): DataFrame = {
    val tid = trim(col("TaxonId"))
    val tname = trim(col("TaxonName"))
    val im = idMap.select(col("key").as("_k1"), col("value").as("Mapped_Value"))
    val imWd = idMapWd.select(col("key").as("_k2"), col("value").as("Mapped_ID_WD"))
    taxa
      .join(broadcast(im), tid === col("_k1"), "left").drop("_k1")
      .join(broadcast(imWd), tid === col("_k2"), "left").drop("_k2")
      .withColumn("Mapped_ID", when(col("Mapped_Value").isNotNull, tid))
      .withColumn("Match_Status",
        when(!nonEmpty(tid), "ID-NOT-PRESENT")
          .when(col("Mapped_Value").isNull, "ID-NOT-FOUND")
          .when(lower(col("Mapped_Value")) === lower(tname), "NAME-MATCH-YES")
          .otherwise("NAME-MATCH-NO"))
  }

  /** Lineage tables: normalized WdID; repeats = duplicate WdNames sorted
    * by (WdName, WdID) with a group index; uniques = the rest
    * (matcher.py:208-244, wikidata_fetcher.py:268-297).
    */
  case class LineageTables(repeats: DataFrame, uniques: DataFrame)

  def lineagePrep(lineage: DataFrame): LineageTables = {
    import org.apache.spark.sql.expressions.Window
    val l = lineage.withColumn("WdID",
      regexp_replace(col("WdID"), "http://www\\.wikidata\\.org/entity/", "Wikidata:"))
    val withCnt = l.withColumn("_cnt",
      count(lit(1)).over(Window.partitionBy(col("WdName"))))
    // per-name index, NOT a global row_number: every downstream
    // comparison of rowIdx/grpIdx happens within one WdName (the
    // candidate join key is the name, so min_by/max_by tie-breaks never
    // cross names — same invariant in LocalMatcher, whose dict insertion
    // order is only ever consulted through a name-filtered view). A
    // global orderBy window would funnel the whole lineage table through
    // one partition (WindowExec warns exactly that); partitioning by
    // WdName keeps the index distributed and semantics-identical.
    val repeats = withCnt.filter(col("_cnt") > 1).drop("_cnt")
      .withColumn("rowIdx",
        row_number().over(
          Window.partitionBy(col("WdName")).orderBy(col("WdID"))))
    val uniques = withCnt.filter(col("_cnt") === 1).drop("_cnt")
    LineageTables(repeats, uniques)
  }

  /** Secondary name-based matching for ID-NOT-FOUND / ID-NOT-PRESENT
    * rows (matcher.py:284-334): exact 6-tuple short-circuit, else the
    * scored disambiguation join (J5), else direct unique-name lookup.
    */
  def secondaryMatch(matched: DataFrame, lt: LineageTables): DataFrame = {
    val needsFix = col("Match_Status").isin("ID-NOT-FOUND", "ID-NOT-PRESENT") &&
      nonEmpty(trim(col("TaxonName")))

    val fix = matched.filter(needsFix)
      .withColumn("_name", trim(col("TaxonName")))
    val keep = matched.filter(!needsFix)

    // distinct candidate keys among duplicates, first-occurrence ordered
    val candKeys = lt.repeats
      .select(Seq(col("WdName"), col("WdID"), col("rowIdx")) ++
        Seq("family", "class", "order", "phylum", "kingdom")
          .map(c => coalesce(col(c), lit("")).as(s"c_$c")): _*)
      .groupBy(col("WdName"), col("c_family"), col("c_class"), col("c_order"),
        col("c_phylum"), col("c_kingdom"))
      .agg(min_by(col("WdID"), col("rowIdx")).as("c_wdid"),
        min(col("rowIdx")).as("grpIdx"))

    // one candidate join on name covers both the exact 6-tuple
    // short-circuit (case-sensitive, matcher.py:260-261) and the scored
    // argmax (+1 per case-insensitive match on non-empty candidate rank,
    // matcher.py:264-280) — single broadcast join + single partial-agg
    // shuffle instead of two of each
    def sc(rowCol: String, candCol: String): Column =
      when(nonEmpty(col(candCol)) &&
        lower(col(candCol)) === lower(col(rowCol)), 1).otherwise(0)
    val candStruct = struct(col("c_wdid"), col("c_family"), col("c_class"),
      col("c_order"), col("c_phylum"), col("c_kingdom"))
    val exactFlag =
      col("family") === col("c_family") && col("class") === col("c_class") &&
        col("order") === col("c_order") && col("phylum") === col("c_phylum") &&
        col("kingdom") === col("c_kingdom")
    val duplJoined = fix.join(broadcast(candKeys), col("_name") === candKeys("WdName"))
      .withColumn("_score",
        sc("family", "c_family") + sc("class", "c_class") + sc("order", "c_order") +
          sc("phylum", "c_phylum") + sc("kingdom", "c_kingdom"))
      .groupBy(col("rowIdx"))
      .agg(
        min_by(when(exactFlag, candStruct), when(exactFlag, col("grpIdx"))).as("ex"),
        max_by(candStruct,
          struct(col("_score"), (lit(0L) - col("grpIdx")).as("nIdx"))).as("scr"))

    // (c) unique-name direct lookup (matcher.py:318-326)
    val uniq = lt.uniques.select(col("WdName").as("u_name"),
      struct(col("WdID").as("c_wdid"),
        coalesce(col("family"), lit("")).as("c_family"),
        coalesce(col("class"), lit("")).as("c_class"),
        coalesce(col("order"), lit("")).as("c_order"),
        coalesce(col("phylum"), lit("")).as("c_phylum"),
        coalesce(col("kingdom"), lit("")).as("c_kingdom")).as("un"))

    val fixed = fix
      .join(duplJoined, Seq("rowIdx"), "left")
      .join(broadcast(uniq), col("_name") === col("u_name"), "left")
      .withColumn("_win", coalesce(col("ex"), col("scr"), col("un")))
      .withColumn("_isDupl", col("scr").isNotNull || col("ex").isNotNull)
      .withColumn("Mapped_ID_WD",
        when(col("_win").isNotNull, col("_win.c_wdid")).otherwise(lit(null)))
      .withColumn("Match_Status",
        when(col("_isDupl"), "ID-MATCHED-BY-NAME-DUPL-duplicate")
          .when(col("un").isNotNull, "ID-MATCHED-BY-NAME-direct")
          .otherwise(col("Match_Status")))
    val rankUpdated = Seq(
      ("family", "c_family"), ("class", "c_class"), ("order", "c_order"),
      ("phylum", "c_phylum"), ("kingdom", "c_kingdom"))
      .foldLeft(fixed) { case (df, (r, c)) =>
        df.withColumn(r,
          when(col("_win").isNotNull, col(s"_win.$c")).otherwise(col(r)))
      }
    val outCols = matched.columns.map(col)
    rankUpdated.select(outCols: _*).unionByName(keep.select(outCols: _*))
  }

  /** Compact matcher: distributed stack+distinct (the only corpus-scale
    * step), then the dimension-sized dictionary/scoring passes run on
    * the driver via LocalMatcher — one collect instead of ~12 small
    * jobs. Returns the matched rows; callers broadcast them (or build
    * resolution maps directly). The distributed formulation below
    * remains the beyond-driver-memory path; tests assert both equal.
    */
  def matchTaxaCompact(records: DataFrame, wdSparqlRows: Seq[Seq[String]],
      lineageRows: Seq[Seq[String]], nDocs: Long): Seq[LocalMatcher.MatchedRow] = {
    val taxa = stackTaxa(records, nDocs)
      .select(col("TaxonId"), col("TaxonName"), col("TaxonPathName"),
        col("TaxonRankName"), col("rowIdx"))
      .collect()
      .map(r => LocalMatcher.TaxaRow(r.getString(0), r.getString(1),
        r.getString(2), r.getString(3), r.getLong(4)))
      .sortBy(_.rowIdx)
    LocalMatcher.matchTaxa(taxa.toSeq, wdSparqlRows, lineageRows)
  }

  /** Driver-local matched rows → DataFrame via parallelize, NOT a
    * LocalRelation: a LocalTableScan feeding an exchange embeds the
    * whole row collection in every task binary (the driver bench logged
    * `task of very large size (1189 KiB)` for exactly this), while
    * parallelize ships each task only its slice.
    */
  def matchedRowsToDf(spark: org.apache.spark.sql.SparkSession,
      rows: Seq[LocalMatcher.MatchedRow], slices: Int = 4): DataFrame = {
    import org.apache.spark.sql.types.{StructField, StructType, StringType, LongType}
    val schema = StructType(Seq(
      StructField("TaxonId", StringType, true),
      StructField("TaxonName", StringType, true),
      StructField("Mapped_Value", StringType, true),
      StructField("Mapped_ID_WD", StringType, true),
      StructField("Match_Status", StringType, true),
      StructField("rowIdx", LongType, false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(m =>
        org.apache.spark.sql.Row(m.taxonId, m.taxonName, m.mappedValue,
          m.mappedIdWd, m.status, m.rowIdx)), math.max(slices, 1)),
      schema)
  }

  /** Compact matcher as a DataFrame (same schema consumers expect). */
  def matchTaxaCompactDf(records: DataFrame, wdSparqlRows: Seq[Seq[String]],
      lineageRows: Seq[Seq[String]], nDocs: Long): DataFrame =
    matchedRowsToDf(records.sparkSession,
      matchTaxaCompact(records, wdSparqlRows, lineageRows, nDocs))

  /** Adaptive matcher: counts the DISTINCT taxa table (the only thing
    * the compact path collects) and picks the driver-local refinement
    * when it is genuinely dimension-sized, else the fully distributed
    * formulation — the caller no longer has to assert the
    * fits-in-driver assumption. The count reuses the persisted taxa
    * table, so the guard costs one cheap action, not a second
    * corpus-scale pass. Both paths are asserted equal in
    * KgPipelineSpec.
    */
  def matchTaxaAdaptive(records: DataFrame, wdSparqlRows: Seq[Seq[String]],
      lineageRows: Seq[Seq[String]], nDocs: Long,
      maxDriverRows: Long = 2000000L): DataFrame = {
    val spark = records.sparkSession
    // a non-positive threshold FORCES the distributed formulation (the
    // kg_pipeline_triples_dist production-path gate): the guard count
    // can never choose the driver path, so skip building + counting the
    // guard's stacked-taxa table entirely — matchTaxa stacks and
    // persists its own
    if (maxDriverRows <= 0)
      return matchTaxaDistributed(records, wdSparqlRows, lineageRows, nDocs)
    val taxa = stackTaxa(records, nDocs)
      .select(col("TaxonId"), col("TaxonName"), col("TaxonPathName"),
        col("TaxonRankName"), col("rowIdx"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val out =
      if (taxa.count() <= maxDriverRows) {
        val rows = taxa.collect()
          .map(r => LocalMatcher.TaxaRow(r.getString(0), r.getString(1),
            r.getString(2), r.getString(3), r.getLong(4)))
          .sortBy(_.rowIdx)
        matchedRowsToDf(spark,
          LocalMatcher.matchTaxa(rows.toSeq, wdSparqlRows, lineageRows))
      } else matchTaxaDistributed(records, wdSparqlRows, lineageRows, nDocs)
    taxa.unpersist()
    out
  }

  /** Fully distributed matcher over the fixture dimension rows — the
    * beyond-driver-memory arm of [[matchTaxaAdaptive]]: rebuild the
    * dimension DataFrames from the same fixture rows and run the
    * distributed formulation.
    */
  def matchTaxaDistributed(records: DataFrame, wdSparqlRows: Seq[Seq[String]],
      lineageRows: Seq[Seq[String]], nDocs: Long): DataFrame = {
    val spark = records.sparkSession
    import org.apache.spark.sql.types.{StructField, StructType, StringType}
    val wdCols = Seq("WdID", "eol", "gbif", "ncbi", "ott", "itis",
      "irmng", "col", "nbn", "worms", "bold", "plazi", "apni", "msw3",
      "iNat", "eppo", "WdName")
    val wdSchema = StructType(wdCols.map(StructField(_, StringType, true)))
    val wd = spark.createDataFrame(
      spark.sparkContext.parallelize(
        wdSparqlRows.map(org.apache.spark.sql.Row.fromSeq), 1), wdSchema)
    val linCols = Seq("WdID", "WdName", "kingdom", "phylum", "class",
      "order", "family", "genus", "species")
    val linSchema = StructType(linCols.map(StructField(_, StringType, true)))
    val lin = spark.createDataFrame(
      spark.sparkContext.parallelize(
        lineageRows.map(org.apache.spark.sql.Row.fromSeq), 1), linSchema)
    matchTaxa(records, wd, lin, nDocs)
  }

  /** Full matcher pipeline: records → matched-taxa table (matcher.py:432-478).
    *
    * The stacked-dedup taxa table and the matcher output are
    * dimension-sized (distinct taxa, not records) — they are persisted
    * so the downstream branch joins and the four resolution broadcasts
    * compute them once instead of re-deriving the whole upstream DAG per
    * broadcast (the serial fraction that kills scaling efficiency).
    */
  def matchTaxa(records: DataFrame, wdSparql: DataFrame, lineage: DataFrame,
      nDocs: Long): DataFrame = {
    val taxa = stackTaxa(records, nDocs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val out = matchStackedTaxa(taxa, wdSparql, lineage)
    taxa.unpersist() // folded into the materialized matcher output
    out
  }

  /** Distributed matcher over an ALREADY-STACKED distinct-taxa table —
    * the incremental-maintenance entry point: the accumulated taxa
    * state (TaxonId, TaxonName, TaxonPathName, TaxonRankName, rowIdx)
    * IS a stacked table with global first-occurrence ordinals, so the
    * corpus is never re-scanned to rebuild dictionaries. Accepts the
    * 5-column base shape (ranks re-derived distributedly) or the full
    * stackTaxa output.
    */
  def matchTaxaFromTaxa(taxa5: DataFrame, wdSparql: DataFrame,
      lineage: DataFrame): DataFrame = {
    // persisted for the same reason matchTaxa persists its stacked
    // taxa: the downstream branch joins (initialMatch, secondaryMatch's
    // fix/keep split) reference this multiple times, and the O(k²)
    // exists-filter in the rank unpack must run once, not per branch
    val unpacked = unpackRanks(taxa5.select(col("TaxonId"), col("TaxonName"),
        col("TaxonPathName"), col("TaxonRankName"), col("rowIdx")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val out = matchStackedTaxa(unpacked, wdSparql, lineage)
    unpacked.unpersist()
    out
  }

  private def matchStackedTaxa(taxa: DataFrame, wdSparql: DataFrame,
      lineage: DataFrame): DataFrame = {
    val prepped = prepWdSparql(wdSparql)
    val (idMap, idMapWd) = idMaps(prepped)
    val initial = initialMatch(taxa, idMap, idMapWd)
    val out = secondaryMatch(initial, lineagePrep(lineage))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    out.count() // materialize once
    // the melted id maps are folded into `out` now — release them so a
    // caller loop (incremental maintenance runs the matcher per
    // micro-batch) does not accumulate storage blocks. A cache-evicted
    // recompute of `out` would just rebuild them.
    idMap.unpersist(); idMapWd.unpersist()
    out
  }
}
