package graft.kg

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, Path}
import Model._

/** Stage DAG driver: checkpointed, idempotently resumable KG
  * construction (north rule; reference counterpart: the row-offset
  * checkpoint file, globi_kg_generator.py:146-150,321-323).
  *
  * Each stage writes (a) its output as parquet, (b) a _MANIFEST.json
  * sidecar carrying the stage name, an input fingerprint, per-partition
  * row counts (lineage metrics) and wall-clock. A stage is skipped on
  * resume iff its manifest exists and the fingerprint matches — so a
  * killed run re-executes only the unfinished suffix of the DAG, and a
  * finished run is a no-op. Stage outputs are immutable; reruns write
  * via overwrite to stay idempotent.
  */
object Pipeline {

  case class StageResult(name: String, rows: Long, partitions: Int,
      seconds: Double, skipped: Boolean)

  private def manifestPath(dir: String): Path = Paths.get(dir, "_MANIFEST.json")

  private def jsonEscape(s: String): String =
    s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    }

  def writeManifest(dir: String, stage: String, fingerprint: String,
      partCounts: Seq[Long], seconds: Double): Unit = {
    val counts = partCounts.mkString("[", ",", "]")
    val json =
      s"""{"stage":"${jsonEscape(stage)}","fingerprint":"${jsonEscape(fingerprint)}",
         |"rows":${partCounts.sum},"partitions":${partCounts.length},
         |"partition_rows":$counts,"seconds":$seconds}""".stripMargin.replace("\n", "")
    Files.createDirectories(Paths.get(dir))
    Files.writeString(manifestPath(dir), json)
  }

  def manifestMatches(dir: String, fingerprint: String): Boolean = {
    val p = manifestPath(dir)
    Files.exists(p) &&
      Files.readString(p).contains(s""""fingerprint":"${jsonEscape(fingerprint)}"""")
  }

  /** Run one stage: skip when a valid manifest exists, else compute,
    * write parquet + manifest with per-partition counts.
    */
  def stage(spark: SparkSession, outRoot: String, name: String,
      fingerprint: String)(compute: => DataFrame): (DataFrame, StageResult) = {
    val dir = s"$outRoot/$name"
    if (manifestMatches(dir, fingerprint)) {
      val df = spark.read.parquet(s"$dir/data")
      (df, StageResult(name, -1L, -1, 0.0, skipped = true))
    } else {
      val t0 = System.nanoTime()
      val df = compute
      df.write.mode("overwrite").parquet(s"$dir/data")
      val written = spark.read.parquet(s"$dir/data")
      // per-partition lineage metrics (north rule: persisted alongside
      // the checkpoint)
      val partCounts = written
        .groupBy(spark_partition_id().as("pid")).count()
        .orderBy(col("pid")).collect().map(_.getLong(1)).toSeq
      val secs = (System.nanoTime() - t0) / 1e9
      writeManifest(dir, name, fingerprint, partCounts, secs)
      (written, StageResult(name, partCounts.sum, partCounts.length, secs,
        skipped = false))
    }
  }

  case class RunReport(stages: Seq[StageResult], triples: Long,
      canonicalTriples: Long)

  /** Table-native entry point (north rule: the pipeline runs OVER
    * Iceberg tables): read the interleaved document corpus from a
    * snapshot table (optionally at a pinned snapshot — a re-run against
    * the same snapshot is reproducible regardless of later appends) and
    * publish the canonical graph as a new snapshot of an output table,
    * predicate-partitioned. Returns (run report, graph snapshot id).
    */
  def runFromTable(spark: SparkSession, docsTableDir: String,
      outRoot: String, graphTableDir: String,
      snapshot: Option[Long] = None, partitions: Int = 32)
      : (RunReport, Long) = {
    import graft.sources.SnapshotTable
    val snap = snapshot.getOrElse(SnapshotTable.currentSnapshot(docsTableDir))
    val docs = SnapshotTable.read(spark, docsTableDir, Some(snap))
    val nDocs = docs.count()
    val fp = s"table:$docsTableDir@$snap:docs:$nDocs:v1"
    val stages = scala.collection.mutable.ArrayBuffer[StageResult]()

    val (records, s1) = stage(spark, outRoot, "10_extract", fp) {
      Extract.records(docs)
    }
    stages += s1
    val (matched, s2) = stage(spark, outRoot, "20_link", fp) {
      Link.matchTaxaAdaptive(records, DataGen.wdSparqlRows,
        DataGen.lineageRows, nDocs)
    }
    stages += s2
    val (triples, s3) = stage(spark, outRoot, "30_triples", fp) {
      val (dictId, dictName) = Materialize.wdMapDicts(matched)
      val mm = Extract.mediaMentions(records, DataGen.mediaMeta(spark))
      Materialize.globiTriplesFused(records, dictId, dictName, Some(mm))
    }
    stages += s3
    val (canonical, s4) = stage(spark, outRoot, "40_canonical", fp) {
      val edges = Canonical.equivalenceEdges(matched)
      val mapping = Canonical.connectedComponents(edges)
      Canonical.canonicalizeTriples(triples, mapping)
    }
    stages += s4

    val graphSnap = SnapshotTable.write(
      canonical
        .withColumn("predicate", regexp_replace(col("pred"), "[^A-Za-z0-9]+", "_"))
        .repartitionByRange(partitions, col("predicate"), col("subj"))
        .sortWithinPartitions(col("predicate"), col("subj")),
      graphTableDir, mode = "overwrite", partitionBy = Seq("predicate"))
    (RunReport(stages.toSeq, triples.count(), canonical.count()), graphSnap)
  }

  case class IncrementalResult(processedDocsSnapshot: Long,
      graphSnapshot: Long, rowsWritten: Long, mode: String)

  /** Incremental maintenance of the RAW triple table, EXACT by
    * construction (incremental output == full rebuild, asserted in
    * SnapshotTableSpec):
    *
    * The dictionaries are order-sensitive (pandas last-wins over the
    * global sources-then-targets mention order), so naive
    * delta-with-delta-dicts processing silently diverges from a full
    * rebuild on duplicate-name keys — this implementation instead
    * mirrors the reference's actual incremental unit (dictionaries
    * global, EMISSION batched, globi_kg_generator.py:88-110 vs 146-171):
    *
    *  1. an accumulated DISTINCT-TAXA state (dimension-sized) keeps
    *     every mention 4-tuple with its global first-occurrence ordinal
    *     (isTarget·2^40 + recNum — exactly the full rebuild's
    *     sources-then-targets order, stable under appends);
    *  2. each increment merges the delta's taxa (min-ordinal) and
    *     re-runs the driver-local matcher on the state → the FINAL
    *     dictionaries, identical to a full rebuild's;
    *  3. a PROBE state keeps every distinct (taxonId, taxonName)
    *     resolution probe ever seen; if no old probe resolves
    *     DIFFERENTLY under the final dictionaries than under the
    *     previous ones (covers changed winners, new ids shadowing old
    *     name matches, and new entries matching previously dropped
    *     records), previously emitted triples are still exactly what
    *     the final dictionaries would emit → FAST PATH: emit only the
    *     delta records, anti-join the shared subset, append;
    *  4. otherwise old emissions are stale → detected, and the run
    *     REBUILDS from the full docs table (overwrite snapshot) — the
    *     correctness-first fallback.
    *
    * Scope: maintains the PRE-canonicalization table. CC
    * canonicalization is a global fixpoint (new equivalence edges merge
    * previously distinct components retroactively) and stays a periodic
    * global job (runFromTable) — the standard incremental/batch split.
    */
  /** Incremental maintenance of the CANONICAL triple table, layered on
    * incrementalFromTable (which keeps the raw table + dictionary
    * states exact):
    *
    *  - the equivalence mapping is recomputed per increment from the
    *    accumulated matched state (it is dimension-sized — CC runs over
    *    distinct-name equivalence edges, never the corpus);
    *  - a MAPPING state detects whether any previously-relevant node's
    *    effective component changed (including a node that used to be
    *    identity-mapped and just joined a component): published
    *    canonical IRIs would be stale → re-canonicalize the full raw
    *    table (overwrite snapshot);
    *  - otherwise only the raw rows this increment appended are
    *    canonicalized and appended (anti-joined for set semantics).
    *
    * Exactness (incremental canonical == full runFromTable canonical)
    * is test-pinned in SnapshotTableSpec.
    */
  /** `failpoint` is a crash-injection hook invoked right AFTER each
    * named commit ("taxa-state", "probes-state", "raw-graph",
    * "mapping-state") — production passes the no-op default; the test
    * suite throws from it to prove every crash window repairs exactly.
    */
  def incrementalCanonicalFromTable(spark: SparkSession, docsTableDir: String,
      rawGraphTableDir: String, canonicalTableDir: String,
      maxDriverRows: Long = 2000000L,
      failpoint: String => Unit = _ => ()): IncrementalResult = {
    import graft.sources.SnapshotTable
    import spark.implicits._
    val mappingStateDir = s"$canonicalTableDir-state/mapping"
    val (raw, rawMatched) = incrementalFromTableImpl(spark, docsTableDir,
      rawGraphTableDir, maxDriverRows, failpoint, keepMatched = true)
    val rawSnapNow = SnapshotTable.currentSnapshot(rawGraphTableDir)
    val canonSnap = SnapshotTable.currentSnapshot(canonicalTableDir)
    // the raw snapshot the canonical table last processed — derived from
    // the canonical table's OWN commit key, so a crash between the raw
    // and canonical commits is repaired on the next call (a bare
    // raw.mode == "noop" check would wrongly noop while the canonical
    // table is still behind the raw one)
    val lastRawProcessed =
      if (canonSnap == 0) 0L
      else SnapshotTable.committedKey(canonicalTableDir, canonSnap)
        .filter(_.startsWith("raw-snap-"))
        .map(_.stripPrefix("raw-snap-").toLong).getOrElse(0L)
    if (canonSnap > 0 && lastRawProcessed >= rawSnapNow) {
      rawMatched.foreach(_.unpersist())
      return IncrementalResult(0L, canonSnap, 0L, "noop")
    }

    // full mapping from the matcher output over the FINAL taxa state —
    // reused from the raw increment when it just computed it (the
    // common path: one matcher run per micro-batch, not two); derived
    // from the persisted state only on the repair path where the raw
    // layer noop'd but the canonical table is behind
    val matchedDf = rawMatched.getOrElse {
      val taxaStateDir = s"$rawGraphTableDir-state/taxa"
      val taxaDf = SnapshotTable.read(spark, taxaStateDir)
        .select(col("TaxonId"), col("TaxonName"), col("TaxonPathName"),
          col("TaxonRankName"), col("rowIdx"))
      if (taxaDf.count() <= maxDriverRows) {
        val taxa = taxaDf.collect()
          .map(r => LocalMatcher.TaxaRow(r.getString(0), r.getString(1),
            r.getString(2), r.getString(3), r.getLong(4))).sortBy(_.rowIdx)
        Link.matchedRowsToDf(spark,
          LocalMatcher.matchTaxa(taxa.toSeq,
            DataGen.wdSparqlRows, DataGen.lineageRows))
      } else Link.matchTaxaFromTaxa(taxaDf,
        DataGen.wdSparql(spark), DataGen.wdLineage(spark))
    }
    val mappingDf = Canonical.connectedComponents(
      Canonical.equivalenceEdges(matchedDf))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // previous mapping ANCHORED to the canonical table's committed key
    // (the state is committed before the canonical snapshot, so a crash
    // leaves it ahead — never behind — and the anchored read recovers
    // the exact view the published canonical rows were built with).
    // Missing anchor with a non-empty canonical table ⇒ provenance lost
    // ⇒ correctness-first re-canonicalization.
    val prevMappingSnap =
      if (lastRawProcessed == 0) None
      else SnapshotTable.snapshotWithKey(mappingStateDir,
        s"raw-snap-$lastRawProcessed")
    val anchorLost = canonSnap > 0 && prevMappingSnap.isEmpty
    // effective-mapping change detection as a DISTRIBUTED full-outer
    // join — a node absent from a mapping is identity-mapped, so the
    // comparison is coalesce(component, node) on both sides. No
    // driver-side Set: the mapping is dimension-sized today, but the
    // check must survive an entity space that scales with the corpus.
    // Evaluated LAZILY: when another disjunct already forces a rebuild
    // (first build, raw rebuild), the comparison job never runs.
    def mappingChanged: Boolean = anchorLost || {
      val prev = prevMappingSnap
        .map(s => SnapshotTable.read(spark, mappingStateDir, Some(s)))
        .getOrElse(Seq.empty[(String, String)].toDF("node", "component"))
        .select(col("node"), col("component").as("_pc"))
      mappingDf.select(col("node"), col("component").as("_nc"))
        .join(prev, Seq("node"), "full_outer")
        .filter(!(coalesce(col("_pc"), col("node")) <=>
          coalesce(col("_nc"), col("node"))))
        .limit(1).count() > 0
    }
    // a raw REBUILD that committed but whose canonical update crashed
    // before publishing: raw.mode reads "noop" on the retry, yet the
    // raw table was REWRITTEN after the snapshot this canonical table
    // last processed — append-only repair could never remove canonical
    // rows derived from raw rows the rewrite deleted or replaced. The
    // check is DEFAULT-DENY over operation names: only "append" (pure
    // addition) and "replace" (compact — content-identical by
    // construction) are delta-safe; "overwrite", "merge" (copy-on-write
    // upsert can REPLACE rows), any future op, and any snapshot whose
    // metadata has been EXPIRED (operation unknowable) all force
    // re-canonicalization — correctness beats a spurious rebuild.
    val rawOps = SnapshotTable.history(rawGraphTableDir)
      .map(s => s.id -> s.operation).toMap
    val rawRebuiltSince = (lastRawProcessed + 1 to rawSnapNow)
      .exists(id => rawOps.get(id).forall(op => op != "append" && op != "replace"))

    val tripleCols = Seq("subj", "pred", "obj", "objIsLiteral", "objDatatype")
    val (outDf, mode) =
      if (raw.mode == "rebuild" || canonSnap == 0 || rawRebuiltSince ||
          mappingChanged)
        (Canonical.canonicalizeTriples(
          SnapshotTable.read(spark, rawGraphTableDir).select(tripleCols.map(col): _*),
          mappingDf), "rebuild")
      else {
        // an increment that added no raw rows reads as an empty delta —
        // still committed, to advance the canonical table's key chain
        val deltaRaw = SnapshotTable.readDelta(spark, rawGraphTableDir,
          lastRawProcessed).select(tripleCols.map(col): _*)
        val canonDelta = Canonical.canonicalizeTriples(deltaRaw, mappingDf)
        (canonDelta.join(SnapshotTable.read(spark, canonicalTableDir)
          .select(tripleCols.map(col): _*), tripleCols, "left_anti"), "append")
      }
    val persisted = outDf
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val written = persisted.count()
    // state first, publish last (see incrementalFromTable)
    SnapshotTable.write(mappingDf, mappingStateDir, mode = "overwrite",
      idempotencyKey = s"raw-snap-$rawSnapNow")
    failpoint("mapping-state")
    val newSnap = SnapshotTable.write(persisted, canonicalTableDir,
      mode = if (mode == "rebuild") "overwrite" else "append",
      idempotencyKey = s"raw-snap-$rawSnapNow")
    persisted.unpersist(); mappingDf.unpersist()
    matchedDf.unpersist() // persisted only on the distributed path; no-op otherwise
    IncrementalResult(raw.processedDocsSnapshot, newSnap, written,
      if (raw.mode == "rebuild") "rebuild" else mode)
  }

  /** All distinct (taxonId, taxonName) resolution probes in a record
    * set — one row per probe, never collected: on real-world corpora
    * verbatim ids approach per-record cardinality, so the probe state
    * is CORPUS-scale and must stay a table.
    */
  private def probesOf(records: DataFrame): DataFrame =
    records.select(
      array(
        struct(col("sourceTaxonId").as("id"), col("sourceTaxonName").as("name")),
        struct(col("targetTaxonId").as("id"), col("targetTaxonName").as("name")))
        .as("ps"))
      .select(explode(col("ps")).as("p")).select(col("p.id"), col("p.name"))
      .distinct()

  def incrementalFromTable(spark: SparkSession, docsTableDir: String,
      rawGraphTableDir: String,
      maxDriverRows: Long = 2000000L,
      failpoint: String => Unit = _ => ()): IncrementalResult =
    incrementalFromTableImpl(spark, docsTableDir, rawGraphTableDir,
      maxDriverRows, failpoint, keepMatched = false)._1

  /** Implementation that can also hand back the FINAL matcher output
    * over the merged taxa state (persisted; the caller unpersists) —
    * the canonical maintenance layer reuses it for the equivalence
    * mapping instead of re-running the matcher on identical input.
    */
  private[kg] def incrementalFromTableImpl(spark: SparkSession,
      docsTableDir: String, rawGraphTableDir: String,
      maxDriverRows: Long, failpoint: String => Unit,
      keepMatched: Boolean): (IncrementalResult, Option[DataFrame]) = {
    import graft.sources.SnapshotTable
    import spark.implicits._
    val keyPrefix = "docs-snap-"
    val taxaStateDir = s"$rawGraphTableDir-state/taxa"
    val probesStateDir = s"$rawGraphTableDir-state/probes"
    val docsSnap = SnapshotTable.currentSnapshot(docsTableDir)
    val graphSnap = SnapshotTable.currentSnapshot(rawGraphTableDir)
    val lastProcessed =
      if (graphSnap == 0) 0L
      else SnapshotTable.committedKey(rawGraphTableDir, graphSnap)
        .filter(_.startsWith(keyPrefix))
        .map(_.stripPrefix(keyPrefix).toLong).getOrElse(0L)
    if (docsSnap <= lastProcessed)
      return (IncrementalResult(0L, graphSnap, 0L, "noop"), None)

    // ---- crash-consistent state anchoring ------------------------------
    // States are committed BEFORE the graph snapshot (below), so a crash
    // between the commits leaves them AHEAD of the graph, never behind.
    // The graph's committed key is the authoritative progress marker:
    // the "old" view of each state table is the snapshot carrying that
    // key, found by history search — NOT the latest snapshot, which may
    // belong to a crashed run. A missing anchor (expired state, foreign
    // graph) means the old view is unrecoverable ⇒ correctness-first
    // full rebuild from the docs table.
    def anchored(stateDir: String): Option[Long] =
      if (lastProcessed == 0) None
      else SnapshotTable.snapshotWithKey(stateDir, s"$keyPrefix$lastProcessed")
    val oldTaxaSnap = anchored(taxaStateDir)
    val oldProbesSnap = anchored(probesStateDir)
    val stateLost = lastProcessed > 0 &&
      (oldTaxaSnap.isEmpty || oldProbesSnap.isEmpty)

    val taxaCols = Seq("TaxonId", "TaxonName", "TaxonPathName",
      "TaxonRankName", "rowIdx")
    def collectTaxa(df: DataFrame): Seq[LocalMatcher.TaxaRow] =
      df.select(taxaCols.map(col): _*).collect()
        .map(r => LocalMatcher.TaxaRow(r.getString(0), r.getString(1),
          r.getString(2), r.getString(3), r.getLong(4)))
        .sortBy(_.rowIdx).toSeq

    // 1-2: merge delta taxa into the accumulated state, derive dicts.
    // The taxa state is dimension-sized (DISTINCT mention 4-tuples), so
    // the driver-local dict refinement applies — the same guarded
    // assumption as Link.matchTaxaAdaptive.
    val delta = SnapshotTable.readDelta(spark, docsTableDir, lastProcessed,
      Some(docsSnap))
    val deltaRecords = Extract.records(delta)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // base 2^40: rowIdx = recNum (source) / 2^40 + recNum (target) — the
    // global sources-then-targets ordinal, append-stable
    val deltaTaxa = Link.stackTaxa(deltaRecords, 1L << 40)
      .select(taxaCols.map(col): _*)
    val oldTaxaDf = oldTaxaSnap.map(s =>
      SnapshotTable.read(spark, taxaStateDir, Some(s)))
    // full-corpus records, materialized at most once, only when needed
    // (state lost, or the stale-probe check demands a rebuild)
    var fullRecordsCache: Option[DataFrame] = None
    def fullRecords: DataFrame = fullRecordsCache.getOrElse {
      val fr = Extract.records(
        SnapshotTable.read(spark, docsTableDir, Some(docsSnap)))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      fullRecordsCache = Some(fr)
      fr
    }
    val mergedTaxaDf = (if (stateLost)
      Link.stackTaxa(fullRecords, 1L << 40).select(taxaCols.map(col): _*)
    else
      oldTaxaDf.map(_.unionByName(deltaTaxa)).getOrElse(deltaTaxa))
      .groupBy(col("TaxonId"), col("TaxonName"), col("TaxonPathName"),
        col("TaxonRankName"))
      .agg(min(col("rowIdx")).as("rowIdx"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // dictionary derivation, ADAPTIVE (the same row-count guard policy
    // as Link.matchTaxaAdaptive): while the distinct-taxa state fits
    // the driver, the LocalMatcher refinement runs in one collect;
    // beyond it the distributed matcher + relational dict build take
    // over — compact == distributed is test-pinned, so the switch
    // never changes the answer. Both produce (key, wd, mv) dict
    // DataFrames; the compact path additionally yields the hash maps
    // the fused emission broadcasts.
    // persists created by the distributed branch (matcher output + the
    // two dicts) are released after the final commit — a streaming
    // micro-batch loop must not accumulate storage blocks per call.
    // The FINAL matcher output is captured for the caller when
    // keepMatched (the canonical layer derives its equivalence mapping
    // from it, instead of re-running the matcher on identical input).
    val toRelease = scala.collection.mutable.ArrayBuffer[DataFrame]()
    var finalMatched: Option[DataFrame] = None
    def deriveDicts(taxaDf: DataFrame, capture: Boolean): (DataFrame, DataFrame,
        Option[(Map[String, (String, String)], Map[String, (String, String)])]) =
      if (taxaDf.count() <= maxDriverRows) {
        val rows = LocalMatcher.matchTaxa(collectTaxa(taxaDf),
          DataGen.wdSparqlRows, DataGen.lineageRows)
        if (capture && keepMatched)
          finalMatched = Some(Link.matchedRowsToDf(spark, rows))
        val (mi, mn) = Materialize.localWdMapDicts(rows)
        def toDf(m: Map[String, (String, String)]) =
          m.toSeq.map { case (k, (w, v)) => (k, w, v) }.toDF("key", "wd", "mv")
        (toDf(mi), toDf(mn), Some((mi, mn)))
      } else {
        val matched = Link.matchTaxaFromTaxa(taxaDf,
          DataGen.wdSparql(spark), DataGen.wdLineage(spark))
        val (di, dn) = Materialize.wdMapDicts(matched)
        if (capture && keepMatched) finalMatched = Some(matched)
        else toRelease += matched
        toRelease += di; toRelease += dn
        (di, dn, None)
      }
    val (newIdDf, newNameDf, newMaps) = deriveDicts(mergedTaxaDf, capture = true)

    // 3-4: stale-emission detection, fully DISTRIBUTED: resolve every
    // previously-seen probe under the previous and the final
    // dictionaries (the probes are corpus-scale and never leave the
    // cluster; dict joins broadcast via AQE while dimension-sized) and
    // look for any difference. Resolution semantics mirror
    // Materialize.resolve: id-dict hit wins, else name-dict, else none.
    val needRebuild = stateLost || (graphSnap > 0 && lastProcessed > 0 && {
      val (oldIdDf, oldNameDf, _) = deriveDicts(oldTaxaDf.get, capture = false)
      def d(df: DataFrame, key: String, p: String) =
        df.select(col("key").as(key), col("wd").as(s"${p}_wd"),
          col("mv").as(s"${p}_mv"))
      def resCol(p: String): org.apache.spark.sql.Column = coalesce(
        when(col(s"${p}i_wd").isNotNull,
          struct(col(s"${p}i_wd").as("w"), col(s"${p}i_mv").as("m"))),
        when(col(s"${p}n_wd").isNotNull,
          struct(col(s"${p}n_wd").as("w"), col(s"${p}n_mv").as("m"))))
      SnapshotTable.read(spark, probesStateDir, oldProbesSnap)
        .join(d(oldIdDf, "id", "oi"), Seq("id"), "left")
        .join(d(oldNameDf, "name", "on"), Seq("name"), "left")
        .join(d(newIdDf, "id", "ni"), Seq("id"), "left")
        .join(d(newNameDf, "name", "nn"), Seq("name"), "left")
        .filter(!(resCol("o") <=> resCol("n")))
        .limit(1).count() > 0
    })

    val emitRecords = if (needRebuild) fullRecords else deltaRecords
    val mm = Extract.mediaMentions(emitRecords, DataGen.mediaMeta(spark))
    val tagged = (newMaps match {
      case Some((mi, mn)) =>
        Materialize.globiTriplesFusedTagged(emitRecords, mi, mn, Some(mm))
      case None =>
        // beyond-driver dictionaries: distributed two-tier resolution +
        // tagged split emission — no driver-side dictionary at all
        Materialize.globiTriplesSplitTagged(
          Materialize.resolve(emitRecords, newIdDf, newNameDf), Some(mm))
    }).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val tripleCols = Seq("subj", "pred", "obj", "objIsLiteral", "objDatatype")
    val uniquePart = tagged.filter(!col("shared")).select(tripleCols.map(col): _*)
    val sharedPart = tagged.filter(col("shared")).select(tripleCols.map(col): _*)
      .dropDuplicates(tripleCols)
    val (outDf, mode) =
      if (needRebuild || graphSnap == 0)
        (uniquePart.unionByName(sharedPart), if (needRebuild) "rebuild" else "append")
      else {
        val sharedNew = sharedPart.join(
          SnapshotTable.read(spark, rawGraphTableDir)
            .select(tripleCols.map(col): _*), tripleCols, "left_anti")
        (uniquePart.unionByName(sharedNew), "append")
      }
    val persisted = outDf
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val written = persisted.count()

    // ---- commit protocol: states FIRST, graph LAST ----------------------
    // A crash after the state commits but before the graph commit leaves
    // the graph key at lastProcessed; the retry re-anchors the old state
    // views by that key (they are retained snapshots, not the latest)
    // and its state writes short-circuit via their idempotency keys —
    // the increment is repaired exactly. The reverse order would record
    // progress on the graph that the states never learned about, and
    // the NEXT increment would silently build dictionaries missing this
    // delta.
    SnapshotTable.write(mergedTaxaDf, taxaStateDir, mode = "overwrite",
      idempotencyKey = s"$keyPrefix$docsSnap")
    failpoint("taxa-state")
    // probe state: APPEND only the genuinely new probes — the state
    // update is O(delta), and the probe table itself is never collected
    // or rewritten
    // the anti-join runs against the HEAD probes state, not the
    // anchored old view: a crashed run may already have appended its
    // delta's probes (committed with its own key) before the graph
    // commit failed, and a retry after docs advanced FURTHER would
    // re-append that overlap if it only deduped against the anchor —
    // the head is a superset of the anchor, so deduping against it
    // keeps the state an exact distinct-probe set in every crash
    // interleaving
    val probesOut =
      if (stateLost) probesOf(fullRecords) // state rebuilt from scratch
      else {
        val deltaProbes = probesOf(deltaRecords)
        oldProbesSnap match {
          case Some(_) => deltaProbes.join(
            SnapshotTable.read(spark, probesStateDir),
            Seq("id", "name"), "left_anti")
          case None => deltaProbes
        }
      }
    SnapshotTable.write(probesOut, probesStateDir,
      mode = if (stateLost || oldProbesSnap.isEmpty) "overwrite" else "append",
      idempotencyKey = s"$keyPrefix$docsSnap")
    failpoint("probes-state")
    val newGraphSnap = SnapshotTable.write(persisted, rawGraphTableDir,
      mode = if (mode == "rebuild") "overwrite" else "append",
      idempotencyKey = s"$keyPrefix$docsSnap")
    failpoint("raw-graph")

    tagged.unpersist(); deltaRecords.unpersist(); persisted.unpersist()
    mergedTaxaDf.unpersist(); fullRecordsCache.foreach(_.unpersist())
    toRelease.foreach(_.unpersist())
    (IncrementalResult(docsSnap, newGraphSnap, written, mode), finalMatched)
  }

  /** Full KG construction over the deterministic corpus:
    * datagen → extract → link → materialize → canonicalize, all
    * checkpointed under outRoot.
    */
  def run(spark: SparkSession, nDocs: Long, outRoot: String,
      partitions: Int = 32): RunReport = {
    val fp = s"corpus:$nDocs:v1"
    val stages = scala.collection.mutable.ArrayBuffer[StageResult]()

    val (docs, s0) = stage(spark, outRoot, "00_corpus", fp) {
      DataGen.corpus(spark, nDocs, partitions).toDF()
    }
    stages += s0

    val (records, s1) = stage(spark, outRoot, "10_extract", fp) {
      Extract.records(docs)
    }
    stages += s1

    val (matched, s2) = stage(spark, outRoot, "20_link", fp) {
      // adaptive: driver-local refinement while the distinct-taxa table
      // is dimension-sized, distributed matcher beyond that — the
      // row-count guard replaces the caller-asserted assumption
      Link.matchTaxaAdaptive(records, DataGen.wdSparqlRows,
        DataGen.lineageRows, nDocs)
    }
    stages += s2

    val (triples, s3) = stage(spark, outRoot, "30_triples", fp) {
      val (dictId, dictName) = Materialize.wdMapDicts(matched)
      val mm = Extract.mediaMentions(records, DataGen.mediaMeta(spark))
      // fused broadcast-map path (dictionaries are dimension-sized);
      // swap to resolve()+globiTriples() for beyond-memory dictionaries
      Materialize.globiTriplesFused(records, dictId, dictName, Some(mm))
    }
    stages += s3

    val (canonical, s4) = stage(spark, outRoot, "40_canonical", fp) {
      val edges = Canonical.equivalenceEdges(matched)
      val mapping = Canonical.connectedComponents(edges)
      Canonical.canonicalizeTriples(triples, mapping)
    }
    stages += s4

    // final graph layout: predicate-partitioned, range-partitioned files
    // of the CANONICAL stage output (the documented dataflow: extract →
    // link → materialize → canonicalize → write; raw triples remain
    // available in the 30_triples stage parquet)
    Materialize.writeTriples(canonical, s"$outRoot/50_graph",
      numPartitions = partitions)

    RunReport(stages.toSeq, triples.count(), canonical.count())
  }
}
