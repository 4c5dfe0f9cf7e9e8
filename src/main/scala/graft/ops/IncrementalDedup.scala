package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.SnapshotTable

/** Incremental MinHash-LSH near-duplicate maintenance over snapshot
  * tables — the streaming-ingest shape of [[Dedup.minhashLsh]]: each
  * arriving document batch updates persisted LSH state and emits ONLY
  * the verified near-dup pairs that involve the new documents, without
  * ever rescanning the accumulated corpus. At 10^12 docs the batch
  * recompute is off the table; this is the form a production ingest
  * pipeline actually runs (the same role
  * `Pipeline.incrementalFromTable` plays for the KG layer, applied to
  * the dedup family).
  *
  * State layout under `stateDir` (all append-only snapshot tables,
  * every append idempotency-keyed by the caller's batch key):
  *  - `postings/`  (id, band, bkey) — each doc's LSH band keys
  *  - `arrays/`    (id, toks, n_tok) — sorted hashed-token arrays for
  *                 exact-Jaccard verification
  *  - `pairs/`     (id_a, id_b, n_common, jaccard) — the emission log
  *
  * Exactness: the union of per-increment emissions over any split of
  * the corpus equals the batch pipeline's verified pair set (uncapped),
  * because every pair is emitted exactly once — at the increment that
  * ingests its LATER document (the earlier side is then in state or in
  * the same batch; both-old pairs can never re-form since the probe
  * side is always the new postings). Spec-pinned in
  * IncrementalDedupSpec, including increment-order invariance.
  *
  * Bucket cap: `maxBucket` applies to the bucket's TOTAL size as of the
  * emitting increment (cap-at-ingest). A bucket that later grows past
  * the cap stops emitting new pairs but cannot retract old ones — the
  * streaming-natural semantics; batch `lshCandidates` instead drops
  * such buckets retroactively, so capped incremental and capped batch
  * agree exactly iff no bucket crosses the cap mid-stream (also
  * spec-pinned). Dropped buckets are observable via
  * [[Dedup.lshDroppedBuckets]] over the postings state.
  *
  * Crash consistency: the three appends share one idempotency key and
  * every derived frame is computed from the DISTINCT union of state and
  * increment, so a retry after a crash between appends no-ops the
  * completed ones, reproduces the identical pair set (state that
  * already absorbed this increment's postings dedupes against the
  * recomputed increment), and completes the rest — the
  * [[Sketches]]/[[graft.kg.Pipeline]] append-only discipline.
  * PRECONDITION: a crashed increment must be retried to completion
  * BEFORE the next increment ingests (exactly the ordering Structured
  * Streaming's foreachBatch provides). An out-of-order retry — batch
  * i+1 ingested between batch i's crash and its retry — would re-form
  * the i×(i+1) pairs a completed i+1 already emitted, because the
  * retry's probe joins a state that now also holds i+1's postings.
  * This precondition is ENFORCED, not just documented: every update
  * first audits the three tables' committed-key histories
  * ([[requireInOrderKey]]) and fails loudly both at the violating
  * ingest (a new key arriving while a prior key is only partially
  * committed) and at the too-late retry (a key that is committed
  * somewhere but no longer the newest) — the emission log can never
  * silently absorb duplicates.
  */
object IncrementalDedup {

  final case class LshConfig(k: Int = 8, rowsPerBand: Int = 2,
      threshold: Double = 0.5, minTokenLen: Int = 1, maxBucket: Int = 1000)

  private def postingsDir(stateDir: String) = s"$stateDir/postings"
  private def arraysDir(stateDir: String) = s"$stateDir/arrays"
  private def pairsDir(stateDir: String) = s"$stateDir/pairs"

  private def tableOrEmpty(spark: SparkSession, dir: String,
      empty: => DataFrame): DataFrame =
    if (SnapshotTable.currentSnapshot(dir) > 0) SnapshotTable.read(spark, dir)
    else empty

  /** Newest nonempty idempotency key committed to a state table —
    * compaction ("replace") snapshots carry no key and are skipped, so
    * quiesced maintenance between increments never masks the last
    * ingest. The walk reads O(snapshots-since-last-key) tiny metadata
    * JSONs, which is 0–1 steps on the happy path.
    */
  private def latestCommittedKey(dir: String): Option[String] = {
    var s = SnapshotTable.currentSnapshot(dir)
    while (s > 0) {
      val k = SnapshotTable.committedKey(dir, s)
      if (k.isDefined) return k
      s -= 1
    }
    None
  }

  /** Enforce the in-order crash-retry precondition across a family's
    * state tables (the appends share one key, in `dirs` order):
    *
    *  - key already committed in some table (a RETRY): it must still be
    *    that table's NEWEST key — a retry arriving after a later batch
    *    ingested would re-emit the crashed batch's cross pairs into the
    *    emission log, because its probe would join state that now also
    *    holds the later batch's postings;
    *  - brand-new key (a fresh INGEST): all tables must agree on their
    *    newest key — disagreement means a prior increment crashed
    *    between appends and must be retried to completion first.
    *
    * Violations throw IllegalStateException BEFORE any append, so the
    * exactly-once emission guarantee cannot be silently corrupted.
    */
  private def requireInOrderKey(dirs: Seq[String], key: String): Unit = {
    val latest = dirs.map(latestCommittedKey)
    val committedSomewhere =
      dirs.exists(d => SnapshotTable.snapshotWithKey(d, key).isDefined)
    if (committedSomewhere) {
      dirs.zip(latest).foreach { case (d, lk) =>
        if (SnapshotTable.snapshotWithKey(d, key).isDefined && !lk.contains(key))
          throw new IllegalStateException(
            s"out-of-order retry of increment '$key': $d has since committed " +
              s"'${lk.getOrElse("")}' — a late retry would re-emit pairs the " +
              "newer increment already logged; state must be restored or the " +
              "increment abandoned")
      }
    } else {
      val distinctLatest = latest.distinct
      if (distinctLatest.size > 1)
        throw new IllegalStateException(
          s"cannot ingest new increment '$key': a prior increment is only " +
            s"partially committed (per-table newest keys: " +
            dirs.zip(latest).map { case (d, lk) =>
              s"${d.split('/').last}=${lk.getOrElse("<none>")}"
            }.mkString(", ") +
            ") — retry the crashed increment to completion first")
    }
  }

  /** Ingest one document batch: emit the verified near-dup pairs that
    * involve it and append postings/arrays/pairs state. Returns the
    * emitted pairs (deterministic — a replay of a fully-committed key
    * recomputes the identical frame while every append no-ops).
    * Precondition: doc ids are unique across increments (the snapshot
    * pipeline convention); re-ingesting an id would re-pair it.
    */
  def update(spark: SparkSession, stateDir: String, docs: DataFrame,
      idCol: String, textCol: String, idempotencyKey: String,
      cfg: LshConfig = LshConfig()): DataFrame = {
    requireInOrderKey(
      Seq(postingsDir(stateDir), arraysDir(stateDir), pairsDir(stateDir)),
      idempotencyKey)
    // arrays AND postings derive from the zero-shuffle per-row array
    // construction (Dedup.docTokenArraysHashed): the prior explode →
    // distinct → two groupBy(id) chain shuffled the increment's token
    // fan-out three times before any state was touched; both frames now
    // materialize straight out of the scan stage
    val newArrays = Dedup
      .docTokenArraysHashed(docs, idCol, textCol, cfg.minTokenLen)
      .localCheckpoint(true) // referenced by verify join + append
    val newPostings = Dedup
      .lshBands(Dedup.minhashSignaturesFromArrays(newArrays, cfg.k), cfg.k,
        cfg.rowsPerBand)
      .localCheckpoint(true) // referenced by sizing, probe AND append

    import spark.implicits._
    val oldPostings = tableOrEmpty(spark, postingsDir(stateDir),
      Seq.empty[(Long, Int, String)].toDF("id", "band", "bkey"))
    // union WITHOUT a global distinct: a corpus-wide dedupe shuffle per
    // increment would dominate the whole update at scale. Duplicates
    // can only exist after a crashed prior attempt already appended
    // this increment's postings (identical rows); candidate pairs
    // collapse them in their own pair-scale distinct, and bucket sizing
    // counts DISTINCT ids so inflated counts cannot push a bucket over
    // the cap spuriously. The state side is also deliberately not
    // checkpointed — consumers re-scan the parquet-backed table instead
    // of pinning corpus-scale blocks in executor memory
    val unionPostings = oldPostings.select(col("id"), col("band"), col("bkey"))
      .unionByName(newPostings)

    // cap filtering via the OVER-cap set, not the kept set: a bucket
    // holds > cap members to be hot, so there are at most
    // |postings|/cap hot buckets — a tiny, BROADCASTABLE frame — while
    // the kept-key set is bucket-dimension (corpus-order) sized. The
    // broadcast anti-joins below filter both sides map-side; pinning
    // the hot set makes the sizing aggregate run once, not per consumer
    val hotBuckets =
      if (cfg.maxBucket <= 0) None
      else Some(unionPostings
        // only buckets the NEW batch touches can emit pairs, so sizing
        // restricts to them first (increment-proportional aggregate,
        // not a corpus-wide one — "never rescan the corpus" includes
        // the sizing pass)
        .join(newPostings.select(col("band"), col("bkey")).distinct(),
          Seq("band", "bkey"), "left_semi")
        .groupBy(col("band"), col("bkey"))
        .agg(countDistinct(col("id")).as("_bsz"))
        .filter(col("_bsz") > cfg.maxBucket)
        .select(col("band"), col("bkey"))
        .localCheckpoint(true))
    val kept = hotBuckets
      .map(h => unionPostings.join(broadcast(h), Seq("band", "bkey"),
        "left_anti"))
      .getOrElse(unionPostings)
    // probe = the increment's postings only: every candidate involves a
    // new doc, so both-old pairs (already emitted) can never re-form
    val probe = hotBuckets
      .map(h => newPostings.join(broadcast(h), Seq("band", "bkey"),
        "left_anti"))
      .getOrElse(newPostings)
    val cands = kept.as("l")
      .join(probe.as("r"),
        col("l.band") === col("r.band") && col("l.bkey") === col("r.bkey") &&
          col("l.id") =!= col("r.id"))
      .select(least(col("l.id"), col("r.id")).as("id_a"),
        greatest(col("l.id"), col("r.id")).as("id_b"))
      .distinct()

    // crash-retry dedupe via an ids-only anti-join (column-pruned scan
    // of the state table), NOT a groupBy over the corpus-scale arrays —
    // on the happy path it removes nothing, after a partially-committed
    // attempt it removes the whole (already-appended) increment
    val oldArrays = tableOrEmpty(spark, arraysDir(stateDir),
      newArrays.limit(0))
    val arrays = oldArrays.unionByName(
      newArrays.join(oldArrays.select(col("id")), Seq("id"), "left_anti"))
    val verified = Dedup.jaccardVerifyArrays(cands, arrays)
      .filter(col("jaccard") >= cfg.threshold)
      .select(col("id_a"), col("id_b"), col("n_common"),
        round(col("jaccard"), 6).as("jaccard"))
      .localCheckpoint(true) // referenced by the append AND the return

    // the three appends target disjoint tables and every input frame is
    // already an eagerly-materialized checkpoint, so they commit
    // CONCURRENTLY (guide §2.6). Ordering among them was never
    // load-bearing: requireInOrderKey's recovery audit and the
    // union-dedupe derivations accept ANY committed subset after a
    // crash (the retry recomputes identical frames; completed appends
    // no-op on the shared key, missing ones complete) — exactly the
    // prefix-crash discipline, generalized.
    Par.run(
      "postings" -> (() => { SnapshotTable.write(newPostings,
        postingsDir(stateDir), mode = "append",
        idempotencyKey = idempotencyKey); () }),
      "arrays" -> (() => { SnapshotTable.write(newArrays,
        arraysDir(stateDir), mode = "append",
        idempotencyKey = idempotencyKey); () }),
      "pairs" -> (() => { SnapshotTable.write(verified,
        pairsDir(stateDir), mode = "append",
        idempotencyKey = idempotencyKey); () }))
    verified
  }

  /** All pairs emitted so far — the accumulated emission log. */
  def pairsFromTable(spark: SparkSession, stateDir: String): DataFrame =
    SnapshotTable.read(spark, pairsDir(stateDir))

  /** Table maintenance: rewrite each state table's many per-increment
    * files into `numFiles` (logical content unchanged — the
    * [[SnapshotTable.compact]] "replace" snapshot, time travel intact).
    * Streaming ingest appends a handful of files per batch; unmaintained,
    * the per-increment state scans degrade to millions of tiny reads.
    * Quiesced maintenance like the sketch compactions: run it between
    * updates, not concurrently with one.
    */
  def compactState(spark: SparkSession, stateDir: String,
      numFiles: Int = 4): Unit =
    Seq(postingsDir(stateDir), arraysDir(stateDir), pairsDir(stateDir))
      .foreach { d =>
        if (SnapshotTable.currentSnapshot(d) > 0)
          SnapshotTable.compact(spark, d, numFiles)
      }

  // ---- embedding (sign-LSH) twin --------------------------------------

  final case class VecLshConfig(planes: Int = 4, bands: Int = 2,
      threshold: Double = 0.5)

  private def vecPostingsDir(stateDir: String) = s"$stateDir/vec_postings"
  private def vectorsDir(stateDir: String) = s"$stateDir/vectors"
  private def vecPairsDir(stateDir: String) = s"$stateDir/vec_pairs"

  /** The embedding twin of [[update]]: incremental banded sign-LSH
    * near-dup maintenance (the [[Similarity.signLshPairs]] semantics —
    * same deterministic prime-plane family, exact cosine verify).
    * State: `vec_postings/` (id, band, cell), `vectors/` (id, v, n),
    * `vec_pairs/` emission log; same distinct-union derivation, same
    * one-key-three-appends crash discipline, same exactly-once
    * emission-at-the-later-vector guarantee as the MinHash path.
    * Sign-LSH cells are data-independent (2^planes of them), so there
    * is no bucket-cap policy to diverge on: incremental union == batch
    * EXACTLY, spec-pinned.
    */
  def updateVectors(spark: SparkSession, stateDir: String, vecs: DataFrame,
      idCol: String, vecCol: String, idempotencyKey: String,
      cfg: VecLshConfig = VecLshConfig()): DataFrame = {
    requireInOrderKey(
      Seq(vecPostingsDir(stateDir), vectorsDir(stateDir),
        vecPairsDir(stateDir)),
      idempotencyKey)
    // postings come from the SAME construction the batch path uses
    // (Similarity.bandedSignPostings) — the plane-family agreement is
    // structural, not a copy kept in sync by convention
    val newPostings = Similarity
      .bandedSignPostings(vecs, idCol, vecCol, cfg.planes, cfg.bands)
      .localCheckpoint(true) // referenced by probe, union AND append
    val newVectors = vecs.select(col(idCol).as("id"), col(vecCol).as("v"),
        Similarity.norm(col(vecCol)).as("n"))
      .localCheckpoint(true) // referenced by verify join + append

    import spark.implicits._
    val oldPostings = tableOrEmpty(spark, vecPostingsDir(stateDir),
      Seq.empty[(Long, Int, Long)].toDF("id", "band", "cell"))
    // no global distinct — crash-retry duplicates are identical rows
    // and the pair-scale cands.distinct() collapses them (cells are
    // data-independent, so there is no size-based cap to inflate)
    val unionPostings = oldPostings.select(col("id"), col("band"), col("cell"))
      .unionByName(newPostings)
    val cands = unionPostings.as("l")
      .join(newPostings.as("r"),
        col("l.band") === col("r.band") && col("l.cell") === col("r.cell") &&
          col("l.id") =!= col("r.id"))
      .select(least(col("l.id"), col("r.id")).as("id_a"),
        greatest(col("l.id"), col("r.id")).as("id_b"))
      .distinct()

    val oldVectors = tableOrEmpty(spark, vectorsDir(stateDir),
      newVectors.limit(0))
    // same ids-only anti-join dedupe as the token-array state
    val arrs = oldVectors.unionByName(
      newVectors.join(oldVectors.select(col("id")), Seq("id"), "left_anti"))
    // shared verify arm (drops zero-norm vectors — NaN cosine would
    // otherwise pass any threshold under Spark's NaN ordering)
    val verified = Similarity.cosineVerifyArrays(cands, arrs, cfg.threshold)
      .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cos"))
      .localCheckpoint(true) // referenced by the append AND the return

    // concurrent disjoint-table appends — same discipline as [[update]]
    Par.run(
      "vecPostings" -> (() => { SnapshotTable.write(newPostings,
        vecPostingsDir(stateDir), mode = "append",
        idempotencyKey = idempotencyKey); () }),
      "vectors" -> (() => { SnapshotTable.write(newVectors,
        vectorsDir(stateDir), mode = "append",
        idempotencyKey = idempotencyKey); () }),
      "vecPairs" -> (() => { SnapshotTable.write(verified,
        vecPairsDir(stateDir), mode = "append",
        idempotencyKey = idempotencyKey); () }))
    verified
  }

  /** All embedding pairs emitted so far. */
  def vecPairsFromTable(spark: SparkSession, stateDir: String): DataFrame =
    SnapshotTable.read(spark, vecPairsDir(stateDir))

}
