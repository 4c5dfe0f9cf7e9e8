package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable cardinality sketches (engine-portable arithmetic only).
  *
  * [[hllDistinct]] is a classic 64-register HyperLogLog over 60-bit
  * md5-derived hashes: bucket = h%64, register = MAX rho(h>>6) where
  * rho = leading-zero count within the 54 remaining bits + 1, computed
  * exactly as 55 − length(bin(w)) (both Spark's and DuckDB's bin() are
  * unpadded, so no libm log2 at power-of-two boundaries). The whole
  * sketch is a (group, bucket) MAX aggregate — map-side combinable,
  * mergeable across partitions/increments, 64 small ints of state per
  * group: the shape that survives 100 TB, where an exact distinct
  * count shuffles the full key universe.
  */
object Sketches {

  val HllRegisters = 64

  /** rho for HLL over the top 54 bits of a 60-bit hash. */
  def hllRho(w: Column): Column =
    when(w === 0L, lit(55L)).otherwise(lit(55L) - length(bin(w)))

  /** Sparse register table (groupCol, b, mreg) from (groupCol, hashCol)
    * rows — duplicates are harmless, MAX is idempotent. This is the
    * sketch STATE: registers from disjoint (or overlapping) inputs
    * merge by MAX, so the table supports exact incremental maintenance
    * (merging per-increment registers gives bit-identical estimates to
    * a from-scratch build over the union).
    */
  def hllRegisters(hashed: DataFrame, groupCol: String,
      hashCol: String): DataFrame =
    hashed
      .select(col(groupCol), pmod(col(hashCol), lit(HllRegisters.toLong)).as("b"),
        shiftright(col(hashCol), 6).as("w"))
      .withColumn("rho", hllRho(col("w")))
      .groupBy(col(groupCol), col("b"))
      .agg(max(col("rho")).as("mreg"))

  /** MAX-merge two register tables (either side may be missing groups
    * or buckets the other has).
    */
  def mergeRegisters(a: DataFrame, b: DataFrame, groupCol: String): DataFrame =
    a.unionByName(b)
      .groupBy(col(groupCol), col("b"))
      .agg(max(col("mreg")).as("mreg"))

  /** Estimate from a register table: HLL raw formula with the standard
    * linear-counting small-range arm, rounded to 3 dp (the only
    * cross-engine float divergence is register summation order plus a
    * ≤1-ulp ln() in the small-range arm). Returns
    * (groupCol, est_distinct).
    */
  def hllEstimate(regs: DataFrame, groupCol: String): DataFrame = {
    val m = HllRegisters
    // alpha_m as the same IEEE expression the SQL oracle evaluates
    val alpha = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(m.toDouble))
    regs.groupBy(col(groupCol))
      .agg(sum(pow(lit(2.0), -col("mreg"))).as("zocc"),
        count(lit(1)).as("occ"))
      .withColumn("z", col("zocc") + (lit(m.toLong) - col("occ")).cast("double"))
      .withColumn("raw", alpha * lit((m * m).toDouble) / col("z"))
      .withColumn("v", lit(m.toLong) - col("occ"))
      .withColumn("est_distinct", round(
        when(col("v") > 0 && col("raw") <= lit(2.5 * m),
          lit(m.toDouble) * log(lit(m.toDouble) / col("v").cast("double")))
          .otherwise(col("raw")), 3))
      .select(col(groupCol), col("est_distinct"))
  }

  /** One-shot per-group HLL estimate. */
  def hllDistinct(hashed: DataFrame, groupCol: String,
      hashCol: String): DataFrame =
    hllEstimate(hllRegisters(hashed, groupCol, hashCol), groupCol)

  /** Incremental register maintenance over a [[graft.sources.SnapshotTable]]:
    * APPEND the increment's registers as rows; the authoritative state
    * is the read-side MAX re-aggregation ([[registersFromTable]]).
    *
    * Append-only is what makes this lossless and crash-safe with no
    * read-modify-write cycle at all: the table's append CAS re-unions
    * against whatever parent actually won, so two concurrent
    * increments both land (an overwrite formulation committed from a
    * stale read silently drops the interleaved writer's registers —
    * an earlier draft here did exactly that); a crash anywhere leaves
    * at worst an unappended increment whose keyed replay appends it.
    * Per-increment cost is the increment's own aggregation — prior
    * state is never read. Rows grow by ≤ groups×64 per increment
    * until [[compactRegisterTable]] collapses them. The idempotency
    * key makes replayed increments (a crashed-then-retried
    * micro-batch) no-ops, so a streaming foreachBatch can pass its
    * batchId directly. Returns the committed snapshot id.
    */
  def updateRegisterTable(tableDir: String, newHashed: DataFrame,
      groupCol: String, hashCol: String, idempotencyKey: String = ""): Long = {
    import graft.sources.SnapshotTable
    val delta = hllRegisters(newHashed, groupCol, hashCol)
    SnapshotTable.write(delta.coalesce(1), tableDir, mode = "append",
      idempotencyKey = idempotencyKey)
  }

  /** The shape every mergeable sketch state shares: cell key columns,
    * one value column, and the fold that collapses duplicate cell rows
    * (MAX for HLL registers, SUM for count-min counters). All the
    * append-only snapshot-table maintenance below — re-aggregate read,
    * quiesced compaction, torn-compaction heal — is written once
    * against this shape.
    */
  private final case class MergeableState(keyCols: Seq[String],
      valCol: String, fold: Column => Column, compactKeyPrefix: String)

  private val HllState =
    (g: String) => MergeableState(Seq(g, "b"), "mreg", max, "hll-compact@")
  private val CmsState =
    MergeableState(Seq("j", "b"), "cnt", sum, "cms-compact@")

  private def foldState(st: MergeableState, df: DataFrame): DataFrame =
    df.groupBy(st.keyCols.map(col): _*)
      .agg(st.fold(col(st.valCol)).as(st.valCol))

  private def mergeState(st: MergeableState, a: DataFrame, b: DataFrame): DataFrame =
    foldState(st, a.unionByName(b))

  private def stateFromTable(st: MergeableState,
      spark: org.apache.spark.sql.SparkSession, tableDir: String,
      snapshot: Option[Long]): DataFrame = {
    if (snapshot.isEmpty) repairTornCompaction(st, spark, tableDir)
    foldState(st, graft.sources.SnapshotTable.read(spark, tableDir, snapshot))
  }

  /** Current authoritative registers from a persisted table: MAX
    * re-aggregation over the appended increment rows (idempotent —
    * works identically on compacted and uncompacted tables). Reading
    * the head (no explicit snapshot) first verifies — and repairs —
    * any torn compaction ([[repairCompactionIfTorn]]); a time-travel
    * read returns that snapshot's content as committed.
    */
  def registersFromTable(spark: org.apache.spark.sql.SparkSession,
      tableDir: String, groupCol: String,
      snapshot: Option[Long] = None): DataFrame =
    stateFromTable(HllState(groupCol), spark, tableDir, snapshot)

  /** Detect and heal a torn compaction. Every compaction overwrite
    * records, in its idempotency key, the base snapshot whose content
    * it folded through; snapshot ids are sequential, so a consistent
    * compaction commits at exactly base+1. A head overwrite at
    * base+1+k (k>0) means k appends interleaved with the compaction
    * and a crash stopped the in-line conflict repair — those appends'
    * register rows are missing from the head. The heal re-folds them
    * (readDelta over (base, head-1]) and overwrites, keyed by the torn
    * head's id so concurrent healers coalesce to one repair snapshot.
    * O(one metadata read) when consistent; called on every head read.
    *
    * Requires the interleaved snapshots to still be retained —
    * expireSnapshots between a torn compaction and its heal would
    * discard the only copy of those rows, so expiry of this table
    * should go through a healed read first (estimate/registers calls
    * do this implicitly).
    */
  def repairCompactionIfTorn(spark: org.apache.spark.sql.SparkSession,
      tableDir: String, groupCol: String): Unit =
    repairTornCompaction(HllState(groupCol), spark, tableDir)

  private def repairTornCompaction(st: MergeableState,
      spark: org.apache.spark.sql.SparkSession, tableDir: String): Unit = {
    import graft.sources.SnapshotTable
    var guard = 0
    while (guard < 32) {
      guard += 1
      val head = SnapshotTable.currentSnapshot(tableDir)
      if (head <= 0) return
      val tornBase = SnapshotTable.committedKey(tableDir, head)
        .filter(_.startsWith(st.compactKeyPrefix))
        .flatMap(k => scala.util.Try(k.stripPrefix(st.compactKeyPrefix).toLong).toOption)
        .filter(base => head > base + 1)
      if (tornBase.isEmpty) return
      val base = tornBase.get
      // the heal needs the interleaved snapshots' rows — if
      // expireSnapshots already discarded them the loss is permanent
      // (exactly the ordering the compaction contract warns against).
      // Degrade instead of bricking every subsequent read with a failed
      // time-travel: seal the surviving head content under a
      // consistent compaction key (committed == base' + 1) so the table
      // stays readable and the tear stops re-triggering.
      val retained = SnapshotTable.history(tableDir).map(_.id).toSet
      val healable = ((base + 1) until head).forall(retained.contains)
      if (!healable)
        System.err.println(
          s"repairTornCompaction: interleaved snapshots of $tableDir " +
            s"(${base + 1}..${head - 1}) already expired — torn rows lost, " +
            "sealing the surviving head")
      val headState = foldState(st,
        SnapshotTable.read(spark, tableDir, Some(head)))
      val missed =
        if (healable) SnapshotTable.readDelta(spark, tableDir, base, Some(head - 1))
        else headState.limit(0)
      val repaired = mergeState(st, headState, missed)
      SnapshotTable.write(repaired.coalesce(1), tableDir, mode = "overwrite",
        idempotencyKey = s"${st.compactKeyPrefix}$head")
      // loop: the repair itself may have raced another append — the
      // next iteration re-checks the new head and heals again if torn
    }
    throw new IllegalStateException(
      s"repairTornCompaction: still torn after $guard heals on $tableDir")
  }

  /** Collapse the appended increment rows into one registers-sized
    * overwrite snapshot. MAINTENANCE OPERATION — run it while ingest
    * is quiesced (the same single-writer contract as any rewrite
    * racing appends, cf. Iceberg's rewrite guidance): an overwrite
    * committed concurrently with an append would drop that append's
    * rows. Two safety nets close the gap:
    *
    *  1. in-line conflict repair: sequential snapshot ids mean
    *     committed == base+1 proves no interleaving; otherwise the
    *     missed delta rows are folded back in and re-committed;
    *  2. every overwrite's idempotency key records the base it folded
    *     through, so a crash BETWEEN an understated overwrite and its
    *     repair is detected — and healed — by the next head read
    *     ([[repairCompactionIfTorn]]); the head can no longer stay
    *     silently understated.
    */
  def compactRegisterTable(spark: org.apache.spark.sql.SparkSession,
      tableDir: String, groupCol: String): Long =
    compactStateTable(HllState(groupCol), spark, tableDir)

  private def compactStateTable(st: MergeableState,
      spark: org.apache.spark.sql.SparkSession, tableDir: String): Long = {
    import graft.sources.SnapshotTable
    repairTornCompaction(st, spark, tableDir)
    var base = SnapshotTable.currentSnapshot(tableDir)
    var state = stateFromTable(st, spark, tableDir, Some(base))
    var attempt = 0
    while (true) {
      val committed = SnapshotTable.write(state.coalesce(1), tableDir,
        mode = "overwrite", idempotencyKey = s"${st.compactKeyPrefix}$base")
      if (committed == base + 1) return committed
      // interleaved append(s): their rows are exactly the files added
      // after `base` and before our overwrite — fold them in and retry
      attempt += 1
      require(attempt < 32,
        s"compactStateTable: gave up after $attempt conflict repairs")
      state = mergeState(st, state,
        SnapshotTable.readDelta(spark, tableDir, base, Some(committed - 1)))
      base = committed
    }
    -1L // unreachable
  }

  /** Estimate straight from a persisted register table. */
  def estimateFromTable(spark: org.apache.spark.sql.SparkSession,
      tableDir: String, groupCol: String): DataFrame =
    hllEstimate(registersFromTable(spark, tableDir, groupCol), groupCol)

  // ---- count-min --------------------------------------------------------

  val CmsDepth = 4
  val CmsWidth = 16384

  // The ONE bucket definition both the build and probe sides use —
  // same single-definition rule as Dedup.hash60: a salt or width
  // drifting between the two call sites would silently break the
  // one-sided est ≥ exact guarantee.
  private def cmsBucket(j: Int, key: Column): Column =
    pmod(Dedup.hash60(concat(lit(s"cms$j:"), key)), lit(CmsWidth.toLong))

  /** Count-min counter table (j, b, cnt) from per-key exact counts
    * (`keyCol`, `cntCol`): row j buckets the key by a j-salted md5.
    * Like the HLL registers this is pure SUM state — map-side
    * combinable, mergeable by addition, CmsDepth×CmsWidth cells
    * regardless of key cardinality. Building from pre-aggregated
    * counts instead of raw occurrences is equivalent (SUM is linear)
    * and one shuffle cheaper.
    */
  def cmsCounters(counts: DataFrame, keyCol: String,
      cntCol: String): DataFrame =
    counts
      .select(explode(array((0 until CmsDepth).map { j =>
        struct(lit(j).as("j"), cmsBucket(j, col(keyCol)).as("b"),
          col(cntCol).as("c"))
      }: _*)).as("e"))
      .select(col("e.j"), col("e.b"), col("e.c"))
      .groupBy(col("j"), col("b"))
      .agg(sum(col("c")).as("cnt"))

  /** Point-estimate counts for candidate keys from a counter table:
    * est(key) = MIN over rows j of counter(j, bucket_j(key)), where an
    * EMPTY bucket counts as 0 (left join + coalesce) — a key never fed
    * to the counters correctly estimates 0 instead of vanishing or
    * min-ing over only its occupied buckets. The classic one-sided
    * guarantee holds exactly: est ≥ true count, with overestimate only
    * on all-rows collisions.
    */
  def cmsEstimate(candidates: DataFrame, counters: DataFrame,
      keyCol: String): DataFrame = {
    val keyed = candidates
      .select(col("*"), explode(array((0 until CmsDepth).map { j =>
        struct(lit(j).as("j"), cmsBucket(j, col(keyCol)).as("b"))
      }: _*)).as("e"))
      .select(col(keyCol), col("e.j"), col("e.b"))
    keyed.join(broadcast(counters), Seq("j", "b"), "left")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }

  // ---- bloom filter -----------------------------------------------------

  val BloomBits = 16384
  val BloomK = 4

  // same single-definition rule as cmsBucket: build and probe must
  // derive bit positions identically (private[graft]: the snapshot
  // table's per-file bloom index builds its bits through this too)
  private[graft] def bloomBit(j: Int, key: Column): Column =
    pmod(Dedup.hash60(concat(lit(s"bloom$j:"), key)), lit(BloomBits.toLong))

  /** Driver-side twin of [[bloomBit]] over the string form of a value —
    * MUST stay formula-identical (15 hex chars of md5 as a long, pmod
    * BloomBits); the snapshot table's point-read probe computes its
    * positions here without a Spark job. Duplicate positions collapse.
    */
  private[graft] def bloomPositions(value: String): Seq[Long] = {
    (0 until BloomK).map { j =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"bloom$j:$value".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      math.floorMod(java.lang.Long.parseLong(hex.take(15), 16),
        BloomBits.toLong)
    }.distinct
  }

  /** Bloom SET-membership state: the distinct bit positions set by the
    * keys — sparse (bit, one) rows, OR-mergeable (union + distinct),
    * ≤ BloomBits rows regardless of key cardinality. The third
    * mergeable-sketch shape next to the HLL MAX-registers and the CMS
    * SUM-counters, sharing the same append-only maintenance core.
    */
  def bloomBitsOf(keys: DataFrame, keyCol: String): DataFrame =
    keys
      .select(explode(array((0 until BloomK).map(j =>
        bloomBit(j, col(keyCol))): _*)).as("bit"))
      .distinct()
      .withColumn("one", lit(1L))

  /** Membership probe: might_contain = 1 iff ALL BloomK bit positions
    * are set (an unset position counts 0 via left join + coalesce).
    * Classic one-sided guarantee: no false negatives ever; false
    * positives only on all-positions collisions.
    */
  def bloomMightContain(candidates: DataFrame, bits: DataFrame,
      keyCol: String): DataFrame = {
    val keyed = candidates
      .select(col(keyCol), explode(array((0 until BloomK).map(j =>
        bloomBit(j, col(keyCol))): _*)).as("bit"))
    keyed.join(broadcast(bits), Seq("bit"), "left")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("one"), lit(0L))).as("might_contain"))
  }

  private val BloomState =
    MergeableState(Seq("bit"), "one", max, "bloom-compact@")

  /** Incremental bloom maintenance — append the increment's own bit
    * rows (OR is idempotent AND mergeable, so the protocol is the same
    * as the HLL/CMS twins: never read prior state, keyed replays
    * no-op, read-side distinct authoritative, quiesced compaction with
    * torn-heal).
    */
  def updateBloomTable(tableDir: String, newKeys: DataFrame,
      keyCol: String, idempotencyKey: String = ""): Long =
    graft.sources.SnapshotTable.write(
      bloomBitsOf(newKeys, keyCol).coalesce(1), tableDir,
      mode = "append", idempotencyKey = idempotencyKey)

  def bloomBitsFromTable(spark: org.apache.spark.sql.SparkSession,
      tableDir: String, snapshot: Option[Long] = None): DataFrame =
    stateFromTable(BloomState, spark, tableDir, snapshot)

  def compactBloomTable(spark: org.apache.spark.sql.SparkSession,
      tableDir: String): Long =
    compactStateTable(BloomState, spark, tableDir)

  /** Incremental count-min maintenance over a snapshot table — the SUM
    * twin of [[updateRegisterTable]] (counters are addition-mergeable,
    * so the same append-only protocol applies verbatim: append the
    * increment's own counters, never read prior state; keyed replays
    * no-op; read-side SUM re-aggregation is authoritative; compaction
    * is a quiesced overwrite with the same base-recording key and
    * torn-compaction heal). Pass per-key exact counts for the NEW
    * increment only.
    */
  def updateCmsTable(tableDir: String, newCounts: DataFrame,
      keyCol: String, cntCol: String, idempotencyKey: String = ""): Long = {
    val delta = cmsCounters(newCounts, keyCol, cntCol)
    graft.sources.SnapshotTable.write(delta.coalesce(1), tableDir,
      mode = "append", idempotencyKey = idempotencyKey)
  }

  /** Authoritative counters from a persisted table (SUM re-aggregate;
    * heals torn compactions on head reads).
    */
  def cmsCountersFromTable(spark: org.apache.spark.sql.SparkSession,
      tableDir: String, snapshot: Option[Long] = None): DataFrame =
    stateFromTable(CmsState, spark, tableDir, snapshot)

  /** Quiesced compaction of an incremental counter table. */
  def compactCmsTable(spark: org.apache.spark.sql.SparkSession,
      tableDir: String): Long =
    compactStateTable(CmsState, spark, tableDir)

  /** Point estimates for candidate keys straight from a persisted
    * incremental counter table.
    */
  def cmsEstimateFromTable(spark: org.apache.spark.sql.SparkSession,
      tableDir: String, candidates: DataFrame, keyCol: String): DataFrame =
    cmsEstimate(candidates, cmsCountersFromTable(spark, tableDir), keyCol)

  // ---- quantile (log-histogram) sketch -----------------------------------

  /** Mergeable approximate-quantile sketch — the fourth member of the
    * sketch family (HLL MAX-registers, CMS SUM-counters, Bloom OR-bits):
    * a base-2 LOG-HISTOGRAM with 16 sub-buckets per octave over
    * NON-NEGATIVE integers, built from INTEGER arithmetic only
    * (length(bin(v)) + shifts — the hllRho discipline: no libm log whose
    * 1-ulp drift could flip a boundary value's bucket cross-engine).
    *
    * Bucket key (monotone in v, so rank order is preserved):
    *  - v < 32            → qb = v                   (exact small arm)
    *  - v ≥ 32            → qb = 32 + (bitlen(v)−6)·16 + (v >> (bitlen−5) − 16)
    * Lower bound of bucket qb ≥ 32: (16 + (qb−32)%16) << ((qb−32)/16 + 1);
    * bucket width = low/(16+sub) ≤ low/16, so serving the LOWER BOUND at
    * the target rank (quantile_disc semantics) guarantees
    * est ≤ exact ≤ est + est/16 — ≤ 6.25% one-sided relative error.
    *
    * State is (qb, cnt) SUM cells: ≤ 32 + 59·16 = 976 rows for the full
    * 63-bit non-negative range REGARDLESS of cardinality — map-side
    * combinable, addition-mergeable across partitions/increments, and it
    * plugs into the same [[MergeableState]] append-only maintenance core
    * (keyed appends, quiesced compaction, torn heal) as the other three
    * sketches. The exact-quantile companion
    * (RelationalQueries w5/w6) sorts the full distinct-value histogram;
    * at 100 TB this sketch replaces that sort with a ≤976-row cumulative
    * pass.
    */
  def qsketchCells(values: DataFrame, valCol: String): DataFrame =
    values
      .select(col(valCol).cast("long").as("v"))
      .withColumn("bl", length(bin(col("v"))).cast("long"))
      .withColumn("qb",
        when(col("v") < 32, col("v"))
          .otherwise(lit(32L) + (col("bl") - 6L) * 16L +
            expr("shiftright(v, cast(bl - 5 as int)) - 16")))
      .groupBy(col("qb")).agg(count(lit(1)).as("cnt"))

  /** [[qsketchCells]] over a pre-aggregated (value, count) histogram:
    * identical cells with the weights summed — a caller that already
    * built the exact distinct-value histogram derives the sketch cells
    * from it (dimension-sized input) instead of re-scanning and
    * re-shuffling the corpus a second time.
    */
  def qsketchCellsFromHist(hist: DataFrame, valCol: String,
      cntCol: String): DataFrame =
    hist
      .select(col(valCol).cast("long").as("v"), col(cntCol).as("_w"))
      .withColumn("bl", length(bin(col("v"))).cast("long"))
      .withColumn("qb",
        when(col("v") < 32, col("v"))
          .otherwise(lit(32L) + (col("bl") - 6L) * 16L +
            expr("shiftright(v, cast(bl - 5 as int)) - 16")))
      .groupBy(col("qb")).agg(sum(col("_w")).as("cnt"))

  /** Reconstruct a bucket's lower bound from its key (inverse of the
    * [[qsketchCells]] bucketing at the bucket's left edge).
    */
  def qsketchLow(qbCol: String): Column =
    when(col(qbCol) < 32, col(qbCol))
      .otherwise(expr(
        s"shiftleft(16 + ($qbCol - 32) % 16, cast(($qbCol - 32) div 16 + 1 as int))"))

  /** Discrete-quantile rank selection over a (keyCol, cnt) histogram:
    * for each integer percentile pct, the smallest key whose cumulative
    * count reaches rank = (n·pct + 99) div 100 (the ceiling of
    * n·pct/100 — the w6_quantiles INTEGER rank arithmetic: no float
    * rank to drift between engines). Shared by the sketch estimate
    * (≤976 cells) and the exact rider (distinct-value histogram) so
    * both sides select ranks identically. The cumulative window is a
    * single partition BY CONSTRUCTION over the histogram, never the
    * data — fine for the sketch, and the exact rider's sort cost is
    * exactly why the sketch exists.
    */
  def quantileDisc(cells: DataFrame, keyCol: String,
      pcts: Seq[Long]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cum = cells.withColumn("cum", sum(col("cnt")).over(
      Window.orderBy(col(keyCol))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val tot = cells.agg(sum(col("cnt")).as("n"))
    val spark = cells.sparkSession
    import spark.implicits._
    val ranks = pcts.toDF("pct").crossJoin(broadcast(tot))
      .withColumn("rank", expr("(n * pct + 99) div 100"))
    ranks.join(cum, col("cum") >= col("rank"))
      .groupBy(col("pct"))
      .agg(min(col(keyCol)).as(keyCol))
  }

  /** Quantile estimates straight from sketch cells: (pct, est) where
    * est is the target-rank bucket's lower bound.
    */
  def qsketchQuantiles(cells: DataFrame, pcts: Seq[Long]): DataFrame =
    quantileDisc(cells, "qb", pcts)
      .select(col("pct"), qsketchLow("qb").as("est"))

  private val QskState =
    MergeableState(Seq("qb"), "cnt", sum, "qsk-compact@")

  /** Incremental quantile-sketch maintenance — append the increment's
    * own (qb, cnt) cells; counts are addition-mergeable, so the
    * protocol is the CMS one verbatim (never read prior state, keyed
    * replays no-op, read-side SUM re-aggregation authoritative,
    * quiesced compaction with torn heal).
    */
  def updateQuantileTable(tableDir: String, newValues: DataFrame,
      valCol: String, idempotencyKey: String = ""): Long =
    graft.sources.SnapshotTable.write(
      qsketchCells(newValues, valCol).coalesce(1), tableDir,
      mode = "append", idempotencyKey = idempotencyKey)

  def quantileCellsFromTable(spark: org.apache.spark.sql.SparkSession,
      tableDir: String, snapshot: Option[Long] = None): DataFrame =
    stateFromTable(QskState, spark, tableDir, snapshot)

  def compactQuantileTable(spark: org.apache.spark.sql.SparkSession,
      tableDir: String): Long =
    compactStateTable(QskState, spark, tableDir)
}
