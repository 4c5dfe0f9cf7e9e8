package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-salting as a library transform (north rule: "broadcast-then-
  * salted-shuffle entity-linking"; SURVEY §4.2).
  *
  * For a shuffle equi-join where the probe side has Zipfian hot keys
  * (hub taxa like the datagen hub taxon 0), the hot keys are exploded
  * into `salts` sub-keys on the big side while the build side replicates
  * each hot key `salts` times — the shuffle then spreads one hot key
  * over `salts` reducers. Cold keys keep salt 0 and the build side one
  * copy, so the join result is exactly the unsalted join's.
  *
  * AQE's skew-join handles sort-merge skew at runtime
  * (spark.sql.adaptive.skewJoin.enabled); this transform is for the
  * cases AQE cannot see — e.g. a bucketed/pre-partitioned exchange or a
  * key whose skew only materializes after upstream filters.
  */
object Salting {

  /** Keys with count > threshold on `df` — the driver-collected hot-key
    * list is expected to be tiny (broadcast into the salting exprs).
    * Exact: full groupBy scan. Use only when df is cheap to scan twice.
    */
  def heavyKeys(df: DataFrame, key: String, threshold: Long): Seq[String] =
    df.groupBy(col(key)).count()
      .filter(col("count") > threshold)
      .select(col(key).cast("string"))
      .collect().map(_.getString(0)).toSeq

  /** Sampled hot-key detection: scan `fraction` of the rows, scale the
    * threshold. At 100 TB the exact detector costs a full shuffle before
    * the join it protects; a 0.1% sample finds every key hot enough to
    * matter (a key at 10× the skew threshold appears ~10·f·T times in
    * the sample — far above the noise floor), and a missed borderline
    * key is exactly the case AQE's runtime skew-join already covers.
    * Deterministic seed → reproducible plans.
    */
  def heavyKeysSampled(df: DataFrame, key: String, threshold: Long,
      fraction: Double = 0.001, seed: Long = 42L): Seq[String] = {
    if (fraction >= 1.0) return heavyKeys(df, key, threshold)
    val scaled = math.max(1L, (threshold * fraction).toLong)
    df.sample(withReplacement = false, fraction, seed)
      .groupBy(col(key)).count()
      .filter(col("count") > scaled)
      .select(col(key).cast("string"))
      .collect().map(_.getString(0)).toSeq
  }

  /** Salted inner/left equi-join of big ⋈ small on `key`.
    * Hot keys: big side gets salt = hash(row) % salts, small side is
    * exploded to all salts. Cold keys: salt 0 both sides.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      hot: Seq[String], salts: Int, joinType: String = "inner"): DataFrame = {
    val hotArr = typedLit(hot)
    // deterministic salt: stable per-row hash of all columns — the same
    // row lands on the same reducer on every run/partitioning
    val bigSalted = big.withColumn("_salt",
      when(array_contains(hotArr, col(key).cast("string")),
        pmod(xxhash64(struct(big.columns.map(col): _*)), lit(salts)).cast("int"))
        .otherwise(lit(0)))
    val smallSalted = small
      .withColumn("_salt",
        when(array_contains(hotArr, col(key).cast("string")),
          sequence(lit(0), lit(salts - 1)))
          .otherwise(array(lit(0))))
      .withColumn("_salt", explode(col("_salt")))
    bigSalted.join(smallSalted, Seq(key, "_salt"), joinType).drop("_salt")
  }

  /** Convenience: detect hot keys on the big side (sampled — see
    * heavyKeysSampled), then salt-join.
    */
  def autoSaltedJoin(big: DataFrame, small: DataFrame, key: String,
      threshold: Long = 100000L, salts: Int = 16,
      joinType: String = "inner", sampleFraction: Double = 0.001): DataFrame = {
    val hot = heavyKeysSampled(big, key, threshold, sampleFraction)
    if (hot.isEmpty) big.join(small, Seq(key), joinType)
    else saltedJoin(big, small, key, hot, salts, joinType)
  }
}
