package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Iceberg-layout document/triple tables — the sandbox substitute for
  * the Apache Iceberg runtime (this container has no Iceberg jars and
  * zero egress), implementing the parts of the table-format CONTRACT
  * the pipeline depends on, in the same shape:
  *
  *  - immutable data files, grouped per snapshot
  *    (`data/snap-<id>/part-*.parquet` — a snapshot never rewrites
  *    another snapshot's files);
  *  - manifests tracking the file list + per-file row counts for every
  *    snapshot (`manifests/snap-<id>/` parquet: path, rows,
  *    snapshot_id — the stats Iceberg keeps in manifest entries);
  *  - versioned metadata (`metadata/v<id>.json`: schema DDL, partition
  *    columns, operation, parent snapshot) with a `version-hint.text`
  *    pointer written LAST via atomic rename — the Iceberg commit
  *    protocol's swap-the-pointer step;
  *  - time travel: read any retained snapshot by id;
  *  - append / overwrite semantics as new snapshots (append = parent
  *    manifest ∪ new files).
  *
  * On a cluster with the real Iceberg runtime, swap these calls for
  * `spark.read.format("iceberg")` / `writeTo(...)` — the pipeline code
  * depends only on DataFrames in and out.
  */
object SnapshotTable {

  case class Snapshot(id: Long, operation: String, parent: Long,
      files: Long, rows: Long)

  private def hintPath(dir: String) = Paths.get(dir, "metadata", "version-hint.text")

  /** Latest snapshot id, or 0 when the table does not exist yet. */
  def currentSnapshot(dir: String): Long = {
    val p = hintPath(dir)
    if (Files.exists(p)) Files.readString(p).trim.toLong else 0L
  }

  private def jsonEscape(s: String): String = s.flatMap {
    case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
    case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
  }

  /** The idempotency key recorded by snapshot `snap`, if any. */
  def committedKey(dir: String, snap: Long): Option[String] = {
    val p = Paths.get(dir, "metadata", s"v$snap.json")
    if (!Files.exists(p)) None
    else """"idempotency_key":"([^"]*)"""".r
      .findFirstMatchIn(Files.readString(p)).map(_.group(1)).filter(_.nonEmpty)
  }

  private def commit(dir: String, snap: Long, operation: String,
      parent: Long, schemaDdl: String, partitionBy: Seq[String],
      files: Long, rows: Long, idempotencyKey: String): Unit = {
    val meta = Paths.get(dir, "metadata")
    Files.createDirectories(meta)
    val json =
      s"""{"format_version":1,"snapshot_id":$snap,"parent_snapshot_id":$parent,
         |"operation":"$operation","schema":"${jsonEscape(schemaDdl)}",
         |"partition_spec":[${partitionBy.map(c => s""""$c"""").mkString(",")}],
         |"idempotency_key":"${jsonEscape(idempotencyKey)}",
         |"manifest":"manifests/snap-$snap","data_files":$files,"rows":$rows}"""
        .stripMargin.replace("\n", "")
    Files.writeString(meta.resolve(s"v$snap.json"), json)
    // the commit point: swap the version pointer atomically
    val tmp = meta.resolve(s"version-hint.tmp")
    Files.writeString(tmp, snap.toString)
    Files.move(tmp, hintPath(dir), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Write a new snapshot. `mode` = "overwrite" (the new snapshot's
    * manifest lists only the new files) or "append" (parent manifest ∪
    * new files). Data files of previous snapshots are never touched —
    * time travel stays valid.
    *
    * `idempotencyKey` makes the publish exactly-once under replays: a
    * streaming foreachBatch that re-delivers a batch after a failure
    * passes the batch id here, and a key already recorded by the
    * CURRENT snapshot short-circuits to that snapshot instead of
    * appending a duplicate (the Iceberg commit-conflict analogue for
    * the linear single-writer history this format keeps).
    */
  def write(df: DataFrame, dir: String, mode: String = "overwrite",
      partitionBy: Seq[String] = Nil, idempotencyKey: String = ""): Long = {
    val spark = df.sparkSession
    val parent = currentSnapshot(dir)
    if (idempotencyKey.nonEmpty && parent > 0 &&
        committedKey(dir, parent).contains(idempotencyKey))
      return parent
    val snap = parent + 1
    // overwrite, not errorifexists: a crash between the data write and
    // the version-hint swap leaves an UNCOMMITTED snap-<id> dir that no
    // reader can see — the retry must be able to reclaim it
    val dataDir = s"$dir/data/snap-$snap"
    val writer = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) writer.partitionBy(partitionBy: _*) else writer)
      .parquet(dataDir)
    // manifest entries: every data file + its row count (per-file stats)
    val newEntries = spark.read.parquet(dataDir)
      .groupBy(input_file_name().as("path"))
      .agg(count(lit(1)).as("rows"))
      .withColumn("snapshot_id", lit(snap))
    val manifest =
      if (mode == "append" && parent > 0)
        spark.read.parquet(s"$dir/manifests/snap-$parent").unionByName(newEntries)
      else newEntries
    manifest.coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/manifests/snap-$snap")
    val stats = spark.read.parquet(s"$dir/manifests/snap-$snap")
      .agg(count(lit(1)), coalesce(sum(col("rows")), lit(0L))).head()
    commit(dir, snap, mode, parent, df.schema.toDDL, partitionBy,
      stats.getLong(0), stats.getLong(1), idempotencyKey)
    snap
  }

  /** Read the table at a snapshot (default: latest). The file list comes
    * from the snapshot's manifest, so concurrent new snapshots never
    * change what an in-flight read sees. Files are grouped by the
    * snapshot that wrote them and read with that snapshot's data dir as
    * basePath, so hive-style partition columns reconstitute (the
    * manifest-carries-partition-values part of the Iceberg contract).
    */
  def read(spark: SparkSession, dir: String,
      snapshot: Option[Long] = None): DataFrame = {
    val snap = snapshot.getOrElse(currentSnapshot(dir))
    require(snap > 0, s"no snapshot in $dir")
    val entries = spark.read.parquet(s"$dir/manifests/snap-$snap")
      .select(col("path"), col("snapshot_id")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    entries.groupBy(_._2).toSeq.sortBy(_._1)
      .map { case (sid, fs) =>
        spark.read.option("basePath", s"$dir/data/snap-$sid")
          .parquet(fs.map(_._1).toSeq: _*)
      }
      .reduce(_.unionByName(_))
  }

  /** Incremental read: only the data files ADDED after `sinceSnapshot`
    * (manifest entries keep the snapshot that wrote them), up to
    * `snapshot` (default latest). The incremental-maintenance primitive:
    * at 10^12 docs a new snapshot's delta is read without touching the
    * accumulated corpus files.
    */
  def readDelta(spark: SparkSession, dir: String, sinceSnapshot: Long,
      snapshot: Option[Long] = None): DataFrame = {
    val snap = snapshot.getOrElse(currentSnapshot(dir))
    require(snap > sinceSnapshot, s"no delta: $snap <= $sinceSnapshot")
    val entries = spark.read.parquet(s"$dir/manifests/snap-$snap")
      .filter(col("snapshot_id") > sinceSnapshot)
      .select(col("path"), col("snapshot_id")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    require(entries.nonEmpty, s"snapshot $snap added no files after $sinceSnapshot")
    entries.groupBy(_._2).toSeq.sortBy(_._1)
      .map { case (sid, fs) =>
        spark.read.option("basePath", s"$dir/data/snap-$sid")
          .parquet(fs.map(_._1).toSeq: _*)
      }
      .reduce(_.unionByName(_))
  }

  /** Table maintenance: rewrite the current snapshot's (possibly many
    * small) data files into `numFiles` files as a new snapshot with
    * identical logical content — the small-file compaction a streaming
    * append workload needs (each micro-batch appends its own files;
    * unmaintained, scans degrade to millions of tiny reads). Old
    * snapshots stay time-travelable until expireSnapshots reclaims
    * them. Returns the new snapshot id.
    */
  def compact(spark: SparkSession, dir: String, numFiles: Int,
      partitionBy: Seq[String] = Nil): Long = {
    val current = read(spark, dir)
    write(
      if (partitionBy.nonEmpty)
        current.repartition(numFiles, partitionBy.map(col): _*)
      else current.repartition(numFiles),
      dir, mode = "overwrite", partitionBy = partitionBy,
      idempotencyKey = s"compact-of-${currentSnapshot(dir)}")
  }

  /** Table maintenance: expire all snapshots except the newest
    * `keepLast`, deleting data files no retained manifest references
    * (the Iceberg expire-snapshots analogue — at 100 TB the orphaned
    * files of superseded overwrites are the storage cost that grows
    * without this). Returns (expired snapshot ids, deleted data files).
    */
  def expireSnapshots(spark: SparkSession, dir: String,
      keepLast: Int = 1): (Seq[Long], Long) = {
    val all = history(dir).map(_.id)
    val keep = all.takeRight(math.max(keepLast, 1)).toSet
    val expire = all.filterNot(keep)
    if (expire.isEmpty) return (Nil, 0L)
    def files(snaps: Iterable[Long]): Set[String] =
      snaps.toSeq.flatMap { s =>
        spark.read.parquet(s"$dir/manifests/snap-$s")
          .select(col("path")).collect().map(_.getString(0))
      }.toSet
    val retained = files(keep)
    val orphans = files(expire) -- retained
    orphans.foreach { f =>
      val p = if (f.startsWith("file:")) Paths.get(new java.net.URI(f))
              else Paths.get(f)
      Files.deleteIfExists(p)
    }
    expire.foreach { s =>
      import scala.jdk.CollectionConverters._
      val m = Paths.get(s"$dir/manifests/snap-$s")
      if (Files.exists(m))
        Files.walk(m).iterator().asScala.toSeq.reverse
          .foreach(Files.deleteIfExists(_))
      Files.deleteIfExists(Paths.get(dir, "metadata", s"v$s.json"))
    }
    (expire, orphans.size.toLong)
  }

  /** Snapshot history from the versioned metadata. */
  def history(dir: String): Seq[Snapshot] = {
    val meta = Paths.get(dir, "metadata")
    if (!Files.exists(meta)) return Nil
    import scala.jdk.CollectionConverters._
    Files.list(meta).iterator().asScala
      .filter(_.getFileName.toString.matches("v\\d+\\.json"))
      .toSeq
      .map { p =>
        val j = Files.readString(p)
        def long(k: String) =
          s""""$k":(-?\\d+)""".r.findFirstMatchIn(j).map(_.group(1).toLong).getOrElse(0L)
        def str(k: String) =
          (s""""$k":"([^"]*)"""").r.findFirstMatchIn(j).map(_.group(1)).getOrElse("")
        Snapshot(long("snapshot_id"), str("operation"),
          long("parent_snapshot_id"), long("data_files"), long("rows"))
      }
      .sortBy(_.id)
  }
}
