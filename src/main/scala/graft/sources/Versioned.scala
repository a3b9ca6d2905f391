package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.{col, count, lit, max, min, when}

/** Versioned parquet table: a minimal manifest log giving plain
  * parquet directories the three properties object-store tables are
  * missing at scale — ATOMIC multi-file commits, TIME TRAVEL, and
  * safe concurrent readers — with nothing but files and one atomic
  * rename (the public Delta/Iceberg core idea, reduced to its
  * essentials; the reference's warehouse leans on ClickHouse for
  * this, its file side has no answer).
  *
  * Layout:
  * {{{
  *   table/
  *     _versions/v00000001.json   // one manifest per committed version
  *     d-<uuid>/part-*.parquet    // immutable data segments
  * }}}
  *
  * Protocol:
  *  - a WRITE lands its parquet segment under a fresh `d-<uuid>/`
  *    directory — invisible until referenced; a crash mid-write
  *    leaves an orphan segment, never a torn table;
  *  - a COMMIT writes the next `v<n>.json` (segment list) via
  *    write-temp + rename. Rename-if-absent is the atomic
  *    compare-and-swap: two racing committers collide on the same
  *    version name and the loser RETRIES against the new head —
  *    optimistic concurrency without a lock service. The CAS is as
  *    strong as the filesystem's rename: HDFS renames atomically and
  *    refuses an existing destination (a true CAS); the local FS
  *    narrows but cannot fully close the window (POSIX rename
  *    overwrites); object stores need their committer. Same contract
  *    every log-based table format carries;
  *  - a READER resolves one manifest and reads only its segments:
  *    pinned, repeatable, immune to concurrent commits;
  *  - [[vacuum]] deletes segments no kept manifest references.
  *
  * Scale notes: a manifest holds segment DIRECTORY names (not file
  * lists), so its size grows with commits, not files; `replace=false`
  * commits reuse the previous segment list — an append is O(delta)
  * data + O(versions) manifest. Readers pay one tiny JSON read before
  * the parquet scan.
  */
object Versioned {

  private val VersionsDir = "_versions"
  private def manifestName(v: Int) = f"v$v%08d.json"

  private def fs(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Latest committed version number, 0 if none. */
  def currentVersion(spark: SparkSession, path: String): Int = {
    val dir = new Path(path, VersionsDir)
    val f = fs(spark, path)
    if (!f.exists(dir)) 0
    else f.listStatus(dir).map(_.getPath.getName)
      .filter(n => n.startsWith("v") && n.endsWith(".json"))
      .map(n => n.stripPrefix("v").stripSuffix(".json").toInt)
      .foldLeft(0)(math.max)
  }

  private def readManifest(spark: SparkSession, path: String, v: Int): Seq[String] = {
    val f = fs(spark, path)
    val in = f.open(new Path(new Path(path, VersionsDir), manifestName(v)))
    val body = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    // segments are uuid-named dirs (`d-uuid`), possibly behind an
    // absolute foreign prefix (shallowClone) — no quotes/escapes
    // inside either form; the JSON keys carry no "d-" substring
    "\"([^\"]*d-[^\"]+)\"".r.findAllMatchIn(body).map(_.group(1)).toSeq
  }

  private def writeManifestCas(spark: SparkSession, path: String,
                               v: Int, segments: Seq[String]): Boolean = {
    val f = fs(spark, path)
    val dir = new Path(path, VersionsDir)
    f.mkdirs(dir)
    val target = new Path(dir, manifestName(v))
    if (f.exists(target)) return false
    val tmp = new Path(dir, s".tmp-${java.util.UUID.randomUUID()}")
    val out = f.create(tmp, false)
    try out.write(
      s"""{"version":$v,"segments":[${segments.map("\"" + _ + "\"").mkString(",")}]}"""
        .getBytes("UTF-8"))
    finally out.close()
    // rename-if-absent IS the commit point: exactly one racer wins v
    val won = !f.exists(target) && f.rename(tmp, target)
    if (!won) f.delete(tmp, false)
    won
  }

  /** Write `df` as a new segment and commit the next version.
    * `replace = true` makes the new version exactly this segment (the
    * atomic full-refresh swap); `replace = false` appends it to the
    * current head's segments. Returns the committed version number.
    * Retries the manifest CAS against a moved head up to `maxRetries`
    * times — concurrent appends serialize without locks.
    */
  def commit(df: DataFrame, path: String, replace: Boolean = false,
             maxRetries: Int = 10): Int = {
    val spark = df.sparkSession
    val seg = s"d-${java.util.UUID.randomUUID()}"
    df.write.mode(SaveMode.ErrorIfExists).parquet(new Path(path, seg).toString)
    var attempt = 0
    while (attempt < maxRetries) {
      val head = currentVersion(spark, path)
      val base = if (replace || head == 0) Nil else readManifest(spark, path, head)
      if (writeManifestCas(spark, path, head + 1, base :+ seg)) return head + 1
      attempt += 1
    }
    throw new IllegalStateException(
      s"commit lost the version race $maxRetries times at $path")
  }

  /** Write-audit-publish (the Iceberg/Netflix WAP discipline): stage
    * the candidate snapshot's data files, audit the STAGED BYTES —
    * a re-read of the written parquet, not the logical plan that
    * produced it, so serialization itself is inside the audited
    * surface — and only on a clean audit CAS the manifest pointer.
    * On failure the staged segment is deleted and the head is
    * untouched: readers can never observe unaudited data because
    * visibility IS the manifest pointer, and a crash between stage
    * and publish leaves only an unreferenced segment for [[vacuum]].
    * Publishes a full-snapshot (replace) version.
    *
    * @param audit maps the staged frame to its FAILURE rows; empty
    *              result = publish
    * @return (published version if any, the audit failures)
    */
  def writeAuditPublish(candidate: DataFrame, path: String,
                        audit: DataFrame => DataFrame,
                        maxRetries: Int = 10): (Option[Int], DataFrame) = {
    val spark = candidate.sparkSession
    val seg = s"d-${java.util.UUID.randomUUID()}"
    candidate.write.mode(SaveMode.ErrorIfExists)
      .parquet(new Path(path, seg).toString)
    val staged = spark.read.parquet(new Path(path, seg).toString)
    val failures = graft.Par.persistTracked(audit(staged))
    if (failures.isEmpty) {
      var attempt = 0
      while (attempt < maxRetries) {
        val head = currentVersion(spark, path)
        if (writeManifestCas(spark, path, head + 1, Seq(seg)))
          return (Some(head + 1), failures)
        attempt += 1
      }
      throw new IllegalStateException(
        s"writeAuditPublish lost the version race $maxRetries times at $path")
    } else {
      // Materialize the failures OFF the staged files BEFORE deleting
      // them (r11 ADVICE): persist is lazy and isEmpty only ran the
      // first partition(s), so a caller consuming the failures after
      // the segment is gone (count / write-to-quarantine — the normal
      // WAP flow) would hit FileNotFoundException on the un-cached
      // partitions. localCheckpoint(eager = true) computes and stores
      // every partition, cutting lineage to the staged parquet; only
      // then is the segment dropped.
      val pinned = failures.localCheckpoint(true)
      fs(spark, path).delete(new Path(path, seg), true)
      (None, pinned)
    }
  }

  /** Read a pinned version (default: current head). Reading version 0
    * (empty table) is an error — commit first. Segment entries are
    * table-root-relative (`d-uuid`) or ABSOLUTE (a [[shallowClone]]'s
    * foreign references) — resolved accordingly.
    *
    * `mergeSchema` widens across segments committed under EVOLVED
    * schemas (a column added by a later append null-fills the older
    * segments' rows — the dbt `on_schema_change: append_new_columns`
    * contract); off by default because the footer-merge pass costs a
    * per-file read and same-schema tables (the normal case) never
    * need it. Time travel to a pre-evolution version keeps the
    * ORIGINAL narrow schema either way — old manifests only list old
    * segments.
    */
  def read(spark: SparkSession, path: String,
           version: Option[Int] = None,
           mergeSchema: Boolean = false): DataFrame = {
    val v = version.getOrElse(currentVersion(spark, path))
    require(v >= 1, s"no committed version at $path")
    val segs = readManifest(spark, path, v)
    val r = if (mergeSchema) spark.read.option("mergeSchema", "true")
            else spark.read
    r.parquet(segs.map { s =>
      val p = new Path(s)
      (if (p.isAbsolute) p else new Path(path, s)).toString
    }: _*)
  }

  /** Per-FILE min/max stats for a pinned version — Delta/Iceberg
    * data skipping on the engine's own table format ([[graft.sources
    * .Sink.writeFileStats]] is the plain-directory form; this one is
    * VERSION-AWARE): one column-pruned scan over the version's
    * segments aggregates (min, max, row count) per data file, landed
    * under `path/_stats/v<n>` — the underscore keeps parquet readers
    * out, and versioning the stats means a later commit writes ITS
    * OWN manifest while time travel prunes with the stats true at
    * the pinned version. At 100 TB the stats pass reads only the
    * stats columns and the manifest is one row per data file.
    * Returns the number of files profiled.
    */
  def writeStats(spark: SparkSession, path: String, cols: Seq[String],
                 version: Option[Int] = None): Int = {
    require(cols.nonEmpty, "writeStats needs at least one column")
    val v = version.getOrElse(currentVersion(spark, path))
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"))) :+
      count(lit(1)).as("n_rows")
    val stats = read(spark, path, Some(v))
      .select(col("_metadata.file_path").as("file") +: cols.map(col): _*)
      .groupBy(col("file"))
      .agg(aggs.head, aggs.tail: _*)
    stats.coalesce(1).write.mode(SaveMode.Overwrite)
      .parquet(s"$path/_stats/v$v")
    spark.read.parquet(s"$path/_stats/v$v").count().toInt
  }

  /** Range-pruned versioned read: ≡ `read(...).filter(col BETWEEN
    * lo AND hi)`, but files whose [min, max] provably miss the range
    * are dropped DRIVER-SIDE from the plan (never opened, never
    * listed at row-group level) using the [[writeStats]] manifest of
    * the PINNED version. Null-stats files are kept — the residual
    * filter handles their rows — and the residual BETWEEN pushes to
    * the scan so row-group pruning still applies inside survivors.
    * Requires [[writeStats]] to have run for the version.
    */
  def prunedRead(spark: SparkSession, path: String, pruneCol: String,
                 lo: Any, hi: Any,
                 version: Option[Int] = None): DataFrame = {
    val v = version.getOrElse(currentVersion(spark, path))
    val statsPath = s"$path/_stats/v$v"
    require(fs(spark, path).exists(new Path(statsPath)),
      s"no stats manifest at $statsPath — run writeStats for v$v first")
    val stats = spark.read.parquet(statsPath)
    val kept = stats.filter(
        col(s"max_$pruneCol").isNull || col(s"min_$pruneCol").isNull ||
        !(col(s"max_$pruneCol") < lit(lo) || col(s"min_$pruneCol") > lit(hi)))
      .select(col("file")).collect().map(_.getString(0))
    val full = read(spark, path, Some(v))
    val base =
      if (kept.isEmpty) full.filter(lit(false))
      else spark.read.schema(full.schema).parquet(kept.toSeq: _*)
    base.filter(col(pruneCol).between(lit(lo), lit(hi)))
  }

  /** Zero-copy SHALLOW CLONE (the public Delta `SHALLOW CLONE` /
    * Iceberg snapshot-ref branching idea): publish at `dstPath` a
    * version whose manifest references the SOURCE's pinned segments
    * by absolute path — a metadata-only branch: one tiny JSON write
    * regardless of table size, so a 100 TB table branches in
    * milliseconds for dev/test/what-if work. The clone is a full
    * Versioned table afterwards: appends/replaces/restores land new
    * segments under ITS OWN root and the source never sees the
    * divergence; the source keeps committing and the clone's pin is
    * immune (manifest immutability, same as any reader).
    *
    * The standard shallow-clone hazard is inherited verbatim from
    * the public formats: [[vacuum]] on the SOURCE reclaims segments
    * a clone may still reference (a table's manifest log knows
    * nothing of foreign readers). Sever with a deep copy —
    * `commit(read(spark, dst), dst2, replace = true)` — before
    * vacuuming a cloned-from table aggressively. [[vacuum]] on the
    * CLONE is safe in both directions: it only ever deletes `d-*`
    * dirs under its own root, and foreign entries never match one.
    */
  def shallowClone(spark: SparkSession, srcPath: String, dstPath: String,
                   version: Option[Int] = None, maxRetries: Int = 10): Int = {
    val v = version.getOrElse(currentVersion(spark, srcPath))
    require(v >= 1, s"no committed version to clone at $srcPath")
    val srcRoot = fs(spark, srcPath).makeQualified(new Path(srcPath))
    val segs = readManifest(spark, srcPath, v).map { s =>
      val p = new Path(s)
      if (p.isAbsolute) s else new Path(srcRoot, s).toString
    }
    var attempt = 0
    while (attempt < maxRetries) {
      val head = currentVersion(spark, dstPath)
      if (writeManifestCas(spark, dstPath, head + 1, segs)) return head + 1
      attempt += 1
    }
    throw new IllegalStateException(
      s"shallowClone lost the version race $maxRetries times at $dstPath")
  }

  /** RESTORE TABLE TO VERSION (Delta's `RESTORE`, Iceberg's
    * rollback-as-new-snapshot): publish a NEW head whose content is
    * an earlier version's snapshot — the production rollback that
    * keeps history INTACT (nothing is rewound or deleted: the bad
    * versions stay readable for the post-mortem and reclaimable by
    * [[vacuum]], and a restore is itself just another auditable
    * commit). METADATA-ONLY: the new manifest points at version
    * `toVersion`'s existing segments — zero data moved at any table
    * size, the same CAS race discipline as [[commit]].
    */
  def restore(spark: SparkSession, path: String, toVersion: Int,
              maxRetries: Int = 10): Int = {
    val segs = readManifest(spark, path, toVersion) // validates existence
    var attempt = 0
    while (attempt < maxRetries) {
      val head = currentVersion(spark, path)
      require(toVersion >= 1 && toVersion <= head,
        s"version $toVersion not committed at $path (head $head)")
      if (writeManifestCas(spark, path, head + 1, segs)) return head + 1
      attempt += 1
    }
    throw new IllegalStateException(
      s"restore lost the version race $maxRetries times at $path")
  }

  /** Keyed change feed between two committed versions — the
    * time-travel dividend: `changes(v₁, v₂)` derives the CDC stream a
    * downstream consumer would need to catch up from v₁ to v₂ without
    * the upstream ever emitting one (Delta's CDF / Iceberg's
    * changelog read, derived rather than stored). One full-outer join
    * on the key — both sides shuffle once on `keys`; a key-bucketed
    * layout would make even that exchange-free — then a null-safe
    * per-column compare classifies each key:
    *
    *  - `insert`: key absent at v₁ (row carries the v₂ values);
    *  - `delete`: key absent at v₂ (row carries the v₁ values);
    *  - `update`: present in both, any non-key column differs
    *    null-safely (row carries the v₂ values).
    *
    * Unchanged keys emit nothing, so the feed is delta-sized. Both
    * versions must be key-unique (the [[upsert]] invariant); the
    * non-key schema is taken from v₂ and must exist at v₁ (run
    * schema evolution forward, not backward).
    */
  def changes(spark: SparkSession, path: String, fromVersion: Int,
              toVersion: Int, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "need at least one key column")
    val before = read(spark, path, Some(fromVersion))
    val after = read(spark, path, Some(toVersion))
    val valCols = after.columns.filterNot(keys.contains).toSeq
    val b = before.select((keys ++ valCols).map(col): _*)
      .withColumn("__in_b", lit(1))
      .select(keys.map(col) ++ valCols.map(c => col(c).as(s"__b_$c"))
        :+ col("__in_b"): _*)
    val a = after.select((keys ++ valCols).map(col): _*)
      .withColumn("__in_a", lit(1))
      .select(keys.map(col) ++ valCols.map(c => col(c).as(s"__a_$c"))
        :+ col("__in_a"): _*)
    val joined = b.join(a, keys, "full_outer")
    val differs = valCols.map(c => !(col(s"__b_$c") <=> col(s"__a_$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    joined
      .withColumn("change_type",
        when(col("__in_b").isNull, lit("insert"))
          .when(col("__in_a").isNull, lit("delete"))
          .when(differs, lit("update")))
      .filter(col("change_type").isNotNull)
      .select(keys.map(col) ++ Seq(col("change_type")) ++ valCols.map { c =>
        when(col("change_type") === "delete", col(s"__b_$c"))
          .otherwise(col(s"__a_$c")).as(c)
      }: _*)
  }

  /** Read-merge-commit with the merge INSIDE the retry loop: each
    * attempt observes the head, derives the replacement state from
    * exactly that head, and CASes head+1. A lost CAS means another
    * writer committed meanwhile — re-deriving from the NEW head is
    * what makes replace=true safe under concurrency (recommitting the
    * stale merge would silently drop the winner's version: a lost
    * update). A lost attempt's orphan segment is deleted eagerly;
    * a crash leaves it for [[vacuum]].
    */
  private[graft] def commitRebase(spark: SparkSession, path: String,
                                  maxRetries: Int)(stateOf: Int => DataFrame): Int = {
    val f = fs(spark, path)
    var attempt = 0
    while (attempt < maxRetries) {
      val head = currentVersion(spark, path)
      val seg = s"d-${java.util.UUID.randomUUID()}"
      stateOf(head).write.mode(SaveMode.ErrorIfExists)
        .parquet(new Path(path, seg).toString)
      if (writeManifestCas(spark, path, head + 1, Seq(seg))) return head + 1
      f.delete(new Path(path, seg), true)
      attempt += 1
    }
    throw new IllegalStateException(
      s"rebase commit lost the version race $maxRetries times at $path")
  }

  /** Keyed upsert as a version commit: merge `updates` into the head
    * (latest-wins per key via [[graft.operators.Cdc.upsert]]) and
    * commit the merged state as the next version — the atomic,
    * time-travelable form of the parquet upsert: readers mid-scan
    * keep their pinned version, a crash before the manifest CAS
    * leaves the head untouched, and yesterday's table stays
    * queryable until vacuumed. First commit bootstraps from the
    * batch. Returns the committed version.
    *
    * The merge runs inside the CAS retry loop ([[commitRebase]]): a
    * concurrent commit moves the head, the lost CAS discards the
    * stale merge, and the retry re-merges against the winner — no
    * lost updates under writer races.
    *
    * This rewrites the merged state (one segment) — the right trade
    * while a snapshot fits a commit; at copy-on-write pain, switch
    * the merge to [[Sink.jdbcUpsert]]-style delta segments + a
    * compaction pass.
    */
  def upsert(updates: DataFrame, path: String, key: Seq[String],
             trackingCol: String, tieBreak: Seq[String] = Nil,
             maxRetries: Int = 10): Int = {
    val spark = updates.sparkSession
    commitRebase(spark, path, maxRetries) { head =>
      if (head == 0)
        graft.operators.Cdc.dedupLatestPerKey(updates, key, trackingCol, tieBreak)
      else graft.operators.Cdc.upsert(read(spark, path, Some(head)), updates,
        key, trackingCol, tieBreak)
    }
  }

  /** Generalized MERGE INTO committed as one atomic version — the
    * Delta `MERGE INTO` composition: [[graft.operators.Merge
    * .mergeInto]]'s conditional clause chains applied against the
    * head snapshot, committed through the same CAS-rebase discipline
    * as [[upsert]] (a lost CAS re-merges against the winner — no lost
    * updates under writer races). A crash mid-merge leaves the
    * previous consistent version; readers never see a half-merged
    * table. Bootstrap (head == 0) IS the same merge, run against an
    * empty target of the source's schema: every source row is
    * not-matched, so the insert clause chain (conditions, set
    * overrides, first-clause-wins order) applies exactly as it would
    * against a non-empty table — bootstrap and steady-state semantics
    * cannot diverge. A merge whose insert clauses admit no row seeds
    * an EMPTY version 1 (the same rows a non-empty target would have
    * gained: none).
    */
  def mergeInto(source: DataFrame, path: String, key: Seq[String],
                matched: Seq[graft.operators.Merge.MatchedClause] = Seq.empty,
                notMatched: Seq[graft.operators.Merge.NotMatchedClause] = Seq.empty,
                notMatchedBySource: Seq[graft.operators.Merge.NotMatchedBySourceClause] = Seq.empty,
                maxRetries: Int = 10): Int = {
    val spark = source.sparkSession
    commitRebase(spark, path, maxRetries) { head =>
      val target =
        if (head == 0)
          spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], source.schema)
        else read(spark, path, Some(head))
      graft.operators.Merge.mergeInto(target, source, key,
        matched, notMatched, notMatchedBySource)
    }
  }

  /** Rewrite the head's (possibly many) append segments as ONE
    * segment committed as the next version — the maintenance pass a
    * long-lived append table needs (every commit added a segment;
    * readers of the compacted head scan one). Old versions stay
    * time-travelable until [[vacuum]]. Runs inside the CAS retry loop
    * so a concurrent append is never silently un-compacted away.
    * Returns the new version.
    */
  def compact(spark: SparkSession, path: String,
              maxRetries: Int = 10): Int =
    commitRebase(spark, path, maxRetries) { head =>
      read(spark, path, Some(head)) // head==0 fails fast: nothing to compact
    }

  /** Delete segments referenced by NO manifest newer than
    * `head - keepVersions + 1`, and the superseded manifests — the
    * storage-reclaim pass. Orphan segments from crashed writes go too.
    * Returns the number of segment directories removed.
    *
    * `retentionMs` guards the commit-in-flight window: a writer lands
    * its segment BEFORE the manifest CAS, so an unreferenced young
    * segment may be a commit about to happen, not garbage — deleting
    * it would let the commit succeed pointing at missing data (the
    * same race Delta's `deletedFileRetentionDuration` exists for).
    * Segments modified within the window are kept regardless of
    * reference state; pass 0 only when no writer can be concurrent
    * (e.g. tests, a stop-the-world maintenance window).
    */
  def vacuum(spark: SparkSession, path: String, keepVersions: Int = 1,
             retentionMs: Long = 24L * 3600 * 1000): Int = {
    require(keepVersions >= 1, "must keep at least the head version")
    require(retentionMs >= 0, "retentionMs must be non-negative")
    val f = fs(spark, path)
    val head = currentVersion(spark, path)
    if (head == 0) return 0
    val keepFrom = math.max(1, head - keepVersions + 1)
    val live = (keepFrom to head).flatMap(readManifest(spark, path, _)).toSet
    val cutoff = System.currentTimeMillis() - retentionMs
    val removed = f.listStatus(new Path(path))
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("d-"))
      .filterNot(s => live(s.getPath.getName))
      .filter(s => s.getModificationTime <= cutoff)
      .map { s => f.delete(s.getPath, true); 1 }.sum
    (1 until keepFrom).foreach { v =>
      f.delete(new Path(new Path(path, VersionsDir), manifestName(v)), false)
    }
    removed
  }
}

/** Atomic MULTI-TABLE commits over [[Versioned]] tables — the
  * maintenance contract a multi-frame index needs: a near-dup index
  * is several frames (minhash: shingles + banded; ngram: occ + dfs +
  * meta), and a daily batch must update ALL of them or NONE, or a
  * crashed job leaves an index whose candidate and verify frames
  * disagree.
  *
  * Layout: `root/<table>/` is a plain [[Versioned]] table per frame;
  * `root/_group/g<N>.json` pins `{table → version}` for group
  * version N. A group commit first commits every frame (their new
  * versions are INVISIBLE to group readers until referenced), then
  * CASes the next group manifest — the same rename-if-absent commit
  * point as [[Versioned]], so a crash anywhere before the group CAS
  * leaves readers on the previous consistent frame set, and the
  * orphaned frame versions are garbage, not corruption. Tables
  * absent from an update keep their previously pinned versions.
  *
  * Vacuum note: [[Versioned.vacuum]] on a member table must keep at
  * least as many versions as the group history you intend to keep —
  * a group manifest pointing at a vacuumed frame version is a broken
  * pin.
  */
object VersionedGroup {

  private val GroupDir = "_group"
  private def groupName(v: Int) = f"g$v%08d.json"

  private def fs(spark: SparkSession, root: String): FileSystem =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Latest committed group version, 0 if none. */
  def currentVersion(spark: SparkSession, root: String): Int = {
    val dir = new Path(root, GroupDir)
    val f = fs(spark, root)
    if (!f.exists(dir)) 0
    else f.listStatus(dir).map(_.getPath.getName)
      .filter(n => n.startsWith("g") && n.endsWith(".json"))
      .map(n => n.stripPrefix("g").stripSuffix(".json").toInt)
      .foldLeft(0)(math.max)
  }

  /** The {table → pinned version} map of a group version. */
  def tableVersions(spark: SparkSession, root: String,
                    version: Option[Int] = None): Map[String, Int] = {
    val v = version.getOrElse(currentVersion(spark, root))
    require(v >= 1, s"no committed group version at $root")
    val f = fs(spark, root)
    val in = f.open(new Path(new Path(root, GroupDir), groupName(v)))
    val body = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    "\"([A-Za-z0-9_.-]+)\":(\\d+)".r.findAllMatchIn(body)
      .filter(_.group(1) != "version")
      .map(m => m.group(1) -> m.group(2).toInt).toMap
  }

  private def writeGroupCas(spark: SparkSession, root: String, v: Int,
                            tables: Map[String, Int]): Boolean = {
    val f = fs(spark, root)
    val dir = new Path(root, GroupDir)
    f.mkdirs(dir)
    val target = new Path(dir, groupName(v))
    if (f.exists(target)) return false
    val body = tables.toSeq.sortBy(_._1)
      .map { case (t, tv) => "\"" + t + "\":" + tv }.mkString(",")
    val tmp = new Path(dir, s".tmp-${java.util.UUID.randomUUID()}")
    val out = f.create(tmp, false)
    try out.write(s"""{"version":$v,"tables":{$body}}""".getBytes("UTF-8"))
    finally out.close()
    val won = !f.exists(target) && f.rename(tmp, target)
    if (!won) f.delete(tmp, false)
    won
  }

  /** Commit `updates` (table → new content) as ONE group version:
    * every frame lands or none does. `replace = false` appends each
    * frame's rows as a new segment (O(delta) for daily maintenance);
    * `replace = true` swaps each updated frame's content. Unmentioned
    * tables keep their pins from the current group head. Returns the
    * group version.
    */
  def commit(root: String, updates: Map[String, DataFrame],
             replace: Boolean = false, maxRetries: Int = 10): Int = {
    require(updates.nonEmpty, "group commit needs at least one table")
    updates.keys.foreach(t => require(t.matches("[A-Za-z0-9_.-]+"),
      s"table name $t must be [A-Za-z0-9_.-]+"))
    val spark = updates.head._2.sparkSession
    // phase 1: frame commits — invisible until the group CAS below
    val committed = updates.map { case (t, df) =>
      t -> Versioned.commit(df, new Path(root, t).toString, replace)
    }
    // phase 2: pin them (plus the head's pins for untouched tables)
    var attempt = 0
    while (attempt < maxRetries) {
      val head = currentVersion(spark, root)
      val base = if (head == 0) Map.empty[String, Int]
                 else tableVersions(spark, root, Some(head))
      if (writeGroupCas(spark, root, head + 1, base ++ committed)) return head + 1
      attempt += 1
    }
    throw new IllegalStateException(
      s"group commit lost the version race $maxRetries times at $root")
  }

  /** Read one table at a pinned group version (default: head). */
  def read(spark: SparkSession, root: String, table: String,
           groupVersion: Option[Int] = None): DataFrame = {
    val pins = tableVersions(spark, root, groupVersion)
    val v = pins.getOrElse(table,
      throw new IllegalArgumentException(
        s"table $table not pinned by group at $root (has: ${pins.keys.toSeq.sorted})"))
    Versioned.read(spark, new Path(root, table).toString, Some(v))
  }
}
