package graft.ops

import scala.util.control.NonFatal

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned snapshot tables — manifest-pinned commits, the isolation
  * model [[Upsert]]/[[Delete]]/[[Compact]]'s directory swaps cannot
  * give. A swap replaces the directory a reader is ABOUT to list; a
  * manifest names the exact immutable files of one version, so a
  * reader resolves a version once and is untouchable by every later
  * commit — snapshot isolation — and any retained older version stays
  * readable forever (time travel). This is the minimal core of the
  * public lakehouse-format recipe (Delta/Iceberg): data files are
  * immutable and append-only; a commit is ONE atomic create of the
  * next numbered manifest; whoever loses the create race retries on
  * top of the winner.
  *
  * Layout under the table root:
  * {{{
  *   _manifests/v000000001         one line per data file, relative path
  *   data/<commit-uuid>/part-*.parquet   immutable once the manifest lands
  * }}}
  *
  * Commit protocol: stage data files (never referenced until a
  * manifest names them), write the manifest body to a dot-temp file,
  * `rename` it to `v<next>` — rename-to-existing fails on Hadoop
  * filesystems, so the version number is a compare-and-swap. A crash
  * before the rename leaves only ignored garbage (dot-temp manifest,
  * orphan data dir); a crash after is a completed commit. [[append]]
  * auto-retries a lost race (re-reading the new base — appends
  * commute); [[overwrite]] retries as last-writer-wins, its documented
  * semantic. Requires atomic rename (HDFS/local/ABFS; on raw S3 use a
  * rename-consistent commit layer).
  *
  * At 100 TB: a manifest is KB-per-thousand-files, the driver touches
  * only manifests, and readers open exactly the files of their
  * version — no directory listing of a giant table root at all, which
  * is itself a scale win over list-based reads.
  *
  * Reference anchor: the reference keeps only "latest state" tables
  * (active_futures_etl.py:96-104 truncate-reload); this op is what
  * those sinks need once yesterday's table must stay queryable.
  */
object Snapshots {

  private val ManifestDir = "_manifests"
  private val DataDir = "data"

  private def fsFor(spark: SparkSession, dir: String): (FileSystem, HPath) = {
    val p = new HPath(dir)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  private def manifestPath(root: HPath, v: Int): HPath =
    new HPath(new HPath(root, ManifestDir), f"v$v%09d")

  /** Committed versions, ascending (dot-temp files from interrupted
    * commits are ignored — they were never committed). */
  def versions(spark: SparkSession, dir: String): Seq[Int] = {
    val (fs, root) = fsFor(spark, dir)
    val md = new HPath(root, ManifestDir)
    if (!fs.exists(md)) return Seq.empty
    fs.listStatus(md).map(_.getPath.getName)
      .filter(_.matches("v[0-9]{9}"))
      .map(_.drop(1).toInt).sorted.toSeq
  }

  def currentVersion(spark: SparkSession, dir: String): Option[Int] =
    versions(spark, dir).lastOption

  /** All manifest lines, including `#`-prefixed metadata headers. */
  private def manifestLines(fs: FileSystem, root: HPath, v: Int): Seq[String] = {
    val in = fs.open(manifestPath(root, v))
    try scala.io.Source.fromInputStream(in, "UTF-8")
      .getLines().filter(_.nonEmpty).toList
    finally in.close()
  }

  /** The data files of version `v` (metadata headers stripped). */
  private def readManifest(fs: FileSystem, root: HPath, v: Int): Seq[String] =
    manifestLines(fs, root, v).filterNot(_.startsWith("#"))

  /** The table at `version` (default: latest). The returned plan names
    * this version's exact files — later commits, and even a concurrent
    * overwrite landing mid-query, cannot change or tear what this
    * reader sees (the files are immutable until [[vacuum]]). An empty
    * version (overwrite with an empty frame) is unrepresentable by
    * design — commits stage at least one parquet file. */
  def read(spark: SparkSession, dir: String, version: Int = -1): DataFrame = {
    val (fs, root) = fsFor(spark, dir)
    val v = if (version >= 0) version else currentVersion(spark, dir)
      .getOrElse(throw new java.util.NoSuchElementException(
        s"no committed version under $dir"))
    val files = readManifest(fs, root, v)
    require(files.nonEmpty, s"manifest v$v of $dir lists no files")
    spark.read.parquet(files.map(f => new HPath(root, f).toString): _*)
  }

  /** Stage `df`'s parquet files under an immutable commit dir; return
    * their root-relative paths. Nothing references them until a
    * manifest does — a crash here leaves ignorable orphans only. */
  private def stage(df: DataFrame, fs: FileSystem, root: HPath): Seq[String] = {
    val commitId = java.util.UUID.randomUUID.toString
    val rel = s"$DataDir/$commitId"
    df.write.parquet(new HPath(root, rel).toString)
    fs.listStatus(new HPath(root, rel))
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .map(st => s"$rel/${st.getPath.getName}").sorted.toSeq
  }

  /** CAS one manifest: true iff this writer won version `v`. */
  private def casManifest(fs: FileSystem, root: HPath, v: Int,
      files: Seq[String], header: Seq[String]): Boolean = {
    val md = new HPath(root, ManifestDir)
    fs.mkdirs(md)
    val tmp = new HPath(md, s".tmp-${java.util.UUID.randomUUID}")
    val out = fs.create(tmp, false)
    try out.write(((header ++ files).mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
    val won =
      try fs.rename(tmp, manifestPath(root, v))
      catch { case NonFatal(_) => false }
    if (!won) fs.delete(tmp, false)
    won
  }

  private def commitLoop(fs: FileSystem, root: HPath, spark: SparkSession,
      dir: String, staged: Seq[String], carryBase: Boolean,
      header: Seq[String] = Nil): Int = {
    var attempts = 0
    while (attempts < 10) {
      val base = currentVersion(spark, dir)
      val files =
        if (carryBase) base.map(readManifest(fs, root, _)).getOrElse(Nil) ++ staged
        else staged
      val next = base.getOrElse(0) + 1
      if (casManifest(fs, root, next, files, header)) return next
      attempts += 1 // lost the race: re-read the winner's state and retry
    }
    throw new java.util.ConcurrentModificationException(
      s"snapshot commit on $dir lost ${attempts} CAS races; giving up")
  }

  /** Append `df` as a new version (previous files + the new ones).
    * Returns the committed version. Concurrent appends both land, in
    * some order — appends commute, so the retry is lossless. */
  def append(df: DataFrame, dir: String): Int = {
    val spark = df.sparkSession
    val (fs, root) = fsFor(spark, dir)
    commitLoop(fs, root, spark, dir, stage(df, fs, root), carryBase = true)
  }

  /** Replace the table content with `df` as a new version. Last writer
    * wins among concurrent overwrites (the documented semantic);
    * earlier versions remain readable until [[vacuum]]. */
  def overwrite(df: DataFrame, dir: String): Int = {
    val spark = df.sparkSession
    val (fs, root) = fsFor(spark, dir)
    commitLoop(fs, root, spark, dir, stage(df, fs, root), carryBase = false)
  }

  private val CommitTag = """#commit writer=([A-Za-z0-9._-]+) batch=(-?\d+)""".r

  /** The newest batch id `writerId` has committed, scanning manifests
    * newest-first (a streaming writer's tag is almost always in the
    * last few — the scan is O(distance), not O(history)). */
  private def lastBatch(fs: FileSystem, root: HPath, spark: SparkSession,
      dir: String, writerId: String): Option[Long] =
    versions(spark, dir).reverseIterator.flatMap { v =>
      manifestLines(fs, root, v).collectFirst {
        case CommitTag(w, b) if w == writerId => b.toLong
      }
    }.nextOption()

  /** Exactly-once append for Structured Streaming's foreachBatch: the
    * (writerId, batchId) pair is recorded IN the committed manifest, so
    * a replayed batch — task retry, driver restart, checkpoint
    * recovery — is recognized and skipped (returns None) instead of
    * double-appending. Correct because foreachBatch batch ids are
    * monotonically increasing per query and a single query runs its
    * batches serially: a batch id at-or-below the writer's recorded
    * high-water mark has already landed. Distinct writerIds compose —
    * several streams may append to one table through the normal CAS
    * retry. A crash between the manifest CAS and anything else needs no
    * repair: the manifest IS the record. */
  def idempotentAppend(df: DataFrame, dir: String, writerId: String,
      batchId: Long): Option[Int] = {
    require(writerId.matches("[A-Za-z0-9._-]+"),
      s"writerId must be [A-Za-z0-9._-]+, got '$writerId'")
    val spark = df.sparkSession
    val (fs, root) = fsFor(spark, dir)
    if (lastBatch(fs, root, spark, dir, writerId).exists(_ >= batchId))
      return None // replay of an already-committed batch
    val staged = stage(df, fs, root)
    Some(commitLoop(fs, root, spark, dir, staged, carryBase = true,
      header = Seq(s"#commit writer=$writerId batch=$batchId")))
  }

  /** Exactly-once OVERWRITE, same replay discipline as
    * [[idempotentAppend]]: a replayed (writerId, batchId) is skipped.
    * This is the primitive for versioned STATE (an incremental rollup,
    * a dimension snapshot) advanced once per batch — each version is
    * the full new state, and a batch retry must not re-advance it. */
  def idempotentOverwrite(df: DataFrame, dir: String, writerId: String,
      batchId: Long): Option[Int] = {
    require(writerId.matches("[A-Za-z0-9._-]+"),
      s"writerId must be [A-Za-z0-9._-]+, got '$writerId'")
    val spark = df.sparkSession
    val (fs, root) = fsFor(spark, dir)
    if (lastBatch(fs, root, spark, dir, writerId).exists(_ >= batchId))
      return None
    val staged = stage(df, fs, root)
    Some(commitLoop(fs, root, spark, dir, staged, carryBase = false,
      header = Seq(s"#commit writer=$writerId batch=$batchId")))
  }

  /** Rewrite the CURRENT version's content into `numFiles` files and
    * commit it as a new version — the small-file compaction a
    * streaming writer needs after thousands of tiny per-batch commits.
    * Content-identical by construction (one read, one write, no
    * transform); concurrent appends that land between the read and the
    * commit are NOT lost — the commit is an overwrite CAS on top of
    * whatever base wins, so on a lost race the compactor re-reads and
    * retries via the normal loop... except content changed, so instead
    * of retrying blindly it throws: compact during active writes is a
    * coordination decision the caller must make. Old versions (and
    * their small files) stay readable until [[vacuum]]. */
  def compact(spark: SparkSession, dir: String, numFiles: Int,
      expectedVersion: Int = -1): Int = {
    require(numFiles >= 1, s"numFiles must be >= 1, got $numFiles")
    rewriteCurrent(spark, dir, _.coalesce(numFiles), expectedVersion)
  }

  /** OPTIMIZE ... ZORDER BY for snapshot tables: the current version
    * rewritten clustered on `cols` ([[Layout.cluster]] — per-file
    * min/max narrow on every clustered column) as a new
    * content-identical version, under the same OCC discipline as
    * [[compact]]. The maintenance loop of a streaming snapshot table
    * is append → optimize → vacuum, each a separate atomic commit. */
  def optimize(spark: SparkSession, dir: String, cols: Seq[String],
      numFiles: Int, bits: Int = 8, expectedVersion: Int = -1): Int = {
    require(numFiles >= 1, s"numFiles must be >= 1, got $numFiles")
    rewriteCurrent(spark, dir,
      Layout.cluster(_, cols, bits, numFiles), expectedVersion)
  }

  /** Shared content-identical-rewrite commit: stage `transform(current)`
    * and CAS it as the next version. `expectedVersion` is the
    * optimistic-concurrency token: a caller that inspected version N
    * rewrites exactly N or fails — without it, the freshly-resolved
    * current version plays the same role against commits landing after
    * resolution. On a lost race the rewrite throws rather than retrying:
    * retrying would silently drop the racing writer's rows. */
  private def rewriteCurrent(spark: SparkSession, dir: String,
      transform: DataFrame => DataFrame, expectedVersion: Int): Int = {
    val (fs, root) = fsFor(spark, dir)
    val base = if (expectedVersion >= 0) expectedVersion
    else currentVersion(spark, dir).getOrElse(
      throw new java.util.NoSuchElementException(s"nothing to rewrite in $dir"))
    val staged = stage(transform(read(spark, dir, base)), fs, root)
    val next = base + 1
    if (!casManifest(fs, root, next, staged, Nil))
      throw new java.util.ConcurrentModificationException(
        s"rewrite of $dir@v$base lost the commit race — a writer landed " +
          s"v$next first; re-run maintenance when the table is quiescent")
    next
  }

  /** Row-level change-data-capture between two committed versions:
    * every row of `toVersion` not in `fromVersion` tagged
    * `change_type='insert'`, every row of `fromVersion` not in
    * `toVersion` tagged `'delete'` (multiset semantics — k extra
    * copies of a row diff as k inserts). An update appears as its
    * delete + its insert, the standard CDC decomposition.
    *
    * The scale property is file-level pruning: data files are
    * immutable and manifest-named, so any file listed by BOTH
    * manifests contributes identical rows to both sides and cancels
    * WITHOUT being read. Only files added or removed between the two
    * versions are scanned — diffing two 100 TB versions after an
    * append costs exactly the appended files, not two table scans.
    * The row-level exceptAll then cancels only what file identity
    * could not (an overwrite that rewrote the same logical rows into
    * new files). Append-only histories skip the exceptAll entirely.
    */
  def diff(spark: SparkSession, dir: String, fromVersion: Int,
      toVersion: Int): DataFrame = {
    import org.apache.spark.sql.functions.lit
    val (fs, root) = fsFor(spark, dir)
    val fromF = readManifest(fs, root, fromVersion).toSet
    val toF = readManifest(fs, root, toVersion).toSet
    val addedFiles = (toF -- fromF).toSeq.sorted
    val removedFiles = (fromF -- toF).toSeq.sorted
    // limit(0) keeps the schema but optimizes to an empty relation —
    // no file of the pinned version is actually scanned for it
    lazy val empty = read(spark, dir, toVersion).limit(0)
    def readFiles(files: Seq[String]): DataFrame =
      if (files.isEmpty) empty
      else spark.read.parquet(files.map(f => new HPath(root, f).toString): _*)
    val added = readFiles(addedFiles)
    val removed = readFiles(removedFiles)
    val inserts =
      (if (removedFiles.isEmpty) added else added.exceptAll(removed))
        .withColumn("change_type", lit("insert"))
    val deletes =
      (if (addedFiles.isEmpty) removed else removed.exceptAll(added))
        .withColumn("change_type", lit("delete"))
    inserts.unionByName(deletes)
  }

  /** Drop manifests older than the newest `keepVersions` and delete
    * data files no retained manifest references. This is the ONLY
    * operation that deletes data — until it runs, every version ever
    * committed is readable. Returns (versions dropped, files deleted). */
  def vacuum(spark: SparkSession, dir: String, keepVersions: Int): (Int, Int) = {
    require(keepVersions >= 1, "must keep at least the current version")
    val (fs, root) = fsFor(spark, dir)
    val vs = versions(spark, dir)
    val (drop, keep) = vs.splitAt(math.max(0, vs.size - keepVersions))
    if (drop.isEmpty) return (0, 0)
    val live = keep.flatMap(readManifest(fs, root, _)).toSet
    val dead = drop.flatMap(readManifest(fs, root, _)).filterNot(live).distinct
    // delete dead files FIRST, their manifests LAST: the dropped
    // manifests are the only map to the dead files, so a crash between
    // the two phases leaves a rerunnable state (the next vacuum re-lists
    // the same manifests and finishes) instead of unreachable orphans
    val deadManifests = drop.map(manifestPath(root, _))
    dead.foreach(f => fs.delete(new HPath(root, f), false))
    deadManifests.foreach(m => fs.delete(m, false))
    (drop.size, dead.size)
  }
}
