package graft.ops

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Merge-upsert (SURVEY.md S7) — the reference's
  * `INSERT ... ON CONFLICT (pkey) DO UPDATE` (funding_rates_etl.py:100-111,
  * lending_data_etl.py:76-91) re-expressed for an immutable columnar store:
  * read-existing ∪ new → keep the newest row per key → overwrite.
  *
  * `merge` is the pure dataframe combinator (unit-testable, oracle-
  * checkable); `upsertParquet` is the sink wrapper. In streaming the same
  * combinator runs inside `foreachBatch` (see graft.streaming.MicroBatch).
  *
  * Scale notes: the winner-per-key pick is max_by over a struct — a hash
  * aggregation with map-side partial combine, which beats a row_number
  * window (no sort, and pre-shuffle partial aggregation collapses
  * re-delivered duplicates early). For 100 TB, partition the sink table
  * (e.g. by date) and restrict the read-existing side to the partitions the
  * batch touches.
  */
object Upsert {

  /** Newest-wins merge: one row per `keys`, highest (version, isNew) wins —
    * i.e. updates beat existing rows at equal version, matching the
    * reference's last-write-wins upsert. */
  def merge(existing: DataFrame, updates: DataFrame, keys: Seq[String],
      version: String): DataFrame = {
    val cols = existing.columns.toSeq
    require(updates.columns.toSeq == cols,
      s"schema mismatch: ${updates.columns.toSeq} vs $cols")
    val tagged = existing.withColumn("__new", lit(0))
      .unionByName(updates.withColumn("__new", lit(1)))
    // winner = arg-max of (version, __new) per key; struct comparison is
    // lexicographic so updates win ties.
    val payload = struct((Seq(version, "__new") ++
      cols.filterNot(c => keys.contains(c) || c == version))
      .map(col): _*)
    tagged
      .groupBy(keys.map(col): _*)
      .agg(max(payload).as("__w"))
      .select(keys.map(col) ++
        cols.filterNot(keys.contains).map(c => col(s"__w.$c").as(c)): _*)
      .select(cols.map(col): _*)
  }

  /** Partition-restricted upsert — the 100 TB form: the sink is
    * partitioned by `partCol` (a column of `updates`, e.g. a derived
    * date); only the partitions PRESENT IN THE BATCH are read, merged
    * and dynamically overwritten. A 5-minute tick then touches one or
    * two date directories of a multi-year table instead of rewriting all
    * of it — the reference's pkey-indexed ON CONFLICT upsert has the
    * same locality (it touches only conflicting pages).
    *
    * Correct because the merge key set must determine the partition: two
    * versions of one key land in the same `partCol` value (e.g. key
    * contains the event date the partition derives from). */
  def upsertParquetPartitioned(updates: DataFrame, path: String,
      keys: Seq[String], version: String, partCol: String): Unit = {
    val spark = updates.sparkSession
    val (fs, target) = AtomicDir.fsFor(updates, path)
    AtomicDir.recoverInterruptedSwap(fs, target)
    val touched = updates.select(partCol).distinct().collect()
      .map(_.get(0)).toSeq // bounded: partitions per batch, not rows
    // null partition values need an explicit isNull arm — `IN (null)` is
    // SQL-null, which would EXCLUDE existing null-partition rows from the
    // merge while dynamic overwrite still rewrites that partition: silent
    // data loss.
    val (nullTouched, defined) = touched.partition(_ == null)
    val touchedPred = {
      val in =
        if (defined.nonEmpty) col(partCol).isInCollection(defined)
        else lit(false)
      if (nullTouched.nonEmpty) in || col(partCol).isNull else in
    }
    val exists = fs.exists(target)
    val merged =
      if (exists) {
        val existing = spark.read.parquet(path)
          .filter(touchedPred) // partition pruning
          .select(updates.columns.map(col).toIndexedSeq: _*)
        merge(existing, updates, keys, version)
      } else merge(updates.limit(0), updates, keys, version)
    // Stage the touched partitions beside the table, then swap each
    // partition dir into place: the lazy read of the current table
    // happens while writing the staging dir (target untouched), and a
    // failure at any point leaves the current table readable — unlike a
    // read-then-overwrite of the same path, whose recompute-after-
    // executor-loss would re-read a half-deleted target.
    val staging = AtomicDir.stagingFor(target)
    if (fs.exists(staging)) fs.delete(staging, true)
    merged.write.mode("overwrite")
      .partitionBy(partCol)
      .parquet(staging.toString)
    if (!exists) {
      AtomicDir.swapInto(fs, staging, target, AtomicDir.oldFor(target))
    } else {
      // partition backups park under <target>__old__/<part>= ... — a
      // SIBLING of the table root, never inside it (partition discovery
      // would read an in-table backup as a phantom partition value)
      val oldRoot = AtomicDir.oldFor(target)
      if (fs.exists(oldRoot)) fs.delete(oldRoot, true)
      fs.mkdirs(oldRoot)
      val partDirs = fs.listStatus(staging)
        .filter(st => st.isDirectory &&
          st.getPath.getName.startsWith(s"$partCol="))
      partDirs.foreach { st =>
        AtomicDir.swapInto(fs, st.getPath,
          new HPath(target, st.getPath.getName),
          new HPath(oldRoot, st.getPath.getName))
      }
      fs.delete(staging, true)
      fs.delete(oldRoot, true)
    }
  }

  /** Idempotent batch upsert into a parquet path (read ∪ merge ∪ atomic
    * overwrite). Applying the same batch twice ≡ once. */
  def upsertParquet(updates: DataFrame, path: String, keys: Seq[String],
      version: String): Unit = {
    val spark = updates.sparkSession
    val (fs, target) = AtomicDir.fsFor(updates, path)
    AtomicDir.recoverInterruptedSwap(fs, target)
    val merged =
      if (fs.exists(target)) {
        val existing = spark.read.parquet(path).select(
          updates.columns.map(col).toIndexedSeq: _*)
        merge(existing, updates, keys, version)
      } else
        // first write still merges (against nothing): a first batch with
        // in-batch duplicate keys must land deduplicated like every later
        // one, or the one-row-per-key invariant starts out violated
        merge(updates.limit(0), updates, keys, version)
    // Stage beside the table, then swap: the lazy read of the current
    // files happens while writing the staging dir, and the previous
    // table survives a failure at any point. (The earlier cache()-as-
    // barrier variant could silently re-read the half-overwritten target
    // if an executor was lost after the cached blocks were evicted.)
    val staging = AtomicDir.stagingFor(target)
    if (fs.exists(staging)) fs.delete(staging, true)
    merged.write.mode("overwrite").parquet(staging.toString)
    AtomicDir.swapInto(fs, staging, target, AtomicDir.oldFor(target))
  }
}
