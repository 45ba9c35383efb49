package graft.ops

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
import org.apache.spark.sql.functions._

/** Targeted physical deletion from a parquet table — the right-to-be-
  * forgotten / retention-expiry maintenance pass every long-lived store
  * needs, and the natural complement of [[Upsert]]: upsert adds or
  * replaces rows per key, delete removes them, both behind the same
  * crash-safe stage-and-swap discipline ([[AtomicDir]]).
  *
  * Scale shape (partitioned form): locating affected partitions is one
  * column-pruned scan of (keyCols, partCol) semi-joined against the
  * (broadcast, deletion-sized) key set; only partitions that actually
  * contain affected keys are rewritten — a delete of one user touches
  * that user's date directories in a multi-year table, not the table.
  */
object Delete {

  /** Delete all rows matching `keys` (on `keyCols`) from the parquet
    * table at `path`. Whole-table rewrite — the partitioned form below
    * is the 100 TB shape. No-op if the table does not exist. */
  def deleteKeys(spark: SparkSession, path: String, keys: DataFrame,
      keyCols: Seq[String]): Unit = {
    val (fs, target) = AtomicDir.fsFor(keys, path)
    AtomicDir.recoverInterruptedSwap(fs, target)
    if (!fs.exists(target)) return
    val survivors = spark.read.parquet(path)
      .join(broadcast(keys), keyCols, "left_anti")
    AtomicDir.replaceWith(survivors, path)(
      _.write.mode("overwrite").parquet(_))
  }

  /** Partition-restricted delete from a table partitioned by `partCol`:
    * rewrite ONLY the partition directories that contain affected keys;
    * untouched partitions' files are never read for rewrite, moved, or
    * rewritten. A partition whose every row is deleted is removed.
    *
    * Constraint: partition values must round-trip through their
    * directory-name encoding by plain `toString` (dates, identifiers —
    * no path-special characters), the same layout contract
    * `Sinks.overwritePartitioned` writes. A value that violates it
    * (Hive escaping changes the dir name) is DETECTED before any swap
    * and the call throws with the table unmodified. Null partition
    * values use Hive's default-partition directory name.
    *
    * Crash behavior: an interrupted call is healed by the next call's
    * recovery — partitions whose swap never landed are restored from
    * `__old__`, fully-emptied partitions parked in `__dropped__` are
    * purged (never resurrected). Rerun the delete to completion after a
    * crash; until then partitions processed before the crash reflect the
    * delete and later ones do not (each partition swap is individually
    * atomic; cross-partition atomicity is not provided).
    */
  def deleteKeysPartitioned(spark: SparkSession, path: String,
      keys: DataFrame, keyCols: Seq[String], partCol: String): Unit = {
    val (fs, target) = AtomicDir.fsFor(keys, path)
    AtomicDir.recoverInterruptedSwap(fs, target)
    if (!fs.exists(target)) return
    val table = spark.read.parquet(path)
    // one column-pruned pass finds where the keys live
    val touched = table
      .join(broadcast(keys), keyCols, "left_semi")
      .select(partCol).distinct().collect()
      .map(_.get(0)).toSeq // bounded: #affected partitions, not rows
    if (touched.isEmpty) return
    val (nullTouched, defined) = touched.partition(_ == null)
    // Guard the plain-toString layout contract on the touched VALUES
    // themselves, before anything is staged or moved. escapePathName is
    // the exact encoding Spark's partitionBy writer applies, so a value
    // it would alter breaks every predicted-name probe below — including
    // the fully-emptied partition, which stages NO survivor dir and so
    // can never be caught by comparing staged names (it would silently
    // survive the delete), and ':' values, which HPath refuses mid-loop
    // after earlier swaps already landed.
    val escaping = defined.map(_.toString)
      .filter(v => ExternalCatalogUtils.escapePathName(v) != v)
    if (escaping.nonEmpty)
      throw new IllegalArgumentException(
        s"deleteKeysPartitioned: values of '$partCol' " +
          escaping.mkString("[", ", ", "]") +
          " do not round-trip through plain toString (Hive dir-name " +
          "escaping applies); aborting before any write, table unmodified")
    val touchedPred = {
      val in =
        if (defined.nonEmpty) col(partCol).isInCollection(defined)
        else lit(false)
      if (nullTouched.nonEmpty) in || col(partCol).isNull else in
    }
    val touchedDirNames = touched.map {
      case null => s"$partCol=__HIVE_DEFAULT_PARTITION__"
      case v => s"$partCol=$v"
    }.toSet
    // stage the survivors of ONLY the touched partitions
    val survivors = table.filter(touchedPred)
      .join(broadcast(keys), keyCols, "left_anti")
    val staging = AtomicDir.stagingFor(target)
    if (fs.exists(staging)) fs.delete(staging, true)
    survivors.write.mode("overwrite").partitionBy(partCol)
      .parquet(staging.toString)
    val oldRoot = AtomicDir.oldFor(target)
    if (fs.exists(oldRoot)) fs.delete(oldRoot, true)
    fs.mkdirs(oldRoot)
    val stagedDirs =
      if (fs.exists(staging))
        fs.listStatus(staging)
          .filter(st => st.isDirectory &&
            st.getPath.getName.startsWith(s"$partCol="))
          .map(_.getPath.getName).toSet
      else Set.empty[String]
    // Defense in depth behind the value-level round-trip guard above:
    // every staged dir came from a touched partition, so any staged name
    // outside the predicted set proves an encoding mismatch the guard
    // somehow missed; refuse with nothing modified rather than lose data.
    val unpredicted = stagedDirs -- touchedDirNames
    if (unpredicted.nonEmpty) {
      fs.delete(staging, true)
      fs.delete(oldRoot, true)
      throw new IllegalArgumentException(
        "deleteKeysPartitioned: staged partition dirs " +
          unpredicted.mkString("[", ", ", "]") +
          s" do not match their predicted names — values of '$partCol' " +
          "do not round-trip through plain toString (Hive dir-name " +
          "escaping applied); aborting before any swap, table unmodified")
    }
    // Fully-emptied partitions park under __dropped__, NOT __old__: if
    // this pass dies before the final cleanup, recovery PURGES __dropped__
    // (finishing the delete) instead of restoring it (which would
    // resurrect removed rows while partitions swapped earlier stayed
    // deleted — a torn state for a right-to-be-forgotten pass).
    val droppedRoot = AtomicDir.droppedFor(target)
    if (fs.exists(droppedRoot)) fs.delete(droppedRoot, true)
    fs.mkdirs(droppedRoot)
    touchedDirNames.foreach { name =>
      val tgt = new HPath(target, name)
      if (stagedDirs.contains(name)) {
        AtomicDir.swapInto(fs, new HPath(staging, name), tgt,
          new HPath(oldRoot, name))
      } else if (fs.exists(tgt)) {
        // every row of this partition was deleted: park, then drop
        if (!fs.rename(tgt, new HPath(droppedRoot, name)))
          throw new java.io.IOException(
            s"deleteKeysPartitioned: failed to park fully-emptied " +
              s"partition $name under $droppedRoot")
      }
    }
    if (fs.exists(staging)) fs.delete(staging, true)
    fs.delete(oldRoot, true)
    fs.delete(droppedRoot, true)
  }
}
