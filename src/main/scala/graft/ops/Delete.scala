package graft.ops

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}
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
    * `Sinks.overwritePartitioned` writes. Null partition values use
    * Hive's default-partition directory name.
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
    touchedDirNames.foreach { name =>
      val tgt = new HPath(target, name)
      if (stagedDirs.contains(name)) {
        AtomicDir.swapInto(fs, new HPath(staging, name), tgt,
          new HPath(oldRoot, name))
      } else if (fs.exists(tgt)) {
        // every row of this partition was deleted: park, then drop
        fs.rename(tgt, new HPath(oldRoot, name))
      }
    }
    if (fs.exists(staging)) fs.delete(staging, true)
    fs.delete(oldRoot, true)
  }
}
