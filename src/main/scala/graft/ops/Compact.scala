package graft.ops

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.SparkSession

/** Small-file compaction — the third table-maintenance primitive next to
  * [[Upsert]] and [[Delete]]. Micro-batch ingest (the reference's 5-min
  * cadence, SURVEY §2.9) appends a few files per tick; after a month a
  * partition holds thousands of tiny files and scan cost is dominated by
  * open/footer overhead instead of bytes. Compaction rewrites ONLY the
  * partitions whose file count exceeds a threshold, coalescing each to
  * ~targetBytes files — data identical, layout healthy.
  *
  * Scale shape: the decision pass is pure file-listing metadata (no data
  * read); each needy partition is rewritten independently behind the same
  * crash-safe stage-and-swap as [[Upsert.upsertParquetPartitioned]]
  * (staging and parking roots are SIBLINGS of the table root — a dir
  * inside it would surface as a phantom partition), so a compaction tick
  * can run concurrently with readers and a crash never loses a partition.
  */
object Compact {

  /** One partition's compaction verdict (returned for observability —
    * the no-silent-caps discipline: callers can log what was skipped). */
  final case class PartitionReport(dir: String, files: Int, bytes: Long,
      compacted: Boolean)

  /** Compact every `partCol=` partition of `path` holding more than
    * `maxFiles` data files into ceil(bytes / targetBytes) files.
    * Partitions at or under the threshold are not read, moved, or
    * rewritten. Returns a per-partition report. Heals an interrupted
    * previous run first (same parking layout as the partitioned upsert).
    */
  def compactPartitions(spark: SparkSession, path: String, partCol: String,
      maxFiles: Int, targetBytes: Long): Seq[PartitionReport] = {
    require(maxFiles >= 1 && targetBytes >= 1)
    val df0 = spark.range(1).toDF() // FS resolution only
    val (fs, target) = AtomicDir.fsFor(df0, path)
    AtomicDir.recoverInterruptedSwap(fs, target)
    if (!fs.exists(target)) return Seq.empty
    val partDirs = fs.listStatus(target)
      .filter(st => st.isDirectory &&
        st.getPath.getName.startsWith(s"$partCol="))
    val stagingRoot = AtomicDir.stagingFor(target)
    val oldRoot = AtomicDir.oldFor(target)
    if (fs.exists(stagingRoot)) fs.delete(stagingRoot, true)
    if (fs.exists(oldRoot)) fs.delete(oldRoot, true)
    val reports = partDirs.toSeq.map { st =>
      val dataFiles = fs.listStatus(st.getPath)
        .filter(f => f.isFile && !f.getPath.getName.startsWith("_")
          && !f.getPath.getName.startsWith("."))
      val bytes = dataFiles.map(_.getLen).sum
      val needy = dataFiles.length > maxFiles
      if (needy) {
        val nOut = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
        // read the partition dir directly: rows come back WITHOUT the
        // partition column and are written back the same way, so the
        // swapped dir is a drop-in replacement under the table root
        val part = spark.read.parquet(st.getPath.toString)
        val staged = new HPath(stagingRoot, st.getPath.getName)
        part.coalesce(nOut).write.mode("overwrite")
          .parquet(staged.toString)
        if (!fs.exists(oldRoot)) fs.mkdirs(oldRoot)
        AtomicDir.swapInto(fs, staged, st.getPath,
          new HPath(oldRoot, st.getPath.getName))
      }
      PartitionReport(st.getPath.getName, dataFiles.length, bytes, needy)
    }
    if (fs.exists(stagingRoot)) fs.delete(stagingRoot, true)
    if (fs.exists(oldRoot)) fs.delete(oldRoot, true)
    reports
  }
}
