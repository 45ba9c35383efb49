package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed table layout — the shuffle-free join. A shuffle join of two
  * 100 TB fact tables moves BOTH through the network every time they
  * meet; writing them bucketed on the join key (same bucket count, same
  * key) moves the data ONCE, at write time, and every subsequent join
  * reads bucket i against bucket i with no Exchange at all — the plan
  * contains only scans, (per-bucket) sorts, and the join. With
  * `sortBy`, even the sort is pre-paid. This is Spark's native
  * pre-partitioning contract (the catalog records the bucket spec;
  * Catalyst proves the co-location and drops the Exchange), the batch
  * analogue of what [[Layout.cluster]] + [[Snapshots.readWhere]] do
  * for scans — layout decided at WRITE time paying at READ time.
  *
  * The returned tables are EXTERNAL (explicit path): the catalog entry
  * carries the bucket metadata, the caller's directory carries the
  * bytes. Repeated [[writeBucketed]] calls replace both.
  *
  * Reference anchor: the reference joins funding rows to the contract
  * dimension on every 5-minute tick (funding_stats_etl.py:63-120) —
  * at its scale a broadcast; at fact-fact scale, this layout.
  */
object Bucketing {

  /** Register `df` at `path` as external bucketed table `name`
    * (`buckets` buckets on `keys`, optionally bucket-sorted on
    * `sortCols` so downstream sort-merge joins skip their sorts). */
  def writeBucketed(df: DataFrame, name: String, path: String,
      buckets: Int, keys: Seq[String], sortCols: Seq[String] = Nil): Unit = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    require(keys.nonEmpty, "bucketing needs at least one key column")
    require(name.matches("[A-Za-z0-9_.]+"), s"unsafe table name '$name'")
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $name")
    // a previous run's files under the same path would be re-adopted by
    // the fresh table; replace them atomically enough for a staging dir
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    // pre-shuffle rows onto their bucket BEFORE the bucketed write:
    // without this every write task emits a file per bucket it sees
    // (tasks × buckets small files — the classic bucketing file
    // explosion); with it the table is exactly `buckets` files and
    // each per-bucket sort runs once, in parallel
    val w = df.repartition(buckets, keys.map(df.col): _*)
      .write.format("parquet").mode(SaveMode.Overwrite)
      .option("path", path)
      .bucketBy(buckets, keys.head, keys.tail: _*)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*)
     else w).saveAsTable(name)
  }

  /** The catalog table written by [[writeBucketed]] — reads carry the
    * bucket spec, which is what lets Catalyst elide the join Exchange. */
  def table(spark: SparkSession, name: String): DataFrame =
    spark.table(name)
}
