package graft.ops

import org.apache.spark.sql.{Column, DataFrame}

/** Batch sinks (SURVEY.md S8-S10).
  *
  * The reference's TRUNCATE+COPY (active_futures_etl.py:96-104) and
  * to_sql(replace) (funding_stats_etl.py:123-128) are both atomic-replace
  * semantics — native to Spark's `mode("overwrite")` (staged write, commit
  * on success, so readers never observe a half-replaced table — the
  * property the reference hand-orders its fetch-before-truncate for).
  */
object Sinks {

  /** S8/S9: atomic truncate-and-reload / drop-recreate-from-frame. */
  def overwriteParquet(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  /** 100 TB layout: overwrite partitioned by a derived date column so
    * time-range queries prune files (dynamic partition overwrite only
    * rewrites the partitions present in `df`, not the whole table). */
  def overwritePartitioned(df: DataFrame, path: String,
      partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** S10: tab-separated, headerless CSV staging file
    * (to_csv(sep="\t", header=False), active_futures_etl.py:103). */
  def tsvStaging(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite")
      .option("sep", "\t").option("header", "false")
      .csv(path)

  /** Clustered write: range-partition into `files` output files on
    * `sortCols` and sort within each, so every parquet row group covers a
    * narrow key range. Point/range predicates on those columns then skip
    * most row groups via footer min/max stats — the file-layout lever
    * that, combined with `partitionBy` date directories
    * ([[overwritePartitioned]]), decides how much of 100 TB a query
    * actually reads. Also the fix for the small-files problem: `files`
    * bounds output file count regardless of upstream parallelism. */
  def writeClustered(df: DataFrame, path: String, files: Int,
      sortCols: Column*): Unit =
    df.repartitionByRange(files, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .write.mode("overwrite").parquet(path)
}
