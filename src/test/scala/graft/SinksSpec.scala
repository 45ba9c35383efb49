package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ops.Sinks

/** Batch sink behaviors: S10 TSV staging roundtrip; partitioned overwrite
  * layout + partition pruning at read (the 100 TB layout property — a
  * date-filtered read must touch only matching partition directories). */
class SinksSpec extends SparkSpec {

  private def tmp(prefix: String) =
    Files.createTempDirectory(prefix).toFile.getAbsolutePath

  test("tsvStaging writes tab-separated headerless CSV that roundtrips") {
    val path = tmp("tsv") + "/out"
    val df = Tables.nation(spark, "/root/testdata/sf0.001")
      .select("n_nationkey", "n_name", "n_regionkey")
      // plant a quote+tab value: the writer's RFC-4180 quoting and the
      // reader's matching escape must roundtrip it
      .withColumn("n_name",
        when(col("n_nationkey") === 0, lit("has \"quote\"\tand tab"))
          .otherwise(col("n_name")))
    Sinks.tsvStaging(df, path)
    val back = spark.read
      .option("sep", "\t").option("header", "false")
      .option("escape", "\"")
      .schema("n_nationkey INT, n_name STRING, n_regionkey INT")
      .csv(path)
    assert(back.count() === df.count())
    assert(back.orderBy("n_nationkey").collect().toSeq ===
      df.orderBy("n_nationkey").collect().toSeq)
  }

  test("partitioned overwrite prunes partitions on a date filter") {
    val path = tmp("part") + "/t"
    val df = Tables.events(spark, "/root/testdata/sf0.001")
      .withColumn("event_date", to_date(col("ts")))
    Sinks.overwritePartitioned(df, path, Seq("event_date"))

    val datesOnDisk = new java.io.File(path).listFiles()
      .filter(_.getName.startsWith("event_date=")).map(_.getName).sorted
    assert(datesOnDisk.length > 1, "fixture must span multiple dates")

    val oneDate = datesOnDisk.head.stripPrefix("event_date=")
    val read = spark.read.parquet(path).filter(col("event_date") === oneDate)
    read.collect()
    val plan = read.queryExecution.executedPlan
    assert(plan.toString.contains(s"PartitionFilters: [isnotnull(event_date"),
      plan.toString)
    // pruned scan must touch exactly one partition's files (inputFiles
    // reports the PRE-pruning index, so read the scan metric instead)
    val scans = plan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty, plan.toString)
    assert(scans.head.metrics("numFiles").value === 1,
      s"expected 1 file read, got ${scans.head.metrics("numFiles").value}")
  }

  test("dynamic partition overwrite only rewrites touched partitions") {
    val path = tmp("dyn") + "/t"
    val df = Tables.events(spark, "/root/testdata/sf0.001")
      .withColumn("event_date", to_date(col("ts")))
    Sinks.overwritePartitioned(df, path, Seq("event_date"))
    val before = spark.read.parquet(path).count()

    // overwrite ONE partition with a single replacement row
    val oneDate = new java.io.File(path).listFiles()
      .filter(_.getName.startsWith("event_date=")).map(_.getName)
      .sorted.head.stripPrefix("event_date=")
    val onePartBefore = spark.read.parquet(path)
      .filter(col("event_date") === oneDate).count()
    val replacement = df.filter(col("event_date") === oneDate).limit(1)
    Sinks.overwritePartitioned(replacement, path, Seq("event_date"))

    val after = spark.read.parquet(path)
    assert(after.filter(col("event_date") === oneDate).count() === 1)
    assert(after.count() === before - onePartBefore + 1,
      "untouched partitions must survive")
  }
}
