package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.ops.Bucketing

/** Bucketed-join contract: equal-bucket tables join with NO shuffle
  * exchange in the physical plan, results identical to the plain join,
  * and rewrites replace the table cleanly. */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft_bucket").toFile.toString

  private lazy val facts =
    (0L until 1000L).map(i => (i % 100, i, s"f$i")).toDF("k", "seq", "tag")
  private lazy val dims =
    (0L until 100L).map(i => (i, s"d$i")).toDF("k", "name")

  test("equal-bucket join plans with zero shuffle exchanges") {
    val d = tmp()
    Bucketing.writeBucketed(facts, "bkt_facts", s"$d/facts", 8,
      Seq("k"), Seq("k"))
    Bucketing.writeBucketed(dims, "bkt_dims", s"$d/dims", 8,
      Seq("k"), Seq("k"))
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.table(spark, "bkt_facts")
        .join(Bucketing.table(spark, "bkt_dims"), Seq("k"))
      val shuffles = joined.queryExecution.executedPlan.collect {
        case s: ShuffleExchangeExec => s
      }
      assert(shuffles.isEmpty,
        s"bucketed join must not shuffle, found: $shuffles")
      // identical rows to the plain (shuffling) join
      val expected = facts.join(dims, Seq("k"))
        .collect().map(_.toString).sorted.toSeq
      assert(joined.collect().map(_.toString).sorted.toSeq == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    }
  }

  test("bucketed group-by on the bucket key also skips the shuffle") {
    val d = tmp()
    Bucketing.writeBucketed(facts, "bkt_agg", s"$d/agg", 8, Seq("k"))
    val agg = Bucketing.table(spark, "bkt_agg")
      .groupBy("k").agg(sum("seq").as("s"))
    val shuffles = agg.queryExecution.executedPlan.collect {
      case s: ShuffleExchangeExec => s
    }
    assert(shuffles.isEmpty,
      s"bucketed aggregation must not shuffle, found: $shuffles")
    assert(agg.count() == 100)
  }

  test("filesPerBucket splits buckets across files, join still shuffle-free") {
    val d = tmp()
    Bucketing.writeBucketed(facts, "bkt_split", s"$d/split", 4,
      Seq("k"), Seq("k"), filesPerBucket = 4)
    Bucketing.writeBucketed(dims, "bkt_split_d", s"$d/splitd", 4,
      Seq("k"), Seq("k"))
    // more files than buckets (parallel write), never more than b×f
    val nFiles = new java.io.File(s"$d/split").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(nFiles > 4 && nFiles <= 16, s"got $nFiles files")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // the zero-Exchange property survives the multi-file layout, even
      // against a single-file-per-bucket table
      val joined = Bucketing.table(spark, "bkt_split")
        .join(Bucketing.table(spark, "bkt_split_d"), Seq("k"))
      val shuffles = joined.queryExecution.executedPlan.collect {
        case s: ShuffleExchangeExec => s
      }
      assert(shuffles.isEmpty,
        s"bucketed join must not shuffle, found: $shuffles")
      val expected = facts.join(dims, Seq("k"))
        .collect().map(_.toString).sorted.toSeq
      assert(joined.collect().map(_.toString).sorted.toSeq == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    }
  }

  test("auto filesPerBucket follows the optimizer size estimate, no job") {
    import org.apache.spark.sql.functions.lit
    // tiny frame: one file per bucket
    assert(Bucketing.autoFilesPerBucket(facts, 4) == 1)
    // spark.range carries exact size stats (8 bytes/row) without
    // running anything: 2^27 rows ≈ 1 GiB of plan bytes over 2 buckets
    // = 512 MiB/bucket → 2 files at the 256 MiB target; clamp at 32
    val big = spark.range(1L << 27).toDF("id")
    assert(Bucketing.autoFilesPerBucket(big, 2) == 2)
    assert(Bucketing.autoFilesPerBucket(big.withColumn("pad", lit(0L)), 1)
      >= 4)
    assert(Bucketing.autoFilesPerBucket(spark.range(1L << 40).toDF("id"), 1)
      == 32)
  }

  test("rewrite replaces content; stale files do not resurface") {
    val d = tmp()
    Bucketing.writeBucketed(facts, "bkt_rw", s"$d/rw", 4, Seq("k"))
    assert(Bucketing.table(spark, "bkt_rw").count() == 1000)
    Bucketing.writeBucketed(facts.limit(10), "bkt_rw", s"$d/rw", 4, Seq("k"))
    assert(Bucketing.table(spark, "bkt_rw").count() == 10)
  }
}
