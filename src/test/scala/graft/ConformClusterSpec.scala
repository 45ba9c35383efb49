package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.{Conform, Sinks}

class ConformClusterSpec extends SparkSpec {

  test("conform: reorder, cast, null-fill nullable, drop extras, fail on required") {
    import spark.implicits._
    val declared = StructType(Seq(
      StructField("symbol", StringType, nullable = false),
      StructField("funding_rate", DoubleType, nullable = true),
      StructField("volume", DoubleType, nullable = true)))
    val incoming = Seq(("0.0001", "BTCUSDTM", 7))
      .toDF("funding_rate", "symbol", "extra_col") // wrong order, extra, string-typed
    val out = Conform.conform(incoming, declared)
    assert(out.schema.fieldNames.toSeq === Seq("symbol", "funding_rate", "volume"))
    assert(out.schema("funding_rate").dataType === DoubleType)
    val r = out.collect().head
    assert(r.getString(0) === "BTCUSDTM")
    assert(r.getDouble(1) === 0.0001)
    assert(r.isNullAt(2))

    val missingRequired = Seq((0.1, 1.0)).toDF("funding_rate", "volume")
    val e = intercept[IllegalArgumentException] {
      Conform.conform(missingRequired, declared)
    }
    assert(e.getMessage.contains("symbol"))
  }

  test("writeClustered: bounded file count + row-group skipping on the sort key") {
    val path = Files.createTempDirectory("clustered").toFile.getAbsolutePath + "/t"
    val events = Tables.eventsRawTs(spark, "/root/testdata/sf0.01")
    Sinks.writeClustered(events, path, files = 8, col("ts"))

    val files = new java.io.File(path).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(files === 8, s"expected 8 output files, got $files")

    // a narrow ts range must read far fewer rows than the table holds —
    // parquet row-group min/max stats skip the rest (scan metric
    // numOutputRows counts rows surviving the pushed filter)
    val total = spark.read.parquet(path).count()
    val lo = 1704672000000000000L // 2024-01-08
    val hi = 1704758400000000000L // 2024-01-09
    val reread = spark.read.parquet(path)
    val narrow = reread
      .filter(Tables.tsAtLeastNanos(reread, lo) &&
        Tables.tsBelowNanos(reread, hi))
    val n = narrow.count()
    assert(n > 0 && n < total / 5, s"narrow slice $n of $total")
    val scan = narrow.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec => f
    }.head
    assert(scan.metadata("PushedFilters").contains("GreaterThanOrEqual(ts"),
      scan.metadata("PushedFilters"))
  }
}
