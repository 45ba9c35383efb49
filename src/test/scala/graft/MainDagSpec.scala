package graft

import java.nio.file.Files

import graft.pipelines.{FundingStats, MainDag}

/** End-to-end main-DAG tick (SURVEY §3.1): all five tables land, and a
  * retried tick converges to the same state (DDL idempotent, overwrites
  * atomic, upserts newest-wins, stats replaced) — the invariant behind
  * the reference's 5×-retry policy. */
class MainDagSpec extends SparkSpec {

  test("one tick lands all five tables; a second tick is idempotent") {
    val wh = Files.createTempDirectory("dag-wh").toFile.getAbsolutePath
    val dir = "/root/testdata/sf0.001"
    val r1 = MainDag.runTick(spark, dir, wh)
    assert(r1.futures > 0 && r1.spotPairs > 0 && r1.lending > 0 &&
      r1.fundingRows > 0 && r1.statsRows > 0, r1.toString)

    val r2 = MainDag.runTick(spark, dir, wh)
    assert(r2 === r1, "retried tick must converge to the same state")

    // the stats table equals the flagship query's direct result
    val fromDag = spark.read.parquet(s"$wh/kucoin_funding_stats")
      .orderBy("symbol").collect().toSeq
    val direct = FundingStats.build(spark, dir)
      .orderBy("symbol").collect().toSeq
    assert(fromDag === direct)

    spark.sql("DROP TABLE IF EXISTS kucoin_lending_rates")
    spark.sql("DROP TABLE IF EXISTS kucoin_funding_rates")
  }
}
