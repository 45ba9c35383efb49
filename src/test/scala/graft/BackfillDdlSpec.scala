package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructType, StructField, LongType, DoubleType}

import graft.ops.{Backfill, Ddl}

class BackfillDdlSpec extends SparkSpec {

  test("paginate unions pages until the cursor runs out") {
    val events = Tables.events(spark, "/root/testdata/sf0.001")
      .select("event_id", "value")
    // fake cursor source: pages of 100 event_ids each, 0-based cursor
    val pageSize = 100L
    val total = events.count()
    def fetch(cursor: Option[Long]): Option[Backfill.Page] = {
      val start = cursor.getOrElse(0L)
      if (start >= total) None
      else Some(Backfill.Page(
        events.filter(col("event_id") >= start &&
          col("event_id") < start + pageSize),
        if (start + pageSize < total) Some(start + pageSize) else None))
    }
    val all = Backfill.paginate(fetch)
    assert(all.isDefined)
    assert(all.get.count() === total)
    assert(all.get.select("event_id").distinct().count() === total)
    // runaway guard caps pages
    val capped = Backfill.paginate(fetch, maxPages = 2)
    assert(capped.get.count() === 2 * pageSize)
  }

  test("the five reference tables create idempotently from Schemas") {
    val tables = Seq(
      "kucoin_lending_rates" -> Schemas.lendingRates,
      "kucoin_active_futures" -> Schemas.activeFutures,
      "kucoin_active_spot_pairs" -> Schemas.activeSpotPairs,
      "kucoin_funding_rates" -> Schemas.fundingRates,
      "kucoin_funding_stats" -> Schemas.fundingStats)
    tables.foreach { case (n, _) => spark.sql(s"DROP TABLE IF EXISTS $n") }
    // twice: the reference runs create_tables on every 5-minute tick
    (1 to 2).foreach { _ =>
      tables.foreach { case (n, sch) => Ddl.ensureTable(spark, n, sch) }
    }
    tables.foreach { case (n, sch) =>
      assert(spark.table(n).schema.fieldNames.toSeq === sch.fieldNames.toSeq, n)
      spark.sql(s"DROP TABLE IF EXISTS $n")
    }
  }

  test("ensureTable is idempotent and queryable") {
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("v", DoubleType)))
    spark.sql("DROP TABLE IF EXISTS ddl_probe")
    Ddl.ensureTable(spark, "ddl_probe", schema)
    Ddl.ensureTable(spark, "ddl_probe", schema) // second run: no-op
    assert(spark.table("ddl_probe").schema.fieldNames.toSeq === Seq("k", "v"))
    assert(spark.table("ddl_probe").isEmpty)
    spark.sql("DROP TABLE IF EXISTS ddl_probe")
  }
}
