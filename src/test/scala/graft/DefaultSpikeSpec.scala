package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Feasibility spike (round 11): Spark's parquet readers fill columns
  * MISSING from a file using the `EXISTS_DEFAULT` metadata key on the
  * read schema's StructField (the SQL column-DEFAULT machinery,
  * SPARK-38334). If this holds for both the vectorized and row-based
  * readers, snapshot-table ADD COLUMN ... DEFAULT is metadata-only:
  * the pinned schema carries the default and pre-evolution files
  * materialize it scan-side, no rewrite. */
class DefaultSpikeSpec extends SparkSpec {
  import spark.implicits._

  test("EXISTS_DEFAULT on the read schema fills missing columns") {
    val dir = Files.createTempDirectory("graft_defspike").toFile.toString
    Seq((1L, "a"), (2L, "b")).toDF("k", "v").write.parquet(s"$dir/p")
    val md = new MetadataBuilder()
      .putString("EXISTS_DEFAULT", "42")
      .putString("CURRENT_DEFAULT", "42").build()
    val schema = StructType(Seq(
      StructField("k", LongType),
      StructField("v", StringType),
      StructField("n", IntegerType, nullable = true, metadata = md)))
    val got = spark.read.schema(schema).parquet(s"$dir/p")
      .select("k", "n").as[(Long, Option[Int])].collect().toMap
    assert(got == Map(1L -> Some(42), 2L -> Some(42)),
      s"vectorized reader returned $got")
    // row-based reader path (disable vectorization)
    val prev = spark.conf.get("spark.sql.parquet.enableVectorizedReader")
    try {
      spark.conf.set("spark.sql.parquet.enableVectorizedReader", "false")
      val got2 = spark.read.schema(schema).parquet(s"$dir/p")
        .select("k", "n").as[(Long, Option[Int])].collect().toMap
      assert(got2 == Map(1L -> Some(42), 2L -> Some(42)),
        s"row-based reader returned $got2")
    } finally spark.conf.set(
      "spark.sql.parquet.enableVectorizedReader", prev)
    // a file that HAS the column keeps its own values (NULL included)
    Seq((3L, "c", Some(7)), (4L, "d", None: Option[Int]))
      .toDF("k", "v", "n").write.parquet(s"$dir/p2")
    val got3 = spark.read.schema(schema)
      .parquet(s"$dir/p", s"$dir/p2")
      .select("k", "n").as[(Long, Option[Int])].collect().toMap
    assert(got3 == Map(1L -> Some(42), 2L -> Some(42),
      3L -> Some(7), 4L -> None), s"mixed read returned $got3")
  }
}
