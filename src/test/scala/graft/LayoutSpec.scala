package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ops.Layout

/** Z-order clustering contract: content-preserving, and — the point —
  * per-FILE min/max spans become narrow on EVERY clustered column at
  * once, which is exactly the statistic parquet footer pruning uses.
  * A single-column sort leaves the other column's per-file span at the
  * full domain; the Morton layout must beat that on both axes. */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  /** Per-file (max-min) span of `c`, averaged over files, as a fraction
    * of the full domain span. */
  private def avgFileSpan(path: String, c: String): Double = {
    val byFile = spark.read.parquet(path)
      .groupBy(input_file_name().as("f"))
      .agg((max(col(c)) - min(col(c))).cast("double").as("span"))
      .select("span").as[Double].collect()
    val full = spark.read.parquet(path)
      .agg((max(col(c)) - min(col(c))).cast("double")).as[Double].head()
    byFile.sum / byFile.length / full
  }

  test("both clustered columns get narrow per-file spans; sort does not") {
    val root = Files.createTempDirectory("graft_layout").toFile
    // a 64x64 uniform grid: every (x, y) cell once, in scattered order
    val grid = spark.range(4096)
      .select((col("id") % 64).as("x"), (col("id") / 64).as("y"),
        col("id").as("payload"))
      .repartition(8) // destroy any incidental ordering

    val zPath = s"$root/zorder"
    Layout.cluster(grid, Seq("x", "y"), bits = 6, numFiles = 16)
      .write.parquet(zPath)
    val sPath = s"$root/sorted"
    grid.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.parquet(sPath)

    // content preserved exactly
    val zBack = spark.read.parquet(zPath)
    assert(zBack.count() == 4096)
    assert(zBack.agg(sum("payload")).as[Long].head() ==
      (0L until 4096L).sum)

    // Morton property: 16 files over a 64x64 grid → each file covers
    // ~1/4 of each axis; allow slack for range-boundary straddle.
    val zx = avgFileSpan(zPath, "x"); val zy = avgFileSpan(zPath, "y")
    val sx = avgFileSpan(sPath, "x"); val sy = avgFileSpan(sPath, "y")
    assert(zx < 0.5, s"x span $zx")
    assert(zy < 0.5, s"y span $zy")
    // the single-column sort: x is tight but y spans the whole domain
    assert(sx < 0.2, s"sorted x span $sx")
    assert(sy > 0.9, s"sorted y span $sy")
    // and z-order's worse axis still beats sort's worse axis 2x+
    assert(math.max(zx, zy) < math.max(sx, sy) / 2)
  }

  test("equi-depth ranks keep skewed data balanced") {
    // 90% of rows live in x ∈ [0, 10): uniform min/max bucketing would
    // put them all in one cell; equi-depth ranks must still spread rows
    // across files within ~3x of even.
    val skewed = spark.range(4000)
      .select(when(col("id") < 3600, col("id") % 10)
        .otherwise(col("id")).as("x"),
        (col("id") % 100).as("y"), col("id").as("payload"))
      .repartition(8)
    val root = Files.createTempDirectory("graft_layout_skew").toFile
    val path = s"$root/z"
    Layout.cluster(skewed, Seq("x", "y"), bits = 6, numFiles = 8)
      .write.parquet(path)
    val sizes = spark.read.parquet(path)
      .groupBy(input_file_name()).count().select("count")
      .as[Long].collect()
    assert(sizes.length >= 4) // range partitioner actually split
    assert(sizes.max.toDouble / (4000.0 / sizes.length) < 3.0,
      s"file sizes ${sizes.toSeq}")
    assert(spark.read.parquet(path).count() == 4000)
  }

  test("string columns cluster via the order-preserving prefix surrogate") {
    // 26 letter-triples x 100 numeric rows, scattered; clustering on
    // (city, y) must give every file few distinct leading letters AND a
    // narrow y span — a single-column sort can only deliver one of the
    // two.
    val df = spark.range(2600)
      .select(expr("repeat(char(97 + CAST(id % 26 AS INT)), 3)").as("city"),
        (col("id") / 26).cast("long").as("y"), col("id").as("payload"))
      .repartition(8)
    val root = Files.createTempDirectory("graft_layout_str").toFile
    val path = s"$root/z"
    Layout.cluster(df, Seq("city", "y"), bits = 5, numFiles = 16)
      .write.parquet(path)
    val back = spark.read.parquet(path)
    assert(back.count() == 2600)
    val perFile = back
      .groupBy(input_file_name().as("f"))
      .agg(countDistinct(substring(col("city"), 1, 1)).as("letters"),
        (max(col("y")) - min(col("y"))).cast("double").as("yspan"))
      .select("letters", "yspan").as[(Long, Double)].collect()
    val avgLetters = perFile.map(_._1).sum.toDouble / perFile.length
    val avgYSpan = perFile.map(_._2).sum / perFile.length / 99.0
    assert(avgLetters < 13.0, s"avg distinct letters per file $avgLetters")
    assert(avgYSpan < 0.55, s"avg y span fraction $avgYSpan")
  }

  test("zorderKey interleaves bits as documented") {
    // 16 distinct values per column and err 0.001 make approxQuantile
    // exact: boundaries = {0..14}, so rank(v) = v (boundaries strictly
    // below v). x=y=5 → rank bits 0101 in both dims → interleaved
    // pairwise duplicates 00110011 = 51.
    val df = spark.range(16).select(col("id").as("x"), col("id").as("y"))
    val z = df.withColumn("z", Layout.zorderKey(df, Seq("x", "y"), bits = 4))
      .filter(col("x") === 5)
      .select("z").as[Long].head()
    assert(z == 51L, s"z=$z")
    // and the max value sets every interleaved bit: rank 15 twice → 255
    val zMax = df.withColumn("z", Layout.zorderKey(df, Seq("x", "y"), bits = 4))
      .filter(col("x") === 15).select("z").as[Long].head()
    assert(zMax == 255L, s"zMax=$zMax")
  }
}
