package graft.tools

import org.apache.spark.sql.SparkSession

/** WARM single-query timing — [[QueryOne]]'s cold run includes JVM/
  * codegen/classload noise; this warms the plan at sf0.001 first and
  * prints two measured passes (the bench's min-of-2 shape), so a
  * single query's bench cost is reproducible in isolation.
  *
  * Usage: runMain graft.tools.WarmOne <queryName> [sfDir]
  */
object WarmOne {
  def main(args: Array[String]): Unit = {
    val name = args(0); val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = graft.SparkEntry.queries(name)
    try fn(spark, "/root/testdata/sf0.001").count() catch { case _: Throwable => () }
    (1 to 2).foreach { i =>
      val t0 = System.nanoTime()
      fn(spark, dir).count()
      println(f"pass$i: ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
