package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Dev sweep: per-query physical-plan operator counts (Exchange /
  * SortMergeJoin / BroadcastHashJoin) to spot accidental shuffles. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def count(hay: String, needle: String): Int =
      hay.sliding(needle.length).count(_ == needle)
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        // executedPlan (not sparkPlan): EnsureRequirements has inserted
        // the Exchanges by then, so shuffle counts are real.
        val p = fn(spark, dir).queryExecution.executedPlan.toString
        println(f"$name%-28s ex=${count(p, "Exchange ")}%2d " +
          f"smj=${count(p, "SortMergeJoin")}%2d " +
          f"bhj=${count(p, "BroadcastHashJoin")}%2d " +
          f"bnl=${count(p, "BroadcastNestedLoop")}%2d " +
          f"win=${count(p, "Window [")}%2d")
      } catch { case e: Throwable =>
        println(s"$name FAILED: ${e.getMessage.take(80)}")
      }
    }
    spark.stop()
  }
}
