package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.Ranking

/** Distributed exact-rank contract: bit-identical to the global-window
  * row_number/ntile on every size and remainder shape, while the plan
  * keeps the data partitioned (the whole point — no single-task sort). */
class RankingSpec extends SparkSpec {
  import spark.implicits._

  // keys with heavy ties (k = i/7) force the total-order tie-break path
  private def frame(n: Int) =
    (0 until n).map(i => (i / 7, i.toLong)).toDF("k", "id")

  test("globalRank equals the global-window row_number") {
    val df = frame(1000)
    val expected = df.withColumn("rank",
      row_number().over(Window.orderBy($"k", $"id")).cast("long"))
      .select("k", "id", "rank").collect().map(_.toString).sorted
    val got = Ranking.globalRank(df, Seq($"k".asc, $"id".asc))
      .select("k", "id", "rank").collect().map(_.toString).sorted
    assert(got.toSeq == expected.toSeq)
  }

  test("exactNtile matches window ntile across remainder shapes") {
    // n < buckets, n == buckets, n % buckets == 0, and ragged
    for ((n, b) <- Seq((7, 10), (10, 10), (1000, 8), (1003, 10), (1, 3))) {
      val df = frame(n)
      val expected = df.withColumn("bucket",
        ntile(b).over(Window.orderBy($"k", $"id")).cast("long"))
        .select("k", "id", "bucket").collect().map(_.toString).sorted
      val got = Ranking.exactNtile(df, b, Seq($"k".asc, $"id".asc))
        .select("k", "id", "bucket").collect().map(_.toString).sorted
      assert(got.toSeq == expected.toSeq, s"n=$n buckets=$b")
    }
  }

  test("every window in the plan is pid-partitioned — no global collapse") {
    // (AQE may coalesce the tiny fixture shuffle to one partition; the
    // scale property is the PLAN shape: the window clusters on the
    // range-partition id, never on an empty partition spec that would
    // pull the whole table into one task.)
    val ranked = Ranking.globalRank(frame(5000), Seq($"k".asc, $"id".asc),
      numPartitions = 16)
    ranked.collect()
    val phys = ranked.queryExecution.executedPlan.toString
    val winLines = phys.linesIterator
      .filter(_.contains("windowspecdefinition")).toSeq
    assert(winLines.nonEmpty)
    assert(winLines.forall(_.contains("__graft_pid")))
    // the range shuffle executes inside the pinned localCheckpoint (its
    // boundaries must be sampled exactly ONCE — see rankedWithTotal), so
    // downstream the plan reads the materialized partitions as an RDD
    // scan rather than re-executing a rangepartitioning exchange
    assert(phys.contains("ExistingRDD") || phys.contains("Scan RDD"))
  }

  test("ranked output is stable across repeated actions (pinned boundaries)") {
    // two actions over the same returned frame must see identical ranks —
    // without the checkpoint each action could re-sample range boundaries
    val ranked = Ranking.globalRank(frame(5000), Seq($"k".asc, $"id".asc),
      numPartitions = 16)
    val a = ranked.select("k", "id", "rank").collect().map(_.toString).sorted
    val b = ranked.select("k", "id", "rank").collect().map(_.toString).sorted
    assert(a.toSeq == b.toSeq)
    // ranks are a permutation of 1..n exactly once each
    assert(ranked.select("rank").as[Long].collect().sorted.toSeq ==
      (1L to 5000L))
  }
}
