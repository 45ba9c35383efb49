package graft

import org.apache.spark.sql.functions._

import graft.ops.Graph

/** Integer PageRank contract: the scaled-integer recurrence lands on
  * hand-computable exact values, mass never grows, every node keeps at
  * least the teleport floor, and dangling nodes stay in the output. */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  private val S = Graph.Scale

  // a→b, a→d, b→a, c→a: d is dangling (no out-edges), c is a pure source
  private lazy val edges = Seq(
    ("a", "b", 1L), ("a", "d", 1L), ("b", "a", 1L), ("c", "a", 1L))
    .toDF("src", "dst", "w")

  test("one iteration matches the hand-computed exact integers") {
    val r = Graph.pageRank(edges, iterations = 1)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    // teleport 0.15S; a receives S (from b) + S (from c), b and d each
    // receive (S div 2) across a's two out-edges, c receives nothing
    assert(r("a") == 150000000000L + 85L * (2L * S) / 100L)
    assert(r("b") == 150000000000L + 85L * (S / 2L) / 100L)
    assert(r("d") == r("b")) // dangling node still present + scored
    assert(r("c") == 150000000000L) // teleport floor exactly
  }

  test("mass is bounded and the teleport floor holds over iterations") {
    val r = Graph.pageRank(edges, iterations = 3)
      .collect().map(x => x.getLong(1))
    assert(r.length == 4)
    assert(r.forall(_ >= 150000000000L))
    // integer floors only ever LOSE mass: Σ rank ≤ N·Scale
    assert(r.sum <= 4L * S)
  }

  test("deterministic: two runs produce identical rank vectors") {
    def run() = Graph.pageRank(edges, iterations = 3)
      .orderBy("node").collect().map(_.toString).toSeq
    assert(run() == run())
  }
}
