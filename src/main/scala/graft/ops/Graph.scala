package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Iterative graph propagation as repeated join + aggregate — the
  * Spark-native shape for PageRank-style scoring. Pretraining
  * pipelines use exactly this to weight crawl domains by link
  * authority before sampling; the reference's per-symbol loops
  * (funding_rates_etl.py:38-66) have no graph surface, so this is a
  * pure training-data extension.
  *
  * All arithmetic is scaled-integer (ranks are probabilities ×10¹²,
  * integral `div`, no floating point anywhere): a float PageRank
  * diverges bit-wise between engines on summation order, an integer
  * one cannot — the same discipline as [[Sampling.mixtureWeights]].
  *
  * Scale shape: per iteration, one broadcast-or-shuffle join of the
  * edge list against the (nodes-sized, much smaller) rank frame and
  * one map-side-combined aggregate keyed on dst. The edge list with
  * its out-weights is computed once and persisted — iterations reuse
  * it without rescanning the source tables; rank lineage stays
  * shallow because each iteration's frame is small. Dangling nodes
  * (no out-edges) leak their rank mass by design — the classic
  * simplification — but every node keeps receiving the teleport
  * term, so no node ever disappears from the output.
  */
object Graph {

  /** Probability scale: rank 1.0 ≡ 10¹². Total rank mass is
    * N·Scale, so a single node's rank is bounded by N·Scale — and the
    * update below computes each edge contribution as
    * `(rank div tw)·w + ((rank mod tw)·w) div tw`, the exact
    * decomposition of `(rank·w) div tw`. The first partial product is
    * bounded by the CONTRIBUTION (≤ rank, since w ≤ tw); the CROSS
    * term `(rank mod tw)·w` is bounded by tw·w ≤ tw², which fits a
    * long only while the per-source total weight tw stays ≤
    * [[MaxLongTw]] (~3·10⁹). Above that (byte-count weights, say) the
    * cross term is computed in DECIMAL(38,0) — exact for any pair of
    * longs — chosen ONCE per run from the measured max tw, so the
    * common case keeps the all-long codegen path. */
  val Scale: Long = 1000000000000L

  /** Largest per-source total weight for which `(rank mod tw)·w` is
    * long-safe: floor(sqrt(Long.MaxValue)) rounded down a hair. */
  val MaxLongTw: Long = 3000000000L

  /** `iterations` rounds of damped weighted PageRank over directed
    * `edges` (columns `src`, `dst`, `w`; weights positive longs).
    * Returns (node, rank) for every node appearing as a src or dst,
    * rank scaled by [[Scale]]. Damping is `dampingPct`/100 (default
    * the classic 0.85), applied in integer arithmetic:
    *
    *   rank'(v) = (100-d)%·Scale + d%·Σ_{u→v} (rank(u)·w(u,v) div W(u))
    */
  def pageRank(edges: DataFrame, iterations: Int,
      dampingPct: Int = 85, maxBroadcastNodes: Long = 4000000L): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    require(dampingPct >= 0 && dampingPct <= 100,
      s"dampingPct must be in [0,100], got $dampingPct")
    val teleport = (100 - dampingPct) * Scale / 100
    // ONE persisted edge frame carries everything iterations need: the
    // out-weight rides each edge via a window sum over src (one shuffle
    // + in-partition sort) instead of a separate aggregate re-JOINED
    // back — the join formulation materialized the edge plan TWICE
    // (raw + joined caches; measured 268 s for a single iteration on a
    // 117M-edge derivative, dominated by the double cache write). The
    // edge plan (often a join+aggregate itself) computes exactly once;
    // iterations and the node universe read only the cached copy.
    val e = edges.select(col("src"), col("dst"), col("w"))
      .withColumn("tw", sum(col("w")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("src"))))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // one cached-edge scan, not two: the union formulation read the
    // (just-written) cache once per side; exploding both endpoints in
    // a single pass halves the scan before the distinct's shuffle
    val nodes = e.select(explode(array(col("src"), col("dst")))
        .as("node"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      // One strategy decision for all iterations, from the ONE number
      // that matters — the node count (known exactly, nodes is cached).
      // Below the budget, every iteration broadcasts the rank frame:
      // the cached edge frame never moves and never sorts. Above it,
      // shuffle-HASH joins: the edge side still shuffles once per join
      // shape (identical subplan → Spark reuses the exchange) but is
      // never re-SORTED — the per-iteration edge sort is what makes
      // plain sort-merge PageRank superlinear at large node counts
      // (measured 29.6× time at 10× data on the 120M-edge derivative;
      // see BASELINE.md).
      val nNodes = nodes.count()
      val small = nNodes <= maxBroadcastNodes
      // one metadata-sized agg on the cached edge frame decides the
      // cross-term arithmetic for every iteration (see MaxLongTw)
      val maxTw = Option(e.agg(max(col("tw"))).head.get(0))
        .map(_.asInstanceOf[Number].longValue).getOrElse(0L)
      val crossTerm =
        if (maxTw <= MaxLongTw) "((rank % tw) * w) div tw"
        else "(CAST(rank % tw AS DECIMAL(38,0)) * w) div tw"
      var rank = nodes.withColumn("rank", lit(Scale))
      for (_ <- 1 to iterations) {
        val rankSide = if (small) broadcast(rank) else rank.hint("shuffle_hash")
        val contribs = e.join(rankSide, e("src") === rank("node"))
          .select(col("dst").as("node"),
            expr(s"(rank div tw) * w + $crossTerm")
              .as("contrib"))
          .groupBy("node")
          .agg(sum(col("contrib")).as("c"))
        val cSide =
          if (small) broadcast(contribs) else contribs.hint("shuffle_hash")
        rank = nodes.join(cSide, Seq("node"), "left")
          .select(col("node"),
            (lit(teleport) +
              expr(s"($dampingPct * coalesce(c, 0L)) div 100"))
              .as("rank"))
      }
      // materialize before unpersisting the frames the plan reads
      val out = rank.localCheckpoint(eager = true)
      out
    } finally {
      e.unpersist()
      nodes.unpersist()
    }
  }
}
