package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hot-key-split equi-join — the manual skew mitigation for a fact ⋈
  * dimension join whose fact side concentrates on a few key values.
  * A plain shuffle join sends every row of a hot key to ONE reduce
  * task; at 100 TB a single 5%-share key is a 5 TB straggler
  * partition. The split routes hot-key rows through a broadcast join
  * (no shuffle at all — each map task joins its own rows against the
  * broadcast dim slice) and only the well-distributed remainder
  * through the shuffle join; the union is row-identical to the plain
  * join.
  *
  * When to use over the alternatives: AQE's skew-join handling
  * (`spark.sql.adaptive.skewJoin.enabled`) already splits oversized
  * SORT-MERGE partitions at runtime and is the right default — this
  * op is for the shapes AQE cannot fix: a shuffled HASH join (AQE
  * splits only sort-merge), a skew AQE's post-shuffle statistics
  * under-detect (one giant key inside a median-sized partition mix),
  * or when the planner must guarantee no straggler BEFORE launch.
  * [[SkewGuard.keySkew]] is the diagnostic that decides; this op is
  * the remedy. Salting (the [[TopK]] discipline) is the large×large
  * fallback when even the hot dim slice is too big to broadcast —
  * for fact ⋈ dimension, hot keys are few by definition and their
  * dim slice broadcasts for free.
  *
  * Reference anchor: funding_stats_etl.py:61-78 joins the full
  * funding history against the symbol universe — uniform there, but
  * the same join keyed on a production-skewed column (one symbol =
  * half the ticks) is this op's exact shape.
  */
object SkewJoin {

  /** Inner equi-join `fact ⋈ dim` on `key`, hot-key rows (fact count
    * ≥ `hotThreshold`) routed via broadcast. Row-identical to
    * `fact.join(dim, Seq(key))` for every threshold. The hot-key scan
    * is one map-side-combined aggregate (shuffles distinct keys, not
    * rows); `maxHotKeys` bounds the hot set and the broadcasts,
    * failing loudly instead of degrading — a threshold that
    * classifies half the key universe as hot is a mis-diagnosis, not
    * a plan.
    *
    * The hot set never materializes as a literal predicate: routing is
    * a broadcast semi/anti-join against the (tiny) hot-key frame — an
    * In-list of thousands of keys evaluated per fact row is exactly
    * the per-row O(hot) scan this op exists to avoid. NULL keys match
    * nothing in an inner join; the null-rejecting semi-join routes
    * them cold, where the join drops them — never lost from BOTH
    * branches. */
  def skewInnerJoin(fact: DataFrame, dim: DataFrame, key: String,
      hotThreshold: Long, maxHotKeys: Int = 10000): DataFrame = {
    require(hotThreshold >= 1, s"hotThreshold must be >= 1, got $hotThreshold")
    val hotKeys = fact.groupBy(col(key))
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") >= hotThreshold && col(key).isNotNull)
      .select(col(key))
    val nHot = hotKeys.count() // the only driver-side value: a count
    if (nHot > maxHotKeys)
      throw new IllegalArgumentException(
        s"$nHot keys exceed hotThreshold=$hotThreshold (cap " +
          s"$maxHotKeys) — the key is not skewed, it is merely " +
          "low-cardinality; use a plain shuffle join or raise the threshold")
    if (nHot == 0) return fact.join(dim, Seq(key))
    val hotSide = fact.join(broadcast(hotKeys), Seq(key), "left_semi")
      .join(broadcast(dim.join(broadcast(hotKeys), Seq(key), "left_semi")),
        Seq(key))
    val coldSide = fact.join(broadcast(hotKeys), Seq(key), "left_anti")
      .join(dim.join(broadcast(hotKeys), Seq(key), "left_anti"), Seq(key))
    hotSide.unionByName(coldSide)
  }
}
