package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join operators (SURVEY.md §2.3: J1-J3 plus the free Spark extras and the
  * as-of join extension).
  *
  * Scale discipline: dimension sides are broadcast explicitly
  * (BroadcastHashJoin — no shuffle of the fact side); key-universe
  * restriction is a `left_semi` (never a distinct + inner join, which
  * would shuffle twice).
  */
object Joins {

  /** J1: fact ⋈ broadcast dimension (funding_stats_etl.py:101 — the stats
    * ⋈ live-futures join; dimension is 100s of rows vs a 120-day fact). */
  def withDim(fact: DataFrame, dim: DataFrame, keys: Seq[String]): DataFrame =
    fact.join(broadcast(dim), keys, "inner")

  /** J2: restrict to the key universe of a dimension (left-semi). */
  def semiByKeys(fact: DataFrame, dim: DataFrame, keys: Seq[String]): DataFrame =
    fact.join(broadcast(dim), keys, "left_semi")

  /** Rows with no match in the dimension (left-anti). */
  def antiByKeys(fact: DataFrame, dim: DataFrame, keys: Seq[String]): DataFrame =
    fact.join(broadcast(dim), keys, "left_anti")

  /** As-of alignment *within one table*: for each `right`-tagged row, the
    * latest `left`-tagged row of the same key at-or-before it in time.
    *
    * Implemented as a single window pass (`last(_, ignoreNulls)` over an
    * unbounded-preceding frame) rather than a join: one shuffle on the key,
    * no join explosion, no range-condition nested loop — the formulation
    * that survives 100 TB.
    *
    * Determinism: the window's ROWS frame makes `asof_time`/`asof_value`
    * depend on within-tie row order, so (key, time, tieBreak) must be a
    * total order. Pass `tieBreak` (e.g. the event id) whenever (key,
    * time) alone is not unique — with no tiebreak and tied timestamps
    * the result is partition-layout-dependent.
    *
    * @param isLeft   predicate marking reference rows (e.g. quotes/views)
    * @param isRight  predicate marking probe rows (e.g. trades/purchases)
    * @param tieBreak extra orderBy columns completing the per-key total
    *                 order (a reference row ties-before a probe row at
    *                 equal (time, tieBreak) — frame is at-or-before).
    * @return probe rows with `asof_time`/`asof_value` of the latest
    *         reference row at-or-before each.
    */
  def asOfAligned(df: DataFrame, key: String, time: String, value: String,
      isLeft: Column, isRight: Column,
      tieBreak: Seq[Column] = Nil): DataFrame = {
    val w = Window.partitionBy(key)
      .orderBy(col(time).asc +: tieBreak: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // ONE struct-valued last, not separate time/value lasts: with two
    // windows a newest reference row carrying a NULL value would pair
    // its time with an OLDER row's value (ignoreNulls skips it in the
    // value window only) — (asof_time, asof_value) must come from the
    // same reference row.
    df.withColumn("__asof",
        last(when(isLeft, struct(col(time).as("t"), col(value).as("v"))),
          ignoreNulls = true).over(w))
      .filter(isRight)
      .withColumn("asof_time", col("__asof.t"))
      .withColumn("asof_value", col("__asof.v"))
      .drop("__asof")
  }

  /** Two-TABLE as-of join — the API callers with separate probe and
    * reference frames want (trades ⋈asof quotes): every `probe` row
    * gains `asof_time`/`asof_value`, the time and value of the latest
    * `reference` row with the same key at-or-before the probe's time.
    *
    * Same single-window machinery as [[asOfAligned]] (no join explosion,
    * no range nested loop — one shuffle on the key): the two frames
    * union on a minimal (key, time, value, side, tieBreak) schema with
    * the probe's full row riding along in a struct. Reference rows sort
    * BEFORE probe rows at equal (time, tieBreak) — an exactly-
    * simultaneous reference is visible to the probe.
    *
    * Determinism: (key, time, side, tieBreak) must totally order the
    * union. Pass the tie-break column names (one per frame, e.g. both
    * sides' event/sequence id) whenever (key, time) is not unique
    * within the reference frame. */
  def asOfJoin(probe: DataFrame, reference: DataFrame, key: String,
      probeTime: String, refTime: String, refValue: String,
      refTieBreak: Option[String] = None,
      probeTieBreak: Option[String] = None): DataFrame = {
    val payloadType = org.apache.spark.sql.types.StructType(
      probe.schema.fields)
    val vType = reference.schema(refValue).dataType
    def tb(df: DataFrame, name: Option[String]) =
      name.map(c => df(c).cast("string")).getOrElse(lit(""))
    val refSide = reference.select(
      col(key).as("__k"), col(refTime).as("__t"),
      col(refValue).as("__v"), lit(0).as("__side"),
      tb(reference, refTieBreak).as("__tb"),
      lit(null).cast(payloadType).as("__p"))
    val probeSide = probe.select(
      col(key).as("__k"), col(probeTime).as("__t"),
      lit(null).cast(vType).as("__v"), lit(1).as("__side"),
      tb(probe, probeTieBreak).as("__tb"),
      struct(probe.columns.toIndexedSeq.map(col): _*).as("__p"))
    val w = Window.partitionBy("__k")
      .orderBy(col("__t").asc, col("__side").asc, col("__tb").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // single struct-valued last (see asOfAligned): time and value must
    // come from the same reference row even when that row's value is null
    refSide.unionByName(probeSide)
      .withColumn("__asof",
        last(when(col("__side") === 0,
            struct(col("__t").as("t"), col("__v").as("v"))),
          ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(col("__p.*"), col("__asof.t").as("asof_time"),
        col("__asof.v").as("asof_value"))
  }

  /** Interval-overlap join without a cross product: pairs (a, b) whose
    * half-open intervals [start, end) intersect — `a.s < b.e AND
    * b.s < a.e`. The naive plan is a Cartesian product with a non-equi
    * predicate (O(|A|·|B|)); this grid-partitions time instead: each
    * interval explodes to the coarse buckets it spans, candidates
    * equi-join on the bucket key (a plain shuffle join), the exact
    * predicate verifies, and DISTINCT collapses pairs that met in more
    * than one shared bucket. Candidate volume is Σ per-bucket |A|·|B| —
    * bounded by temporal locality instead of table sizes, the same
    * bucketize-then-verify discipline as the LSH dedup family.
    *
    * `bucketSeconds` trades explode factor against candidate density:
    * pick it near the typical interval length (an interval then spans
    * ~2 buckets).
    *
    * Inputs need (`id`, `startSec`, `endSec`) columns (epoch seconds,
    * end exclusive); outputs one row per overlapping (a_id, b_id).
    */
  def intervalOverlap(a: DataFrame, b: DataFrame,
      bucketSeconds: Long): DataFrame = {
    require(bucketSeconds > 0)
    // Half-open contract: an empty/inverted interval (endSec <= startSec)
    // overlaps nothing. Without this filter, sequence(start, stop)
    // generates a DESCENDING range when stop < start (so the row still
    // explodes to buckets) and the predicate a_s < b_e && b_s < a_e holds
    // for an empty interval sitting inside a non-empty one — emitting
    // pairs that the contract says do not overlap.
    def exploded(raw: DataFrame, p: String): DataFrame = raw
      .filter(col("endSec") > col("startSec"))
      .select(
      col("id").as(s"${p}_id"),
      col("startSec").as(s"${p}_s"), col("endSec").as(s"${p}_e"),
      explode(sequence(
        expr(s"startSec div $bucketSeconds"),
        // end EXCLUSIVE: an interval ending exactly on a bucket boundary
        // does not reach into that bucket
        expr(s"(endSec - 1) div $bucketSeconds"))).as("__bkt"))
    exploded(a, "a").join(exploded(b, "b"), "__bkt")
      .filter(col("a_s") < col("b_e") && col("b_s") < col("a_e"))
      .select("a_id", "b_id").distinct()
  }
}
