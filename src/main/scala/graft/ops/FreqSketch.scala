package graft.ops

import org.apache.spark.sql.{DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Misra-Gries heavy-hitters sketch as a typed Spark [[Aggregator]] —
  * the mergeable-summaries answer to "top items of a 100 TB column".
  * An exact global count ([[SkewGuard.keySkew]]) shuffles one row per
  * DISTINCT key; when the key universe itself is huge (tokens, URLs,
  * user agents), this sketch caps state at k counters per partition
  * and merges in O(k log k) — constant memory regardless of
  * cardinality, one map-side-combined pass, no driver involvement.
  * The buffer is a plain catalyst-encodable Map (no kryo — Java 17
  * module walls), and Spark's object-hash aggregation keeps it as a
  * live object between rows, serializing only at the shuffle boundary.
  *
  * Guarantee (Misra-Gries; merges preserve it, Agarwal et al.,
  * "Mergeable Summaries", PODS'12): for every item,
  * `true - n/(k+1) <= est <= true` — so every item with true count
  * > n/(k+1) is REPORTED (it cannot decay to zero), and estimates
  * never overcount. Which low-frequency items survive alongside the
  * heavy ones depends on partitioning/merge order (the standard MG
  * indeterminacy); the guarantee above is what callers may rely on,
  * and is what the oracle-checked query verifies.
  *
  * Reference anchor: pure training-data extension (corpus token/domain
  * frequency at scales where exact counting is its own job).
  */
object FreqSketch {

  /** One MG summary: item → estimated count, at most k entries. */
  type Summary = Map[String, Long]

  private[graft] def reduceOne(m: Summary, item: String, k: Int): Summary =
    m.get(item) match {
      case Some(v) => m.updated(item, v + 1L)
      case None if m.size < k => m.updated(item, 1L)
      case None =>
        // decrement-all: drop every counter by 1, evict zeros — the
        // classic O(k) amortized step that buys the n/(k+1) bound
        m.flatMap { case (key, v) =>
          if (v <= 1L) None else Some(key -> (v - 1L))
        }
    }

  private[graft] def mergeTwo(a: Summary, b: Summary, k: Int): Summary = {
    val combined = b.foldLeft(a) { case (acc, (item, v)) =>
      acc.updated(item, acc.getOrElse(item, 0L) + v)
    }
    if (combined.size <= k) combined
    else {
      // subtract the (k+1)-th largest count from everything, evict <= 0
      // — the mergeable-summaries reduction back to k counters
      val cut = combined.values.toArray.sortInPlaceWith(_ > _).apply(k)
      combined.flatMap { case (key, v) =>
        if (v - cut <= 0L) None else Some(key -> (v - cut))
      }
    }
  }

  /** The Aggregator, generic in its input via `itemOf` (Aggregator has
    * no contramap): feed rows, sketch the extracted string. */
  class MisraGriesOn[I](k: Int, itemOf: I => String)
    extends Aggregator[I, Summary, Summary] {
    require(k >= 1, s"sketch capacity k must be >= 1, got $k")
    def zero: Summary = Map.empty
    def reduce(m: Summary, row: I): Summary = {
      val item = itemOf(row)
      if (item == null) m else reduceOne(m, item, k)
    }
    def merge(a: Summary, b: Summary): Summary = mergeTwo(a, b, k)
    def finish(m: Summary): Summary = m
    def bufferEncoder: Encoder[Summary] = ExpressionEncoder()
    def outputEncoder: Encoder[Summary] = ExpressionEncoder()
  }

  /** The plain string-column form — usable per-group
    * (`ds.groupByKey(...).agg(...)`) or globally via
    * [[heavyHitters]]. */
  final class MisraGries(k: Int) extends MisraGriesOn[String](k, identity)

  /** Merges already-built summaries (rows ARE summaries) — the
    * aggregator a DURABLE state merge needs: `state ⊕ delta` unions two
    * summary rows per group, each side itself a mergeable MG summary.
    * `k` must match the k the summaries were built with — a smaller k
    * here would silently tighten capacity, a larger one weaken the
    * bound the state claims. */
  final class MergeSummaries(k: Int)
    extends Aggregator[Summary, Summary, Summary] {
    require(k >= 1, s"sketch capacity k must be >= 1, got $k")
    def zero: Summary = Map.empty
    def reduce(m: Summary, row: Summary): Summary =
      if (row == null) m else mergeTwo(m, row, k)
    def merge(a: Summary, b: Summary): Summary = mergeTwo(a, b, k)
    def finish(m: Summary): Summary = m
    def bufferEncoder: Encoder[Summary] = ExpressionEncoder()
    def outputEncoder: Encoder[Summary] = ExpressionEncoder()
  }

  /** Global heavy hitters of string column `itemCol`: (item, est_count)
    * rows, at most k, est ∈ [true − n/(k+1), true]. One pass: partial
    * sketches per partition, merged — never a per-distinct-key
    * shuffle. */
  def heavyHitters(df: DataFrame, itemCol: String, k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val summary = df.select(col(itemCol).cast("string")).as[String]
      .select(new MisraGries(k).toColumn.name("summary"))
    summary.select(explode(col("summary")).as(Seq("item", "est_count")))
  }

  /** Per-group heavy hitters: (group, item, est_count), at most k items
    * per group, the same MG bound per group (n = the GROUP's row
    * count). One aggregation whose state is k counters per group —
    * partial sketches merge map-side, so the shuffle carries one
    * summary per (task, group), never the rows. */
  def heavyHittersPerGroup(df: DataFrame, groupCol: String,
      itemCol: String, k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(groupCol).cast("string"), col(itemCol).cast("string"))
      .as[(String, String)]
      .groupByKey(_._1)
      .agg(new MisraGriesOn[(String, String)](k, _._2)
        .toColumn.name("summary"))
      .toDF(groupCol, "summary")
      .select(col(groupCol),
        explode(col("summary")).as(Seq("item", "est_count")))
  }
}
