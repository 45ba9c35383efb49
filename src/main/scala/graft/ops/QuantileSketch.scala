package graft.ops

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.{DataFrame, Encoder, Row}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{BinaryType, StructType}

/** KLL quantile sketch over a numeric column — mergeable quantiles for
  * data too big to sort. An exact percentile (`a10`) needs a global
  * sort or a full value shuffle; the KLL summary is a few KB per
  * partition, merges associatively, and bounds its NORMALIZED RANK
  * error (±~1.65% at the default k=200, a published guarantee of the
  * sketch family — Karnin/Lang/Liberty, FOCS'16; the DataSketches
  * implementation ships inside Spark itself).
  *
  * Shape: one `mapPartitions` pass builds a per-partition sketch (the
  * explicitly-blessed use of partition-imperative code: custom
  * mergeable partial state), then a treeReduce merges KB-sized byte
  * arrays — the fact table never shuffles at all, not even one row per
  * group. The returned summary is serialized bytes: store it, ship it,
  * [[merge]] it with tomorrow's (split-insensitivity is spec-proven),
  * and read any quantile out with [[quantilesOf]].
  *
  * Reference anchor: pure training-data extension (corpus length/score
  * distributions at sizes where exact percentiles are their own job).
  */
object QuantileSketch {

  /** Serialized KLL summary of `valueCol` (nulls skipped). One pass,
    * no shuffle; `k` trades size for rank error (200 ≈ ±1.65%). */
  def global(df: DataFrame, valueCol: String, k: Int = 200): Array[Byte] = {
    val spark = df.sparkSession
    import spark.implicits._
    require(k >= 8, s"k must be >= 8, got $k")
    val partials = df.select(col(valueCol).cast("double")).as[Option[Double]]
      .mapPartitions { it =>
        val sk = KllDoublesSketch.newHeapInstance(k)
        it.foreach(_.foreach(sk.update))
        Iterator(sk.toByteArray)
      }
    val rdd = partials.rdd
    // an all-filtered input can optimize to a zero-partition relation;
    // surface that as the sketch's own empty summary, not a crash
    if (rdd.isEmpty()) KllDoublesSketch.newHeapInstance(k).toByteArray
    else rdd.treeReduce((a, b) => merge(a, b))
  }

  /** Merge two serialized summaries (associative + commutative — the
    * property that makes the sketch storable incremental state). */
  def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val sa = KllDoublesSketch.heapify(Memory.wrap(a))
    sa.merge(KllDoublesSketch.heapify(Memory.wrap(b)))
    sa.toByteArray
  }

  /** Quantile estimates at `probs` from a serialized summary; empty
    * input yields NaNs (the sketch's empty semantics surfaced as-is). */
  def quantilesOf(bytes: Array[Byte], probs: Seq[Double]): Seq[Double] = {
    require(probs.forall(p => p >= 0.0 && p <= 1.0),
      s"probabilities must be in [0,1], got $probs")
    val sk = KllDoublesSketch.heapify(Memory.wrap(bytes))
    if (sk.isEmpty) probs.map(_ => Double.NaN)
    else {
      import org.apache.datasketches.quantilescommon.QuantileSearchCriteria
      probs.map(p => sk.getQuantile(p, QuantileSearchCriteria.INCLUSIVE))
    }
  }

  /** Rows in the summary (for n-based bound checks). */
  def countOf(bytes: Array[Byte]): Long =
    KllDoublesSketch.heapify(Memory.wrap(bytes)).getN

  /** PER-GROUP serialized KLL summaries: (keys..., kll_sketch), one
    * row per group present in `df`. The same blessed shape as
    * [[global]], grouped: each partition builds one live sketch per
    * group it sees (partition-imperative mergeable partial state —
    * never a per-row serialize), then the KB-sized partials reduce by
    * key. The shuffle carries one summary per (task, group), never the
    * rows — the aggregate a durable per-group quantile state needs. */
  def groupedPartials(df: DataFrame, keys: Seq[String], valueCol: String,
      k: Int = 200): DataFrame = {
    require(keys.nonEmpty, "groupedPartials needs >= 1 key column")
    require(k >= 8, s"k must be >= 8, got $k")
    val spark = df.sparkSession
    val sel = df.select(
      (keys.map(col) :+ col(valueCol).cast("double").as("__v")): _*)
    val nk = keys.length
    val outSchema = StructType(sel.schema.fields.dropRight(1))
      .add("kll_sketch", BinaryType, nullable = false)
    val partials = sel.rdd.mapPartitions { it =>
      val m = scala.collection.mutable.LinkedHashMap[
        Seq[Any], KllDoublesSketch]()
      it.foreach { r =>
        val key = (0 until nk).map(r.get)
        // the group registers even if this row's value is null, so the
        // partial frame covers exactly the groups a count(*) agg sees
        val sk = m.getOrElseUpdate(key, KllDoublesSketch.newHeapInstance(k))
        if (!r.isNullAt(nk)) sk.update(r.getDouble(nk))
      }
      m.iterator.map { case (key, sk) => Row.fromSeq(key :+ sk.toByteArray) }
    }
    val mergeUdaf = org.apache.spark.sql.functions.udaf(
      new MergeKll(k), org.apache.spark.sql.Encoders.BINARY)
    spark.createDataFrame(partials, outSchema)
      .groupBy(keys.map(col): _*)
      .agg(mergeUdaf(col("kll_sketch")).as("kll_sketch"))
  }

  /** Merges serialized summaries (rows ARE summaries) — the aggregator
    * that folds per-partition partials, and `state ⊕ delta` for a
    * durable quantile state. `k` only sizes the empty-input fallback;
    * merging itself reads each summary's own k. */
  final class MergeKll(k: Int)
    extends Aggregator[Array[Byte], Array[Byte], Array[Byte]] {
    def zero: Array[Byte] = Array.emptyByteArray
    def reduce(b: Array[Byte], row: Array[Byte]): Array[Byte] =
      if (row == null || row.isEmpty) b
      else if (b.isEmpty) row
      else merge(b, row)
    def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] =
      if (a.isEmpty) b else if (b.isEmpty) a
      else QuantileSketch.merge(a, b)
    def finish(b: Array[Byte]): Array[Byte] =
      if (b.isEmpty) KllDoublesSketch.newHeapInstance(k).toByteArray else b
    def bufferEncoder: Encoder[Array[Byte]] = ExpressionEncoder()
    def outputEncoder: Encoder[Array[Byte]] = ExpressionEncoder()
  }
}
