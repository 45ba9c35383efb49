package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** One stored observation in trailing state. */
final case class TrailingObs(ts: Long, rate: Double)

/** Incremental trailing-mean emission per key. */
final case class TrailingOut(symbol: String, latest: Double,
    mean_n: Option[Double], n_seen: Long)

/** The flagship trailing-mean kernel (SURVEY §2.4 A4-A6) maintained
  * INCREMENTALLY per key via Spark 4's `transformWithState` — the modern
  * arbitrary-state API superseding mapGroupsWithState.
  *
  * Where [[FundingStatsStream]] rebuilds the stats table from the sink
  * each tick (the reference's replace semantics), this processor keeps
  * O(N) state per key — the N newest observations plus a count — and
  * emits the updated trailing mean on every batch: state size is bounded
  * by horizon × key-count regardless of history length, the shape that
  * scales to unbounded streams. The count gate (< N observations → null
  * mean) matches the batch kernel exactly.
  *
  * Requires the RocksDB state store
  * (`spark.sql.streaming.stateStore.providerClass` =
  * `...state.RocksDBStateStoreProvider`) — the default HDFS-backed store
  * does not support the API's multiple column families.
  */
class TrailingProcessor(n: Int)
    extends StatefulProcessor[String, KeyedObs, TrailingOut] {

  @transient private var recent: ListState[TrailingObs] = _
  @transient private var seen: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    recent = getHandle.getListState[TrailingObs]("recent",
      Encoders.product[TrailingObs], TTLConfig.NONE)
    seen = getHandle.getValueState[Long]("seen",
      Encoders.scalaLong, TTLConfig.NONE)
  }

  override def handleInputRows(key: String, rows: Iterator[KeyedObs],
      timerValues: TimerValues): Iterator[TrailingOut] = {
    val incoming = rows.map(r => TrailingObs(r.ts.getTime, r.value)).toSeq
    if (incoming.isEmpty) Iterator.empty
    else {
      // merge, keep the N newest (deterministic tie-break on rate)
      val merged = (recent.get().toSeq ++ incoming)
        .sortBy(o => (-o.ts, -o.rate)).take(n)
      recent.clear()
      recent.put(merged.toArray)
      val total = (if (seen.exists()) seen.get() else 0L) + incoming.size
      seen.update(total)
      val mean =
        if (total >= n) Some(merged.map(_.rate).sum / n) else None
      Iterator.single(TrailingOut(key, merged.head.rate, mean, total))
    }
  }
}

object TrailingState {

  /** Wire the incremental trailing-mean over a stream of [[KeyedObs]]. */
  def track(obs: Dataset[KeyedObs], n: Int): Dataset[TrailingOut] = {
    val spark = obs.sparkSession
    import spark.implicits._
    obs.groupByKey(_.key)
      .transformWithState(new TrailingProcessor(n),
        TimeMode.None(), OutputMode.Update())
  }
}
