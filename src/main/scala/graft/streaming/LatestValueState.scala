package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One observation of a keyed time series. */
final case class KeyedObs(key: String, ts: Timestamp, value: Double)

/** Current newest observation per key. */
final case class KeyedLatest(key: String, ts: Timestamp, value: Double,
    n_seen: Long)

/** Custom keyed state via `mapGroupsWithState`: track the newest
  * observation per key across micro-batches — the stateful streaming form
  * of the reference's incremental head(1) fast path
  * (funding_rates_etl.py:26-29,68: "what is the newest funding point I
  * have?") and of A6 latest-value-per-group.
  *
  * Semantics: out-of-order rows within and across batches are absorbed —
  * the state keeps the max-(ts, value) observation under a commutative,
  * associative reduce over the group iterator, so the result depends only
  * on the observation set, never on arrival order (Spark does not
  * guarantee group-iterator ordering). State is O(1) per key — the shape
  * that scales to any key cardinality with state-store partitioning.
  */
object LatestValueState {

  private def newer(a: KeyedLatest, b: KeyedObs): KeyedLatest = {
    val takeB = b.ts.after(a.ts) ||
      (b.ts.equals(a.ts) && b.value > a.value)
    val merged = if (takeB) KeyedLatest(b.key, b.ts, b.value, 0) else a
    merged.copy(n_seen = a.n_seen + 1)
  }

  def update(key: String, rows: Iterator[KeyedObs],
      state: GroupState[KeyedLatest]): KeyedLatest = {
    val init = state.getOption.getOrElse(
      KeyedLatest(key, new Timestamp(Long.MinValue), Double.MinValue, 0))
    val next = rows.foldLeft(init)(newer)
    state.update(next)
    next
  }

  /** Wire the tracker over a stream of [[KeyedObs]]. Update mode: each
    * trigger emits the keys whose state changed. */
  def track(obs: Dataset[KeyedObs]): Dataset[KeyedLatest] = {
    val spark = obs.sparkSession
    import spark.implicits._
    obs.groupByKey(_.key)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(update)
  }
}
