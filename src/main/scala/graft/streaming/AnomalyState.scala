package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** One emitted anomaly alert. */
final case class AnomalyOut(symbol: String, ts: Timestamp, value: Double,
    zscore: Double, n_win: Long)

/** Streaming z-score anomaly detection — the stateful counterpart of the
  * batch `g3_zscore_anomaly` query (TimeSeriesQueries): each observation
  * is scored against the trailing window of its key, and only the
  * |z| > threshold alerts are emitted (alert streams must stay sparse —
  * the quiet path produces NO output rows, unlike the trailing-mean
  * processor which emits every tick).
  *
  * Semantics vs batch g3: the frame for a row is the ≤ n newest STORED
  * observations at-or-before its event time. In-order streams match the
  * batch frame exactly; an out-of-order arrival is scored against what
  * the bounded state still holds of its past (state keeps the n newest
  * overall — the O(n)-per-key bound is the contract that lets this run
  * forever, same shape as [[TrailingProcessor]]).
  *
  * Scale shape: state is n observations per key, shuffles only the key +
  * payload, and requires the RocksDB state store (multiple column
  * families — same requirement as TrailingState).
  */
class AnomalyProcessor(n: Int, minObs: Int, threshold: Double)
    extends StatefulProcessor[String, KeyedObs, AnomalyOut] {

  @transient private var recent: ListState[TrailingObs] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    recent = getHandle.getListState[TrailingObs]("recent",
      Encoders.product[TrailingObs], TTLConfig.NONE)
  }

  override def handleInputRows(key: String, rows: Iterator[KeyedObs],
      timerValues: TimerValues): Iterator[AnomalyOut] = {
    val incoming = rows.toSeq
    if (incoming.isEmpty) Iterator.empty
    else {
      var window = recent.get().toSeq
      val alerts = Seq.newBuilder[AnomalyOut]
      // event-time order within the batch: state evolves deterministically
      // regardless of how rows were packed into partitions
      incoming.sortBy(r => (r.ts.getTime, r.value)).foreach { r =>
        window = (TrailingObs(r.ts.getTime, r.value) +: window)
          .sortBy(o => (-o.ts, -o.rate)).take(n)
        // frame = stored observations at-or-before this row (the batch
        // "ROWS 23 PRECEDING AND CURRENT" analogue), incl. the row itself
        val frame = window.filter(_.ts <= r.ts.getTime)
        if (frame.size >= minObs) {
          val xs = frame.map(_.rate)
          val mean = xs.sum / xs.size
          val variance =
            xs.map(x => (x - mean) * (x - mean)).sum / (xs.size - 1)
          val std = math.sqrt(variance)
          if (std > 0) {
            val z = (r.value - mean) / std
            if (math.abs(z) > threshold)
              alerts += AnomalyOut(key, r.ts, r.value, z, frame.size.toLong)
          }
        }
      }
      recent.clear()
      recent.put(window.toArray)
      alerts.result().iterator
    }
  }
}

object AnomalyState {

  /** Wire the anomaly detector over a stream of [[KeyedObs]]. */
  def detect(obs: Dataset[KeyedObs], n: Int, minObs: Int,
      threshold: Double): Dataset[AnomalyOut] = {
    val spark = obs.sparkSession
    import spark.implicits._
    obs.groupByKey(_.key)
      .transformWithState(new AnomalyProcessor(n, minObs, threshold),
        TimeMode.None(), OutputMode.Append())
  }
}
