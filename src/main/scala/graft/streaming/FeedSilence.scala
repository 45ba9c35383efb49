package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** One emitted feed-silence alert. */
final case class SilenceAlert(symbol: String, last_seen: Timestamp,
    silence_ms: Long)

/** Feed-silence alerting: raise exactly one alert per key whose stream
  * has gone quiet for `silenceMs` of EVENT time — the "funding feed
  * stopped ticking" monitor (the reference alerts on task FAILURE,
  * kucoin_main_dag.py:12-17; a feed that silently stops producing rows
  * fails nothing — this is the operator that catches it).
  *
  * Mechanics: every arrival re-arms an event-time timer at
  * last_seen + silenceMs (deleting the previous deadline); the timer
  * fires when the WATERMARK passes it — so "silent" is judged by the
  * stream's own event-time frontier, robust to processing lag, and a
  * key that resumes before its deadline never alerts. A stale timer
  * (re-armed after an out-of-order batch) is recognized and swallowed
  * by comparing its expiry against the current deadline.
  *
  * Scale shape: O(1) state per key (one long + one timer); alerts are
  * the ONLY output (quiet healthy keys emit nothing).
  */
class SilenceProcessor(silenceMs: Long)
    extends StatefulProcessor[String, KeyedObs, SilenceAlert] {

  @transient private var lastSeen: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    lastSeen = getHandle.getValueState[Long]("lastSeen",
      Encoders.scalaLong, TTLConfig.NONE)
  }

  override def handleInputRows(key: String, rows: Iterator[KeyedObs],
      timerValues: TimerValues): Iterator[SilenceAlert] = {
    val maxTs = rows.map(_.ts.getTime).foldLeft(Long.MinValue)(math.max)
    val prev = if (lastSeen.exists()) lastSeen.get() else Long.MinValue
    if (maxTs > prev) {
      // re-arm: the old deadline (if any) is superseded
      if (prev != Long.MinValue) getHandle.deleteTimer(prev + silenceMs)
      lastSeen.update(maxTs)
      getHandle.registerTimer(maxTs + silenceMs)
    }
    Iterator.empty
  }

  override def handleExpiredTimer(key: String, timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[SilenceAlert] = {
    val last = lastSeen.get()
    // only the CURRENT deadline alerts; an expiry re-armed away by a
    // late-arriving batch is stale
    if (expiredTimerInfo.getExpiryTimeInMs == last + silenceMs)
      Iterator.single(SilenceAlert(key, new Timestamp(last), silenceMs))
    else Iterator.empty
  }
}

object FeedSilence {

  /** Wire the silence monitor over a WATERMARKED stream of [[KeyedObs]]
    * (the caller sets `withWatermark` — its delay is how much event-time
    * disorder the deadline judgment tolerates). */
  def monitor(obs: Dataset[KeyedObs], silenceMs: Long): Dataset[SilenceAlert] = {
    val spark = obs.sparkSession
    import spark.implicits._
    obs.groupByKey(_.key)
      .transformWithState(new SilenceProcessor(silenceMs),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
