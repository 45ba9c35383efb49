package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A probe event awaiting as-of enrichment (e.g. a funding event that
  * wants the latest lending snapshot at-or-before it). */
final case class AsOfProbe(key: String, ts: Timestamp, payload: Double)

/** Union row of the two sides: `isRef=true` carries a reference value,
  * `isRef=false` a probe payload. */
final case class AsOfRow(key: String, ts: Timestamp, v: Double,
    isRef: Boolean)

/** Per-key buffered state: reference observations and not-yet-final
  * probes, both as (epochMillis, value) pairs. */
final case class AsOfBuf(refs: Seq[(Long, Double)],
    probes: Seq[(Long, Double)])

/** A probe finalized against the latest reference at-or-before it;
  * `asof_*` are None when no reference precedes the probe. */
final case class AsOfEnriched(key: String, ts: Timestamp, payload: Double,
    asof_time: Option[Timestamp], asof_value: Option[Double])

/** STREAMING as-of enrichment — the streaming form of the batch as-of
  * joins (`Joins.asOfAligned` / `Joins.asOfJoin`, SURVEY §2.3): each
  * probe event is paired with the latest reference observation of the
  * same key at-or-before its event time ("align funding events to the
  * latest lending snapshot", the reference's funding⋈lending enrichment
  * recomputed per 5-min tick in `funding_stats_etl.py:63-120`).
  *
  * Spark's built-in stream-stream interval join cannot express "the
  * LATEST at-or-before" (it emits every in-band match), so this is a
  * custom-state formulation over the unioned, watermarked two-side
  * stream: `flatMapGroupsWithState` buffers both sides per key and
  * finalizes a probe only once the watermark passes its event time —
  * at that point every reference with ts ≤ probe.ts has arrived (or is
  * beyond the allowed lateness), so a reference arriving LATE in
  * processing time but in-order in event time still wins. That is the
  * event-time-correct semantics the batch kernel has, which a naive
  * "enrich with whatever state holds now" join would violate.
  *
  * Scale shape: one shuffle on the key (the groupByKey), state bounded
  * by the lateness horizon — per key, the probes inside the watermark
  * gap plus the references newer than (the latest one at-or-before) the
  * watermark; everything older is pruned each invocation because no
  * future probe can be matched below the watermark. Keys that go quiet
  * degrade to O(1) state (one reference row). Event-time timeouts flush
  * pending probes when the watermark advances on OTHER keys' traffic,
  * so a quiet key's probes don't wait for its own next row.
  *
  * Determinism: references tied on ts order by value (greater wins);
  * emitted probes sort by (ts, payload) within a flush.
  */
object AsOfEnrich {

  private[streaming] def update(key: String, rows: Iterator[AsOfRow],
      state: GroupState[AsOfBuf]): Iterator[AsOfEnriched] = {
    val st = state.getOption.getOrElse(AsOfBuf(Nil, Nil))
    val (newRefs, newProbes) = rows.toSeq.partition(_.isRef)
    val refs = (st.refs ++ newRefs.map(r => (r.ts.getTime, r.v)))
      .sortBy(identity)
    val probes = st.probes ++ newProbes.map(p => (p.ts.getTime, p.v))
    val wm = state.getCurrentWatermarkMs()
    // a probe is final once no earlier-or-equal reference can still arrive
    val (ready, pending) = probes.partition(_._1 <= wm)
    val out = ready.sortBy(identity).map { case (pts, payload) =>
      val m = refs.filter(_._1 <= pts).lastOption
      AsOfEnriched(key, new Timestamp(pts), payload,
        m.map(x => new Timestamp(x._1)), m.map(_._2))
    }
    // prune: future probes all have ts > wm, so only the latest
    // reference at-or-before the watermark (plus everything after it)
    // can ever be a winner again
    val cut = refs.lastIndexWhere(_._1 <= wm)
    val prunedRefs = if (cut <= 0) refs else refs.drop(cut)
    state.update(AsOfBuf(prunedRefs, pending))
    // wake this key when the watermark passes its oldest pending probe,
    // even if the key itself sees no more traffic
    if (pending.nonEmpty)
      state.setTimeoutTimestamp(math.max(pending.map(_._1).min, wm + 1))
    out.iterator
  }

  /** Wire the enrichment over separate probe / reference streams.
    *
    * @param maxLateness watermark delay on the unioned stream — the
    *   bound on how out-of-order EITHER side may arrive; also the
    *   finalization latency of a probe.
    */
  def enrich(probes: Dataset[AsOfProbe], refs: Dataset[KeyedObs],
      maxLateness: String): Dataset[AsOfEnriched] = {
    val spark = probes.sparkSession
    import spark.implicits._
    val tagged = refs
      .map(r => AsOfRow(r.key, r.ts, r.value, isRef = true))
      .unionByName(probes.map(p => AsOfRow(p.key, p.ts, p.payload,
        isRef = false)))
      .withWatermark("ts", maxLateness)
    tagged.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(update)
  }
}
