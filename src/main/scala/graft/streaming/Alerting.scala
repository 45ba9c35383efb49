package graft.streaming

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener.{QueryIdleEvent, QueryProgressEvent, QueryStartedEvent, QueryTerminatedEvent}

/** Failure alerting for streaming queries — the Structured-Streaming
  * form of the reference's per-task `retries=5, retry_delay=1min,
  * email_on_failure` policy (kucoin_main_dag.py:10-17): task retries map
  * to `spark.task.maxFailures`; the alert hook is a
  * [[StreamingQueryListener]] observing terminations.
  *
  * [[FailureAlerts]] records every exceptional termination and hands it
  * to a pluggable `notify` callback (the reference's email); the
  * in-memory queue keeps the last alerts inspectable for tests and
  * health endpoints.
  */
final class FailureAlerts(notify: String => Unit = _ => ())
    extends StreamingQueryListener {
  import Alerting.Alert

  /** Bounded history — a supervision loop restarting a persistently
    * failing query must not leak driver memory over weeks. */
  private val MaxKept = 100
  private val alerts = new ConcurrentLinkedQueue[Alert]()

  def recent: Seq[Alert] = {
    val it = alerts.iterator()
    val buf = Seq.newBuilder[Alert]
    while (it.hasNext) buf += it.next()
    buf.result()
  }

  override def onQueryStarted(event: QueryStartedEvent): Unit = ()
  override def onQueryProgress(event: QueryProgressEvent): Unit = ()
  override def onQueryIdle(event: QueryIdleEvent): Unit = ()

  override def onQueryTerminated(event: QueryTerminatedEvent): Unit =
    event.exception.foreach { e =>
      val a = Alert(event.id.toString, e)
      alerts.add(a)
      while (alerts.size > MaxKept) alerts.poll()
      notify(s"streaming query ${a.queryId} failed: ${a.message}")
    }
}

object Alerting {

  final case class Alert(queryId: String, message: String)

  /** Register a failure listener on the session; returns it for
    * inspection. */
  def install(spark: SparkSession,
      notify: String => Unit = _ => ()): FailureAlerts = {
    val l = new FailureAlerts(notify)
    spark.streams.addListener(l)
    l
  }
}
