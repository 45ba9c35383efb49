package graft.ops

import scala.annotation.tailrec

import org.apache.spark.sql.DataFrame

/** Cold-start backfill via cursor pagination (SURVEY.md S5 — the
  * reference's dormant `hasMore`/`endTime` loop,
  * funding_rates_etl.py:38-66).
  *
  * The page fetch is a driver-side I/O boundary (HTTP in the reference;
  * any `cursor => page` source here); pages union into one logical
  * DataFrame, so Spark sees a single plan over all pages — downstream
  * transforms and writes distribute normally, and nothing materializes on
  * the driver. The incremental head-of-stream path (the reference's
  * `head(1)` fast path, :68) is the streaming pipeline's job
  * (graft.streaming); backfill is its batch complement sharing the same
  * transform code.
  */
object Backfill {

  /** One page: rows + the cursor for the next page (None = done). */
  final case class Page(rows: DataFrame, next: Option[Long])

  /** Fetch pages from `start` until the source reports no more (or
    * `maxPages`, a runaway guard), union them. Returns None if the very
    * first fetch yields no page. */
  def paginate(fetch: Option[Long] => Option[Page],
      maxPages: Int = 10000): Option[DataFrame] = {
    @tailrec
    def loop(cursor: Option[Long], acc: Option[DataFrame],
        pages: Int): Option[DataFrame] =
      if (pages >= maxPages) acc
      else fetch(cursor) match {
        case None => acc
        case Some(Page(rows, next)) =>
          val merged = acc match {
            case Some(df) => Some(df.unionByName(rows))
            case None     => Some(rows)
          }
          next match {
            case some @ Some(_) => loop(some, merged, pages + 1)
            case None           => merged
          }
      }
    loop(None, None, 0)
  }
}
