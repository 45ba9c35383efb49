package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Keyset (cursor) pagination — the scale-correct page fetch. OFFSET
  * pagination produces and discards every earlier row (page 10,000 of a
  * 100 TB table scans 10,000 pages); a keyset cursor turns the same page
  * into a pushed-down range predicate on the last-seen sort tuple plus a
  * top-k — cost per page is one pruned scan + TakeOrderedAndProject,
  * independent of how deep the page is. Same cursor-loop I/O discipline
  * as the S5 backfill (ops/Backfill.scala): the cursor is ONE tiny row
  * localized at the driver between pages, never the data path.
  *
  * Correctness invariant (the s5 discipline, proven in KeysetSpec): the
  * disjoint union of all pages equals one sorted scan — no row dropped or
  * duplicated, including when a run of equal leading-key values straddles
  * a page boundary. That requires the sort tuple to be a TOTAL order:
  * callers must put a unique key last (the reference shape:
  * (o_orderdate, o_orderkey)) and sort columns must be non-null — a NULL
  * on a page boundary is detected at walk time and refused.
  */
object Keyset {

  /** Lexicographic "row > cursor" over `sortCols`, spelled as the
    * explicit OR-of-prefixes so every engine (and every oracle) plans
    * the identical predicate:
    * (c1 > v1) OR (c1 = v1 AND c2 > v2) OR ... — sargable on the
    * leading column, so partition pruning and parquet row-group skipping
    * still apply. */
  def after(sortCols: Seq[String], cursor: Seq[Column]): Column = {
    require(sortCols.nonEmpty && sortCols.length == cursor.length,
      s"sortCols (${sortCols.length}) and cursor (${cursor.length}) " +
        "must align")
    sortCols.indices.map { i =>
      val eqPrefix = (0 until i)
        .map(j => col(sortCols(j)) === cursor(j))
        .foldLeft(lit(true))(_ && _)
      eqPrefix && col(sortCols(i)) > cursor(i)
    }.reduce(_ || _)
  }

  /** One page of `n` rows after `cursor` (None = first page) in
    * `sortCols` order. The predicate prunes, the limit is a top-k —
    * never a global sort. */
  def page(df: DataFrame, sortCols: Seq[String],
      cursor: Option[Seq[Column]], n: Int): DataFrame = {
    val from = cursor.fold(df)(c => df.filter(after(sortCols, c)))
    from.orderBy(sortCols.map(col): _*).limit(n)
  }

  /** Walk ALL pages from the start, localizing only each page's sort
    * tuples at the driver (pages × n × |sortCols| values — the cursor
    * and termination probe; never the payload columns).
    * Returns the pages in walk order. Bounded by
    * `maxPages` as a runaway guard: walking a whole 100 TB table
    * through a driver loop is a misuse this op refuses to hide. */
  def walk(df: DataFrame, sortCols: Seq[String], n: Int,
      maxPages: Int = 10000): Seq[DataFrame] = {
    require(n > 0)
    val pages = Seq.newBuilder[DataFrame]
    var cursor: Option[Seq[Column]] = None
    var pageCount = 0
    var done = false
    while (!done) {
      if (pageCount >= maxPages)
        throw new IllegalStateException(
          s"Keyset.walk exceeded maxPages=$maxPages — refusing to " +
            "stream the whole table through a driver loop")
      val p = page(df, sortCols, cursor, n)
      val rows = p.select(sortCols.map(col): _*).collect()
      if (rows.isEmpty) done = true
      else {
        pages += p
        pageCount += 1
        if (rows.length < n) done = true
        else {
          val lastRow = rows.last
          // A NULL landing on the page boundary would make every
          // comparison in after() evaluate to NULL — empty next page,
          // early termination, table silently truncated. Refuse loudly
          // instead (the maxPages discipline). Ascending order puts
          // NULLS FIRST, so a non-null boundary row proves every null
          // row was already emitted on an earlier page.
          sortCols.indices.foreach { i =>
            if (lastRow.isNullAt(i))
              throw new IllegalStateException(
                s"Keyset.walk: NULL in sort column '${sortCols(i)}' at " +
                  "a page boundary — the cursor predicate cannot order " +
                  "NULLs and the walk would silently truncate; keyset " +
                  "sort columns must be non-null")
          }
          cursor = Some(sortCols.indices.map(i => lit(lastRow.get(i))))
        }
      }
    }
    pages.result()
  }
}
