package graft.streaming

import org.apache.spark.sql.sources

import graft.SparkSpec

/** [[SourceFilters]] soundness: translation may only ever WIDEN the
  * predicate (Spark re-applies the full original above). A partially
  * translated AND is wider — fine. Under NOT the polarity flips: a
  * wider child makes the negation NARROWER, which would drop matching
  * rows — so NOT demands exact translation all the way down. */
class SourceFiltersSpec extends SparkSpec {
  import spark.implicits._

  // StringContains is deliberately untranslatable in SourceFilters
  private val partial = sources.And(
    sources.EqualTo("a", 5), sources.StringContains("b", "x"))

  test("partially-translated AND widens (kept); NOT of it is abandoned") {
    val and = SourceFilters.toColumn(partial)
    assert(and.isDefined) // the translated conjunct still narrows files
    assert(SourceFilters.toColumn(sources.Not(partial)).isEmpty,
      "NOT over a partial AND must be abandoned, not narrowed")
    // nested: NOT(OR(partial-AND, exact)) must also be abandoned
    assert(SourceFilters.toColumn(sources.Not(sources.Or(
      partial, sources.EqualTo("a", 1)))).isEmpty)
  }

  test("NOT of exactly-translatable trees keeps exact semantics") {
    val df = Seq((5, "zx"), (5, "q"), (7, "zx")).toDF("a", "b")
    val f = sources.Not(sources.And(
      sources.EqualTo("a", 5), sources.EqualTo("b", "zx")))
    val c = SourceFilters.toColumn(f).get
    assert(df.filter(c).collect().map(r => (r.getInt(0), r.getString(1)))
      .toSet == Set((5, "q"), (7, "zx")))
  }

  test("OR requires both sides; widened sides stay sound positively") {
    assert(SourceFilters.toColumn(sources.Or(
      sources.EqualTo("a", 1), sources.StringContains("b", "x"))).isEmpty)
    val or = SourceFilters.toColumn(sources.Or(
      partial, sources.EqualTo("a", 9))).get
    val df = Seq((5, "q"), (9, "q"), (3, "q")).toDF("a", "b")
    // wider than the true predicate (row (5,"q") kept) — never narrower
    assert(df.filter(or).count() == 2)
  }
}
