package graft

import org.apache.spark.sql.functions.col

import graft.functions.TextFns

/** PII redaction on planted docs: categories, attribution order, and the
  * no-PII identity case. */
class PiiScrubSpec extends SparkSpec {
  import spark.implicits._

  private def scrub(docs: Seq[(Long, String)]) = {
    val (clean, counts) = TextFns.piiScrub(col("text"))
    docs.toDF("doc_id", "text")
      .select(Seq(col("doc_id"), clean.as("clean_text")) ++
        counts.map { case (n, c) => c.as(s"n_$n") }: _*)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5))).toMap
  }

  test("each category redacts and counts; nested matches attribute once") {
    val out = scrub(Seq(
      1L -> "mail me at jane.doe+x@example.org or visit https://ex.com/a?b=1 now",
      2L -> "server 192.168.0.1 answered, call 555-867-5309 after",
      // the email-shaped userinfo is part of the URL: attribute to <URL>
      3L -> "see https://user@host.example.com/path today",
      4L -> "no personal data here at all"))
    assert(out(1L)._1 == "mail me at <EMAIL> or visit <URL> now")
    assert((out(1L)._2, out(1L)._3) == (1L, 1L)) // n_url, n_email
    assert(out(2L)._1 == "server <IP> answered, call <PHONE> after")
    assert((out(2L)._4, out(2L)._5) == (1L, 1L)) // n_ip, n_phone
    assert(out(3L)._1 == "see <URL> today")
    assert((out(3L)._2, out(3L)._3) == (1L, 0L)) // URL, not EMAIL
    assert(out(4L)._1 == "no personal data here at all")
    assert((out(4L)._2, out(4L)._3, out(4L)._4, out(4L)._5) ==
      (0L, 0L, 0L, 0L))
  }

  test("long digit runs are not partially redacted as phone numbers") {
    val out = scrub(Seq(8L -> "account 123456789012 stays intact"))
    assert(out(8L)._1 == "account 123456789012 stays intact")
    assert(out(8L)._5 == 0L)
  }

  test("the scrub runs unchanged inside a streaming query") {
    // stateless expression chain → streamable with no watermark/state;
    // the redaction a streaming corpus ingest applies per micro-batch
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val (clean, _) = TextFns.piiScrub(col("_2"))
    val q = in.toDF().select(col("_1").as("doc_id"), clean.as("clean_text"))
      .writeStream.format("memory").queryName("pii_stream")
      .outputMode("append").start()
    in.addData(1L -> "ping admin@site.io or https://x.io/y")
    q.processAllAvailable()
    q.stop()
    val got = spark.table("pii_stream").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "ping <EMAIL> or <URL>")
  }
}
