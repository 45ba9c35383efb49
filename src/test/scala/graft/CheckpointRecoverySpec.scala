package graft

import java.nio.file.{Files, Path}
import java.sql.Timestamp

import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.streaming.FundingStream

/** Checkpoint recovery — the exactly-once claim of SURVEY §2.9 made
  * testable: a file-source funding stream is stopped mid-history and a
  * NEW query restarts from the same checkpoint; already-committed batches
  * are not re-ingested as duplicates (idempotent newest-wins upsert +
  * offset tracking), and the backlog drains one file per trigger
  * (maxFilesPerTrigger — the reference's paginated catch-up). */
class CheckpointRecoverySpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("symbol", StringType),
    StructField("funding_time", TimestampType),
    StructField("funding_rate", DoubleType)))

  private def writeFile(dir: Path, n: Int, rows: Seq[(String, String, Double)]): Unit = {
    val json = rows.map { case (s, t, r) =>
      s"""{"symbol":"$s","funding_time":"$t","funding_rate":$r}"""
    }.mkString("\n")
    // atomic publish: file sources must never see half-written files
    val tmp = Files.createTempFile("stage", ".json")
    Files.writeString(tmp, json)
    Files.move(tmp, dir.resolve(f"batch$n%03d.json"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  test("restart from checkpoint: committed batches not re-applied, backlog drains") {
    val base = Files.createTempDirectory("ckpt-rec")
    val src = Files.createDirectory(base.resolve("src"))
    val sink = s"$base/table"
    val ckpt = s"$base/ckpt"

    def startQuery() = FundingStream.start(
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).json(src.toString),
      sink, ckpt, trigger = Trigger.ProcessingTime(0))

    writeFile(src, 1, Seq(("BTC", "2024-01-01 08:00:00", 0.0001)))
    writeFile(src, 2, Seq(("BTC", "2024-01-01 16:00:00", 0.0002),
      ("ETH", "2024-01-01 16:00:00", 0.0003)))
    val q1 = startQuery()
    q1.processAllAvailable()
    q1.stop()
    assert(spark.read.parquet(sink).count() === 3)

    // new data lands while the query is DOWN; restart must pick up ONLY
    // the unprocessed file and leave prior rows intact (no duplicates)
    writeFile(src, 3, Seq(("BTC", "2024-01-02 00:00:00", 0.0004),
      ("BTC", "2024-01-01 08:00:00", 0.0009))) // re-delivery of batch-1 key
    val q2 = startQuery()
    q2.processAllAvailable()
    q2.stop()

    val rows = spark.read.parquet(sink)
      .orderBy("symbol", "funding_time")
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1).toString, r.getDouble(2)))
      .toSeq
    assert(rows === Seq(
      // the re-delivered (BTC, 08:00) was DROPPED by
      // dropDuplicatesWithinWatermark — its state survived the restart
      // via the checkpoint. This is the documented §2.9 semantic delta:
      // the reference's DB upsert would have taken 0.0009; the streaming
      // pipeline treats in-watermark re-delivery as a duplicate.
      ("BTC", "2024-01-01 08:00:00.0", 0.0001),
      ("BTC", "2024-01-01 16:00:00.0", 0.0002),
      ("BTC", "2024-01-02 00:00:00.0", 0.0004),
      ("ETH", "2024-01-01 16:00:00.0", 0.0003)))
  }

  test("corpus ingest: dedup state survives a restart from checkpoint") {
    import graft.streaming.CorpusIngest
    val base = Files.createTempDirectory("corpus-rec")
    val src = Files.createDirectory(base.resolve("src"))
    val sink = s"$base/table"
    val ckpt = s"$base/ckpt"
    val docSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("text", StringType),
      StructField("ingest_ts", TimestampType)))
    def writeDocs(n: Int, rows: Seq[(Long, String, String)]): Unit = {
      val json = rows.map { case (id, t, ts) =>
        s"""{"doc_id":$id,"text":"$t","ingest_ts":"$ts"}"""
      }.mkString("\n")
      val tmp = Files.createTempFile("stage", ".json")
      Files.writeString(tmp, json)
      Files.move(tmp, src.resolve(f"docs$n%03d.json"),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }
    def startQuery() = CorpusIngest.start(
      spark.readStream.schema(docSchema)
        .option("maxFilesPerTrigger", 1).json(src.toString),
      sink, ckpt, trigger = Trigger.ProcessingTime(0))

    writeDocs(1, Seq((1L, "the very first document", "2024-01-01 00:00:00")))
    val q1 = startQuery()
    q1.processAllAvailable(); q1.stop()
    assert(spark.read.parquet(sink).count() === 1)

    // same text re-crawled while the stream is DOWN: after restart the
    // fingerprint state recovered from the checkpoint must still drop it
    writeDocs(2, Seq(
      (2L, "the very first document", "2024-01-01 01:00:00"),
      (3L, "a genuinely new document", "2024-01-01 01:00:00")))
    val q2 = startQuery()
    q2.processAllAvailable(); q2.stop()
    val ids = spark.read.parquet(sink).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(ids === Set(1L, 3L))
  }
}
