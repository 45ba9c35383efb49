package graft

import java.nio.file.{Files, Path}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.ops.Snapshots

/** End-to-end streaming ingest into the versioned snapshot store:
  * readStream → foreachBatch(idempotentAppend) → checkpointed restart.
  * The foreachBatch contract is at-least-once per batch id; the
  * manifest-recorded (writer, batch) high-water mark upgrades it to
  * exactly-once at the TABLE, across both in-flight retries and
  * restart-from-checkpoint re-deliveries. The writer id is tied to the
  * checkpoint's lifetime — resetting the checkpoint (batch ids restart
  * at 0) requires a fresh writer id, same as any transactional sink. */
class SnapshotStreamSpec extends SparkSpec {

  private val schema = StructType(Seq(StructField("id", LongType)))

  private def writeFile(dir: Path, n: Int, ids: Seq[Long]): Unit = {
    val tmp = Files.createTempFile("stage", ".json")
    Files.writeString(tmp, ids.map(i => s"""{"id":$i}""").mkString("\n"))
    Files.move(tmp, dir.resolve(f"batch$n%03d.json"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  test("stream -> snapshots: restart drains only new data, replays skip") {
    import spark.implicits._
    val base = Files.createTempDirectory("snap-stream")
    val src = Files.createDirectory(base.resolve("src"))
    val table = s"$base/table"
    val ckpt = s"$base/ckpt"

    def startQuery() = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).json(src.toString)
      .writeStream
      .foreachBatch { (df: DataFrame, batchId: Long) =>
        Snapshots.idempotentAppend(df, table, "snap-ingest", batchId)
        ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.ProcessingTime(0))
      .start()

    writeFile(src, 1, Seq(1L, 2L))
    writeFile(src, 2, Seq(3L))
    val q1 = startQuery()
    q1.processAllAvailable(); q1.stop()
    assert(Snapshots.read(spark, table).as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L, 3L))
    val vAfterFirst = Snapshots.currentVersion(spark, table).get

    // data lands while the query is DOWN; the checkpointed restart must
    // ingest only the new file — no re-append of batches 0/1
    writeFile(src, 3, Seq(4L, 5L))
    val q2 = startQuery()
    q2.processAllAvailable(); q2.stop()
    assert(Snapshots.read(spark, table).as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L, 3L, 4L, 5L))
    assert(Snapshots.currentVersion(spark, table).get == vAfterFirst + 1)

    // a foreachBatch retry re-offers the last batch id: skipped, and
    // the table is byte-stable (no version bump)
    val before = Snapshots.currentVersion(spark, table).get
    assert(Snapshots.idempotentAppend(
      Seq(4L, 5L).toDF("id"), table, "snap-ingest",
      batchId = before.toLong - 1).isEmpty)
    assert(Snapshots.currentVersion(spark, table).get == before)
  }
}
