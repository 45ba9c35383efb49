package graft

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.ops.Snapshots

/** Key-addressed DML pins its key/source frame: the file-pruning
  * footprint, the DML join, and the committed rows must all reflect
  * ONE evaluation of the incoming plan, even when that plan is
  * nondeterministic (`rand()`-gated subquery, `sample()`). Unpinned,
  * `keyFootprint` (limit-collect or min/max agg) and the join are
  * independent executions — a footprint drawn from one evaluation can
  * prune away files whose rows a second evaluation would match,
  * silently skipping deletes/updates.
  *
  * The probes below gate on a nondeterministic frame that RECORDS
  * what it emitted (collection accumulator inside the generator):
  * with the pin, the table mutation equals exactly the recorded draw;
  * re-evaluation would apply a different draw than it recorded
  * (2^-100-scale coincidence aside). */
class DmlPinningSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("graft_pin").toFile.toString + "/t"

  /** (frame of ids drawn nondeterministically from 1..n, recorded draw) */
  private def coinFlipKeys(n: Long) = {
    val acc = spark.sparkContext.collectionAccumulator[Long]("picked")
    val pick = udf { (id: Long) =>
      if (scala.util.Random.nextBoolean()) { acc.add(id); true } else false
    }.asNondeterministic()
    ((1L to n).toDF("id").filter(pick(col("id"))),
      () => acc.value.asScala.toSet)
  }

  test("deleteMatching: ONE evaluation of a nondeterministic frame " +
      "decides both the footprint and the delete") {
    val root = freshRoot()
    // two key-disjoint files: an unpinned footprint from draw #1 can
    // prune the file holding draw #2's keys
    Snapshots.append((1L to 50L).map(i => (i, 0.0)).toDF("id", "v"), root)
    Snapshots.append((51L to 100L).map(i => (i, 0.0)).toDF("id", "v"), root)
    val (frame, picked) = coinFlipKeys(100L)
    Snapshots.deleteMatching(spark, root, frame, Seq("id"))
    val remaining = Snapshots.read(spark, root)
      .select("id").as[Long].collect().toSet
    assert(remaining == (1L to 100L).toSet -- picked(),
      "delete must apply exactly the draw the frame emitted once")
  }

  test("updateMatching: the update hits exactly the recorded draw") {
    val root = freshRoot()
    Snapshots.append((1L to 50L).map(i => (i, 0.0)).toDF("id", "v"), root)
    Snapshots.append((51L to 100L).map(i => (i, 0.0)).toDF("id", "v"), root)
    val (frame, picked) = coinFlipKeys(100L)
    Snapshots.updateMatching(spark, root, frame, Seq("id"),
      Seq("v" -> lit(9.0)))
    val updated = Snapshots.read(spark, root).filter(col("v") === 9.0)
      .select("id").as[Long].collect().toSet
    assert(updated == picked(),
      "update must apply exactly the draw the frame emitted once")
  }

  test("merge: a nondeterministic source stages the same rows the " +
      "footprint and anti-join saw") {
    val root = freshRoot()
    Snapshots.append((1L to 50L).map(i => (i, 0.0)).toDF("id", "v"), root)
    Snapshots.append((51L to 100L).map(i => (i, 0.0)).toDF("id", "v"), root)
    val acc = spark.sparkContext.collectionAccumulator[Long]("picked")
    val pick = udf { (id: Long) =>
      if (scala.util.Random.nextBoolean()) { acc.add(id); true } else false
    }.asNondeterministic()
    val source = (1L to 100L).map(i => (i, 1.0)).toDF("id", "v")
      .filter(pick(col("id")))
    Snapshots.merge(spark, root, source, Seq("id"))
    val picked = acc.value.asScala.toSet
    val got = Snapshots.read(spark, root)
      .select("id", "v").as[(Long, Double)].collect().toMap
    assert(got.keySet == (1L to 100L).toSet, "merge never loses keys")
    assert(got.filter(_._2 == 1.0).keySet == picked,
      "upserted rows must be exactly the single recorded draw")
  }

  test("deleteMatching: the pinned frame's plan executes exactly once") {
    val root = freshRoot()
    Snapshots.append((1L to 100L).map(i => (i, 0.0)).toDF("id", "v"), root)
    val acc = spark.sparkContext.longAccumulator("scans")
    val bump = udf { (_: Long) => { acc.add(1L); true } }
    Snapshots.deleteMatching(spark, root,
      (1L to 10L).toDF("id").filter(bump(col("id"))), Seq("id"))
    // one materializing pass (pinKeys); footprint + join read the pin
    assert(acc.value == 10L,
      s"key frame evaluated ${acc.value / 10.0} times; the pin allows 1")
    assert(Snapshots.read(spark, root).count() == 90)
  }
}
