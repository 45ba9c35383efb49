package graft

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicBoolean

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.functions._

import graft.ops.{CommitCoordinator, HardLinkCommitCoordinator, Snapshots}

/** Merge commit REBASE: a merge that loses its CAS to a pure,
  * stats-disjoint append re-CASes the already-staged result on the
  * new tip (metadata cost only) instead of recomputing — the OCC
  * fairness fix for slow-merge-among-fast-appenders starvation.
  * Overlapping or non-append interlopers still force the full
  * recompute, and the final state always equals serial semantics.
  *
  * The race is injected deterministically: a coordinator that, on the
  * FIRST merge manifest it sees, lands a real competing append before
  * delegating — so the merge's CAS loses exactly once. Whether the
  * merge then rebased or recomputed is observed from the number of
  * staged commit dirs under `data/` (a recompute stages a second,
  * orphaned dir; a rebase does not). */
class MergeRebaseSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("graft_rb").toFile.toString + "/t"

  private def dataDirs(root: String): Int =
    Option(new java.io.File(root, "data").listFiles())
      .map(_.count(_.isDirectory)).getOrElse(0)

  /** Install a coordinator that appends `interloper` into `root` just
    * before the first merge manifest publishes (once), then run
    * `body` and restore the default. */
  private def withInjectedRace[A](root: String,
      interloper: => Unit)(body: => A): A = {
    val fired = new AtomicBoolean(false)
    val sneaky = new CommitCoordinator {
      override def publish(fs: FileSystem, target: HPath,
          body: Array[Byte]): Boolean = {
        val s = new String(body, "UTF-8")
        if (s.contains("#op\tmerge") && fired.compareAndSet(false, true))
          interloper // its own commits re-enter here with fired=true
        HardLinkCommitCoordinator.publish(fs, target, body)
      }
    }
    Snapshots.setCommitCoordinator("file", sneaky)
    try body finally Snapshots.clearCommitCoordinator("file")
  }

  test("a merge losing its CAS to a stats-DISJOINT append rebases: " +
      "no second staging, both writers' rows land") {
    val root = freshRoot()
    Snapshots.append((0L until 100L).map(i => (i, i * 1.0))
      .toDF("id", "v"), root)
    // interloper keys live far above the merge's footprint
    withInjectedRace(root, Snapshots.append(
      (1000L until 1010L).map(i => (i, -1.0)).toDF("id", "v"), root)) {
      Snapshots.merge(spark, root,
        Seq((5L, 500.0), (7L, 700.0)).toDF("id", "v"), Seq("id"))
    }
    val got = Snapshots.read(spark, root).as[(Long, Double)]
      .collect().toMap
    assert(got(5L) == 500.0 && got(7L) == 700.0, "merge updates lost")
    assert(got(1005L) == -1.0, "interloper append lost")
    assert(got.size == 110)
    // initial append + interloper + ONE merge staging = 3 commit dirs;
    // a recompute would have staged a fourth (orphaned) dir
    assert(dataDirs(root) == 3,
      s"expected a rebase (3 staged dirs), got ${dataDirs(root)} — " +
        "the merge recomputed instead of re-CASing its staged result")
    // and the manifest history shows merge ON TOP of the append
    val (last, prev) = {
      val vs = Snapshots.versions(spark, root)
      (vs.last, vs(vs.size - 2))
    }
    val hist = Snapshots.history(spark, root)
      .select("version", "operation").collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(hist(last).contains("merge"), hist)
    assert(hist(prev) == "append", hist)
  }

  test("a merge losing its CAS to an OVERLAPPING append recomputes — " +
      "serial semantics: the merge updates the interloper's row") {
    val root = freshRoot()
    Snapshots.append((0L until 100L).map(i => (i, i * 1.0))
      .toDF("id", "v"), root)
    // the interloper appends the very key the merge upserts: rebase
    // would leave a duplicate; the recompute must update it instead
    withInjectedRace(root, Snapshots.append(
      Seq((500L, 999.0)).toDF("id", "v"), root)) {
      Snapshots.merge(spark, root,
        Seq((500L, 5.0)).toDF("id", "v"), Seq("id"))
    }
    val rows = Snapshots.read(spark, root)
      .filter(col("id") === 500L).as[(Long, Double)].collect()
    assert(rows.toSeq == Seq((500L, 5.0)),
      s"serial semantics require the merge to update the appended " +
        s"row, got ${rows.toSeq}")
    assert(Snapshots.read(spark, root).count() == 101)
    assert(dataDirs(root) == 4,
      s"expected a recompute (4 staged dirs incl. one orphan), got " +
        s"${dataDirs(root)}")
  }

  test("metadata drift (a property commit) blocks the rebase — the " +
      "merge recomputes and the property survives") {
    val root = freshRoot()
    Snapshots.append((0L until 50L).map(i => (i, i * 1.0))
      .toDF("id", "v"), root)
    withInjectedRace(root,
      Snapshots.setProperty(spark, root, "owner.team", "ingest")) {
      Snapshots.merge(spark, root,
        Seq((1L, 11.0)).toDF("id", "v"), Seq("id"))
    }
    assert(Snapshots.read(spark, root).filter(col("id") === 1L)
      .head().getDouble(1) == 11.0)
    assert(Snapshots.tableProperties(spark, root)
      .get("owner.team").contains("ingest"),
      "the interloper's property must survive the merge commit")
  }
}
