package graft

import java.nio.file.Files
import java.util.concurrent.TimeUnit

import graft.ops.Snapshots

/** The multi-writer commit story across a REAL process boundary: the
  * in-JVM race spec (CommitCoordinatorRaceSpec) proves the hard-link
  * CAS under thread concurrency, but the OCC + delta-chain + retry
  * layers above it had only ever raced inside one JVM. Here a forked
  * child JVM (its own SparkSession, its own FileSystem instances,
  * nothing shared but the directory) races appends against this JVM
  * on one table: every commit must land under its own version, no
  * commit may be lost or doubled, and the final table must be the
  * exact union of both writers' rows. */
class CrossProcessCommitSpec extends SparkSpec {
  import spark.implicits._

  // must match build.sbt's jdk17AddOpens — the child creates a
  // SparkSession outside spark-submit, which normally injects these
  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  test("two JVMs race appends on one table: every commit lands under " +
      "its own version, rows are the exact union, none lost or doubled") {
    val root = Files.createTempDirectory("graft_xproc")
      .toFile.toString + "/t"
    val n = 6
    // seed v1 so both writers contend on a non-empty delta chain
    Snapshots.append(Seq((0L, "seed")).toDF("id", "v"), root)
    val javaBin = System.getProperty("java.home") + "/bin/java"
    // Test/fork is on, so java.class.path IS the full test classpath
    val cp = System.getProperty("java.class.path")
    val cmd = Seq(javaBin) ++ addOpens ++ Seq(
      "-Xmx2g", "-Dspark.ui.enabled=false", "-cp", cp,
      "graft.CrossProcessWriter", root, "7", n.toString)
    val pb = new ProcessBuilder(cmd: _*)
    pb.redirectErrorStream(true)
    val proc = pb.start()
    val tail = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val drain = new Thread(() =>
      scala.io.Source.fromInputStream(proc.getInputStream, "UTF-8")
        .getLines().foreach { l =>
          tail.add(l); while (tail.size > 40) tail.poll()
        })
    drain.setDaemon(true)
    drain.start()
    // the parent races its own appends while the child runs
    (1 to n).foreach { i =>
      Snapshots.append(Seq((900000L + i, s"p-$i")).toDF("id", "v"), root)
    }
    assert(proc.waitFor(300, TimeUnit.SECONDS), "child JVM hung")
    assert(proc.exitValue == 0,
      s"child writer failed:\n${tail.toArray.mkString("\n")}")
    // every one of the 1 + 2n commits landed under its own version —
    // a cross-process lost-commit hole shows as a gap or a short read
    val versions = Snapshots.versions(spark, root)
    assert(versions == (1 to (1 + 2 * n)),
      s"versions not contiguous (lost/doubled commit): $versions")
    val got = Snapshots.read(spark, root)
    assert(got.count() == (1 + 2 * n).toLong)
    assert(got.select("id").distinct().count() == (1 + 2 * n).toLong)
    val ids = got.select("id").as[Long].collect().toSet
    assert((1 to n).forall(i => ids.contains(700000L + i)),
      s"child rows missing: $ids")
    assert((1 to n).forall(i => ids.contains(900000L + i)),
      s"parent rows missing: $ids")
  }

  test("a child JVM's appends race the parent's copy-on-write MERGEs: " +
      "the stats-disjoint merge rebases (or recomputes) and the " +
      "overlapping one recomputes, and the final table equals the " +
      "serial model either way") {
    import org.apache.spark.sql.functions.col
    val root = Files.createTempDirectory("graft_xproc_dml")
      .toFile.toString + "/t"
    val n = 6
    // seed: the parent's merge targets (ids 1..100), far from the
    // child's append key range (700001..70000n)
    Snapshots.append((1L to 100L).map(i => (i, "seed")).toDF("id", "v"),
      root)
    val javaBin = System.getProperty("java.home") + "/bin/java"
    val cp = System.getProperty("java.class.path")
    val cmd = Seq(javaBin) ++ addOpens ++ Seq(
      "-Xmx2g", "-Dspark.ui.enabled=false", "-cp", cp,
      "graft.CrossProcessWriter", root, "7", n.toString)
    val pb = new ProcessBuilder(cmd: _*)
    pb.redirectErrorStream(true)
    val proc = pb.start()
    val tail = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val drain = new Thread(() =>
      scala.io.Source.fromInputStream(proc.getInputStream, "UTF-8")
        .getLines().foreach { l =>
          tail.add(l); while (tail.size > 40) tail.poll()
        })
    drain.setDaemon(true)
    drain.start()
    // the parent keeps issuing BOTH merge shapes while the child
    // commits — every interleaving must serialize correctly:
    //  - DISJOINT: keys 1..20, footprint [1,20]; the child's added
    //    files carry id stats ~700000, provably invisible — a lost
    //    CAS re-lands by REBASE (one manifest write, no recompute)
    //  - OVERLAPPING: keys {650000, 750000}, whose [min,max] range
    //    COVERS the child's adds — rebaseSafe must refuse, and the
    //    loud loss sends retryOnRace to the full recompute
    var parentCommits = 0
    var round = 0
    var childAlive = true
    while (childAlive && round < 40) {
      round += 1
      Snapshots.merge(spark,  root,
        (1L to 20L).map(i => (i, s"disj-$round")).toDF("id", "v"),
        Seq("id"))
      parentCommits += 1
      Snapshots.merge(spark, root,
        Seq((650000L, s"ov-$round"), (750000L, s"ov-$round"))
          .toDF("id", "v"), Seq("id"))
      parentCommits += 1
      childAlive = proc.isAlive
    }
    assert(proc.waitFor(300, TimeUnit.SECONDS), "child JVM hung")
    assert(proc.exitValue == 0,
      s"child writer failed:\n${tail.toArray.mkString("\n")}")
    // one deterministic closing pass so the expected model is exact
    Snapshots.merge(spark, root,
      (1L to 20L).map(i => (i, "final")).toDF("id", "v"), Seq("id"))
    Snapshots.merge(spark, root,
      Seq((650000L, "final"), (750000L, "final")).toDF("id", "v"),
      Seq("id"))
    parentCommits += 2
    // every commit landed under its own version — no lost or doubled
    // writes across the process boundary, rebases included
    val versions = Snapshots.versions(spark, root)
    assert(versions == (1 to (1 + n + parentCommits)),
      s"versions not contiguous (expected ${1 + n + parentCommits}): " +
        s"$versions")
    val got = Snapshots.read(spark, root)
    // serial model: 20 merged + 80 seed + n child + 2 merge-inserts
    assert(got.count() == (100 + n + 2).toLong)
    val byId = got.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(byId.size == 100 + n + 2, "duplicate ids: lost isolation")
    (1L to 20L).foreach(i => assert(byId(i) == "final", s"$i -> ${byId(i)}"))
    (21L to 100L).foreach(i => assert(byId(i) == "seed", s"$i -> ${byId(i)}"))
    (1 to n).foreach(i => assert(byId(700000L + i.toLong) == s"w7-$i",
      s"child row ${700000 + i}: ${byId.get(700000L + i.toLong)}"))
    assert(byId(650000L) == "final" && byId(750000L) == "final")
    // and the merge targets still prune: the table stayed healthy
    // through every rebase/recompute (a corrupted manifest would throw)
    assert(Snapshots.read(spark, root).filter(col("id") <= 20L)
      .count() == 20L)
  }
}
