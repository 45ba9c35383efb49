package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ops.Snapshots

/** CHECK-constraint contract: content-adding commits validate their rows
  * and fail loudly BEFORE committing; row subsets and rewrites carry the
  * pinned set; DDL that would orphan a constraint's columns is refused;
  * overwrite restarts the lineage and clears it. */
class ConstraintSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("graft_cons").toFile.toString + "/t"

  test("violating append fails loudly and commits nothing") {
    val root = freshRoot()
    Snapshots.append(Seq((1L, 10.0)).toDF("id", "price"), root)
    Snapshots.setConstraint(spark, root, "price_nonneg", "price >= 0")
    val vBefore = Snapshots.currentVersion(spark, root).get
    val e = intercept[IllegalArgumentException] {
      Snapshots.append(Seq((2L, -5.0)).toDF("id", "price"), root)
    }
    assert(e.getMessage.contains("price_nonneg"))
    assert(Snapshots.currentVersion(spark, root).get == vBefore)
    assert(Snapshots.read(spark, root).count() == 1)
  }

  test("valid appends land and the constraint carries across commits") {
    val root = freshRoot()
    Snapshots.append(Seq((1L, 10.0)).toDF("id", "price"), root)
    Snapshots.setConstraint(spark, root, "price_nonneg", "price >= 0")
    Snapshots.append(Seq((2L, 0.0)).toDF("id", "price"), root)
    Snapshots.append(Seq((3L, 7.5)).toDF("id", "price"), root)
    assert(Snapshots.constraints(spark, root) ==
      Map("price_nonneg" -> "price >= 0"))
    // still enforced after the carries
    intercept[IllegalArgumentException] {
      Snapshots.append(Seq((4L, -1.0)).toDF("id", "price"), root)
    }
  }

  test("SQL CHECK semantics: NULL passes, including absent columns") {
    val root = freshRoot()
    Snapshots.append(Seq((1L, 10.0)).toDF("id", "price"), root)
    Snapshots.setConstraint(spark, root, "price_nonneg", "price >= 0")
    // explicit NULL price passes (CHECK is violated only by FALSE)
    Snapshots.append(Seq[(Long, java.lang.Double)]((2L, null))
      .toDF("id", "price"), root)
    // a batch that omits the column entirely: its rows read NULL there
    Snapshots.append(Seq(Tuple1(3L)).toDF("id"), root)
    assert(Snapshots.read(spark, root).count() == 3)
  }

  test("setConstraint refuses when existing data violates it") {
    val root = freshRoot()
    Snapshots.append(Seq((1L, -2.0)).toDF("id", "price"), root)
    val e = intercept[IllegalArgumentException] {
      Snapshots.setConstraint(spark, root, "price_nonneg", "price >= 0")
    }
    assert(e.getMessage.contains("existing"))
    assert(Snapshots.constraints(spark, root).isEmpty)
  }

  test("dropConstraint re-opens the gate; unknown name refuses") {
    val root = freshRoot()
    Snapshots.append(Seq((1L, 1.0)).toDF("id", "price"), root)
    Snapshots.setConstraint(spark, root, "price_nonneg", "price >= 0")
    Snapshots.dropConstraint(spark, root, "price_nonneg")
    Snapshots.append(Seq((2L, -9.0)).toDF("id", "price"), root) // now fine
    assert(Snapshots.read(spark, root).count() == 2)
    intercept[IllegalArgumentException] {
      Snapshots.dropConstraint(spark, root, "nope")
    }
  }

  test("merge validates its source rows") {
    val root = freshRoot()
    Snapshots.append(Seq((1L, 5.0), (2L, 6.0)).toDF("id", "price"), root)
    Snapshots.setConstraint(spark, root, "price_nonneg", "price >= 0")
    intercept[IllegalArgumentException] {
      Snapshots.merge(spark, root,
        Seq((2L, -1.0)).toDF("id", "price"), Seq("id"))
    }
    // valid upsert still works and carries the constraint
    Snapshots.merge(spark, root,
      Seq((2L, 60.0), (3L, 70.0)).toDF("id", "price"), Seq("id"))
    assert(Snapshots.constraints(spark, root).size == 1)
    assert(Snapshots.read(spark, root).count() == 3)
  }

  test("delete and compact carry the pinned set; overwrite clears it") {
    val root = freshRoot()
    Snapshots.append(Seq((1L, 1.0), (2L, 2.0)).toDF("id", "price"), root)
    Snapshots.setConstraint(spark, root, "price_nonneg", "price >= 0")
    Snapshots.deleteWhere(spark, root, col("id") === 1L)
    assert(Snapshots.constraints(spark, root).size == 1)
    Snapshots.compact(spark, root, numFiles = 1)
    assert(Snapshots.constraints(spark, root).size == 1)
    Snapshots.overwrite(Seq((9L, -1.0)).toDF("id", "price"), root)
    assert(Snapshots.constraints(spark, root).isEmpty)
  }

  test("DDL that would orphan a constraint's column is refused") {
    val root = freshRoot()
    Snapshots.append(Seq((1L, 1.0)).toDF("id", "price"), root)
    Snapshots.setConstraint(spark, root, "price_nonneg", "price >= 0")
    intercept[IllegalArgumentException] {
      Snapshots.dropColumn(spark, root, "price")
    }
    intercept[IllegalArgumentException] {
      Snapshots.renameColumn(spark, root, "price", "cost")
    }
    // untouched columns remain free to change
    Snapshots.renameColumn(spark, root, "id", "key")
    assert(Snapshots.read(spark, root).columns.toSeq == Seq("key", "price"))
  }

  test("constraints are versioned: time travel reads the pinned set") {
    val root = freshRoot()
    Snapshots.append(Seq((1L, 1.0)).toDF("id", "price"), root)
    val v1 = Snapshots.currentVersion(spark, root).get
    Snapshots.setConstraint(spark, root, "price_nonneg", "price >= 0")
    val v2 = Snapshots.currentVersion(spark, root).get
    assert(Snapshots.constraints(spark, root, v1).isEmpty)
    assert(Snapshots.constraints(spark, root, v2).size == 1)
  }
}
