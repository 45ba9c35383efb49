package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.ops.{TopK, Upsert}

/** Generated-data invariants (raw scalacheck Gen + fixed seeds):
  *   - upsert batching-independence: applying updates as two batches ≡
  *     one union batch (the property that makes micro-batch boundaries
  *     semantically invisible);
  *   - salted per-group top-k ≡ plain per-group top-k for any data and
  *     salt (the correctness claim behind the skew rewrite). */
class InvariantSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  private val rowsGen = for {
    n <- Gen.choose(0, 60)
    rows <- Gen.listOfN(n, for {
      k <- Gen.choose(0, 5)
      ver <- Gen.choose(0L, 8L)
      v <- Gen.choose(-100, 100)
    } yield (s"k$k", v.toString, ver))
  } yield rows

  test("upsert: two batches ≡ one union batch (same distinct versions)") {
    import spark.implicits._
    val cols = Seq("k", "v", "ver")
    (0 until 12).foreach { trial =>
      val all = rowsGen(Gen.Parameters.default, Seed(7L + trial)).get
      // distinct (k, ver) so the newest-wins winner is unique — with
      // duplicated versions the tie-break prefers the *later batch*,
      // which is exactly the ordering a single union batch cannot see
      val rows = all.distinctBy(r => (r._1, r._3))
      if (rows.nonEmpty) {
        val (b1, b2) = rows.splitAt(rows.size / 2)
        val empty = rows.take(0).toDF(cols: _*)
        def m(a: org.apache.spark.sql.DataFrame, b: Seq[(String, String, Long)]) =
          if (b.isEmpty) a else Upsert.merge(a, b.toDF(cols: _*), Seq("k"), "ver")
        val sequential = m(m(empty, b1), b2)
          .orderBy("k").collect().toSeq
        val once = m(empty, rows)
          .orderBy("k").collect().toSeq
        assert(sequential === once, s"trial $trial")
      }
    }
  }

  test("salted per-group top-k equals plain per-group top-k") {
    import spark.implicits._
    (0 until 6).foreach { trial =>
      val rows = rowsGen(Gen.Parameters.default, Seed(99L + trial)).get
        .zipWithIndex.map { case ((k, v, _), i) => (k, i.toLong, v.toDouble) }
      if (rows.nonEmpty) {
        val df = rows.toDF("grp", "id", "score")
        val order = Seq(col("score").desc, col("id").asc)
        val plain = TopK.perGroup(df, Seq("grp"), order, k = 3)
          .orderBy("grp", "rank").collect().toSeq
        val salted = TopK.perGroupSalted(df, Seq("grp"), order, k = 3,
          salt = col("id"), buckets = 4)
          .orderBy("grp", "rank").collect().toSeq
        assert(salted === plain, s"trial $trial")
      }
    }
  }
}
