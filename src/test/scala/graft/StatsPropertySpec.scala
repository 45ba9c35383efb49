package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.ops.Stats

/** Property-based check of the trailing-window kernel against a
  * driver-side brute force (SURVEY.md §5.3): for generated per-key series,
  * each horizon equals the mean of the N newest values, null iff the key
  * has fewer than N observations — regardless of insertion order.
  * (Raw scalacheck Gen driven by fixed seeds — the scalatest bridge
  * artifact is not in the offline cache.) */
class StatsPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  private val seriesGen = for {
    nKeys <- Gen.choose(1, 4)
    rows <- Gen.listOfN(nKeys, for {
      n <- Gen.choose(0, 12)
      vals <- Gen.listOfN(n, Gen.choose(-1000000L, 1000000L))
    } yield vals)
  } yield rows

  test("trailing horizon = brute-force mean of N newest; null gate at count<N") {
    import spark.implicits._
    val horizons = Seq(Stats.Horizon("h3", 3), Stats.Horizon("h5", 5))
    (0 until 20).foreach { trial =>
      val series = seriesGen(Gen.Parameters.default, Seed(42L + trial)).get
      // ts = index within key; value = cents (exact decimal arithmetic)
      val rows = series.zipWithIndex.flatMap { case (vals, k) =>
        vals.zipWithIndex.map { case (v, i) => (s"k$k", i.toLong, v) }
      }
      if (rows.nonEmpty) {
        val df = rows.toDF("key", "t", "cents")
          .withColumn("v", col("cents").cast("decimal(18,2)"))
        val got = Stats.trailing(df, "key", "t", col("v"), horizons)
          .select("key", "h3", "h5").collect()
          .map(r => r.getString(0) ->
            (Option(r.get(1)).map(_.asInstanceOf[Double]),
              Option(r.get(2)).map(_.asInstanceOf[Double]))).toMap
        series.zipWithIndex.foreach { case (vals, k) =>
          if (vals.nonEmpty) {
            val newestFirst = vals.reverse
            def brute(n: Int): Option[Double] =
              if (newestFirst.size >= n)
                Some(newestFirst.take(n).map(BigDecimal(_)).sum.toDouble / n)
              else None
            val (h3, h5) = got(s"k$k")
            assert(h3 === brute(3), s"k$k h3")
            assert(h5 === brute(5), s"k$k h5")
          } else assert(!got.contains(s"k$k"))
        }
      }
    }
  }
}
