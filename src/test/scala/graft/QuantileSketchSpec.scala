package graft

import graft.ops.QuantileSketch

/** KLL contract: rank-error-bounded quantiles without any shuffle,
  * merge ≡ one-shot within the published bound, nulls skipped, empty
  * input surfaces as NaN. */
class QuantileSketchSpec extends SparkSpec {
  import spark.implicits._

  private val n = 20000
  private lazy val values = (0 until n).map(_.toDouble)
  private lazy val df = spark.createDataset(values).toDF("v").repartition(16)

  private def rankOf(est: Double): Double =
    values.count(_ <= est).toDouble / n

  test("estimates land within the rank-error bound") {
    val bytes = QuantileSketch.global(df, "v", k = 200)
    assert(QuantileSketch.countOf(bytes) == n.toLong)
    Seq(0.1, 0.5, 0.9, 0.99).foreach { p =>
      val est = QuantileSketch.quantilesOf(bytes, Seq(p)).head
      assert(math.abs(rankOf(est) - p) <= 0.025,
        s"p=$p est=$est rank=${rankOf(est)} outside bound")
    }
  }

  test("merged halves estimate like the one-shot sketch") {
    val half1 = QuantileSketch.global(df.filter($"v" < n / 2), "v")
    val half2 = QuantileSketch.global(df.filter($"v" >= n / 2), "v")
    val merged = QuantileSketch.merge(half1, half2)
    assert(QuantileSketch.countOf(merged) == n.toLong)
    Seq(0.25, 0.5, 0.75).foreach { p =>
      val est = QuantileSketch.quantilesOf(merged, Seq(p)).head
      assert(math.abs(rankOf(est) - p) <= 0.03,
        s"merged p=$p est=$est rank=${rankOf(est)} outside bound")
    }
  }

  test("nulls are skipped; empty input yields NaN") {
    val withNulls = Seq(Some(1.0), None, Some(3.0), None).toDF("v")
    val b = QuantileSketch.global(withNulls, "v")
    assert(QuantileSketch.countOf(b) == 2L)
    val empty = QuantileSketch.global(withNulls.filter($"v" > 100), "v")
    assert(QuantileSketch.quantilesOf(empty, Seq(0.5)).head.isNaN)
  }
}
