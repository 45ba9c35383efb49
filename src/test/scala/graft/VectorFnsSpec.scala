package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.functions.VectorFns
import graft.ops.Similarity

class VectorFnsSpec extends SparkSpec {

  private lazy val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")

  test("codegen'd dot product is bitwise-identical to the higher-order fold") {
    val v = VectorFns.toDouble(col("embedding"))
    val rows = emb.limit(200)
      .select(VectorFns.dot(v, v).as("fast"), VectorFns.dotHof(v, v).as("hof"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { case Row(fast: Double, hof: Double) =>
      assert(java.lang.Double.doubleToLongBits(fast) ===
        java.lang.Double.doubleToLongBits(hof))
    }
  }

  test("fused cosine is bitwise-identical to the composed dot/norm form") {
    val v = VectorFns.toDouble(col("embedding"))
    val w = VectorFns.toDouble(reverse(col("embedding")))
    val rows = emb.limit(200)
      .select(VectorFns.cosine(v, w).as("fused"),
        (VectorFns.dot(v, w) / (VectorFns.norm(v) * VectorFns.norm(w)))
          .as("composed"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { case Row(fused: Double, composed: Double) =>
      assert(java.lang.Double.doubleToLongBits(fused) ===
        java.lang.Double.doubleToLongBits(composed))
    }
  }

  test("dot product null handling: null array yields null") {
    val df = spark.sql(
      "SELECT CAST(NULL AS array<double>) AS a, array(1.0d, 2.0d) AS b")
    val r = df.select(VectorFns.dot(col("a"), col("b"))).collect()
    assert(r.head.isNullAt(0))
  }

  test("array_dot / array_cosine are registered SQL functions") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT array_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d,
        |       array_cosine(array(2.0d, 0.0d), array(5.0d, 0.0d)) AS c
        |""".stripMargin).collect().head
    assert(r.getDouble(0) === 11.0)
    assert(r.getDouble(1) === 1.0)
  }

  test("zero-norm and null-element inputs yield NULL, not NaN/garbage") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT array_cosine(array(0.0d, 0.0d), array(1.0d, 2.0d)) AS zn,
        |       array_cosine(CAST(array() AS array<double>), CAST(array() AS array<double>)) AS empty,
        |       array_cosine(array(1.0d, CAST(NULL AS double)), array(1.0d, 2.0d)) AS ne,
        |       array_dot(array(1.0d, CAST(NULL AS double)), array(1.0d, 2.0d)) AS nd
        |""".stripMargin).collect().head
    (0 until 4).foreach(i => assert(r.isNullAt(i), s"column $i"))
  }

  test("brute-force top-k is self-consistent with pairwise cosine") {
    val top = Similarity.bruteForceTopK(emb, queryId = 0L, k = 5).collect()
    assert(top.length === 5)
    val sims = top.map(_.getDouble(1))
    assert(sims.sameElements(sims.sorted.reverse), "descending order")
  }

  test("occupancyBits: integer doubling rule, calibration edges, cap") {
    import Similarity.occupancyBits
    // at or below calibration: base width
    assert(occupancyBits(0L) === 4)
    assert(occupancyBits(2000L) === 4)
    // one past calibration: first doubling
    assert(occupancyBits(2001L) === 5)
    assert(occupancyBits(4000L) === 5)
    assert(occupancyBits(4001L) === 6)
    // the two ScaleGen decades: 10× → +4 bits, 100× → +7
    assert(occupancyBits(20000L) === 8)
    assert(occupancyBits(200000L) === 11)
    // exact powers of two of the calibration never over-round (the
    // float-log2 failure mode this rule exists to avoid)
    assert(occupancyBits(16000L) === 7)
    // cap
    assert(occupancyBits(Long.MaxValue) === 20)
    assert(occupancyBits(100L, baseBits = 6, calibration = 10L,
      maxBits = 8) === 8)
  }

  test("single-probe LSH refuses bucket widths past the calibration " +
      "envelope") {
    // the measured at-scale recall collapse (0.007 at 100×) is now an
    // enforced envelope, not a documented trap: occupancy-preserved
    // widths past CalibrationMaxBits refuse with the prober named
    val few = emb.limit(8)
    val e = intercept[IllegalArgumentException] {
      Similarity.lshTopKNeighbors(few,
        bits = Similarity.CalibrationMaxBits + 1, k = 3)
    }
    assert(e.getMessage.contains("QueryDirected"))
    // at the ceiling it still runs
    assert(Similarity.lshTopKNeighbors(few,
      bits = Similarity.CalibrationMaxBits, k = 3).columns
      .contains("nb_id"))
  }

  test("query-directed probing at probeBits = bits covers every bucket") {
    // flipping ANY subset of all `bits` positions reaches every bucket,
    // so the result must equal the exact per-vector top-k (the capped
    // candidate space is the whole corpus)
    val sub = emb.filter(col("vec_id") < 40)
    val qd = Similarity.lshTopKNeighborsQueryDirected(sub, bits = 3,
        k = 3, probeBits = 3)
      .select("vec_id", "nb_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val v = VectorFns.toDouble(col("embedding"))
    val x = sub.select(col("vec_id"), v.as("v"))
    val exact = x.as("a").join(x.as("b"),
        col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("vec_id"), col("b.vec_id").as("nb_id"),
        VectorFns.cosine(col("a.v"), col("b.v")).as("cos_sim"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("vec_id")
          .orderBy(col("cos_sim").desc, col("nb_id").asc)))
      .filter(col("rank") <= 3)
      .select("vec_id", "nb_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(qd === exact)
  }

  test("query-directed probing beats the Hamming ball per probe") {
    // 4 bits: Hamming-1 spends 5 probes uniformly; query-directed
    // spends 4 probes on the two lowest-margin bits. Recall PER PROBE
    // (the quantity that decides what a fixed candidate budget buys at
    // scale, where the ball needs C(bits,≤h) probes) must be strictly
    // better for the directed probes — measured 0.112 vs 0.099 per
    // probe on the sf0.001 fixture; pinned as a regression test. The
    // absolute-recall-at-scale evidence lives in ScaleBench's scaled
    // ANN certification (BASELINE.md).
    val exact = {
      val v = VectorFns.toDouble(col("embedding"))
      val x = emb.select(col("vec_id"), v.as("v"))
      x.as("a").join(x.as("b"), col("a.vec_id") =!= col("b.vec_id"))
        .select(col("a.vec_id").as("vec_id"),
          col("b.vec_id").as("nb_id"),
          VectorFns.cosine(col("a.v"), col("b.v")).as("cos_sim"))
        .withColumn("rank", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("vec_id")
            .orderBy(col("cos_sim").desc, col("nb_id").asc)))
        .filter(col("rank") <= 3).select("vec_id", "nb_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    def recall(got: org.apache.spark.sql.DataFrame): Double = {
      val g = got.select("vec_id", "nb_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      (g & exact).size.toDouble / exact.size
    }
    val qd = recall(Similarity.lshTopKNeighborsQueryDirected(
      emb, bits = 4, k = 3, probeBits = 2))
    val ball = recall(Similarity.lshTopKNeighborsMultiProbe(
      emb, bits = 4, k = 3, maxHamming = 1))
    assert(qd / 4.0 > ball / 5.0,
      s"query-directed recall/probe ${qd / 4.0} should beat " +
        s"Hamming-1's ${ball / 5.0}")
  }
}
