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
}
