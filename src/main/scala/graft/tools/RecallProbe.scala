package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.VectorFns
import graft.ops.Similarity

/** Scratch measurement harness: recall of the ANN tiers vs exact top-k
  * across parameter combos, for picking e3/e6 settings. Not part of the
  * driver contract. Usage: runMain graft.tools.RecallProbe <sfDir> */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = Tables.embeddings(spark, dir)
    val e = emb.select(col("vec_id"),
      VectorFns.toDouble(col("embedding")).as("v"))
      .withColumn("nrm", VectorFns.norm(col("v")))
    val ap = e.as("x").join(e.as("y"), col("x.vec_id") =!= col("y.vec_id"))
      .select(col("x.vec_id").as("vec_id"), col("y.vec_id").as("nb_id"),
        (VectorFns.dot(col("x.v"), col("y.v"))
          / (col("x.nrm") * col("y.nrm"))).as("cos_sim"))
    val w = Window.partitionBy("vec_id")
      .orderBy(col("cos_sim").desc, col("nb_id").asc)
    val ranked = ap.withColumn("rank", row_number().over(w))
    val ex10 = ranked.filter(col("vec_id") === 0 && col("rank") <= 10)
      .select(col("nb_id").as("vec_id")).cache()
    val exTotal = ex10.count()
    def recall(got: DataFrame): Double =
      got.join(ex10, Seq("vec_id"), "left_semi").count().toDouble / exTotal
    for (probe <- Seq(2, 3); it <- Seq(0, 2, 3)) {
      val r = recall(Similarity.ivfTopK(emb, 8, probe, 0L, 10, it)
        .select("vec_id"))
      println(f"IVF nProbe=$probe iters=$it recall=$r%.2f")
    }
    for (nc <- Seq(16, 32); rr <- Seq(4, 8); it <- Seq(2, 3)) {
      val r = recall(Similarity.pqTopK(emb, 8, 8, nc, 0L, 10, rr, it)
        .select("vec_id"))
      println(f"PQ nC=$nc rerank=$rr iters=$it recall=$r%.2f")
    }
    spark.stop()
  }
}
