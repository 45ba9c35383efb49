package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{Similarity, TextDedup}

/** Phase decomposition of d7_embed_dedup_clusters: corpus count (for
  * the occupancy bit rule), LSH near-dup pair generation, and the
  * label-propagation clustering — min-of-2 with a warm first pass.
  *
  * Usage: runMain graft.tools.D7Probe <sfDir>
  */
object D7Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val best = scala.collection.mutable.LinkedHashMap[String, Double]()
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      val el = (System.nanoTime() - t0) / 1e9
      best(label) = best.get(label).fold(el)(math.min(_, el))
      r
    }
    val NearDupThreshold = 0.35
    def whole(): Long = {
      val emb = Tables.embeddings(spark, dir)
      val pairs = Similarity.nearDupPairs(emb,
          bits = Similarity.occupancyBits(emb.count(), 4, 2000L, 20),
          threshold = NearDupThreshold)
        .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b"))
      TextDedup.dedupClusters(
        emb.select(col("vec_id").as("doc_id")), pairs).count()
    }
    whole() // warm
    (1 to 2).foreach { _ =>
      val emb = Tables.embeddings(spark, dir)
      val n = t("emb_count")(emb.count())
      val bits = Similarity.occupancyBits(n, 4, 2000L, 20)
      val pairs = Similarity.nearDupPairs(emb, bits,
          threshold = NearDupThreshold)
        .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b"))
      t("pairs_count")(println(s"  pairs=${pairs.count()} bits=$bits"))
      t("dedup_clusters")(TextDedup.dedupClusters(
        emb.select(col("vec_id").as("doc_id")), pairs).count())
      // inline loop mirror with per-phase timers
      locally {
        import org.apache.spark.storage.StorageLevel
        var lastCount = 0L
        def materialize(df: org.apache.spark.sql.DataFrame) = {
          val fresh = spark.createDataFrame(df.rdd, df.schema)
            .persist(StorageLevel.MEMORY_AND_DISK)
          lastCount = fresh.count()
          fresh
        }
        val edges = t("il_edges")(materialize(
          pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
            .union(pairs.select(col("doc_b").as("src"),
              col("doc_a").as("dst")))))
        var labels = edges.select(col("src").as("doc_id")).distinct()
          .withColumn("cluster_id", col("doc_id"))
        var converged = false
        var i = 0
        while (!converged && i < 20) {
          val viaNeighbors = edges
            .join(broadcast(labels.withColumnRenamed("doc_id", "dst")),
              Seq("dst"))
            .select(col("src").as("doc_id"), col("cluster_id"))
          val improved = labels.union(viaNeighbors)
            .groupBy("doc_id").agg(min("cluster_id").as("cluster_id"))
          val jumped = improved.as("a")
            .join(improved.as("b"), col("a.cluster_id") === col("b.doc_id"))
            .select(col("a.doc_id"), col("b.cluster_id").as("cluster_id"))
          val flagged = jumped
            .join(broadcast(labels.select(col("doc_id"),
              col("cluster_id").as("__old"))), Seq("doc_id"))
            .select(col("doc_id"), col("cluster_id"),
              (col("cluster_id") =!= col("__old")).as("__chg"))
          val next = t(s"il_iter_${i}_materialize")(materialize(flagged))
          val changed = t(s"il_iter_${i}_chgchk")(
            next.filter(col("__chg")).limit(1).count())
          labels = next.drop("__chg")
          converged = changed == 0
          i += 1
        }
        println(s"  il_iterations=$i")
      }
      t("whole_query")(whole())
    }
    println(f"${"phase"}%-20s min sec")
    best.foreach { case (n0, v) => println(f"$n0%-20s $v%7.3f") }
    spark.stop()
  }
}
