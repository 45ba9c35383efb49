package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.Tables
import graft.ops.TextDedup

/** Dev scratch: decompose d5 (ngramJaccardDups) cost at a given scale —
  * is the 100× time the shingle pass (computed once per plan
  * reference), the candidate join, or the posting-list verify? Not part
  * of the driver contract. Usage: runMain graft.tools.D5Probe <sfDir> */
object D5Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"D5PROBE $name%-26s ${(System.nanoTime() - t0) / 1e9}%8.2f s ($n rows)")
    }
    val docs = Tables.documents(spark, dir)
    time("one shingle pass") {
      TextDedup.shingles(docs, 3).count()
    }
    time("rare (df agg)") {
      TextDedup.shingles(docs, 3).groupBy("shingle")
        .agg(count(lit(1)).as("df"))
        .filter(col("df") >= 2 && col("df") <= 10).count()
    }
    time("committed d5") {
      TextDedup.ngramJaccardDups(docs, n = 3, maxDF = 10,
        threshold = 0.5, minSharedRare = 2).count()
    }
    time("d5 with persisted shingles") {
      val sh = TextDedup.shingles(docs, 3).persist(StorageLevel.MEMORY_AND_DISK)
      try {
        sh.count()
        val rare = sh.groupBy("shingle").agg(count(lit(1)).as("df"))
          .filter(col("df") >= 2 && col("df") <= 10).select("shingle")
        val posting = sh.join(rare, Seq("shingle"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        val cands = posting.select(col("shingle"), col("doc_id").as("doc_a"))
          .join(posting.select(col("shingle"), col("doc_id").as("doc_b")),
            Seq("shingle"))
          .filter(col("doc_a") < col("doc_b"))
          .groupBy("doc_a", "doc_b")
          .agg(count(lit(1)).as("__shared"))
          .filter(col("__shared") >= 2)
          .select("doc_a", "doc_b")
        val n = TextDedup.verifyJaccard(cands, sh, 0.5).count()
        posting.unpersist()
        n
      } finally sh.unpersist()
    }
    spark.stop()
  }
}
