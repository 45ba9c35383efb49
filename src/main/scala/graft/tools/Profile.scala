package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFns
import graft.ops.TextDedup

/** Dev scratch profiler for hot operators (not part of the contract). */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
    }

    val docs = Tables.documents(spark, dir).cache()
    docs.count()

    // warmup
    docs.select(lower(col("text"))).count()

    time("explode tokens") {
      docs.withColumn("__tok", explode(TextFns.tokensWs(lower(col("text"))))).count()
    }
    time("explode+hash60") {
      docs.withColumn("__tok", explode(TextFns.tokensWs(lower(col("text")))))
        .select(TextFns.hash60(col("__tok")).as("h")).count()
    }
    time("full simhash fingerprints") {
      TextDedup.simHash(docs, 48).count()
    }
    time("simhash near-dups e2e") {
      TextDedup.simHashNearDups(docs, 48, 4, 6).count()
    }
    time("minhash near-dups e2e") {
      TextDedup.minHashNearDups(docs).count()
    }
    val sh = TextDedup.shingles(docs)
    time("  exploded shingles") { sh.count() }
    time("  signatures") { TextDedup.minHashSignatures(sh, 16).count() }
    val cands = TextDedup.lshCandidates(TextDedup.minHashSignatures(sh, 16), 16, 4)
    time("  candidates") { cands.count() }
    time("  verify postings") {
      TextDedup.verifyJaccard(cands, sh, 0.4).count()
    }
    val rare = sh.groupBy("shingle").agg(count(lit(1)).as("df"))
      .filter(col("df") >= 2 && col("df") <= 20).select("shingle")
    val posting = sh.join(rare, Seq("shingle"))
    time("  ngram postings") { posting.count() }
    val ngCands = posting.select(col("shingle"), col("doc_id").as("doc_a"))
      .join(posting.select(col("shingle"), col("doc_id").as("doc_b")),
        Seq("shingle"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b")
    time("  ngram cand pairs (pre-distinct)") { ngCands.count() }
    time("  ngram cand pairs (distinct)") { ngCands.distinct().count() }
    time("  ngram e2e") { TextDedup.ngramJaccardDups(docs).count() }
    time("  ngram e2e maxDF=10") {
      TextDedup.ngramJaccardDups(docs, maxDF = 10).count()
    }
    time("  ngram e2e maxDF=5") {
      TextDedup.ngramJaccardDups(docs, maxDF = 5).count()
    }
    time("  ngram e2e maxDF=3") {
      TextDedup.ngramJaccardDups(docs, maxDF = 3).count()
    }
    spark.stop()
  }
}
