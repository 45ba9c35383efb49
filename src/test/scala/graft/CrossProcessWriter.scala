package graft

/** Child-JVM writer for [[CrossProcessCommitSpec]]: its OWN
  * SparkSession in its OWN process, appending `n` single-row batches
  * to the shared table — the commit CAS, OCC retries and rebase
  * layers exercised across a real process boundary (the in-process
  * race spec shares one JVM; `link(2)` is cross-process by nature but
  * the layers above it were never driven from two JVMs before this). */
object CrossProcessWriter {
  def main(args: Array[String]): Unit = {
    val Array(root, writerId, nStr) = args
    val n = nStr.toInt
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]")
      .appName(s"graft-xproc-$writerId")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_xp_wh").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      import spark.implicits._
      (1 to n).foreach { i =>
        graft.ops.Snapshots.append(
          Seq((writerId.toLong * 100000L + i, s"w$writerId-$i"))
            .toDF("id", "v"), root)
      }
    } finally spark.stop()
    // Spark leaves non-daemon threads; the writer's work is durable
    // (every append committed through the CAS) — exit explicitly
    sys.exit(0)
  }
}
