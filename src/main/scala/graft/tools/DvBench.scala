package graft.tools

import java.nio.file.Files

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.Snapshots

/** Write-amplification evidence for deletion-vector DELETE: the same
  * scattered narrow delete (a handful of rows in EVERY file) applied to
  * two identical snapshot tables via copy-on-write [[Snapshots.deleteWhere]]
  * vs [[Snapshots.deleteWhereLight]], reporting wall time and bytes
  * written by the delete commit. Reads after both must agree exactly.
  *
  * Usage: runMain graft.tools.DvBench [sfDir]
  */
object DvBench {
  private def ms[A](body: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val r = body
    (r, (System.nanoTime() - t0) / 1e6)
  }

  private def bytesUnder(spark: SparkSession, dir: String): Long = {
    val p = new HPath(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(p, true)
    var n = 0L
    while (it.hasNext) n += it.next().getLen
    n
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_quantity", "l_extendedprice", "l_shipdate")
    def build(): String = {
      val root = Files.createTempDirectory("graft_dvb").toFile.toString + "/t"
      (0 until 8).foreach(i => Snapshots.append(
        base.filter(pmod(col("l_orderkey"), lit(8)) === i), root))
      root
    }
    val cow = build(); val dv = build()
    // a few rows in EVERY file: the CoW worst case
    val pred = pmod(col("l_orderkey"), lit(37501)) === 7L
    val nMatch = Snapshots.read(spark, cow).filter(pred).count()
    val bytesBeforeCow = bytesUnder(spark, cow)
    val bytesBeforeDv = bytesUnder(spark, dv)
    val (rc, tCow) = ms(Snapshots.deleteWhere(spark, cow, pred))
    val (rl, tDv) = ms(Snapshots.deleteWhereLight(spark, dv, pred))
    val wroteCow = bytesUnder(spark, cow) - bytesBeforeCow
    val wroteDv = bytesUnder(spark, dv) - bytesBeforeDv
    val same = Snapshots.read(spark, cow).collect().map(_.toString).sorted
      .sameElements(Snapshots.read(spark, dv).collect().map(_.toString).sorted)
    println(s"deleted_rows=$nMatch files_rewritten_cow=${rc.rewrittenFiles} " +
      s"dv_files=${rl.dvFiles}")
    println(f"cow_ms=$tCow%.0f cow_bytes_written=$wroteCow " +
      f"dv_ms=$tDv%.0f dv_bytes_written=$wroteDv " +
      f"bytes_ratio=${wroteCow.toDouble / math.max(1, wroteDv)}%.0fx " +
      s"reads_agree=$same")

    // the same comparison for MERGE: a narrow scattered upsert
    val mcow = build(); val mdv = build()
    val src = base.filter(pmod(col("l_orderkey"), lit(37501)) === 7L)
      .withColumn("l_quantity", -col("l_quantity"))
      .dropDuplicates("l_orderkey", "l_shipdate", "l_extendedprice")
    val mBytesBeforeCow = bytesUnder(spark, mcow)
    val mBytesBeforeDv = bytesUnder(spark, mdv)
    val (mc, tMCow) = ms(Snapshots.merge(spark, mcow, src,
      Seq("l_orderkey", "l_shipdate", "l_extendedprice")))
    val (ml, tMDv) = ms(Snapshots.mergeLight(spark, mdv, src,
      Seq("l_orderkey", "l_shipdate", "l_extendedprice")))
    val mWroteCow = bytesUnder(spark, mcow) - mBytesBeforeCow
    val mWroteDv = bytesUnder(spark, mdv) - mBytesBeforeDv
    val mSame = Snapshots.read(spark, mcow).collect().map(_.toString).sorted
      .sameElements(
        Snapshots.read(spark, mdv).collect().map(_.toString).sorted)
    println(s"merge_rows=${ml.rowsReplaced} " +
      s"files_rewritten_cow=${mc.rewrittenFiles} dv_files=${ml.dvFiles}")
    println(f"merge_cow_ms=$tMCow%.0f merge_cow_bytes=$mWroteCow " +
      f"merge_dv_ms=$tMDv%.0f merge_dv_bytes=$mWroteDv " +
      f"bytes_ratio=${mWroteCow.toDouble / math.max(1, mWroteDv)}%.0fx " +
      s"reads_agree=$mSame")

    // the same comparison for UPDATE: a narrow scattered field
    // correction (the GDPR-redaction / bad-tick-fix shape). The DV
    // path writes new files for the UPDATED rows only, plus vectors.
    val ucow = build(); val udv = build()
    val uPred = pmod(col("l_orderkey"), lit(37501)) === 7L
    val uAssign = Seq("l_quantity" -> -col("l_quantity"))
    val uBytesBeforeCow = bytesUnder(spark, ucow)
    val uBytesBeforeDv = bytesUnder(spark, udv)
    val (uc, tUCow) = ms(Snapshots.updateWhere(spark, ucow, uPred, uAssign))
    val (ul, tUDv) = ms(Snapshots.updateWhereLight(spark, udv, uPred,
      uAssign))
    val uWroteCow = bytesUnder(spark, ucow) - uBytesBeforeCow
    val uWroteDv = bytesUnder(spark, udv) - uBytesBeforeDv
    val uSame = Snapshots.read(spark, ucow).collect().map(_.toString).sorted
      .sameElements(
        Snapshots.read(spark, udv).collect().map(_.toString).sorted)
    println(s"update_rows=${ul.updatedRows} " +
      s"files_rewritten_cow=${uc.rewrittenFiles} dv_files=${ul.dvFiles}")
    println(f"update_cow_ms=$tUCow%.0f update_cow_bytes=$uWroteCow " +
      f"update_dv_ms=$tUDv%.0f update_dv_bytes=$uWroteDv " +
      f"bytes_ratio=${uWroteCow.toDouble / math.max(1, uWroteDv)}%.0fx " +
      s"reads_agree=$uSame")

    // DV-debt FOLD cost: after trickle deletes leave one file heavily
    // vectored (40%) and the rest lightly (scattered few rows), a
    // maintain-style fold rewrites ONLY the over-threshold file —
    // compare its cost/bytes against the full compact alternative.
    val fold = build(); val full = build()
    Seq(fold, full).foreach { r =>
      // heavy debt on the l_orderkey%8==0 file, light debt everywhere
      Snapshots.deleteWhereLight(spark, r,
        pmod(col("l_orderkey"), lit(8)) === 0 &&
          pmod(col("l_orderkey"), lit(5)) < 2, maxPositions = 10000000)
      Snapshots.deleteWhereLight(spark, r,
        pmod(col("l_orderkey"), lit(37501)) === 9L)
    }
    val fBytesBefore = bytesUnder(spark, fold)
    val cBytesBefore = bytesUnder(spark, full)
    val (fr, tFold) = ms(Snapshots.foldDeletionVectors(spark, fold, 0.1))
    val (_, tFull) = ms(Snapshots.compact(spark, full, numFiles = 8))
    val fWrote = bytesUnder(spark, fold) - fBytesBefore
    val cWrote = bytesUnder(spark, full) - cBytesBefore
    val fSame = Snapshots.read(spark, fold).collect().map(_.toString).sorted
      .sameElements(
        Snapshots.read(spark, full).collect().map(_.toString).sorted)
    println(s"fold_files=${fr.foldedFiles} " +
      s"fold_positions_retired=${fr.positionsRetired} " +
      s"fold_untouched=${fr.untouchedFiles}")
    println(f"fold_ms=$tFold%.0f fold_bytes=$fWrote " +
      f"compact_ms=$tFull%.0f compact_bytes=$cWrote " +
      f"bytes_ratio=${cWrote.toDouble / math.max(1, fWrote)}%.1fx " +
      s"reads_agree=$fSame")
    spark.stop()
  }
}
