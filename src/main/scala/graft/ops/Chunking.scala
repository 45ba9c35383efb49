package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Document chunking for training-data pipelines: split each document
  * into fixed-size token windows with overlap (stride < chunkSize), the
  * UDTF-shaped operator from SURVEY.md §2.10 — expressed with a built-in
  * Generate over an int sequence (no custom Generator needed; the
  * explode payload is chunk INDICES, with the string slicing done in the
  * projection above it — cf. the inline-explode note in
  * [[TextDedup.shingles]]).
  *
  * Chunk i covers tokens [i·stride + 1, i·stride + chunkSize]; every
  * token index ≤ n appears in at least one chunk.
  */
object Chunking {

  def chunkTokens(docs: DataFrame, chunkSize: Int, stride: Int): DataFrame = {
    require(stride > 0 && chunkSize >= stride,
      "need 0 < stride <= chunkSize (chunks must tile the doc)")
    // last chunk index = ceil((n − chunkSize)/stride) clamped at 0: one
    // chunk when the doc fits, and never a tail chunk fully contained in
    // its predecessor (which would duplicate training text). The
    // numerator is clamped BEFORE the integer division — floor-vs-
    // truncate semantics differ between engines on negatives.
    docs
      .withColumn("__toks", TextFns.tokensWs(col("text")))
      .withColumn("chunk_idx",
        explode(sequence(lit(0),
          expr(s"greatest(0, size(__toks) - $chunkSize + $stride - 1)" +
            s" div $stride"))))
      .select(
        col("doc_id"),
        col("chunk_idx").cast("long").as("chunk_idx"),
        concat_ws(" ",
          slice(col("__toks"), col("chunk_idx") * stride + 1, lit(chunkSize)))
          .as("chunk_text"),
        least(lit(chunkSize),
          size(col("__toks")) - col("chunk_idx") * stride)
          .cast("long").as("n_chunk_tokens"))
  }
}
