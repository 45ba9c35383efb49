package graft.functions

import org.apache.spark.sql.{Column, GraftSql}
import org.apache.spark.sql.functions._

/** Embedding-vector functions over `ArrayType(FloatType)` columns.
  *
  * Determinism: dot products are LEFT FOLDS with a 0.0 seed over
  * double-cast elements. Double addition is order-sensitive; fixing the
  * fold order makes every similarity bitwise-reproducible across engines
  * and partition layouts (the DuckDB oracle mirrors the same fold).
  *
  * The dot product itself is a custom codegen'd Catalyst expression
  * ([[ArrayDotProduct]]) — the higher-order `aggregate`/`zip_with`
  * formulation ([[dotHof]]) computes the same value but pays an
  * interpreted lambda call per element, which dominates O(pairs × dims)
  * similarity joins.
  */
object VectorFns {

  /** Cast a float vector to double elements (do this once, up front —
    * float×float arithmetic differs between engines). */
  def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Left-fold dot product of two double vectors (codegen'd loop). */
  def dot(a: Column, b: Column): Column =
    GraftSql.column(ArrayDotProduct(
      GraftSql.expression(a), GraftSql.expression(b)))

  /** Higher-order-function dot product — same left-fold semantics as
    * [[dot]], kept as the cross-check reference for tests. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, p) => acc + p)

  /** L2 norm (left-fold sum of squares, then sqrt). */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity: dot / (‖a‖·‖b‖) — fused single-pass expression
    * ([[ArrayCosine]]): identical value and operation order to composing
    * [[dot]]/[[norm]], one array traversal instead of three. */
  def cosine(a: Column, b: Column): Column =
    GraftSql.column(ArrayCosine(
      GraftSql.expression(a), GraftSql.expression(b)))

  /** Axis-sign LSH bucket over the first `bits` coordinates: bit j set iff
    * v[j+1] > 0 (an instance of random-hyperplane LSH with the hyperplanes
    * fixed to the first coordinate axes — deterministic, so the
    * approximate result is exactly reproducible and oracle-checkable).
    * With `bits`=4 → 16 buckets; the scale path partitions candidate
    * generation by bucket so the pair space shrinks ~bucket-count-fold. */
  def signBucket(v: Column, bits: Int): Column =
    (0 until bits).map { j =>
      when(element_at(v, j + 1) > 0f, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
}
