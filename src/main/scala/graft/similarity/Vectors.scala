package graft.similarity

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Vector math over `array<float>` embedding columns as pure `Column`
  * higher-order functions (north-star similarity-search extension; the
  * reference has no vector ops).
  *
  * Determinism contract with the DuckDB oracle: every float is widened
  * to double BEFORE any arithmetic, products are formed in index order,
  * and sums are strict left folds seeded with 0.0 — the identical IEEE
  * operation sequence on both engines, so results match bit-for-bit
  * (no rounding slop needed in comparisons).
  */
object Vectors {

  /** Left-fold sum of a double array, seeded 0.0 (matches DuckDB
    * list_reduce with a prepended 0.0). */
  private def foldSum(arr: Column): Column =
    aggregate(arr, lit(0.0), (acc, x) => acc + x)

  /** Dot product of two float vectors in double precision. Backed by the
    * native codegen'd VecDot expression (compiled loop, identical IEEE
    * op order); the HOF formulation below is its differential double. */
  def dot(a: Column, b: Column): Column =
    graft.functions.VecDot.dot(a, b)

  /** Squared L2 norm in double precision (native VecNormSq). */
  def normSq(a: Column): Column =
    graft.functions.VecNormSq.normSq(a)

  /** Built-ins-only formulation of [[dot]] (interpreted HOF path); must
    * agree bit-for-bit with the native expression. */
  private[graft] def dotHof(a: Column, b: Column): Column =
    foldSum(zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)))

  /** Built-ins-only formulation of [[normSq]]. */
  private[graft] def normSqHof(a: Column): Column =
    foldSum(transform(a, x => x.cast(DoubleType) * x.cast(DoubleType)))

  /** Cosine similarity: dot / sqrt(|a|²·|b|²). */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / sqrt(normSq(a) * normSq(b))

  /** Sign-bit LSH bucket over the first `bits` dimensions: bit i set iff
    * component i ≥ 0. Axis-aligned random-hyperplane LSH — deterministic
    * and engine-portable (no RNG). With b bits the candidate set shrinks
    * ~2^b-fold; a production variant would rotate with a fixed seed
    * matrix, same plumbing. */
  def signBucket(a: Column, bits: Int = 4): Column =
    (0 until bits).map { i =>
      when(element_at(a, i + 1) >= 0f, lit(1 << i)).otherwise(lit(0))
    }.reduce(_ + _)
}
