package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._

/** Native codegen'd expressions for the dedup pipelines
  * (graft.dedup.Dedup). Each replaces a built-ins-only higher-order
  * formulation that runs INTERPRETED (higher-order lambdas don't
  * participate in whole-stage codegen) and walks a multi-node expression
  * tree per array element; the HOF forms are retained in `Dedup` as
  * differential-test doubles, and the DuckDB oracles mirror the same
  * integer arithmetic, so agreement is provable three ways.
  *
  * Measured motivation (round 2 verdict): `dedup_minhash_lsh` was the
  * slowest, most variable bench query (3.7–9.2 s at sf0.1) with the
  * interpreted `minhashSignature` as the dominant cost.
  */
object DedupExprs {
  /** Large prime > 2^32 shared by shingle combine + minhash permutations
    * (= graft.dedup.Dedup.MinhashP). */
  val P = 4294967311L
}

/** array<long> token hashes → array<long> distinct 3-gram shingle
  * hashes: h = ((a·8191 + b) mod P)·8191 + c mod P, first-occurrence
  * order (mirrors `transform` + `array_distinct`). Fewer than 3 tokens →
  * empty array. Null ELEMENTS propagate per-shingle then dedup to one
  * null, matching the HOF; a null input array returns null (the HOF
  * double returns an empty array there — upstream never feeds null
  * arrays, and the differential test pins the live domain). */
case class ShingleHashes3(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes3 requires array<bigint>, got ${t.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType,
    containsNull = child.dataType.asInstanceOf[ArrayType].containsNull)
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    ShingleHashes3.shingles(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleHashes3.shingles($c)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes3 =
    copy(child = newChild)

  override def prettyName: String = "shingle_hashes3"
}

object ShingleHashes3 {
  import DedupExprs.P

  /** Called from both interpreted and generated code paths. */
  def shingles(th: ArrayData): ArrayData = {
    val n = th.numElements()
    if (n < 3) return new GenericArrayData(Array.empty[Long])
    val seen = new java.util.LinkedHashSet[Any]()
    var i = 0
    while (i <= n - 3) {
      if (th.isNullAt(i) || th.isNullAt(i + 1) || th.isNullAt(i + 2)) seen.add(null)
      else {
        val a = th.getLong(i); val b = th.getLong(i + 1); val c = th.getLong(i + 2)
        seen.add(java.lang.Long.valueOf(((a * 8191L + b) % P * 8191L + c) % P))
      }
      i += 1
    }
    new GenericArrayData(seen.toArray)
  }

  def shingleHashes(c: Column): Column = bridge.column(ShingleHashes3(bridge.expression(c)))
}

/** array<long> shingle hashes → array<long> MinHash signature of `k`
  * affine permutations ((2i+3)·h + i·2654435761) mod P, elementwise min;
  * element i is P (≡ +∞) when the shingle set is empty. Null elements
  * are skipped (the HOF's `least` ignores nulls). One compiled k×n loop
  * per row vs the interpreted per-element k-vector allocation of the HOF
  * (`Dedup.minhashSignatureHof`). */
case class MinhashSignature(child: Expression, k: Int) extends UnaryExpression {
  // 4096 enforces the overflow audit in MinhashSignature.signature's
  // scaladoc with ~5 orders of magnitude to spare (exact overflow is at
  // k ≈ 4.6e8); real LSH signatures are tens of hashes wide.
  require(k > 0 && k <= 4096,
    s"minhash_signature requires 1 <= k <= 4096, got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_signature requires array<bigint>, got ${t.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    MinhashSignature.signature(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinhashSignature.signature($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): MinhashSignature =
    copy(child = newChild)

  override def prettyName: String = "minhash_signature"
}

object MinhashSignature {
  import DedupExprs.P

  /** Called from both interpreted and generated code paths. Operand
    * bound: h < P < 2^33 and j < k, so (2j+3)·h + j·2654435761 <
    * k·(2^34 + 2^32) ≈ k·2e10 — overflow only at k ≈ 4.6e8, and the
    * expression constructor enforces k ≤ 4096, five orders of magnitude
    * inside the safe range. All operands are non-negative so Java `%`
    * equals the mathematical mod (same as Spark/DuckDB `%` on
    * non-negative BIGINTs). */
  def signature(sh: ArrayData, k: Int): ArrayData = {
    val out = Array.fill[Long](k)(P)
    val n = sh.numElements()
    var i = 0
    while (i < n) {
      if (!sh.isNullAt(i)) {
        val h = sh.getLong(i)
        var j = 0
        while (j < k) {
          val v = ((2L * j + 3L) * h + j * 2654435761L) % P
          if (v < out(j)) out(j) = v
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  def minhash(c: Column, k: Int): Column =
    bridge.column(MinhashSignature(bridge.expression(c), k))
}

/** (array<long> token hashes, n tokens) → 32-bit SimHash as a long: bit
  * j set iff a strict majority of the n tokens have bit j set. One
  * compiled 32×n loop vs the interpreted array-of-counters `aggregate`
  * (`Dedup.simhash32Hof`). Null elements are skipped in the HOF's
  * per-bit arithmetic only by nullifying the whole fold — upstream token
  * hashes are non-null (split output), and the differential test pins
  * the live domain. */
case class Simhash32(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), IntegerType | LongType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"simhash32 requires (array<bigint>, int), got (${l.catalogString}, ${r.catalogString})")
  }
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(vs: Any, n: Any): Any = {
    val nl = n match { case i: java.lang.Integer => i.longValue; case l: java.lang.Long => l.longValue }
    Simhash32.simhash(vs.asInstanceOf[ArrayData], nl)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (vs, n) => s"graft.functions.Simhash32.simhash($vs, (long)$n)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Simhash32 =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "simhash32"
}

object Simhash32 {
  /** Called from both interpreted and generated code paths. */
  def simhash(vs: ArrayData, n: Long): Long = {
    val counts = new Array[Long](32)
    val m = vs.numElements()
    var i = 0
    while (i < m) {
      if (!vs.isNullAt(i)) {
        val v = vs.getLong(i)
        var j = 0
        while (j < 32) {
          counts(j) += (v >>> j) & 1L
          j += 1
        }
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 32) {
      if (counts(j) * 2 > n) out |= 1L << j
      j += 1
    }
    out
  }

  def simhash32(vs: Column, n: Column): Column =
    bridge.column(Simhash32(bridge.expression(vs), bridge.expression(n)))
}
