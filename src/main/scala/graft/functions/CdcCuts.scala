package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd CDC boundary finder: string → array<bigint> of cut
  * positions `[0] ++ {i ∈ [w, n) : rollingHash(i) % mask = 0} ++ [n]`,
  * where rollingHash(i) folds the w chars ending at 1-based position i
  * through `(a·31 + c) % mod` from 0 (c = the char's code point, the
  * `ascii()` value on this ASCII-asserted corpus).
  *
  * Exists for performance (round 14; the [[DedupExprs]] precedent): the
  * built-ins-only formulation materializes a PER-CHARACTER array of
  * single-char strings (`split(text, "")`), maps it through an
  * interpreted `transform(·, ascii)`, then evaluates an interpreted
  * `aggregate(slice(codes, i−w+1, w), …)` — an 8-step lambda fold with
  * a fresh slice allocation — at EVERY position: O(len·w) interpreted
  * lambda walks plus O(len) string allocations per document, the
  * dominant cost of `dedup_cdc_chunks` (measured ~3.3 s at sf0.1).
  * This expression is one compiled char loop per row and keeps the
  * surrounding projection inside whole-stage codegen. The HOF form is
  * retained in `FrontierQueriesP.cdcCutsHof` as the differential-test
  * double, and the DuckDB oracle states the same fold — agreement
  * provable three ways, the DedupExprs pattern.
  *
  * Equivalence notes: per-step `% mod` composes to the full polynomial
  * mod (all operands non-negative, Java `%` = SQL `%` there), so the
  * inner loop reproduces the HOF fold bit-for-bit; the `i < n` guard of
  * the HOF's filter is the loop bound (the final position never cuts —
  * `[n]` is appended as the sentinel either way); `n < w` yields
  * `[0, n]` exactly like the HOF's empty-positions branch. Null input →
  * null (nullIntolerant), matching the built-in chain. */
case class CdcCuts(child: Expression, w: Int, mask: Long, mod: Long)
    extends UnaryExpression {
  require(w >= 1 && mask >= 1 && mod >= 1, s"bad CDC params w=$w mask=$mask mod=$mod")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"cdc_cuts requires string, got ${t.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    CdcCuts.cuts(input.asInstanceOf[UTF8String], w, mask, mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.CdcCuts.cuts($c, $w, ${mask}L, ${mod}L)")

  override protected def withNewChildInternal(newChild: Expression): CdcCuts =
    copy(child = newChild)

  override def prettyName: String = "cdc_cuts"
}

object CdcCuts {
  /** Called from both interpreted and generated code paths. Operates on
    * CODE POINTS (what `split(text, "") → ascii` sees); the corpus is
    * ASCII-asserted upstream, where code points, chars and bytes
    * coincide. Bound audit: each fold step holds a ≤ mod ≤ 2²⁰ and
    * c ≤ 0x10FFFF, so a·31 + c < 2²⁶ — no overflow at any text size. */
  def cuts(s: UTF8String, w: Int, mask: Long, mod: Long): ArrayData = {
    val str = s.toString
    val n = str.codePointCount(0, str.length)
    val out = new java.util.ArrayList[Long](16)
    out.add(0L)
    if (n >= w && n == str.length) {
      // fast path: no surrogate pairs (ASCII and all of the BMP) —
      // charAt(i) IS code point i
      var i = w // 1-based cut position; cuts only strictly inside
      while (i < n) {
        var h = 0L
        var j = i - w // 0-based window start
        while (j < i) {
          h = (h * 31L + str.charAt(j)) % mod
          j += 1
        }
        if (h % mask == 0L) out.add(i.toLong)
        i += 1
      }
    } else if (n >= w) {
      // surrogate-pair path (never taken on the asserted corpus, kept
      // for exact split/ascii parity on arbitrary input)
      val cps = str.codePoints().toArray
      var i = w
      while (i < n) {
        var h = 0L
        var j = i - w
        while (j < i) {
          h = (h * 31L + cps(j)) % mod
          j += 1
        }
        if (h % mask == 0L) out.add(i.toLong)
        i += 1
      }
    }
    out.add(n.toLong)
    val arr = new Array[Long](out.size)
    var k = 0
    while (k < arr.length) { arr(k) = out.get(k); k += 1 }
    new GenericArrayData(arr)
  }

  /** DataFrame-API entry point. */
  def cdcCuts(c: Column, w: Int, mask: Long, mod: Long): Column =
    bridge.column(CdcCuts(bridge.expression(c), w, mask, mod))
}
