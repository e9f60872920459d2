package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._

/** Native Catalyst expression: array<string> → array<long>, each element
  * the first 32 bits (big-endian unsigned) of the element's md5 — the
  * value every dedup pipeline hash derives from
  * (graft.dedup.Dedup: shingles, minhash, simhash).
  *
  * Exists for performance: the composable formulation
  * `transform(transform(toks, md5), hexFold32)` runs INTERPRETED (
  * higher-order lambdas don't participate in codegen) and walks an
  * ~20-node expression tree per token. This expression is one compiled
  * loop per row — one md5, four byte masks per token — and its
  * `doGenCode` keeps the surrounding projection inside whole-stage
  * codegen. Identical values by construction: the first 8 hex chars of
  * an md5 digest ARE its first 4 bytes.
  */
case class TokenHashArray(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"token_hash32_array requires array<string>, got ${t.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType,
    containsNull = child.dataType.asInstanceOf[ArrayType].containsNull)
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    TokenHashArray.hashAll(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenHashArray.hashAll($c)")

  override protected def withNewChildInternal(newChild: Expression): TokenHashArray =
    copy(child = newChild)

  override def prettyName: String = "token_hash32_array"
}

object TokenHashArray {
  private val digests: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** Called from both interpreted and generated code paths. */
  def hashAll(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Any](n)
    val md = digests.get()
    var i = 0
    while (i < n) {
      // null element → null hash (md5(null) is null in the HOF double)
      if (!arr.isNullAt(i)) {
        md.reset()
        md.update(arr.getUTF8String(i).getBytes)
        val d = md.digest()
        out(i) = ((d(0) & 0xFFL) << 24) | ((d(1) & 0xFFL) << 16) |
          ((d(2) & 0xFFL) << 8) | (d(3) & 0xFFL)
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** DataFrame-API entry point. */
  def tokenHashes(c: Column): Column =
    bridge.column(TokenHashArray(bridge.expression(c)))
}
