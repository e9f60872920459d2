package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the reference's CPF/CNPJ clean
  * (`/root/reference/etl_process.py:10–11`: `re.sub(r'\D', '', str(x))`).
  *
  * The reference runs this as a per-row Python lambda via pandas
  * `.apply`; here it is a codegen'd unary expression that participates in
  * whole-stage codegen — no UDF boundary, no serialization. Semantics:
  * keep ASCII digits, drop everything else; null in → null out. Works
  * directly on UTF-8 bytes: multi-byte sequences always have the high bit
  * set, so a byte in ['0','9'] is always a real digit character and the
  * filter never needs to decode code points.
  *
  * Equivalent to `regexp_replace(x, "[^0-9]", "")` (the oracle SQL) but
  * ~one branch per byte instead of a regex-engine pass.
  */
case class CpfClean(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cpf_clean requires a string argument, got ${child.dataType.catalogString}")
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    CpfClean.clean(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CpfClean.clean($c)")

  override protected def withNewChildInternal(newChild: Expression): CpfClean =
    copy(child = newChild)

  override def prettyName: String = "cpf_clean"
}

object CpfClean {
  /** Byte-level digit filter; called from both interpreted and generated
    * code paths. */
  def clean(s: UTF8String): UTF8String = {
    val bytes = s.getBytes
    val out = new Array[Byte](bytes.length)
    var i = 0
    var n = 0
    while (i < bytes.length) {
      val b = bytes(i)
      if (b >= '0' && b <= '9') { out(n) = b; n += 1 }
      i += 1
    }
    UTF8String.fromBytes(out, 0, n)
  }

  /** DataFrame-API entry point. */
  def cpfClean(c: Column): Column =
    bridge.column(CpfClean(bridge.expression(c)))
}
