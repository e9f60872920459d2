package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._

/** Native codegen'd vector math over embedding arrays (float or double
  * elements), replacing the interpreted `zip_with`/`transform` +
  * `aggregate` higher-order formulations in `graft.similarity.Vectors`
  * (retained there as differential-test doubles).
  *
  * IEEE determinism contract (same as the HOF forms and the DuckDB
  * oracles): every element is widened to double BEFORE multiplying, products
  * form in index order, and the sum is a strict left fold seeded 0.0 —
  * the identical operation sequence on every engine, so results match
  * bit-for-bit. Null propagation matches the HOFs: a null element or a
  * length mismatch (zip_with pads with null) nullifies the result.
  */
private[functions] object VectorExprs {
  def isVec(t: DataType): Boolean = t match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }
  def isFloat(t: DataType): Boolean =
    t.asInstanceOf[ArrayType].elementType == FloatType
}

/** dot(a, b) in double precision; null if lengths differ or any element
  * is null (mirrors `foldSum(zip_with(a, b, widen-multiply))`). */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (VectorExprs.isVec(left.dataType) && VectorExprs.isVec(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot requires two array<float|double>, got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true

  private def fa = VectorExprs.isFloat(left.dataType)
  private def fb = VectorExprs.isFloat(right.dataType)

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecDot.dotBoxed(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], fa, fb)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("vecDot")
      s"""java.lang.Double $r = graft.functions.VecDot.dotBoxed($a, $b, $fa, $fb);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.doubleValue(); }""".stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "vec_dot"
}

object VecDot {
  private def at(v: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)

  /** Called from both interpreted and generated code paths. Boxed return
    * so a length mismatch / null element can yield SQL NULL. */
  def dotBoxed(a: ArrayData, b: ArrayData, fa: Boolean, fb: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += at(a, i, fa) * at(b, i, fb)
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  def dot(a: Column, b: Column): Column =
    bridge.column(VecDot(bridge.expression(a), bridge.expression(b)))
}

/** Squared L2 norm in double precision; null if any element is null
  * (mirrors `foldSum(transform(a, widen-square))`). */
case class VecNormSq(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (VectorExprs.isVec(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_norm_sq requires array<float|double>, got ${child.dataType.catalogString}")

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true

  private def f = VectorExprs.isFloat(child.dataType)

  override protected def nullSafeEval(a: Any): Any =
    VecNormSq.normSqBoxed(a.asInstanceOf[ArrayData], f)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val r = ctx.freshName("vecNsq")
      s"""java.lang.Double $r = graft.functions.VecNormSq.normSqBoxed($a, $f);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.doubleValue(); }""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): VecNormSq =
    copy(child = newChild)

  override def prettyName: String = "vec_norm_sq"
}

object VecNormSq {
  /** Called from both interpreted and generated code paths. */
  def normSqBoxed(a: ArrayData, isFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      val v = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
      acc += v * v
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  def normSq(a: Column): Column = bridge.column(VecNormSq(bridge.expression(a)))
}
