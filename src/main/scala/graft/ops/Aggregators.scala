package graft.ops

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Custom typed aggregations (SURVEY §2.3 UDAF surface).
  *
  * The reference has no aggregate UDFs; this covers the engine-side
  * `Aggregator[IN,BUF,OUT]` requirement with exact-decimal arithmetic so
  * results hash-match a DuckDB decimal oracle (FP summation order would
  * not). Registered untyped via `functions.udaf` so it participates in
  * partial (map-side) aggregation like any built-in — the buffer is a
  * single decimal, so a 100 TB groupBy ships one number per group per
  * partition, not the rows.
  */
object Aggregators {

  /** Sum of squares with inputs quantized to DECIMAL(18,2) before
    * squaring — mirrors `CAST(x AS DECIMAL(18,2))` exactly: engines
    * cast double→decimal through the SHORTEST decimal representation
    * (Double.toString / BigDecimal.valueOf), not the exact binary
    * expansion — new BigDecimal(2.675) would round the other way. */
  object SumSq extends Aggregator[Double, JBigDecimal, Double] {
    private def quant(x: Double): JBigDecimal =
      JBigDecimal.valueOf(x).setScale(2, RoundingMode.HALF_UP)
    def zero: JBigDecimal = JBigDecimal.ZERO
    def reduce(b: JBigDecimal, x: Double): JBigDecimal = {
      val q = quant(x)
      b.add(q.multiply(q))
    }
    def merge(a: JBigDecimal, b: JBigDecimal): JBigDecimal = a.add(b)
    def finish(b: JBigDecimal): Double = b.doubleValue()
    def bufferEncoder: Encoder[JBigDecimal] = Encoders.DECIMAL
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Bounded top-k values per group as a descending array — the
    * scalable group-top-k: the buffer never exceeds k elements, so the
    * map-side combine ships ≤ k doubles per group per partition instead
    * of every row (a rank-window formulation shuffles all rows). Values
    * are quantized to DECIMAL(18,2) (ties and FP noise would otherwise
    * make the boundary element engine-dependent). */
  final class TopK(k: Int) extends Aggregator[Double, Seq[JBigDecimal], Seq[Double]] {
    private def quant(x: Double): JBigDecimal =
      JBigDecimal.valueOf(x).setScale(2, RoundingMode.HALF_UP)
    private def trim(xs: Seq[JBigDecimal]): Seq[JBigDecimal] =
      xs.sortWith(_.compareTo(_) > 0).take(k)
    def zero: Seq[JBigDecimal] = Vector.empty
    def reduce(b: Seq[JBigDecimal], x: Double): Seq[JBigDecimal] = trim(b :+ quant(x))
    def merge(a: Seq[JBigDecimal], b: Seq[JBigDecimal]): Seq[JBigDecimal] = trim(a ++ b)
    def finish(b: Seq[JBigDecimal]): Seq[Double] = b.map(_.doubleValue())
    def bufferEncoder: Encoder[Seq[JBigDecimal]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[JBigDecimal]]()
    def outputEncoder: Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
  }
}
