package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregators (`Aggregator` → `udaf(...)`) — the
  * user-defined-aggregate extension surface of the engine.
  *
  * Buffers merge associatively and commutatively, so results are
  * identical under any partitioning/combine order — the property every
  * custom aggregate MUST have on a 1000-executor job (partial
  * aggregation applies them map-side before the shuffle).
  */
object TypedAggregates {

  final case class MeanBuf(sum: BigDecimal, n: Long)

  /** Exact mean of 2-dp money doubles: values enter the buffer via
    * `BigDecimal.valueOf` (shortest decimal form, so 12.34 stays scale-2
    * — the same value DuckDB's `CAST(x AS DECIMAL(18,2))` sees), decimal
    * summation is exact and order-independent, and only the final
    * sum→double / count division is floating-point — matching the
    * oracle's `CAST(SUM(...) AS DOUBLE) / COUNT(*)` bit-for-bit. */
  object ExactMean extends Aggregator[Double, MeanBuf, Double] {
    override def zero: MeanBuf = MeanBuf(BigDecimal(0), 0L)
    override def reduce(b: MeanBuf, a: Double): MeanBuf =
      MeanBuf(b.sum + BigDecimal(java.math.BigDecimal.valueOf(a)), b.n + 1)
    override def merge(x: MeanBuf, y: MeanBuf): MeanBuf =
      MeanBuf(x.sum + y.sum, x.n + y.n)
    override def finish(b: MeanBuf): Double =
      if (b.n == 0) Double.NaN else b.sum.toDouble / b.n
    override def bufferEncoder: Encoder[MeanBuf] = Encoders.product[MeanBuf]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }
}
