package graft.functions

import java.math.{BigDecimal => JBigDecimal}

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed custom aggregators (SURVEY §2.10: "aggregate →
  * Aggregator[IN,BUF,OUT]").
  *
  * [[ExactSum]] is the typed twin of [[Parity.dsum]]: doubles are summed
  * as exact BigDecimals (associative/commutative ⇒ partition-order
  * independent) and converted once at the end — usable from the typed
  * Dataset API via `.toColumn` and from DataFrames via `udaf()`.
  */
object TypedAggs {

  object ExactSum extends Aggregator[Double, JBigDecimal, Double] {
    override def zero: JBigDecimal = JBigDecimal.ZERO
    // same per-element quantization as CAST(x AS DECIMAL(30,8)) so the
    // typed path is bit-compatible with Parity.dsum and its oracle SQL
    override def reduce(b: JBigDecimal, a: Double): JBigDecimal =
      b.add(JBigDecimal.valueOf(a)
        .setScale(8, java.math.RoundingMode.HALF_UP))
    override def merge(b1: JBigDecimal, b2: JBigDecimal): JBigDecimal =
      b1.add(b2)
    override def finish(r: JBigDecimal): Double = r.doubleValue()
    override def bufferEncoder: Encoder[JBigDecimal] = Encoders.DECIMAL
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** DataFrame-facing UDAF handle for [[ExactSum]]. */
  val exactSumUdaf = udaf(ExactSum)
}
