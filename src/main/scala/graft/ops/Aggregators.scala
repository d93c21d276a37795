package graft.ops

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Typed UDAF surface (SURVEY §2.5): the reference's user `reduce`/`sum`
  * aggregates generalize to `Aggregator[IN, BUF, OUT]` — partial buffers
  * merge map-side exactly like builtin aggregates, so a custom aggregate
  * costs one shuffle of BUF per group, never a row shuffle.
  */
object Aggregators {

  /** Weighted average: value weighted by weight (e.g. price by qty). */
  object WeightedAvg extends Aggregator[(Double, Double), (Double, Double), Double] {
    override def zero: (Double, Double) = (0.0, 0.0)
    override def reduce(b: (Double, Double), in: (Double, Double)): (Double, Double) =
      (b._1 + in._1 * in._2, b._2 + in._2)
    override def merge(a: (Double, Double), b: (Double, Double)): (Double, Double) =
      (a._1 + b._1, a._2 + b._2)
    override def finish(b: (Double, Double)): Double =
      if (b._2 == 0.0) Double.NaN else b._1 / b._2
    override def bufferEncoder: Encoder[(Double, Double)] = Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }
}
