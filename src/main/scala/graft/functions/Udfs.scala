package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** UDF/UDAF surface — SURVEY.md §2.10.
  *
  * `WeightedMean` mirrors the reference's custom-aggregation contract
  * [dask/dataframe/groupby.py :: class Aggregation(name, chunk, agg,
  * finalize)] 1:1 onto Spark's Aggregator: chunk=reduce, agg=merge,
  * finalize=finish. Spark runs it as partial aggregation before the
  * shuffle (map-side combine), so it scales like any built-in agg.
  */
object Udfs {

  /** Buffer: (weighted sum, weight sum). */
  case class WMBuf(wsum: Double, wtot: Double)

  class WeightedMean extends Aggregator[(Double, Double), WMBuf, Double] {
    override def zero: WMBuf = WMBuf(0.0, 0.0)
    // chunk: fold one (value, weight) row into the partition-local buffer
    override def reduce(b: WMBuf, a: (Double, Double)): WMBuf =
      WMBuf(b.wsum + a._1 * a._2, b.wtot + a._2)
    // agg: merge buffers across partitions (tree combine)
    override def merge(b1: WMBuf, b2: WMBuf): WMBuf =
      WMBuf(b1.wsum + b2.wsum, b1.wtot + b2.wtot)
    // finalize
    override def finish(r: WMBuf): Double =
      if (r.wtot == 0.0) Double.NaN else r.wsum / r.wtot
    override def bufferEncoder: Encoder[WMBuf] = Encoders.product[WMBuf]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  val weightedMean = new WeightedMean

  /** Scalar UDF bodies (registered by UdfQueries; kept here for specs).
    * Prefer built-in Column functions — these exist to cover the
    * reference's applymap/apply escape hatch [tests/test_applymap.py].
    */
  val scoreFn: String => Int = s => s.length * 2 + s.count(_ == ' ')
  val revUpFn: String => String = s => s.toUpperCase.reverse
}
