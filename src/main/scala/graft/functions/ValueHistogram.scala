package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Summary emitted per group: statistics over the frequency of each distinct
  * value, matching the reference's ValueHistogram output fields (reference:
  * hadoop-mapreduce-client-core .../lib/aggregate/ValueHistogram.java:38 —
  * it emits distinct-count, min, median, max, mean, stddev of bucket sizes).
  */
final case class HistogramSummary(
    nDistinct: Long,
    minFreq: Long,
    medianFreq: Double,
    maxFreq: Long,
    meanFreq: Double,
    stddevFreq: Double)

/** Typed Aggregator parity for the reference's ValueHistogram UDAF.
  *
  * Buffer = value -> frequency map; merge is map-union with added counts, so
  * partial aggregation (map-side combine) applies exactly as the reference's
  * combiner did. For very high-cardinality groups prefer the compositional
  * two-level groupBy in [[graft.operators.AggOps.valueHistogram]] (bounded
  * memory per task); this Aggregator is the drop-in UDAF surface
  * (`functions.udaf(new ValueHistogram)`).
  */
class ValueHistogram extends Aggregator[String, Map[String, Long], HistogramSummary] {

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], a: String): Map[String, Long] =
    b.updated(a, b.getOrElse(a, 0L) + 1L)

  override def merge(b1: Map[String, Long], b2: Map[String, Long]): Map[String, Long] =
    if (b1.size < b2.size) merge(b2, b1)
    else b2.foldLeft(b1) { case (acc, (k, v)) => acc.updated(k, acc.getOrElse(k, 0L) + v) }

  override def finish(m: Map[String, Long]): HistogramSummary = {
    if (m.isEmpty) return HistogramSummary(0L, 0L, 0.0, 0L, 0.0, 0.0)
    val freqs = m.values.toArray.sorted
    val n = freqs.length
    val mean = freqs.sum.toDouble / n
    val median =
      if (n % 2 == 1) freqs(n / 2).toDouble
      else (freqs(n / 2 - 1) + freqs(n / 2)) / 2.0
    val variance = freqs.map(f => (f - mean) * (f - mean)).sum / n
    HistogramSummary(n.toLong, freqs.head, median, freqs.last, mean, math.sqrt(variance))
  }

  override def bufferEncoder: Encoder[Map[String, Long]] =
    Encoders.kryo[Map[String, Long]]

  override def outputEncoder: Encoder[HistogramSummary] =
    Encoders.product[HistogramSummary]
}
