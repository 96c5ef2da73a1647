package graft.kernel

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Per-band raster statistics (reference A12: `rio_stac.create_stac_item
  * (with_raster=True)` attaches min/max/mean/stddev/percentiles and a
  * histogram per asset band, build-stac/utils/stac.py:33-48) as a typed
  * Spark [[Aggregator]] over float-array rows (tiles or scanlines).
  *
  * Single-pass count/min/max/mean/M2 (Chan et al. parallel variance
  * merge — partial aggregation safe) plus a fixed-range histogram from
  * which percentiles interpolate. Nodata values are excluded, like
  * masked arrays in the reference.
  */
object BandStats {

  final case class Buf(
      var count: Long, var min: Double, var max: Double,
      var mean: Double, var m2: Double, var hist: Array[Long])

  final case class Stats(
      count: Long, min: Double, max: Double, mean: Double, stddev: Double,
      p25: Double, p50: Double, p75: Double, p98: Double, histogram: Seq[Long])

  /** @param histMin/histMax fixed histogram range (values outside clamp
    *   to the edge bins); @param bins bin count; @param nodata excluded
    *   sentinel. */
  final case class Agg(histMin: Double, histMax: Double, bins: Int = 11,
      nodata: Option[Float] = None)
      extends Aggregator[Array[Float], Buf, Stats] {

    override def zero: Buf =
      Buf(0L, Double.PositiveInfinity, Double.NegativeInfinity, 0.0, 0.0,
        new Array[Long](bins))

    private def bin(v: Double): Int = {
      val f = (v - histMin) / (histMax - histMin)
      math.max(0, math.min(bins - 1, (f * bins).toInt))
    }

    override def reduce(b: Buf, a: Array[Float]): Buf = {
      var i = 0
      while (i < a.length) {
        val v = a(i).toDouble
        if (!nodata.exists(_ == a(i)) && !v.isNaN) {
          b.count += 1
          if (v < b.min) b.min = v
          if (v > b.max) b.max = v
          val delta = v - b.mean
          b.mean += delta / b.count
          b.m2 += delta * (v - b.mean)
          b.hist(bin(v)) += 1
        }
        i += 1
      }
      b
    }

    override def merge(x: Buf, y: Buf): Buf = {
      if (x.count == 0) y
      else if (y.count == 0) x
      else {
        val n = x.count + y.count
        val delta = y.mean - x.mean
        val mean = x.mean + delta * y.count / n
        val m2 = x.m2 + y.m2 + delta * delta * x.count * y.count / n
        val hist = new Array[Long](bins)
        var i = 0
        while (i < bins) { hist(i) = x.hist(i) + y.hist(i); i += 1 }
        Buf(n, math.min(x.min, y.min), math.max(x.max, y.max), mean, m2, hist)
      }
    }

    private def percentile(b: Buf, p: Double): Double = {
      // histogram-interpolated percentile (bin-uniform assumption)
      val target = p * b.count
      var acc = 0L
      var i = 0
      val w = (histMax - histMin) / bins
      while (i < b.hist.length) {
        val next = acc + b.hist(i)
        if (next >= target && b.hist(i) > 0) {
          val within = (target - acc) / b.hist(i).toDouble
          return math.max(b.min, math.min(b.max, histMin + (i + within) * w))
        }
        acc = next
        i += 1
      }
      b.max
    }

    override def finish(b: Buf): Stats =
      if (b.count == 0) Stats(0, Double.NaN, Double.NaN, Double.NaN, Double.NaN,
        Double.NaN, Double.NaN, Double.NaN, Double.NaN, b.hist.toSeq)
      else Stats(b.count, b.min, b.max, b.mean,
        if (b.count > 1) math.sqrt(b.m2 / (b.count - 1)) else 0.0,
        percentile(b, 0.25), percentile(b, 0.50), percentile(b, 0.75),
        percentile(b, 0.98), b.hist.toSeq)

    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Stats] = Encoders.product[Stats]
  }
}
