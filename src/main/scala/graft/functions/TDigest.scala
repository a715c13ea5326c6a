package graft.functions

import java.nio.ByteBuffer

/**
 * Merging t-digest (Dunning & Ertl, "Computing extremely accurate quantiles
 * using t-digests", arXiv:1902.04023) — the quantile sketch behind the
 * drift checks (north rule: "distribution-drift checks via two-sample
 * KS/chi-square over t-digest quantile sketches").
 *
 * Spark ships HLL++ (`approx_count_distinct`) and KLL-ish
 * (`percentile_approx`) but no mergeable exported quantile sketch usable
 * for two-sample tests, so this is custom (SURVEY.md §4 item 1). The
 * implementation is from the published algorithm: buffer points, then
 * merge-compress sorted centroids under the k1 scale-function size bound.
 *
 * Mutable, NOT thread-safe — each Spark aggregation buffer owns one.
 */
final class TDigest(val compression: Double = 100.0) extends Serializable {
  // parallel arrays of centroid means/weights, kept sorted by mean
  private var means: Array[Double] = new Array[Double](0)
  private var weights: Array[Double] = new Array[Double](0)
  private var bufMeans: Array[Double] = new Array[Double](512)
  private var bufWeights: Array[Double] = new Array[Double](512)
  private var bufUsed: Int = 0
  private var _totalWeight: Double = 0.0
  private var _min: Double = Double.PositiveInfinity
  private var _max: Double = Double.NegativeInfinity

  def totalWeight: Double = _totalWeight
  def min: Double = _min
  def max: Double = _max
  def centroidCount: Int = { flushBuffer(); means.length }

  def add(x: Double, w: Double = 1.0): Unit = {
    if (x.isNaN) return
    if (bufUsed == bufMeans.length) flushBuffer()
    bufMeans(bufUsed) = x
    bufWeights(bufUsed) = w
    bufUsed += 1
    _totalWeight += w
    if (x < _min) _min = x
    if (x > _max) _max = x
  }

  def merge(other: TDigest): Unit = {
    other.flushBuffer()
    var i = 0
    while (i < other.means.length) {
      if (bufUsed == bufMeans.length) flushBuffer()
      bufMeans(bufUsed) = other.means(i)
      bufWeights(bufUsed) = other.weights(i)
      bufUsed += 1
      i += 1
    }
    _totalWeight += other._totalWeight
    if (other._min < _min) _min = other._min
    if (other._max > _max) _max = other._max
  }

  /** k1 scale function bound: max cluster weight at quantile q. */
  private def sizeBound(q: Double): Double = {
    val qq = math.max(1e-12, math.min(1 - 1e-12, q))
    4.0 * _totalWeight * qq * (1 - qq) / compression
  }

  private def flushBuffer(): Unit = {
    if (bufUsed == 0) return
    val n = means.length + bufUsed
    val ms = new Array[Double](n)
    val ws = new Array[Double](n)
    System.arraycopy(means, 0, ms, 0, means.length)
    System.arraycopy(weights, 0, ws, 0, means.length)
    System.arraycopy(bufMeans, 0, ms, means.length, bufUsed)
    System.arraycopy(bufWeights, 0, ws, means.length, bufUsed)
    bufUsed = 0
    // sort points by mean (insertion of pairs via index sort)
    val idx = Array.range(0, n).sortBy(ms(_))
    val sm = idx.map(ms(_)); val sw = idx.map(ws(_))
    // greedy merge under the scale-function bound
    val omScratch = new Array[Double](n)
    val owScratch = new Array[Double](n)
    var out = 0
    var i = 0
    var soFar = 0.0
    while (i < n) {
      var cm = sm(i); var cw = sw(i)
      var j = i + 1
      var continue = true
      while (j < n && continue) {
        val q = (soFar + cw / 2.0) / math.max(_totalWeight, 1e-12)
        if (cw + sw(j) <= sizeBound(q)) {
          val nw = cw + sw(j)
          cm = cm + (sm(j) - cm) * sw(j) / nw
          cw = nw
          j += 1
        } else continue = false
      }
      omScratch(out) = cm; owScratch(out) = cw; out += 1
      soFar += cw
      i = j
    }
    means = java.util.Arrays.copyOf(omScratch, out)
    weights = java.util.Arrays.copyOf(owScratch, out)
  }

  /** Empirical CDF at x (centroid linear interpolation). */
  def cdf(x: Double): Double = {
    flushBuffer()
    if (_totalWeight == 0) return Double.NaN
    if (x < _min) return 0.0
    if (x >= _max) return 1.0
    val n = means.length
    if (n == 1) return if (x < means(0)) 0.0 else 1.0
    var cum = 0.0
    var i = 0
    while (i < n) {
      val m = means(i); val w = weights(i)
      if (x < m) {
        // interpolate between the previous centroid boundary and this centroid
        val leftM = if (i == 0) _min else means(i - 1)
        val leftCum = cum       // weight strictly left of this centroid's mass midpoint
        val rightCum = cum + w / 2.0
        val frac = if (m == leftM) 1.0 else (x - leftM) / (m - leftM)
        return math.max(0.0, math.min(1.0, (leftCum + frac * (rightCum - leftCum)) / _totalWeight))
      }
      cum += w
      i += 1
    }
    1.0
  }

  /** Quantile at q in [0,1]. */
  def quantile(q: Double): Double = {
    flushBuffer()
    if (_totalWeight == 0) return Double.NaN
    if (q <= 0) return _min
    if (q >= 1) return _max
    val target = q * _totalWeight
    val n = means.length
    var cum = 0.0
    var i = 0
    while (i < n) {
      val w = weights(i)
      if (target < cum + w) {
        val frac = (target - cum) / w
        val left = if (i == 0) _min else (means(i - 1) + means(i)) / 2.0
        val right = if (i == n - 1) _max else (means(i) + means(i + 1)) / 2.0
        return left + frac * (right - left)
      }
      cum += w
      i += 1
    }
    _max
  }

  /** Compact serialization: [compression, totalWeight, min, max, n, means.., weights..]. */
  def serialize(): Array[Byte] = {
    flushBuffer()
    val n = means.length
    val bb = ByteBuffer.allocate(8 * 4 + 4 + 16 * n)
    bb.putDouble(compression); bb.putDouble(_totalWeight)
    bb.putDouble(_min); bb.putDouble(_max)
    bb.putInt(n)
    var i = 0
    while (i < n) { bb.putDouble(means(i)); bb.putDouble(weights(i)); i += 1 }
    bb.array()
  }
}

object TDigest {
  def deserialize(bytes: Array[Byte]): TDigest = {
    val bb = ByteBuffer.wrap(bytes)
    val d = new TDigest(bb.getDouble)
    d._totalWeight = bb.getDouble
    d._min = bb.getDouble
    d._max = bb.getDouble
    val n = bb.getInt
    d.means = new Array[Double](n)
    d.weights = new Array[Double](n)
    var i = 0
    while (i < n) { d.means(i) = bb.getDouble; d.weights(i) = bb.getDouble; i += 1 }
    d
  }

  def fromValues(xs: Iterable[Double], compression: Double = 100.0): TDigest = {
    val d = new TDigest(compression)
    xs.foreach(d.add(_))
    d
  }
}
