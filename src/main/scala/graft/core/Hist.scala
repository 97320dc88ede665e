package graft.core

/** Core histogram model.
  *
  * A record is an id plus `numBins` non-negative weights; all records share
  * one global set of `numBins` d-dimensional bin locations (flattened
  * row-major) and a set of projection vectors. Weights are L1-normalized to
  * sum 1 before any distance computation.
  *
  * Reference behavior: /root/reference README.md:24-31,
  * utils/HistUtil.java:519-530 (normalize), utils/FormatUtil.java:46-49.
  */
final case class Hist(id: Long, weights: Array[Double]) {
  def normalized: Hist = Hist(id, HistOps.normalize(weights))
}

object HistOps {
  val Eps: Double = 1e-8

  def sum(w: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < w.length) { s += w(i); i += 1 }
    s
  }

  /** L1-normalize to sum 1 (no-op direction preserved; zero vector → uniform). */
  def normalize(w: Array[Double]): Array[Double] = {
    val s = sum(w)
    if (s == 0.0) Array.fill(w.length)(1.0 / w.length)
    else {
      val out = new Array[Double](w.length)
      var i = 0
      while (i < w.length) { out(i) = w(i) / s; i += 1 }
      out
    }
  }

  /** Project d-dim bin locations onto a vector → 1-D bin positions.
    * bins is numBins*d row-major; returns length numBins.
    * Reference behavior: utils/HistUtil.java:495-517. */
  def projectBins(bins: Array[Double], dimension: Int, vector: Array[Double]): Array[Double] = {
    val numBins = bins.length / dimension
    val out = new Array[Double](numBins)
    var i = 0
    while (i < numBins) {
      var s = 0.0; var j = 0
      while (j < dimension) { s += bins(i * dimension + j) * vector(j); j += 1 }
      out(i) = s
      i += 1
    }
    out
  }

  /** Center an array to zero mean. Reference: HistUtil.substractAvg:691-697. */
  def subtractAvg(a: Array[Double]): Array[Double] = {
    val avg = sum(a) / a.length
    a.map(_ - avg)
  }

  /** Normalize a vector to unit L2 length. Reference: HistUtil.unitArray:532-542. */
  def unitArray(a: Array[Double]): Array[Double] = {
    val n = math.sqrt(a.map(x => x * x).sum)
    if (n == 0.0) a else a.map(_ / n)
  }

  /** Fit N(mu, sigma) to a 1-D projected histogram by moment matching;
    * sigma^2 = sum(w*b^2) - mu^2, epsilon-floored.
    * Reference behavior: utils/HistUtil.java:280-304. */
  def fitNormal(weights: Array[Double], projectedBins: Array[Double]): (Double, Double) = {
    val w = normalize(weights)
    var mu = 0.0; var m2 = 0.0; var i = 0
    while (i < w.length) {
      mu += w(i) * projectedBins(i)
      m2 += w(i) * projectedBins(i) * projectedBins(i)
      i += 1
    }
    var varv = m2 - mu * mu
    if (varv < Eps) varv = Eps
    (mu, math.sqrt(varv))
  }

  /** Hough transform of a fitted normal: (m, b) = (1/sigma, -mu/sigma).
    * Reference behavior: mr/normal/NEPreMapper.java:106-111. */
  def hough(mu: Double, sigma: Double): (Double, Double) = (1.0 / sigma, -mu / sigma)

  /** Discrete CDF over (bin position -> cumulative weight), bins sorted
    * ascending with same-position weights merged.
    * Reference behavior: utils/HistUtil.java:214-248. */
  def discreteCdf(weights: Array[Double], bins: Array[Double]): Array[(Double, Double)] = {
    val m = scala.collection.mutable.TreeMap.empty[Double, Double]
    var i = 0
    while (i < bins.length) {
      m.update(bins(i), m.getOrElse(bins(i), 0.0) + weights(i))
      i += 1
    }
    var cum = 0.0
    m.toArray.map { case (b, w) => cum += w; (b, cum) }
  }

  /** Normalized discrete CDF (total mass 1). Reference: HistUtil.java:458-473. */
  def discreteCdfNormalized(weights: Array[Double], bins: Array[Double]): Array[(Double, Double)] =
    discreteCdf(normalize(weights), bins)

  /** Per-record centroid r_i = sum_j w_j * bins[j][i] ("Rubner value").
    * Reference behavior: utils/DistanceUtil.java:221-230. */
  def rubnerValue(weights: Array[Double], dimension: Int, bins: Array[Double]): Array[Double] = {
    val numBins = bins.length / dimension
    val out = new Array[Double](dimension)
    var i = 0
    while (i < dimension) {
      var s = 0.0; var j = 0
      while (j < numBins) { s += weights(j) * bins(j * dimension + i); j += 1 }
      out(i) = s
      i += 1
    }
    out
  }
}
