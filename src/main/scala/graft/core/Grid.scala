package graft.core

/** Relative position of a record to a grid cell in the sheared Hough plane. */
sealed trait Direction
object Direction {
  case object Inner extends Direction
  case object Northern extends Direction
  case object Southern extends Direction
  case object Eastern extends Direction
  case object Western extends Direction
  case object Northeastern extends Direction
  case object Northwestern extends Direction
  case object Southeastern extends Direction
  case object Southwestern extends Direction
}

/** Sheared (parallelogram) grid over the Hough plane of fitted normals.
  *
  * Each record's 1-D projection is fitted as N(mu, sigma) and mapped to the
  * point (m, b) = (1/sigma, -mu/sigma). The plane is partitioned by two
  * line families with slopes (-tMax, -tMin) (t = centered projected-bin
  * range), forming a sideNum x sideNum parallelogram grid; a cell id packs
  * the two intercept counts. Cell boundaries come from cumulative intercept
  * arrays — equal-width for the uniform grid, percentile-based for the
  * quantile grid (both are the same mechanism here).
  *
  * The point of this construction: a point dominating another in this plane
  * has a normal CDF everywhere above/below the other's, which turns
  * record-vs-cell EMD lower bounds (EMD_BR) into closed-form CDF-area
  * differences between the record's normal and the cell's corner normals.
  *
  * Reference behavior: utils/Grid.java:36-58 (construction), :536-583
  * (direction), :771-877 (bounds/corners), :884-1096 (EMD_BR),
  * utils/QuantileGrid.java:33-69 (percentile intercepts).
  *
  * @param domain (mMin, mMax, bMin, bMax) of the Hough points
  * @param slopes (slopeSW, slopeSE) = (-tMax, -tMin)
  * @param sideNum cells per side
  * @param interceptsSW cumulative boundary offsets along the SW edge,
  *   length sideNum+1 (ascending, [0]=start edge, [sideNum]=far edge)
  * @param interceptsSE same along the SE edge
  */
final class SkewedGrid(
    val domain: Array[Double],
    val slopes: Array[Double],
    val sideNum: Int,
    val interceptsSW: Array[Double],
    val interceptsSE: Array[Double]) extends Serializable {

  val t: Array[Double] = Array(-slopes(1), -slopes(0)) // (tMin, tMax)

  // line = (slope, pointX, pointY)
  private val lineSW = Array(slopes(0), domain(0), domain(2))
  private val lineSE = Array(slopes(1), domain(1), domain(2))
  private val lineNE = Array(slopes(0), domain(1), domain(3))
  private val lineNW = Array(slopes(1), domain(0), domain(3))
  val pointSouthern: Array[Double] = intersection(lineSW, lineSE)
  val pointEastern: Array[Double] = intersection(lineSE, lineNE)
  val pointNorthern: Array[Double] = intersection(lineNE, lineNW)
  val pointWestern: Array[Double] = intersection(lineSW, lineNW)

  private def line(point: Array[Double], slope: Double): Array[Double] =
    Array(slope, point(0), point(1))

  private def intersection(a: Array[Double], b: Array[Double]): Array[Double] = {
    if (a(0) == b(0)) return null
    val x = (b(2) - a(2) + a(0) * a(1) - b(0) * b(1)) / (a(0) - b(0))
    Array(x, b(0) * (x - b(1)) + b(2))
  }

  private def dist(a: Array[Double], b: Array[Double]): Double =
    math.hypot(a(0) - b(0), a(1) - b(1))

  private def getX(len: Double, slope: Double): Double =
    len / math.sqrt(1 + slope * slope)

  private def getY(len: Double, slope: Double): Double =
    getX(len, slope) * math.abs(slope)

  /** Distances from the southern corner to the projections of `point` onto
    * the SW and SE boundary lines (projecting along the opposite family).
    * Reference behavior: Grid.getProjectionDistanceInGrid:678-705. */
  def projectionDistances(point: Array[Double]): (Double, Double) = {
    val projSW = intersection(line(point, slopes(1)), lineSW)
    val projSE = intersection(line(point, slopes(0)), lineSE)
    (dist(projSW, pointSouthern), dist(projSE, pointSouthern))
  }

  private def countOffset(offset: Double, intercepts: Array[Double]): Int = {
    var idx = java.util.Arrays.binarySearch(intercepts, offset)
    if (idx < 0) idx = -(idx + 1) - 1
    if (idx < 0) idx = 0
    idx
  }

  def countSW(point: Array[Double]): Int =
    countOffset(projectionDistances(point)._1, interceptsSW)

  def countSE(point: Array[Double]): Int =
    countOffset(projectionDistances(point)._2, interceptsSE)

  /** Cell id of a Hough point: countSE * sideNum + countSW, clamped.
    * Reference behavior: Grid.getGridId:42-58. */
  def gridId(point: Array[Double]): Int = {
    var sw = countSW(point)
    var se = countSE(point)
    if (sw >= sideNum) sw = sideNum - 1
    if (se >= sideNum) se = sideNum - 1
    se * sideNum + sw
  }

  /** Position of a record relative to a cell (by intercept-count deltas).
    * Reference behavior: Grid.locateRecordToGrid:545-583. */
  def locate(point: Array[Double], gridId: Int): Direction = {
    val cellSW = gridId % sideNum
    val cellSE = gridId / sideNum
    val sw = countSW(point) - cellSW
    val se = countSE(point) - cellSE
    var dir: Direction =
      if (sw > 0 && se > 0) Direction.Northern
      else if (sw > 0 && se == 0) Direction.Northwestern
      else if (sw > 0 && se < 0) Direction.Western
      else if (sw == 0 && se > 0) Direction.Northeastern
      else if (sw == 0 && se < 0) Direction.Southwestern
      else if (sw < 0 && se > 0) Direction.Eastern
      else if (sw < 0 && se == 0) Direction.Southeastern
      else if (sw < 0 && se < 0) Direction.Southern
      else Direction.Inner
    val eps = 1e-6
    if ((math.abs(point(0) - domain(0)) <= eps && math.abs(point(1) - domain(2)) <= eps) ||
        (math.abs(point(0) - domain(1)) <= eps && math.abs(point(1) - domain(3)) <= eps))
      dir = Direction.Inner
    dir
  }

  /** Direction from precomputed record intercept counts (countSW/countSE
    * evaluated ONCE per record, not per candidate cell) — same result as
    * locate(). isCorner = record coincides with a domain corner (the
    * reference's special case forcing Inner). */
  def locateByCounts(recSW: Int, recSE: Int, isCorner: Boolean, gridId: Int): Direction = {
    if (isCorner) return Direction.Inner
    val sw = recSW - gridId % sideNum
    val se = recSE - gridId / sideNum
    if (sw > 0 && se > 0) Direction.Northern
    else if (sw > 0 && se == 0) Direction.Northwestern
    else if (sw > 0 && se < 0) Direction.Western
    else if (sw == 0 && se > 0) Direction.Northeastern
    else if (sw == 0 && se < 0) Direction.Southwestern
    else if (sw < 0 && se > 0) Direction.Eastern
    else if (sw < 0 && se == 0) Direction.Southeastern
    else if (sw < 0 && se < 0) Direction.Southern
    else Direction.Inner
  }

  /** Record-is-domain-corner test (reference: Grid.locateRecordToGrid
    * epsilon special case). */
  def isDomainCorner(point: Array[Double]): Boolean = {
    val eps = 1e-6
    (math.abs(point(0) - domain(0)) <= eps && math.abs(point(1) - domain(2)) <= eps) ||
      (math.abs(point(0) - domain(1)) <= eps && math.abs(point(1) - domain(3)) <= eps)
  }

  /** All cell corner bounds, memoized (sideNum^2 entries — candidate
    * enumeration hits these hundreds of millions of times). */
  lazy val cellBounds: Array[Array[Double]] =
    Array.tabulate(sideNum * sideNum)(cellBound)

  /** Lower and upper corner points of a cell: (loX, loY, hiX, hiY).
    * Reference behavior: Grid.getGrid:844-877 + QuantileGrid:57-69. */
  def cellBound(gridId: Int): Array[Double] = {
    val sw = gridId % sideNum
    val se = gridId / sideNum
    val lower = cornerByCount(sw, se)
    val upper = cornerByCount(sw + 1, se + 1)
    Array(lower(0), lower(1), upper(0), upper(1))
  }

  private def cornerByCount(cSW: Int, cSE: Int): Array[Double] = {
    val pSW = Array(
      pointSouthern(0) - getX(interceptsSW(cSW), slopes(0)),
      pointSouthern(1) + getY(interceptsSW(cSW), slopes(0)))
    val pSE = Array(
      pointSouthern(0) + getX(interceptsSE(cSE), slopes(1)),
      pointSouthern(1) + getY(interceptsSE(cSE), slopes(1)))
    intersection(line(pSW, slopes(1)), line(pSE, slopes(0)))
  }

  // ---- EMD_BR: record-to-cell lower bound ------------------------------

  /** (mu, sigma) of the normal encoded by a Hough point: sigma = 1/m,
    * mu = -b/m. Reference behavior: Grid.getNormal:1029-1038. */
  private def pointNormal(p: Array[Double]): (Double, Double) =
    (p(1) * (1.0 / p(0)) * -1.0, 1.0 / p(0))

  /** |CDF area difference| of two normals over [start, end], sigma floored.
    * Reference behavior: HistUtil.getCDFDifferenceBetweenNormals:41-67. */
  private def cdfDiff(a: (Double, Double), b: (Double, Double),
                      start: Double, end: Double): Double = {
    val sa = if (math.abs(a._2) == 0) 1e-8 else a._2
    val sb = if (math.abs(b._2) == 0) 1e-8 else b._2
    math.abs(NormalModel.normalCdfArea(a._1, sa, start, end) -
      NormalModel.normalCdfArea(b._1, sb, start, end))
  }

  /** Area between two normal CDFs over the projection domain [t0, t1],
    * split at their crossing when it lies inside.
    * Reference behavior: Grid.getEmdBrNormal:1011-1034. */
  private def emdBrNormal(rec: (Double, Double), cell: (Double, Double)): Double = {
    val inter = NormalModel.cdfIntersection(rec._1, rec._2, cell._1, cell._2)
    val tMin = t(0); val tMax = t(1)
    if (tMin - inter > 0 || inter - tMax > 0 ||
        math.abs(tMin - inter) <= 1e-7 || math.abs(inter - tMax) <= 1e-7)
      cdfDiff(rec, cell, tMin, tMax)
    else
      cdfDiff(rec, cell, tMin, inter) + cdfDiff(rec, cell, inter, tMax)
  }

  /** Error-envelope correction for EMD_BR. Record errors are
    * [min,max]*I + full (length 2I+1); cell errors are [min,max]*I +
    * minFull + maxFull (length 2I+2).
    * Reference behavior: Grid.getEmdBrError:1040-1096. */
  private def emdBrError(dominated: (Double, Double), dominatedErr: Array[Double],
                         dominator: (Double, Double), dominatorErr: Array[Double],
                         numInterval: Int, partial: Boolean): Double = {
    if (!partial) {
      val inter = NormalModel.cdfIntersection(dominated._1, dominated._2,
        dominator._1, dominator._2)
      if (inter <= t(0) || inter >= t(1))
        -dominatorErr(dominatorErr.length - 1) + dominatedErr(2 * numInterval)
      else {
        var ii = math.floor((inter - t(0)) / ((t(1) - t(0)) / numInterval)).toInt
        if (ii < 0) ii = 0
        if (ii >= numInterval) ii = numInterval - 1
        -dominatorErr(ii * 2 + 1) + dominatedErr(2 * ii)
      }
    } else {
      var maxErr = -Double.MaxValue
      var minErr = Double.MaxValue
      var i = 0
      while (i < numInterval) {
        if (dominatorErr(2 * i + 1) > maxErr) maxErr = dominatorErr(2 * i + 1)
        if (dominatedErr(2 * i) < minErr) minErr = dominatedErr(2 * i)
        i += 1
      }
      -maxErr + minErr
    }
  }

  /** EMD_BR: lower bound on the 1-D (projected) EMD between a record and
    * ANY record inside a grid cell, by dominance case analysis on the
    * record's position relative to the cell.
    *
    * @param record (m, b) Hough point of the record on this vector
    * @param recordErr record's error envelope, length 2I+1 (envelope+full)
    * @param gridId the candidate cell on this vector's grid
    * @param gridErr cell's aggregated envelope, length 2I+2
    * Reference behavior: Grid.getEmdBr:884-1009. */
  def emdBr(record: Array[Double], recordErr: Array[Double], gridId: Int,
            gridErr: Array[Double], numInterval: Int): Double = {
    val bound = cellBound(gridId)
    emdBrWithBound(record, recordErr, bound, gridErr, locate(record, gridId), numInterval)
  }

  def emdBrWithBound(record: Array[Double], recordErr: Array[Double],
                     gridBound: Array[Double], gridErr: Array[Double],
                     direction: Direction, numInterval: Int): Double = {
    val recN = (record(1) * (1.0 / record(0)) * -1.0, 1.0 / record(0))
    val lower = Array(gridBound(0), gridBound(1))
    val upper = Array(gridBound(2), gridBound(3))
    val upperN = pointNormal(upper)
    val lowerN = pointNormal(lower)
    if (upperN._2 < 0 || lowerN._2 < 0 || recN._2 < 0) return 0.0

    val cellLineNE = line(upper, slopes(0))
    val cellLineNW = line(upper, slopes(1))
    val cellLineSE = line(lower, slopes(1))
    val cellLineSW = line(lower, slopes(0))

    var dist = 0.0
    var isN: (Double, Double) = (0.0, 1.0)
    direction match {
      case Direction.Northern =>
        dist = emdBrNormal(recN, upperN) +
          emdBrError(recN, recordErr, upperN, gridErr, numInterval, partial = false)
        return math.max(dist, 0.0)
      case Direction.Southern =>
        dist = emdBrNormal(recN, lowerN) +
          emdBrError(lowerN, gridErr, recN, recordErr, numInterval, partial = false)
        return math.max(dist, 0.0)
      case Direction.Northeastern =>
        isN = pointNormal(intersection(line(record, slopes(1)), cellLineNE))
      case Direction.Northwestern =>
        isN = pointNormal(intersection(line(record, slopes(0)), cellLineNW))
      case Direction.Southeastern =>
        isN = pointNormal(intersection(line(record, slopes(0)), cellLineSE))
      case Direction.Southwestern =>
        isN = pointNormal(intersection(line(record, slopes(1)), cellLineSW))
      case Direction.Eastern =>
        isN = pointNormal(intersection(cellLineNE, cellLineSE))
      case Direction.Western =>
        isN = pointNormal(intersection(cellLineNW, cellLineSW))
      case Direction.Inner =>
        return 0.0
    }
    if (isN._2 < 0) return 0.0

    direction match {
      case Direction.Northeastern | Direction.Northwestern =>
        dist = 0.5 * (emdBrNormal(upperN, recN) + emdBrNormal(isN, recN) -
          emdBrNormal(isN, upperN))
        dist += emdBrError(recN, recordErr, upperN, gridErr, numInterval, partial = true)
      case Direction.Southeastern | Direction.Southwestern =>
        dist = 0.5 * (emdBrNormal(lowerN, recN) + emdBrNormal(isN, recN) -
          emdBrNormal(isN, lowerN))
        dist += emdBrError(lowerN, gridErr, recN, recordErr, numInterval, partial = true)
      case Direction.Eastern | Direction.Western =>
        val viaLower = 0.5 * (emdBrNormal(lowerN, recN) + emdBrNormal(isN, recN) -
          emdBrNormal(isN, lowerN)) +
          emdBrError(lowerN, gridErr, recN, recordErr, numInterval, partial = true)
        val viaUpper = 0.5 * (emdBrNormal(upperN, recN) + emdBrNormal(isN, recN) -
          emdBrNormal(isN, upperN)) +
          emdBrError(recN, recordErr, upperN, gridErr, numInterval, partial = true)
        dist = math.min(viaLower, viaUpper)
      case _ => ()
    }
    math.max(dist, 0.0)
  }
}

object SkewedGrid {
  /** Uniform grid: equal-width cumulative intercepts.
    * Reference behavior: Grid.initializeGrid:707-740. */
  def uniform(domain: Array[Double], slopes: Array[Double], sideNum: Int): SkewedGrid = {
    val tmp = new SkewedGrid(domain, slopes, sideNum,
      Array.tabulate(sideNum + 1)(_.toDouble),
      Array.tabulate(sideNum + 1)(_.toDouble))
    val dSW = tmp.pointWestern // distance S->W along SW edge
    val dSE = tmp.pointEastern
    val lenSW = math.hypot(dSW(0) - tmp.pointSouthern(0), dSW(1) - tmp.pointSouthern(1))
    val lenSE = math.hypot(dSE(0) - tmp.pointSouthern(0), dSE(1) - tmp.pointSouthern(1))
    new SkewedGrid(domain, slopes, sideNum,
      Array.tabulate(sideNum + 1)(i => lenSW * i / sideNum),
      Array.tabulate(sideNum + 1)(i => lenSE * i / sideNum))
  }

  /** Quantile grid from percentile boundaries of the SW/SE projection
    * distances. Reference behavior: QuantileGrid + QNEPreReducer:152-189. */
  def quantile(domain: Array[Double], slopes: Array[Double], sideNum: Int,
               swBounds: Array[Double], seBounds: Array[Double]): SkewedGrid =
    new SkewedGrid(domain, slopes, sideNum, swBounds, seBounds)
}
