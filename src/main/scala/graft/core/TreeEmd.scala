package graft.core

/** Hierarchical-grid tree-EMD bound over an arbitrary bin point set
  * (Indyk & Thaper, "Fast image retrieval via embeddings", ICCV workshop
  * 2003; FlowTree, Backurs et al., ICML 2020) — the allocation-light,
  * LP-free embedding stage of the exact cascade.
  *
  * Construction: nested grids over the bins' bounding cube, side halving
  * per level; the edge weight from a level-l node to its parent is
  * S * sqrt(d) / 2^l (half the parent cell's diameter), which makes the
  * leaf-to-leaf tree distance dominate the L2 ground distance — so the
  * closed-form transport cost under the tree metric,
  *
  *   EMD_T(a, b) = sum over (level, node) of weight_l * |massA - massB|,
  *
  * is an UPPER bound of exact L2 EMD, and EMD_T / distortion (the
  * max leaf-pair ratio treeDist/groundDist, computed exactly over the
  * finite bin set at build time, not the worst-case O(levels * sqrt d))
  * is a LOWER bound. Both constants are certified numerically in
  * [[TreeEmd.build]]; an uncertifiable decomposition returns None and the
  * cascade simply skips the stage.
  *
  * Reference counterpart: none — the reference's cascade
  * (mr/normal/NEProcessReducer.java:204-264) goes straight from linear
  * bounds to the LP; the tree stage is the published corpus-scale path the
  * rebuild adds on top.
  */
final class TreeEmd private[core] (
    levelAssign: Array[Array[Int]], // per level: bin index -> dense node id
    levelNodes: Array[Int],         // node count per level
    levelWeight: Array[Double],     // edge weight to parent per level
    /** max over distinct-position bin pairs of treeDist / groundDist,
      * widened by 1e-9 relative so FP evaluation stays a sound rejector. */
    val distortion: Double) extends Serializable {

  /** Total embedding width (nodes across all levels). */
  val numFeatures: Int = levelNodes.sum

  /** The embedding itself: level-major concatenation of
    * edgeWeight * nodeMass — so dist(a, b) == L1(features(a), features(b)),
    * and per-feature interval envelopes over a record population give a
    * valid cell-level lower bound (see MelodyJoin.guestCombos). */
  def features(w: Array[Double]): Array[Double] = {
    val out = new Array[Double](numFeatures)
    var off = 0
    var l = 0
    while (l < levelAssign.length) {
      val assign = levelAssign(l)
      var i = 0
      while (i < assign.length) { out(off + assign(i)) += levelWeight(l) * w(i); i += 1 }
      off += levelNodes(l)
      l += 1
    }
    out
  }

  /** EMD_T(a, b): weighted-L1 over the node-mass embedding. O(levels * n),
    * only level-sized scratch allocation. */
  def dist(wa: Array[Double], wb: Array[Double]): Double = {
    var total = 0.0
    var l = 0
    while (l < levelAssign.length) {
      val assign = levelAssign(l)
      val acc = new Array[Double](levelNodes(l))
      var i = 0
      while (i < assign.length) { acc(assign(i)) += wa(i) - wb(i); i += 1 }
      var s = 0.0
      var j = 0
      while (j < acc.length) { s += math.abs(acc(j)); j += 1 }
      total += levelWeight(l) * s
      l += 1
    }
    total
  }
}

object TreeEmd {

  /** Build the decomposition for `bins` (dimension-major flattened
    * positions) under the L2 ground distance. Returns None when soundness
    * cannot be certified: fewer than 2 bins, zero spatial extent, or
    * non-coincident bins still sharing a cell at `maxLevels`. */
  def build(bins: Array[Double], dimension: Int,
            maxLevels: Int = 30): Option[TreeEmd] = {
    val n = bins.length / dimension
    if (n < 2) return None
    def coord(i: Int, d: Int): Double = bins(i * dimension + d)
    val mins = Array.tabulate(dimension)(d => (0 until n).map(coord(_, d)).min)
    val extent = (0 until dimension)
      .map(d => (0 until n).map(coord(_, d)).max - mins(d)).max
    if (!(extent > 0)) return None // all bins coincide: no distances to bound
    val sqd = math.sqrt(dimension.toDouble)

    val assigns = scala.collection.mutable.ArrayBuffer[Array[Int]]()
    val nodeCounts = scala.collection.mutable.ArrayBuffer[Int]()
    val weights = scala.collection.mutable.ArrayBuffer[Double]()
    var level = 1
    var separated = false
    while (!separated && level <= maxLevels) {
      val cells = 1 << level // per dimension (capped implicitly by clamp)
      val side = extent / cells
      val keyOf = new scala.collection.mutable.HashMap[List[Int], Int]()
      val assign = new Array[Int](n)
      var i = 0
      while (i < n) {
        val key = (0 until dimension).map { d =>
          math.min(cells - 1,
            math.max(0, math.floor((coord(i, d) - mins(d)) / side).toInt))
        }.toList
        assign(i) = keyOf.getOrElseUpdate(key, keyOf.size)
        i += 1
      }
      assigns += assign
      nodeCounts += keyOf.size
      weights += extent * sqd / (1 << level)
      // separated once every shared cell holds only coincident positions
      separated = (0 until n).forall { a =>
        (0 until n).forall { b =>
          assign(a) != assign(b) ||
            (0 until dimension).forall(d => coord(a, d) == coord(b, d))
        }
      }
      level += 1
    }
    if (!separated) return None

    // certify: treeDist >= ground for every distinct-position pair, and
    // compute the exact distortion over this bin set
    val levelArr = assigns.toArray
    val wArr = weights.toArray
    // suffix sums of weights: pair separating first at level l has
    // treeDist = 2 * (w_l + w_{l+1} + ... + w_L)
    val suffix = new Array[Double](wArr.length + 1)
    var l = wArr.length - 1
    while (l >= 0) { suffix(l) = suffix(l + 1) + wArr(l); l -= 1 }
    var maxRatio = 0.0
    for (a <- 0 until n; b <- (a + 1) until n) {
      var sep = -1
      var li = 0
      while (sep < 0 && li < levelArr.length) {
        if (levelArr(li)(a) != levelArr(li)(b)) sep = li
        li += 1
      }
      if (sep >= 0) {
        var g2 = 0.0
        var d = 0
        while (d < dimension) {
          val t = coord(a, d) - coord(b, d); g2 += t * t; d += 1
        }
        val ground = math.sqrt(g2)
        val treeD = 2.0 * suffix(sep)
        if (ground > 0) {
          if (treeD < ground * (1 - 1e-12)) return None // unsound (shouldn't happen)
          val r = treeD / ground
          if (r > maxRatio) maxRatio = r
        }
      }
    }
    if (!(maxRatio > 0)) return None
    Some(new TreeEmd(levelArr, nodeCounts.toArray, wArr,
      maxRatio * (1 + 1e-9)))
  }
}
