package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** EMD-family distances as pure Catalyst column expressions (zip_with /
  * aggregate higher-order functions) — fully whole-stage-codegen'd, no
  * UDFs, usable in SQL and checkable against a DuckDB oracle.
  *
  * Reference behavior: utils/DistanceUtil.java:40-48 (1-D EMD),
  * :184-230 (Rubner centroid distance).
  */
object EmdCols {

  /** Sum of array elements. */
  def arraySum(a: Column): Column =
    aggregate(a, lit(0.0), (acc, x) => acc + x)

  /** L1-normalize an array column to sum 1. The sum binds once through a
    * 1-element transform — inlined into the per-element lambda it would
    * be re-aggregated per element (no subexpression elimination inside
    * higher-order-function lambdas). */
  def l1Normalize(a: Column): Column =
    flatten(transform(array(arraySum(a)), s => transform(a, x => x / s)))

  /** 1-D EMD over unit-spaced bins: sum_i |cumsum(a - b)_i|.
    * Both inputs must be same-length weight arrays with equal total mass.
    * Runs as one fold carrying (running, total) — codegen-friendly. */
  def emd1d(a: Column, b: Column): Column = {
    val diffs = zip_with(a, b, (x, y) => x - y)
    aggregate(
      diffs,
      struct(lit(0.0).as("run"), lit(0.0).as("tot")),
      (acc, x) => {
        val run = acc.getField("run") + x
        struct(run.as("run"), (acc.getField("tot") + abs(run)).as("tot"))
      },
      acc => acc.getField("tot"))
  }

  /** Weighted mean of unit-spaced bins 0..n-1 — the 1-D Rubner value
    * (centroid) of a normalized histogram. */
  def histMean(w: Column): Column =
    aggregate(
      zip_with(w, sequence(lit(0), size(w) - 1), (x, i) => x * i.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  /** Weighted second moment sum(w * i^2) of unit-spaced bins. */
  def histMoment2(w: Column): Column =
    aggregate(
      zip_with(w, sequence(lit(0), size(w) - 1),
        (x, i) => x * i.cast("double") * i.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  /** 1-D Rubner lower bound: |mean(a) - mean(b)|. Always <= emd1d(a, b). */
  def rubner1d(a: Column, b: Column): Column =
    abs(histMean(a) - histMean(b))

  /** Dot product of two double arrays. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** L2 norm of a double array. */
  def l2Norm(a: Column): Column =
    sqrt(aggregate(zip_with(a, a, (x, y) => x * y), lit(0.0), (acc, x) => acc + x))

  /** Cosine similarity between two double arrays. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Euclidean distance between two double arrays. */
  def euclidean(a: Column, b: Column): Column =
    sqrt(aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x))
}
