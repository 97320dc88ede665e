package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column profiling — the ANALYZE-style statistics pass every engine
  * runs before planning and every pipeline runs before trusting a new
  * drop: per-column row/null/distinct counts and min/max. ONE scan and
  * ONE tiny shuffle for ALL columns: rows melt into (column, value)
  * pairs via a single generator projection and aggregate by column
  * name (as many groups as columns) — never one scan per column, which
  * at 100 TB turns a profile into #columns full passes.
  *
  * Values travel in TWO lanes — a numeric lane (exact long min/max,
  * not lexicographic: the string form would order "100" < "99") and a
  * string lane — unified to the string form only in the final
  * projection. Profiled columns must be long-castable or string-typed;
  * fractional doubles are the caller's to quantize first (their
  * cross-engine STRING form is a formatting convention this operator
  * refuses to depend on). */
object Profile {

  /** `(column_name, n_rows, n_null, n_distinct, min_val, max_val)` for
    * each named column; `numeric` columns ride the exact integer lane.
    * NULLs count in n_rows, not in n_distinct/min/max. */
  def columnStats(df: DataFrame, numeric: Seq[String],
                  strings: Seq[String]): DataFrame = {
    require((numeric ++ strings).nonEmpty, "columnStats: no columns")
    require(numeric.intersect(strings).isEmpty,
      s"columnStats: overlapping column lists")
    val stackArgs: Seq[Column] =
      numeric.flatMap(c => Seq(lit(c), col(c).cast("long"),
        lit(null).cast("string"))) ++
        strings.flatMap(c => Seq(lit(c), lit(null).cast("long"),
          col(c).cast("string")))
    val n = numeric.length + strings.length
    df.select(stack((lit(n) +: stackArgs): _*)
        .as(Seq("column_name", "vnum", "vstr")))
      .groupBy(col("column_name"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("vnum").isNull && col("vstr").isNull, 1L)
          .otherwise(0L)).as("n_null"),
        countDistinct(coalesce(col("vstr"), col("vnum").cast("string")))
          .as("n_distinct"),
        coalesce(min(col("vnum")).cast("string"), min(col("vstr")))
          .as("min_val"),
        coalesce(max(col("vnum")).cast("string"), max(col("vstr")))
          .as("max_val"))
  }
}
