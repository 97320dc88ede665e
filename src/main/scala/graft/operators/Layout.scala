package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-layout operators for write-side optimization of 100 TB lakes.
  *
  * Multi-dimensional range queries (the melody engine's cell scans, the
  * event operators' time-key lookups) can only skip parquet row groups
  * if rows that are close in EVERY filter dimension land in the SAME
  * files. A linear sort clusters one dimension and scatters the rest;
  * a Z-order (Morton) key bit-interleaves the dimensions so each
  * 2^(d*b)-aligned key range is a d-dimensional grid block — min/max
  * row-group statistics then prune on ALL interleaved columns at once.
  *
  * The key is pure integer bit arithmetic (shifts, masks, adds of
  * disjoint bits) over the low `bits` bits of integer columns — exact,
  * codegen'd, engine-independent (no FP quantization boundary), so the
  * key column itself carries a plain SQL oracle.
  */
object Layout {

  /** Bucketed co-located join — the OTHER physical-layout lever next
    * to Z-ordering: write both sides `bucketBy` the join key (same
    * bucket count, sorted within buckets), and the read-back join is
    * EXCHANGE-FREE — at 100 TB this converts every recurring join on
    * the layout key from a full two-sided shuffle into a local merge
    * per bucket, which is the difference between a nightly job and an
    * interactive one for fact-dim pipelines that join the same keys
    * daily. Writes go through `saveAsTable` (bucket metadata lives in
    * the catalog — Spark's bucketing contract), under the caller's
    * path. DROP TABLE on an EXTERNAL table (explicit path option)
    * removes only the catalog entry, never the parquet files — so a
    * repeated run must also clear the directory itself, or the new
    * write lands NEXT to the old files and read-back silently doubles
    * rows. Both are done here: catalog drop + physical delete of
    * `basePath/name` before each write.
    *
    * Returns the two read-back frames; the join itself is the
    * caller's (any equi-join on the bucket key co-locates). */
  def writeBucketed(spark: SparkSession, left: DataFrame, right: DataFrame,
                    leftKey: String, rightKey: String, buckets: Int,
                    basePath: String, leftName: String,
                    rightName: String): (DataFrame, DataFrame) = {
    require(buckets >= 1, s"writeBucketed: buckets must be >= 1")
    def write(df: DataFrame, key: String, name: String): DataFrame = {
      spark.sql(s"DROP TABLE IF EXISTS $name")
      val dir = new org.apache.hadoop.fs.Path(s"$basePath/$name")
      val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(dir)) fs.delete(dir, true)
      df.write.format("parquet")
        .bucketBy(buckets, key).sortBy(key)
        .option("path", s"$basePath/$name")
        .saveAsTable(name)
      spark.table(name)
    }
    (write(left, leftKey, leftName), write(right, rightKey, rightName))
  }

  /** Morton interleave of the low `bits` bits of each (integer) column:
    * bit b of column i lands at position b * d + i. Columns are taken
    * LITTLE-endian-first: cols(0) owns the least-significant interleaved
    * bit, matching the classic Z-curve orientation. Total width
    * bits * d must fit a BIGINT. */
  def zOrderKey(cols: Seq[Column], bits: Int): Column = {
    val d = cols.length
    require(d >= 2, s"zOrderKey: need >= 2 dims, got $d")
    require(bits >= 1 && bits * d <= 63, s"zOrderKey: bits=$bits * dims=$d exceeds BIGINT")
    val terms = for {
      (c, i) <- cols.zipWithIndex
      b <- 0 until bits
    } yield shiftleft(shiftright(c.cast("long"), b).bitwiseAND(lit(1L)), b * d + i)
    // all terms occupy disjoint bit positions, so + == bitwise OR
    terms.reduce(_ + _)
  }

  /** Range-partition + locally sort by the Z-key: each output file holds
    * one contiguous Z-range = one d-dimensional block of the key grid,
    * giving parquet min/max pruning on every interleaved dimension. The
    * shuffle is ONE range exchange (AQE-sized sampling), the same cost
    * as any global sort — paid once at write time, repaid on every
    * multi-dimensional scan. */
  def zOrderLayout(df: DataFrame, dims: Seq[Column], bits: Int,
                   partitions: Int = 0): DataFrame = {
    val keyed = df.withColumn("zval", zOrderKey(dims, bits))
    val ranged =
      if (partitions > 0) keyed.repartitionByRange(partitions, col("zval"))
      else keyed.repartitionByRange(col("zval"))
    ranged.sortWithinPartitions(col("zval"))
  }
}
