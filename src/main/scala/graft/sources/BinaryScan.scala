package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Local binary-file directory scan — the reference's image-acquisition
  * sliver without the network half.
  *
  * Reference behavior: mr/EmdGenerate.java:117-172 walks an input
  * directory of image files and feeds each payload to the
  * histogram-extraction mapper (the HTTP crawl variant,
  * mr/generate/CrawlReducer.java:96-201, throttles remote fetches into
  * the same shape; network acquisition stays out of scope — it cannot
  * be oracle-checked in a sandbox).
  *
  * Spark-first re-expression: `spark.read.format("binaryFile")` is the
  * built-in DataSource V2 for exactly this — one row per file with
  * (path, modificationTime, length, content), distributed listing,
  * partition-parallel reads, pathGlobFilter pushdown. At 100 TB the
  * identical plan points at an object-store prefix; no custom source
  * code is the point.
  *
  * Output: (doc_id BIGINT parsed from the file name, n_bytes, payload)
  * — the [[graft.operators.Multimodal]] payload contract, so every
  * existing decoder (PPM/JPEG/PNG/WAV) composes downstream unchanged. */
object BinaryScan {

  def scan(spark: SparkSession, dir: String,
           glob: String = "*.ppm"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      .select(
        regexp_extract(col("path"), "([0-9]+)\\.[A-Za-z0-9]+$", 1)
          .cast("long").as("doc_id"),
        col("length").as("n_bytes"),
        col("content").as("payload"))
}
