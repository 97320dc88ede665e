package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.HistOps
import graft.operators.{MelodyJoin, MrSimJoin, BaselineJoin}

/** Drop-in compatibility surface for users of the reference engine: the
  * same input file formats and configuration keys, executed on Spark.
  *
  * Input formats (reference README.md:24-31):
  *   - histogram file: one record per line, "<id> <w0> <w1> ... <w_{n-1}>"
  *   - bins file: ONE line of numBins * dimension doubles (row-major)
  *   - vectors file: ONE line of numVector * dimension doubles
  *
  * Configuration keys (reference melody-conf.properties):
  *   melody.join.type              distance | topk
  *   melody.join.distance.threshold
  *   melody.join.k
  *   melody.grid.cell.granularity
  *   melody.project.vector.number
  *   melody.normal.error.interval
  *   data.dimension, data.bin.number
  *   melody.framework               melody | mrsim | baseline (engine)
  *
  * Output: pairs DataFrame (rid, sid, dist); `runToText` writes the
  * reference's "rid sid dist" line format.
  */
object MelodyCompat {

  /** Parse reference-format histogram text into (id, weights). Malformed
    * lines are dropped (the reference crashes; dropping is kinder at scale
    * — count them via the metrics if needed). */
  def readHistogramText(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.textFile(path)
      .map(_.trim).filter(_.nonEmpty)
      .map { line =>
        val parts = line.split("\\s+")
        (parts(0).toLong, parts.drop(1).map(_.toDouble))
      }
      .toDF("id", "weights")
  }

  /** Read a one-line side file of whitespace-separated doubles
    * (bins / vectors — reference utils/FileUtil.java:148-157). */
  def readSideFile(spark: SparkSession, path: String): Array[Double] =
    spark.read.textFile(path).collect()
      .flatMap(_.trim.split("\\s+")).filter(_.nonEmpty).map(_.toDouble)

  final case class CompatConf(
      joinType: String,
      threshold: Double,
      k: Int,
      grid: Int,
      numVectors: Int,
      numIntervals: Int,
      dimension: Int,
      numBins: Int,
      framework: String,
      pivots: Int)

  def parseProperties(props: java.util.Properties): CompatConf = CompatConf(
    joinType = props.getProperty("melody.join.type", "distance"),
    threshold = props.getProperty("melody.join.distance.threshold", "0.05").toDouble,
    k = props.getProperty("melody.join.k", "20").toInt,
    grid = props.getProperty("melody.grid.cell.granularity", "4").toInt,
    numVectors = props.getProperty("melody.project.vector.number", "3").toInt,
    numIntervals = props.getProperty("melody.normal.error.interval", "5").toInt,
    dimension = props.getProperty("data.dimension", "3").toInt,
    numBins = props.getProperty("data.bin.number", "8").toInt,
    // the reference's engine selector is ConfUtils.METHOD =
    // "mr.method.name" (ConfUtils.java:28, as in the shipped
    // melody-conf.properties); "melody.framework" is kept as an alias for
    // earlier users of this compat surface
    framework = props.getProperty("mr.method.name",
      props.getProperty("melody.framework", "melody")),
    // ConfUtils.PIVOT = "mrsim.pivot.number" (ConfUtils.java:31); 0 =
    // absent -> this rebuild's auto-scaled pivot count
    pivots = props.getProperty("mrsim.pivot.number", "0").toInt)

  def engineConfig(cc: CompatConf, bins: Array[Double],
                   vectors: Array[Double]): MelodyJoin.Config = {
    val vecs = Array.tabulate(cc.numVectors)(i =>
      java.util.Arrays.copyOfRange(vectors, i * cc.dimension, (i + 1) * cc.dimension))
    MelodyJoin.Config(
      dimension = cc.dimension,
      bins = bins,
      vectors = vecs,
      sideNum = cc.grid,
      numIntervals = cc.numIntervals)
  }

  /** Execute the configured join over reference-format inputs. */
  def run(spark: SparkSession, histPath: String, binsPath: String,
          vectorsPath: String, props: java.util.Properties): DataFrame = {
    val cc = parseProperties(props)
    val hists = readHistogramText(spark, histPath)
    val bins = readSideFile(spark, binsPath)
    val vectors = readSideFile(spark, vectorsPath)
    require(bins.length == cc.numBins * cc.dimension,
      s"bins file has ${bins.length} values, expected ${cc.numBins * cc.dimension}")
    val cfg = engineConfig(cc, bins, vectors)
    // The reference dispatches BOTH join types on the framework key and
    // accepts four values (Join.java:42-131, melody-conf.properties:83-84);
    // bspmelody/bspb are the Hama BSP twins of melody/baseline — same
    // logical plans here (SURVEY §2.5), so they alias.
    (cc.joinType, cc.framework) match {
      case ("topk", "mrsim") =>
        MrSimJoin.topKJoin(spark, hists, cc.k, cfg, numPivots = cc.pivots)
      case ("topk", "baseline" | "bspb") => BaselineJoin.topKJoin(spark, hists, cc.k, cfg)
      case ("topk", _) => MelodyJoin.topKJoin(spark, hists, cc.k, cfg)
      case (_, "mrsim") =>
        MrSimJoin.thresholdJoin(spark, hists, cc.threshold, cfg, numPivots = cc.pivots)
      case (_, "baseline" | "bspb") => BaselineJoin.thresholdJoin(spark, hists, cc.threshold, cfg)
      case _ => MelodyJoin.thresholdJoin(spark, hists, cc.threshold, cfg) // melody | bspmelody
    }
  }

  /** Write pairs in the reference's output line format "rid sid dist". */
  def runToText(spark: SparkSession, histPath: String, binsPath: String,
                vectorsPath: String, props: java.util.Properties,
                outPath: String): Unit =
    run(spark, histPath, binsPath, vectorsPath, props)
      .select(concat_ws(" ", col("rid"), col("sid"), col("dist")))
      .write.mode("overwrite").text(outPath)
}
