package graft.operators

import java.io.File
import java.nio.file.Files

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.{LogicalTypeAnnotation, Types}
import org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType
import org.scalatest.funsuite.AnyFunSuite

/** Timestamp-encoding drift guard for `Fixtures.events`.
  *
  * The driver has regenerated events.parquet with a different parquet
  * timestamp encoding twice (TIMESTAMP(NANOS), then TIMESTAMP(MICROS,
  * isAdjustedToUTC=false) = Spark TIMESTAMP_NTZ), and each time the load
  * path silently fell through and five time-based queries failed at the
  * driver gate instead of in `sbt test`. This spec writes the same tiny
  * events table in all three encodings the testdata has ever used —
  * NANOS int64 (via parquet-java, Spark cannot write NANOS),
  * MICROS unadjusted (Spark TIMESTAMP_NTZ write path), and MICROS
  * adjusted (Spark TIMESTAMP write path with outputTimestampType pinned)
  * — asserts the parquet footer really carries the claimed annotation
  * (so a Spark write-default change fails here, not silently), then
  * checks `Fixtures.events` normalizes every encoding to TimestampType
  * with identical micros, and that sessionize/asOfJoin agree across all
  * three. */
class EventsEncodingSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("events-encoding-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  // (event_id, user_id, tsMicros, value) — gaps straddle the 3600 s
  // sessionize boundary and include an exact-equal asOfJoin timestamp
  private val rows: Seq[(Long, Long, Long, Double)] = Seq(
    (1L, 10L, 1700000000000000L, 1.5),
    (2L, 10L, 1700000000500000L, 2.0),
    (3L, 10L, 1700003600500001L, 0.25), // > 3600 s after id 2 → new session
    (4L, 20L, 1700000000000000L, 4.0),  // equal ts across users
    (5L, 20L, 1700007200000000L, 1.0),
    (6L, 30L, 1699999999999999L, 3.0)
  )

  private def freshDir(tag: String): String = {
    val d = Files.createTempDirectory(s"events-enc-$tag").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  /** Footer annotation of the single parquet data file under dir/events.parquet. */
  private def tsAnnotation(dir: String): LogicalTypeAnnotation = {
    val target = new File(s"$dir/events.parquet")
    val dataFile =
      if (target.isFile) target
      else target.listFiles().filter(f => f.getName.startsWith("part-") &&
        f.getName.endsWith(".parquet")).head
    val in = HadoopInputFile.fromPath(new Path(dataFile.getAbsolutePath), new Configuration())
    val reader = ParquetFileReader.open(in)
    try {
      val schema = reader.getFooter.getFileMetaData.getSchema
      schema.getType(Seq("ts"): _*).asPrimitiveType().getLogicalTypeAnnotation
    } finally reader.close()
  }

  private def writeNanos(dir: String): Unit = {
    val schema = Types.buildMessage()
      .required(INT64).named("event_id")
      .required(INT64)
        .as(LogicalTypeAnnotation.timestampType(false, TimeUnit.NANOS)).named("ts")
      .required(INT64).named("user_id")
      .required(DOUBLE).named("value")
      .named("events")
    val writer = ExampleParquetWriter
      .builder(new Path(s"$dir/events.parquet"))
      .withType(schema).withConf(new Configuration()).build()
    val f = new SimpleGroupFactory(schema)
    try rows.foreach { case (id, uid, us, v) =>
      val g = f.newGroup()
      g.add("event_id", id)
      g.add("ts", us * 1000L)
      g.add("user_id", uid)
      g.add("value", v)
      writer.write(g)
    } finally writer.close()
  }

  private def baseDf = {
    import spark.implicits._
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    rows.toDF("event_id", "user_id", "us", "value")
  }

  private def writeNtz(dir: String): Unit =
    baseDf
      .withColumn("ts", timestamp_micros(col("us")).cast("timestamp_ntz"))
      .select("event_id", "ts", "user_id", "value")
      .coalesce(1).write.parquet(s"$dir/events.parquet")

  private def writeAdjustedMicros(dir: String): Unit = {
    val prev = spark.conf.getOption("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    try baseDf
      .withColumn("ts", timestamp_micros(col("us")))
      .select("event_id", "ts", "user_id", "value")
      .coalesce(1).write.parquet(s"$dir/events.parquet")
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.parquet.outputTimestampType", v)
      case None => spark.conf.unset("spark.sql.parquet.outputTimestampType")
    }
  }

  private def loadedMicros(dir: String): Map[Long, Long] = {
    val df = graft.sources.Fixtures.events(spark, dir)
    assert(df.schema("ts").dataType == TimestampType,
      s"Fixtures.events must normalize ts to TIMESTAMP, got ${df.schema("ts").dataType} for $dir")
    df.select(col("event_id"), unix_micros(col("ts")).as("us"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("Fixtures.events normalizes all three historical parquet ts encodings") {
    val nanosDir = freshDir("nanos")
    val ntzDir = freshDir("ntz")
    val adjDir = freshDir("adj")
    writeNanos(nanosDir)
    writeNtz(ntzDir)
    writeAdjustedMicros(adjDir)

    // the files must really carry the encodings this spec claims to cover
    val nanosAnn = tsAnnotation(nanosDir)
      .asInstanceOf[LogicalTypeAnnotation.TimestampLogicalTypeAnnotation]
    assert(nanosAnn.getUnit == TimeUnit.NANOS && !nanosAnn.isAdjustedToUTC)
    val ntzAnn = tsAnnotation(ntzDir)
      .asInstanceOf[LogicalTypeAnnotation.TimestampLogicalTypeAnnotation]
    assert(!ntzAnn.isAdjustedToUTC,
      s"Spark NTZ write no longer produces isAdjustedToUTC=false: $ntzAnn")
    val adjAnn = tsAnnotation(adjDir)
      .asInstanceOf[LogicalTypeAnnotation.TimestampLogicalTypeAnnotation]
    assert(adjAnn.getUnit == TimeUnit.MICROS && adjAnn.isAdjustedToUTC,
      s"Spark TIMESTAMP write did not honor TIMESTAMP_MICROS: $adjAnn")

    val want = rows.map(r => r._1 -> r._3).toMap
    assert(loadedMicros(nanosDir) == want, "NANOS load lost micros")
    assert(loadedMicros(ntzDir) == want, "NTZ load lost micros")
    assert(loadedMicros(adjDir) == want, "adjusted-MICROS load lost micros")
  }

  test("sessionize and asOfJoin agree across all three encodings") {
    val dirs = Seq("nanos" -> (writeNanos _), "ntz" -> (writeNtz _),
      "adj" -> (writeAdjustedMicros _)).map { case (tag, w) =>
      val d = freshDir(s"ops-$tag"); w(d); tag -> d
    }
    val sessions = dirs.map { case (tag, d) =>
      tag -> EventOps.sessionize(graft.sources.Fixtures.events(spark, d), gapSec = 3600L)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getDouble(5))).toSet
    }.toMap
    assert(sessions("nanos") == sessions("ntz") && sessions("ntz") == sessions("adj"),
      s"sessionize diverged across encodings: $sessions")
    // user 10 must split into two sessions (gap fixture actually exercised)
    assert(sessions("nanos").count(_._1 == 10L) == 2)

    val asofs = dirs.map { case (tag, d) =>
      val ev = graft.sources.Fixtures.events(spark, d)
      tag -> EventOps.asOfJoin(ev, ev.filter(col("user_id") === 10L),
          "user_id", "ts", "event_id")
        .collect().map(r => (r.getLong(0),
          if (r.isNullAt(1)) -1L else r.getLong(1),
          if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    }.toMap
    assert(asofs("nanos") == asofs("ntz") && asofs("ntz") == asofs("adj"),
      s"asOfJoin diverged across encodings: $asofs")
  }
}
