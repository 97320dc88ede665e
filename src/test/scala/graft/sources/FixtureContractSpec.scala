package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Cross-engine fixture contracts the oracles silently rely on.
  *
  * The image/audio oracles (q_image_hist, q_image_phash, q_audio_rms, …)
  * index `documents.text` by CHARACTER in DuckDB (substr/ascii/length)
  * while the Spark payload builders cycle UTF-8 BYTES — the two agree
  * only while every document is pure ASCII (char index == byte index,
  * ascii(ch) == byte value). The generated corpus has honored that every
  * round; this spec turns the unstated coupling into a contract: the day
  * the driver ships a non-ASCII document, `sbt test` fails here with a
  * pointed message instead of the driver gate failing on a hash diff. */
class FixtureContractSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("fixture-contract-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private val sfDirs =
    Seq("sf0.001", "sf0.01", "sf0.1").map(s => s"/root/testdata/$s")
      .filter(d => new java.io.File(s"$d/documents.parquet").exists())

  test("documents.text is pure ASCII at every generated scale") {
    assert(sfDirs.nonEmpty, "no generated testdata found")
    sfDirs.foreach { dir =>
      val bad = Fixtures.documents(spark, dir)
        // a non-ASCII code point makes the UTF-8 encoding longer than
        // the character count — exactly the divergence that breaks the
        // byte-vs-char oracle indexing
        .filter(length(encode(col("text"), "UTF-8")) =!= length(col("text")))
        .select(col("doc_id")).limit(5).collect()
      assert(bad.isEmpty,
        s"non-ASCII documents.text in $dir (doc_ids ${bad.mkString(",")}): " +
          "the image/audio oracles index text by DuckDB CHARACTER while " +
          "Spark payload builders cycle UTF-8 BYTES — switch those " +
          "oracles to encode(text) byte indexing before trusting the gate")
    }
  }
}
