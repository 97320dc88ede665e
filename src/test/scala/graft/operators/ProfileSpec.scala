package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Column profiling vs hand-counted stats: the two value lanes (exact
  * integer min/max vs lexicographic strings), null accounting, and the
  * one-scan contract. */
class ProfileSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("profile-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("stats match hand counts; numeric min/max is numeric, not lexicographic") {
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    val df = Seq[(java.lang.Long, String)](
      (100L, "b"), (99L, "a"), (9L, null), (null, "a"), (100L, "c"))
      .toDF("k", "s")
    val got = Profile.columnStats(df, numeric = Seq("k"), strings = Seq("s"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5)))).toMap
    // numeric lane: min 9 / max 100 — the string form would say "100" < "9"
    assert(got("k") === ((5L, 1L, 3L, "9", "100")))
    assert(got("s") === ((5L, 1L, 3L, "a", "c")))
  }

  test("single scan feeds every column (one Generate, one parquet read)") {
    import spark.implicits._
    val df = (1L to 50L).map(i => (i, i % 7, s"v${i % 3}"))
      .toDF("a", "b", "s")
    val plan = Profile.columnStats(df, Seq("a", "b"), Seq("s"))
      .queryExecution.executedPlan.toString
    // melt = one Generate over one source; a per-column union would
    // show multiple scans of the input
    assert(plan.contains("Generate") || plan.contains("Expand"))
    assert(!plan.contains("Union"), s"per-column rescans in:\n$plan")
  }

  test("overlapping or empty column lists are rejected") {
    import spark.implicits._
    val df = Seq((1L, "x")).toDF("k", "s")
    intercept[IllegalArgumentException] {
      Profile.columnStats(df, Seq.empty, Seq.empty)
    }
    intercept[IllegalArgumentException] {
      Profile.columnStats(df, Seq("k"), Seq("k"))
    }
  }
}
