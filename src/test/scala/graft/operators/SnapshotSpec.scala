package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Snapshot diff against hand-built snapshots: the four lanes, null-id
  * hygiene, and the fixture derivation's planted lanes. */
class SnapshotSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("snapshot-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("diff emits all four lanes on hand snapshots") {
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    val a = Seq((1L, "same"), (2L, "old body"), (3L, "gone"))
      .toDF("doc_id", "text")
    val b = Seq((1L, "same"), (2L, "new body"), (4L, "fresh"))
      .toDF("doc_id", "text")
    val got = Snapshot.diff(a, b).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "unchanged", 2L -> "changed",
      3L -> "removed", 4L -> "added"))
  }

  test("nextSnapshot plants every lane and diff finds them") {
    import spark.implicits._
    val docs = graft.sources.Fixtures.documents(spark, "/root/testdata/sf0.001")
    val d = Snapshot.diff(docs, Snapshot.nextSnapshot(docs)).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val byStatus = d.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byStatus.keySet === Set("added", "removed", "changed", "unchanged"))
    // lanes match the modular derivation exactly
    val n = docs.count()
    assert(byStatus("removed") === (0L until n).count(_ % 23 == 0))
    assert(byStatus("added") === (0L until n).count(_ % 11 == 5))
    assert(byStatus("changed") === (0L until n).count(i => i % 7 == 3 && i % 23 != 0))
    // every added id sits in the shifted range
    assert(d.filter(_._2 == "added").forall(_._1 >= 1000000L))
  }

  test("contentDedup catches re-hosted content under any id; history multiplicity irrelevant") {
    import spark.implicits._
    val history = Seq((1L, "shared boilerplate"), (2L, "shared boilerplate"),
      (3L, "unique old page")).toDF("doc_id", "text")
    val arriving = Seq(
      (100L, "shared boilerplate"),  // re-host of a MULTI-copy old text
      (101L, "unique old page"),     // re-host of a single-copy old text
      (102L, "genuinely new text")).toDF("doc_id", "text")
    val got = Snapshot.contentDedup(history, arriving).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(got === Map(100L -> false, 101L -> false, 102L -> true))
  }

  test("rehostWrap plants the mirror and fresh lanes against the fixture") {
    val docs = graft.sources.Fixtures.documents(spark, "/root/testdata/sf0.001")
    val got = Snapshot.contentDedup(docs, Snapshot.rehostWrap(docs)).collect()
      .map(r => (r.getLong(0), r.getBoolean(1)))
    val (mirror, fresh) = got.partition(_._1 < 3000000L)
    assert(mirror.nonEmpty && mirror.forall(!_._2), "every mirror is caught")
    assert(fresh.nonEmpty && fresh.forall(_._2), "every fresh page passes")
  }

  test("identical snapshots diff to all-unchanged") {
    import spark.implicits._
    val a = Seq((1L, "x"), (2L, "y")).toDF("doc_id", "text")
    val got = Snapshot.diff(a, a).collect().map(_.getString(1)).toSet
    assert(got === Set("unchanged"))
  }
}
