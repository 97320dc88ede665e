package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType}
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{CosineSim, Emd1d, EmdCols, NativeExprs, Rubner1d}

/** Native EMD-kernel expressions + SQL registry + RubnerPrefilter rule.
  *
  * The load-bearing claims: (1) the native kernels are BIT-IDENTICAL to
  * the EmdCols HOF forms on real data, in both the codegen and the
  * interpreted path; (2) null semantics mirror zip_with+aggregate;
  * (3) the optimizer rule inserts exactly one lower-bound guard, is
  * idempotent under fixed-point re-application, and never changes
  * results. */
class ExtensionsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("extensions-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val Sf = "/root/testdata/sf0.001"

  private def pairs() = {
    val h = graft.sources.Fixtures.quantityHists(spark, Sf)
    val a = h.select(col("id").as("rid"), col("weights").as("wa"))
    val b = h.select(col("id").as("sid"), col("weights").as("wb"))
    a.join(b, col("rid") < col("sid"))
  }

  test("native kernels bit-match the EmdCols HOF forms (codegen path)") {
    spark.sparkContext.setLogLevel("WARN")
    val df = pairs().select(
      NativeExprs.emd1d(col("wa"), col("wb")).as("e_n"),
      EmdCols.emd1d(col("wa"), col("wb")).as("e_h"),
      NativeExprs.rubner1d(col("wa"), col("wb")).as("r_n"),
      EmdCols.rubner1d(col("wa"), col("wb")).as("r_h"),
      NativeExprs.cosine(col("wa"), col("wb")).as("c_n"),
      EmdCols.cosine(col("wa"), col("wb")).as("c_h"))
    // bit-for-bit: compare raw doubles, no rounding
    val badDf = df.filter(col("e_n") =!= col("e_h") ||
      col("r_n") =!= col("r_h") || col("c_n") =!= col("c_h"))
    val bad = badDf.count()
    assert(bad == 0)
    assert(df.count() > 1000)
    // rubner is a lower bound up to FP noise: when all mass moves one
    // direction the two are mathematically EQUAL, and the independently
    // rounded accumulations land a few ulps either side — exactly the
    // marginal case RubnerPrefilter's Slack exists for
    assert(df.filter(col("r_n") > col("e_n") + 1e-9).count() == 0)
    assert(df.filter(col("r_n") > col("e_n")).count() > 0,
      "expected some ulp-level rubner>emd ties (the reason Slack exists)")
  }

  test("interpreted eval matches codegen and the Scala reference") {
    val a = Array(0.5, 0.25, 0.0, 0.25)
    val b = Array(0.0, 0.5, 0.5, 0.0)
    def lit(xs: Array[Double]) = Literal.create(xs.toSeq, ArrayType(DoubleType))
    val emd = Emd1d(lit(a), lit(b)).eval(null).asInstanceOf[Double]
    // hand fold: cum = .5, .25, -.25, 0 -> 1.0
    assert(emd == 1.0)
    val rub = Rubner1d(lit(a), lit(b)).eval(null).asInstanceOf[Double]
    assert(rub == math.abs((0.25 + 0.75) - (0.5 + 1.0)))
    val cos = CosineSim(lit(a), lit(b)).eval(null).asInstanceOf[Double]
    val expect = (0.25 * 0.5) /
      (math.sqrt(0.25 + 0.0625 + 0.0625) * math.sqrt(0.5))
    assert(cos == expect)
  }

  test("null semantics: null input, length mismatch, null element") {
    def lit(xs: Seq[java.lang.Double]) = Literal.create(xs, ArrayType(DoubleType))
    val good = lit(Seq(0.5, 0.5))
    assert(Emd1d(Literal.create(null, ArrayType(DoubleType)), good).eval(null) == null)
    assert(Emd1d(good, lit(Seq(1.0, 0.0, 0.0))).eval(null) == null)
    assert(Emd1d(good, lit(Seq(1.0, null))).eval(null) == null)
    // same through codegen
    import spark.implicits._
    val row = Seq((Array(0.5, 0.5), Array(1.0, 0.0, 0.0))).toDF("a", "b")
    assert(row.select(NativeExprs.emd1d(col("a"), col("b"))).head().isNullAt(0))
  }

  test("ensureRegistered: functions resolve in SQL, ints implicit-cast") {
    GraftFunctions.ensureRegistered(spark)
    GraftFunctions.ensureRegistered(spark) // idempotent
    val r = spark.sql(
      """SELECT graft_emd1d(array(0.5D, 0.5D), array(1.0D, 0.0D)) AS e,
        |       graft_rubner1d(array(0.5D, 0.5D), array(1.0D, 0.0D)) AS rb,
        |       graft_cosine(array(1, 0), array(0, 1)) AS c,
        |       graft_l1_normalize(array(1.0D, 3.0D)) AS nz""".stripMargin).head()
    assert(r.getDouble(0) == 0.5)
    assert(r.getDouble(1) == 0.5)
    assert(r.getDouble(2) == 0.0)
    assert(r.getSeq[Double](3) == Seq(0.25, 0.75))
    assert(spark.experimental.extraOptimizations
      .count(_.isInstanceOf[RubnerPrefilter]) == 1)
    // text kernels through the same bridge: SQL == Column form
    import spark.implicits._
    val txt = Seq("a b a", "x").toDF("t")
    txt.createOrReplaceTempView("exttxt")
    val sqlRows = spark.sql(
      """SELECT graft_token_count(t) AS n, graft_rolling_hash(t) AS h
        |FROM exttxt""".stripMargin).collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSeq
    val colRows = txt.select(
        graft.functions.TextCols.tokenCount($"t").as("n"),
        graft.functions.TextCols.rollingHash($"t").as("h")).collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(sqlRows == colRows)
    assert(sqlRows.map(_._1) == Seq(3, 1))
  }

  test("RubnerPrefilter inserts exactly one guard and preserves results") {
    GraftFunctions.ensureRegistered(spark)
    val tau = 0.153
    val guarded = pairs()
      .filter(NativeExprs.emd1d(col("wa"), col("wb")) <= tau)
      .select(col("rid"), col("sid"))
    val plan = guarded.queryExecution.optimizedPlan
    // count across the WHOLE tree: pushdown may home the predicate in a
    // Join condition rather than a Filter
    val rubners = plan.collect { case n =>
      n.expressions.map(_.collect { case r: Rubner1d => r }.size).sum
    }.sum
    assert(rubners == 1, s"expected exactly one Rubner1d guard in:\n$plan")
    // guard precedes the exact test inside the same And
    assert(plan.toString.contains("graft_rubner1d"))
    // results identical to the un-rewritable HOF form
    val want = pairs()
      .filter(EmdCols.emd1d(col("wa"), col("wb")) <= tau)
      .select(col("rid"), col("sid")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = guarded.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("rule skips filters that already carry a rubner guard") {
    GraftFunctions.ensureRegistered(spark)
    val tau = 0.153
    val manual = pairs()
      .filter(NativeExprs.rubner1d(col("wa"), col("wb")) <= tau &&
        NativeExprs.emd1d(col("wa"), col("wb")) <= tau)
    val rubners = manual.queryExecution.optimizedPlan.collect { case n =>
      n.expressions.map(_.collect { case r: Rubner1d => r }.size).sum
    }.sum
    assert(rubners == 1)
  }

  test("RubnerPrefilter keeps unequal-mass rows (guard self-relaxes by mass budget)") {
    GraftFunctions.ensureRegistered(spark)
    import spark.implicits._
    // unequal mass: emd1d (cum-of-diff) = 1.0 but rubner (moment diff)
    // = 2.0 — a naive rubner <= tau guard drops this qualifying row
    val df = Seq(
      (1L, Array(0.0, 0.0, 1.0), Array(0.0, 0.0, 0.0)),
      (2L, Array(1e6, 2e6, 3e6), Array(3e6, 2e6, 1e6)), // count-scale, equal mass
      (3L, Array(0.25, 0.75), Array(0.75, 0.25))).toDF("id", "wa", "wb")
    df.createOrReplaceTempView("rpv")
    def ids(tau: Double) = spark.sql(
        s"SELECT id FROM rpv WHERE graft_emd1d(wa, wb) <= $tau")
      .collect().map(_.getLong(0)).toSet
    // reference EMDs (FP-exact inputs): row1 = 1.0 (unequal mass),
    // row2 = 4e6 (prefix sums -2e6,-2e6,0; rubner = 4e6 sits exactly ON
    // the bound), row3 = 0.5 (prefix -0.5, 0)
    assert(ids(1.0) == Set(1L, 3L), "unequal-mass qualifying row dropped by the guard")
    assert(ids(0.99) == Set(3L))
    assert(ids(4e6) == Set(1L, 2L, 3L), "count-scale rubner==emd boundary row dropped")
    assert(ids(0.49) == Set())
  }

  test("graft_zorder in SQL == Layout.zOrderKey column form") {
    GraftFunctions.ensureRegistered(spark)
    import spark.implicits._
    val df = Seq((3L, 5L), (65535L, 0L), (12345L, 54321L))
      .toDF("x", "y")
    df.createOrReplaceTempView("zin")
    val viaSql = spark.sql("SELECT graft_zorder(x, y) AS z FROM zin")
      .collect().map(_.getLong(0)).toSeq
    val viaCol = df.select(graft.operators.Layout.zOrderKey(
        Seq(col("x"), col("y")), 16).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(viaSql == viaCol)
  }

  test("GraftExtensions injects into a fresh SparkSessionExtensions") {
    // builder-path smoke test: injection must not throw (session-level
    // behavior is covered by Verify/Bench running with the conf set)
    new GraftExtensions().apply(new SparkSessionExtensions)
  }
}
