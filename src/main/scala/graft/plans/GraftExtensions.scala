package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graftbridge.{ColumnBridge, SessionBridge}
import graft.functions.{CosineSim, Emd1d, EmdCols, Rubner1d}

/** SQL surface of the graft kernels.
  *
  * Deployment path: `--conf spark.sql.extensions=graft.plans.GraftExtensions`
  * (or `.withExtensions(new GraftExtensions)`) installs the function
  * registry entries and the [[RubnerPrefilter]] optimizer rule
  * session-wide — plain SQL users then write
  * `WHERE graft_emd1d(a.weights, b.weights) <= 0.2` and get the melody
  * lower-bound pruning cascade injected by Catalyst automatically.
  *
  * [[GraftFunctions.ensureRegistered]] is the late-bind path for sessions
  * constructed without the conf (test harnesses, notebooks): it registers
  * the same builders into the live FunctionRegistry and appends the rule
  * to `spark.experimental.extraOptimizations`. Both paths may be active
  * at once — the rule is idempotent by construction.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.descriptors.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => RubnerPrefilter())
  }
}

object GraftFunctions {

  type FunctionDescription =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  private def binary(name: String, usage: String,
                     make: (Expression, Expression) => Expression): FunctionDescription = {
    val ident = FunctionIdentifier(name)
    val info = new ExpressionInfo(make.getClass.getCanonicalName, null, name, usage, "")
    val builder = (args: Seq[Expression]) => {
      require(args.length == 2, s"$name expects exactly 2 arguments, got ${args.length}")
      make(args.head, args(1))
    }
    (ident, info, builder)
  }

  private def unary(name: String, usage: String,
                    make: Expression => Expression): FunctionDescription = {
    val ident = FunctionIdentifier(name)
    val info = new ExpressionInfo(make.getClass.getCanonicalName, null, name, usage, "")
    val builder = (args: Seq[Expression]) => {
      require(args.length == 1, s"$name expects exactly 1 argument, got ${args.length}")
      make(args.head)
    }
    (ident, info, builder)
  }

  /** All graft SQL functions. The native-kernel ones construct their
    * Catalyst node directly; `graft_l1_normalize` shows the other route —
    * an existing Column combinator lowered through the bridge, so any
    * DataFrame-API helper can be SQL-registered without a rewrite. */
  val descriptors: Seq[FunctionDescription] = Seq(
    binary("graft_emd1d",
      "_FUNC_(a, b) - 1-D EMD between two unit-spaced equal-mass histograms.",
      Emd1d(_, _)),
    binary("graft_rubner1d",
      "_FUNC_(a, b) - |centroid(a) - centroid(b)|, a 1-D EMD lower bound.",
      Rubner1d(_, _)),
    binary("graft_cosine",
      "_FUNC_(a, b) - cosine similarity of two vectors.",
      CosineSim(_, _)),
    unary("graft_l1_normalize",
      "_FUNC_(a) - scale a non-negative array to sum 1.",
      // eager conversion: the builder expands DURING analysis, where the
      // classic Dataset ColumnNode pass never runs — a lazy wrapper here
      // would reach codegen unresolved
      e => ColumnBridge.eagerExpression(EmdCols.l1Normalize(ColumnBridge.column(e)))),
    binary("graft_zorder",
      "_FUNC_(x, y) - 16-bit-per-dim Morton interleave key (Z-order layout).",
      (a, b) => ColumnBridge.eagerExpression(graft.operators.Layout.zOrderKey(
        Seq(ColumnBridge.column(a), ColumnBridge.column(b)), 16))),
    // text kernels, same bridge route — the SQL user's slice of the
    // corpus-pipeline surface (fingerprinting, token stats)
    unary("graft_rolling_hash",
      "_FUNC_(text) - order-sensitive rolling token fingerprint " +
        "(base-31 over 32-bit md5 token hashes mod 2^31-1).",
      e => ColumnBridge.eagerExpression(
        graft.functions.TextCols.rollingHash(ColumnBridge.column(e)))),
    unary("graft_token_count",
      "_FUNC_(text) - whitespace token count.",
      e => ColumnBridge.eagerExpression(
        graft.functions.TextCols.tokenCount(ColumnBridge.column(e))))
  )

  /** Idempotent late registration into an existing session (functions +
    * optimizer rule). Safe to call per-query. */
  def ensureRegistered(spark: SparkSession): Unit = {
    val reg = SessionBridge.functionRegistry(spark)
    descriptors.foreach { case (ident, info, builder) =>
      if (!reg.functionExists(ident)) reg.registerFunction(ident, info, builder)
    }
    val opts = spark.experimental.extraOptimizations
    if (!opts.exists(_.isInstanceOf[RubnerPrefilter]))
      spark.experimental.extraOptimizations = opts :+ RubnerPrefilter()
  }
}
