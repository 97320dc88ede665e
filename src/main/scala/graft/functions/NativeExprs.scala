package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expressions for the EMD-family scalar kernels — the
  * codegen'd counterparts of the [[EmdCols]] higher-order-function
  * combinators.
  *
  * Why both exist: the HOF forms are plain `functions._` compositions any
  * session can run, but each `aggregate()` step allocates closure frames
  * and boxes the (run, tot) struct accumulator per element. These
  * expressions generate a tight primitive-double Java loop instead, and —
  * critically — they are *named Catalyst nodes*, so the
  * [[graft.plans.RubnerPrefilter]] optimizer rule can pattern-match
  * `Emd1d(a, b) <= tau` in a logical plan and graft the melody pruning
  * cascade (reference behavior: mr/normal/QNEProcessReducer.java pruning
  * chain) into arbitrary user SQL. The HOF trees are structurally opaque
  * to such a rule.
  *
  * FP parity contract (what makes these drop-in for oracle-checked
  * queries): each accumulator is a single left-to-right sequential double
  * accumulation with per-element rounding identical to the HOF fold it
  * replaces, so results are bit-for-bit equal to the [[EmdCols]] forms
  * (spec-asserted in NativeExprsSpec):
  *  - [[Emd1d]]: `run += a(i)-b(i); tot += |run|` — the
  *    cum-of-differences shape (EmdCols.emd1d, the mrsim kernel CTE).
  *  - [[Rubner1d]]: two weighted-mean folds `m += w(i) * (double) i`,
  *    then `|ma - mb|` (EmdCols.rubner1d).
  *  - [[CosineSim]]: `dot`, `na`, `nb` accumulate independently (fusing
  *    the three loops into one pass keeps each accumulator's operation
  *    sequence unchanged), result `dot / (sqrt(na) * sqrt(nb))`
  *    (EmdCols.cosine; sqrt is IEEE correctly-rounded, so parity holds).
  *
  * Null semantics (mirrors zip_with + aggregate null propagation): null
  * input array, mismatched lengths, or any null element → null.
  */
object NativeExprs {

  /** Column wrappers (classic runtime) so DataFrame code can opt into the
    * native kernels without writing SQL. */
  def emd1d(a: Column, b: Column): Column =
    ColumnBridge.column(Emd1d(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def rubner1d(a: Column, b: Column): Column =
    ColumnBridge.column(Rubner1d(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def cosine(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSim(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}

/** Shared shape for the three binary array<double> → double kernels. */
abstract class DoubleArrayKernel extends BinaryExpression with ImplicitCastInputTypes
  with Serializable {
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  // may return null on non-null inputs (length mismatch / null element)
  override def nullable: Boolean = true

  /** Scala kernel over validated equal-length arrays; null-element checks
    * already done. */
  protected def compute(a: ArrayData, b: ArrayData, n: Int): Double

  /** Java loop body: assign the result to `resVar` given array vars and
    * element count var; null/length checks are emitted by the template. */
  protected def genLoop(ctx: CodegenContext, a: String, b: String, n: String,
                        resVar: String): String

  override def nullSafeEval(av: Any, bv: Any): Any = {
    val a = av.asInstanceOf[ArrayData]
    val b = bv.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      i += 1
    }
    compute(a, b, n)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val j = ctx.freshName("j")
      val res = ctx.freshName("res")
      val bad = ctx.freshName("bad")
      s"""
         |final int $n = $a.numElements();
         |boolean $bad = ($n != $b.numElements());
         |for (int $j = 0; !$bad && $j < $n; $j++) {
         |  $bad = $a.isNullAt($j) || $b.isNullAt($j);
         |}
         |if ($bad) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $res = 0.0;
         |  ${genLoop(ctx, a, b, n, res)}
         |  ${ev.value} = $res;
         |}
       """.stripMargin
    })
}

/** 1-D EMD over unit-spaced bins: sum_i |cumsum(a - b)_i|. */
case class Emd1d(left: Expression, right: Expression) extends DoubleArrayKernel {
  override def prettyName: String = "graft_emd1d"
  override protected def compute(a: ArrayData, b: ArrayData, n: Int): Double = {
    var run = 0.0; var tot = 0.0; var i = 0
    while (i < n) { run += a.getDouble(i) - b.getDouble(i); tot += math.abs(run); i += 1 }
    tot
  }
  override protected def genLoop(ctx: CodegenContext, a: String, b: String,
                                 n: String, resVar: String): String = {
    val run = ctx.freshName("run")
    val i = ctx.freshName("i")
    s"""
       |double $run = 0.0;
       |for (int $i = 0; $i < $n; $i++) {
       |  $run += $a.getDouble($i) - $b.getDouble($i);
       |  $resVar += Math.abs($run);
       |}
     """.stripMargin
  }
  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Emd1d =
    copy(left = newLeft, right = newRight)
}

/** 1-D Rubner lower bound: |mean(a) - mean(b)| over unit-spaced bins.
  * Always <= Emd1d(a, b) for equal-mass histograms (centroid distance
  * lower-bounds transport cost — reference utils/DistanceUtil.java:184+). */
case class Rubner1d(left: Expression, right: Expression) extends DoubleArrayKernel {
  override def prettyName: String = "graft_rubner1d"
  override protected def compute(a: ArrayData, b: ArrayData, n: Int): Double = {
    var ma = 0.0; var mb = 0.0; var i = 0
    while (i < n) {
      ma += a.getDouble(i) * i.toDouble
      mb += b.getDouble(i) * i.toDouble
      i += 1
    }
    math.abs(ma - mb)
  }
  override protected def genLoop(ctx: CodegenContext, a: String, b: String,
                                 n: String, resVar: String): String = {
    val ma = ctx.freshName("ma")
    val mb = ctx.freshName("mb")
    val i = ctx.freshName("i")
    s"""
       |double $ma = 0.0;
       |double $mb = 0.0;
       |for (int $i = 0; $i < $n; $i++) {
       |  $ma += $a.getDouble($i) * (double) $i;
       |  $mb += $b.getDouble($i) * (double) $i;
       |}
       |$resVar = Math.abs($ma - $mb);
     """.stripMargin
  }
  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Rubner1d =
    copy(left = newLeft, right = newRight)
}

/** Cosine similarity dot(a,b) / (|a| * |b|). */
case class CosineSim(left: Expression, right: Expression) extends DoubleArrayKernel {
  override def prettyName: String = "graft_cosine"
  override protected def compute(a: ArrayData, b: ArrayData, n: Int): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val x = a.getDouble(i); val y = b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }
  override protected def genLoop(ctx: CodegenContext, a: String, b: String,
                                 n: String, resVar: String): String = {
    val dot = ctx.freshName("dot")
    val na = ctx.freshName("na")
    val nb = ctx.freshName("nb")
    val i = ctx.freshName("i")
    val x = ctx.freshName("x")
    val y = ctx.freshName("y")
    s"""
       |double $dot = 0.0;
       |double $na = 0.0;
       |double $nb = 0.0;
       |for (int $i = 0; $i < $n; $i++) {
       |  final double $x = $a.getDouble($i);
       |  final double $y = $b.getDouble($i);
       |  $dot += $x * $y;
       |  $na += $x * $x;
       |  $nb += $y * $y;
       |}
       |$resVar = $dot / (Math.sqrt($na) * Math.sqrt($nb));
     """.stripMargin
  }
  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

/** Mass difference sum(a) - sum(b) — the [[graft.plans.RubnerPrefilter]]
  * soundness term: the rubner-lower-bounds-EMD premise holds only for
  * equal-mass histograms, and the guard's permitted excess scales with
  * (n - 1) * |massDiff| (Abel summation: sum_i i*(a_i - b_i) =
  * sum_{j<n-1} (P_{n-1} - P_j) with P the prefix sums, so the moment
  * difference exceeds sum|P_j| by at most (n-1)*|P_{n-1}|). */
case class MassDiff1d(left: Expression, right: Expression) extends DoubleArrayKernel {
  override def prettyName: String = "graft_massdiff1d"
  override protected def compute(a: ArrayData, b: ArrayData, n: Int): Double = {
    var sa = 0.0; var sb = 0.0; var i = 0
    while (i < n) { sa += a.getDouble(i); sb += b.getDouble(i); i += 1 }
    sa - sb
  }
  override protected def genLoop(ctx: CodegenContext, a: String, b: String,
                                 n: String, resVar: String): String = {
    val sa = ctx.freshName("sa")
    val sb = ctx.freshName("sb")
    val i = ctx.freshName("i")
    s"""
       |double $sa = 0.0;
       |double $sb = 0.0;
       |for (int $i = 0; $i < $n; $i++) {
       |  $sa += $a.getDouble($i);
       |  $sb += $b.getDouble($i);
       |}
       |$resVar = $sa - $sb;
     """.stripMargin
  }
  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): MassDiff1d =
    copy(left = newLeft, right = newRight)
}
