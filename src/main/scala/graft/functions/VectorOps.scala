package graft.functions

import org.apache.spark.sql.{Column, GraftExpressionBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native Catalyst expressions for the embedding-similarity hot loops.
  *
  * The HOF formulation (`aggregate(zip_with(a, b, _ * _), 0.0, _ + _)`)
  * is semantically right but allocates a zipped intermediate array and
  * interprets two lambdas per element per evaluation; the IVF centroid
  * assignment evaluates N x K cosines, where that overhead dominated
  * the whole leg (measured: 158 s of a 200k-vector OpsBench probe).
  * These expressions keep the exact same arithmetic — strict
  * left-to-right double accumulation, the order the DuckDB oracles
  * (`list_dot_product` / `list_reduce`) use — in one fused pass inside
  * whole-stage codegen. Parity with the HOF forms is bit-exact and
  * spec-asserted (VectorOpsSpec), including the null/mismatch edge
  * semantics:
  *
  *  - `cosine_sim`: length mismatch or any null element -> null (the
  *    HOF zip_with pads/propagates null through the fold).
  *  - `hyperplane_sig`: empty or any-null vector -> 0L (the HOF `when`
  *    guard pins empties to 0; null dots fail every `dot > 0` test).
  */
final case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"cosine_sim expects two array<double> columns, got ${l.simpleString} / ${r.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.cosineOrNull(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  // result can be null even for non-null inputs (length mismatch /
  // null element), so the boxed-Double forwarder drives ev.isNull
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      |java.lang.Double ${ev.value}_r = graft.functions.VectorOps.cosineOrNull($a, $b);
      |if (${ev.value}_r == null) { ${ev.isNull} = true; }
      |else { ${ev.value} = ${ev.value}_r.doubleValue(); }
      |""".stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

/** Random-hyperplane LSH signature: bit p = sign of the dot product
  * with the deterministic +-1 hyperplane p (the integer-arithmetic
  * pseudo-random draw both engines share). One pass over the vector
  * accumulates all nBits dots; each per-bit accumulator sees its terms
  * in element order, so every dot equals the HOF per-bit fold exactly.
  */
final case class HyperplaneSig(child: Expression, nBits: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_sig expects an array<double> column, got ${t.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_sig"

  override def nullSafeEval(input: Any): Any =
    VectorOps.hyperplaneSig(input.asInstanceOf[ArrayData], nBits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.VectorOps.hyperplaneSig($c, $nBits)")

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSig =
    copy(child = newChild)
}

object VectorOps {

  /** Shared by interpreted eval and generated code. Strict
    * left-to-right accumulation for all three sums (dot, |a|^2, |b|^2 —
    * independent accumulators in one pass produce the same values as
    * three separate folds); null on length mismatch or null element,
    * mirroring the HOF null propagation.
    */
  def cosineOrNull(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0.0d
    var na = 0.0d
    var nb = 0.0d
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = a.getDouble(i)
      val y = b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    java.lang.Double.valueOf(dot / (math.sqrt(na) * math.sqrt(nb)))
  }

  /** One-pass nBits-dot signature; 0L for empty or any-null vectors
    * (see HyperplaneSig doc). The sign draw is exact integer
    * arithmetic shared bit-for-bit with the Column HOF twin and the
    * DuckDB oracle: a Wang-style 32-bit mix (mul, xor-shift, mul,
    * xor-shift) of seed p*1000003 + i, then the LOW bit of the mixed
    * value. The mix matters: the previous draw took `% 2` of a single
    * LCG product, whose low bit is an affine function of (p + i) — all
    * nBits "hyperplanes" were one hyperplane up to sign, the signature
    * space collapsed to 2 values, and every vector landed in one giant
    * LSH bucket (measured: 2 distinct sigs over 20k clustered vectors;
    * after the mix, mean inter-row |dot| at dim 64 is 6.3 vs the
    * sqrt(64)*0.8 = 6.4 of truly random +-1 rows). All intermediates
    * stay below 2^63 for the nBits/dim ranges in play and non-negative,
    * so plain % == pmod and & 0xFFFFFFFF == mod 2^32.
    */
  def hyperplaneSig(v: ArrayData, nBits: Int): Long = {
    val n = v.numElements()
    if (n == 0) return 0L
    var i = 0
    while (i < n) {
      if (v.isNullAt(i)) return 0L
      i += 1
    }
    val acc = new Array[Double](nBits)
    i = 0
    while (i < n) {
      val x = v.getDouble(i)
      var p = 0
      while (p < nBits) {
        var h = ((p.toLong * 1000003L + i) * 2654435761L) & 0xFFFFFFFFL
        h ^= h >>> 16
        h = (h * 40503L) & 0xFFFFFFFFL
        h ^= h >>> 13
        val sign = if ((h & 1L) == 0L) 1.0d else -1.0d
        acc(p) += x * sign
        p += 1
      }
      i += 1
    }
    var sig = 0L
    var p = 0
    while (p < nBits) {
      if (acc(p) > 0.0d) sig |= (1L << p)
      p += 1
    }
    sig
  }

  /** Column wrappers. */
  def cosineSim(a: Column, b: Column): Column =
    GraftExpressionBridge.column(
      CosineSim(GraftExpressionBridge.expression(a), GraftExpressionBridge.expression(b)))

  def hyperplaneSigCol(v: Column, nBits: Int): Column =
    GraftExpressionBridge.column(
      HyperplaneSig(GraftExpressionBridge.expression(v), nBits))
}
