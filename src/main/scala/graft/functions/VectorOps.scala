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
    case _ if nBits < 1 || nBits > 63 =>
      // > 63 would silently wrap `1L << p` (Java masks the shift count
      // mod 64: plane 64 collides onto bit 0) while the DuckDB twin
      // does not — a silent cross-engine divergence; < 1 would crash
      // per-row at execution time. Fail at analysis instead.
      TypeCheckResult.TypeCheckFailure(
        s"hyperplane_sig nBits must be in [1, 63], got $nBits")
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_sig expects an array<double> column, got ${t.simpleString}")
  }
  override def dataType: DataType = LongType
  // NULL vector -> 0L, matching the HOF twin (every when(dot > 0)
  // test fails on null -> otherwise(0L)) and the DuckDB oracle's CASE
  // chain — default null propagation silently diverged on NULL rows
  override def nullable: Boolean = false
  override def prettyName: String = "hyperplane_sig"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0L else VectorOps.hyperplaneSig(v.asInstanceOf[ArrayData], nBits)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${c.code}
        long ${ev.value} = ${c.isNull} ? 0L :
          graft.functions.VectorOps.hyperplaneSig(${c.value}, $nBits);""",
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

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
    val xs = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (v.isNullAt(i)) return 0L
      xs(i) = v.getDouble(i)
      i += 1
    }
    // the (plane, element) sign matrix is data-independent — computing
    // the 4-step mix per (element, plane) per ROW was ~10 redundant ALU
    // ops around each multiply-add (nBits x dim x rows evaluations);
    // the cached table keeps results bit-identical and turns the inner
    // loop into a contiguous load + multiply-add. Per-bit accumulation
    // still sees its terms in element order (the f64 exactness
    // contract vs the HOF twin and the DuckDB oracle).
    if (n > MaxCachedDim) return sigNoTable(xs, nBits)
    val tbl = signTable(nBits, n)
    val stride = tbl.dim
    val s = tbl.signs
    var sig = 0L
    var p = 0
    while (p < nBits) {
      val off = p * stride
      var acc = 0.0d
      var j = 0
      while (j < n) { acc += xs(j) * s(off + j); j += 1 }
      if (acc > 0.0d) sig |= (1L << p)
      p += 1
    }
    sig
  }

  /** The cache is bounded: one outlier mega-row must not permanently
    * allocate 63 x dim doubles of executor heap (a 1M-element array
    * would pin ~500 MB for the JVM lifetime). Beyond the cap the sign
    * mix computes inline per (plane, element) — bit-identical, just
    * without the table.
    */
  private final val MaxCachedDim = 8192

  private def sigNoTable(xs: Array[Double], nBits: Int): Long = {
    var sig = 0L
    var p = 0
    while (p < nBits) {
      var acc = 0.0d
      var i = 0
      while (i < xs.length) {
        var h = ((p.toLong * 1000003L + i) * 2654435761L) & 0xFFFFFFFFL
        h ^= h >>> 16
        h = (h * 40503L) & 0xFFFFFFFFL
        h ^= h >>> 13
        acc += xs(i) * (if ((h & 1L) == 0L) 1.0d else -1.0d)
        i += 1
      }
      if (acc > 0.0d) sig |= (1L << p)
      p += 1
    }
    sig
  }

  /** Lazily-grown per-JVM cache of the deterministic +-1 sign matrix,
    * laid out signs(p * dim + i). Monotone growth: a table covering
    * (nBits', dim') >= (nBits, dim) serves any smaller request via its
    * own stride. Max size is 63 planes x dim doubles (~0.5 MB at
    * dim 1024) — executor-resident, built once per JVM.
    */
  private final class SignTable(val nBits: Int, val dim: Int) {
    val signs = new Array[Double](nBits * dim)
    private var p = 0
    while (p < nBits) {
      var i = 0
      while (i < dim) {
        var h = ((p.toLong * 1000003L + i) * 2654435761L) & 0xFFFFFFFFL
        h ^= h >>> 16
        h = (h * 40503L) & 0xFFFFFFFFL
        h ^= h >>> 13
        signs(p * dim + i) = if ((h & 1L) == 0L) 1.0d else -1.0d
        i += 1
      }
      p += 1
    }
  }

  @volatile private var cachedSigns: SignTable = null

  private def signTable(nBits: Int, dim: Int): SignTable = {
    val t = cachedSigns
    if (t != null && t.nBits >= nBits && t.dim >= dim) t
    else this.synchronized {
      val t2 = cachedSigns
      if (t2 != null && t2.nBits >= nBits && t2.dim >= dim) t2
      else {
        val nt = new SignTable(
          math.max(nBits, if (t2 == null) 0 else t2.nBits),
          math.max(dim, if (t2 == null) 0 else t2.dim))
        cachedSigns = nt
        nt
      }
    }
  }

  /** Column wrappers. */
  def cosineSim(a: Column, b: Column): Column =
    GraftExpressionBridge.column(
      CosineSim(GraftExpressionBridge.expression(a), GraftExpressionBridge.expression(b)))

  def hyperplaneSigCol(v: Column, nBits: Int): Column =
    GraftExpressionBridge.column(
      HyperplaneSig(GraftExpressionBridge.expression(v), nBits))
}
