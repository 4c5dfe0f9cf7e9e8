package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native, codegen-capable kernels for the Similarity vector math.
  *
  * Why: `aggregate(zip_with(a, b, ...))` and the other higher-order
  * formulations are CodegenFallback — the per-element lambda runs
  * INTERPRETED, which dominated every embedding operator's profile
  * (the Hash60Array finding applied to float math). Each kernel below
  * reproduces the replaced Catalyst expression's arithmetic EXACTLY —
  * same element-order accumulation, same float→double widening, same
  * null semantics (length mismatch or a null element ⇒ null result,
  * matching zip_with's null padding), same BigDecimal HALF_UP round-6
  * and Spark NaN ordering where the original used them — so every
  * oracle-gated score is bit-identical.
  */
object VecKernel {
  type Get = (ArrayData, Int) => Double

  def getter(dt: DataType): Get = dt match {
    case FloatType => (a, i) => a.getFloat(i).toDouble
    case DoubleType => (a, i) => a.getDouble(i)
    case LongType => (a, i) => a.getLong(i).toDouble
    case IntegerType => (a, i) => a.getInt(i).toDouble
    case ShortType => (a, i) => a.getShort(i).toDouble
    case ByteType => (a, i) => a.getByte(i).toDouble
    case other => throw new IllegalArgumentException(s"non-numeric array: $other")
  }

  /** Σ a(i)·b(i) in array order; null on length mismatch or any null
    * element (the zip_with + aggregate semantics).
    */
  def dot(a: ArrayData, ga: Get, b: ArrayData, gb: Get): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += ga(a, i) * gb(b, i)
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  /** Σ (a(i) − b(i))² in array order; same null semantics as [[dot]]. */
  def sqDist(a: ArrayData, ga: Get, b: ArrayData, gb: Get): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = ga(a, i) - gb(b, i)
      acc += d * d
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  /** Spark's round(x, 6) for doubles: BigDecimal HALF_UP on the
    * canonical decimal repr; NaN/Infinity pass through (RoundBase).
    */
  def round6(x: Double): Double =
    if (x.isNaN || x.isInfinite) x
    else java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** The [[graft.ops.Similarity.signCell]] arithmetic: bit b is
    * round6(Σᵢ vec(i)·(±1))≥0 under the prime-b sign pattern
    * (+1 iff (i·prime) mod 64 < 32), cell = Σ bit·2^b. A null element
    * nulls the projection, and the original's
    * `when(round(proj,6) >= 0, 1L).otherwise(0L)` maps a null
    * projection to bit 0 — reproduced; NaN compares ≥ 0 under Spark's
    * double ordering (NaN largest), also reproduced.
    */
  def signCell(vec: ArrayData, gv: Get, primes: ArrayData): Long = {
    val n = vec.numElements()
    val nb = primes.numElements()
    var cell = 0L
    var b = 0
    while (b < nb) {
      val prime = primes.getInt(b)
      var acc = 0.0
      var anyNull = false
      var i = 0
      while (!anyNull && i < n) {
        if (vec.isNullAt(i)) anyNull = true
        else {
          val sign = if (((i.toLong * prime) % 64) < 32) 1.0 else -1.0
          acc += gv(vec, i) * sign
          i += 1
        }
      }
      if (!anyNull) {
        val r = round6(acc)
        if (r.isNaN || r >= 0) cell += 1L << b
      }
      b += 1
    }
    cell
  }
}

private[functions] trait VecBinary extends BinaryExpression {
  @transient protected lazy val gLeft: VecKernel.Get =
    VecKernel.getter(left.dataType.asInstanceOf[ArrayType].elementType)
  @transient protected lazy val gRight: VecKernel.Get =
    VecKernel.getter(right.dataType.asInstanceOf[ArrayType].elementType)
  protected def refName: String
  // public: invoked from generated code through addReferenceObj
  def kernelResult(a: ArrayData, b: ArrayData): Any

  override protected def nullSafeEval(a: Any, b: Any): Any =
    kernelResult(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
}

/** dot(a, b) = Σ aᵢ·bᵢ (doubles, array order) — the codegen twin of
  * `aggregate(zip_with(a, b, (x, y) => x.double * y.double), 0.0, +)`.
  */
case class DotD(left: Expression, right: Expression) extends VecBinary {
  override def dataType: DataType = DoubleType
  override protected def refName: String = "dotExpr"
  override def kernelResult(a: ArrayData, b: ArrayData): Any =
    VecKernel.dot(a, gLeft, b, gRight)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj(refName, this, classOf[DotD].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      java.lang.Double r = (java.lang.Double) $ref.kernelResult($a, $b);
      if (r == null) { ${ev.isNull} = true; } else { ${ev.value} = r.doubleValue(); }
    """)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotD =
    copy(left = l, right = r)
  override def prettyName: String = "dot_d"
}

/** Σ (aᵢ−bᵢ)² (doubles, array order) — the codegen twin of the
  * `aggregate(zip_with(a, b, (x, y) => (x-y)*(x-y)), 0.0, +)` shape
  * used by the k-means / PQ distance argmins.
  */
case class SqDistD(left: Expression, right: Expression) extends VecBinary {
  override def dataType: DataType = DoubleType
  override protected def refName: String = "sqDistExpr"
  override def kernelResult(a: ArrayData, b: ArrayData): Any =
    VecKernel.sqDist(a, gLeft, b, gRight)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj(refName, this, classOf[SqDistD].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      java.lang.Double r = (java.lang.Double) $ref.kernelResult($a, $b);
      if (r == null) { ${ev.isNull} = true; } else { ${ev.value} = r.doubleValue(); }
    """)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SqDistD =
    copy(left = l, right = r)
  override def prettyName: String = "sq_dist_d"
}

/** Banded prime-plane sign cell (see [[VecKernel.signCell]]); `right`
  * is the int-array literal of plane primes.
  */
case class SignCellE(left: Expression, right: Expression) extends VecBinary {
  override def dataType: DataType = LongType
  override protected def refName: String = "signCellExpr"
  override def kernelResult(a: ArrayData, b: ArrayData): Any =
    java.lang.Long.valueOf(VecKernel.signCell(a, gLeft, b))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj(refName, this, classOf[SignCellE].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      ${ev.value} = ((java.lang.Long) $ref.kernelResult($a, $b)).longValue();
    """)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SignCellE =
    copy(left = l, right = r)
  override def prettyName: String = "sign_cell"
}

object VectorExprs {
  import org.apache.spark.sql.GraftColumnBridge.{column, expression}

  def dotD(a: Column, b: Column): Column = column(DotD(expression(a), expression(b)))
  def sqDistD(a: Column, b: Column): Column =
    column(SqDistD(expression(a), expression(b)))
  def signCell(vec: Column, primes: Seq[Int]): Column =
    column(SignCellE(expression(vec),
      expression(org.apache.spark.sql.functions.lit(primes.toArray))))

  /** Positional struct-field extraction. Name-based `.getField("cid")`
    * over a struct that nests one of the expressions above can lose its
    * field names when the column is re-analyzed inside a second select
    * (the analyzer re-derives CreateStruct names as colN); the ordinal
    * extraction is immune and resolves to the same GetStructField.
    */
  def field(struct: Column, ordinal: Int): Column =
    column(org.apache.spark.sql.catalyst.expressions.GetStructField(
      expression(struct), ordinal))
}
