package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Native Catalyst expression for the embedding dot product — the one
  * hot-path scalar the built-in surface can't do efficiently: the
  * higher-order-function formulation (`aggregate(zip_with(...))`) is
  * interpreted per element, allocating a lambda frame per dimension.
  * This expression stays inside whole-stage codegen: a tight primitive
  * loop over the two float arrays (SURVEY §2.10 reserve list).
  */
case class FloatVecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (double) $x.getFloat($i) * (double) $y.getFloat($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVecDot =
    copy(left = newLeft, right = newRight)
}

/** Shared kernel for the hyperplane signature — a top-level object so the
  * Scala compiler emits a static forwarder that generated Java code can
  * call directly (`graft.functions.HyperplaneSigKernel.compute(...)`).
  *
  * Bit-exact twin of the Column-DSL formulation it replaced
  * (`aggregate(zip_with(vec, dims, x*planeSign))` with
  * `planeSign = xxhash64(lit(j), i) & 1 → ±1.0`): same xxhash64 fold
  * (seed 42, hashInt(j) then hashInt(i)), same ascending-i addition
  * order, so signatures are reproducible across the engine versions.
  * The HOF version walked the array once per plane through interpreted
  * lambda frames — 32 planes × dims allocations per row; this is one
  * compiled loop nest.
  */
object HyperplaneSigKernel {
  final val Seed = 42L

  def compute(arr: ArrayData, bits: Int): Long = {
    val n = arr.numElements()
    var sig = 0L
    var j = 0
    while (j < bits) {
      val seedJ = XXH64.hashInt(j, Seed)
      var s = 0.0
      var i = 0
      while (i < n) {
        val x = arr.getFloat(i).toDouble
        s += (if ((XXH64.hashInt(i, seedJ) & 1L) == 1L) x else -x)
        i += 1
      }
      if (s > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }
}

/** `bits`-bit random-hyperplane signature (SimHash for vectors) over an
  * array<float> column, computed in one codegen'd pass. The hyperplane
  * matrix is never materialized: sign(j, i) = ±1 from xxhash64.
  */
case class HyperplaneSig(child: Expression, bits: Int)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(v: Any): Any =
    HyperplaneSigKernel.compute(v.asInstanceOf[ArrayData], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.HyperplaneSigKernel.compute($x, $bits);")

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSig =
    copy(child = newChild)
}

object VecFunctions {
  import org.apache.spark.sql.graftbridge.Bridge

  /** Σ a[i]·b[i] over two array<float> columns, whole-stage-codegen'd. */
  def vec_dot(a: Column, b: Column): Column =
    Bridge.column(FloatVecDot(Bridge.expression(a), Bridge.expression(b)))

  /** Random-hyperplane LSH signature of an array<float> column. */
  def hyperplane_sig(v: Column, bits: Int): Column =
    Bridge.column(HyperplaneSig(Bridge.expression(v), bits))
}
