package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Order-isomorphic DOUBLE <-> BIGINT bijection — the bridge that lets a
  * double-valued score ride the engine's bounded long-pair heap
  * ([[TopKPairs]]) with ZERO precision loss.
  *
  * Why not integer-micro quantization: any fixed-point scaling collapses
  * close scores into one bucket, so a quantized heap can select or rank
  * different neighbors than an exact double ordering — and the driver's
  * DuckDB oracles rank by the exact double. The IEEE-754 trick instead
  * maps the FULL bit pattern: for d >= 0 the raw sign-magnitude bits
  * already ascend with d; for d < 0 they ascend with |d| (descend with d),
  * so mapping negative-sign bit patterns `b -> Long.MinValue - b` reflects
  * them into [-mag] space. The resulting signed-long order equals the
  * double order on all finite doubles (+0.0 and -0.0 both map to 0 —
  * equal doubles, equal keys), the map is an involution (one
  * function is its own inverse on the bits domain), and round-tripping
  * reproduces the EXACT input double. NaN maps above +Infinity; scores in
  * graft are finite by construction.
  */
case class DoubleOrderedBits(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any = {
    val b = java.lang.Double.doubleToLongBits(input.asInstanceOf[Double])
    if (b < 0L) java.lang.Long.MIN_VALUE - b else b
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, d => {
      val b = ctx.freshName("bits")
      s"""
        long $b = java.lang.Double.doubleToLongBits($d);
        ${ev.value} = ($b < 0L) ? (java.lang.Long.MIN_VALUE - $b) : $b;
      """
    })

  override protected def withNewChildInternal(c: Expression): DoubleOrderedBits =
    copy(child = c)
  override def prettyName: String = "double_ordered_bits"
}

/** Inverse of [[DoubleOrderedBits]]: recover the exact original double from
  * its order-isomorphic long key (the bits map is an involution, so the
  * same reflection undoes itself). */
case class OrderedBitsDouble(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[Long]
    val b = if (s < 0L) java.lang.Long.MIN_VALUE - s else s
    java.lang.Double.longBitsToDouble(b)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val b = ctx.freshName("bits")
      s"""
        long $b = ($s < 0L) ? (java.lang.Long.MIN_VALUE - $s) : $s;
        ${ev.value} = java.lang.Double.longBitsToDouble($b);
      """
    })

  override protected def withNewChildInternal(c: Expression): OrderedBitsDouble =
    copy(child = c)
  override def prettyName: String = "ordered_bits_double"
}

object OrderedBits {
  /** Order-preserving long key for a double column (exact, invertible). */
  def toBits(c: Column): Column = GraftShims.column(
    DoubleOrderedBits(GraftShims.expression(c)))

  /** Exact inverse of [[toBits]]. */
  def toDouble(c: Column): Column = GraftShims.column(
    OrderedBitsDouble(GraftShims.expression(c)))
}
