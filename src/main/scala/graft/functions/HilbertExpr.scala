package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Hilbert-curve index of a 2-D cell: maps (x, y) ∈ [0, 2ᵇ)² to the
  * cell's distance along the order-b Hilbert curve (the classic
  * reflect-and-rotate xy2d bit walk, public domain).
  *
  * Used by [[graft.operators.Layout]] as the clustering key alternative
  * to the Morton/Z-order interleave: the Hilbert curve has no "seams" —
  * consecutive curve positions are always 4-adjacent cells, where the
  * Z-curve jumps across the space at every power-of-two boundary — so
  * per-file bounding boxes are tighter and a 2-D range predicate
  * overlaps fewer files. The iterative rotate/reflect state is why this
  * is a compiled Catalyst expression rather than a Column formula: the
  * per-bit carried (x, y) rewrite has no non-exploding closed form in
  * plain column algebra, while here it is one whole-stage-codegen'd
  * loop per row.
  */
case class HilbertIndexExpr(left: Expression, right: Expression, bits: Int)
  extends BinaryExpression {

  require(bits >= 1 && bits <= 31, s"hilbert bits out of range: $bits")

  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable || right.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (IntegerType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_hilbert requires (int, int), got (${l.simpleString}, ${r.simpleString})")
    }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def nullSafeEval(a: Any, b: Any): Any =
    HilbertIndexExpr.xy2d(a.asInstanceOf[Int], b.asInstanceOf[Int], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (xv, yv) => {
      val x = ctx.freshName("hx")
      val y = ctx.freshName("hy")
      val d = ctx.freshName("hd")
      val s = ctx.freshName("hs")
      val rx = ctx.freshName("hrx")
      val ry = ctx.freshName("hry")
      val t = ctx.freshName("ht")
      s"""
         |long $x = (long) $xv;
         |long $y = (long) $yv;
         |long $d = 0L;
         |for (long $s = 1L << ${bits - 1}; $s > 0; $s >>= 1) {
         |  long $rx = (($x & $s) > 0) ? 1L : 0L;
         |  long $ry = (($y & $s) > 0) ? 1L : 0L;
         |  $d += $s * $s * ((3L * $rx) ^ $ry);
         |  if ($ry == 0L) {
         |    if ($rx == 1L) {
         |      $x = $s - 1L - $x;
         |      $y = $s - 1L - $y;
         |    }
         |    long $t = $x; $x = $y; $y = $t;
         |  }
         |}
         |${ev.value} = $d;
       """.stripMargin
    })
}

object HilbertIndexExpr {

  /** Interpreted twin of the generated loop (and the spec reference). */
  def xy2d(x0: Int, y0: Int, bits: Int): Long = {
    var x = x0.toLong
    var y = y0.toLong
    var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0L) {
        if (rx == 1L) {
          x = s - 1L - x
          y = s - 1L - y
        }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  def hilbertc(x: Column, y: Column, bits: Int): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(HilbertIndexExpr(
      ColumnBridge.expression(x), ColumnBridge.expression(y), bits))
  }
}
