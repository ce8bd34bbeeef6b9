package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expression: hexagonal cell id of a planar point
  * (HexGrid's axial + cube-rounding encode) as ONE straight-line codegen
  * block where every intermediate (qf, rf, sf, the three roundings, the
  * three rounding errors) is computed exactly once.
  *
  * Why native: the pure-Column formulation duplicates the qf/rf/sf
  * subtrees ~20x through the nested CASE (Catalyst does not CSE inside
  * conditional branches), and the expanded tree is big enough that in
  * join/aggregate contexts the generated method blows past the JIT's
  * huge-method limit — measured 100x slower (70 s vs 0.7 s for a 40M-row
  * groupBy at local[8]) with task threads pinned in interpreted
  * `hashAgg_doAggregateWithKeys`. The straight-line block keeps the whole
  * stage JIT-compilable at any surrounding plan shape.
  *
  * PARITY: the arithmetic order below is byte-for-byte the order of
  * HexGrid.cellOf (the Scala mirror) and HexGrid.cellSqlCtes (the DuckDB
  * mirror); constants are the same binary64 values (Double.toString
  * round-trip in Java source exactly like in SQL text). HexGridSpec pins
  * column==Scala and column==SQL-text equality over the fixture corpus.
  */
case class HexCellExpr(x: Expression, y: Expression, size: Double)
    extends BinaryExpression {

  override def left: Expression = x
  override def right: Expression = y
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "hex_cell"

  override def nullSafeEval(xV: Any, yV: Any): Any =
    graft.spatial.HexGrid.cellOf(xV.asInstanceOf[Double], yV.asInstanceOf[Double], size)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (xC, yC) => {
      val c = graft.spatial.HexGrid.Consts(size)
      val qf = ctx.freshName("qf"); val rf = ctx.freshName("rf")
      val sf = ctx.freshName("sf")
      val rq = ctx.freshName("rq"); val rs = ctx.freshName("rs")
      val rr = ctx.freshName("rr")
      val dq = ctx.freshName("dq"); val ds = ctx.freshName("ds")
      val dr = ctx.freshName("dr")
      val q = ctx.freshName("q"); val r = ctx.freshName("r")
      s"""
         |final double $qf = $xC * ${c.qx} + $yC * ${c.qy};
         |final double $rf = $yC * ${c.ry};
         |final double $sf = -$qf - $rf;
         |final double $rq = Math.floor($qf + 0.5);
         |final double $rs = Math.floor($sf + 0.5);
         |final double $rr = Math.floor($rf + 0.5);
         |final double $dq = Math.abs($rq - $qf);
         |final double $ds = Math.abs($rs - $sf);
         |final double $dr = Math.abs($rr - $rf);
         |final double $q = ($dq > $ds && $dq > $dr) ? (-$rs - $rr) : $rq;
         |final double $r = (!($dq > $ds && $dq > $dr) && !($ds > $dr)) ? (-$rq - $rs) : $rr;
         |${ev.value} = (long) (($q + ${graft.spatial.HexGrid.Bias}.0) * ${graft.spatial.HexGrid.Stride}.0 + ($r + ${graft.spatial.HexGrid.Bias}.0));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(x = newLeft, y = newRight)
}

object HexCellExpr {
  import org.apache.spark.sql.GraftColumnBridge

  /** Column-level entry: hex_cell(x, y) at circumradius `size`. */
  def hexCell(x: Column, y: Column, size: Double): Column =
    GraftColumnBridge.column(HexCellExpr(
      GraftColumnBridge.expression(x), GraftColumnBridge.expression(y), size))
}
