package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{BooleanType, DataType}

/** Native Catalyst expression: even-odd ray-casting point-in-polygon over a
  * pre-flattened edge array `array<struct<ax,ay,bx,by>>` (all rings of a
  * multipolygon — the even-odd rule handles holes and multiple parts in one
  * parity pass).
  *
  * This is the engine's hot refinement predicate (the exact stage after the
  * cell-join candidate prune — reference semantics ParcelLayer.set_zones,
  * catatom2osm/geo/layer/parcel.py:91-114). A native expression with
  * doGenCode keeps the whole candidate-filter stage inside whole-stage
  * codegen: no typed-object Encoders, no UDF boxing, primitive array reads.
  */
case class PointInPolygonExpr(px: Expression, py: Expression, edges: Expression)
    extends TernaryExpression {

  override def first: Expression = px
  override def second: Expression = py
  override def third: Expression = edges
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "point_in_polygon"

  override def nullSafeEval(pxV: Any, pyV: Any, edgesV: Any): Any = {
    val x = pxV.asInstanceOf[Double]
    val y = pyV.asInstanceOf[Double]
    val arr = edgesV.asInstanceOf[ArrayData]
    var inside = false
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val e = arr.getStruct(i, 4)
      val ay = e.getDouble(1); val by = e.getDouble(3)
      if ((ay > y) != (by > y)) {
        val ax = e.getDouble(0); val bx = e.getDouble(2)
        val xInt = (bx - ax) * (y - ay) / (by - ay) + ax
        if (x < xInt) inside = !inside
      }
      i += 1
    }
    inside
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (pxC, pyC, edgesC) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val e = ctx.freshName("e")
      val ay = ctx.freshName("ay")
      val by = ctx.freshName("by")
      val ax = ctx.freshName("ax")
      val bx = ctx.freshName("bx")
      val xInt = ctx.freshName("xInt")
      s"""
         |boolean ${ev.value}_acc = false;
         |final int $n = $edgesC.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  final InternalRow $e = $edgesC.getStruct($i, 4);
         |  final double $ay = $e.getDouble(1);
         |  final double $by = $e.getDouble(3);
         |  if (($ay > $pyC) != ($by > $pyC)) {
         |    final double $ax = $e.getDouble(0);
         |    final double $bx = $e.getDouble(2);
         |    final double $xInt = ($bx - $ax) * ($pyC - $ay) / ($by - $ay) + $ax;
         |    if ($pxC < $xInt) ${ev.value}_acc = !${ev.value}_acc;
         |  }
         |}
         |${ev.value} = ${ev.value}_acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(px = newFirst, py = newSecond, edges = newThird)
}

object PointInPolygonExpr {
  import org.apache.spark.sql.GraftColumnBridge

  /** Column-level entry: point_in_polygon(x, y, edges). */
  def pointInPolygon(px: Column, py: Column, edges: Column): Column =
    GraftColumnBridge.column(PointInPolygonExpr(
      GraftColumnBridge.expression(px),
      GraftColumnBridge.expression(py),
      GraftColumnBridge.expression(edges)))
}
