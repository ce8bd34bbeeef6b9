package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native codegen dot product of two float-array columns, accumulated
  * left-to-right in double — bit-identical to the higher-order
  * aggregate(zip_with(...)) formulation but ~50-100× faster: HOF lambdas are
  * CodegenFallback (interpreted per element); this is a primitive loop
  * inside whole-stage codegen. The hot kernel of brute-force and LSH cosine
  * similarity search (graft.sim.Similarity).
  */
case class DotF32Expr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "dot_f32"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |double $acc = 0.0;
         |final int $n = java.lang.Math.min($l.numElements(), $r.numElements());
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double) $l.getFloat($i) * (double) $r.getFloat($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DotF32Expr {
  def dotF32(a: Column, b: Column): Column =
    GraftColumnBridge.column(DotF32Expr(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
