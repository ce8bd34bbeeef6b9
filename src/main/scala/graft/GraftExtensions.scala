package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{DotF32Expr, HexCellExpr, MinHashSigExpr, PointInPolygonExpr}

/** SparkSessionExtensions registering the engine's native expressions as
  * SQL functions, so `spark.sql("... point_in_polygon(x, y, edges) ...")`
  * works next to the Scala Column API. Install with
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {
  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "built-in")

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("point_in_polygon"),
      info("point_in_polygon", "point_in_polygon(x, y, edges) - ray-cast PIP over edge array"),
      (args: Seq[Expression]) => PointInPolygonExpr(args(0), args(1), args(2))),
    (FunctionIdentifier("dot_f32"),
      info("dot_f32", "dot_f32(a, b) - double dot product of float arrays"),
      (args: Seq[Expression]) => DotF32Expr(args(0), args(1))),
    (FunctionIdentifier("minhash_sig"),
      info("minhash_sig", "minhash_sig(shingles, nPerm) - MinHash signature"),
      (args: Seq[Expression]) => {
        val n = args(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => other.eval().asInstanceOf[Int]
        }
        MinHashSigExpr(args(0), n)
      }),
    (FunctionIdentifier("hex_cell"),
      info("hex_cell", "hex_cell(x, y, size) - hexagonal cell id at circumradius size"),
      (args: Seq[Expression]) => {
        val size = args(2) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Double, _) => v
          case other => other.eval() match {
            case d: Double => d
            case dec: org.apache.spark.sql.types.Decimal => dec.toDouble
            case i: Int => i.toDouble
            case l: Long => l.toDouble
          }
        }
        HexCellExpr(args(0), args(1), size)
      }))

  /** Install into an already-built session (the extensions class covers
    * spark-submit's spark.sql.extensions path; this covers notebooks/tests). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (id, inf, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, inf, builder)
    }
}
