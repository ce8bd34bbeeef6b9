package graft.ops

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import graft.geom.Pt

/** Typed geometry-union Aggregator (the reference's
  * Geometry.merge_adjacent_features fold, geometry.py:107-118, as a proper
  * Spark Aggregator — SURVEY §2.8's "one custom Aggregator[Geom,Geom,Geom]").
  *
  * Buffer = net directed-edge multiset. Adjacent CCW rings traverse a shared
  * wall in opposite directions, so reduce/merge cancel opposite edges; the
  * finish step chains surviving edges into boundary rings. Commutative and
  * associative by construction (multiset addition with cancellation), so
  * map-side partial aggregation is safe — unlike a fold over a GEOS union,
  * which the reference runs sequentially on one core.
  *
  * Contract: inputs are edge-snapped polygons (run Topology.repair first),
  * each ring CCW — exactly what the reference guarantees before merging.
  */
class GeomUnionAgg extends Aggregator[Array[Pt], Map[(Double, Double, Double, Double), Int], Array[Array[Pt]]] {

  type Buf = Map[(Double, Double, Double, Double), Int]

  private def addEdge(b: Buf, ax: Double, ay: Double, bx: Double, by: Double, n: Int): Buf = {
    if (n == 0) return b
    val rev = (bx, by, ax, ay)
    val revCount = b.getOrElse(rev, 0)
    if (revCount > 0) {
      val cancel = math.min(revCount, n)
      val b2 = if (revCount - cancel == 0) b - rev else b + (rev -> (revCount - cancel))
      addEdge(b2, ax, ay, bx, by, n - cancel)
    } else {
      val key = (ax, ay, bx, by)
      b + (key -> (b.getOrElse(key, 0) + n))
    }
  }

  override def zero: Buf = Map.empty

  override def reduce(b: Buf, ring: Array[Pt]): Buf = {
    var acc = b
    val n = ring.length
    var i = 0
    while (i < n) {
      val a = ring(i); val c = ring((i + 1) % n)
      acc = addEdge(acc, a.x, a.y, c.x, c.y, 1)
      i += 1
    }
    acc
  }

  override def merge(b1: Buf, b2: Buf): Buf =
    b2.foldLeft(b1) { case (acc, ((ax, ay, bx, by), n)) => addEdge(acc, ax, ay, bx, by, n) }

  override def finish(b: Buf): Array[Array[Pt]] =
    Adjacency.assembleRings(
      b.toSeq.flatMap { case ((ax, ay, bx, by), n) =>
        Seq.fill(n)((Pt(ax, ay), Pt(bx, by)))
      }).toArray

  override def bufferEncoder: Encoder[Buf] = Encoders.kryo[Buf]
  override def outputEncoder: Encoder[Array[Array[Pt]]] = ExpressionEncoder()
}
