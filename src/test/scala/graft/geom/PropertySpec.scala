package graft.geom

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import graft.clean.PolygonClean
import graft.ops.Adjacency
import graft.text.TextFns

/** Property-based checks (ScalaCheck) — the metamorphic/conservation-law
  * style SURVEY §5 calls for. Run through Prop + Test.check directly. */
class PropertySpec extends AnyFunSuite {
  private val params = SCTest.Parameters.default.withMinSuccessfulTests(200)
  private def holds(p: Prop): Unit = {
    val r = SCTest.check(params, p)
    assert(r.passed, r.status.toString)
  }

  private val coord = Gen.chooseNum(-1000.0, 1000.0).map(v => math.rint(v * 100) / 100)
  private val ringGen: Gen[Array[Pt]] = for {
    cx <- coord; cy <- coord
    n <- Gen.chooseNum(3, 12)
    radii <- Gen.listOfN(n, Gen.chooseNum(1.0, 50.0))
  } yield radii.zipWithIndex.map { case (r, i) =>
    val a = 2 * math.Pi * i / n
    Pt(cx + r * math.cos(a), cy + r * math.sin(a)) // star polygon, CCW, simple
  }.toArray

  test("shoelace area: invariant under rotation of ring start; negates under reversal") {
    holds(Prop.forAll(ringGen, Gen.chooseNum(0, 11)) { (ring, k) =>
      val rot = ring.drop(k % ring.length) ++ ring.take(k % ring.length)
      math.abs(Geom.signedArea(rot) - Geom.signedArea(ring)) < 1e-6 &&
        math.abs(Geom.signedArea(ring.reverse) + Geom.signedArea(ring)) < 1e-6
    })
  }

  test("PIP on diamonds agrees with the |dx|+|dy| rule away from the boundary") {
    val g = for {
      cx <- coord; cy <- coord
      r <- Gen.chooseNum(1.0, 40.0)
      px <- coord; py <- coord
    } yield (cx, cy, r, px, py)
    holds(Prop.forAll(g) { case (cx, cy, r, px, py) =>
      val d = math.abs(px - cx) + math.abs(py - cy)
      val ring = Array(Pt(cx + r, cy), Pt(cx, cy + r), Pt(cx - r, cy), Pt(cx, cy - r))
      if (math.abs(d - r) < 1e-6) true // boundary: undefined, skip
      else Geom.pointInRing(Pt(px, py), ring) == (d < r)
    })
  }

  test("closestSegment distance never exceeds closestVertex distance") {
    holds(Prop.forAll(ringGen, coord, coord) { (ring, px, py) =>
      val mp: Geom.MultiPolygon = Array(Array(ring))
      val segD2 = Geom.closestSegment(Pt(px, py), mp)._1
      val vtxD2 = Geom.closestVertex(Pt(px, py), mp)._5
      segD2 <= vtxD2 + 1e-9
    })
  }

  test("mergeCloseVertices and simplifyRing are idempotent") {
    holds(Prop.forAll(ringGen) { ring =>
      val m1 = PolygonClean.mergeCloseVertices(ring)
      val s1 = PolygonClean.simplifyRing(m1)
      PolygonClean.mergeCloseVertices(m1).toSeq == m1.toSeq &&
        PolygonClean.simplifyRing(s1).toSeq == s1.toSeq
    })
  }

  test("simplify only ever removes near-straight vertices: area drift bounded") {
    holds(Prop.forAll(ringGen) { ring =>
      val s = PolygonClean.simplifyRing(ring)
      val removed = ring.length - s.length
      // non-corner rule is (deviation <= 2°) OR (cath <= cathThr): a removed
      // vertex lies within max(cathThr, sin(2°+slack)·perim/2) of its chord,
      // so each removal moves area by at most 0.5·perim·that height
      val perim = ring.indices.map(i => ring(i).dist(ring((i + 1) % ring.length))).sum
      val maxH = math.max(Geom.DistThr, math.sin(math.toRadians(2.1)) * perim / 2)
      math.abs(Geom.ringArea(s) - Geom.ringArea(ring)) <=
        removed * 0.5 * perim * maxH + 1e-9
    })
  }

  test("levenshtein: identity zero, symmetric, bounded by max length") {
    val s = Gen.alphaStr.map(_.take(30))
    holds(Prop.forAll(s, s) { (a, b) =>
      TextFns.levenshteinDist(a, a) == 0 &&
        TextFns.levenshteinDist(a, b) == TextFns.levenshteinDist(b, a) &&
        TextFns.levenshteinDist(a, b) <= math.max(a.length, b.length)
    })
  }

  test("tokenSortRatio: 100 on permuted tokens, symmetric") {
    val words = Gen.listOfN(4, Gen.alphaLowerStr.suchThat(_.nonEmpty).map(_.take(6)))
    holds(Prop.forAll(words) { ws =>
      val a = ws.mkString(" ")
      val b = scala.util.Random.javaRandomToRandom(new java.util.Random(42)).shuffle(ws).mkString(" ")
      TextFns.tokenSortRatio(a, b) == 100 &&
        TextFns.tokenSortRatio(a, b) == TextFns.tokenSortRatio(b, a)
    })
  }

  test("greedy pack: no tile exceeds cap when every parcel fits") {
    val parcels = Gen.listOfN(40, Gen.zip(Gen.posNum[Long], Gen.chooseNum(1L, 20L)))
    holds(Prop.forAll(parcels) { ps =>
      val sorted = ps.distinctBy(_._1).sortBy(_._1)
      var tile = 0L; var acc = 0L
      val assign = sorted.map { case (pid, parts) =>
        if (acc + parts > 20 && acc > 0) { tile += 1; acc = 0 }
        acc += parts
        (pid, tile, parts)
      }
      assign.groupBy(_._2).values.forall(_.map(_._3).sum <= 20)
    })
  }

  test("union of k adjacent squares always has area k*s^2 and 4 corners") {
    val g = Gen.chooseNum(1, 6)
    holds(Prop.forAll(g, Gen.chooseNum(1.0, 20.0)) { (k, s) =>
      val edges = (0 until k).flatMap { j =>
        val ring = Array(Pt(j * s, 0), Pt((j + 1) * s, 0), Pt((j + 1) * s, s), Pt(j * s, s))
        ring.indices.map(i => (ring(i), ring((i + 1) % 4)))
      }
      // cancel opposite pairs then assemble
      val net = edges.groupBy(identity).view.mapValues(_.size).toMap
      val boundary = edges.filter { case (a, b) => !net.contains((b, a)) }
      val rings = Adjacency.assembleRings(boundary)
      val area = rings.map(Geom.ringArea).sum
      val simplified = rings.map(r => PolygonClean.simplifyRing(r))
      math.abs(area - k * s * s) < 1e-6 && simplified.map(_.length).sum == 4
    })
  }
}
