package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.layers.SynthMuni
import graft.sources.OsmOut

/** Dataset-native multi-municipality orchestration (VERDICT r2 item 1):
  * N municipalities flow through AppRun.runMulti together; the result must
  * equal N independent runs (municipality isolation), and the emitted task
  * documents must be complete, well-formed OSM files.
  */
class AppRunMultiSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.001"

  lazy val multi: AppRun.MultiResult = {
    val (cons, parcels, addrs) = SynthMuni.inputs(spark, sf)
    AppRun.runMulti(spark, cons, parcels, addrs, SynthMuni.munOf)
  }

  test("municipality isolation: joint run == per-mun runs (metrics)") {
    import spark.implicits._
    val (cons, parcels, addrs) = SynthMuni.inputs(spark, sf)
    val solo = AppRun.runMulti(spark,
      cons.filter(_.mun == "M2"), parcels.filter(_.mun == "M2"),
      addrs.filter(_.mun == "M2"), SynthMuni.munOf)
    val jointM2 = multi.metrics.filter(_._1 == "M2").toSet
    assert(solo.metrics.toSet === jointM2,
      s"solo=${solo.metrics.toSet}\njoint=$jointM2")
    // and the task docs for M2 are byte-identical between the two runs
    val soloDocs = solo.taskDocs.collect().map(d => d.label -> d.xml).toMap
    val jointDocs = multi.taskDocs.filter(_.mun == "M2").collect()
      .map(d => d.label -> d.xml).toMap
    assert(soloDocs === jointDocs)
  }

  test("per-mun metrics close the conservation laws") {
    for (m <- Seq("M0", "M1", "M2", "M3")) {
      val r = new Report
      multi.metrics.filter(_._1 == m).foreach { case (_, k, v) => r.set(k, v) }
      assert(r.validate().isEmpty, s"$m: ${r.validate()} values=${r.values}")
    }
  }

  test("task docs are complete OSM documents with the addresses attached") {
    val docs = multi.taskDocs.collect()
    assert(docs.nonEmpty)
    for (d <- docs) {
      val (ns, ws, rels) = OsmOut.parseOsm(d.xml)
      // every cluster doc carries its 5 building ways (disjoint unit squares
      // never form relations) and 5 address nodes
      assert(ws.count(_.tags.contains("building")) === 5, d.label)
      assert(rels.isEmpty, d.label)
      assert(ns.count(_.tags.contains("addr:ref")) === 5, d.label)
      val nodeIds = ns.map(_.id).toSet
      assert(ws.forall(_.ndRefs.forall(nodeIds.contains)), s"dangling refs in ${d.label}")
    }
  }

  test("entrances moved EXACTLY onto their wall; parcel addresses untouched") {
    import spark.implicits._
    val rows = multi.addressesOut
      .select("localId", "spec", "x", "y")
      .as[(String, String, Double, Double)].collect()
    assert(rows.nonEmpty)
    for ((lid, spec, x, y) <- rows) {
      val id = lid.drop(1).toLong // "A<id>"
      val k = id / 4; val c = k / 5; val s = k % 5; val m = id % 4
      val x0 = c * 500.0 + s * 5.0; val y0 = m * 100000.0
      if (k % 2 == 0) {
        assert(spec === "Entrance", lid)
        assert(x === x0 && y === y0 + 0.5, s"$lid moved to ($x,$y)") // exact
      } else {
        assert(spec === "Parcel", lid)
        assert(x === x0 + 0.5 && y === y0 + 0.5, lid)
      }
    }
  }

  test("task map is a fixpoint onto surviving parcels") {
    import spark.implicits._
    val tm = multi.taskMap.as[(String, String)].collect().toMap
    val survivors = multi.parcels.collect().map(_.parcel.localId).toSet
    for ((from, to) <- tm) {
      assert(survivors.contains(to), s"$from -> $to not a survivor")
      assert(tm.getOrElse(to, to) === to, s"$to not a fixpoint")
    }
  }

  test("nMuns parameterization holds per-mun work constant (weak scaling)") {
    import spark.implicits._
    def perMun(n: Int): Map[String, Long] = {
      val (cons, _, _) = graft.layers.SynthMuni
        .inputs(spark, graft.TestSpark.sf001, nMuns = n)
      cons.map(_.mun).groupByKey(identity).count().collect().toMap
    }
    val m2 = perMun(2)
    val m8 = perMun(8)
    assert(m2.keySet === Set("M0", "M1"))
    assert(m8.keySet === (0 until 8).map(i => s"M$i").toSet)
    // municipalities scale out, the per-mun feature count does not move
    assert(m2.values.toSet.size === 1 && m8.values.toSet.size === 1)
    assert(m2("M0") === m8("M0"))
    // wide id scheme past the single-digit slot: 12 muns, same invariants
    val m12 = perMun(12)
    assert(m12.keySet === (0 until 12).map(i => f"M$i%02d").toSet)
    assert(m12.values.toSet.size === 1 && m12("M00") === m2("M0"))
  }

  test("wide scheme (nMuns>9) runs the full DAG with per-mun closed forms") {
    import spark.implicits._
    val n = 12
    val (cons, parcels, addrs) = graft.layers.SynthMuni
      .inputs(spark, graft.TestSpark.sf001, nMuns = n)
    val mr = graft.pipeline.AppRun.runMulti(
      spark, cons, parcels, addrs, graft.layers.SynthMuni.munOfFor(n))
    mr.taskDocs.count() // materialize
    val byMun = mr.metrics.groupBy(_._1)
    assert(byMun.keySet === (0 until n).map(i => f"M$i%02d").toSet)
    // same closed forms as the 4-mun oracle: out_features = 5t per mun
    val t = spark.read.parquet(s"${graft.TestSpark.sf001}/events.parquet")
      .count() / 100
    for ((m, rows) <- byMun) {
      val v = rows.map(r => r._2 -> r._3).toMap
      assert(v("out_features") === 5 * t, s"$m")
      assert(v("tasks") === t, s"$m")
      assert(v("out_address") === 5 * t, s"$m")
    }
    graft.CacheBin.drain()
  }
}
