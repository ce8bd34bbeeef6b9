package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.geom.Pt
import graft.sources.InspireGml

/** Replays AddressLayer golden tests on the reference's own fixtures:
  * test_conflate (14→10, idempotent; test_address.py:115-125) and
  * test_get_names (the full expected translation table,
  * test_address.py:127-149, over address/highway/place.geojson). */
class AddressNamesGoldenSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val fx = "/root/reference/test/fixtures"

  test("reference golden: address conflate 14 -> 10, idempotent") {
    val ads = InspireGml.resolvedAddresses(spark, s"$fx/address.gml")
      .select("localId", "TN_text", "designator").collect()
      .map(r => (r.getString(0), Option(r.getString(1)).getOrElse(""), r.getString(2)))
      .toSeq
    assert(ads.length === 14)
    val current = Set("CJ CALLEJON (FASNIA)12", "CJ CALLEJON (FASNIA)13")
    val once = AddressNames.conflateAddresses(ads, current)
    assert(once.length === 10, s"got ${once.length}")
    assert(AddressNames.conflateAddresses(once, current).length === 10)
  }

  test("reference golden: get_names translation table") {
    val addresses = spark.read.option("multiLine", true).json(s"$fx/address.geojson")
      .select(explode(col("features")).as("f"))
      .select(col("f.properties.TN_text").as("tn"),
        col("f.geometry.coordinates").as("c"))
      .collect()
      .map(r => (r.getAs[String]("tn"),
        Pt(r.getSeq[Double](1).head, r.getSeq[Double](1)(1))))
      .toSeq
    val highways = AddressNames.loadNamed(spark, s"$fx/highway.geojson")
    val places = AddressNames.loadNamed(spark, s"$fx/place.geojson")
    val got = AddressNames.getNames(addresses, highways, places)
    val golden = Map(
      "AV PAZ (FASNIA)" -> (("Avenida la Paz", "OSM")),
      "CL SAN JOAQUIN (FASNIA)" -> (("Calle San Joaquín", "OSM")),
      "CL HOYO (FASNIA)" -> (("Calle el Hoyo", "OSM")),
      "CJ CALLEJON (FASNIA)" -> (("Calleja/Callejón Callejon (Fasnia)", "CAT")),
      "PZ FRANCISCO DELGADO" -> (("squarePlaza Francisco Delgado y Diaz Flores", "OSM")),
      "UR PRUEBA" -> (("Urbanización de prueba", "OSM")),
      "PZ CONSTITUCION (FASNIA)" -> (("squarePlaza de la Constitución", "OSM")),
      "PZ PRUEBA" -> (("Plaza Prueba", "OSM")))
    for ((k, v) <- got) {
      assert(golden.contains(k), s"unexpected street $k -> $v")
      assert(v === golden(k), s"$k")
    }
  }

  test("Dataset get_names path reproduces the Seq kernel's full table") {
    import spark.implicits._
    val addresses = spark.read.option("multiLine", true).json(s"$fx/address.geojson")
      .select(explode(col("features")).as("f"))
      .select(col("f.properties.TN_text").as("tn"),
        col("f.geometry.coordinates").as("c"))
      .collect()
      .map(r => (r.getAs[String]("tn"),
        Pt(r.getSeq[Double](1).head, r.getSeq[Double](1)(1))))
      .toSeq
    val highways = AddressNames.loadNamed(spark, s"$fx/highway.geojson")
    val places = AddressNames.loadNamed(spark, s"$fx/place.geojson")
    val expect = AddressNames.getNames(addresses, highways, places)

    val addrDs = spark.createDataset(addresses.map(a => (a._1, a._2.x, a._2.y)))
    val namedDs = spark.createDataset(
      highways.zipWithIndex.map { case (n, i) =>
        AddressNames.NamedRow("highway", i.toLong, n.name,
          n.bbox.xmin, n.bbox.ymin, n.bbox.xmax, n.bbox.ymax) } ++
      places.zipWithIndex.map { case (n, i) =>
        AddressNames.NamedRow("place", i.toLong, n.name,
          n.bbox.xmin, n.bbox.ymin, n.bbox.xmax, n.bbox.ymax) })
    val got = AddressNames.getNamesD(addrDs, namedDs)
      .as[(String, String, String)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(got === expect)
    // and the Dataset path is partitioning-invariant
    val got8 = AddressNames.getNamesD(addrDs.repartition(8), namedDs.repartition(5))
      .as[(String, String, String)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(got8 === expect)
  }
}
