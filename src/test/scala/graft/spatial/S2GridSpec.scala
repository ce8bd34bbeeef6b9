package graft.spatial

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class S2GridSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("Scala cellOf mirrors the Catalyst cellCol exactly (level 13 and 6)") {
    import spark.implicits._
    val tags = SynthGeo.geoTags(spark, TestSpark.sf001)
    for (level <- Seq(6, 13)) {
      val viaCol = tags.withColumn("cell", S2Grid.cellCol(col("lat"), col("lon"), level))
        .select("id", "cell").as[(Long, Long)].collect().toMap
      val viaScala = tags.select("id", "lat", "lon").as[(Long, Double, Double)]
        .collect().map { case (id, la, lo) => (id, S2Grid.cellOf(la, lo, level)) }.toMap
      assert(viaCol === viaScala, s"level=$level")
    }
  }

  test("parent at a coarser level is one shift (13 -> 6, every fixture point)") {
    import spark.implicits._
    val pts = SynthGeo.geoTags(spark, TestSpark.sf001)
      .select("lat", "lon").as[(Double, Double)].collect()
    val extra = SynthGeo.geoRegionParams.map { case (_, la, lo, _) => (la, lo) }
    for ((la, lo) <- pts ++ extra)
      assert(S2Grid.cellOf(la, lo, 13) >> 14 === S2Grid.cellOf(la, lo, 6), s"($la,$lo)")
  }

  test("synthetic geotag corpus exercises all 6 cube faces") {
    import spark.implicits._
    val faces = SynthGeo.geoTags(spark, TestSpark.sf001)
      .select(shiftright(S2Grid.cellCol(col("lat"), col("lon"), 13), 26).as("face"))
      .distinct().as[Long].collect().toSet
    assert(faces === Set(0L, 1L, 2L, 3L, 4L, 5L))
  }

  test("oracle fp-margin guard: every floor/face boundary margin dwarfs the libm drift bound (10x sf0.1 id range)") {
    // Both engines feed cos/sin the BIT-IDENTICAL argument (one multiply
    // by S2Grid.DegToRad), so the <=1-ulp-of-result libm contract makes
    // the drift in u/v RELATIVE: |delta c| <= ~|c| * 5e-16. The guard
    // allows a 20x-of-that drift envelope and requires every boundary
    // margin to exceed it 100-fold. Ids 0..1M cover every event_id the
    // sf0.001..sf1 fixtures can produce (sf0.1 tops out at 99_999).
    var minRatio = Double.MaxValue
    var minGapRatio = Double.MaxValue
    var id = 0L
    while (id < 1000000L) {
      val lat = (id * 7919L % 17600L) / 100.0 - 88.005
      val lon = (id * 104729L % 36000L) / 100.0 - 179.995
      val (_, u, v) = S2Grid.faceUvOf(lat, lon)
      for (c <- Seq(u, v)) {
        val x = (c + 1.0) / 2.0 * 8192.0
        val frac = x - math.floor(x)
        val drift = 8192.0 / 2.0 * math.abs(c) * 1e-14 // 20-ulp relative envelope, scaled
        if (frac == 0.0)
          // exactly-on-boundary is drift-proof ONLY while |c| stays clear
          // below the half-ulp of 1.0 (1.11e-16): then (c + 1.0) == 1.0
          // exactly for both engines' c (lat==0/lon==0 give +-0.0;
          // lon==+-180 gives ~4e-18; lon==+-90 gives cos(pi/2) ~ 6.1e-17,
          // whose relative drift cannot reach the threshold)
          assert(math.abs(c) < 1e-16, s"id=$id rounded value on a cell boundary (c=$c)")
        else minRatio = math.min(minRatio, math.min(frac, 1.0 - frac) / math.max(drift, 1e-30))
      }
      // face-choice gap: the two largest |components| must not tie within
      // the same relative-drift envelope
      val latR = lat * S2Grid.DegToRad; val lonR = lon * S2Grid.DegToRad
      val comps = Seq(math.cos(latR) * math.cos(lonR),
        math.cos(latR) * math.sin(lonR), math.sin(latR)).map(math.abs).sorted
      minGapRatio = math.min(minGapRatio, (comps(2) - comps(1)) / (comps(2) * 1e-14))
      id += 1L
    }
    assert(minRatio > 100.0, s"minRatio=$minRatio")
    assert(minGapRatio > 100.0, s"minGapRatio=$minGapRatio")
  }

  test("coverDiamond is conservative: cell-join equals brute-force predicate join") {
    import spark.implicits._
    val tags = SynthGeo.geoTags(spark, TestSpark.sf001)
      .select("id", "lat", "lon").as[(Long, Double, Double)].collect()
    val brute = (for {
      (id, la, lo) <- tags
      (k, clat, clon, r) <- SynthGeo.geoRegionParams
      if math.abs(la - clat) + math.abs(lo - clon) < r
    } yield (id, k)).toSet
    val cover = SynthGeo.geoRegionParams.flatMap { case (k, clat, clon, r) =>
      S2Grid.coverDiamond(clat, clon, r, 6).map(c => (c, (k, clat, clon, r)))
    }.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val viaCells = (for {
      (id, la, lo) <- tags
      (k, clat, clon, r) <- cover.getOrElse(S2Grid.cellOf(la, lo, 6), Nil)
      if math.abs(la - clat) + math.abs(lo - clon) < r
    } yield (id, k)).toSet
    assert(viaCells === brute)
    assert(brute.nonEmpty, "fixture must actually hit some regions")
  }

  test("cross-face region: the lon-45 diamond's cover spans faces 0 and 1") {
    val faces = S2Grid.coverDiamond(0.005, 45.005, 5.005, 6).map(_ >> 12).toSet
    assert(faces.contains(0L) && faces.contains(1L), s"faces=$faces")
  }

  test("polar region cover stays bounded (no pole blowup at level 6)") {
    val cells = S2Grid.coverDiamond(-72.005, -120.005, 8.005, 6)
    // a 16-degree-wide diamond at level 6 (~1.4deg face-center cells):
    // generous bound that still catches a pathological full-face cover
    assert(cells.size < 1500, s"cover=${cells.size}")
    assert(cells.nonEmpty)
  }
}
