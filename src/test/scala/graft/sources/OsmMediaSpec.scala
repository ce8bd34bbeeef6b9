package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class OsmOutSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("negative ids are a pure function of key order, at any parallelism") {
    import spark.implicits._
    val addr = graft.layers.SynthCadastre.addresses(spark, TestSpark.sf001)
    val a = OsmOut.addressNodes(addr, "bid", "px", "py", Map.empty)
      .select("key", "osm_id").as[(Long, Long)].collect().toMap
    val b = OsmOut.addressNodes(addr.repartition(7), "bid", "px", "py", Map.empty)
      .select("key", "osm_id").as[(Long, Long)].collect().toMap
    assert(a === b)
    assert(a.values.min === -a.size.toLong && a.values.max === -1L)
  }

  test("XML serialize/deserialize round-trips nodes with tags") {
    val nodes = Seq(
      (-1L, 1.5, 2.5, Map("addr:street" -> "Calle O'Hara & <Co>", "ref" -> "7")),
      (-2L, 3.25, 4.75, Map.empty[String, String]))
    val xml = OsmOut.nodesToXml(nodes)
    assert(OsmOut.xmlToNodes(xml).toSet === nodes.toSet)
  }

  test("perTaskXml emits one document per task with that task's nodes") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val addr = graft.layers.SynthCadastre.addresses(spark, TestSpark.sf001)
    val nodes = OsmOut.addressNodes(addr, "bid", "px", "py", Map("ref" -> "bid"))
      .withColumn("task", pmod(col("key"), lit(3)))
    val perTask = OsmOut.perTaskXml(nodes, "task").collect().toMap
    assert(perTask.size === 3)
    val total = perTask.values.map(x => OsmOut.xmlToNodes(x).size).sum
    assert(total === addr.count())
  }
}

class MediaSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("decodeFeatures preserves rows, metadata, and emits normalized features") {
    import spark.implicits._
    val media = graft.multimodal.Media.synth(spark, TestSpark.sf001)
    val feats = graft.multimodal.Media.decodeFeatures(media)
      .as[graft.multimodal.Media.MediaFeatures].collect()
    assert(feats.length === media.count())
    feats.foreach { f =>
      assert(f.features.length === 8)
      assert(math.abs(f.features.map(_.toDouble).sum - 1.0) < 1e-5) // histogram sums to 1
    }
  }

  test("decode is deterministic across partitionings (no shuffle dependence)") {
    import spark.implicits._
    val media = graft.multimodal.Media.synth(spark, TestSpark.sf001)
    val a = graft.multimodal.Media.decodeFeatures(media)
      .as[graft.multimodal.Media.MediaFeatures].collect()
      .map(f => (f.doc_id, f.features.toSeq)).toMap
    val b = graft.multimodal.Media.decodeFeatures(media.repartition(5))
      .as[graft.multimodal.Media.MediaFeatures].collect()
      .map(f => (f.doc_id, f.features.toSeq)).toMap
    assert(a === b)
  }
}

/** Deserialize the reference's real current.osm fixture (JOSM export used
  * by its conflation tests) and resolve way geometry via the engine's
  * relational ref-resolution (osmxml.deserialize semantics). */
class CurrentOsmSpec extends org.scalatest.funsuite.AnyFunSuite {
  lazy val spark = graft.TestSpark.spark

  test("current.osm parses: 58 nodes, 8 ways, 1 relation; refs resolve via joins") {
    import spark.implicits._
    val xml = java.nio.file.Files.readString(
      java.nio.file.Paths.get("/root/reference/test/fixtures/current.osm"))
    val (nodes, ways, rels) = OsmOut.parseOsm(xml)
    assert(nodes.length === 58)
    assert(ways.length === 8)
    assert(rels.length === 1)
    // relational ref resolution: every nd ref resolves to a fixture node
    val nodeDf = nodes.map(n => (n.id, n.lon, n.lat)).toDF("osm_id", "x", "y")
    val wayDf = ways.map(w => (w.id, w.ndRefs)).toDF("way_id", "nd_refs")
    val resolved = OsmOut.resolveWays(wayDf, nodeDf).collect()
    assert(resolved.length === 8)
    assert(resolved.forall(_.getAs[Long]("n_dangling") === 0L))
    // the relation's way members exist in the file
    val wayIds = ways.map(_.id).toSet
    val memberWays = rels.head.members.filter(_._1 == "way").map(_._2)
    assert(memberWays.nonEmpty && memberWays.forall(wayIds.contains))
    // closed building ways are polygon candidates for conflation
    val byId = nodes.map(n => n.id -> n).toMap
    val closed = ways.filter(w => w.ndRefs.nonEmpty && w.ndRefs.head == w.ndRefs.last)
    assert(closed.nonEmpty)
  }
}
