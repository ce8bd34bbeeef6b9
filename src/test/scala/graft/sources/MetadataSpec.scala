package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Replays the reference's own test_get_metadata golden
  * (test/test_catatom.py:39-66,123-131): the ISO-19139 metadata fixture
  * must yield src_date 2017-02-25, cat_mun TAZ, crs_ref 32628. */
class MetadataSpec extends AnyFunSuite {

  private val metadata =
    """<?xml version="1.0" encoding="ISO-8859-1"?>
      |<gmd:MD_Metadata xmlns:gmd="http://www.isotc211.org/2005/gmd" xmlns:gco="http://www.isotc211.org/2005/gco">
      |    <gmd:title>
      |        <gco:CharacterString>Buildings of 38001-TAZ (foo bar)</gco:CharacterString>
      |    </gmd:title>
      |	<gmd:dateStamp>
      |		<gco:Date>2017-02-25</gco:Date>
      |	</gmd:dateStamp>
      |    <gmd:code>
      |        <gco:CharacterString>http://www.opengis.net/def/crs/EPSG/0/32628</gco:CharacterString>
      |    </gmd:code>
      |</gmd:MD_Metadata>
      |""".stripMargin

  test("reference golden: src_date / cat_mun / crs_ref") {
    val dir = java.nio.file.Files.createTempDirectory("graft_md")
    val p = dir.resolve("A.ES.SDGC.BU.MD.38001.xml")
    java.nio.file.Files.write(p,
      metadata.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    val got = CadastreGml.getMetadata(p.toString)
    assert(got === Right(("2017-02-25", "TAZ", 32628)))
  }

  test("missing fields raise the CatIOError message, like the reference") {
    val dir = java.nio.file.Files.createTempDirectory("graft_md_e")
    val p = dir.resolve("empty.xml")
    java.nio.file.Files.writeString(p, "<gmd:MD_Metadata></gmd:MD_Metadata>")
    val got = CadastreGml.getMetadata(p.toString)
    assert(got.isLeft && got.swap.toOption.get.contains("Could not read metadata"))
    assert(CadastreGml.getMetadata(s"$dir/nope.xml").isLeft)
  }
}
