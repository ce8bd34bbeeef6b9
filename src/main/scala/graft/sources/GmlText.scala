package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

/** Container-aware GML text loading — the reference's Reader.read tries the
  * downloaded ZIP first, then the bare GML (catatom.py:216-241 +
  * get_gml_from_zip:164-178), so the Cadastre archives processed straight
  * from a `-w` mirror must open without manual extraction.
  *
  * Path forms:
  *  - `file.gml`            — plain text;
  *  - `file.gml.gz`/`.gz`   — gunzipped;
  *  - `archive.zip`         — the archive's single `.gml` entry (AD/CP
  *                            archives carry one);
  *  - `archive.zip!name.gml`— the entry whose path ENDS WITH `name.gml`
  *                            (get_path_from_zip semantics — BU archives
  *                            carry building/buildingpart/othercons).
  *
  * Decoding mirrors fix_encoding (catatom.py:179-188): strict UTF-8 first,
  * ISO-8859-1 when the bytes are not valid UTF-8.
  */
object GmlText {

  private def decode(bytes: Array[Byte]): String =
    try {
      val dec = StandardCharsets.UTF_8.newDecoder()
      dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString
    } catch {
      case _: java.nio.charset.CharacterCodingException =>
        new String(bytes, StandardCharsets.ISO_8859_1)
    }

  private def readAll(in: java.io.InputStream): Array[Byte] =
    try in.readAllBytes() finally in.close()

  /** True when [[load]] can produce text for this path (bang-zip members
    * included) — the `Files.exists` analog for container paths. */
  def exists(path: String): Boolean = {
    val bang = path.indexOf(".zip!")
    if (bang < 0) Files.exists(Paths.get(path))
    else {
      val zipPath = path.substring(0, bang + 4)
      val member = path.substring(bang + 5)
      Files.exists(Paths.get(zipPath)) && {
        val zf = new java.util.zip.ZipFile(zipPath)
        try zf.entries.asScala.exists(_.getName.endsWith(member))
        finally zf.close()
      }
    }
  }

  /** Raw bytes of a plain file or a `archive.zip!member` entry — for
    * callers doing their own charset sniffing (ISO-19139 metadata). */
  def loadBytes(path: String): Array[Byte] = {
    val bang = path.indexOf(".zip!")
    if (bang < 0) Files.readAllBytes(Paths.get(path))
    else {
      val zipPath = path.substring(0, bang + 4)
      val member = path.substring(bang + 5)
      val zf = new java.util.zip.ZipFile(zipPath)
      try {
        val entry = zf.entries.asScala.find(_.getName.endsWith(member))
          .getOrElse(throw new java.io.IOException(
            s"There is no item named '$member' in the archive $zipPath"))
        readAll(zf.getInputStream(entry))
      } finally zf.close()
    }
  }

  /** Decompressing stream over any supported container path — for callers
    * that only need a bounded head (empty-layer sniff, srsName probe)
    * without inflating a whole archive member. Closing the returned stream
    * closes the underlying archive too. */
  def open(path: String): java.io.InputStream = {
    val bang = path.indexOf(".zip!")
    if (bang >= 0 || path.endsWith(".zip")) {
      val zipPath = if (bang >= 0) path.substring(0, bang + 4) else path
      val zf = new java.util.zip.ZipFile(zipPath)
      val entry =
        if (bang >= 0) {
          val member = path.substring(bang + 5)
          zf.entries.asScala.find(_.getName.endsWith(member))
            .getOrElse { zf.close(); throw new java.io.IOException(
              s"There is no item named '$member' in the archive $zipPath") }
        } else {
          val entries = zf.entries.asScala.toSeq
          entries.find(_.getName.endsWith(".gml"))
            .orElse(entries.headOption)
            .getOrElse { zf.close(); throw new java.io.IOException(
              s"Empty archive $path") }
        }
      val in = zf.getInputStream(entry)
      new java.io.FilterInputStream(in) {
        override def close(): Unit = { super.close(); zf.close() }
      }
    } else if (path.endsWith(".gz"))
      new java.util.zip.GZIPInputStream(Files.newInputStream(Paths.get(path)))
    else Files.newInputStream(Paths.get(path))
  }

  def load(path: String): String = {
    if (path.indexOf(".zip!") >= 0) decode(loadBytes(path))
    else if (path.endsWith(".zip") || path.endsWith(".gz")) decode(readAll(open(path)))
    else decode(Files.readAllBytes(Paths.get(path)))
  }
}
