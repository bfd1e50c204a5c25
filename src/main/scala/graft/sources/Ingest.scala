package graft.sources

import java.io.{BufferedInputStream, FileOutputStream}
import java.net.{HttpURLConnection, URL}
import java.nio.file.{Files, Path, Paths}
import java.util.zip.ZipInputStream
import scala.collection.mutable.ArrayBuffer

/** S1 (v5_group_project_dag.py:36-58): landing-zone ingestion — GET a
  * URL, unzip if the payload is a zip, land the file(s). This is an
  * ingestion UTILITY, not a query operator: the engine proper reads the
  * landed files with spark.read (SURVEY.md §2.1). Kept driver-side and
  * single-node on purpose — at scale, fan the URL list out as a Dataset
  * and call this per partition.
  *
  * Divergence from the reference: zip detection falls back to the PK
  * magic bytes when no Content-Type header exists (file:// URLs, which
  * is also what makes this testable in the egress-less sandbox); the
  * reference trusts the header alone.
  */
object Ingest {

  private val ZipMagic = Array[Byte](0x50, 0x4b)

  /** Returns the landed file paths. */
  def fetch(url: String, destDir: String, fileName: String = "download"): Seq[Path] = {
    val dest = Paths.get(destDir)
    Files.createDirectories(dest)
    val conn = new URL(url).openConnection()
    conn match {
      case h: HttpURLConnection => h.setInstanceFollowRedirects(true)
      case _ =>
    }
    val contentType = Option(conn.getContentType).getOrElse("")
    val in = new BufferedInputStream(conn.getInputStream)
    try {
      in.mark(2)
      val head = in.readNBytes(2) // read() may legally short-read 1 byte
      in.reset()
      val isZip = contentType.contains("zip") ||
        (head.length == 2 && head(0) == ZipMagic(0) && head(1) == ZipMagic(1))
      if (isZip) unzipAll(in, dest)
      else {
        val target = dest.resolve(fileName)
        Files.copy(in, target, java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        Seq(target)
      }
    } finally in.close()
  }

  private def unzipAll(in: java.io.InputStream, dest: Path): Seq[Path] = {
    val zin = new ZipInputStream(in)
    val out = ArrayBuffer.empty[Path]
    var entry = zin.getNextEntry
    while (entry != null) {
      val target = dest.resolve(entry.getName).normalize()
      require(target.startsWith(dest), s"zip entry escapes dest: ${entry.getName}")
      if (entry.isDirectory) Files.createDirectories(target)
      else {
        Files.createDirectories(target.getParent)
        val fos = new FileOutputStream(target.toFile)
        try zin.transferTo(fos)
        finally fos.close()
        out += target
      }
      zin.closeEntry()
      entry = zin.getNextEntry
    }
    out.toSeq
  }
}
