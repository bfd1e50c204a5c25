package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import java.util.zip.{ZipEntry, ZipOutputStream}

class IngestSpec extends AnyFunSuite {

  test("plain payload lands as a single file (file:// URL, no egress needed)") {
    val src = Files.createTempFile("ingest_src", ".csv")
    Files.writeString(src, "a,b\n1,2\n")
    val dest = Files.createTempDirectory("ingest_dest")
    val landed = Ingest.fetch(src.toUri.toString, dest.toString, "weather.csv")
    assert(landed.map(_.getFileName.toString) == Seq("weather.csv"))
    assert(Files.readString(landed.head) == "a,b\n1,2\n")
  }

  test("zip payload is detected by magic bytes and fully extracted") {
    val zipFile = Files.createTempFile("ingest_src", ".zip")
    val zos = new ZipOutputStream(Files.newOutputStream(zipFile))
    zos.putNextEntry(new ZipEntry("weatherHistory.csv"))
    zos.write("x,y\n3,4\n".getBytes)
    zos.closeEntry()
    zos.putNextEntry(new ZipEntry("sub/extra.txt"))
    zos.write("hi".getBytes)
    zos.closeEntry()
    zos.close()
    val dest = Files.createTempDirectory("ingest_dest")
    val landed = Ingest.fetch(zipFile.toUri.toString, dest.toString)
    assert(landed.map(_.getFileName.toString).toSet == Set("weatherHistory.csv", "extra.txt"))
    assert(Files.readString(landed.find(_.toString.endsWith(".csv")).get) == "x,y\n3,4\n")
  }

  test("zip-slip entries are rejected") {
    val zipFile = Files.createTempFile("ingest_evil", ".zip")
    val zos = new ZipOutputStream(Files.newOutputStream(zipFile))
    zos.putNextEntry(new ZipEntry("../escape.txt"))
    zos.write("nope".getBytes)
    zos.closeEntry()
    zos.close()
    val dest = Files.createTempDirectory("ingest_dest")
    intercept[IllegalArgumentException] {
      Ingest.fetch(zipFile.toUri.toString, dest.toString)
    }
  }
}
