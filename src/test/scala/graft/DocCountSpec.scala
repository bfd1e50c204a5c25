package graft

/** Battery-size claims in the human-facing docs are derived from
  * `SparkEntry.queries.size`, not hand-maintained — COVERAGE.md's count
  * went stale two rounds running (verdict r10 #5). The regexes pin the
  * exact phrases; if the prose is reworded this fails loudly rather than
  * silently un-checking the number.
  */
class DocCountSpec extends org.scalatest.funsuite.AnyFunSuite {

  private def read(p: String): String =
    new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)), "UTF-8")

  test("COVERAGE.md and README.md battery counts match SparkEntry.queries.size") {
    val n = SparkEntry.queries.size
    val checks = Seq(
      ("COVERAGE.md", """all (\d+) read parquet""".r),
      ("README.md", """(\d+) named queries""".r),
      ("README.md", """q01\.\.q(\d+)""".r),
      ("README.md", """sweeps all (\d+) physical plans""".r))
    val failures = checks.flatMap { case (file, re) =>
      val text = read(file) // sbt test cwd = repo root; keep it checkout-relative
      val hits = re.findAllMatchIn(text).map(_.group(1).toInt).toSeq
      if (hits.isEmpty) Seq(s"$file: phrase /${re}/ not found — keep the claim (and this check) or drop both")
      else hits.filter(_ != n).map(v => s"$file: claims $v queries via /${re}/, battery has $n")
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("QUERIES.md has exactly one row per battery query") {
    val rows = read("QUERIES.md").linesIterator
      .filter(_.startsWith("| q")).map(_.split("\\|")(1).trim).toSet
    val battery = SparkEntry.queries.keySet
    val missing = battery -- rows
    val stale = rows -- battery
    assert(missing.isEmpty && stale.isEmpty,
      s"QUERIES.md drift — missing: ${missing.toSeq.sorted.mkString(",")}; stale: ${stale.toSeq.sorted.mkString(",")}")
  }
}
