package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Semantics pins for the native Jaro-Winkler expression. The constants
  * below are DuckDB's `jaro_winkler_similarity` outputs (the q135 oracle
  * engine), captured verbatim — the kernel was additionally fuzzed against
  * DuckDB over 30k random pairs (mixed alphabet sizes, lengths 0–14) with
  * zero bit differences.
  */
class StringExpressionsSpec extends SparkSuite {
  import spark.implicits._

  private def jw(a: String, b: String): Double = JaroWinklerAlgo.computeStr(a, b)

  test("textbook pairs match the oracle engine bit-for-bit") {
    assert(jw("MARTHA", "MARHTA") == 0.9611111111111111)
    assert(jw("DIXON", "DICKSONX") == 0.8133333333333332)
    assert(jw("JELLYFISH", "SMELLYFISH") == 0.8962962962962964)
    assert(jw("DwAyNE", "DuANE") == 0.8400000000000001) // case-sensitive
    assert(jw("kitten", "sitting") == 0.746031746031746)
  }

  test("edge semantics: empty→0, window-0 swap→0, identity→1, no boost at jaro≤0.7") {
    assert(jw("", "") == 0.0) // NOT 1.0 — pinned to the oracle engine
    assert(jw("", "a") == 0.0)
    assert(jw("ab", "ba") == 0.0) // match window max(2,2)/2-1 = 0
    assert(jw("abc", "abc") == 1.0)
    // jaro exactly 0.5 with common prefix 2: boost must NOT apply
    assert(jw("abcdefgh", "abzzzzzz") == 0.5)
    // prefix capped at 4: 0.8333… + 4·0.1·(1−0.8333…) = 0.9, not 0.9167
    assert(jw("12345", "1234567890") == 0.9)
  }

  test("odd transposition count halves by INTEGER division (3-cycle case)") {
    // matched chars (a,c,d) vs (d,a,c): 3 position mismatches → t = 1,
    // not 1.5 — exact-halving would give 0.6666…; the oracle says 0.7222…
    assert(jw("dacfcc", "acd") == 0.7222222222222222)
  }

  test("codegen path ≡ kernel; nulls propagate") {
    val df = Seq(
      ("MARTHA", "MARHTA"), ("DIXON", "DICKSONX"), ("dacfcc", "acd"),
      ("ab", "ba"), ("", ""), ("prefix_common_long", "prefix_common_short"))
      .toDF("a", "b")
    StringExpressions.register(spark)
    val got = df
      .select($"a", $"b", StringExpressions.jaroWinkler($"a", $"b").as("jw"))
      .collect()
    got.foreach(r => assert(r.getDouble(2) == jw(r.getString(0), r.getString(1))))
    val withNull = Seq((Some("x"), None: Option[String])).toDF("a", "b")
      .select(StringExpressions.jaroWinkler($"a", $"b")).head()
    assert(withNull.isNullAt(0))
    // the expression must not be a CodegenFallback (it would break the
    // whole-stage span around the ER verify filter)
    assert(!classOf[org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback]
      .isAssignableFrom(classOf[JaroWinkler]))
  }

  test("SQL surface: jaro_winkler registered via Graft.registerAll") {
    graft.Graft.registerAll(spark)
    val r = spark.sql("SELECT jaro_winkler('MARTHA', 'MARHTA') AS j").head().getDouble(0)
    assert(r == 0.9611111111111111)
  }

  test("property: range [0,1], symmetry, and 1.0 iff equal (non-empty)") {
    val rnd = new scala.util.Random(42)
    val alpha = "abcdef "
    (1 to 2000).foreach { _ =>
      val a = Seq.fill(rnd.nextInt(12))(alpha(rnd.nextInt(alpha.length))).mkString
      val b = Seq.fill(rnd.nextInt(12))(alpha(rnd.nextInt(alpha.length))).mkString
      val s = jw(a, b)
      assert(s >= 0.0 && s <= 1.0, s"out of range: jw($a,$b)=$s")
      assert(s == jw(b, a), s"asymmetric: ($a,$b)")
      if (a.nonEmpty && a == b) assert(s == 1.0)
      if (s == 1.0) assert(a == b)
    }
  }
}
