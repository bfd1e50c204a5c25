package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Semantics pins for the round-5 batch-4 queries (q131–q134). */
class Extended7Spec extends SparkSuite {
  import spark.implicits._

  private def q(name: String) = graft.SparkEntry.queries(name)

  private def writeDocsSrc(rows: Seq[(Long, String, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("x7docs").toString
    rows.toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q131 cdc merge: updates replace, deletes vanish, inserts appear, rest pass through") {
    val base = spark.read.parquet(s"$sf0001/orders.parquet")
      .select($"o_orderkey", $"o_orderstatus", $"o_totalprice")
    val keys = base.select($"o_orderkey").as[Long].collect().toSet
    val nUpd = keys.count(_ % 7 == 0)
    val nDel = keys.count(k => k % 7 != 0 && k % 11 == 0)
    val nIns = keys.count(_ % 13 == 0)
    val out = q("q131_cdc_merge")(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getString(3)))
    assert(out.length == keys.size - nDel + nIns)
    val byKey = out.map(r => r._1 -> r).toMap
    val baseMap = base.collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
    keys.foreach { k =>
      if (k % 7 == 0) {
        val (_, t) = baseMap(k)
        val got = byKey(k)
        assert(got._2 == "X" && got._4 == "U")
        assert(math.abs(got._3 - (t + 100.0)) < 1e-6)
      } else if (k % 11 == 0) assert(!byKey.contains(k), s"deleted key $k survived")
      else {
        val got = byKey(k)
        assert(got._2 == baseMap(k)._1 && got._4 == "=")
      }
      if (k % 13 == 0) {
        val ins = byKey(k + 10000000L)
        assert(ins._2 == "N" && ins._4 == "I")
      }
    }
  }

  test("q132 ks: disjoint distributions give D=1 (reject); identical give D=0") {
    // 20+20 disjoint samples: D=1, crit = 1.358·sqrt(40/400) ≈ 0.429 → reject
    val disjoint = writeDocsSrc(
      (1L to 20L).map(i => (i, ("a " * (i.toInt % 3 + 1)).trim, "src0")) ++
        (21L to 40L).map(i => (i, ("b " * (i.toInt % 3 + 5)).trim, "src1")))
    val r1 = q("q132_ks_test")(spark, disjoint).head()
    assert(r1.getLong(0) == 20 && r1.getLong(1) == 20)
    assert(r1.getDouble(2) == 1.0 && r1.getBoolean(4))
    assert(math.abs(r1.getDouble(3) - 1.358 * math.sqrt(40.0 / 400.0)) < 1e-6)
    val same = writeDocsSrc(Seq(
      (1L, "a b", "src0"), (2L, "a b c", "src0"),
      (3L, "x y", "src1"), (4L, "x y z", "src1")))
    val r2 = q("q132_ks_test")(spark, same).head()
    assert(r2.getDouble(2) == 0.0 && !r2.getBoolean(4))
  }

  test("q133 bm25: ranking is score-desc, matched docs only, tf and brevity raise scores") {
    val rows = q("q133_bm25")(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.map(_._1).toSeq == (1L to rows.length))
    assert(rows.sliding(2).forall {
      case Array(a, b) => a._4 > b._4 || (a._4 == b._4 && a._2 < b._2); case _ => true
    })
    // every ranked doc really contains a query term
    val terms = Set("spark", "table", "query")
    val texts = spark.read.parquet(s"$sf0001/documents.parquet")
      .select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> r.getString(1).toLowerCase.split("\\s+").toSet).toMap
    rows.foreach { case (_, id, nHit, _) =>
      assert(texts(id).intersect(terms).size.toLong == nHit)
    }
    // controlled corpus: same length, higher tf wins; same tf, shorter doc wins
    val dir = writeDocsSrc(Seq(
      (1L, "spark spark pad1 pad2", "s"),
      (2L, "spark pad1 pad2 pad3", "s"),
      (3L, "spark pad1", "s"),
      (4L, "no hits here at all", "s")))
    val got = q("q133_bm25")(spark, dir).collect()
      .map(r => (r.getLong(1), r.getDouble(3)))
    assert(got.map(_._1).toSet == Set(1L, 2L, 3L))
    val m = got.toMap
    assert(m(1L) > m(2L), "higher tf at equal length must score higher")
    assert(m(3L) > m(2L), "equal tf in a shorter doc must score higher")
  }

  test("q134 equi-depth: 8 buckets, near-equal counts, disjoint increasing ranges") {
    val rows = q("q134_equidepth_hist")(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.map(_._1).toSeq == (1L to 8L))
    val total = spark.read.parquet(s"$sf0001/lineitem.parquet").count()
    assert(rows.map(_._2).sum == total)
    assert(rows.map(_._2).max - rows.map(_._2).min <= 1, "equi-depth means counts differ by ≤1")
    rows.foreach { case (_, _, lo, hi) => assert(lo <= hi) }
    rows.sliding(2).foreach {
      case Array(a, b) => assert(a._4 <= b._3, "bucket ranges must not interleave")
      case _ => ()
    }
  }
}
