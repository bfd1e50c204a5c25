package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Pins for the round-7 second batch (q158–q163): every query is replayed
  * driver-side with plain Scala collections — structurally different
  * implementations that cannot share bugs with the distributed plans.
  * Floats follow the house rounding kernel (sign·floor(|x|·10^n+0.5)/10^n)
  * replayed in scalar math so the comparison is exact, not approximate.
  */
class Extended12Spec extends SparkSuite {
  import spark.implicits._

  /** Scalar twin of Num.roundTo. */
  private def r(x: Double, n: Int): Double = {
    val p = math.pow(10, n.toDouble)
    math.signum(x) * math.floor(math.abs(x) * p + 0.5) / p + 0.0
  }

  /** Driver twin of Text.tokensNorm (trim → lower → split on \s+). */
  private def toks(text: String): Array[String] =
    text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)

  /** The nation-level directed trade edge list, collected. */
  private lazy val edges: Set[(Long, Long)] = {
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
    val ord = spark.read.parquet(s"$sf0001/orders.parquet")
    val cust = spark.read.parquet(s"$sf0001/customer.parquet")
    val supp = spark.read.parquet(s"$sf0001/supplier.parquet")
    li.select($"l_orderkey", $"l_suppkey")
      .join(ord.select($"o_orderkey", $"o_custkey"), $"l_orderkey" === $"o_orderkey")
      .join(cust.select($"c_custkey", $"c_nationkey".as("u")), $"o_custkey" === $"c_custkey")
      .join(supp.select($"s_suppkey", $"s_nationkey".as("v")), $"l_suppkey" === $"s_suppkey")
      .select($"u", $"v").distinct()
      .collect()
      .map(row => (row.getAs[Number](0).longValue, row.getAs[Number](1).longValue))
      .toSet
  }

  private lazy val nations: Seq[Long] =
    spark.read.parquet(s"$sf0001/nation.parquet")
      .select($"n_nationkey".cast("long")).as[Long].collect().toSeq.sorted

  test("q158: PMI collocations equal a driver-side count replay") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select($"doc_id", $"text").collect()
      .map(row => row.getLong(0) -> toks(row.getString(1)))
    val uni = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    val big = scala.collection.mutable.Map.empty[(String, String), Long].withDefaultValue(0L)
    var (nu, nb) = (0L, 0L)
    for ((_, ts) <- docs) {
      ts.foreach { t => uni(t) += 1; nu += 1 }
      ts.sliding(2).foreach {
        case Array(p, t) => big((p, t)) += 1; nb += 1
        case _ =>
      }
    }
    val expected = big.toSeq
      .filter(_._2 >= 5)
      .map { case ((p, t), cb) =>
        val pmi = math.log(cb.toDouble * nu * nu / (nb.toDouble * uni(p) * uni(t))) / math.log(2.0)
        (p, t, cb, r(pmi, 4))
      }
      .sortBy(x => (x._1, x._2))
    val got = graft.SparkEntry.queries("q158_pmi_collocations")(spark, sf0001).collect()
      .map(row => (row.getString(0), row.getString(1), row.getLong(2), row.getDouble(3)))
    assert(got.toSeq == expected)
    assert(expected.nonEmpty, "fixture must contain repeated bigrams at min-count 5")
    // PMI must discriminate: not all scores equal (a constant score would
    // mean the marginals never entered the formula)
    assert(expected.map(_._4).distinct.size > 1)
  }

  test("q159: EWMA equals a per-user BigDecimal replay with exact 0.5^k weights") {
    val events = graft.Tables.load(spark, sf0001, "events")
      .select($"event_id", $"user_id", $"ts", $"value").collect()
      .map(row => (row.getLong(0), row.getLong(1), row.getTimestamp(2),
        if (row.isNullAt(3)) None else Some(row.getDouble(3))))
    val expected = events
      .groupBy(_._2).iterator.flatMap { case (_, es) =>
        val sorted = es.sortBy(e => (e._3.getTime, e._3.getNanos, e._1))
        sorted.indices.map { i =>
          var s = BigDecimal(0)
          var wsum = BigDecimal(0)
          for (k <- 0 until 10; if i - k >= 0; v <- sorted(i - k)._4) {
            val w = BigDecimal("0.5").pow(k)
            s += BigDecimal(r(v * w.toDouble, 12))
            wsum += w
          }
          val ew = if (wsum == 0) None else Some(r(s.toDouble / wsum.toDouble, 4))
          sorted(i)._1 -> ew
        }
      }.toSeq.sortBy(_._1)
    val got = graft.SparkEntry.queries("q159_ewma")(spark, sf0001).collect()
      .map(row => row.getLong(0) ->
        (if (row.isNullAt(2)) None else Some(row.getDouble(2))))
    assert(got.toSeq == expected)
    assert(expected.nonEmpty)
    // decay must matter: some user has >1 event, so some EWMA differs from
    // its own raw value replay (pure v0 would mean the lags never fired)
    assert(events.groupBy(_._2).exists(_._2.length > 1))
  }

  test("q160: LPA communities equal a synchronous driver replay, same tie-break") {
    val und = edges.filter(e => e._1 != e._2)
      .flatMap(e => Seq(e, e.swap))
    val adjIn = und.groupBy(_._2).map { case (v, es) => v -> es.map(_._1).toSeq }
    var labels: Map[Long, Long] = nations.map(v => v -> v).toMap
    for (_ <- 1 to 4) {
      val next = labels.map { case (v, lab) =>
        val nbLabels = adjIn.getOrElse(v, Seq.empty).map(labels)
        if (nbLabels.isEmpty) v -> lab
        else {
          val top = nbLabels.groupBy(identity).toSeq
            .map { case (l, ls) => (l, ls.size) }
            .minBy { case (l, c) => (-c, l) }._1
          v -> top
        }
      }
      labels = next
    }
    val got = graft.SparkEntry.queries("q160_label_prop")(spark, sf0001).collect()
      .map(row => row.getAs[Number](0).longValue -> row.getAs[Number](1).longValue)
    assert(got.toSeq == nations.map(v => v -> labels(v)))
    // communities must have formed: fewer distinct labels than vertices
    assert(labels.values.toSet.size < nations.size)
  }

  test("q161: calibration equals a driver replay of z-score and percent_rank") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select($"doc_id", $"source", $"n_chars").collect()
      .map(row => (row.getLong(0), row.getString(1), row.getAs[Number](2).longValue))
    val expected = docs.groupBy(_._2).iterator.flatMap { case (_, ds) =>
      val n = ds.length.toLong
      val s1 = ds.map(_._3).sum
      val s2 = ds.map(d => d._3 * d._3).sum
      val mean = s1.toDouble / n.toDouble
      val vr = (s2.toDouble - s1.toDouble * s1.toDouble / n.toDouble) / (n.toDouble - 1.0)
      // percent_rank = (min_rank - 1) / (n - 1), ties share the min rank
      val sortedVals = ds.map(_._3).sorted
      val minRank = sortedVals.distinct.map(v => v -> (sortedVals.indexOf(v) + 1)).toMap
      ds.map { case (id, src, nc) =>
        val z = (nc.toDouble - mean) / math.sqrt(vr)
        val pct = (minRank(nc) - 1).toDouble / (n - 1).toDouble
        (id, src, nc, r(z, 4), r(pct, 6))
      }
    }.toSeq.sortBy(_._1)
    val got = graft.SparkEntry.queries("q161_score_calibrate")(spark, sf0001).collect()
      .map(row => (row.getLong(0), row.getString(1), row.getAs[Number](2).longValue,
        row.getDouble(3), row.getDouble(4)))
    assert(got.toSeq == expected)
    assert(docs.map(_._2).distinct.length > 1, "fixture must span multiple sources")
  }

  test("q162: FD profile equals direct driver-side group counting") {
    def fd(rows: Seq[(Any, Any)], name: String): (String, Long, Long, Long, Long, Double) = {
      val groups = rows.groupBy(_._1)
      val nGroups = groups.size.toLong
      val viol = groups.values.filter(_.map(_._2).distinct.size > 1)
      (name, nGroups, viol.size.toLong, viol.map(_.size.toLong).sum,
        rows.size.toLong, r(viol.size.toDouble / nGroups.toDouble, 6))
    }
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select($"lang", $"source").collect().map(row => (row.get(0), row.get(1))).toSeq
    val ev = graft.Tables.load(spark, sf0001, "events")
      .select($"user_id", $"event_type").collect().map(row => (row.get(0), row.get(1))).toSeq
    val part = spark.read.parquet(s"$sf0001/part.parquet")
      .select($"p_brand", $"p_type").collect().map(row => (row.get(0), row.get(1))).toSeq
    val expected = Seq(
      fd(docs, "documents.lang->source"),
      fd(ev, "events.user_id->event_type"),
      fd(part, "part.p_brand->p_type")).sortBy(_._1)
    val got = graft.SparkEntry.queries("q162_fd_check")(spark, sf0001).collect()
      .map(row => (row.getString(0), row.getLong(1), row.getLong(2), row.getLong(3),
        row.getLong(4), row.getDouble(5)))
    assert(got.toSeq == expected)
    // the audit must detect at least one violating and one clean-ish FD
    assert(expected.exists(_._3 > 0), "fixture must contain FD violations")
  }

  test("q163: harmonic centrality equals an all-sources bounded-BFS replay") {
    val adj = edges.groupBy(_._1).map { case (u, es) => u -> es.map(_._2).toSet }
    val expected = nations.map { src =>
      val dist = scala.collection.mutable.Map(src -> 0)
      var frontier = Set(src)
      for (hop <- 1 to 6; if frontier.nonEmpty) {
        val next = frontier.flatMap(u => adj.getOrElse(u, Set.empty))
          .filterNot(dist.contains)
        next.foreach(v => dist(v) = hop)
        frontier = next
      }
      val reached = dist.filter(_._2 > 0)
      val hsum = reached.values
        .map(d => BigDecimal(r(1.0 / d.toDouble, 12))).sum
      (src, reached.size.toLong, r(hsum.toDouble, 4))
    }
    val got = graft.SparkEntry.queries("q163_harmonic_centrality")(spark, sf0001).collect()
      .map(row => (row.getAs[Number](0).longValue, row.getLong(1), row.getDouble(2)))
    assert(got.toSeq == expected)
    // centrality must discriminate between vertices on the fixture graph
    assert(expected.map(_._3).distinct.size > 1)
  }
}
