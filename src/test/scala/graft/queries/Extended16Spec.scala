package graft.queries

import java.time.LocalDate
import java.time.temporal.ChronoUnit

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Pins for the round-7 sixth batch (q177–q178): independent Scala replays
  * plus the invariants that are each query's reason to exist — subtree
  * counts must partition the forest exactly (every customer counted once
  * per ancestor), and the proration must cover every order's full term
  * with bounded floor loss.
  */
class Extended16Spec extends SparkSuite {
  import spark.implicits._

  private def r(x: Double, n: Int): Double = {
    val p = math.pow(10, n.toDouble)
    math.signum(x) * math.floor(math.abs(x) * p + 0.5) / p + 0.0
  }

  test("q177: subtree rollup equals an exact path-enumeration replay") {
    val orders = spark.read.parquet(s"$sf0001/orders.parquet")
      .select($"o_custkey", $"o_totalprice").collect()
      .map(row => (row.getLong(0), math.floor(row.getDouble(1) * 100 + 0.5).toLong))
    val custs = spark.read.parquet(s"$sf0001/customer.parquet")
      .select($"c_custkey").collect().map(_.getLong(0))
    val byC = orders.groupBy(_._1)
    val anc = custs.flatMap(c => Iterator.iterate(c)(_ / 10).takeWhile(_ >= 1).map(_ -> c))
    val sub = anc.groupBy(_._1).map { case (n, xs) =>
      val cs = xs.map(_._2)
      n -> ((cs.length.toLong,
        cs.map(c => byC.getOrElse(c, Array.empty[(Long, Long)]).length.toLong).sum,
        cs.map(c => byC.getOrElse(c, Array.empty[(Long, Long)]).map(_._2).sum).sum))
    }
    val roots = sub.filter(_._1 < 10).map { case (n, t) => n -> t._3 }
    assert(roots.values.forall(_ > 0), "every sf0.001 root must carry revenue")
    val expected = sub.toSeq.filter(_._1 < 1000).sortBy(_._1).map {
      case (n, (nd, no, cents)) =>
        (n, n.toString.length.toLong - 1, nd, no, r(cents.toDouble / 100.0, 2),
          r(cents.toDouble / roots(n.toString.head.asDigit.toLong).toDouble, 6))
    }
    val got = graft.SparkEntry.queries("q177_hierarchy_rollup")(spark, sf0001).collect()
      .map(row => (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3),
        row.getDouble(4), row.getDouble(5)))
    assert(got.toSeq == expected)
    // the forest partitions the representable customers: root subtree
    // counts sum to |C ∩ [1,∞)| (custkey 0 has no digit-forest home —
    // dropped identically on both engines)
    assert(sub.filter(_._1 < 10).values.map(_._1).sum == custs.count(_ >= 1).toLong)
    // path enumeration covered every level: a depth-2 node exists at sf0.001
    assert(got.exists(_._2 == 2L))
  }

  test("q178: proration covers each full term; floor loss bounded by month count") {
    val orders = spark.read.parquet(s"$sf0001/orders.parquet")
      .select($"o_orderkey", $"o_orderdate".cast("date"), $"o_totalprice").collect()
      .map(row => (row.getLong(0), row.getDate(1).toLocalDate, row.getDouble(2)))
    case class Alloc(month: String, ovl: Long, alloc: Long)
    val allocs = orders.flatMap { case (k, d0, price) =>
      val term = 30L + k % 60
      val pu = math.floor(price * 100 + 0.5).toLong * 10000L
      val d1 = d0.plusDays(term)
      val months = Iterator.iterate(d0.withDayOfMonth(1))(_.plusMonths(1))
        .takeWhile(!_.isAfter(d1.minusDays(1).withDayOfMonth(1))).toSeq
      val rows = months.map { ms =>
        val me = ms.plusMonths(1)
        val lo = if (ms.isAfter(d0)) ms else d0
        val hi = if (me.isBefore(d1)) me else d1
        val ovl = ChronoUnit.DAYS.between(lo, hi)
        Alloc(f"${ms.getYear}%04d-${ms.getMonthValue}%02d", ovl, pu * ovl / term)
      }
      // every term day lands in exactly one month
      assert(rows.map(_.ovl).sum == term, s"order $k covers ${rows.map(_.ovl).sum}/$term")
      // floor loses less than one micro-dollar per month
      val loss = pu - rows.map(_.alloc).sum
      assert(loss >= 0 && loss < rows.length, s"order $k floor loss $loss")
      rows
    }
    val tu = allocs.map(_.alloc).sum
    val expected = allocs.groupBy(_.month).toSeq.sortBy(_._1).map { case (m, xs) =>
      (m, xs.length.toLong, xs.map(_.ovl).sum,
        r(xs.map(_.alloc).sum.toDouble / 1e6, 4),
        r(xs.map(_.alloc).sum.toDouble / tu.toDouble, 6))
    }
    val got = graft.SparkEntry.queries("q178_interval_proration")(spark, sf0001).collect()
      .map(row => (row.getString(0), row.getLong(1), row.getLong(2), row.getDouble(3),
        row.getDouble(4)))
    assert(got.toSeq == expected)
    // shares sum to 1 within per-row rounding width
    val s = got.map(_._5).sum
    assert(math.abs(s - 1.0) <= got.length * 5e-7 + 1e-9, s"shares sum $s")
  }
}
