package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** q273 pins: the greedy walk replays from a literal Scala fold, and
  * matching invariants hold — 1-to-1 (no endpoint reused), maximal (no
  * acceptable pair left both-unmatched), size bounded by min side.
  */
class Extended47Spec extends SparkSuite {
  import spark.implicits._

  private def r(x: Double, n: Int): Double = {
    val p = math.pow(10, n.toDouble)
    math.signum(x) * math.floor(math.abs(x) * p + 0.5) / p + 0.0
  }

  test("q273: greedy matching replays from a literal Scala walk; invariants hold") {
    val got = graft.SparkEntry.queries("q273_order_matching")(spark, sf0001)
      .collect()
      .map(rw => (rw.getLong(0), rw.getLong(1), rw.getLong(2), rw.getLong(3),
        rw.getLong(4), rw.getLong(5), rw.getDouble(6)))
    val ev = graft.Tables.load(spark, sf0001, "events")
      .select($"user_id", $"event_type", unix_micros($"ts").as("tsu"), $"event_id")
      .collect()
      .map(rw => (rw.getLong(0), rw.getString(1), rw.getLong(2), rw.getLong(3)))
    val win = 4L * 3600000000L
    val byUser = ev.groupBy(_._1)
    val expected = byUser.flatMap { case (uid, rows) =>
      val sus = rows.filter(_._2 == "signup").map(t => (t._3, t._4))
      val pus = rows.filter(_._2 == "purchase").map(t => (t._3, t._4))
      val cands = for {
        (st, sid) <- sus; (pt, pid) <- pus
        if pt >= st && pt - st <= win
      } yield (pt - st, sid, pid)
      if (cands.isEmpty) None
      else {
        val ordered = cands.sortBy(t => (t._1, t._2, t._3))
        val ms = scala.collection.mutable.Set[Long]()
        val mp = scala.collection.mutable.Set[Long]()
        var n = 0L; var lagsum = 0L
        ordered.foreach { case (lag, sid, pid) =>
          if (!ms(sid) && !mp(pid)) { ms += sid; mp += pid; n += 1; lagsum += lag }
        }
        // maximality: every remaining candidate touches a matched endpoint
        assert(ordered.forall { case (_, sid, pid) => ms(sid) || mp(pid) })
        assert(n <= math.min(cands.map(_._2).distinct.length,
          cands.map(_._3).distinct.length))
        Some(uid -> (cands.length.toLong, cands.map(_._2).distinct.length.toLong,
          cands.map(_._3).distinct.length.toLong, n, lagsum / 1000000,
          r(lagsum.toDouble / n / 1.0e6, 3)))
      }
    }
    assert(got.map(_._1).toSet == expected.keySet && got.nonEmpty)
    got.foreach { case (uid, nc, ns, np, nm, sl, ml) =>
      val e = expected(uid)
      assert((nc, ns, np, nm, sl, ml) == e, s"user $uid")
    }
    // greedy consumed candidates: someone has fewer matches than candidates
    assert(got.exists(t => t._5 < t._2))
  }
}
