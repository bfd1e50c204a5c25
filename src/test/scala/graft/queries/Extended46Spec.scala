package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Pins for q271/q272: the streaming join result equals the equivalent
  * BATCH interval join run in the same session (streaming and batch share
  * semantics by construction — this pins it); the ledger fold replays
  * from a literal Scala walk and its clamp invariants hold.
  */
class Extended46Spec extends SparkSuite {
  import spark.implicits._

  private def r(x: Double, n: Int): Double = {
    val p = math.pow(10, n.toDouble)
    math.signum(x) * math.floor(math.abs(x) * p + 0.5) / p + 0.0
  }

  test("q271: streaming interval join equals the batch twin") {
    val got = graft.SparkEntry.queries("q271_stream_join")(spark, sf0001)
      .collect()
      .map(rw => (rw.getLong(0), rw.getLong(1), rw.getLong(2), rw.getLong(3)))
    val ev = graft.Tables.load(spark, sf0001, "events")
    val su = ev.filter($"event_type" === "signup")
      .select($"user_id", unix_micros($"ts").as("st"))
    val pu = ev.filter($"event_type" === "purchase")
      .select($"user_id".as("p_uid"), unix_micros($"ts").as("pt"))
    val exp = su.join(pu, $"p_uid" === $"user_id" &&
        $"pt" >= $"st" && $"pt" <= $"st" + 7200000000L)
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n"), min(expr("(pt - st) div 1000000")).as("mn"),
        max(expr("(pt - st) div 1000000")).as("mx"))
      .orderBy("user_id").collect()
      .map(rw => (rw.getLong(0), rw.getLong(1), rw.getLong(2), rw.getLong(3)))
    assert(got.toSeq == exp.toSeq && got.nonEmpty)
    // lags live inside the join window
    assert(got.forall(t => t._3 >= 0 && t._4 <= 7200))
  }

  test("q272: ledger fold replays from a literal Scala walk; clamps hold") {
    val got = graft.SparkEntry.queries("q272_capped_balance")(spark, sf0001)
      .collect()
      .map(rw => (rw.getLong(0), rw.getLong(1), rw.getLong(2), rw.getLong(3),
        rw.getLong(4), rw.getDouble(5)))
    val cap = 50000L
    val moves = graft.Tables.load(spark, sf0001, "events")
      .filter($"event_type".isin("click", "purchase"))
      .select($"user_id", unix_micros($"ts").as("tsu"), $"event_id",
        $"event_type", $"value")
      .collect()
      .map(rw => (rw.getLong(0), rw.getLong(1), rw.getLong(2),
        if (rw.getString(3) == "click") r(rw.getDouble(4) * 100.0, 0).toLong
        else -r(rw.getDouble(4) * 100.0, 0).toLong))
      .groupBy(_._1)
    assert(got.map(_._1).toSet == moves.keySet)
    got.foreach { case (uid, nMoves, fin, lo, hi, fillR) =>
      val ms = moves(uid).sortBy(t => (t._2, t._3)).map(_._4)
      assert(nMoves == ms.length)
      var bal = 0L; var elo = 0L; var ehi = 0L
      ms.foreach { d =>
        val raw = bal + d
        if (raw < 0) { bal = 0; elo += 1 }
        else if (raw > cap) { bal = cap; ehi += 1 }
        else bal = raw
      }
      assert(fin == bal && lo == elo && hi == ehi)
      assert(fin >= 0 && fin <= cap)
      assert(fillR == r(fin.toDouble / cap, 6))
    }
    // the clamp is non-vacuous on the fixture: someone bottomed out
    assert(got.map(_._4).sum > 0, "at least one stockout corpus-wide")
  }
}
