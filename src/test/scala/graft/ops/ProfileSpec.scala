package graft.ops

import graft.SparkSuite

class ProfileSpec extends SparkSuite {
  import spark.implicits._

  test("profile counts nulls, distincts, and native-type min/max per column") {
    val df = Seq(
      (Some(3), Some("b")), (None, Some("a")), (Some(10), None), (Some(3), Some("a"))
    ).toDF("x", "s")
    val out = Profile.profile(df, Seq("x", "s"))
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5)))
      .toMap
    // numeric min/max computed BEFORE the string render (10 > 3 despite "10" < "3")
    assert(out("x") == ((3L, 1L, 2L, "3", "10")))
    assert(out("s") == ((3L, 1L, 2L, "a", "b")))
  }
}
