package graft.pipeline

import graft.SparkSuite
import graft.ops.Validate
import org.apache.spark.sql.functions._
import java.sql.Date

class WeatherSpec extends SparkSuite {

  private lazy val src = Weather.read(spark, resource("weatherHistory.csv"))

  test("clean: %z wall-clock date, gates, medians-after-gate, keep-first dedup") {
    val cleaned = Weather.clean(src).orderBy("Formatted Date").collect()
    // 7 hourly rows over 4 distinct dates → dedup keeps first per date
    assert(cleaned.length == 4)
    val d1 = cleaned(0)
    assert(d1.getAs[Date]("Formatted Date") == Date.valueOf("2020-01-01"))
    // first row of day 1 survives (file order): temp 10.0
    assert(d1.getAs[Double]("Temperature (C)") == 10.0)
    // Month derived before dedup, yyyy-MM string
    assert(cleaned(2).getAs[String]("Month") == "2020-02")
  }

  test("median imputation fills gated-out values from in-range medians") {
    val noDedup = Weather.clean(src, Weather.Conf(dedupKeyFirst = false))
    // row 3 had Temperature 60.0 (out of open (-50,50) → null) and Wind
    // -5.0 (out of [0,408] → null); row 5 temp was empty.
    // in-range temps {10,20,0,5,6} median=6; winds {10,20,3,4,50,60} median=15
    val r3 = noDedup.filter(col("Summary") === "Sunny" && col("Apparent Temperature (C)") === 8.0).head()
    assert(r3.getAs[Double]("Temperature (C)") == 6.0)
    assert(r3.getAs[Double]("Wind Speed (km/h)") == 15.0)
  }

  test("daily transform (v1 multi-row semantics): true means + deterministic wind mode") {
    val cleaned = Weather.clean(src, Weather.Conf(dedupKeyFirst = false))
    val d1 = Weather.daily(cleaned).head()
    // day1 temps after cleaning: 10, 20, 6 (imputed) → mean 12
    assert(math.abs(d1.getAs[Double]("daily_avg_temperature") - 12.0) < 1e-12)
    // winds 10→Light Air, 20→Gentle Breeze, 15(imputed)→Light Breeze:
    // all tie at count 1 → smallest label wins (pandas mode()[0])
    assert(d1.getAs[String]("wind_strength") == "Gentle Breeze")
  }

  test("monthly strict precip mode: clear winner in Jan, tie → null in Feb") {
    val cleaned = Weather.clean(src, Weather.Conf(dedupKeyFirst = false))
    val m = Weather.monthly(cleaned).collect()
      .map(r => r.getAs[String]("Month") -> Option(r.getAs[String]("mode_precipitation_type")))
      .toMap
    assert(m("2020-01") == Some("rain")) // rain 3, snow 1
    assert(m("2020-02") == None) // rain 1, snow 1 → tie
  }

  test("v5 dedup quirk preserved: daily means average exactly one row per day") {
    val cleaned = Weather.clean(src) // default: keep-first dedup
    val d1 = Weather.daily(cleaned).head()
    assert(d1.getAs[Double]("daily_avg_temperature") == 10.0) // just the first row
  }

  test("golden full-frame parity (v5 semantics, hand-derived)") {
    // medians over gated values of ALL 7 source rows: temps in-range
    // {10,20,0,5,6} → 6; winds {3,4,10,20,50,60} → 15 (interpolated)
    val cleaned = Weather.clean(src)
    val daily = Weather.daily(cleaned).collect().map(r =>
      (r.getDate(0).toString, r.getDouble(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6), r.getString(7)))
    // v5 dedup keeps the first hourly row per day; daily "averages" are
    // that single row's (imputed) values
    assert(daily.toSeq == Seq(
      ("2020-01-01", 10.0, 9.0, 0.5, 10.0, 10.0, 1000.0, "Light Air"),
      ("2020-01-02", 0.0, -1.0, 0.9, 3.0, 5.0, 995.0, "Calm"),
      ("2020-02-01", 5.0, 4.0, 0.6, 50.0, 9.0, 1020.0, "Strong Breeze"), // 13.89 m/s > 13.8
      ("2020-02-02", 6.0, 5.0, 0.65, 60.0, 9.5, 1021.0, "Strong Breeze")))
    val monthly = Weather.monthly(cleaned).collect().map(r =>
      (r.getString(0), r.getDouble(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), Option(r.getString(6))))
    assert(monthly.toSeq == Seq(
      ("2020-01", 5.0, 4.0, 0.7, 7.5, 997.5, Some("rain")),
      ("2020-02", 5.5, 4.5, 0.625, 9.25, 1020.5, None))) // Feb tie → null
  }

  test("validation gate blocks the sink on the Feb precip tie (all_success semantics)") {
    val out = java.nio.file.Files.createTempDirectory("weather_blocked").toString
    val e = intercept[Validate.ValidationException] {
      Weather.run(spark, resource("weatherHistory.csv"), out)
    }
    assert(e.failed.exists(_.name == "not_null(mode_precipitation_type)"))
    // nothing written before the gate threw
    assert(!new java.io.File(s"$out/daily_weather").exists())
  }

  test("end-to-end run on valid data writes renamed sink tables") {
    val out = java.nio.file.Files.createTempDirectory("weather_out").toString
    val (d, m) = Weather.run(spark, resource("weatherHistory_valid.csv"), out)
    assert(d.columns.contains("Average Temperature (C)") && d.columns.contains("Wind Strength"))
    assert(m.columns.contains("Mode Precipitation Type"))
    assert(spark.read.parquet(s"$out/daily_weather").count() == 2)
    assert(spark.read.parquet(s"$out/monthly_weather").count() == 1)
  }
}
