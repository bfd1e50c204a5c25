package graft.ops

import graft.SparkSuite

class SinksSpec extends SparkSuite {
  import spark.implicits._

  test("jdbc sink round-trips through embedded Derby (S5: DDL + append)") {
    val db = java.nio.file.Files.createTempDirectory("graft_derby").resolve("db")
    val url = s"jdbc:derby:$db;create=true"
    val props = new java.util.Properties()
    props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    val df = Seq((1L, "a", 1.5), (2L, "b", 2.5)).toDF("id", "name", "x")
    Sinks.jdbc(df, url, "t_weather", props) // creates table, appends
    Sinks.jdbc(df, url, "t_weather", props) // append again (if_exists='append')
    val back = spark.read.jdbc(url, "t_weather", props)
    assert(back.count() == 4)
    assert(back.agg(org.apache.spark.sql.functions.sum($"x")).head().getDouble(0) == 8.0)
  }

  test("csv singleFile compat mode writes exactly one part file with header") {
    val dir = java.nio.file.Files.createTempDirectory("graft_csv").toString + "/out"
    val df = Seq((1, "x"), (2, "y")).toDF("a", "b")
    Sinks.csv(df, dir, singleFile = true)
    val parts = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".csv"))
    assert(parts.length == 1)
    val lines = scala.io.Source.fromFile(parts.head).getLines().toSeq
    assert(lines.head == "a,b" && lines.size == 3)
  }

  test("renamed applies exact-case mappings only") {
    val df = Seq((1.0, "s")).toDF("daily_avg_temperature", "wind_strength")
    val out = Sinks.renamed(df, Map(
      "daily_avg_temperature" -> "Average Temperature (C)",
      "wind_strength" -> "Wind Strength"))
    assert(out.columns.toSeq == Seq("Average Temperature (C)", "Wind Strength"))
  }
}
