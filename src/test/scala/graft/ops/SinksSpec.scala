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

  test("json round-trip preserves rows and schema-on-read types") {
    val dir = java.nio.file.Files.createTempDirectory("graft_json").toString + "/out"
    val df = graft.Tables.load(spark, sf0001, "nation")
    Sinks.json(df, dir)
    val back = spark.read.json(dir)
    assert(back.count() == df.count())
    assert(back.select("n_nationkey", "n_name").distinct().count() == df.count())
  }

  test("orc round-trip preserves rows and supports predicate pushdown") {
    val dir = java.nio.file.Files.createTempDirectory("graft_orc").toString + "/out"
    val df = graft.Tables.load(spark, sf0001, "orders")
    Sinks.orc(df, dir)
    val back = spark.read.orc(dir).filter(org.apache.spark.sql.functions.col("o_orderstatus") === "O")
    assert(back.count() ==
      df.filter(org.apache.spark.sql.functions.col("o_orderstatus") === "O").count())
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [") && plan.contains("o_orderstatus"), plan)
  }

  test("parquet schema evolution: mergeSchema unions batch schemas") {
    val dir = java.nio.file.Files.createTempDirectory("graft_evo").toString + "/out"
    Seq((1, "a")).toDF("id", "v1").write.parquet(s"$dir/b=1")
    Seq((2, 9.5)).toDF("id", "v2").write.parquet(s"$dir/b=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.toSet == Set("id", "v1", "v2", "b"))
    assert(merged.count() == 2)
  }

  test("malformed CSV rows: PERMISSIVE captures them, DROPMALFORMED drops them") {
    val dir = java.nio.file.Files.createTempDirectory("graft_badcsv")
    val f = dir.resolve("data.csv")
    java.nio.file.Files.writeString(f,
      "id,x\n1,10\n2,not_a_number\n3,30\n")
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "id INT, x INT, _corrupt STRING")
    val permissive = spark.read
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .schema(schema)
      .csv(f.toString)
      .cache() // corrupt-record column requires materialization before filter
    assert(permissive.count() == 3)
    assert(permissive.filter(org.apache.spark.sql.functions.col("_corrupt").isNotNull)
      .count() == 1)
    val dropped = spark.read
      .option("header", "true")
      .option("mode", "DROPMALFORMED")
      .schema(org.apache.spark.sql.types.StructType.fromDDL("id INT, x INT"))
      .csv(f.toString)
    // count() alone prunes every column, so the malformed field is never
    // parsed and nothing is dropped — materialize the full rows
    assert(dropped.collect().length == 2)
    permissive.unpersist()
  }

  test("compactParquet rewrites many small files into few, row-identical") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact").toString
    val li = graft.Tables.load(spark, sf0001, "lineitem")
    // land deliberately fragmented: one file per shuffle partition
    li.repartition(40).write.parquet(s"$dir/small")
    def partFiles(p: String) = new java.io.File(p)
      .listFiles().count(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    assert(partFiles(s"$dir/small") == 40)
    val n = Sinks.compactParquet(spark, s"$dir/small", s"$dir/compacted", targetMb = 64)
    assert(partFiles(s"$dir/compacted") == n && n < 40)
    // row-identical after the rewrite
    val a = spark.read.parquet(s"$dir/small").count()
    val b = spark.read.parquet(s"$dir/compacted").count()
    assert(a == b && b == li.count())
  }

  test("renamed applies exact-case mappings only") {
    val df = Seq((1.0, "s")).toDF("daily_avg_temperature", "wind_strength")
    val out = Sinks.renamed(df, Map(
      "daily_avg_temperature" -> "Average Temperature (C)",
      "wind_strength" -> "Wind Strength"))
    assert(out.columns.toSeq == Seq("Average Temperature (C)", "Wind Strength"))
  }
}
