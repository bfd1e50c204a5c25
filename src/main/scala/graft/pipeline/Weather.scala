package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{Aggregates, Classify, Cleaning, Sinks, Validate}
import graft.schema.Schemas

/** Full v5-parity weather pipeline (extract→clean→transform→validate→
  * load, /root/reference/v5_group_project_dag.py:377) as ONE lazy Spark
  * plan per sink — the reference's per-task CSV materialization + XCom
  * path hand-off disappears under lazy evaluation (SURVEY.md §3.4).
  *
  * Semantic pins (documented divergences are bugs we refuse to copy,
  * SURVEY.md §2.11):
  *  - date = wall-clock date of the original %z offset (pandas
  *    `.date()` keeps the parsed offset's calendar day) → substring
  *    parse, not tz-normalized to_date
  *  - gates: temps strict (−50,50); humidity [0,1]; wind [0,408];
  *    visibility ≥0; pressure [870,1083.8] (v5:79-84)
  *  - medians computed AFTER gating (v5:87-94), dedup keep-first in file
  *    order AFTER imputation (v5:97)
  *  - daily wind strength = deterministic mode of classify_wind;
  *    monthly precip = strict mode (tie → null)
  *  - exact-case sink renames (the reference's "Wind strength" vs DDL
  *    "Wind Strength" mismatch only works because SQLite is
  *    case-insensitive — we pin the DDL casing)
  */
object Weather {

  final case class Conf(
      dedupKeyFirst: Boolean = true, // v5 parity; false = v1 semantics
      singleFileCsv: Boolean = false,
      writeHistory: Boolean = false) // v2 also lands the full cleaned table

  val measureGates: Map[String, Cleaning.Bounds] = Map(
    "Temperature (C)" -> Cleaning.Bounds.open(-50, 50),
    "Apparent Temperature (C)" -> Cleaning.Bounds.open(-50, 50),
    "Humidity" -> Cleaning.Bounds.closed(0, 1),
    "Wind Speed (km/h)" -> Cleaning.Bounds.closed(0, 408),
    "Visibility (km)" -> Cleaning.Bounds.atLeast(0),
    "Pressure (millibars)" -> Cleaning.Bounds.closed(870, 1083.8))

  val imputeCols: Seq[String] = Seq(
    "Temperature (C)", "Apparent Temperature (C)", "Humidity", "Wind Speed (km/h)",
    "Wind Bearing (degrees)", "Visibility (km)", "Loud Cover", "Pressure (millibars)")

  def read(spark: SparkSession, csvPath: String): DataFrame =
    spark.read.option("header", "true").schema(Schemas.weatherCsv).csv(csvPath)

  /** clean_data (v5:68-101): parse date + month, gate ranges to null,
    * median-impute, dedup by date keeping first file-order row.
    */
  def clean(df: DataFrame, conf: Conf = Conf()): DataFrame = {
    val dated = df
      .withColumn("Formatted Date", to_date(substring(col("Formatted Date"), 1, 10)))
      .withColumn("Month", date_format(col("Formatted Date"), "yyyy-MM"))
    val gated = Cleaning.rangeGateToNull(dated, measureGates)
    val imputed = Cleaning.medianImpute(gated, imputeCols)
    if (conf.dedupKeyFirst) Cleaning.dedupKeepFirstFileOrder(imputed, Seq("Formatted Date"))
    else imputed
  }

  /** transform_data daily half (v5:158-222): per-day means + per-day
    * deterministic mode of wind strength, projected/distinct/sorted.
    */
  def daily(cleaned: DataFrame): DataFrame = {
    val means = Aggregates.groupedMeans(
      cleaned, Seq("Formatted Date"),
      Map(
        "Temperature (C)" -> "daily_avg_temperature",
        "Apparent Temperature (C)" -> "daily_avg_apparent_temperature",
        "Humidity" -> "daily_avg_humidity",
        "Wind Speed (km/h)" -> "daily_avg_wind_speed",
        "Visibility (km)" -> "daily_avg_visibility",
        "Pressure (millibars)" -> "daily_avg_pressure"))
    val strength = Aggregates.modeDeterministic(
      cleaned.withColumn("wind_strengths", Classify.classifyWind(col("Wind Speed (km/h)"))),
      Seq("Formatted Date"), "wind_strengths", "wind_strength")
    means
      .join(strength, Seq("Formatted Date"), "left")
      .select(
        col("Formatted Date"), col("daily_avg_temperature"),
        col("daily_avg_apparent_temperature"), col("daily_avg_humidity"),
        col("daily_avg_wind_speed"), col("daily_avg_visibility"),
        col("daily_avg_pressure"), col("wind_strength"))
      .orderBy("Formatted Date")
  }

  /** transform_data monthly half: per-month means + strict precip mode. */
  def monthly(cleaned: DataFrame): DataFrame = {
    val means = Aggregates.groupedMeans(
      cleaned, Seq("Month"),
      Map(
        "Temperature (C)" -> "monthly_avg_temperature",
        "Apparent Temperature (C)" -> "monthly_avg_apparent_temperature",
        "Humidity" -> "monthly_avg_humidity",
        "Visibility (km)" -> "monthly_avg_visibility",
        "Pressure (millibars)" -> "monthly_avg_pressure"))
    val precip = Aggregates.modeStrict(cleaned, Seq("Month"), "Precip Type", "mode_precipitation_type")
    means
      .join(precip, Seq("Month"), "left")
      .select(
        col("Month"), col("monthly_avg_temperature"),
        col("monthly_avg_apparent_temperature"), col("monthly_avg_humidity"),
        col("monthly_avg_visibility"), col("monthly_avg_pressure"),
        col("mode_precipitation_type"))
      .orderBy("Month")
  }

  /** validate_data (v5:236-278): the reference's 2 null checks + 5 range
    * checks as one aggregate pass per frame; throws ValidationException
    * before any sink write (≡ trigger_rule=all_success).
    */
  def validate(dailyDf: DataFrame, monthlyDf: DataFrame): (DataFrame, DataFrame) = {
    val d = Validate.gate(
      dailyDf,
      Validate.notNull(dailyDf.columns.toSeq) ++ Seq(
        Validate.inRange("daily_avg_temperature", -50, 50),
        Validate.inRange("daily_avg_humidity", 0, 1),
        Validate.inRange("daily_avg_wind_speed", 0, 408)))
    val m = Validate.gate(
      monthlyDf,
      Validate.notNull(monthlyDf.columns.toSeq) ++ Seq(
        Validate.inRange("monthly_avg_temperature", -50, 50),
        Validate.inRange("monthly_avg_humidity", 0, 1)))
    (d, m)
  }

  /** load_data rename maps (v5:336-356), pinned to the DDL casing. */
  val dailyRenames: Map[String, String] = Map(
    "daily_avg_temperature" -> "Average Temperature (C)",
    "daily_avg_apparent_temperature" -> "Average Apparent Temperature (C)",
    "daily_avg_humidity" -> "Average Humidity",
    "daily_avg_wind_speed" -> "Average Wind Speed (km/h)",
    "daily_avg_visibility" -> "Average Visibility (km)",
    "daily_avg_pressure" -> "Average Pressure (millibars)",
    "wind_strength" -> "Wind Strength")

  val monthlyRenames: Map[String, String] = Map(
    "monthly_avg_temperature" -> "Average Temperature (C)",
    "monthly_avg_apparent_temperature" -> "Average Apparent Temperature (C)",
    "monthly_avg_humidity" -> "Average Humidity",
    "monthly_avg_visibility" -> "Average Visibility",
    "monthly_avg_pressure" -> "Average Pressure",
    "mode_precipitation_type" -> "Mode Precipitation Type")

  /** End-to-end run: csv → cleaned → (daily, monthly) → validate → sink
    * as parquet tables under outDir (the S5 JDBC sink is config-gated;
    * Sinks.jdbc takes the same renamed frames).
    */
  def run(spark: SparkSession, csvPath: String, outDir: String, conf: Conf = Conf()): (DataFrame, DataFrame) = {
    // cleaned feeds 4-5 actions (two validate aggregates + the sinks);
    // persist it once instead of re-running scan+gate+impute+dedup per
    // action — the lazy-plan story holds WITHIN each action, reuse
    // ACROSS actions needs an explicit persist
    val cleaned = clean(read(spark, csvPath), conf).persist()
    try {
      val (d, m) = validate(daily(cleaned), monthly(cleaned))
      val dOut = Sinks.renamed(d, dailyRenames)
      val mOut = Sinks.renamed(m, monthlyRenames)
      Sinks.parquet(dOut, s"$outDir/daily_weather")
      Sinks.parquet(mOut, s"$outDir/monthly_weather")
      // v2 parity (v2_group_project_dag.py:281-298,333): full-history table
      if (conf.writeHistory) Sinks.parquet(cleaned, s"$outDir/weather_history")
      (dOut, mOut)
    } finally cleaned.unpersist()
  }
}
