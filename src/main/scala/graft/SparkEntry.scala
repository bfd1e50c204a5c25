package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is assembled from per-family modules under graft.queries; each
  * entry pairs a Spark plan with a DuckDB-runnable oracle (where the op is
  * SQL-expressible). See QueryDef for the determinism contract.
  */
object SparkEntry {

  private def registry: Seq[graft.queries.QueryDef] =
    graft.queries.Core.all ++ graft.queries.Joins.all ++
      graft.queries.Windows.all ++ graft.queries.Events.all ++
      graft.queries.TextQueries.all ++ graft.queries.EmbeddingQueries.all ++
      graft.queries.Extended.all ++ graft.queries.Extended2.all ++
      graft.queries.Extended3.all ++ graft.queries.Extended4.all ++
      graft.queries.Extended5.all ++ graft.queries.Extended6.all ++
      graft.queries.Extended7.all ++ graft.queries.Extended8.all ++
      graft.queries.Extended9.all ++ graft.queries.Extended10.all ++
      graft.queries.Extended11.all ++ graft.queries.Extended12.all ++
      graft.queries.Extended13.all ++ graft.queries.Extended14.all ++
      graft.queries.Extended15.all ++ graft.queries.Extended16.all ++
      graft.queries.Extended17.all ++ graft.queries.Extended18.all ++
      graft.queries.Extended19.all ++ graft.queries.Extended20.all ++
      graft.queries.Extended21.all ++ graft.queries.Extended22.all ++
      graft.queries.Extended23.all ++ graft.queries.Extended24.all ++
      graft.queries.Extended25.all ++ graft.queries.Extended26.all ++
      graft.queries.Extended27.all ++ graft.queries.Extended28.all ++
      graft.queries.Extended29.all ++ graft.queries.Extended30.all ++
      graft.queries.Extended31.all ++ graft.queries.Extended32.all ++
      graft.queries.Extended33.all ++ graft.queries.Extended34.all ++
      graft.queries.Extended35.all ++
      graft.queries.Extended36.all ++ graft.queries.Extended37.all ++ graft.queries.Extended38.all ++ graft.queries.Extended39.all ++ graft.queries.Extended40.all ++
      graft.queries.Extended41.all ++ graft.queries.Extended42.all ++
      graft.queries.Extended43.all ++ graft.queries.Extended44.all ++
      graft.queries.Extended45.all ++ graft.queries.Extended46.all ++
      graft.queries.Extended47.all ++ graft.queries.Extended48.all ++
      graft.queries.Extended49.all ++ graft.queries.Extended50.all ++
      graft.queries.Extended51.all ++ graft.queries.Extended52.all ++
      graft.queries.Extended53.all ++ graft.queries.Extended54.all ++
      graft.queries.Extended55.all ++ graft.queries.Extended56.all ++
      graft.queries.Extended57.all ++ graft.queries.Extended58.all ++
      graft.queries.Extended59.all ++ graft.queries.Extended60.all ++
      graft.queries.Extended61.all ++ graft.queries.Extended62.all ++
      graft.queries.Extended63.all ++ graft.queries.Extended64.all ++
      graft.queries.Extended65.all ++ graft.queries.Extended66.all ++
      graft.queries.Extended67.all ++ graft.queries.Extended68.all ++
      graft.queries.Extended69.all ++ graft.queries.Extended70.all ++
      graft.queries.Extended71.all ++ graft.queries.Extended72.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's daily-aggregate shape (v5_group_project_dag.py:167-172)
    * over lineitem.
    */
  def entry(spark: SparkSession): DataFrame =
    spark.read
      .parquet("/root/testdata/sf0.001/lineitem.parquet")
      .groupBy(date_format(col("l_shipdate"), "yyyy-MM-dd").as("ship_day"))
      .agg(
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(avg(col("l_extendedprice")), 4).as("avg_price"),
        count(lit(1)).as("n_rows"))
      .orderBy("ship_day")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(sql => q.name -> sql)).toMap
}
