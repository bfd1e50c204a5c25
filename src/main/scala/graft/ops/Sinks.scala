package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Sinks (S3/S4/S5). The reference lands single CSV files and appends into
  * SQLite with a column-rename pass (v5_group_project_dag.py:291-365).
  *
  * Spark-native defaults: parquet directories, partitioned where the
  * downstream read pattern benefits. CSV `singleFile` (coalesce(1)) exists
  * only for byte-parity with the reference — never use it at scale.
  * The JDBC sink is config-gated (no JDBC driver jar is guaranteed in the
  * sandbox); `saveAsTable` over parquet is the default relational sink.
  */
object Sinks {

  /** P3: bulk rename before a relational sink (exact-case; the reference
    * relies on SQLite case-insensitivity to paper over a mismatch at
    * v5_group_project_dag.py:344 vs :313 — we do not).
    */
  def renamed(df: DataFrame, renames: Map[String, String]): DataFrame =
    renames.foldLeft(df) { case (d, (from, to)) => d.withColumnRenamed(from, to) }

  def csv(df: DataFrame, path: String, singleFile: Boolean = false): Unit = {
    val d = if (singleFile) df.coalesce(1) else df
    d.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)
  }

  def parquet(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  /** JSON-lines sink (one object per line — the interchange format most
    * curation pipelines exchange; schema travels in the data).
    */
  def json(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  /** ORC sink (columnar alternative where the downstream stack is
    * Hive/Trino-flavored; same pushdown/pruning properties as parquet).
    */
  def orc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)

  def table(df: DataFrame, name: String, mode: SaveMode = SaveMode.Append): Unit =
    df.write.mode(mode).saveAsTable(name)

  def jdbc(df: DataFrame, url: String, table: String, props: java.util.Properties): Unit =
    df.write.mode(SaveMode.Append).jdbc(url, table, props)
}
