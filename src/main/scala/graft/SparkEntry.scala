package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the executable operator inventory of SURVEY.md §2: every
  * implemented operator has an entry here and (where SQL-expressible) a
  * DuckDB oracle in `oracleSql`. Query groups live in graft.queries.*.
  */
object SparkEntry {

  private val groups: Seq[QueryGroup] = Seq(
    RelationalQueries,
    StringQueries,
    DatetimeQueries,
    NestedQueries,
    WindowQueries,
    UdfQueries,
    LlmQueries,
    CorpusQueries,
    ScaleJoinQueries,
    StreamingQueries,
    SourceQueries,
    AsofQueries,
    GraphQueries,
    TpchQueries
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.queries("q01_agg_tpch1")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    groups.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    groups.flatMap(_.oracle).toMap
}
