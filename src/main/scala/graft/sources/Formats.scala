package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Source/sink surface — SURVEY.md §2.1. The reference's readers build
  * one task per file/byte-range bundle ([python/dask_cudf/dask_cudf/io/
  * parquet.py :: CudfEngine.read_partition], [io/csv.py ::
  * _internal_read_csv] byte-range chunking, [io/json.py :: read_json]
  * JSON-lines, [io/orc.py], [io/text.py :: read_text]); Spark's
  * DataSource V2 scans do the same splitting natively
  * (spark.sql.files.maxPartitionBytes), with projection/predicate
  * pushdown from Catalyst. These wrappers pin the reference's option
  * surface (blocksize ≈ maxPartitionBytes, usecols ≈ select, dtype ≈
  * schema) onto idiomatic `spark.read`.
  *
  * At 100 TB: every reader here is a distributed scan; every writer is a
  * per-partition parallel write (one file per task), with
  * `partition_on` ≈ `partitionBy` giving hive-style layout whose
  * partition values Catalyst prunes at read time.
  */
object Formats {

  // ---- readers ------------------------------------------------------

  def readParquet(spark: SparkSession, path: String,
                  columns: Seq[String] = Nil): DataFrame = {
    val df = spark.read.parquet(path)
    if (columns.isEmpty) df else df.select(columns.map(col): _*)
  }

  /** read_csv(blocksize≈maxPartitionBytes, names/dtype≈schema, header). */
  def readCsv(spark: SparkSession, path: String, schema: StructType = null,
              header: Boolean = true, sep: String = ","): DataFrame = {
    val r = spark.read.option("header", header).option("sep", sep)
    (if (schema != null) r.schema(schema) else r.option("inferSchema", true)).csv(path)
  }

  /** read_json(lines=True): JSON-lines, schema-on-read or pinned. */
  def readJson(spark: SparkSession, path: String,
               schema: StructType = null): DataFrame = {
    val r = spark.read
    (if (schema != null) r.schema(schema) else r).json(path)
  }

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** read_text: one row per delimiter-split chunk, like [io/text.py ::
    * read_text]. `lineSep` maps the reference's `delimiter`.
    */
  def readText(spark: SparkSession, path: String,
               delimiter: String = "\n"): DataFrame =
    spark.read.option("lineSep", delimiter).text(path)

  // ---- writers ------------------------------------------------------

  def writeParquet(df: DataFrame, path: String,
                   partitionOn: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionOn.isEmpty) w else w.partitionBy(partitionOn: _*)).parquet(path)
  }

  def writeCsv(df: DataFrame, path: String, header: Boolean = true): Unit =
    df.write.mode("overwrite").option("header", header).csv(path)

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  /** Hive-partitioned parquet round-trip helper: write partitioned on
    * `partitionOn`, read back, verifying partition-column recovery.
    * Mirrors to_parquet(partition_on=...) [io/parquet.py :: to_parquet].
    */
  def roundTripPartitioned(spark: SparkSession, df: DataFrame, path: String,
                           partitionOn: String): DataFrame = {
    writeParquet(df, path, Seq(partitionOn))
    spark.read.parquet(path)
  }
}
