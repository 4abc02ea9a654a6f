package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet loaders for the driver-shipped fixture tables (TESTDATA.md).
  *
  * Equivalent of the reference's `dask_cudf.read_parquet` collection
  * constructors [python/dask_cudf/dask_cudf/io/parquet.py :: read_parquet]
  * — here `spark.read.parquet` gives column projection + row-group
  * predicate pushdown for free via the vectorized ParquetScan
  * (SURVEY §2.1). At 100 TB the same call scales by file/row-group
  * splitting governed by spark.sql.files.maxPartitionBytes.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(path(dir, name))

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** events.ts is parquet timestamp[ns], which Spark's vectorized reader
    * rejects ([PARQUET_TYPE_ILLEGAL]). Read it as raw nanos (legacy conf)
    * and truncate to µs TimestampType — FIXTURES.md: "ns → truncates to
    * µs in Spark; compare at µs". `div` is integer division, so no
    * double-precision loss on ~1.7e18 ns values.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Register every fixture table as a temp view (SQL entry point).
    * events must go through its ns→µs reader (see above) — a plain load
    * throws PARQUET_TYPE_ILLEGAL at scan time.
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach { n =>
      val df = if (n == "events") events(spark, dir) else load(spark, dir, n)
      df.createOrReplaceTempView(n)
    }
}
