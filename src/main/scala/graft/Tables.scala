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
  /** Run `body` with the legacy ns-as-long parquet conf set, restoring
    * the previous value after. The conf is consulted when the relation
    * is RESOLVED (schema conversion), not at execution: frames built
    * inside survive the restore (verified for batch count and a full
    * streaming drain), so the engine never leaves a session-global
    * behavior change behind for other ns-parquet reads (VERDICT r2 §9).
    */
  def withNanosAsLong[T](s: SparkSession)(body: => T): T = {
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val prev = s.conf.getOption(key)
    s.conf.set(key, "true")
    try body
    finally prev match {
      case Some(v) => s.conf.set(key, v)
      case None    => s.conf.unset(key)
    }
  }

  /** events.ts has shipped in two physical encodings across fixture
    * generations: parquet timestamp[ns] (which Spark's vectorized reader
    * rejects with [PARQUET_TYPE_ILLEGAL] — read as raw nanos via the
    * legacy conf and truncate: FIXTURES.md "ns → truncates to µs in
    * Spark; compare at µs") and native timestamp[us]. Adapt on the
    * RESOLVED type so both generations load; either way the column
    * comes out as µs TimestampType (session tz = UTC), the type every
    * downstream query and oracle was gated against. `div` is integer
    * division, so no double-precision loss on ~1.7e18 ns values.
    */
  def events(s: SparkSession, d: String): DataFrame = withNanosAsLong(s) {
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case _ =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.col("ts").cast(org.apache.spark.sql.types.TimestampType))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Conditionally hash-spread rows across all cores before per-row
    * heavy work (minhash, n-grams). Parquet cannot split inside a row
    * group, so a single-row-group file scans as ONE task and UDF work
    * runs single-threaded — but the fan-out shuffle only pays for
    * itself when there is real work per core. Measured at sf0.1 (warm,
    * 3 reps): unconditional spread was 0.5–1.1 s SLOWER per query than
    * the single-task scan — the "single-core bottleneck" seen cold was
    * JIT warmup, not compute. So spread engages only when the input is
    * both under-partitioned (fewer splits than cores) and large enough
    * (> minBytesPerCore per core, from optimizer stats — no job runs).
    * The explicit partition count matters: a bare `repartition(col)`
    * gets coalesced back to one partition by AQE's advisory size.
    */
  def spread(df: DataFrame, key: String,
      minBytesPerCore: Long = 4L << 20): DataFrame = {
    val cores = df.sparkSession.sparkContext.defaultParallelism
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val parts = df.rdd.getNumPartitions
    if (parts < cores && bytes > BigInt(cores) * minBytesPerCore)
      df.repartition(cores, org.apache.spark.sql.functions.col(key))
    else df
  }

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
