package graft

import org.apache.spark.sql.functions._

/** Bucketed co-located joins (SURVEY §6 / §2.3 "sorted/divisions merge"
  * analog): pre-bucketing both sides on the join key removes the
  * Exchange from every subsequent join — dask-cudf's co-divisioned
  * partition-aligned merge, persisted into the table layout. At 100 TB
  * this converts the recurring fact⋈fact shuffle into a one-time write
  * cost.
  */
class BucketingSpec extends SparkSpec {

  private def dropTable(name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    val loc = new java.io.File(
      s"${System.getProperty("java.io.tmpdir")}/graft-warehouse/$name")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles.foreach(rm)
      f.delete(); ()
    }
    if (loc.exists) rm(loc)
  }

  test("bucketed tables join without a shuffle exchange") {
    val n = 8
    dropTable("li_bucketed")
    dropTable("ord_bucketed")
    Tables.lineitem(spark, sfTiny).select("l_orderkey", "l_quantity")
      .write.mode("overwrite").format("parquet")
      .bucketBy(n, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("li_bucketed")
    Tables.orders(spark, sfTiny).select("o_orderkey", "o_totalprice")
      .withColumnRenamed("o_orderkey", "l_orderkey")
      .write.mode("overwrite").format("parquet")
      .bucketBy(n, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("ord_bucketed")

    // merge hint: the point is the shuffle-free sort-merge join path
    // (broadcast would hide the bucketing benefit on these tiny fixtures)
    val joined = spark.table("li_bucketed").hint("merge")
      .join(spark.table("ord_bucketed"), "l_orderkey")
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString

    assert(plan.contains("SortMergeJoin") && !plan.contains("Exchange"),
      s"bucketed join should be shuffle-free, got:\n${plan.take(800)}")
    // same rows as the shuffled join on the raw files
    val expected = Tables.lineitem(spark, sfTiny)
      .join(Tables.orders(spark, sfTiny),
        col("l_orderkey") === col("o_orderkey")).count()
    assert(joined.count() == expected)
  }

  test("bucketed scan prunes buckets for point lookups") {
    // autoBucketedScan turns bucketed reading off for filter-only plans;
    // force it on to exercise bucket pruning
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try {
      val df = spark.table("li_bucketed").filter(col("l_orderkey") === 42)
      val plan = df.queryExecution.executedPlan.toString
      // Spark annotates the scan with the selected bucket subset
      assert(plan.contains("SelectedBucketsCount: 1 out of 8"), plan.take(600))
    } finally
      spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "true")
  }
}
