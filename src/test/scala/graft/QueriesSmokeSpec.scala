package graft

/** Every declared query must run and return rows on the tiny fixture,
  * and every oracle key must correspond to a declared query with the
  * same column names the SQL aliases (the driver's compare sorts columns
  * by name — a mismatch hash-fails even on identical values).
  */
class QueriesSmokeSpec extends SparkSpec {

  test("entry flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracle keys are a subset of query keys") {
    val extra = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(extra.isEmpty, s"oracle entries without queries: $extra")
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name runs on sf0.001 and returns rows") {
      val df = fn(spark, sfTiny)
      assert(df.count() > 0, s"$name returned 0 rows")
    }
  }

  test("q08 groups on the raw timestamp: intra-day order times survive") {
    // the shared fixture is date-granular, so this pins the group-key
    // choice (raw o_orderdate, formatted POST-agg — VERDICT r5 item 4)
    // on a fixture where it matters: same calendar day, 08:00 vs 16:00
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft-q08").toString
    Seq((1L, "BUILDING")).toDF("c_custkey", "c_mktsegment")
      .write.parquet(s"$dir/customer.parquet")
    Seq((10L, 1L, "1996-03-01 08:00:00", "1-URGENT"),
        (11L, 1L, "1996-03-01 16:00:00", "2-HIGH"))
      .toDF("o_orderkey", "o_custkey", "d", "o_orderpriority")
      .withColumn("o_orderdate", $"d".cast("timestamp")).drop("d")
      .write.parquet(s"$dir/orders.parquet")
    Seq((10L, "1996-07-01 00:00:00", 1000.0, 0.1),
        (11L, "1996-07-01 00:00:00", 2000.0, 0.0))
      .toDF("l_orderkey", "sd", "l_extendedprice", "l_discount")
      .withColumn("l_shipdate", $"sd".cast("timestamp")).drop("sd")
      .write.parquet(s"$dir/lineitem.parquet")
    val rows = SparkEntry.queries("q08_join_tpch3")(spark, dir)
      .orderBy("l_orderkey").collect()
    assert(rows.length == 2) // intra-day orders stay distinct groups
    // and the output day renders date-granular for both (oracle parity)
    assert(rows.forall(_.getAs[String]("o_orderdate") == "1996-03-01"))
    assert(rows.map(_.getAs[Double]("revenue")).toSeq == Seq(900.0, 2000.0))
  }
}
