package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.Formats

/** §2.1 source/sink specs: golden round-trips (write→read→full equality,
  * the reference's strategy in [io/tests/test_parquet.py] etc.) plus
  * scan-level checks that pruning actually reaches the physical plan.
  */
class SourcesSpec extends SparkSpec {

  private def tmp(name: String) =
    s"${System.getProperty("java.io.tmpdir")}/graft-spec/$name"

  private def assertSameRows(a: DataFrame, b: DataFrame): Unit = {
    val ka = a.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    val kb = b.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    assert(ka == kb)
  }

  test("csv round-trip preserves every row") {
    val src = Tables.supplier(spark, sfTiny)
    Formats.writeCsv(src, tmp("csv"))
    val back = Formats.readCsv(spark, tmp("csv"), StructType(Seq(
      StructField("s_suppkey", LongType), StructField("s_name", StringType),
      StructField("s_nationkey", IntegerType), StructField("s_acctbal", DoubleType))))
    assertSameRows(src, back)
  }

  test("json round-trip preserves rows with pinned schema") {
    val src = Tables.nation(spark, sfTiny)
    Formats.writeJson(src, tmp("json"))
    val back = Formats.readJson(spark, tmp("json"), src.schema)
    assertSameRows(src, back)
  }

  test("orc round-trip preserves rows") {
    val src = Tables.customer(spark, sfTiny)
    Formats.writeOrc(src, tmp("orc"))
    assertSameRows(src, Formats.readOrc(spark, tmp("orc")))
  }

  test("text reader reads one row per line") {
    val src = Tables.region(spark, sfTiny).select(col("r_name").as("value"))
    src.write.mode("overwrite").text(tmp("text"))
    assertSameRows(src, Formats.readText(spark, tmp("text")))
  }

  test("hive-partitioned parquet read prunes partitions in the plan") {
    val src = Tables.lineitem(spark, sfTiny)
      .select("l_orderkey", "l_quantity", "l_returnflag")
    val back = Formats.roundTripPartitioned(spark, src, tmp("ppart"), "l_returnflag")
      .filter(col("l_returnflag") === "R")
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("l_returnflag"))
    assert(back.count() ==
      src.filter(col("l_returnflag") === "R").count())
  }

  test("parquet scan pushes filters and prunes columns") {
    val df = Tables.lineitem(spark, sfTiny)
      .filter(col("l_quantity") > 45)
      .select("l_orderkey", "l_quantity")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,45.0)]"))
    assert(plan.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"))
  }
}
