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
}
