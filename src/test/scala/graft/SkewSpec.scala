package graft

import org.apache.spark.sql.functions._
import graft.ops.Skew

/** Salting must be result-invariant: salted agg/join equal their plain
  * counterparts on skewed data (one hot key carrying most rows).
  */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  private lazy val skewed = (1 to 1000).map(i => ("hot", i.toDouble)) ++
    Seq(("a", 1.0), ("b", 2.0), ("b", 3.0))

  test("saltedAgg equals plain groupBy on skewed keys") {
    val df = skewed.toDF("k", "v").repartition(7)
    val salted = Skew.saltedAgg(df, Seq("k"), "v", salts = 16)
      .select($"k", $"n", $"sum_v", $"min_v", $"max_v")
      .collect().map(_.toSeq).sortBy(_.head.toString).toSeq
    val plain = df.groupBy($"k")
      .agg(count(lit(1)).as("n"), sum($"v").as("sum_v"),
        min($"v").as("min_v"), max($"v").as("max_v"))
      .collect().map(_.toSeq).sortBy(_.head.toString).toSeq
    assert(salted == plain)
  }

  test("saltedJoin returns exactly the plain join's rows") {
    val left = skewed.toDF("k", "v").repartition(5)
    val right = Seq(("hot", 10), ("a", 20), ("c", 30)).toDF("k", "w")
    val salted = Skew.saltedJoin(left, right, "k")
      .groupBy($"k").agg(count(lit(1)).as("n"), sum($"w").as("sw"))
      .collect().map(_.toSeq).sortBy(_.head.toString).toSeq
    val plain = left.join(right, Seq("k"))
      .groupBy($"k").agg(count(lit(1)).as("n"), sum($"w").as("sw"))
      .collect().map(_.toSeq).sortBy(_.head.toString).toSeq
    assert(salted == plain)
  }

  test("connectedComponents labels a chain and separate cliques correctly") {
    // chain 1-2-3-4 (diameter 3, needs >1 iteration), clique 10-11-12, pair 20-21
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (10L, 12L),
      (11L, 12L), (20L, 21L)).toDF("id_a", "id_b")
    val got = graft.ops.Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("salted agg spreads a hot key across reducers in phase 1") {
    val df = skewed.toDF("k", "v").repartition(7)
    val salts = df.withColumn("__salt",
        pmod(spark_partition_id() + monotonically_increasing_id(), lit(16)))
      .filter($"k" === "hot").select("__salt").distinct().count()
    assert(salts > 4) // hot key occupies many salt buckets, not one
  }
}
