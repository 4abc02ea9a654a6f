// A/B: current hitsMilliLoop formulation vs restructured V2 (r17 opt).
// Interleaved in one JVM, min-of-N; asserts identical results first.
// Tooling only -- not engine code.
import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions._

val sfDir = sys.props.getOrElse("graft.ab.sf", "/root/testdata/sf0.1")
val rounds = sys.props.getOrElse("graft.ab.rounds", "3").toInt
spark.sparkContext.setLogLevel("ERROR")
spark.conf.set("spark.sql.shuffle.partitions", "32")
spark.conf.set("spark.sql.adaptive.enabled", "true")
spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (16L * 1024 * 1024).toString)
spark.conf.set("spark.sql.session.timeZone", "UTC")
spark.conf.set("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")

def edges(): DataFrame = {
  val li = spark.read.parquet(s"$sfDir/lineitem.parquet").select(col("l_orderkey"), col("l_suppkey"))
  val ord = spark.read.parquet(s"$sfDir/orders.parquet").select(col("o_orderkey"), col("o_custkey"))
  li.join(ord, col("l_orderkey") === col("o_orderkey"))
    .select(col("o_custkey").as("src"), (col("l_suppkey") + 1000000L).as("dst"))
    .distinct()
}

// ---- current formulation (copy of Graph.hitsMilliLoop) ----
def loopV1(edgesW: DataFrame, iterations: Int): DataFrame = {
  val e = edgesW.persist()
  val nodes = e.select(col("src").as("node"))
    .union(e.select(col("dst").as("node"))).distinct().persist()
  def rescale(df: DataFrame, c: String): DataFrame =
    df.crossJoin(broadcast(df.agg(max(col(c)).as("m"))))
      .select(col("node"),
        when(col("m") === 0, lit(0L))
          .otherwise(expr(s"($c * 1000) div m")).as(c))
  var hub = nodes.select(col("node"), lit(1000L).as("h"))
  var auth: DataFrame = null
  var i = 0
  while (i < iterations) {
    auth = rescale(nodes.join(
        e.join(hub.withColumnRenamed("node", "src"), "src")
          .groupBy(col("dst").as("node"))
          .agg(sum(col("h") * col("w")).as("a")),
        Seq("node"), "left")
      .select(col("node"), coalesce(col("a"), lit(0L)).as("a")), "a")
      .localCheckpoint(true)
    hub = rescale(nodes.join(
        e.join(auth.withColumnRenamed("node", "dst"), "dst")
          .groupBy(col("src").as("node"))
          .agg(sum(col("a") * col("w")).as("h")),
        Seq("node"), "left")
      .select(col("node"), coalesce(col("h"), lit(0L)).as("h")), "h")
      .localCheckpoint(true)
    i += 1
  }
  val out = auth.join(hub, Seq("node"))
    .select(col("node"), col("a").as("auth_milli"), col("h").as("hub_milli"))
  e.unpersist(blocking = false)
  nodes.unpersist(blocking = false)
  out
}

// ---- V2: broadcast rank side (size-guarded), union-zero agg, ----
// ---- checkpoint pre-rescale so max reuses materialized rows  ----
def loopV2(edgesW: DataFrame, iterations: Int): DataFrame = {
  val e = edgesW.persist()
  val nodes = e.select(col("src").as("node"))
    .union(e.select(col("dst").as("node"))).distinct().persist()
  val nV = nodes.count()
  val bcastOk = nV * 16L < spark.conf.get("spark.sql.autoBroadcastJoinThreshold").toLong
  def side(prev: DataFrame, prevC: String, joinKey: String, outKey: String,
      outC: String): DataFrame = {
    val ranked = prev.withColumnRenamed("node", joinKey)
    val r = if (bcastOk) broadcast(ranked) else ranked
    val summed = e.join(r, joinKey)
      .select(col(outKey).as("node"), (col(prevC) * col("w")).as("x"))
      .unionByName(nodes.select(col("node"), lit(0L).as("x")))
      .groupBy(col("node")).agg(sum(col("x")).as("x"))
      .localCheckpoint(true)
    summed.crossJoin(broadcast(summed.agg(max(col("x")).as("m"))))
      .select(col("node"),
        when(col("m") === 0, lit(0L))
          .otherwise(expr("(x * 1000) div m")).as(outC))
  }
  var hub = nodes.select(col("node"), lit(1000L).as("h"))
  var auth: DataFrame = null
  var i = 0
  while (i < iterations) {
    auth = side(hub, "h", "src", "dst", "a")
    hub = side(auth, "a", "dst", "src", "h")
    i += 1
  }
  val out = auth.join(hub, Seq("node"))
    .select(col("node"), col("a").as("auth_milli"), col("h").as("hub_milli"))
  e.unpersist(blocking = false)
  nodes.unpersist(blocking = false)
  out
}

def loopV3(edgesW: DataFrame, iterations: Int): DataFrame = {
  val aqe0 = spark.conf.get("spark.sql.adaptive.enabled")
  val parts0 = spark.conf.get("spark.sql.shuffle.partitions")
  spark.conf.set("spark.sql.adaptive.enabled", "false")
  spark.conf.set("spark.sql.shuffle.partitions", "2")
  try loopV2(edgesW, iterations)
  finally {
    spark.conf.set("spark.sql.adaptive.enabled", aqe0)
    spark.conf.set("spark.sql.shuffle.partitions", parts0)
  }
}

def weighted(df: DataFrame): DataFrame =
  df.select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"),
    lit(1L).as("w"))

def purge(): Unit = {
  spark.catalog.clearCache()
  spark.sparkContext.getPersistentRDDs.foreach(_._2.unpersist(blocking = false))
}

// result identity check (full sorted collect compare at sf0.1)
val r1 = loopV1(weighted(edges()), 6).orderBy("node").collect().toSeq
purge()
val r2 = loopV2(weighted(edges()), 6).orderBy("node").collect().toSeq
purge()
println(s"[ab] identical=${r1 == r2} rows=${r1.size}")

def time(f: => DataFrame): Double = {
  val t0 = System.nanoTime()
  f.queryExecution.toRdd.foreach(_ => ())
  val s = (System.nanoTime() - t0) / 1e9
  purge(); s
}
val r3 = loopV3(weighted(edges()), 6).orderBy("node").collect().toSeq
purge()
println(s"[ab] V3 identical=${r1 == r3}")
val t1s = scala.collection.mutable.ArrayBuffer.empty[Double]
val t2s = scala.collection.mutable.ArrayBuffer.empty[Double]
val t3s = scala.collection.mutable.ArrayBuffer.empty[Double]
(1 to rounds).foreach { r =>
  val a = time(loopV1(weighted(edges()), 6)
    .orderBy(col("auth_milli").desc, col("node")).limit(100))
  val b = time(loopV2(weighted(edges()), 6)
    .orderBy(col("auth_milli").desc, col("node")).limit(100))
  val c = time(loopV3(weighted(edges()), 6)
    .orderBy(col("auth_milli").desc, col("node")).limit(100))
  t1s += a; t2s += b; t3s += c
  println(f"[ab] round $r V1 ${a}%7.3f s   V2 ${b}%7.3f s   V3 ${c}%7.3f s")
}
println(f"[ab] MIN V1 ${t1s.min}%7.3f   V2 ${t2s.min}%7.3f   V3 ${t3s.min}%7.3f")
sys.exit(0)
