// r18 A/B: hitsMilli residual (r17 VERDICT item 7). V2 = the shipped
// r17 loop (one eager localCheckpoint per HALF-step, 12 actions at 6
// iterations). V4 = one checkpoint per FULL iteration: the auth
// half-step stays un-materialized inside the hub half-step's plan (its
// aggregation subtree appears twice — under the rescale max and under
// the projection — and is deduped by exchange/stage reuse within the
// one execution); only the LAST iteration checkpoints auth too, so the
// final join does not re-execute a half-step. Halves the action count
// per iteration — the honest version of the rejected AQE-off lever
// (fewer per-action plannings, no session-conf mutation).
// Interleaved min-of-N; identity assert first. Tooling only.
//   spark-shell --driver-memory 8g --jars target/scala-2.13/daskcudfspark_2.13-0.1.0.jar \
//     -i scripts/ab_hitsmilli_r18.scala
import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions._

val sfDir = sys.props.getOrElse("graft.ab.sf", "/root/testdata/sf0.1")
val rounds = sys.props.getOrElse("graft.ab.rounds", "5").toInt
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
def weighted(df: DataFrame): DataFrame =
  df.select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"),
    lit(1L).as("w"))

// ---- V4: one checkpoint per iteration ----------------------------------
def loopV4(edgesW: DataFrame, iterations: Int): DataFrame = {
  val e = edgesW.persist()
  val nodes = e.select(col("src").as("node"))
    .union(e.select(col("dst").as("node"))).distinct().persist()
  val nV = nodes.count()
  val bcastOk = nV * 64L < spark.conf.get("spark.sql.autoBroadcastJoinThreshold").toLong
  def summed(prev: DataFrame, prevC: String, joinKey: String,
      outKey: String): DataFrame = {
    val ranked = prev.withColumnRenamed("node", joinKey)
    e.join(if (bcastOk) broadcast(ranked) else ranked, joinKey)
      .select(col(outKey).as("node"), (col(prevC) * col("w")).as("x"))
      .unionByName(nodes.select(col("node"), lit(0L).as("x")))
      .groupBy(col("node")).agg(sum(col("x")).as("x"))
  }
  def rescale(s: DataFrame, outC: String): DataFrame =
    s.crossJoin(broadcast(s.agg(max(col("x")).as("m"))))
      .select(col("node"),
        when(col("m") === 0, lit(0L))
          .otherwise(expr("(x * 1000) div m")).as(outC))
  var hub: DataFrame = nodes.select(col("node"), lit(1000L).as("h"))
  var auth: DataFrame = null
  var i = 0
  while (i < iterations) {
    val aS0 = summed(hub, "h", "src", "dst")
    val aS = if (i == iterations - 1) aS0.localCheckpoint(true) else aS0
    auth = rescale(aS, "a")
    val hS = summed(auth, "a", "dst", "src").localCheckpoint(true)
    hub = rescale(hS, "h")
    i += 1
  }
  val out = auth.join(hub, Seq("node"))
    .select(col("node"), col("a").as("auth_milli"), col("h").as("hub_milli"))
  e.unpersist(blocking = false)
  nodes.unpersist(blocking = false)
  out
}

def purge(): Unit = {
  spark.catalog.clearCache()
  spark.sparkContext.getPersistentRDDs.foreach(_._2.unpersist(blocking = false))
}

def lib(edgesW: DataFrame): DataFrame =
  graft.ops.Graph.hitsMilli(edgesW, "src", "dst", iterations = 6)

// identity
val r1 = lib(edges()).orderBy("node").collect().toSeq
purge()
val r2 = loopV4(weighted(edges()), 6).orderBy("node").collect().toSeq
purge()
println(s"[ab] identical=${r1 == r2} rows=${r1.size}")

def time(f: => DataFrame): Double = {
  val t0 = System.nanoTime()
  f.queryExecution.toRdd.foreach(_ => ())
  val s = (System.nanoTime() - t0) / 1e9
  purge(); s
}
val t2s = scala.collection.mutable.ArrayBuffer.empty[Double]
val t4s = scala.collection.mutable.ArrayBuffer.empty[Double]
(1 to rounds).foreach { r =>
  val a = time(lib(edges()).orderBy(col("auth_milli").desc, col("node")).limit(100))
  val b = time(loopV4(weighted(edges()), 6)
    .orderBy(col("auth_milli").desc, col("node")).limit(100))
  t2s += a; t4s += b
  println(f"[ab] round $r V2(lib) ${a}%7.3f s   V4(batched) ${b}%7.3f s")
}
println(f"[ab] MIN V2 ${t2s.min}%7.3f   V4 ${t4s.min}%7.3f")
sys.exit(0)
