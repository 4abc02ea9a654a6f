// A/B: current pageRankPpb formulation vs restructured V2 (r17 opt):
// measured-|V| guarded broadcast of ranks + zero/base-row union folded
// into the per-round aggregation (no per-round LEFT joins).
// Tooling only -- not engine code.
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
  val pairs = li.join(ord, col("l_orderkey") === col("o_orderkey"))
    .select(col("o_custkey").as("c"), (col("l_suppkey") + 1000000L).as("sn"))
    .distinct()
  pairs.select(col("c").as("src"), col("sn").as("dst"))
    .union(pairs.select(col("sn").as("src"), col("c").as("dst")))
}

// ---- V1: copy of current pageRankPpb ----
def prV1(edges0: DataFrame, iterations: Int, dampingPct: Int): DataFrame = {
  val e = edges0.select(col("src").cast("long").as("src"),
    col("dst").cast("long").as("dst")).persist()
  val deg = e.groupBy("src").agg(count(lit(1)).as("odeg")).persist()
  val ed = e.join(deg, "src").persist()
  val nodes = e.select(col("src").as("node"))
    .union(e.select(col("dst").as("node"))).distinct().persist()
  val basePpb = (100L - dampingPct) * 1000000000L / 100L
  var ranks = nodes.select(col("node"), lit(1000000000L).as("rank_ppb"))
  var i = 0
  while (i < iterations) {
    val contrib = ed.join(ranks.withColumnRenamed("node", "src"), "src")
      .select(col("dst").as("node"), expr("rank_ppb div odeg").as("c"))
      .groupBy("node").agg(sum(col("c")).as("s"))
    ranks = nodes.join(contrib, Seq("node"), "left")
      .select(col("node"),
        (lit(basePpb) + expr(s"($dampingPct * coalesce(s, 0L)) div 100"))
          .as("rank_ppb"))
      .localCheckpoint(true)
    i += 1
  }
  val out = ranks.localCheckpoint(true)
  e.unpersist(blocking = false); deg.unpersist(blocking = false)
  ed.unpersist(blocking = false); nodes.unpersist(blocking = false)
  out
}

// ---- V2: guarded broadcast ranks + zero-row union agg ----
def prV2(edges0: DataFrame, iterations: Int, dampingPct: Int): DataFrame = {
  val e = edges0.select(col("src").cast("long").as("src"),
    col("dst").cast("long").as("dst")).persist()
  val deg = e.groupBy("src").agg(count(lit(1)).as("odeg")).persist()
  val ed = e.join(deg, "src").persist()
  val nodes = e.select(col("src").as("node"))
    .union(e.select(col("dst").as("node"))).distinct().persist()
  val nV = nodes.count()
  val bcastOk = nV * 64L < spark.conf
    .get("spark.sql.autoBroadcastJoinThreshold").toLong
  val basePpb = (100L - dampingPct) * 1000000000L / 100L
  var ranks = nodes.select(col("node"), lit(1000000000L).as("rank_ppb"))
  var i = 0
  while (i < iterations) {
    val ranked = ranks.withColumnRenamed("node", "src")
    ranks = ed.join(if (bcastOk) broadcast(ranked) else ranked, "src")
      .select(col("dst").as("node"), expr("rank_ppb div odeg").as("c"))
      .unionByName(nodes.select(col("node"), lit(0L).as("c")))
      .groupBy("node").agg(sum(col("c")).as("s"))
      .select(col("node"),
        (lit(basePpb) + expr(s"($dampingPct * s) div 100")).as("rank_ppb"))
      .localCheckpoint(true)
    i += 1
  }
  e.unpersist(blocking = false); deg.unpersist(blocking = false)
  ed.unpersist(blocking = false); nodes.unpersist(blocking = false)
  ranks
}

def purge(): Unit = {
  spark.catalog.clearCache()
  spark.sparkContext.getPersistentRDDs.foreach(_._2.unpersist(blocking = false))
}

val r1 = prV1(edges(), 3, 85).orderBy("node").collect().toSeq
purge()
val r2 = prV2(edges(), 3, 85).orderBy("node").collect().toSeq
purge()
println(s"[ab] identical=${r1 == r2} rows=${r1.size}")

def time(f: => DataFrame): Double = {
  val t0 = System.nanoTime()
  f.queryExecution.toRdd.foreach(_ => ())
  val s = (System.nanoTime() - t0) / 1e9
  purge(); s
}
val t1s = scala.collection.mutable.ArrayBuffer.empty[Double]
val t2s = scala.collection.mutable.ArrayBuffer.empty[Double]
(1 to rounds).foreach { r =>
  val a = time(prV1(edges(), 3, 85)
    .orderBy(col("rank_ppb").desc, col("node")).limit(100))
  val b = time(prV2(edges(), 3, 85)
    .orderBy(col("rank_ppb").desc, col("node")).limit(100))
  t1s += a; t2s += b
  println(f"[ab] round $r V1 ${a}%7.3f s   V2 ${b}%7.3f s")
}
println(f"[ab] MIN V1 ${t1s.min}%7.3f   V2 ${t2s.min}%7.3f  ratio ${t1s.min / t2s.min}%5.2f")
sys.exit(0)
