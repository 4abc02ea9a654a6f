// r18 A/B: labelPropagate (q175, r17 VERDICT item 1). Three variants:
//   V0 = pre-r17 (shuffled join + window argmax)            [reference]
//   V1 = r17 shipped (up-front |seeds|+|distinct dst| guard + per-round
//        broadcast hint + min-struct argmax)         [the regression]
//   V2 = r18 lib (no guard, no hint — single plan, AQE runtime SMJ→BHJ
//        — keep only the min-struct argmax)
// Interleaved min-of-N; identity asserts first. Tooling only.
//   spark-shell --driver-memory 8g --jars target/scala-2.13/daskcudfspark_2.13-0.1.0.jar \
//     -i scripts/ab_lp_r18.scala
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

// q175's exact inputs
def edges(): DataFrame = {
  val li = spark.read.parquet(s"$sfDir/lineitem.parquet").select(col("l_orderkey"), col("l_suppkey"))
  val ord = spark.read.parquet(s"$sfDir/orders.parquet").select(col("o_orderkey"), col("o_custkey"))
  val pairs = li.join(ord, col("l_orderkey") === col("o_orderkey"))
    .select(col("o_custkey").as("c"), (col("l_suppkey") + 1000000L).as("sn"))
    .distinct()
  pairs.select(col("c").as("src"), col("sn").as("dst"))
    .union(pairs.select(col("sn").as("src"), col("c").as("dst")))
}
def seeds(): DataFrame = {
  val cust = spark.read.parquet(s"$sfDir/customer.parquet")
  val nat = spark.read.parquet(s"$sfDir/nation.parquet")
  val reg = spark.read.parquet(s"$sfDir/region.parquet")
  cust.filter(col("c_custkey") % 2 === 0)
    .join(nat, col("c_nationkey") === col("n_nationkey"))
    .join(reg, col("n_regionkey") === col("r_regionkey"))
    .select(col("c_custkey").as("node"), col("r_name").as("label"))
}

def lpV0(edges0: DataFrame, seeds0: DataFrame, iterations: Int): DataFrame = {
  val e = edges0.select(col("src").cast("long").as("src"),
    col("dst").cast("long").as("dst")).persist()
  val s0 = seeds0.select(col("node").cast("long").as("node"),
    col("label").cast("string").as("label")).distinct().persist()
  var assigned = s0.withColumn("seeded", lit(true))
  var i = 0
  while (i < iterations) {
    val votes = e.join(assigned.withColumnRenamed("node", "src"), "src")
      .groupBy(col("dst").as("node"), col("label"))
      .agg(count(lit(1)).as("n_votes"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("node"))
      .orderBy(col("n_votes").desc, col("label"))
    val winners = votes.withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("node"), col("label"), lit(false).as("seeded"))
    assigned = s0.withColumn("seeded", lit(true))
      .unionByName(winners.join(s0.select("node"), Seq("node"), "left_anti"))
    i += 1
  }
  val out = assigned.localCheckpoint(true)
  e.unpersist(blocking = false)
  s0.unpersist(blocking = false)
  out
}

def lpV1(edges0: DataFrame, seeds0: DataFrame, iterations: Int): DataFrame = {
  val e = edges0.select(col("src").cast("long").as("src"),
    col("dst").cast("long").as("dst")).persist()
  val s0 = seeds0.select(col("node").cast("long").as("node"),
    col("label").cast("string").as("label")).distinct().persist()
  val nUb = s0.count() + e.select(col("dst")).distinct().count()
  val bcastOk = nUb * 64L < spark.conf
    .get("spark.sql.autoBroadcastJoinThreshold").toLong
  var assigned = s0.withColumn("seeded", lit(true))
  var i = 0
  while (i < iterations) {
    val voters = assigned.withColumnRenamed("node", "src")
    val votes = e.join(if (bcastOk) broadcast(voters) else voters, "src")
      .groupBy(col("dst").as("node"), col("label"))
      .agg(count(lit(1)).as("n_votes"))
    val winners = votes
      .groupBy(col("node"))
      .agg(min(struct((-col("n_votes")).as("neg"), col("label"))).as("w"))
      .select(col("node"), col("w.label").as("label"), lit(false).as("seeded"))
    assigned = s0.withColumn("seeded", lit(true))
      .unionByName(winners.join(s0.select("node"), Seq("node"), "left_anti"))
    i += 1
  }
  val out = assigned.localCheckpoint(true)
  e.unpersist(blocking = false)
  s0.unpersist(blocking = false)
  out
}

def purge(): Unit = {
  spark.catalog.clearCache()
  spark.sparkContext.getPersistentRDDs.foreach(_._2.unpersist(blocking = false))
}

val r0 = lpV0(edges(), seeds(), 2).orderBy("node", "label").collect().toSeq
purge()
val r1 = lpV1(edges(), seeds(), 2).orderBy("node", "label").collect().toSeq
purge()
val r2 = graft.ops.Graph.labelPropagate(edges(), "src", "dst", seeds(),
  "node", "label", 2).orderBy("node", "label").collect().toSeq
purge()
println(s"[ab] identical V0==V1:${r0 == r1} V0==V2(lib):${r0 == r2} rows=${r0.size}")

def time(f: => DataFrame): Double = {
  val t0 = System.nanoTime()
  f.queryExecution.toRdd.foreach(_ => ())
  val s = (System.nanoTime() - t0) / 1e9
  purge(); s
}
val res = scala.collection.mutable.Map.empty[String, List[Double]].withDefaultValue(Nil)
def rec(k: String, v: Double): Unit = { res(k) = v :: res(k) }
(1 to rounds).foreach { r =>
  rec("V0_window", time(lpV0(edges(), seeds(), 2).orderBy("node")))
  rec("V1_guarded", time(lpV1(edges(), seeds(), 2).orderBy("node")))
  rec("V2_lib", time(graft.ops.Graph.labelPropagate(edges(), "src", "dst",
    seeds(), "node", "label", 2).orderBy("node")))
  println(f"[ab] round $r: " + res.toSeq.sortBy(_._1)
    .map { case (k, v) => f"$k=${v.head}%6.3f" }.mkString(" "))
}
println("[ab] MIN " + res.toSeq.sortBy(_._1)
  .map { case (k, v) => f"$k=${v.min}%6.3f" }.mkString(" "))
sys.exit(0)
