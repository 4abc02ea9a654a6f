// A/B: pre-r17 kCorePeel + labelPropagate vs the restructured lib
// versions (which are now in graft.ops.Graph). V1 = verbatim copies of
// the old formulations. Interleaved, min-of-N. Tooling only.
import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions._

val sfDir = sys.props.getOrElse("graft.ab.sf", "/root/testdata/sf0.1")
val rounds = sys.props.getOrElse("graft.ab.rounds", "4").toInt
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

// ---- V1 kCorePeel (pre-r17) ----
def kcoreV1(edges0: DataFrame, k: Int, rounds0: Int): DataFrame = {
  val sym = edges0.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst"))
  var e = sym.union(sym.select(col("dst").as("src"), col("src").as("dst")))
    .filter(col("src") =!= col("dst")).distinct().persist()
  var i = 0
  while (i < rounds0) {
    val keep = e.groupBy(col("src")).agg(count(lit(1)).as("c"))
      .filter(col("c") >= k).select(col("src").as("node"))
    val peeled = e
      .join(keep.withColumnRenamed("node", "src"), Seq("src"), "left_semi")
      .join(keep.withColumnRenamed("node", "dst"), Seq("dst"), "left_semi")
    val next = peeled.localCheckpoint(true)
    val n = next.count()
    e.unpersist(blocking = false)
    e = next
    i += 1
  }
  val out = e.groupBy(col("src").as("node")).agg(count(lit(1)).as("degree"))
    .localCheckpoint(true)
  e.unpersist(blocking = false)
  out
}

// ---- V1 labelPropagate (pre-r17) ----
def lpV1(edges0: DataFrame, seeds: DataFrame, iterations: Int): DataFrame = {
  val e = edges0.select(col("src").cast("long").as("src"),
    col("dst").cast("long").as("dst")).persist()
  val s0 = seeds.select(col("node").cast("long").as("node"),
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

def seeds(): DataFrame = {
  val cust = spark.read.parquet(s"$sfDir/customer.parquet")
  val nat = spark.read.parquet(s"$sfDir/nation.parquet")
  cust.join(nat, col("c_nationkey") === col("n_nationkey"))
    .select(col("c_custkey").as("node"), col("n_name").as("label"))
    .filter(col("c_custkey") % 10 === 0)
}

def purge(): Unit = {
  spark.catalog.clearCache()
  spark.sparkContext.getPersistentRDDs.foreach(_._2.unpersist(blocking = false))
}

// identity checks
val k1 = kcoreV1(edges(), 5, 3).orderBy("node").collect().toSeq
purge()
val k2 = graft.ops.Graph.kCorePeel(edges(), "src", "dst", 5, 3)
  .orderBy("node").collect().toSeq
purge()
println(s"[ab] kcore identical=${k1 == k2} rows=${k1.size}")
val l1 = lpV1(edges(), seeds(), 2).orderBy("node", "label").collect().toSeq
purge()
val l2 = graft.ops.Graph.labelPropagate(edges(), "src", "dst", seeds(), "node", "label", 2)
  .orderBy("node", "label").collect().toSeq
purge()
println(s"[ab] lp identical=${l1 == l2} rows=${l1.size}")

def time(f: => DataFrame): Double = {
  val t0 = System.nanoTime()
  f.queryExecution.toRdd.foreach(_ => ())
  val s = (System.nanoTime() - t0) / 1e9
  purge(); s
}
val res = scala.collection.mutable.Map.empty[String, List[Double]].withDefaultValue(Nil)
(1 to rounds).foreach { r =>
  val a = time(kcoreV1(edges(), 5, 3))
  val b = time(graft.ops.Graph.kCorePeel(edges(), "src", "dst", 5, 3))
  val c = time(lpV1(edges(), seeds(), 2))
  val d = time(graft.ops.Graph.labelPropagate(edges(), "src", "dst", seeds(), "node", "label", 2))
  res("kcoreV1") = a :: res("kcoreV1"); res("kcoreV2") = b :: res("kcoreV2")
  res("lpV1") = c :: res("lpV1"); res("lpV2") = d :: res("lpV2")
  println(f"[ab] round $r kcore $a%7.3f -> $b%7.3f   lp $c%7.3f -> $d%7.3f")
}
println(f"[ab] MIN kcore ${res("kcoreV1").min}%7.3f -> ${res("kcoreV2").min}%7.3f   lp ${res("lpV1").min}%7.3f -> ${res("lpV2").min}%7.3f")
sys.exit(0)
