// r18 A/B: the two r17-contested graph ops (VERDICT items 1 and 5).
//   betweennessSampled (q291): broadcast-edge-list vs shuffled per-round
//     joins — the r17 stable-box remeasure called the broadcast a
//     regression; measure both here, keep the winner.
//   harmonicCentralityMicro (q209): (a) the same broadcast question,
//     (b) the per-depth anti-join against the ACCUMULATED reached set vs
//     the undirected-BFS two-frontier window (neighbors of distance-
//     (d-1) nodes sit at distance d-2, d-1 or d in an undirected graph,
//     so anti-joining the last TWO frontiers removes every already-
//     reached pair — identity-asserted below).
// Interleaved min-of-N in one JVM (box heat cancels); full collect()
// identity asserts first. Tooling only — not part of the engine.
//   spark-shell --driver-memory 8g --jars target/scala-2.13/daskcudfspark_2.13-0.1.0.jar \
//     -i scripts/ab_graph_r18.scala
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

// q209/q291's exact edge build: part co-occurrence at quantity >= 45
def edges(): DataFrame = {
  val hi = spark.read.parquet(s"$sfDir/lineitem.parquet")
    .filter(col("l_quantity") >= 45)
    .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    .distinct()
  hi.as("x").join(hi.as("y"),
      col("x.ok") === col("y.ok") && col("x.pk") < col("y.pk"))
    .select(col("x.pk").as("src"), col("y.pk").as("dst"))
}

def knuthMixExpr(c: String): String =
  s"(($c * 2654435761) % 4294967296)"

// ---- betweenness, broadcast switchable --------------------------------
def btw(edges0: DataFrame, k: Int, maxDepth: Int, useBcast: Boolean): DataFrame = {
  val e0 = edges0.select(col("src").cast("long").as("esrc"),
      col("dst").cast("long").as("edst"))
    .filter(col("esrc") =!= col("edst"))
  val e = e0.union(e0.select(col("edst").as("esrc"), col("esrc").as("edst")))
    .distinct().persist()
  val nodes = e.select(col("esrc").as("node"))
    .union(e.select(col("edst").as("node"))).distinct().persist()
  val piv = nodes.withColumn("hk", expr(knuthMixExpr("node")))
    .orderBy(col("hk"), col("node")).limit(k)
    .select(col("node").as("p"))
    .localCheckpoint(true)
  val eJ = if (useBcast) broadcast(e) else e
  val levels = scala.collection.mutable.ArrayBuffer(
    piv.select(col("p"), col("p").as("v"), lit(1L).as("sigma"))
      .localCheckpoint(true))
  var visited = levels.head.select(col("p"), col("v"))
  var d = 1
  var emptied = false
  while (d <= maxDepth && !emptied) {
    val last = levels.last
    val next = last.join(eJ, last("v") === e("esrc"))
      .select(col("p"), col("edst").as("v"), col("sigma"))
      .join(visited, Seq("p", "v"), "left_anti")
      .groupBy(col("p"), col("v")).agg(sum(col("sigma")).as("sigma"))
      .localCheckpoint(true)
    if (next.isEmpty) emptied = true
    else {
      levels += next
      visited = visited.union(next.select(col("p"), col("v")))
      d += 1
    }
  }
  val depthTop = levels.size - 1
  var below = levels(depthTop)
    .select(col("p"), col("v"), lit(0L).as("delta"))
  val deltaParts = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
  if (depthTop >= 1) deltaParts += below
  var i = depthTop - 1
  while (i >= 1) {
    val lvl = levels(i)
    val terms = lvl.join(eJ, lvl("v") === e("esrc"))
      .select(col("p"), col("v"), col("sigma"), col("edst").as("w"))
      .join(below.select(col("p"), col("v").as("w"),
          col("delta").as("dw")).join(
          levels(i + 1).select(col("p"), col("v").as("w"),
            col("sigma").as("sw")), Seq("p", "w")),
        Seq("p", "w"))
      .select(col("p"), col("v"),
        expr("""CAST((CAST(sigma AS DECIMAL(38,0)) * (1000000 + dw))
              |  div sw AS BIGINT)""".stripMargin).as("term"))
    val deltaI = lvl.select(col("p"), col("v"))
      .join(terms.groupBy(col("p"), col("v"))
        .agg(sum(col("term")).as("delta")), Seq("p", "v"), "left")
      .na.fill(0L, Seq("delta"))
      .localCheckpoint(true)
    deltaParts += deltaI
    below = deltaI
    i -= 1
  }
  val out = (if (deltaParts.isEmpty)
      nodes.select(col("node"), lit(0L).as("bc_micro"), lit(0L).as("n_piv"))
    else {
      val touched = deltaParts.reduce(_ unionByName _)
        .groupBy(col("v").as("node"))
        .agg(sum(col("delta")).as("bc_micro"), count(lit(1)).as("n_piv"))
      nodes.join(touched, Seq("node"), "left")
        .na.fill(0L, Seq("bc_micro", "n_piv"))
    }).localCheckpoint(true)
  e.unpersist(blocking = false)
  nodes.unpersist(blocking = false)
  out
}

// ---- harmonic, broadcast x anti-join-window switchable -----------------
def harm(edges0: DataFrame, maxDepth: Int, useBcast: Boolean,
    twoFrontier: Boolean): DataFrame = {
  val e0 = edges0.select(col("src").cast("long").as("esrc"),
      col("dst").cast("long").as("edst"))
    .filter(col("esrc") =!= col("edst"))
  val e = e0.union(e0.select(col("edst").as("esrc"), col("esrc").as("edst")))
    .distinct().persist()
  val nodes = e.select(col("esrc").as("node"))
    .union(e.select(col("edst").as("node"))).distinct().persist()
  var frontier = nodes.select(col("node").as("v"), col("node").as("u"))
    .localCheckpoint(true)
  var prevFrontier: DataFrame = null
  var reached = frontier
  val eJ = if (useBcast) broadcast(e) else e
  var acc = nodes.select(col("node").as("v"), lit(0L).as("h"), lit(0L).as("n"))
  var d = 1
  var emptied = false
  while (d <= maxDepth && !emptied) {
    val expanded = frontier.join(eJ, frontier("u") === e("edst"))
      .select(col("v"), col("esrc").as("u")).distinct()
    val seen =
      if (!twoFrontier) reached
      else if (prevFrontier == null) frontier
      else frontier.union(prevFrontier)
    val next = expanded.join(seen, Seq("v", "u"), "left_anti")
      .localCheckpoint(true)
    if (next.count() == 0L) emptied = true
    else {
      val w = 1000000L / d
      acc = acc.unionByName(next.groupBy(col("v"))
        .agg(count(lit(1)).as("n"))
        .select(col("v"), (col("n") * w).as("h"), col("n")))
      if (!twoFrontier) reached = reached.union(next)
      prevFrontier = frontier
      frontier = next
    }
    d += 1
  }
  val out = acc.groupBy(col("v").as("node"))
    .agg(sum(col("h")).as("harmonic_micro"), sum(col("n")).as("n_reached"))
    .localCheckpoint(true)
  e.unpersist(blocking = false)
  nodes.unpersist(blocking = false)
  out
}

def purge(): Unit = {
  spark.catalog.clearCache()
  spark.sparkContext.getPersistentRDDs.foreach(_._2.unpersist(blocking = false))
}

// ---- identity checks ---------------------------------------------------
val b1 = btw(edges(), 16, 3, useBcast = true).orderBy("node").collect().toSeq
purge()
val b2 = btw(edges(), 16, 3, useBcast = false).orderBy("node").collect().toSeq
purge()
println(s"[ab] btw bcast==shuffled: ${b1 == b2} rows=${b1.size}")
val bl = graft.ops.Graph.betweennessSampled(edges(), "src", "dst", k = 16, maxDepth = 3)
  .orderBy("node").collect().toSeq
purge()
println(s"[ab] btw lib==inline: ${bl == b1}")
val h1 = harm(edges(), 3, useBcast = true, twoFrontier = false).orderBy("node").collect().toSeq
purge()
val h2 = harm(edges(), 3, useBcast = false, twoFrontier = true).orderBy("node").collect().toSeq
purge()
val h3 = harm(edges(), 3, useBcast = true, twoFrontier = true).orderBy("node").collect().toSeq
purge()
println(s"[ab] harm acc==2frontier: ${h1 == h2} && ${h1 == h3} rows=${h1.size}")
val hl = graft.ops.Graph.harmonicCentralityMicro(edges(), "src", "dst", maxDepth = 3)
  .orderBy("node").collect().toSeq
purge()
println(s"[ab] harm lib==inline: ${hl == h1}")

def time(f: => DataFrame): Double = {
  val t0 = System.nanoTime()
  f.queryExecution.toRdd.foreach(_ => ())
  val s = (System.nanoTime() - t0) / 1e9
  purge(); s
}
val res = scala.collection.mutable.Map.empty[String, List[Double]].withDefaultValue(Nil)
def rec(k: String, v: Double): Unit = { res(k) = v :: res(k) }
(1 to rounds).foreach { r =>
  rec("btw_bcast", time(btw(edges(), 16, 3, useBcast = true)))
  rec("btw_shuf", time(btw(edges(), 16, 3, useBcast = false)))
  rec("harm_bc_acc", time(harm(edges(), 3, useBcast = true, twoFrontier = false)))
  rec("harm_bc_2f", time(harm(edges(), 3, useBcast = true, twoFrontier = true)))
  rec("harm_sh_acc", time(harm(edges(), 3, useBcast = false, twoFrontier = false)))
  rec("harm_sh_2f", time(harm(edges(), 3, useBcast = false, twoFrontier = true)))
  println(f"[ab] round $r done: " + res.toSeq.sortBy(_._1)
    .map { case (k, v) => f"$k=${v.head}%6.3f" }.mkString(" "))
}
println("[ab] MIN " + res.toSeq.sortBy(_._1)
  .map { case (k, v) => f"$k=${v.min}%6.3f" }.mkString(" "))
sys.exit(0)
