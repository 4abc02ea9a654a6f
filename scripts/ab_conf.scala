// In-session interleaved A/B of session-conf variants for one query.
//   -Dgraft.ab.query=q171f_hits_milli
//   -Dgraft.ab.variants="aqe=true,parts=32|aqe=false,parts=2"
//   -Dgraft.ab.rounds=3
// Runs A,B,A,B,... in one JVM; reports per-variant min (position effects
// cancel). Tooling only -- not engine code.
val qname = sys.props.getOrElse("graft.ab.query", "q171f_hits_milli")
val rounds = sys.props.getOrElse("graft.ab.rounds", "3").toInt
val sfDir = sys.props.getOrElse("graft.ab.sf", "/root/testdata/sf0.1")
val variants = sys.props.getOrElse("graft.ab.variants",
  "aqe=true,parts=32|aqe=false,parts=2").split("\\|").map { v =>
  val kv = v.split(",").map(_.split("=")).map(a => a(0) -> a(1)).toMap
  (v, kv("aqe"), kv("parts"))
}

spark.sparkContext.setLogLevel("ERROR")
spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
spark.conf.set("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (16L * 1024 * 1024).toString)
spark.conf.set("spark.sql.session.timeZone", "UTC")
spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "65536")

val fn = graft.SparkEntry.queries(qname)
// warmup (not timed): classload + codegen + parquet reader
spark.conf.set("spark.sql.shuffle.partitions", "32")
spark.conf.set("spark.sql.adaptive.enabled", "true")
fn(spark, sfDir).queryExecution.toRdd.foreach(_ => ())
spark.catalog.clearCache()
spark.sparkContext.getPersistentRDDs.foreach(_._2.unpersist(blocking = false))

val times = scala.collection.mutable.Map.empty[String, List[Double]]
  .withDefaultValue(Nil)
(1 to rounds).foreach { r =>
  variants.foreach { case (tag, aqe, parts) =>
    spark.conf.set("spark.sql.adaptive.enabled", aqe)
    spark.conf.set("spark.sql.shuffle.partitions", parts)
    val t0 = System.nanoTime()
    fn(spark, sfDir).queryExecution.toRdd.foreach(_ => ())
    val sec = (System.nanoTime() - t0) / 1e9
    times(tag) = sec :: times(tag)
    println(f"[ab] round $r $tag%-28s ${sec}%8.3f s")
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.foreach(_._2.unpersist(blocking = false))
  }
}
println("[ab] ==== per-variant min over " + rounds + " rounds ====")
variants.foreach { case (tag, _, _) =>
  println(f"[ab] MIN $tag%-28s ${times(tag).min}%8.3f s") }
sys.exit(0)
