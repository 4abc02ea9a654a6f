// Dump .explain("formatted") for a comma-separated list of query names
// (or prefixes) into plans/<tag>/<name>_<suffix>.txt.
//   spark-shell -i scripts/dump_plans.scala  with
//   -Dgraft.plans.only=q171f,q180 -Dgraft.plans.tag=r17 -Dgraft.plans.suffix=before
// Tooling only -- not part of the engine.
import java.nio.file.{Files, Paths}

val only = sys.props.getOrElse("graft.plans.only", "")
  .split(",").map(_.trim).filter(_.nonEmpty).toSet
val tag = sys.props.getOrElse("graft.plans.tag", "r17")
val suffix = sys.props.getOrElse("graft.plans.suffix", "before")
val sfDir = sys.props.getOrElse("graft.plans.sf", "/root/testdata/sf0.1")
val outDir = Paths.get(s"plans/$tag")
Files.createDirectories(outDir)
spark.sparkContext.setLogLevel("ERROR")
// mirror the Bench session confs: iterative/streaming queries EXECUTE
// during construction, so the dump must run with bench-equivalent knobs
spark.conf.set("spark.sql.shuffle.partitions", "32")
spark.conf.set("spark.sql.adaptive.enabled", "true")
spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
spark.conf.set("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (16L * 1024 * 1024).toString)
spark.conf.set("spark.sql.session.timeZone", "UTC")
spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "65536")
val sel = graft.SparkEntry.queries.toSeq.sortBy(_._1).filter { case (n, _) =>
  only.isEmpty || only.exists(n.startsWith)
}
sel.foreach { case (name, fn) =>
  try {
    val df = fn(spark, sfDir)
    val txt = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    Files.writeString(outDir.resolve(s"${name}_$suffix.txt"), txt)
    println(s"[plans] wrote $name ($suffix): ${txt.linesIterator.size} lines")
  } catch { case e: Throwable =>
    println(s"[plans] FAILED $name: ${e.getMessage}")
  }
}
sys.exit(0)
