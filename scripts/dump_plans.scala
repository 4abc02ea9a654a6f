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

// Iterative ops materialize per-round frames INSIDE query construction
// (localCheckpoint / count); their final explain only shows the last
// join over checkpoint RDDs. Capture every executed plan through a
// QueryExecutionListener so the dumped artifact includes the per-round
// physical plans the optimization claims are about.
val captured = new java.util.concurrent.ConcurrentLinkedQueue[(String, String)]()
val ql = new org.apache.spark.sql.util.QueryExecutionListener {
  override def onSuccess(funcName: String,
      qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit =
    captured.add((funcName, qe.executedPlan.toString))
  override def onFailure(funcName: String,
      qe: org.apache.spark.sql.execution.QueryExecution, ex: Exception): Unit = ()
}
spark.listenerManager.register(ql)

sel.foreach { case (name, fn) =>
  try {
    captured.clear()
    val df = fn(spark, sfDir)
    val txt = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    Thread.sleep(400)
    val sb = new StringBuilder(txt)
    val inner = {
      import scala.jdk.CollectionConverters._
      captured.asScala.toSeq
    }
    if (inner.nonEmpty) {
      sb.append("\n\n== Per-round executed plans (loop-internal actions," +
        " captured in construction order) ==\n")
      inner.zipWithIndex.foreach { case ((fname, plan), i) =>
        sb.append(s"\n---- action $i ($fname) ----\n").append(plan)
      }
    }
    Files.writeString(outDir.resolve(s"${name}_$suffix.txt"), sb.toString)
    println(s"[plans] wrote $name ($suffix): ${inner.size} inner actions")
  } catch { case e: Throwable =>
    println(s"[plans] FAILED $name: ${e.getMessage}")
  }
}
sys.exit(0)
