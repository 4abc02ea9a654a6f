package graft

import org.apache.spark.sql.SparkSession

/** Session factory for the graft engine.
  *
  * Mirrors the execution posture of the reference collection runtime
  * (dask-cudf's distributed scheduler + per-partition kernels — see
  * SURVEY.md §4.2) with Spark's: AQE re-plans joins/skew at runtime,
  * shuffle partitions are sized to the local core count rather than the
  * 200 default (SURVEY §6: the default dominates runtime at test scale;
  * on a 1000-executor cluster this would instead be set ~2-3× total
  * cores or left to AQE coalescing).
  */
object Engine {
  /** Default parallelism: driver contract runs local[32]. */
  def defaultCores: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

  def session(
      appName: String = "graft",
      cores: String = defaultCores,
      shufflePartitions: Int = 32): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName(appName)
      // engine-specific Catalyst extensions (plans package): range-join
      // binning fires on RangeBinJoin.rangeCond conditions; the asof
      // merge strategy plans AsofMergeJoinPlan nodes
      .withExtensions { e =>
        e.injectOptimizerRule(_ => graft.plans.RangeBinJoinRule)
        e.injectPlannerStrategy(_ => graft.plans.AsofMergeJoinStrategy)
      }
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // let AQE coalesce the output partitioning of cached plans too —
      // iterative ops (connected components) persist per-round frames
      // that are tiny by then; without this each round keeps full-width
      // shuffles (measured ~1.8s → ~1.2s per CC round at sf0.1)
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // Small dims (region/nation/supplier) should always broadcast;
      // 16 MB threshold keeps that true at sf0.1 without risking OOM on
      // the fact tables at cluster scale.
      .config("spark.sql.autoBroadcastJoinThreshold", (16L * 1024 * 1024).toString)
      // ObjectHashAggregate (typed UDAFs: RegMax register-union,
      // weighted-mean Aggregator) falls back to SORT-based aggregation
      // after 128 distinct keys per partition by default — for the
      // HyperBall register frames that meant sorting 4 KB rows every
      // round (measured 6.1 s → 3.2 s at sf0.1 with the hash path).
      // 64k keys × buffer stays far under executor memory at our
      // partition sizing; at cluster scale keys-per-partition shrink
      // with parallelism, so the hash path only gets safer.
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "65536")
      // DEPLOYMENT-PROFILE NOTE (r16 receipt, scripts/stress_r16.scala
      // + PLANS.md r16 census A/B): the codegen TWO-LEVEL fast hash map
      // (spark.sql.codegen.aggregate.map.twolevel.enabled, default on)
      // never beat OFF in any census-scale measurement here and
      // degraded heat-affected cells up to 2× at multi-million-group
      // partial aggregations (its 2^16-entry first level only pays off
      // when most keys FIT there; at census cardinality every probe
      // misses level 1 and the extra probe is pure overhead). We keep
      // Spark's default because the catalog is dominated by
      // low-cardinality aggs where the first level hits; a deployment
      // whose workload is census-shaped (distinct n-grams, URL tallies,
      // >100k groups/partition) should set it FALSE — measured 0.59-
      // 0.63× wall on the gopher census either way keyed, both configs.
      // keep catalog state (bucketed saveAsTable) + derby metastore out
      // of the source tree when running from the repo root
      .config("spark.sql.warehouse.dir",
        s"${System.getProperty("java.io.tmpdir")}/graft-warehouse")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Apply engine configs to an externally created session (Verify/Bench
    * create their own via the driver contract). Idempotent.
    */
  def configure(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set(
      "spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "65536")
    graft.plans.RangeBinJoin.install(spark)
    graft.plans.AsofMergeJoin.install(spark)
    spark
  }
}
