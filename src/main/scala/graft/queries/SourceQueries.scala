package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables
import graft.sources.Formats

/** Source/sink round-trips — SURVEY.md §2.1 as gated queries. Each query
  * writes a fixture table through a non-parquet format (or a hive
  * layout) into a scratch dir, reads it back, and computes an aggregate
  * the DuckDB oracle computes from the ORIGINAL parquet — so the gate
  * proves the round-trip is lossless, not just that the write ran.
  */
object SourceQueries extends QueryGroup {

  /** Round-trip scratch space — tmpfs when available: the queries gate
    * FORMAT fidelity (write → read → aggregate vs the original), so
    * paying disk fsync latency for throwaway files only blurs the
    * measurement. A real to_csv/to_orc points at durable storage.
    */
  private def scratch(name: String, sfDir: String): String = {
    val shm = java.nio.file.Paths.get("/dev/shm")
    val base = if (java.nio.file.Files.isWritable(shm)) "/dev/shm"
      else System.getProperty("java.io.tmpdir")
    // keyed by sf dir: a Verify and a Bench running concurrently on
    // different scale factors must not clobber each other's round-trips
    val sf = java.nio.file.Paths.get(sfDir).getFileName.toString
    s"$base/graft-src/$sf/$name"
  }

  override def queries: Map[String, Q] = Map(
    // CSV write → schema-pinned read (read_csv dtype= analog)
    "q120_src_csv_roundtrip" -> ((s, d) => {
      val out = scratch("csv_supplier", d)
      Formats.writeCsv(Tables.supplier(s, d), out)
      val schema = StructType(Seq(
        StructField("s_suppkey", LongType), StructField("s_name", StringType),
        StructField("s_nationkey", IntegerType), StructField("s_acctbal", DoubleType)))
      Formats.readCsv(s, out, schema)
        .groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("n"), round(sum(col("s_acctbal")), 2).as("bal"))
        .orderBy(col("s_nationkey"))
    }),

    // JSON-lines write → schema-pinned read (read_json lines=True analog)
    "q121_src_json_roundtrip" -> ((s, d) => {
      val out = scratch("json_orders", d)
      Formats.writeJson(
        Tables.orders(s, d).select(
          col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_date")), out)
      val schema = StructType(Seq(
        StructField("o_orderkey", LongType), StructField("o_orderstatus", StringType),
        StructField("o_totalprice", DoubleType), StructField("o_date", StringType)))
      Formats.readJson(s, out, schema)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("total"),
          min(col("o_date")).as("first_date"))
        .orderBy(col("o_orderstatus"))
    }),

    // PERMISSIVE-mode JSON ingestion over a file with deterministically
    // corrupt lines (every 5th nation row): good rows parse, bad rows
    // land in _corrupt_record — the real-world ingest posture where a
    // FAILFAST job would die on one malformed line in a billion
    "q121b_src_json_corrupt" -> ((s, d) => {
      val out = scratch("json_corrupt", d)
      Tables.nation(s, d).select(
          when(pmod(col("n_nationkey"), lit(5)) === 0,
            concat(lit("{bad json line "), col("n_nationkey")))
          .otherwise(to_json(struct(col("n_nationkey"), col("n_name"))))
          .as("value"))
        .write.mode("overwrite").text(out)
      val schema = StructType(Seq(
        StructField("n_nationkey", LongType), StructField("n_name", StringType),
        StructField("_corrupt_record", StringType)))
      s.read.schema(schema).option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record").json(out)
        .agg(count(lit(1)).as("n"),
          count(col("n_nationkey")).as("n_good"),
          count(col("_corrupt_record")).as("n_corrupt"))
    }),

    // ORC write → read (read_orc/to_orc analog)
    "q122_src_orc_roundtrip" -> ((s, d) => {
      val out = scratch("orc_lineitem", d)
      Formats.writeOrc(
        Tables.lineitem(s, d).select("l_orderkey", "l_returnflag", "l_quantity"), out)
      Formats.readOrc(s, out)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("qty"))
        .orderBy(col("l_returnflag"))
    }),

    // raw text write → read_text analog (line-delimited)
    "q123_src_text_roundtrip" -> ((s, d) => {
      val out = scratch("text_nation", d)
      Tables.nation(s, d).select(concat_ws("|",
        col("n_nationkey"), col("n_name"), col("n_regionkey")).as("value"))
        .write.mode("overwrite").text(out)
      Formats.readText(s, out)
        .select(split(col("value"), "\\|").as("f"))
        .select(element_at(col("f"), 1).cast("int").as("n_nationkey"),
          element_at(col("f"), 2).as("n_name"),
          element_at(col("f"), 3).cast("int").as("n_regionkey"))
        .orderBy(col("n_nationkey"))
    }),

    // hive-partitioned parquet round-trip (to_parquet partition_on=)
    "q124_src_partitioned_parquet" -> ((s, d) => {
      val out = scratch("parquet_part", d)
      Formats.roundTripPartitioned(s,
          Tables.lineitem(s, d).select("l_orderkey", "l_quantity", "l_returnflag"),
          out, "l_returnflag")
        // partition-pruned read: only one hive partition is scanned
        .filter(col("l_returnflag") === "R")
        .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("qty"))
    }),

    // from_map / from_delayed analog (SURVEY §2.1): build a collection
    // from an arbitrary per-partition generator — the dask escape hatch
    // for custom sources. 8 generator partitions, fixture-independent.
    "q125_src_from_map" -> ((s, d) => {
      import s.implicits._
      s.range(0, 1000, 1, 8)
        .mapPartitions(it => it.map(i => (i, i * i, s"row_$i")))
        .toDF("i", "sq", "tag")
        .filter(col("i") % 97 === 0)
        .orderBy(col("i"))
    }),

    // schema evolution: two parquet batches with different column sets
    // read back through mergeSchema (the heterogeneous-snapshot shape
    // of any long-lived data lake) — counts prove the union schema
    // carries each column exactly where its batch wrote it
    "q127_src_merge_schema" -> ((s, d) => {
      val out = scratch("merge_schema", d)
      val o = Tables.orders(s, d)
      o.filter(pmod(col("o_orderkey"), lit(2)) === 0)
        .select(col("o_orderkey"), col("o_totalprice"))
        .write.mode("overwrite").parquet(s"$out/batch=1")
      o.filter(pmod(col("o_orderkey"), lit(2)) =!= 0)
        .select(col("o_orderkey"), col("o_orderstatus"))
        .write.mode("overwrite").parquet(s"$out/batch=2")
      s.read.option("mergeSchema", "true").parquet(out)
        .agg(count(lit(1)).as("n"),
          count(col("o_totalprice")).as("n_price"),
          count(col("o_orderstatus")).as("n_status"),
          round(sum(col("o_totalprice")), 2).as("sum_price"))
    }),

    // Z-ordered write → box-predicate read-back: the 2-d data-skipping
    // layout (Layout.zOrderBy). The aggregate (count/sum + min/max z of
    // the survivors) gates BOTH the Morton arithmetic and round-trip
    // losslessness; LayoutSpec proves the pruning benefit (fewer files
    // touched than a single-column sort for the same box)
    "q126_src_zorder_layout" -> ((s, d) => {
      import graft.ops.Layout
      val out = scratch("zorder_lineitem", d)
      Layout.zOrderBy(
          Tables.lineitem(s, d).select(col("l_orderkey"), col("l_linenumber"),
            col("l_partkey"), col("l_suppkey"), col("l_quantity")),
          col("l_partkey"), col("l_suppkey"), nFiles = 8)
        .write.mode("overwrite").parquet(out)
      s.read.parquet(out)
        .filter(col("l_partkey").between(100, 140) &&
          col("l_suppkey").between(10, 20))
        .agg(count(lit(1)).as("n"),
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          min(Layout.zValue(col("l_partkey"), col("l_suppkey"))).as("min_z"),
          max(Layout.zValue(col("l_partkey"), col("l_suppkey"))).as("max_z"))
    }),

    // Hilbert-curve layout (NEW r11): q126's write-cluster-prune cycle
    // with the Hilbert index as the clustering key — consecutive curve
    // positions are always adjacent grid cells (the Z curve jumps at
    // every power-of-two boundary), so file stat boxes are tighter
    // under 2-d predicates; index computed by a codegen'd 16-level
    // quadrant-rotation Expression (a column fold would blow up the
    // tree exponentially), replayed level-by-level by the oracle
    "q242_src_hilbert_layout" -> ((s, d) => {
      import graft.ops.Layout
      val out = scratch("hilbert_lineitem", d)
      Layout.hilbertOrderBy(
          Tables.lineitem(s, d).select(col("l_orderkey"), col("l_linenumber"),
            col("l_partkey"), col("l_suppkey"), col("l_quantity")),
          col("l_partkey"), col("l_suppkey"), nFiles = 8)
        .write.mode("overwrite").parquet(out)
      s.read.parquet(out)
        .filter(col("l_partkey").between(100, 140) &&
          col("l_suppkey").between(10, 20))
        .agg(count(lit(1)).as("n"),
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          min(Layout.hValue(col("l_partkey"), col("l_suppkey"))).as("min_h"),
          max(Layout.hValue(col("l_partkey"), col("l_suppkey"))).as("max_h"))
    }),

    // declarative data-quality expectations (the pre-ingest shard
    // gate): a 6-check suite compiled into ONE aggregation pass —
    // violation counts are integers, verdict arithmetic is ppm-exact
    "q178_expectations" -> ((s, d) => {
      import graft.ops.Validate
      import graft.ops.Validate._
      Validate.expect(Tables.lineitem(s, d), Seq(
          notNull("l_orderkey"),
          between("l_quantity", 1, 50),
          between("l_quantity", 1, 30), // deliberately failing check
          inSet("l_returnflag", Seq("A", "N")), // "R" rows violate
          nonNegative("l_discount"),
          matches("l_linestatus", "^[OF]$")))
        .orderBy(col("expectation"))
    }),

    // one-pass column census: null/distinct/min/max per column — the
    // data profile a pipeline snapshots per ingested shard
    "q179_profile" -> ((s, d) => {
      graft.ops.Validate.profile(Tables.lineitem(s, d),
          Seq("l_orderkey", "l_quantity", "l_returnflag", "l_extendedprice"))
        .orderBy(col("column_name"))
    }),

    // uniqueness expectation (its own aggregation shape): the fixture's
    // (l_orderkey, l_linenumber) is KNOWN non-unique — the gate proves
    // the check catches it with exact duplicate counts
    "q178b_expect_unique" -> ((s, d) => {
      graft.ops.Validate.expectUnique(Tables.lineitem(s, d),
        Seq("l_orderkey", "l_linenumber"))
    }),

    // referential-integrity gate (NEW r8): orders whose customer fell
    // out of a filtered dimension (negative-balance customers dropped)
    // — the orphan census, one left-anti join + bounded rollup
    "q188_fk_check" -> ((s, d) => {
      graft.ops.Validate.fkCheck(
        Tables.orders(s, d),
        Tables.customer(s, d).filter(col("c_acctbal") >= 0),
        "o_custkey", "c_custkey")
    }),

    // FK-cascade purge plan (NEW r12): "right to be forgotten" audit —
    // %97 customers tombstoned, the cascade walks orders → lineitem
    // as key-only semi-joins; per-table delete counts + integer
    // key-sum witnesses of both sets, so one mis-cascaded row flips
    // the hash
    "q248_cascade_purge" -> ((s, d) => {
      val roots = Tables.customer(s, d).filter(col("c_custkey") % 97 === 0)
      val li = Tables.lineitem(s, d)
        .withColumn("l_rowkey",
          col("l_orderkey") * 10L + col("l_linenumber"))
      graft.ops.Validate.cascadePurgePlan(roots, "c_custkey", Seq(
          ("orders", Tables.orders(s, d), "o_custkey", "o_orderkey"),
          ("lineitem", li, "l_orderkey", "l_rowkey")))
        .orderBy(col("lvl"))
    }),

    // per-key orphan detail: the 20 worst dangling customer keys
    "q188b_fk_orphan_keys" -> ((s, d) => {
      graft.ops.Validate.fkOrphanKeys(
        Tables.orders(s, d),
        Tables.customer(s, d).filter(col("c_acctbal") >= 0),
        "o_custkey", "c_custkey", topK = 20)
    }),

    // CDC changeset emitter (NEW r12): diff two order snapshots into
    // the minimal U/D feed that replays old into new — the inverse of
    // q212's applyChangeSet (round-trip spec-pinned); same mutation
    // recipe as q205's diff census, but emitting the payload
    "q264_emit_changeset" -> ((s, d) => {
      val o = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      val mutated = o.filter(col("o_orderkey") % 97 =!= 0)
        .withColumn("o_orderkey",
          when(col("o_orderkey") % 89 === 0, col("o_orderkey") + 100000000L)
            .otherwise(col("o_orderkey")))
        .withColumn("o_totalprice",
          when(col("o_orderkey") % 13 === 0,
            round(col("o_totalprice") + 1, 2)).otherwise(col("o_totalprice")))
      graft.ops.FrameOps.emitChangeSet(o, mutated, "o_orderkey",
          version = 7L)
        .orderBy(col("o_orderkey"))
    }),

    // functional-dependency check (NEW r12): does o_custkey determine
    // o_orderpriority (it should NOT — customers place orders at many
    // priorities); violation census in one scan shape
    "q263_fd_check" -> ((s, d) => {
      graft.ops.FrameOps.fdCheck(Tables.orders(s, d),
        "o_custkey", "o_orderpriority")
    }),

    // keyed snapshot diff (NEW r8): orders vs a deterministically
    // mutated copy — %97 keys removed, %89 keys re-keyed (added),
    // %13 prices bumped (changed) — the data-versioning census
    "q205_table_diff" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val mutated = o.filter(col("o_orderkey") % 97 =!= 0)
        .withColumn("o_orderkey",
          when(col("o_orderkey") % 89 === 0, col("o_orderkey") + 100000000L)
            .otherwise(col("o_orderkey")))
        .withColumn("o_totalprice",
          when(col("o_orderkey") % 13 === 0,
            round(col("o_totalprice") + 1, 2)).otherwise(col("o_totalprice")))
      graft.ops.Validate.tableDiff(o, mutated, "o_orderkey",
          Seq("o_orderstatus", "o_totalprice"))
        .orderBy(col("metric"))
    }),

    // k-anonymity + l-diversity census (NEW r8): the privacy gate over
    // quasi-identifiers (nation × market segment), balance sign as the
    // sensitive attribute — one groupBy + bounded rollup
    "q190_k_anonymity" -> ((s, d) => {
      graft.ops.Validate.kAnonymity(
        Tables.customer(s, d)
          .withColumn("bal_sign",
            when(col("c_acctbal") >= 0, "pos").otherwise("neg")),
        Seq("c_nationkey", "c_mktsegment"), k = 5,
        sensitive = Some("bal_sign"))
    }),

    // generalization ladder (NEW r14): the FIX for a failing q190 gate
    // — coarsen the balance quasi-identifier through a bucket ladder
    // (integer-cents floor-div, bit-exact in both engines) until the
    // k-anonymity census passes; `chosen` marks the finest passing
    // level (minimal information loss). One bounded census per level.
    "q190b_generalize_to_k" -> ((s, d) => {
      graft.ops.Validate.generalizeToK(
          Tables.customer(s, d), Seq("c_mktsegment"), "c_acctbal",
          ladder = Seq(100L, 1000L, 5000L, 20000L), k = 5)
        .orderBy(col("bucket_sz"))
    }),

    // Categorify (NEW r14): the NVTabular embedding-table encoder —
    // frequency-ordered contiguous ids (hot categories get small ids),
    // rare/unseen/null to the reserved OOV id 0; vocabulary is one
    // bounded groupBy, encode is a broadcast join. minCount 80 drops
    // the tail languages at both gate SFs so the OOV path is exercised
    "q277_categorify" -> ((s, d) => {
      graft.ops.Features.categorify(
          Tables.documents(s, d).select(col("doc_id"), col("lang")),
          "lang", minCount = 80L)
        .select(col("doc_id"), col("lang"), col("lang_id"))
        .orderBy(col("doc_id"))
    }),

    // leakage-safe target encoding (NEW r14): K-fold out-of-fold
    // smoothed target mean per category — hash-derived folds, integer
    // micro-cents arithmetic end-to-end (div, never double division),
    // |categories|*k-cell partials + one broadcast join back
    "q278_target_encode" -> ((s, d) => {
      graft.ops.Features.targetEncode(Tables.orders(s, d),
          "o_orderkey", "o_orderpriority", "o_totalprice",
          k = 4, alpha = 10L)
        .select(col("o_orderkey"), col("o_orderpriority"), col("fold"),
          col("o_orderpriority_te_micro"))
        .orderBy(col("o_orderkey"))
    }),

    // leakage-safe standard scaler (NEW r14): NVTabular Normalize with
    // the fit/transform split explicit — mean/std fit on the train
    // folds only (fold 0 held out), every row scored; decimal sums,
    // positive-mod floor divisions, one IEEE-exact sqrt — the z-score
    // in floor basis points hash-gates
    "q280_standard_scale" -> ((s, d) => {
      graft.ops.Features.standardScale(Tables.orders(s, d),
          "o_orderkey", "o_totalprice", k = 4)
        .orderBy(col("o_orderkey"))
    }),

    // hash-bucket census (NEW r14): NVTabular HashBucket over the part
    // type vocabulary into 32 buckets — the KMV scrambled poly hash
    // (the repo's one replayable hash spelling), plus the per-bucket
    // load/collision census the embedding table is sized from
    "q281_hash_bucket" -> ((s, d) => {
      graft.ops.Features.hashBucketCensus(Tables.part(s, d),
          "p_type", nBuckets = 32)
        .orderBy(col("bucket"))
    }),

    // leakage-safe ROBUST scaler (NEW r14): sklearn RobustScaler —
    // center/scale = train median/IQR as EXACT type-1 order statistics
    // via the distributed prefix-scan ladder; acctbal's negatives
    // exercise the signed positive-mod floor
    "q283_robust_scale" -> ((s, d) => {
      graft.ops.Features.robustScale(Tables.customer(s, d),
          "c_custkey", "c_acctbal", k = 4)
        .orderBy(col("c_custkey"))
    }),

    // leakage-safe empirical-CDF transform (NEW r14): sklearn
    // QuantileTransformer at full resolution — every row ranked
    // against the train distribution through ONE searchSortedLarge
    // prefix-scan (no broadcast of the train split, no global window)
    "q284_cdf_transform" -> ((s, d) => {
      graft.ops.Features.cdfTransform(Tables.orders(s, d),
          "o_orderkey", "o_totalprice", k = 4)
        .orderBy(col("o_orderkey"))
    }),

    // key-skew profile (NEW r11): the "should I salt this join"
    // report over the events user_id key — per-key counts folded into
    // exact power-of-two buckets via bin()-length (engine-identical
    // string ops, never float log2 at bucket boundaries)
    "q233_skew_profile" -> ((s, d) => {
      graft.ops.Validate.skewProfile(Tables.events(s, d), Seq("user_id"))
        .orderBy(col("bucket"))
    }),

    // KS drift statistic (NEW r8, r9 overflow-proofed): max CDF gap
    // between the same two slices as q189 — per-side floor-bp CDFs
    // diffed in pure integers, the rank-style companion to PSI
    "q207_ks_drift" -> ((s, d) => {
      val ev = Tables.events(s, d)
      graft.ops.Validate.ksDrift(
        ev.filter(col("event_type") === "click"),
        ev.filter(col("event_type") === "purchase"),
        "value", Seq(10.0, 20.0, 40.0, 80.0, 160.0))
    }),

    // embedding drift (NEW r10): per-dimension mean shift between two
    // snapshots in exact integer micro-units — the drift monitor for
    // the EMBEDDING space (PSI/KL/KS see scalars only). The odd-id
    // snapshot gets a planted +0.1 shift on dims 0–2, which the
    // monitor must localize exactly
    "q223_embedding_drift" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val old = emb.filter(col("vec_id") % 2 === 0)
      val fresh = emb.filter(col("vec_id") % 2 === 1)
        .withColumn("embedding",
          transform(col("embedding").cast("array<double>"),
            (x, i) => when(i < 3, x + lit(0.1)).otherwise(x)))
      graft.ops.Validate.embeddingDriftMicro(old, fresh, "embedding",
          dim = 64)
        .orderBy(col("i"))
    }),

    // quantile mapping (NEW r9): the drift-CORRECTION companion of
    // q189/q207 — purchase values mapped onto the click distribution
    // by 16-bucket discrete histogram matching; mapped outputs are
    // exact reference DATA values, so the full result hash-gates
    "q216_quantile_map" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val cur = ev
        .filter(col("event_type") === "purchase" && col("value").isNotNull)
        .select(col("event_id"), col("value"))
      val ref = ev
        .filter(col("event_type") === "click" && col("value").isNotNull)
      graft.ops.Validate.quantileMap(cur, ref, "value", nQ = 16)
        .select(col("event_id"), round(col("value"), 2).as("value"),
          col("q_idx"), col("mapped"))
        .orderBy(col("event_id"))
    }),

    // histogram-backed quantile mapping (NEW r10): the 100 TB tier of
    // q216 — both CDFs come from mergeable equi-width histograms (one
    // scan each), the bucket→bucket mapping is an integer
    // cross-multiplied CDF inversion over ≤ 32² rows, and the
    // application is one broadcast join. NO single-partition
    // row_number, NO ladder collect (the q216 scale caveat this op
    // closes); outputs are bucket midpoints (granularity = one bucket
    // width by the histogram contract), all deterministic, full hash
    // gate
    "q216b_quantile_map_hist" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val cur = ev
        .filter(col("event_type") === "purchase" && col("value").isNotNull)
        .select(col("event_id"), col("value"))
      val ref = ev
        .filter(col("event_type") === "click" && col("value").isNotNull)
      graft.ops.Validate.quantileMapHist(cur, ref, "value",
          lo = 0.0, hi = 200.0, nBuckets = 32)
        .select(col("event_id"), round(col("value"), 2).as("value"),
          col("bucket"), col("mapped_bucket"), col("mapped"))
        .orderBy(col("event_id"))
    }),

    // Benford first-digit screen (NEW r9): order totals' first-digit
    // distribution vs the log10(1+1/d) expectation — the classic
    // fabricated-data / corrupted-feed test; digit extraction is a
    // power-of-ten CASE ladder (no libm log10), expectations are
    // precomputed integer-bp literals in both engines
    "q215_benford" -> ((s, d) => {
      graft.ops.Validate.benfordDigits(
          Tables.orders(s, d), "o_totalprice")
        .orderBy(col("digit"))
    }),

    // per-group Benford screen (NEW r10): the q215 ladder per order
    // priority — how a corrupted upstream FEED is localized (the
    // global screen dilutes one bad source across the corpus); totals
    // ride one grp-partitioned window, digit grid densified per group
    "q215b_benford_by" -> ((s, d) => {
      graft.ops.Validate.benfordDigitsBy(
          Tables.orders(s, d), "o_orderpriority", "o_totalprice")
        .orderBy(col("grp"), col("digit"))
    }),

    // classifier calibration report (NEW r12): reliability bins + ECE
    // for a deterministic score (value/200 clamped) against the
    // purchase label — the eval every quality-classifier threshold
    // needs before it means anything
    "q262_calibration" -> ((s, d) => {
      val ev = Tables.events(s, d).filter(col("value").isNotNull)
        .select(least(greatest(col("value") / 200.0, lit(0.0)),
            lit(1.0)).as("score"),
          (col("event_type") === "purchase").cast("long").as("label"))
      graft.ops.Validate.calibrationReport(ev, "score", "label",
          nBins = 10)
        .orderBy(col("bin"))
    }),

    // isotonic calibration fit (NEW r13): the CORRECTION step after
    // q262 measures miscalibration — monotone step fit over the same
    // score bins via the minimax (max-of-min range rates) PAV
    // characterization, quantized to integer ppm BEFORE the folds so
    // the fit replays bit-for-bit; the bin grid is bounded, the folds
    // run on collected counts (the quantileLadder discipline)
    "q271_isotonic_fit" -> ((s, d) => {
      val ev = Tables.events(s, d).filter(col("value").isNotNull)
        .select(least(greatest(col("value") / 200.0, lit(0.0)),
            lit(1.0)).as("score"),
          (col("event_type") === "purchase").cast("long").as("label"))
      graft.ops.Validate.isotonicCalibrate(ev, "score", "label",
          nBins = 10)
        .orderBy(col("bin"))
    }),

    // classifier threshold report (NEW r14): the operating-point
    // ladder after q262 says the scores are honest and q271 fixes
    // them — per threshold the confusion census + precision/recall/
    // F1/accuracy in floor bp; ONE scan into 4*|ladder| conditional
    // sums, corpus never crossed with the grid
    "q286_threshold_report" -> ((s, d) => {
      val ev = Tables.events(s, d).filter(col("value").isNotNull)
        .select(least(greatest(col("value") / 200.0, lit(0.0)),
            lit(1.0)).as("score"),
          (col("event_type") === "purchase").cast("long").as("label"))
      graft.ops.Validate.thresholdReport(ev, "score", "label",
          thrPpm = Seq(50000L, 100000L, 200000L, 300000L, 500000L,
            700000L, 900000L))
        .orderBy(col("thr_ppm"))
    }),

    // per-slice threshold report (NEW r14): q286 disaggregated over
    // user cohorts — the parity view that catches a pooled threshold
    // gutting one slice's recall; same scan keyed by the group
    "q287_threshold_report_by" -> ((s, d) => {
      val ev = Tables.events(s, d).filter(col("value").isNotNull)
        .select(concat(lit("cohort"), pmod(col("user_id"), lit(3)))
            .as("cohort"),
          least(greatest(col("value") / 200.0, lit(0.0)),
            lit(1.0)).as("score"),
          (col("event_type") === "purchase").cast("long").as("label"))
      graft.ops.Validate.thresholdReportBy(ev, "cohort",
          "score", "label",
          thrPpm = Seq(100000L, 300000L, 500000L, 700000L))
        .orderBy(col("grp"), col("thr_ppm"))
    }),

    // EXACT per-cohort ROC-AUC (NEW r15): the separability number the
    // q286 ladder presumes — rank-sum/Mann–Whitney with midrank ties,
    // all integer, one shuffle to (group, score_ppm) cells + a
    // group-partitioned cumulative window over the cell frame
    "q314_auc_exact" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .filter(col("value").isNotNull && col("user_id").isNotNull &&
          col("event_type").isNotNull)
        .select(pmod(col("user_id"), lit(5L)).as("cohort"),
          (col("value") / 200.0).as("score"),
          (col("event_type") === "purchase").cast("long").as("label"))
      graft.ops.Validate.aucBy(ev, "cohort", "score", "label")
        .orderBy(col("grp"))
    }),

    // per-group robust z (NEW r14): median/MAD outlier screen over
    // account balances per market segment — exact type-1 rank
    // selection per group (no interpolation), signed positive-mod
    // floor z, the per-segment pass a global scaler can't do
    "q289_robust_z_by" -> ((s, d) => {
      graft.ops.FrameOps.robustZscoreBy(Tables.customer(s, d),
          "c_mktsegment", "c_custkey", "c_acctbal")
        .orderBy(col("grp"), col("c_custkey"))
    }),

    // incremental aggregate-snapshot merge (NEW r14): yesterday's
    // state + today's delta folded WITHOUT rescanning history — the
    // gate is self-proving: Spark merges two disjoint snapshots, the
    // oracle rescans all rows; equal hashes == merge(A)+(B) ≡ A∪B
    "q290_agg_snapshot_merge" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val cutoff = to_timestamp(lit("1998-01-01 00:00:00"))
      val snap = graft.ops.FrameOps.aggSnapshot(
        o.filter(col("o_orderdate") < cutoff),
        Seq("o_orderstatus"), "o_totalprice")
      val delta = graft.ops.FrameOps.aggSnapshot(
        o.filter(col("o_orderdate") >= cutoff),
        Seq("o_orderstatus"), "o_totalprice")
      graft.ops.FrameOps.mergeAggSnapshot(snap, delta,
          Seq("o_orderstatus"))
        .select(col("o_orderstatus"), col("n"),
          col("sum_c").cast("long").as("sum_c"),
          col("min_c"), col("max_c"), col("mean_c"))
        .orderBy(col("o_orderstatus"))
    }),

    // bucketed robust z (NEW r14): q289's 100 TB tier — median/MAD at
    // $200-bucket resolution from O(groups*bins) aggregation state,
    // NO per-group sort window; the q216b/q246b tier discipline
    "q289b_robust_z_by_hist" -> ((s, d) => {
      graft.ops.FrameOps.robustZscoreByHist(Tables.customer(s, d),
          "c_mktsegment", "c_custkey", "c_acctbal",
          loCents = -100000L, hiCents = 1000000L, nBins = 55)
        .orderBy(col("grp"), col("c_custkey"))
    }),

    // per-group CDF transform (NEW r14): q284 ranked within the row's
    // own segment — group-aware prefix scan (group woven into the
    // range-partition key + per-(group, partition) offsets), so no
    // group funnels through one task and no train slice broadcasts
    "q284b_cdf_transform_by" -> ((s, d) => {
      graft.ops.Features.cdfTransformBy(Tables.orders(s, d),
          "o_orderpriority", "o_orderkey", "o_totalprice", k = 4)
        .orderBy(col("grp"), col("o_orderkey"))
    }),

    // mutual information feature screen (NEW r12): MI(order priority,
    // order status) in exact floor-nano nats — model-free relevance/
    // redundancy check over categorical columns; one cell-count
    // shuffle + marginal rollups of that frame
    "q256_mutual_info" -> ((s, d) => {
      graft.ops.Validate.mutualInfoNano(Tables.orders(s, d),
        "o_orderpriority", "o_orderstatus")
    }),

    // A/B sample-ratio-mismatch check (NEW r12): hash-derived 50/50
    // assignment with a deliberate 'junk' arm (%97 users) — per-arm
    // observed vs expected ppm, signed deviation, and the chi-square
    // numerator in cross-multiplied integers
    "q257_srm_check" -> ((s, d) => {
      val ev = Tables.events(s, d).filter(col("user_id").isNotNull)
        .withColumn("arm", when(col("user_id") % 97 === 0, "junk")
          .when(col("user_id") % 10 < 5, "control")
          .otherwise("treatment"))
      graft.ops.Validate.srmCheck(ev, "arm",
          Seq(("control", 1L), ("treatment", 1L)))
        .orderBy(col("arm"))
    }),

    // CUPED variance-reduced A/B readout (NEW r13): per-user pre-period
    // mean value (first half of January) as the covariate for the
    // post-period metric — pooled theta = cov/var, per-arm adjusted
    // means, rho-squared as the variance-reduction fraction; all
    // second-moment doubles ROUND(…, 6) (the q20b discipline)
    "q266_cuped" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .filter(col("value").isNotNull && col("user_id").isNotNull)
      val pre = ev.filter(col("ts") < lit("2024-01-16").cast("timestamp"))
        .groupBy(col("user_id")).agg(avg(col("value")).as("x"))
      val post = ev.filter(col("ts") >= lit("2024-01-16").cast("timestamp"))
        .groupBy(col("user_id")).agg(avg(col("value")).as("y"))
      val per = pre.join(post, "user_id")
        .withColumn("arm",
          when(pmod(col("user_id"), lit(2)) === 0, "A").otherwise("B"))
      graft.ops.Validate.cupedAdjust(per, "arm", "x", "y")
        .orderBy(col("arm"))
    }),

    // Wilson-interval conversion readout (NEW r13): per arm, the
    // has-a-purchase conversion rate with the Wilson score interval —
    // the small-n-safe bounds every experimentation platform reports;
    // exact integer counts + one ROUND(…, 6) double pair
    "q270_conversion_wilson" -> ((s, d) => {
      val per = Tables.events(s, d).filter(col("user_id").isNotNull)
        .groupBy(col("user_id"))
        .agg(max(when(col("event_type") === "purchase", 1L)
          .otherwise(0L)).as("converted"))
        .withColumn("arm",
          when(pmod(col("user_id"), lit(2)) === 0, "A").otherwise("B"))
      graft.ops.Validate.conversionWilson(per, "arm", "converted")
        .orderBy(col("grp"))
    }),

    // t-closeness census (NEW r12): per market-segment class, the
    // integer EMD between the class's order-priority distribution and
    // the global one — the privacy gate k-anonymity/l-diversity can't
    // provide (a class can be diverse yet skewed); cross-multiplied
    // prefixes keep everything in exact int64
    "q250_t_closeness" -> ((s, d) => {
      val j = Tables.orders(s, d).join(Tables.customer(s, d),
        col("o_custkey") === col("c_custkey"))
      graft.ops.Validate.tCloseness(j, Seq("c_mktsegment"),
          "o_orderpriority")
        .orderBy(col("c_mktsegment"))
    }),

    // PSI numeric drift (NEW r8): purchase-event values judged against
    // the click-event reference over a fixed ladder — per-bucket
    // floor-nano terms + the scalar Σ on every row
    "q189_psi_drift" -> ((s, d) => {
      val ev = Tables.events(s, d)
      graft.ops.Validate.psiDrift(
          ev.filter(col("event_type") === "click"),
          ev.filter(col("event_type") === "purchase"),
          "value", Seq(10.0, 20.0, 40.0, 80.0, 160.0))
        .orderBy(col("bucket"))
    })
  )

  override def oracle: Map[String, String] = Map(
    "q120_src_csv_roundtrip" ->
      """SELECT s_nationkey, COUNT(*) AS n, ROUND(SUM(s_acctbal), 2) AS bal
        |FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin,

    "q121_src_json_roundtrip" ->
      """SELECT o_orderstatus, COUNT(*) AS n, ROUND(SUM(o_totalprice), 2) AS total,
        |  MIN(STRFTIME(o_orderdate, '%Y-%m-%d')) AS first_date
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q121b_src_json_corrupt" ->
      """SELECT COUNT(*) AS n,
        |  COUNT(CASE WHEN n_nationkey % 5 <> 0 THEN 1 END) AS n_good,
        |  COUNT(CASE WHEN n_nationkey % 5 = 0 THEN 1 END) AS n_corrupt
        |FROM nation""".stripMargin,

    "q122_src_orc_roundtrip" ->
      """SELECT l_returnflag, COUNT(*) AS n, ROUND(SUM(l_quantity), 2) AS qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q123_src_text_roundtrip" ->
      """SELECT n_nationkey, n_name, n_regionkey
        |FROM nation ORDER BY n_nationkey""".stripMargin,

    "q124_src_partitioned_parquet" ->
      """SELECT COUNT(*) AS n, ROUND(SUM(l_quantity), 2) AS qty
        |FROM lineitem WHERE l_returnflag = 'R'""".stripMargin,

    "q125_src_from_map" ->
      """SELECT i, i * i AS sq, 'row_' || i AS tag
        |FROM range(0, 1000) t(i) WHERE i % 97 = 0 ORDER BY i""".stripMargin,

    "q127_src_merge_schema" ->
      """SELECT COUNT(*) AS n,
        |  COUNT(CASE WHEN o_orderkey % 2 = 0 THEN 1 END) AS n_price,
        |  COUNT(CASE WHEN o_orderkey % 2 <> 0 THEN 1 END) AS n_status,
        |  ROUND(SUM(CASE WHEN o_orderkey % 2 = 0 THEN o_totalprice END), 2)
        |    AS sum_price
        |FROM orders""".stripMargin,

    // replay of Layout.zValue: the parallel bit-spread of each 16-bit
    // key (masks 0x00FF00FF / 0x0F0F0F0F / 0x33333333 / 0x55555555),
    // interleaved even/odd
    "q126_src_zorder_layout" ->
      """WITH t AS (SELECT l_partkey % 65536 AS xa, l_suppkey % 65536 AS xb,
        |    l_quantity FROM lineitem
        |  WHERE l_partkey BETWEEN 100 AND 140 AND l_suppkey BETWEEN 10 AND 20),
        |s1 AS (SELECT *, ((xa | (xa << 8)) & 16711935) AS a1,
        |              ((xb | (xb << 8)) & 16711935) AS b1 FROM t),
        |s2 AS (SELECT *, ((a1 | (a1 << 4)) & 252645135) AS a2,
        |              ((b1 | (b1 << 4)) & 252645135) AS b2 FROM s1),
        |s3 AS (SELECT *, ((a2 | (a2 << 2)) & 858993459) AS a3,
        |              ((b2 | (b2 << 2)) & 858993459) AS b3 FROM s2),
        |s4 AS (SELECT *, ((a3 | (a3 << 1)) & 1431655765) AS a4,
        |              ((b3 | (b3 << 1)) & 1431655765) AS b4 FROM s3)
        |SELECT COUNT(*) AS n, ROUND(SUM(l_quantity), 2) AS sum_qty,
        |  MIN(a4 | (b4 << 1)) AS min_z, MAX(a4 | (b4 << 1)) AS max_z
        |FROM s4""".stripMargin,

    "q242_src_hilbert_layout" -> {
      // level-by-level replay of the quadrant-rotation walk; each level
      // MATERIALIZED (inlined CTEs re-expand the x/y CASEs across all
      // 16 levels — the q171f lesson)
      val levels = (1 to 16).map { i =>
        val s = 1L << (16 - i)
        val ss = s * s
        s"""l$i AS MATERIALIZED (SELECT
           |  CASE WHEN (y & $s) = 0 THEN (CASE WHEN (x & $s) != 0
           |    THEN 65535 - y ELSE y END) ELSE x END AS x,
           |  CASE WHEN (y & $s) = 0 THEN (CASE WHEN (x & $s) != 0
           |    THEN 65535 - x ELSE x END) ELSE y END AS y,
           |  d + $ss * xor(3 * (CASE WHEN (x & $s) != 0 THEN 1 ELSE 0 END),
           |    CASE WHEN (y & $s) != 0 THEN 1 ELSE 0 END) AS d,
           |  l_quantity FROM l${i - 1})""".stripMargin
      }.mkString(",\n")
      s"""WITH t AS (SELECT l_partkey % 65536 AS xa, l_suppkey % 65536 AS xb,
         |    l_quantity FROM lineitem
         |  WHERE l_partkey BETWEEN 100 AND 140 AND l_suppkey BETWEEN 10 AND 20),
         |l0 AS (SELECT CAST(xa AS BIGINT) AS x, CAST(xb AS BIGINT) AS y,
         |  CAST(0 AS BIGINT) AS d, l_quantity FROM t),
         |$levels
         |SELECT COUNT(*) AS n, ROUND(SUM(l_quantity), 2) AS sum_qty,
         |  MIN(d) AS min_h, MAX(d) AS max_h
         |FROM l16""".stripMargin
    },

    "q178_expectations" -> {
      // (name, predicate SQL) — violation when NOT COALESCE(pred, FALSE)
      val checks = Seq(
        ("not_null(l_orderkey)", "l_orderkey IS NOT NULL"),
        ("between(l_quantity,1.0,50.0)", "l_quantity >= 1.0 AND l_quantity <= 50.0"),
        ("between(l_quantity,1.0,30.0)", "l_quantity >= 1.0 AND l_quantity <= 30.0"),
        ("in_set(l_returnflag)", "l_returnflag IN ('A', 'N')"),
        ("non_negative(l_discount)", "l_discount >= 0"),
        ("matches(l_linestatus)", "regexp_matches(l_linestatus, '^[OF]$')"))
      val legs = checks.map { case (name, pred) =>
        s"""SELECT '$name' AS expectation, n AS n_rows,
           |  CAST((SELECT SUM(CASE WHEN NOT COALESCE($pred, FALSE) THEN 1 ELSE 0 END)
           |    FROM lineitem) AS BIGINT) AS n_violations,
           |  CAST(0 AS BIGINT) AS max_violation_ppm FROM a""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH a AS (SELECT COUNT(*) AS n FROM lineitem),
         |u AS ($legs)
         |SELECT expectation, n_rows, n_violations, max_violation_ppm,
         |  n_violations * 1000000 <= max_violation_ppm * n_rows AS passed
         |FROM u ORDER BY expectation""".stripMargin
    },

    "q179_profile" -> {
      val cols = Seq("l_orderkey", "l_quantity", "l_returnflag", "l_extendedprice")
      val legs = cols.map { c =>
        s"""SELECT '$c' AS column_name, COUNT(*) AS n_rows,
           |  CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
           |  CAST(COUNT(DISTINCT $c) AS BIGINT) AS n_distinct,
           |  CAST(MIN($c) AS VARCHAR) AS min_str,
           |  CAST(MAX($c) AS VARCHAR) AS max_str
           |FROM lineitem""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"$legs\nORDER BY column_name"
    },

    "q178b_expect_unique" ->
      """SELECT 'l_orderkey,l_linenumber' AS columns, COUNT(*) AS n_rows,
        |  CAST(COUNT(DISTINCT (l_orderkey, l_linenumber)) AS BIGINT) AS n_distinct,
        |  CAST(COUNT(*) - COUNT(DISTINCT (l_orderkey, l_linenumber)) AS BIGINT) AS n_duplicate_rows,
        |  COUNT(*) = COUNT(DISTINCT (l_orderkey, l_linenumber)) AS passed
        |FROM lineitem""".stripMargin,

    // bucket = LENGTH(BIN(cnt)) - 1 on both engines (exact integer /
    // string arithmetic; floor(log2) would be IEEE-rounding-dependent
    // at exact powers of two)
    "q233_skew_profile" ->
      """WITH c AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM events GROUP BY user_id),
        |b AS (SELECT CAST(LENGTH(BIN(cnt)) - 1 AS INTEGER) AS bucket,
        |    cnt FROM c)
        |SELECT bucket, CAST(1 AS BIGINT) << bucket AS lo_cnt,
        |  CAST(COUNT(*) AS BIGINT) AS n_keys,
        |  CAST(SUM(cnt) AS BIGINT) AS n_rows,
        |  CAST(MAX(cnt) AS BIGINT) AS max_cnt
        |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin,

    "q188_fk_check" ->
      """WITH pk AS (SELECT DISTINCT c_custkey FROM customer
        |  WHERE c_acctbal >= 0),
        |base AS (SELECT o_custkey AS fk FROM orders),
        |orph AS (SELECT fk FROM base WHERE fk IS NOT NULL
        |  AND fk NOT IN (SELECT c_custkey FROM pk)),
        |o AS (SELECT COUNT(*) AS n_orphans,
        |    CAST(COUNT(DISTINCT fk) AS BIGINT) AS n_orphan_keys FROM orph),
        |b AS (SELECT COUNT(*) AS n_child,
        |    CAST(SUM(CASE WHEN fk IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_null_fk FROM base)
        |SELECT n_child, n_null_fk, n_orphans, n_orphan_keys,
        |  (10000 * n_orphans) // n_child AS orphan_bp
        |FROM b CROSS JOIN o""".stripMargin,

    "q248_cascade_purge" ->
      // key-only semi-join cascade replay; HUGEINT sums cast back
      """WITH del_c AS (SELECT DISTINCT c_custkey AS k FROM customer
        |  WHERE c_custkey % 97 = 0),
        |o AS (SELECT o_orderkey AS k, o_custkey AS fk FROM orders),
        |del_o AS (SELECT k FROM o WHERE fk IN (SELECT k FROM del_c)),
        |ot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
        |    CAST(COALESCE(SUM(k), 0) AS BIGINT) AS ts FROM o),
        |od AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_deleted,
        |    CAST(COALESCE(SUM(k), 0) AS BIGINT) AS ds FROM del_o),
        |l AS (SELECT l_orderkey * 10 + l_linenumber AS k,
        |    l_orderkey AS fk FROM lineitem),
        |del_l AS (SELECT k FROM l
        |  WHERE fk IN (SELECT DISTINCT k FROM del_o)),
        |lt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
        |    CAST(COALESCE(SUM(k), 0) AS BIGINT) AS ts FROM l),
        |ld AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_deleted,
        |    CAST(COALESCE(SUM(k), 0) AS BIGINT) AS ds FROM del_l)
        |SELECT CAST(1 AS INTEGER) AS lvl, 'orders' AS "table", n_rows,
        |  n_deleted, n_rows - n_deleted AS n_kept,
        |  ds AS deleted_key_sum, ts - ds AS kept_key_sum
        |FROM ot CROSS JOIN od
        |UNION ALL
        |SELECT CAST(2 AS INTEGER), 'lineitem', n_rows, n_deleted,
        |  n_rows - n_deleted, ds, ts - ds
        |FROM lt CROSS JOIN ld
        |ORDER BY lvl""".stripMargin,

    "q264_emit_changeset" ->
      // same mutation recipe as q205, emitting the minimal U/D feed:
      // D keeps old attrs, U carries new ones; null-safe compares
      """WITH o AS (SELECT o_orderkey AS k, o_orderstatus AS s,
        |    o_totalprice AS p FROM orders),
        |m0 AS (SELECT CASE WHEN k % 89 = 0 THEN k + 100000000 ELSE k END
        |    AS k, s, p FROM o WHERE k % 97 != 0),
        |m AS (SELECT k, s, CASE WHEN k % 13 = 0 THEN ROUND(p + 1, 2)
        |    ELSE p END AS p FROM m0),
        |j AS (SELECT COALESCE(o.k, m.k) AS k, o.k AS ok, m.k AS mk,
        |    o.s AS os, m.s AS ms, o.p AS op2, m.p AS mp
        |  FROM o FULL OUTER JOIN m ON o.k = m.k),
        |v AS (SELECT k,
        |    CASE WHEN mk IS NULL THEN 'D'
        |      WHEN ok IS NULL OR os IS DISTINCT FROM ms
        |        OR op2 IS DISTINCT FROM mp THEN 'U' END AS op,
        |    CASE WHEN mk IS NULL THEN os ELSE ms END AS s,
        |    CASE WHEN mk IS NULL THEN op2 ELSE mp END AS p
        |  FROM j)
        |SELECT k AS o_orderkey, op, CAST(7 AS BIGINT) AS version,
        |  s AS o_orderstatus, p AS o_totalprice
        |FROM v WHERE op IS NOT NULL ORDER BY o_orderkey""".stripMargin,

    "q263_fd_check" ->
      """WITH r AS (SELECT CAST(o_custkey AS VARCHAR) AS x,
        |    COALESCE(CAST(o_orderpriority AS VARCHAR),
        |      chr(0) || 'null') AS y
        |  FROM orders WHERE o_custkey IS NOT NULL),
        |pk AS (SELECT x, CAST(COUNT(*) AS BIGINT) AS nr,
        |    CAST(COUNT(DISTINCT y) AS BIGINT) AS ny FROM r GROUP BY x)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
        |  CAST(COUNT(*) FILTER (WHERE ny > 1) AS BIGINT)
        |    AS n_violating_keys,
        |  CAST(SUM(nr) AS BIGINT) AS n_rows,
        |  CAST(COALESCE(SUM(nr) FILTER (WHERE ny > 1), 0) AS BIGINT)
        |    AS n_rows_in_violating,
        |  (10000 * CAST(COALESCE(SUM(nr) FILTER (WHERE ny > 1), 0)
        |    AS BIGINT)) // CAST(SUM(nr) AS BIGINT) AS fd_bp
        |FROM pk""".stripMargin,

    "q271_isotonic_fit" -> {
      // minimax replay over the observed-bin grid: prefix sums by bin
      // rank, O(B²) range rates floored to ppm, min over k >= j per
      // range start, max over i <= j — identical quantization
      val bucket = graft.ops.Sketches.histBucketExpr(0.0, 1.0, 10)
      s"""WITH sc AS (SELECT
         |    LEAST(GREATEST(value / 200.0, 0.0), 1.0) AS v,
         |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
         |  FROM events WHERE value IS NOT NULL),
         |bb AS (SELECT $bucket AS bin, y FROM sc),
         |g AS (SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(y) AS BIGINT) AS n_pos
         |  FROM bb GROUP BY bin),
         |o AS (SELECT bin, n, n_pos,
         |    ROW_NUMBER() OVER (ORDER BY bin) AS j FROM g),
         |p AS (SELECT j, bin, n, n_pos,
         |    CAST(SUM(n) OVER (ORDER BY j) AS BIGINT) AS cn,
         |    CAST(SUM(n_pos) OVER (ORDER BY j) AS BIGINT) AS cp
         |  FROM o),
         |r AS (SELECT i.j AS i, k.j AS k,
         |    ((k.cp - i.cp + i.n_pos) * 1000000)
         |      // (k.cn - i.cn + i.n) AS ppm
         |  FROM p i JOIN p k ON i.j <= k.j),
         |mij AS (SELECT r.i, p2.j, MIN(r.ppm) AS m
         |  FROM r JOIN p p2 ON r.k >= p2.j AND r.i <= p2.j
         |  GROUP BY r.i, p2.j),
         |f AS (SELECT j, CAST(MAX(m) AS BIGINT) AS fitted_ppm
         |  FROM mij GROUP BY j)
         |SELECT o.bin, o.n, o.n_pos,
         |  (o.n_pos * 1000000) // o.n AS raw_ppm, f.fitted_ppm
         |FROM o JOIN f USING (j) ORDER BY o.bin""".stripMargin
    },

    // the FULL RESCAN — deliberately not a merge: matching the Spark
    // side's two-snapshot fold proves merge == recompute
    "q290_agg_snapshot_merge" ->
      """WITH b AS (SELECT o_orderstatus,
        |    CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders WHERE o_totalprice IS NOT NULL)
        |SELECT o_orderstatus, COUNT(*) AS n,
        |  CAST(SUM(cents) AS BIGINT) AS sum_c,
        |  MIN(cents) AS min_c, MAX(cents) AS max_c,
        |  CAST(SUM(CAST(cents AS HUGEINT)) // COUNT(*) AS BIGINT)
        |    AS mean_c
        |FROM b GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    // q284's ASOF replay with the group in the join key; groups whose
    // train slice is empty drop (no distribution to rank against)
    "q284b_cdf_transform_by" ->
      s"""WITH b AS (SELECT o_orderpriority AS grp, o_orderkey,
        |    CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
        |    ${graft.ops.Features.foldSql("o_orderkey", 4)} AS fold
        |  FROM orders WHERE o_orderpriority IS NOT NULL
        |    AND o_totalprice IS NOT NULL),
        |tr AS (SELECT grp, cents FROM b WHERE fold <> 0),
        |n AS (SELECT grp, COUNT(*) AS nt FROM tr GROUP BY grp),
        |rk AS (SELECT grp, cents,
        |    ROW_NUMBER() OVER (PARTITION BY grp ORDER BY cents) AS rle
        |  FROM tr),
        |cd AS (SELECT grp, cents, MAX(rle) AS n_le FROM rk GROUP BY 1, 2),
        |m AS (SELECT b.grp, b.o_orderkey, b.fold,
        |    COALESCE(cd.n_le, 0) AS n_le
        |  FROM b ASOF LEFT JOIN cd
        |    ON b.grp = cd.grp AND b.cents >= cd.cents)
        |SELECT m.grp, m.o_orderkey, CAST(m.fold AS BIGINT) AS fold,
        |  CAST((m.n_le * 10000) // n.nt AS BIGINT) AS cdf_bp
        |FROM m JOIN n ON m.grp = n.grp
        |ORDER BY m.grp, m.o_orderkey""".stripMargin,

    // bucket arithmetic replay: // floors where Spark's div truncs,
    // but only on negative shifted values, which the 0-clamp absorbs
    // identically; cumulative walks over the bounded (grp, bucket)
    // frame pick the first bucket whose cume reaches (n+1)//2
    "q289b_robust_z_by_hist" ->
      """WITH b AS (SELECT c_mktsegment AS grp, c_custkey,
        |    CAST(ROUND(c_acctbal * 100) AS BIGINT) AS c
        |  FROM customer WHERE c_mktsegment IS NOT NULL),
        |h AS (SELECT grp,
        |    LEAST(GREATEST((c - (-100000)) // 20000, 0), 54) AS b2,
        |    COUNT(*) AS cnt FROM b GROUP BY 1, 2),
        |cm AS (SELECT grp, -100000 + MIN(b2) * 20000 AS center FROM (
        |    SELECT grp, b2, cnt,
        |      SUM(cnt) OVER (PARTITION BY grp ORDER BY b2) AS cume,
        |      SUM(cnt) OVER (PARTITION BY grp) AS n
        |    FROM h) WHERE cume >= (n + 1) // 2 GROUP BY grp),
        |d AS (SELECT b.grp, b.c_custkey, b.c - cm.center AS dev_c
        |  FROM b JOIN cm USING (grp)),
        |h2 AS (SELECT grp,
        |    LEAST(GREATEST(ABS(dev_c) // 20000, 0), 54) AS b2,
        |    COUNT(*) AS cnt FROM d GROUP BY 1, 2),
        |sm AS (SELECT grp, MIN(b2) * 20000 AS scale FROM (
        |    SELECT grp, b2, cnt,
        |      SUM(cnt) OVER (PARTITION BY grp ORDER BY b2) AS cume,
        |      SUM(cnt) OVER (PARTITION BY grp) AS n
        |    FROM h2) WHERE cume >= (n + 1) // 2 GROUP BY grp)
        |SELECT d.grp, d.c_custkey, d.dev_c,
        |  CASE WHEN sm.scale <= 0 THEN NULL ELSE
        |    CAST((d.dev_c * 10000
        |      - ((((d.dev_c * 10000) % sm.scale) + sm.scale) % sm.scale))
        |      // sm.scale AS BIGINT)
        |  END AS z_bp
        |FROM d JOIN sm USING (grp) ORDER BY d.grp, d.c_custkey""".stripMargin,

    // the same rank-at-floor((n-1)/2) selections; ROW_NUMBER tie order
    // is irrelevant because the value AT a rank is duplicate-stable
    "q289_robust_z_by" ->
      """WITH b AS (SELECT c_mktsegment AS grp, c_custkey,
        |    CAST(ROUND(c_acctbal * 100) AS BIGINT) AS c
        |  FROM customer WHERE c_mktsegment IS NOT NULL),
        |m AS (SELECT grp, c AS med FROM (
        |    SELECT grp, c,
        |      ROW_NUMBER() OVER (PARTITION BY grp ORDER BY c) - 1 AS r,
        |      COUNT(*) OVER (PARTITION BY grp) AS n
        |    FROM b) WHERE r = (n - 1) // 2),
        |d AS (SELECT b.grp, b.c_custkey, b.c - m.med AS dev_c
        |  FROM b JOIN m USING (grp)),
        |a AS (SELECT grp, ad AS mad FROM (
        |    SELECT grp, ABS(dev_c) AS ad,
        |      ROW_NUMBER() OVER (PARTITION BY grp ORDER BY ABS(dev_c)) - 1
        |        AS r,
        |      COUNT(*) OVER (PARTITION BY grp) AS n
        |    FROM d) WHERE r = (n - 1) // 2)
        |SELECT d.grp, d.c_custkey, d.dev_c,
        |  CASE WHEN a.mad = 0 THEN NULL ELSE
        |    CAST((d.dev_c * 10000
        |      - ((((d.dev_c * 10000) % a.mad) + a.mad) % a.mad))
        |      // a.mad AS BIGINT)
        |  END AS z_bp
        |FROM d JOIN a USING (grp) ORDER BY d.grp, d.c_custkey""".stripMargin,

    // the q286 replay keyed by cohort; pmod == % on the non-negative
    // user_id
    "q287_threshold_report_by" ->
      """WITH sc AS (SELECT
        |    'cohort' || CAST(user_id % 3 AS VARCHAR) AS grp,
        |    CAST(FLOOR(LEAST(GREATEST(value / 200.0, 0.0), 1.0)
        |      * 1000000) AS BIGINT) AS vp,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        |  FROM events WHERE value IS NOT NULL AND user_id IS NOT NULL),
        |g AS (SELECT unnest([100000, 300000, 500000, 700000]) AS thr_ppm),
        |c AS (SELECT grp, thr_ppm,
        |    CAST(COUNT(*) FILTER (WHERE vp >= thr_ppm AND y = 1)
        |      AS BIGINT) AS tp,
        |    CAST(COUNT(*) FILTER (WHERE vp >= thr_ppm AND y = 0)
        |      AS BIGINT) AS fp,
        |    CAST(COUNT(*) FILTER (WHERE vp < thr_ppm AND y = 1)
        |      AS BIGINT) AS fn,
        |    CAST(COUNT(*) FILTER (WHERE vp < thr_ppm AND y = 0)
        |      AS BIGINT) AS tn
        |  FROM g, sc GROUP BY grp, thr_ppm)
        |SELECT grp, CAST(thr_ppm AS BIGINT) AS thr_ppm, tp, fp, fn, tn,
        |  CASE WHEN tp + fp = 0 THEN 0
        |    ELSE (tp * 10000) // (tp + fp) END AS precision_bp,
        |  CASE WHEN tp + fn = 0 THEN 0
        |    ELSE (tp * 10000) // (tp + fn) END AS recall_bp,
        |  CASE WHEN 2 * tp + fp + fn = 0 THEN 0
        |    ELSE (2 * tp * 10000) // (2 * tp + fp + fn) END AS f1_bp,
        |  CASE WHEN tp + fp + fn + tn = 0 THEN 0
        |    ELSE ((tp + tn) * 10000) // (tp + fp + fn + tn) END AS acc_bp
        |FROM c ORDER BY grp, thr_ppm""".stripMargin,

    // same ppm quantization (one IEEE floor on the identical double),
    // prediction = vp >= thr, single-division F1 identity
    "q314_auc_exact" ->
      """WITH e AS (SELECT user_id % 5 AS grp,
        |    CAST(FLOOR((value / 200.0) * 1000000) AS BIGINT) AS vp,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        |  FROM events WHERE value IS NOT NULL AND user_id IS NOT NULL
        |    AND event_type IS NOT NULL),
        |c AS (SELECT grp, vp,
        |    SUM(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS np,
        |    SUM(CASE WHEN y = 0 THEN 1 ELSE 0 END) AS nn
        |  FROM e GROUP BY grp, vp),
        |k AS (SELECT grp, vp, np, nn,
        |    COALESCE(SUM(nn) OVER (PARTITION BY grp ORDER BY vp
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS cb
        |  FROM c),
        |a AS (SELECT grp, CAST(SUM(np) AS BIGINT) AS n_pos,
        |    CAST(SUM(nn) AS BIGINT) AS n_neg,
        |    CAST(SUM(np * (2 * cb + nn)) AS BIGINT) AS u2
        |  FROM k GROUP BY grp)
        |SELECT grp, n_pos, n_neg,
        |  CASE WHEN n_pos = 0 OR n_neg = 0 THEN NULL
        |    ELSE CAST((CAST(u2 AS HUGEINT) * 1000000)
        |      // (2 * n_pos * n_neg) AS BIGINT) END AS auc_micro
        |FROM a ORDER BY grp""".stripMargin,

    "q286_threshold_report" ->
      """WITH sc AS (SELECT
        |    CAST(FLOOR(LEAST(GREATEST(value / 200.0, 0.0), 1.0)
        |      * 1000000) AS BIGINT) AS vp,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        |  FROM events WHERE value IS NOT NULL),
        |g AS (SELECT unnest([50000, 100000, 200000, 300000, 500000,
        |    700000, 900000]) AS thr_ppm),
        |c AS (SELECT thr_ppm,
        |    CAST(COUNT(*) FILTER (WHERE vp >= thr_ppm AND y = 1)
        |      AS BIGINT) AS tp,
        |    CAST(COUNT(*) FILTER (WHERE vp >= thr_ppm AND y = 0)
        |      AS BIGINT) AS fp,
        |    CAST(COUNT(*) FILTER (WHERE vp < thr_ppm AND y = 1)
        |      AS BIGINT) AS fn,
        |    CAST(COUNT(*) FILTER (WHERE vp < thr_ppm AND y = 0)
        |      AS BIGINT) AS tn
        |  FROM g, sc GROUP BY thr_ppm)
        |SELECT CAST(thr_ppm AS BIGINT) AS thr_ppm, tp, fp, fn, tn,
        |  CASE WHEN tp + fp = 0 THEN 0
        |    ELSE (tp * 10000) // (tp + fp) END AS precision_bp,
        |  CASE WHEN tp + fn = 0 THEN 0
        |    ELSE (tp * 10000) // (tp + fn) END AS recall_bp,
        |  CASE WHEN 2 * tp + fp + fn = 0 THEN 0
        |    ELSE (2 * tp * 10000) // (2 * tp + fp + fn) END AS f1_bp,
        |  CASE WHEN tp + fp + fn + tn = 0 THEN 0
        |    ELSE ((tp + tn) * 10000) // (tp + fp + fn + tn) END AS acc_bp
        |FROM c ORDER BY thr_ppm""".stripMargin,

    "q262_calibration" -> {
      val bucket = graft.ops.Sketches.histBucketExpr(0.0, 1.0, 10)
      s"""WITH sc AS (SELECT
         |    LEAST(GREATEST(value / 200.0, 0.0), 1.0) AS v,
         |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
         |  FROM events WHERE value IS NOT NULL),
         |b AS (SELECT $bucket AS bin, v, y FROM sc),
         |g AS (SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(y) AS BIGINT) AS n_pos,
         |    ROUND(AVG(v), 6) AS mean_score,
         |    CAST(FLOOR(ROUND(AVG(v), 6) * 1000000) AS BIGINT)
         |      AS conf_ppm
         |  FROM b GROUP BY bin),
         |r AS (SELECT bin, n, mean_score,
         |    (n_pos * 1000000) // n AS pos_ppm,
         |    ABS(conf_ppm - (n_pos * 1000000) // n) AS gap_ppm
         |  FROM g),
         |t AS (SELECT CAST(SUM(n * gap_ppm) AS BIGINT) AS wg,
         |    CAST(SUM(n) AS BIGINT) AS wn FROM r)
         |SELECT bin, n, mean_score, pos_ppm, gap_ppm,
         |  wg // wn AS ece_ppm
         |FROM r CROSS JOIN t ORDER BY bin""".stripMargin
    },

    "q256_mutual_info" ->
      """WITH v AS (SELECT CAST(o_orderpriority AS VARCHAR) AS x,
        |    CAST(o_orderstatus AS VARCHAR) AS y FROM orders
        |  WHERE o_orderpriority IS NOT NULL AND o_orderstatus IS NOT NULL),
        |cells AS (SELECT x, y, CAST(COUNT(*) AS BIGINT) AS nxy
        |  FROM v GROUP BY x, y),
        |mx AS (SELECT x, CAST(SUM(nxy) AS BIGINT) AS nx
        |  FROM cells GROUP BY x),
        |my AS (SELECT y, CAST(SUM(nxy) AS BIGINT) AS ny
        |  FROM cells GROUP BY y),
        |tot AS (SELECT CAST(SUM(nxy) AS BIGINT) AS n,
        |    CAST(COUNT(DISTINCT x) AS BIGINT) AS nxv,
        |    CAST(COUNT(DISTINCT y) AS BIGINT) AS nyv FROM cells),
        |terms AS (SELECT tot.n, tot.nxv, tot.nyv,
        |    CAST(FLOOR(1000000000.0
        |      * (CAST(nxy AS DOUBLE) / CAST(tot.n AS DOUBLE))
        |      * LN((CAST(nxy AS DOUBLE) * CAST(tot.n AS DOUBLE))
        |        / (CAST(mx.nx AS DOUBLE) * CAST(my.ny AS DOUBLE))))
        |      AS BIGINT) AS term
        |  FROM cells JOIN mx USING (x) JOIN my USING (y) CROSS JOIN tot)
        |SELECT n, nxv AS nx, nyv AS ny,
        |  CAST(SUM(term) AS BIGINT) AS mi_nano
        |FROM terms GROUP BY n, nxv, nyv""".stripMargin,

    "q266_cuped" ->
      // full replay: per-user pre/post means, pooled covar_pop/var_pop
      // theta, per-arm adjusted means, rho2 — every double ROUND(…, 6)
      """WITH ev AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
        |  FROM events WHERE value IS NOT NULL AND user_id IS NOT NULL),
        |pre AS (SELECT user_id, AVG(value) AS x FROM ev
        |  WHERE ts < TIMESTAMP '2024-01-16' GROUP BY user_id),
        |post AS (SELECT user_id, AVG(value) AS y FROM ev
        |  WHERE ts >= TIMESTAMP '2024-01-16' GROUP BY user_id),
        |per AS (SELECT CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END
        |    AS arm, x, y
        |  FROM pre JOIN post USING (user_id)),
        |g AS (SELECT covar_pop(x, y) AS cxy, var_pop(x) AS vx,
        |    var_pop(y) AS vy, AVG(x) AS mx FROM per),
        |a AS (SELECT arm, CAST(COUNT(*) AS BIGINT) AS n,
        |    AVG(y) AS my_a, AVG(x) AS mx_a FROM per GROUP BY arm)
        |SELECT arm, n, ROUND(my_a, 6) AS mean_y,
        |  ROUND(CASE WHEN vx > 0 THEN cxy / vx END, 6) AS theta,
        |  ROUND(my_a - CASE WHEN vx > 0 THEN cxy / vx END
        |    * (mx_a - mx), 6) AS mean_y_adj,
        |  ROUND(CASE WHEN vx > 0 AND vy > 0
        |    THEN cxy * cxy / (vx * vy) END, 6) AS var_reduction
        |FROM a CROSS JOIN g ORDER BY arm""".stripMargin,

    "q270_conversion_wilson" ->
      // exact counts, floor-ppm rate, Wilson bounds in ROUND(…, 6)
      // doubles — the identical formula expression tree
      """WITH per AS (SELECT user_id,
        |    MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS converted
        |  FROM events WHERE user_id IS NOT NULL GROUP BY user_id),
        |a AS (SELECT CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END
        |      AS grp,
        |    CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(converted) AS BIGINT) AS n_conv
        |  FROM per GROUP BY 1)
        |SELECT grp, n, n_conv, (n_conv * 1000000) // n AS conv_ppm,
        |  ROUND(((CAST(n_conv AS DOUBLE) / CAST(n AS DOUBLE))
        |      + 3.8416 / (2.0 * CAST(n AS DOUBLE))
        |      - 1.96 * SQRT((CAST(n_conv AS DOUBLE) / CAST(n AS DOUBLE))
        |        * (1.0 - CAST(n_conv AS DOUBLE) / CAST(n AS DOUBLE))
        |        / CAST(n AS DOUBLE)
        |        + 3.8416 / (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE))))
        |    / (1.0 + 3.8416 / CAST(n AS DOUBLE)), 6) AS wilson_lo,
        |  ROUND(((CAST(n_conv AS DOUBLE) / CAST(n AS DOUBLE))
        |      + 3.8416 / (2.0 * CAST(n AS DOUBLE))
        |      + 1.96 * SQRT((CAST(n_conv AS DOUBLE) / CAST(n AS DOUBLE))
        |        * (1.0 - CAST(n_conv AS DOUBLE) / CAST(n AS DOUBLE))
        |        / CAST(n AS DOUBLE)
        |        + 3.8416 / (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE))))
        |    / (1.0 + 3.8416 / CAST(n AS DOUBLE)), 6) AS wilson_hi
        |FROM a ORDER BY grp""".stripMargin,

    "q257_srm_check" ->
      """WITH a AS (SELECT CASE WHEN user_id % 97 = 0 THEN 'junk'
        |    WHEN user_id % 10 < 5 THEN 'control'
        |    ELSE 'treatment' END AS arm
        |  FROM events WHERE user_id IS NOT NULL),
        |counts AS (SELECT arm, CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM a GROUP BY arm),
        |grid AS (SELECT 'control' AS arm, CAST(1 AS BIGINT) AS w
        |  UNION ALL SELECT 'treatment', 1),
        |known AS (SELECT grid.arm, grid.w, COALESCE(counts.cnt, 0) AS cnt
        |  FROM grid LEFT JOIN counts USING (arm)),
        |tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n_assigned FROM known),
        |unexp AS (SELECT CAST(COALESCE(SUM(cnt), 0) AS BIGINT)
        |    AS n_unexpected
        |  FROM counts WHERE arm NOT IN (SELECT arm FROM grid))
        |SELECT known.arm, cnt AS n,
        |  (w * 1000000) // 2 AS expected_ppm,
        |  CASE WHEN n_assigned = 0 THEN 0
        |    ELSE (cnt * 1000000) // n_assigned END AS observed_ppm,
        |  CASE WHEN n_assigned = 0 THEN 0
        |    ELSE (cnt * 1000000) // n_assigned END
        |    - (w * 1000000) // 2 AS dev_ppm,
        |  CASE WHEN n_assigned = 0 THEN CAST(0.0 AS DOUBLE)
        |    ELSE ROUND(CAST((cnt * 2 - w * n_assigned)
        |        * (cnt * 2 - w * n_assigned) AS DOUBLE)
        |      / CAST(w * 2 * n_assigned AS DOUBLE), 6) END AS chi2_term
        |FROM known CROSS JOIN tot
        |UNION ALL
        |SELECT '__unexpected__', n_unexpected, 0, 0, 0,
        |  CAST(0.0 AS DOUBLE) FROM unexp
        |ORDER BY arm""".stripMargin,

    "q250_t_closeness" ->
      // same cross-multiplied integer EMD: prefix of
      // pc*N - qcnt*n_class over the ordered value domain
      """WITH vals AS (SELECT c_mktsegment AS qc, o_orderpriority AS v
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  WHERE c_mktsegment IS NOT NULL AND o_orderpriority IS NOT NULL),
        |g AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS qcnt
        |  FROM vals GROUP BY v),
        |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(COUNT(DISTINCT v) AS BIGINT) AS m FROM vals),
        |cls AS (SELECT qc, CAST(COUNT(*) AS BIGINT) AS nc
        |  FROM vals GROUP BY qc),
        |cell AS (SELECT qc, v, CAST(COUNT(*) AS BIGINT) AS pc
        |  FROM vals GROUP BY qc, v),
        |grid AS (SELECT cls.qc, cls.nc, g.v, g.qcnt, tot.n, tot.m,
        |    COALESCE(cell.pc, 0) AS pc
        |  FROM cls CROSS JOIN g CROSS JOIN tot
        |  LEFT JOIN cell ON cell.qc = cls.qc AND cell.v = g.v),
        |pref AS (SELECT qc, nc, n, m,
        |    SUM(pc * n - qcnt * nc) OVER (PARTITION BY qc ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p
        |  FROM grid),
        |agg AS (SELECT qc, nc, n, m, CAST(SUM(ABS(p)) AS BIGINT)
        |    AS emd_num FROM pref GROUP BY qc, nc, n, m)
        |SELECT qc AS c_mktsegment, nc AS n_class,
        |  CASE WHEN m <= 1 THEN 0
        |    ELSE (1000000 * emd_num) // (nc * n * (m - 1)) END AS emd_ppm
        |FROM agg ORDER BY c_mktsegment""".stripMargin,

    "q188b_fk_orphan_keys" ->
      """WITH pk AS (SELECT DISTINCT c_custkey FROM customer
        |  WHERE c_acctbal >= 0)
        |SELECT o_custkey AS orphan_key, COUNT(*) AS n_rows FROM orders
        |WHERE o_custkey IS NOT NULL
        |  AND o_custkey NOT IN (SELECT c_custkey FROM pk)
        |GROUP BY 1 ORDER BY n_rows DESC, orphan_key LIMIT 20""".stripMargin,

    "q205_table_diff" ->
      """WITH o AS (SELECT o_orderkey AS k, o_orderstatus AS s,
        |    o_totalprice AS p FROM orders),
        |m0 AS (SELECT CASE WHEN k % 89 = 0 THEN k + 100000000 ELSE k END
        |    AS k, s, p FROM o WHERE k % 97 != 0),
        |m AS (SELECT k, s, CASE WHEN k % 13 = 0 THEN ROUND(p + 1, 2)
        |    ELSE p END AS p FROM m0),
        |j AS (SELECT o.k AS ok, m.k AS mk, o.s AS os, m.s AS ms,
        |    o.p AS op_, m.p AS mp
        |  FROM o FULL JOIN m ON o.k = m.k),
        |a AS (SELECT
        |  CAST(SUM(CASE WHEN ok IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS rows_old,
        |  CAST(SUM(CASE WHEN mk IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS rows_new,
        |  CAST(SUM(CASE WHEN ok IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS added,
        |  CAST(SUM(CASE WHEN mk IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS removed,
        |  CAST(SUM(CASE WHEN ok IS NOT NULL AND mk IS NOT NULL
        |    AND (os IS DISTINCT FROM ms OR op_ IS DISTINCT FROM mp)
        |    THEN 1 ELSE 0 END) AS BIGINT) AS changed,
        |  CAST(SUM(CASE WHEN ok IS NOT NULL AND mk IS NOT NULL
        |    AND os IS NOT DISTINCT FROM ms AND op_ IS NOT DISTINCT FROM mp
        |    THEN 1 ELSE 0 END) AS BIGINT) AS unchanged,
        |  CAST(SUM(CASE WHEN ok IS NOT NULL AND mk IS NOT NULL
        |    AND os IS DISTINCT FROM ms THEN 1 ELSE 0 END) AS BIGINT)
        |    AS chg_status,
        |  CAST(SUM(CASE WHEN ok IS NOT NULL AND mk IS NOT NULL
        |    AND op_ IS DISTINCT FROM mp THEN 1 ELSE 0 END) AS BIGINT)
        |    AS chg_price
        |  FROM j)
        |SELECT 'rows_old' AS metric, rows_old AS n FROM a
        |UNION ALL SELECT 'rows_new', rows_new FROM a
        |UNION ALL SELECT 'added', added FROM a
        |UNION ALL SELECT 'removed', removed FROM a
        |UNION ALL SELECT 'changed', changed FROM a
        |UNION ALL SELECT 'unchanged', unchanged FROM a
        |UNION ALL SELECT 'col_changed:o_orderstatus', chg_status FROM a
        |UNION ALL SELECT 'col_changed:o_totalprice', chg_price FROM a
        |ORDER BY metric""".stripMargin,

    "q190_k_anonymity" ->
      """WITH base AS (SELECT c_nationkey, c_mktsegment,
        |    CASE WHEN c_acctbal >= 0 THEN 'pos' ELSE 'neg' END AS bal_sign
        |  FROM customer),
        |cls AS (SELECT c_nationkey, c_mktsegment, COUNT(*) AS sz,
        |    CAST(COUNT(DISTINCT bal_sign) AS BIGINT) AS l
        |  FROM base GROUP BY 1, 2)
        |SELECT CAST(SUM(sz) AS BIGINT) AS n_rows, COUNT(*) AS n_classes,
        |  CAST(MIN(sz) AS BIGINT) AS min_class_size,
        |  CAST(SUM(CASE WHEN sz < 5 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_violating_classes,
        |  CAST(SUM(CASE WHEN sz < 5 THEN sz ELSE 0 END) AS BIGINT)
        |    AS rows_at_risk,
        |  (10000 * CAST(SUM(CASE WHEN sz < 5 THEN sz ELSE 0 END) AS BIGINT))
        |    // CAST(SUM(sz) AS BIGINT) AS risk_bp,
        |  CAST(MIN(l) AS BIGINT) AS l_min
        |FROM cls""".stripMargin,

    // per-level census over cents floor-div buckets (positive-mod
    // construction so negative balances land in their LOWER bucket in
    // both engines), chosen = the finest zero-risk level
    "q190b_generalize_to_k" ->
      """WITH base AS (SELECT c_mktsegment,
        |    CAST(ROUND(c_acctbal * 100) AS BIGINT) AS cents FROM customer),
        |lv AS (SELECT * FROM (VALUES (100), (1000), (5000), (20000)) t(b)),
        |cls AS (SELECT b, c_mktsegment,
        |    (cents - (((cents % (b * 100)) + (b * 100)) % (b * 100)))
        |      // (b * 100) AS qb,
        |    COUNT(*) AS sz
        |  FROM base, lv GROUP BY 1, 2, 3),
        |per AS (SELECT CAST(b AS BIGINT) AS bucket_sz,
        |    CAST(SUM(sz) AS BIGINT) AS n_rows,
        |    COUNT(*) AS n_classes,
        |    CAST(MIN(sz) AS BIGINT) AS min_class_size,
        |    CAST(SUM(CASE WHEN sz < 5 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_violating_classes,
        |    CAST(SUM(CASE WHEN sz < 5 THEN sz ELSE 0 END) AS BIGINT)
        |      AS rows_at_risk,
        |    (10000 * CAST(SUM(CASE WHEN sz < 5 THEN sz ELSE 0 END) AS BIGINT))
        |      // CAST(SUM(sz) AS BIGINT) AS risk_bp
        |  FROM cls GROUP BY b),
        |ok AS (SELECT MIN(bucket_sz) AS f FROM per WHERE rows_at_risk = 0)
        |SELECT per.*, ok.f IS NOT NULL AND bucket_sz = ok.f AS chosen
        |FROM per, ok ORDER BY bucket_sz""".stripMargin,

    "q277_categorify" ->
      """WITH v AS (SELECT lang AS vv, COUNT(*) AS n FROM documents
        |  WHERE lang IS NOT NULL GROUP BY 1 HAVING COUNT(*) >= 80),
        |r AS (SELECT vv,
        |    CAST(ROW_NUMBER() OVER (ORDER BY n DESC, vv ASC) AS BIGINT)
        |      AS lang_id
        |  FROM v)
        |SELECT d.doc_id, d.lang, COALESCE(r.lang_id, 0) AS lang_id
        |FROM documents d LEFT JOIN r ON d.lang = r.vv
        |ORDER BY d.doc_id""".stripMargin,

    // out-of-fold replay: per-(category, fold) partials, complement =
    // category total minus the row's own fold, prior = global floor
    // micro-cents mean; // == Spark's div on the all-positive operands
    "q278_target_encode" ->
      s"""WITH b AS (SELECT o_orderkey, o_orderpriority AS c,
        |    CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
        |    ${graft.ops.Features.foldSql("o_orderkey", 4)} AS fold
        |  FROM orders),
        |cells AS (SELECT c, fold, SUM(cents) AS s, COUNT(*) AS n
        |  FROM b GROUP BY 1, 2),
        |tot AS (SELECT c, SUM(s) AS st, SUM(n) AS nt FROM cells GROUP BY 1),
        |pr AS (SELECT CAST((SUM(cents) * 1000000) // COUNT(*) AS BIGINT)
        |    AS pm FROM b),
        |enc AS (SELECT c, fold,
        |    CAST(((st - s) * 1000000 + 10 * pm) // (nt - n + 10) AS BIGINT)
        |      AS te
        |  FROM cells JOIN tot USING (c), pr)
        |SELECT b.o_orderkey, b.c AS o_orderpriority,
        |  CAST(b.fold AS BIGINT) AS fold,
        |  COALESCE(e.te, pr.pm) AS o_orderpriority_te_micro
        |FROM b LEFT JOIN enc e ON b.c = e.c AND b.fold = e.fold, pr
        |ORDER BY b.o_orderkey""".stripMargin,

    // fit on folds 1..3 only, score everyone: floored mean via
    // positive-mod, variance around the floored mean (non-negative
    // numerator, so // == div), floor(sqrt) on the same exact integer,
    // z in floor bp via positive-mod — HUGEINT mirrors Spark's
    // DECIMAL(38,0) sums
    "q280_standard_scale" ->
      s"""WITH b AS (SELECT o_orderkey,
        |    CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
        |    ${graft.ops.Features.foldSql("o_orderkey", 4)} AS fold
        |  FROM orders),
        |tr AS (SELECT COUNT(*) AS n, SUM(CAST(cents AS HUGEINT)) AS s1,
        |    SUM(CAST(cents AS HUGEINT) * cents) AS s2
        |  FROM b WHERE fold <> 0),
        |ms AS (SELECT n, s1, s2,
        |    CAST((s1 - ((s1 % n + n) % n)) // n AS BIGINT) AS m FROM tr),
        |vr AS (SELECT m,
        |    CAST((s2 - 2 * CAST(m AS HUGEINT) * s1
        |        + CAST(n AS HUGEINT) * m * m) // n AS BIGINT) AS vv
        |  FROM ms),
        |s0 AS (SELECT m, vv,
        |    CAST(FLOOR(SQRT(CAST(vv AS DOUBLE))) AS BIGINT) AS r0 FROM vr),
        |sd AS (SELECT m,
        |    CASE WHEN CAST(r0 AS HUGEINT) * r0 > vv THEN r0 - 1
        |         WHEN CAST(r0 + 1 AS HUGEINT) * (r0 + 1) <= vv THEN r0 + 1
        |         ELSE r0 END
        |      AS std_c
        |  FROM s0)
        |SELECT b.o_orderkey, CAST(b.fold AS BIGINT) AS fold,
        |  b.cents - sd.m AS dev_c,
        |  CASE WHEN sd.std_c = 0 THEN NULL ELSE
        |    CAST(((b.cents - sd.m) * 10000
        |      - (((((b.cents - sd.m) * 10000) % sd.std_c) + sd.std_c)
        |         % sd.std_c)) // sd.std_c AS BIGINT)
        |  END AS z_bp
        |FROM b, sd ORDER BY b.o_orderkey""".stripMargin,

    // type-1 order statistics at ranks floor(q·(n−1)/4): the value AT
    // a rank is duplicate-stable, so ROW_NUMBER's tie order is
    // irrelevant; signed z via the positive-mod floor spelling
    "q283_robust_scale" ->
      s"""WITH b AS (SELECT c_custkey,
        |    CAST(ROUND(c_acctbal * 100) AS BIGINT) AS cents,
        |    ${graft.ops.Features.foldSql("c_custkey", 4)} AS fold
        |  FROM customer),
        |tr AS (SELECT cents FROM b WHERE fold <> 0),
        |n AS (SELECT COUNT(*) AS n FROM tr),
        |rk AS (SELECT cents, ROW_NUMBER() OVER (ORDER BY cents) - 1 AS r
        |  FROM tr),
        |q AS (SELECT
        |    (SELECT cents FROM rk, n WHERE r = (1 * (n.n - 1)) // 4) AS p25,
        |    (SELECT cents FROM rk, n WHERE r = (2 * (n.n - 1)) // 4) AS med,
        |    (SELECT cents FROM rk, n WHERE r = (3 * (n.n - 1)) // 4) AS p75)
        |SELECT b.c_custkey, CAST(b.fold AS BIGINT) AS fold,
        |  b.cents - q.med AS dev_c,
        |  CASE WHEN q.p75 - q.p25 = 0 THEN NULL ELSE
        |    CAST(((b.cents - q.med) * 10000
        |      - (((((b.cents - q.med) * 10000) % (q.p75 - q.p25))
        |          + (q.p75 - q.p25)) % (q.p75 - q.p25)))
        |      // (q.p75 - q.p25) AS BIGINT)
        |  END AS z_bp
        |FROM b, q ORDER BY b.c_custkey""".stripMargin,

    // |{train <= x}| = the max train rank at each distinct value,
    // fetched per row by DuckDB's native ASOF (largest cents <= x) —
    // the same count searchSortedLarge's x+1 probe produces
    "q284_cdf_transform" ->
      s"""WITH b AS (SELECT o_orderkey,
        |    CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
        |    ${graft.ops.Features.foldSql("o_orderkey", 4)} AS fold
        |  FROM orders),
        |tr AS (SELECT cents FROM b WHERE fold <> 0),
        |n AS (SELECT COUNT(*) AS nt FROM tr),
        |rk AS (SELECT cents, ROW_NUMBER() OVER (ORDER BY cents) AS rle
        |  FROM tr),
        |cd AS (SELECT cents, MAX(rle) AS n_le FROM rk GROUP BY cents),
        |m AS (SELECT b.o_orderkey, b.fold, COALESCE(cd.n_le, 0) AS n_le
        |  FROM b ASOF LEFT JOIN cd ON b.cents >= cd.cents)
        |SELECT m.o_orderkey, CAST(m.fold AS BIGINT) AS fold,
        |  CAST((m.n_le * 10000) // n.nt AS BIGINT) AS cdf_bp
        |FROM m, n ORDER BY m.o_orderkey""".stripMargin,

    "q281_hash_bucket" ->
      s"""WITH h AS (SELECT p_type,
         |    ${graft.ops.Sketches.kmvScrambleSql(
               graft.ops.Sketches.polyHashSql("p_type"))} % 32 AS bucket
         |  FROM part WHERE p_type IS NOT NULL),
         |pc AS (SELECT bucket, p_type, COUNT(*) AS n FROM h GROUP BY 1, 2)
         |SELECT bucket, CAST(SUM(n) AS BIGINT) AS n_rows,
         |  COUNT(*) AS n_cats, CAST(MAX(n) AS BIGINT) AS max_cat_rows
         |FROM pc GROUP BY bucket ORDER BY bucket""".stripMargin,

    "q216_quantile_map" ->
      """WITH c0 AS (SELECT event_id, CAST(value AS DOUBLE) AS v
        |  FROM events WHERE event_type = 'purchase' AND value IS NOT NULL),
        |r0 AS (SELECT CAST(value AS DOUBLE) AS v
        |  FROM events WHERE event_type = 'click' AND value IS NOT NULL),
        |cn AS (SELECT COUNT(*) AS n FROM c0),
        |rn AS (SELECT COUNT(*) AS n FROM r0),
        |cr AS (SELECT v, ROW_NUMBER() OVER (ORDER BY v) - 1 AS r FROM c0),
        |rr AS (SELECT v, ROW_NUMBER() OVER (ORDER BY v) - 1 AS r FROM r0),
        |qs AS (SELECT CAST(g.i AS BIGINT) AS q FROM range(17) g(i)),
        |cl AS (SELECT q, cr.v AS lv FROM qs CROSS JOIN cn
        |  JOIN cr ON cr.r = q * (cn.n - 1) // 16),
        |rl AS (SELECT q, rr.v AS rv FROM qs CROSS JOIN rn
        |  JOIN rr ON rr.r = q * (rn.n - 1) // 16),
        |m AS (SELECT c0.event_id, c0.v,
        |    GREATEST(0, (SELECT COUNT(*) FROM cl WHERE cl.lv <= c0.v) - 1)
        |      AS q_idx
        |  FROM c0)
        |SELECT m.event_id, ROUND(m.v, 2) AS value,
        |  CAST(m.q_idx AS INTEGER) AS q_idx, rl.rv AS mapped
        |FROM m JOIN rl ON rl.q = m.q_idx
        |ORDER BY m.event_id""".stripMargin,

    "q216b_quantile_map_hist" -> {
      val bucketExpr = graft.ops.Sketches.histBucketExpr(0.0, 200.0, 32)
      val midExpr = graft.ops.Validate.histMidExpr(0.0, 200.0, 32)
      s"""WITH c0 AS (SELECT event_id, CAST(value AS DOUBLE) AS v
         |  FROM events WHERE event_type = 'purchase' AND value IS NOT NULL),
         |r0 AS (SELECT CAST(value AS DOUBLE) AS v
         |  FROM events WHERE event_type = 'click' AND value IS NOT NULL),
         |chist AS (SELECT $bucketExpr AS bucket, COUNT(*) AS cnt
         |  FROM c0 GROUP BY 1),
         |rhist AS (SELECT $bucketExpr AS bucket, COUNT(*) AS cnt
         |  FROM r0 GROUP BY 1),
         |cc AS (SELECT a.bucket, CAST(SUM(b.cnt) AS BIGINT) AS cume
         |  FROM chist a JOIN chist b ON b.bucket <= a.bucket
         |  GROUP BY a.bucket),
         |rc AS (SELECT a.bucket, CAST(SUM(b.cnt) AS BIGINT) AS cume
         |  FROM rhist a JOIN rhist b ON b.bucket <= a.bucket
         |  GROUP BY a.bucket),
         |nc AS (SELECT MAX(cume) AS n_cur FROM cc),
         |nr AS (SELECT MAX(cume) AS n_ref FROM rc),
         |mp AS (SELECT c.bucket, MIN(r.bucket) AS mapped_bucket
         |  FROM cc c CROSS JOIN nc CROSS JOIN nr
         |  JOIN rc r ON r.cume * n_cur >= c.cume * n_ref
         |  GROUP BY c.bucket)
         |SELECT b.event_id, ROUND(b.v, 2) AS value, b.bucket,
         |  mp.mapped_bucket, $midExpr AS mapped
         |FROM (SELECT event_id, v, $bucketExpr AS bucket FROM c0) b
         |JOIN mp USING (bucket)
         |ORDER BY b.event_id""".stripMargin
    },

    "q215b_benford_by" -> {
      val exp = graft.ops.Validate.benfordExpBp
      val expCase = (1 to 9).map(dd =>
        s"WHEN digit = $dd THEN ${exp(dd - 1)}").mkString(" ")
      s"""WITH src AS (SELECT o_orderpriority AS grp,
         |    ABS(CAST(o_totalprice AS DOUBLE)) AS v
         |  FROM orders
         |  WHERE o_totalprice IS NOT NULL AND o_orderpriority IS NOT NULL),
         |cls AS (SELECT grp, CASE WHEN v >= 0.001 AND v < 10000000.0
         |    THEN ${graft.ops.Validate.benfordDigitExpr}
         |    ELSE -1 END AS digit FROM src),
         |agg AS (SELECT grp, digit, COUNT(*) AS n FROM cls GROUP BY 1, 2),
         |grid AS (SELECT g.grp, CAST(r.i + 1 AS INTEGER) AS digit
         |  FROM (SELECT DISTINCT grp FROM src) g CROSS JOIN range(9) r(i)),
         |dens AS (SELECT g.grp, g.digit,
         |    CAST(COALESCE(a.n, 0) AS BIGINT) AS n
         |  FROM grid g LEFT JOIN agg a ON g.grp = a.grp AND g.digit = a.digit
         |  UNION ALL SELECT grp, digit, n FROM agg WHERE digit = -1),
         |tot AS (SELECT *,
         |    CAST(SUM(CASE WHEN digit != -1 THEN n ELSE 0 END)
         |      OVER (PARTITION BY grp) AS BIGINT) AS t,
         |    CAST(SUM(CASE WHEN digit = -1 THEN n ELSE 0 END)
         |      OVER (PARTITION BY grp) AS BIGINT) AS n_excluded
         |  FROM dens)
         |SELECT grp, digit, n,
         |  CASE WHEN t = 0 THEN 0 ELSE (n * 10000) // t END AS obs_bp,
         |  CAST(CASE $expCase END AS BIGINT) AS exp_bp,
         |  ABS(CASE WHEN t = 0 THEN 0 ELSE (n * 10000) // t END
         |    - CAST(CASE $expCase END AS BIGINT)) AS dev_bp,
         |  n_excluded
         |FROM tot WHERE digit != -1 ORDER BY grp, digit""".stripMargin
    },

    "q215_benford" -> {
      val exp = graft.ops.Validate.benfordExpBp
      val expCase = (1 to 9).map(dd =>
        s"WHEN digit = $dd THEN ${exp(dd - 1)}").mkString(" ")
      s"""WITH src AS (SELECT ABS(CAST(o_totalprice AS DOUBLE)) AS v
         |  FROM orders WHERE o_totalprice IS NOT NULL),
         |cls AS (SELECT CASE WHEN v >= 0.001 AND v < 10000000.0
         |    THEN ${graft.ops.Validate.benfordDigitExpr}
         |    ELSE -1 END AS digit FROM src),
         |agg AS (SELECT digit, COUNT(*) AS n FROM cls GROUP BY digit),
         |ex AS (SELECT COALESCE(SUM(n), 0) AS n_excluded FROM agg
         |  WHERE digit = -1),
         |t AS (SELECT CAST(SUM(n) AS BIGINT) AS t FROM agg
         |  WHERE digit != -1),
         |grid AS (SELECT CAST(r.i + 1 AS INTEGER) AS digit FROM range(9) r(i)),
         |j AS (SELECT g.digit, CAST(COALESCE(a.n, 0) AS BIGINT) AS n
         |  FROM grid g LEFT JOIN agg a ON g.digit = a.digit)
         |SELECT j.digit, j.n, (j.n * 10000) // t.t AS obs_bp,
         |  CAST(CASE $expCase END AS BIGINT) AS exp_bp,
         |  ABS((j.n * 10000) // t.t - CAST(CASE $expCase END AS BIGINT))
         |    AS dev_bp,
         |  CAST(ex.n_excluded AS BIGINT) AS n_excluded
         |FROM j CROSS JOIN t CROSS JOIN ex ORDER BY j.digit""".stripMargin
    },

    // micro quantization BEFORE summation; means via the sign-split
    // truncating division (// floors in DuckDB, so the split is load-
    // bearing for negative sums)
    "q223_embedding_drift" ->
      """WITH o AS (SELECT CAST(t.i - 1 AS INTEGER) AS i,
        |    CAST(SUM(CAST(FLOOR(CAST(embedding[t.i] AS DOUBLE) * 1000000.0) AS BIGINT)) AS BIGINT) AS s_old,
        |    COUNT(*) AS n_old
        |  FROM embeddings CROSS JOIN range(1, 65) t(i)
        |  WHERE vec_id % 2 = 0 GROUP BY 1),
        |f AS (SELECT CAST(t.i - 1 AS INTEGER) AS i,
        |    CAST(SUM(CAST(FLOOR((CAST(embedding[t.i] AS DOUBLE)
        |      + CASE WHEN t.i <= 3 THEN CAST(0.1 AS DOUBLE)
        |        ELSE CAST(0 AS DOUBLE) END) * 1000000.0) AS BIGINT)) AS BIGINT) AS s_new,
        |    COUNT(*) AS n_new
        |  FROM embeddings CROSS JOIN range(1, 65) t(i)
        |  WHERE vec_id % 2 = 1 GROUP BY 1),
        |j AS (SELECT o.i, n_old, n_new,
        |    CAST(CASE WHEN s_old < 0 THEN -((-(s_old)) // n_old)
        |      ELSE (s_old) // n_old END AS BIGINT) AS mean_old_micro,
        |    CAST(CASE WHEN s_new < 0 THEN -((-(s_new)) // n_new)
        |      ELSE (s_new) // n_new END AS BIGINT) AS mean_new_micro
        |  FROM o JOIN f USING (i))
        |SELECT i, n_old, n_new, mean_old_micro, mean_new_micro,
        |  mean_new_micro - mean_old_micro AS shift_micro,
        |  ABS(mean_new_micro - mean_old_micro) AS abs_shift_micro
        |FROM j ORDER BY i""".stripMargin,

    "q207_ks_drift" -> {
      val bounds = Seq(10.0, 20.0, 40.0, 80.0, 160.0)
      val grid = (bounds.map(b => s"'le_$b'") :+ "'overflow'")
        .zipWithIndex.map { case (l, i) => s"($l, $i)" }.mkString(", ")
      s"""WITH r0 AS (SELECT CAST(value AS DOUBLE) AS v FROM events
         |  WHERE event_type = 'click' AND value IS NOT NULL),
         |c0 AS (SELECT CAST(value AS DOUBLE) AS v FROM events
         |  WHERE event_type = 'purchase' AND value IS NOT NULL),
         |rb AS (SELECT ${graft.ops.Validate.psiBucketExpr(bounds)} AS bucket,
         |    COUNT(*) AS nr FROM r0 GROUP BY 1),
         |cb AS (SELECT ${graft.ops.Validate.psiBucketExpr(bounds)} AS bucket,
         |    COUNT(*) AS nc FROM c0 GROUP BY 1),
         |grid AS (SELECT * FROM (VALUES $grid) AS g(bucket, pos)),
         |j AS (SELECT grid.bucket, grid.pos,
         |    CAST(COALESCE(nr, 0) AS BIGINT) AS nr,
         |    CAST(COALESCE(nc, 0) AS BIGINT) AS nc
         |  FROM grid LEFT JOIN rb USING (bucket) LEFT JOIN cb USING (bucket)),
         |c AS (SELECT bucket, pos,
         |    CAST(SUM(nr) OVER (ORDER BY pos ROWS BETWEEN UNBOUNDED
         |      PRECEDING AND CURRENT ROW) AS BIGINT) AS cr,
         |    CAST(SUM(nc) OVER (ORDER BY pos ROWS BETWEEN UNBOUNDED
         |      PRECEDING AND CURRENT ROW) AS BIGINT) AS cc,
         |    CAST(SUM(nr) OVER () AS BIGINT) AS t_ref,
         |    CAST(SUM(nc) OVER () AS BIGINT) AS t_cur
         |  FROM j),
         |g AS (SELECT bucket, pos, t_ref, t_cur,
         |    CAST(ABS((cr * 10000) // t_ref - (cc * 10000) // t_cur)
         |      AS BIGINT) AS gap_bp
         |  FROM c),
         |rk AS (SELECT *, ROW_NUMBER() OVER (ORDER BY gap_bp DESC, pos)
         |    AS r FROM g)
         |SELECT gap_bp AS ks_bp, bucket AS at_bucket,
         |  t_ref AS n_ref, t_cur AS n_cur
         |FROM rk WHERE r = 1""".stripMargin
    },

    "q189_psi_drift" -> {
      val bounds = Seq(10.0, 20.0, 40.0, 80.0, 160.0)
      val labels = (bounds.map(b => s"'le_$b'") :+ "'overflow'").mkString(", ")
      s"""WITH r0 AS (SELECT CAST(value AS DOUBLE) AS v FROM events
         |  WHERE event_type = 'click' AND value IS NOT NULL),
         |c0 AS (SELECT CAST(value AS DOUBLE) AS v FROM events
         |  WHERE event_type = 'purchase' AND value IS NOT NULL),
         |rb AS (SELECT ${graft.ops.Validate.psiBucketExpr(bounds)} AS bucket,
         |    COUNT(*) AS nr FROM r0 GROUP BY 1),
         |cb AS (SELECT ${graft.ops.Validate.psiBucketExpr(bounds)} AS bucket,
         |    COUNT(*) AS nc FROM c0 GROUP BY 1),
         |grid AS (SELECT unnest([$labels]) AS bucket),
         |j AS (SELECT grid.bucket,
         |    CAST(COALESCE(nr, 0) + 1 AS BIGINT) AS n_ref,
         |    CAST(COALESCE(nc, 0) + 1 AS BIGINT) AS n_cur
         |  FROM grid LEFT JOIN rb USING (bucket) LEFT JOIN cb USING (bucket)),
         |tot AS (SELECT CAST(SUM(n_ref) AS BIGINT) AS t_ref,
         |    CAST(SUM(n_cur) AS BIGINT) AS t_cur FROM j),
         |terms AS (SELECT bucket, n_ref, n_cur,
         |    ${graft.ops.Validate.psiTermExpr} AS psi_nano_term
         |  FROM j CROSS JOIN tot),
         |ttl AS (SELECT CAST(SUM(psi_nano_term) AS BIGINT) AS psi_nano
         |  FROM terms)
         |SELECT bucket, n_ref, n_cur, psi_nano_term, psi_nano
         |FROM terms CROSS JOIN ttl ORDER BY bucket""".stripMargin
    }
  )
}
