package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reusable pandas-parity frame operators (SURVEY §2.2/§2.4/§2.5/§2.6).
  *
  * These are the library form of semantics the gated queries exercise —
  * the q-numbered definitions in `graft.queries` delegate here, so every
  * operator body below is hash-gated against the DuckDB oracle, not just
  * spec-tested. All of them are single-window or single-aggregation
  * plans: one hash Exchange on the grouping keys (plus a sort for the
  * ordered ones), no driver-side loops, no UDFs — the same cost profile
  * at 100 TB as any keyed window/aggregation.
  *
  * Reference surface: fillna(method=) [python/cudf/cudf/core/dataframe.py
  * :: DataFrame.fillna], Series.pct_change, Series.rank(method='average'),
  * groupby head/nlargest, Series.value_counts, Series.mode,
  * cudf.factorize.
  */
object FrameOps {

  private def w(partitionBy: Seq[String], orderBy: Seq[String]) =
    Window.partitionBy(partitionBy.map(col): _*).orderBy(orderBy.map(col): _*)

  /** pandas `ffill`: latest non-null of `valueCol` at or before the
    * current row (per partition, in `orderBy` order), as column `as`.
    * Leading nulls stay null.
    */
  def ffill(df: DataFrame, valueCol: String, partitionBy: Seq[String],
      orderBy: Seq[String], as: String): DataFrame =
    df.withColumn(as, last(col(valueCol), ignoreNulls = true)
      .over(w(partitionBy, orderBy).rowsBetween(Window.unboundedPreceding, 0)))

  /** pandas `bfill`: earliest non-null at or after the current row.
    * Trailing nulls stay null.
    */
  def bfill(df: DataFrame, valueCol: String, partitionBy: Seq[String],
      orderBy: Seq[String], as: String): DataFrame =
    df.withColumn(as, first(col(valueCol), ignoreNulls = true)
      .over(w(partitionBy, orderBy).rowsBetween(0, Window.unboundedFollowing)))

  /** pandas `pct_change`: (v - lag(v)) / lag(v), null on the first row
    * of each partition and on a zero base (NULLIF guard).
    */
  def pctChange(df: DataFrame, valueCol: String, partitionBy: Seq[String],
      orderBy: Seq[String], as: String): DataFrame = {
    val prev = lag(col(valueCol), 1).over(w(partitionBy, orderBy))
    df.withColumn(as, (col(valueCol) - prev) / nullif(prev, lit(0.0)))
  }

  /** pandas default `rank(method='average')` — absent from Spark's rank
    * family: the average of the positions a tie block occupies, i.e.
    * rank + (ties - 1) / 2, from two windows over ONE partitioning (a
    * single Exchange + sort in the plan).
    */
  def rankAverage(df: DataFrame, valueCol: String, partitionBy: Seq[String],
      as: String): DataFrame = {
    val byVal = Window.partitionBy(partitionBy.map(col): _*).orderBy(col(valueCol))
    val ties = Window.partitionBy((partitionBy :+ valueCol).map(col): _*)
    df.withColumn(as, rank().over(byVal) + (count(lit(1)).over(ties) - 1) / 2.0)
  }

  /** Per-group top-k (reference groupby.nlargest / head-after-sort):
    * row_number over (groupCols, orderBy) kept while <= k, exposed as
    * `rankCol`. Scales as one Exchange + per-partition TopK sort — never
    * a global sort.
    */
  def topKPerGroup(df: DataFrame, groupCols: Seq[String], orderBy: Seq[Column],
      k: Int, rankCol: String = "rn"): DataFrame =
    df.withColumn(rankCol, row_number()
        .over(Window.partitionBy(groupCols.map(col): _*).orderBy(orderBy: _*)))
      .filter(col(rankCol) <= k)

  /** pandas `value_counts`: distinct values of `cols` with descending
    * counts (count ties broken by the value columns, ascending, to keep
    * the order total and engine-independent).
    */
  def valueCounts(df: DataFrame, cols: Seq[String], as: String = "n"): DataFrame =
    df.groupBy(cols.map(col): _*)
      .agg(count(lit(1)).as(as))
      .orderBy(col(as).desc +: cols.map(col(_).asc): _*)

  /** pandas `value_counts(normalize=True)`: counts as exact fractions of
    * the total. The total comes from a window sum over the (tiny) counts
    * frame, not a second scan of `df`; the division is one int/int IEEE
    * op, bit-identical across engines, so the raw double hash-gates.
    */
  def valueCountsNormalized(df: DataFrame, cols: Seq[String],
      as: String = "frac"): DataFrame = {
    val counts = df.groupBy(cols.map(col): _*).agg(count(lit(1)).as("__n"))
    counts
      .withColumn(as,
        col("__n").cast("double") / sum(col("__n")).over(Window.partitionBy()))
      .drop("__n")
      .orderBy(col(as).desc +: cols.map(col(_).asc): _*)
  }

  /** pandas `mode` per group (first mode under value ordering): the
    * max-count value, ties broken by the smallest value.
    */
  def modePerGroup(df: DataFrame, groupCols: Seq[String], valueCol: String,
      as: String = "mode", countCol: String = "cnt"): DataFrame = {
    val counts = df.groupBy((groupCols :+ valueCol).map(col): _*)
      .agg(count(lit(1)).as(countCol))
    val wm = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col(countCol).desc, col(valueCol).asc)
    counts.withColumn("__rn", row_number().over(wm)).filter(col("__rn") === 1)
      .select((groupCols.map(col) :+ col(valueCol).as(as)) :+ col(countCol): _*)
  }

  /** pandas/cudf `factorize`: dense zero-based codes in value sort
    * order, attached via a broadcast join of the (small) code table.
    * The code table is a distinct + windowed row_number — fine while
    * the cardinality is broadcast-small, which is the factorize use
    * case (categoricals); high-cardinality ids should hash instead.
    */
  def factorize(df: DataFrame, valueCol: String, codeCol: String): DataFrame = {
    val codes = df.select(col(valueCol)).distinct()
      .withColumn(codeCol, row_number().over(Window.orderBy(col(valueCol))) - 1)
    df.join(broadcast(codes), valueCol)
  }

  /** pandas `groupby(keys).ngroup()` (sort=True): dense group index in
    * key-sorted order, 0-based. Same shape as [[factorize]]: the
    * numbering window runs over the DISTINCT key frame only (bounded
    * group cardinality), and rows get their index back via broadcast
    * join — the frame itself never funnels through one task.
    */
  def ngroup(df: DataFrame, keys: Seq[String], out: String): DataFrame = {
    val groups = df.select(keys.map(col): _*).distinct()
      .withColumn(out, row_number().over(Window.orderBy(keys.map(col): _*)) - 1)
    df.join(broadcast(groups), keys)
  }

  /** cudf `Series.searchsorted(probes, side='left')`: for each probe,
    * the insertion index into the value-sorted element series = the
    * count of elements strictly below the probe. Merge-based: union
    * elements (tag 1) with probes (tag 0), sort by (value, tag) — so a
    * probe lands BEFORE equal elements ('left' side) — and read the
    * running element count at each probe row. One distributed sort;
    * deterministic under duplicates because tied probes all see the
    * same element prefix. The global ROWS window is the prefix-scan
    * step and executes single-partition — for corpus-scale inputs swap
    * it for the as-of formulation (AsofJoin on value, backward-strict)
    * or broadcast the element side as bin edges; both keep the probe
    * side shuffle-free.
    */
  def searchSorted(elems: DataFrame, elemCol: String, probes: DataFrame,
      probeCol: String, idCol: String, out: String): DataFrame = {
    val idType = probes.schema(idCol).dataType
    val e = elems.select(col(elemCol).cast("double").as("__v"),
      lit(1).as("__is_elem"), lit(null).cast(idType).as(idCol))
    val p = probes.select(col(probeCol).cast("double").as("__v"),
      lit(0).as("__is_elem"), col(idCol))
    val scan = Window.orderBy(col("__v"), col("__is_elem"))
      .rowsBetween(Window.unboundedPreceding, 0)
    e.unionByName(p)
      .withColumn(out, sum(col("__is_elem")).over(scan))
      .filter(col("__is_elem") === 0)
      .select(col(idCol), col("__v").as(probeCol), col(out))
  }

  /** [[searchSorted]] at corpus scale: the same strict-less count via a
    * DISTRIBUTED prefix scan instead of one global window. Range-
    * partition the tagged union on (value, tag) — equal sort keys land
    * in one partition, so the 'left'-side tie rule survives — then the
    * running element count is partition-LOCAL (`Window.partitionBy` on
    * the physical partition id) plus a broadcast offset: the cumulative
    * element count of all earlier partitions. The only global-ordered
    * window runs over the per-partition count frame — `numParts` rows —
    * so no task ever sees more than its range slice. Same result,
    * column-for-column, as [[searchSorted]] (FrameOpsSpec property-
    * checks equivalence; q31c shares q31b's oracle verbatim).
    */
  def searchSortedLarge(elems: DataFrame, elemCol: String, probes: DataFrame,
      probeCol: String, idCol: String, out: String,
      numParts: Int = 0): DataFrame = {
    val idType = probes.schema(idCol).dataType
    val e = elems.select(col(elemCol).cast("double").as("__v"),
      lit(1).as("__is_elem"), lit(null).cast(idType).as(idCol))
    val p = probes.select(col(probeCol).cast("double").as("__v"),
      lit(0).as("__is_elem"), col(idCol))
    val u = e.unionByName(p)
    // localCheckpoint PINS the partition assignment: __pid feeds TWO
    // plan branches (the local scan and the offsets frame), and
    // without materialization each branch can instantiate its own
    // range exchange whose sampled bounds / AQE coalescing differ —
    // the branches then disagree on pids and the offsets misalign
    // (caught by the r14c partition-invariance receipt at 20M rows;
    // invisible at gate scale). One materialization of a frame the op
    // scans twice anyway.
    val parted = (if (numParts > 0)
        u.repartitionByRange(numParts, col("__v"), col("__is_elem"))
      else u.repartitionByRange(col("__v"), col("__is_elem")))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    val localScan = Window.partitionBy(col("__pid"))
      .orderBy(col("__v"), col("__is_elem"))
      .rowsBetween(Window.unboundedPreceding, 0)
    // per-partition element totals → exclusive prefix = this partition's
    // offset; the frame has numParts rows, so the ordered window is free
    val offsets = parted.groupBy(col("__pid"))
      .agg(sum(col("__is_elem")).as("__cnt"))
      .withColumn("__offset", coalesce(sum(col("__cnt")).over(
        Window.orderBy(col("__pid")).rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select(col("__pid"), col("__offset"))
    parted
      .withColumn("__local", sum(col("__is_elem")).over(localScan))
      .join(broadcast(offsets), "__pid")
      .filter(col("__is_elem") === 0)
      .select(col(idCol), col("__v").as(probeCol),
        (col("__local") + col("__offset")).as(out))
  }

  /** pandas `groupby(keys).filter(f)`: keep ALL rows of the groups whose
    * aggregate passes `keep` (a predicate over the `__agg` alias).
    * Aggregate + left-semi join, NOT an unordered window: the
    * aggregation is map-side combined, and the surviving-keys frame
    * (bounded by group cardinality) broadcasts when small — rows never
    * carry the group statistic, and non-qualifying groups die in the
    * semi-join without being re-shuffled.
    */
  def groupbyFilter(df: DataFrame, keys: Seq[String], agg: Column,
      keep: Column): DataFrame = {
    val groups = df.groupBy(keys.map(col): _*).agg(agg.as("__agg")).filter(keep)
    df.join(groups.select(keys.map(col): _*), keys, "left_semi")
  }

  /** pandas `merge_ordered(left, right, on=, by=, fill_method=)`
    * ([pandas.core.reshape.merge :: merge_ordered]; the ordered cousin
    * of merge_asof for aligning two keyed time series): a full-outer
    * merge on `by ++ on` — Spark's USING-style join coalesces the key
    * columns — then, with `fillMethod=Some("ffill")`, every non-key
    * column from BOTH sides is forward-filled within its `by` group in
    * `on` order (the pandas contract: fill_method applies to the whole
    * merged frame, so each side's values propagate across the other
    * side's unmatched rows).
    *
    * Two grouped forms, switched on whether `right` carries the `by`
    * columns:
    *  - right WITHOUT them — pandas `left_by=` exactly: the whole right
    *    frame is replicated into every left group (distinct-by ×
    *    right, a broadcast when the group list is small) before the
    *    grouped merge+fill;
    *  - right WITH them — both sides keyed: the merge is on
    *    `by ++ on`, and the fill is PER GROUP. pandas given
    *    on=[by, k] would ffill GLOBALLY across group boundaries (an
    *    artifact of its single sorted frame, meaningless distributed);
    *    the per-group fill is the deliberate deviation and the only
    *    scale-safe reading.
    *
    * Scale shape: one shuffle for the join (hash on the full key), one
    * for the window (hash on `by` alone — a coarser partitioning, so
    * the exchange is unavoidable); all fills share the single window
    * spec, so every column fills in that same one pass. `by` must be
    * non-empty for distributed fill — an empty `by` is a global ordered
    * fill and moves everything to one partition (same caveat as any
    * unpartitioned window).
    */
  def mergeOrdered(left: DataFrame, right: DataFrame, on: Seq[String],
      by: Seq[String] = Nil, fillMethod: Option[String] = None): DataFrame = {
    val keys = by ++ on
    // all-or-none contract on right's by columns: a proper subset would
    // cross-join on the missing ones while the join key still names the
    // present ones — duplicate column names, then an ambiguous-column
    // failure (or a silently wrong pick) downstream (ADVICE r7)
    val byPresent = by.filter(right.columns.contains)
    require(byPresent.isEmpty || byPresent.size == by.size,
      s"mergeOrdered: right must carry ALL of the by columns (${by.mkString(", ")}) " +
        s"— the keyed form — or NONE of them (the left_by replicate form); " +
        s"it has only (${byPresent.mkString(", ")})")
    val rightKeyed =
      if (by.nonEmpty && byPresent.isEmpty)
        left.select(by.map(col): _*).distinct.join(right)
      else right
    val joined = left.join(rightKeyed, keys, "full_outer")
    fillMethod match {
      case Some("ffill") =>
        val w = Window.partitionBy(by.map(col): _*)
          .orderBy(on.map(col): _*)
          .rowsBetween(Window.unboundedPreceding, 0)
        val filled = joined.columns.map { c =>
          if (keys.contains(c)) col(c)
          else last(col(c), ignoreNulls = true).over(w).as(c)
        }
        joined.select(filled.toIndexedSeq: _*)
      case None => joined
      case Some(other) =>
        throw new IllegalArgumentException(
          s"unsupported fill_method '$other' (only ffill)")
    }
  }

  /** pandas `unstack(level)` on a long frame with a unique
    * (index, level) key: level values become columns via pivot +
    * first(). The inverse of [[melt]]/stack — `unstack(melt(df)) == df`
    * (q27d gates exactly that round-trip). `values` is explicit so the
    * plan stays lazy (pivot without values runs an eager distinct).
    */
  def unstack(long: DataFrame, index: Seq[String], level: String,
      values: Seq[String], valueCol: String = "value"): DataFrame =
    long.groupBy(index.map(col): _*).pivot(level, values)
      .agg(first(col(valueCol)))

  /** cudf `DataFrame.T` for summary-sized frames: melt every non-key
    * column (cast to double — a transpose mixes source columns into one
    * output column, so they must share a type) and pivot the key values
    * into columns. `keyVals` explicit for the same lazy-plan reason as
    * [[unstack]]; a transpose is only meaningful when the row count is
    * column-count-sized, so the pivot width is bounded by construction.
    */
  def transpose(df: DataFrame, keyCol: String, keyVals: Seq[String],
      varName: String = "variable"): DataFrame = {
    val valueCols = df.columns.filterNot(_ == keyCol).toSeq
    val long = melt(
      df.select(col(keyCol) +: valueCols.map(c => col(c).cast("double")): _*),
      Seq(keyCol), valueCols, varName)
    long.groupBy(col(varName)).pivot(keyCol, keyVals).agg(first(col("value")))
  }

  /** pandas `melt` (reference cudf.melt): wide → long. Thin wrapper over
    * Spark's native unpivot, which keeps the plan a single Expand (no
    * join, no shuffle).
    */
  def melt(df: DataFrame, idVars: Seq[String], valueVars: Seq[String],
      varName: String = "variable", valueName: String = "value"): DataFrame =
    df.unpivot(idVars.map(col).toArray, valueVars.map(col).toArray, varName, valueName)

  /** pandas/dask `df.resample(freq).agg(...)` (reference
    * [python/cudf/cudf/core/resample.py :: _Resampler]): bucket rows by
    * `date_trunc(unit, ts)`, aggregate with the pre-aliased `aggs`, and
    * LEFT-join onto a dense calendar spanning [min, max] at `step`
    * (e.g. "1 hour") so empty buckets surface as rows — pandas resample
    * semantics, where silence is data. Aggregation is a plain map-side-
    * combined groupBy; the calendar is generated from the two-row
    * min/max aggregate via `sequence`, so its size is (range/step),
    * independent of input rows — nothing here funnels the corpus
    * through one task.
    */
  def resample(df: DataFrame, ts: String, unit: String, step: String,
      aggs: Seq[Column]): DataFrame = {
    val b = df.groupBy(date_trunc(unit, col(ts)).as("bucket"))
      .agg(aggs.head, aggs.tail: _*)
    val cal = b.agg(min(col("bucket")).as("lo"), max(col("bucket")).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"),
        expr(s"interval $step"))).as("bucket"))
    cal.join(b, Seq("bucket"), "left")
  }

  /** pandas/cudf `Series.interpolate(method='linear')` over a
    * partitioned ordered frame ([cudf/core/dataframe.py ::
    * DataFrame.interpolate]): nulls between two known points take the
    * linear value at their POSITION (pandas interpolates on position,
    * not on the order column's value); leading nulls stay null and
    * trailing nulls take the last known value (the pandas
    * limit_direction='forward' default). Three windows over one
    * ordering — a single hash exchange per partition key, no joins,
    * same cost profile as ffill.
    */
  def interpolate(df: DataFrame, partitionBy: Seq[String],
      orderBy: Seq[String], valueCol: String, as: String,
      method: String = "position", limit: Int = 0,
      limitDirection: String = "forward",
      limitArea: String = "none"): DataFrame = {
    require(Set("position", "values")(method),
      s"method must be 'position' or 'values', got '$method'")
    require(Set("forward", "backward", "both")(limitDirection),
      s"limit_direction must be forward/backward/both, got '$limitDirection'")
    require(Set("none", "inside", "outside")(limitArea),
      s"limit_area must be none/inside/outside, got '$limitArea'")
    require(limit >= 0, "limit must be >= 0 (0 = unlimited)")
    val wAll = w(partitionBy, orderBy)
    val back = wAll.rowsBetween(Window.unboundedPreceding, 0)
    val fwd = wAll.rowsBetween(0, Window.unboundedFollowing)
    val v = col(valueCol)
    // interpolation anchor: row position (pandas method='linear') or
    // the order column's values (method='values' — the one-line
    // numerator change: gaps weigh by distance, not by row count)
    val anchor =
      if (method == "values") col(orderBy.head).cast("double")
      else col("__pos").cast("double")
    val dirFwd = limitDirection != "backward"
    val dirBwd = limitDirection != "forward"
    def within(dist: Column): Column =
      if (limit == 0) lit(true) else dist <= limit
    val base = df.withColumn("__pos", row_number().over(wAll))
    val marked = base
      .withColumn("__pa", anchor)
      .withColumn("__pv", last(v, ignoreNulls = true).over(back))
      .withColumn("__nv", first(v, ignoreNulls = true).over(fwd))
      .withColumn("__pp", last(when(v.isNotNull, col("__pa")), ignoreNulls = true).over(back))
      .withColumn("__np", first(when(v.isNotNull, col("__pa")), ignoreNulls = true).over(fwd))
      .withColumn("__ppr", last(when(v.isNotNull, col("__pos")), ignoreNulls = true).over(back))
      .withColumn("__npr", first(when(v.isNotNull, col("__pos")), ignoreNulls = true).over(fwd))
    // fill eligibility (pandas limit_direction × limit): a null may be
    // written from the left anchor (forward/both, within `limit` rows
    // of it) or from the right anchor (backward/both); the VALUE is
    // direction-independent — linear between two anchors, constant
    // extension past the edge anchors
    val fromLeft = lit(dirFwd) && col("__pv").isNotNull &&
      within(col("__pos") - col("__ppr"))
    val fromRight = lit(dirBwd) && col("__nv").isNotNull &&
      within(col("__npr") - col("__pos"))
    // pandas limit_area: 'inside' fills only nulls strictly between two
    // anchors (no edge extension); 'outside' only leading/trailing runs
    val areaOk = limitArea match {
      case "inside"  => col("__pv").isNotNull && col("__nv").isNotNull
      case "outside" => col("__pv").isNull || col("__nv").isNull
      case _         => lit(true)
    }
    val fillVal =
      when(col("__pv").isNull, col("__nv"))
        .when(col("__nv").isNull, col("__pv"))
        .otherwise(col("__pv") + (col("__nv") - col("__pv")) *
          ((col("__pa") - col("__pp")) / (col("__np") - col("__pp"))))
    marked
      .withColumn(as,
        when(v.isNotNull, v).when((fromLeft || fromRight) && areaOk, fillVal))
      .drop("__pos", "__pa", "__pv", "__nv", "__pp", "__np", "__ppr", "__npr")
  }

  /** pandas `concat(axis=1)` / cudf.concat axis=1 ([dask/dataframe/
    * multi.py :: concat] aligns on the index): frames stack COLUMN-wise,
    * rows aligned by the index key — a chain of full-outer joins on
    * `key`, absent rows surfacing as nulls (outer-join semantics, the
    * pandas default). Each join shuffles on the same key, so AQE/
    * bucketing can reuse the partitioning across the chain.
    */
  /** PRECONDITION: `key` must be unique within every frame. pandas
    * concat(axis=1) raises InvalidIndexError on duplicate index labels;
    * this full-outer-join chain would instead silently emit the per-key
    * Cartesian product across frames — callers (q35b pre-aggregates)
    * must dedupe or aggregate to a unique key first.
    */
  def concatAxis1(frames: Seq[DataFrame], key: String): DataFrame = {
    require(frames.nonEmpty, "need at least one frame")
    frames.reduce((a, b) => a.join(b, Seq(key), "full_outer"))
  }

  /** pandas/cudf `Series.ewm(alpha).mean()` (adjust=True, the default —
    * [cudf/core/window/ewm.py :: ExponentialMovingWindow]):
    * y_t = Σ_{i≤t} (1−α)^(t−i)·x_i / Σ_{i≤t} (1−α)^(t−i), evaluated as
    * the Horner recurrence num_t = (1−α)·num_{t−1} + x_t (and the same
    * for the denominator with x=1) — numerically stable for unbounded
    * group lengths, unlike the (1−α)^(−i) scaled-cumsum trick, which
    * overflows past a few thousand rows. One compiled UDF over each
    * group's ordered values (grouping is a single hash exchange; state
    * is the group's row array, bounded by per-key activity — the same
    * memory contract as groupby.apply/mapGroupsWithState). The oracle
    * replays the identical fold order via DuckDB list_reduce, so the
    * IEEE stream matches bit-for-bit.
    *
    * Null handling (pandas `ignore_na`, default false as in pandas):
    * with `ignoreNa=false` a null observation still consumes a decay
    * step (weights follow absolute positions; the emitted value is the
    * held, further-decayed mean); with `ignoreNa=true` null rows
    * neither decay nor contribute (weights follow relative positions
    * of the valid points). Every input row gets an output row — null
    * until the first valid observation. Rows with a null ORDER key are
    * dropped (they cannot be positioned). The output's `orderCol`
    * comes back widened to long.
    *
    * Memory: per-group state is the group's full (order, value) array —
    * fine for per-key-bounded activity; a single unbounded key needs
    * the segmented formulation instead (split the series into fixed
    * segments, fold each, stitch with the carry
    * num' = num_seg + (1−α)^len_seg · num_prev — the fold is linear in
    * its initial state, so segment results compose exactly).
    */
  def ewmMean(df: DataFrame, partitionBy: Seq[String], orderCol: String,
      valueCol: String, alpha: Double, as: String,
      ignoreNa: Boolean = false): DataFrame = {
    require(alpha > 0 && alpha <= 1, "need 0 < alpha <= 1")
    val w = 1.0 - alpha
    val ewmUdf = udf { (ords: Seq[Long], vs: Seq[java.lang.Double]) =>
      var num = 0.0; var den = 0.0
      ords.zip(vs).map { case (o, x) =>
        // the +0.0 on the null branch matches the oracle's
        // `a*w + coalesce(b, 0.0)` fold bit-for-bit (-0.0 + 0.0 = +0.0)
        if (x != null) { num = num * w + x.doubleValue(); den = den * w + 1.0 }
        else if (!ignoreNa) { num = num * w + 0.0; den = den * w + 0.0 }
        (o, if (den == 0.0) None else Some(num / den))
      }
    }
    val sorted = array_sort(collect_list(
      struct(col("__o").as("o"), col("__v").as("v"))))
    df.select((partitionBy.map(col) :+
        col(orderCol).cast("long").as("__o") :+
        col(valueCol).cast("double").as("__v")): _*)
      .filter(col("__o").isNotNull)
      .groupBy(partitionBy.map(col): _*)
      .agg(sorted.as("__rs"))
      .select((partitionBy.map(col) :+
        explode(ewmUdf(transform(col("__rs"), r => r.getField("o")),
          transform(col("__rs"), r => r.getField("v")))).as("__e")): _*)
      .select((partitionBy.map(col) :+
        col("__e._1").as(orderCol) :+ col("__e._2").as(as)): _*)
  }

  /** [[ewmMean]] for UNBOUNDED keys — the segmented/scan formulation
    * its scaladoc promises: identical semantics (adjust=True,
    * `ignoreNa`), but per-task state is O(segLen + nSegments) instead
    * of the key's whole series, so one multi-billion-row key cannot
    * OOM an executor.
    *
    * The Horner fold `num ← (1−α)·num + x` is LINEAR in its state, so a
    * segment is summarized by (W = Π stepdecay, N = fold from 0,
    * D = den fold from 0) and carries compose exactly:
    * C_s = C_{s−1}·W_{s−1} + N_{s−1}. Three stages, all bounded:
    *  1. row_number per key (streaming window) → segment id, then one
    *     groupBy (key, seg) holding ≤ segLen rows per group;
    *  2. per-key carry scan over the nSegments summary array (a second
    *     tiny groupBy — for a 10-billion-row key at segLen=1M that is a
    *     10k-element array);
    *  3. broadcast-joinable (key, seg) carry table seeds each segment's
    *     fold, which then runs the ORIGINAL recurrence.
    * Results equal [[ewmMean]] mathematically but NOT bit-for-bit (the
    * carry is a re-associated sum) — agreement is ~1e-12 relative
    * (PropertySpec); use [[ewmMean]] when bit-replay against the
    * oracle matters and keys are bounded. `orderCol` must be unique per
    * key: ties at a segment boundary would split nondeterministically.
    */
  def ewmMeanSegmented(df: DataFrame, partitionBy: Seq[String],
      orderCol: String, valueCol: String, alpha: Double, as: String,
      segLen: Int = 4096, ignoreNa: Boolean = false): DataFrame = {
    require(alpha > 0 && alpha <= 1, "need 0 < alpha <= 1")
    require(segLen > 0, "need segLen > 0")
    val w = 1.0 - alpha
    // (W, N, D) summary of one segment's fold, from zero state
    val sumUdf = udf { (vs: Seq[java.lang.Double]) =>
      var sw = 1.0; var n = 0.0; var d = 0.0
      vs.foreach { x =>
        if (x != null) { sw *= w; n = n * w + x.doubleValue(); d = d * w + 1.0 }
        else if (!ignoreNa) { sw *= w; n = n * w + 0.0; d = d * w + 0.0 }
      }
      (sw, n, d)
    }
    // carry scan over the per-key segment summaries (ordered by seg)
    val carryUdf = udf { (segs: Seq[Long], ws: Seq[Double], ns: Seq[Double],
        ds: Seq[Double]) =>
      var cn = 0.0; var cd = 0.0
      segs.indices.map { i =>
        val out = (segs(i), cn, cd)
        cn = cn * ws(i) + ns(i)
        cd = cd * ws(i) + ds(i)
        out
      }
    }
    // seeded per-segment fold — the original recurrence, carry as init
    val foldUdf = udf { (ords: Seq[Long], vs: Seq[java.lang.Double],
        cn: Double, cd: Double) =>
      var num = cn; var den = cd
      ords.zip(vs).map { case (o, x) =>
        if (x != null) { num = num * w + x.doubleValue(); den = den * w + 1.0 }
        else if (!ignoreNa) { num = num * w + 0.0; den = den * w + 0.0 }
        (o, if (den == 0.0) None else Some(num / den))
      }
    }
    val keys = partitionBy.map(col)
    val wOrd = Window.partitionBy(keys: _*).orderBy(col("__o"))
    val seg = df
      .select((keys :+ col(orderCol).cast("long").as("__o") :+
        col(valueCol).cast("double").as("__v")): _*)
      .filter(col("__o").isNotNull)
      .withColumn("__seg", ((row_number().over(wOrd) - 1) / segLen).cast("long"))
      .groupBy((keys :+ col("__seg")): _*)
      .agg(array_sort(collect_list(struct(col("__o").as("o"), col("__v").as("v"))))
        .as("__rs"))
      .withColumn("__s", sumUdf(transform(col("__rs"), r => r.getField("v"))))
    val carries = seg
      .groupBy(keys: _*)
      .agg(array_sort(collect_list(struct(col("__seg").as("g"),
        col("__s._1").as("w"), col("__s._2").as("n"), col("__s._3").as("d"))))
        .as("__sm"))
      .select((keys :+ explode(carryUdf(
        transform(col("__sm"), r => r.getField("g")),
        transform(col("__sm"), r => r.getField("w")),
        transform(col("__sm"), r => r.getField("n")),
        transform(col("__sm"), r => r.getField("d")))).as("__c")): _*)
      .select((keys :+ col("__c._1").as("__seg") :+ col("__c._2").as("__cn") :+
        col("__c._3").as("__cd")): _*)
    seg.join(carries, partitionBy :+ "__seg")
      .select((keys :+ explode(foldUdf(
        transform(col("__rs"), r => r.getField("o")),
        transform(col("__rs"), r => r.getField("v")),
        col("__cn"), col("__cd"))).as("__e")): _*)
      .select((keys :+ col("__e._1").as(orderCol) :+ col("__e._2").as(as)): _*)
  }

  /** [[ewmVar]] for unbounded keys — the same segmented/carry scheme as
    * [[ewmMeanSegmented]], extended to the four var states. Each fold
    * is linear in its own state, so a segment is summarized by its
    * decay (W = stepdecay^steps for num/den/sq, W² for den2) plus the
    * four partials-from-zero, and carries compose exactly. Same
    * contracts as the mean variant: ~1e-12 relative agreement with
    * [[ewmVar]], unique `orderCol` per key required.
    */
  def ewmVarSegmented(df: DataFrame, partitionBy: Seq[String],
      orderCol: String, valueCol: String, alpha: Double, varAs: String,
      stdAs: String, segLen: Int = 4096,
      ignoreNa: Boolean = false): DataFrame = {
    require(alpha > 0 && alpha <= 1, "need 0 < alpha <= 1")
    require(segLen > 0, "need segLen > 0")
    val w = 1.0 - alpha
    val w2 = w * w
    val sumUdf = udf { (vs: Seq[java.lang.Double]) =>
      var sw = 1.0; var n = 0.0; var d = 0.0; var q = 0.0; var d2 = 0.0
      vs.foreach { x =>
        if (x != null) {
          val xv = x.doubleValue()
          sw *= w; n = n * w + xv; d = d * w + 1.0
          q = q * w + xv * xv; d2 = d2 * w2 + 1.0
        } else if (!ignoreNa) {
          sw *= w; n = n * w + 0.0; d = d * w + 0.0
          q = q * w + 0.0; d2 = d2 * w2 + 0.0
        }
      }
      (sw, n, d, q, d2)
    }
    val carryUdf = udf { (segs: Seq[Long], ws: Seq[Double], ns: Seq[Double],
        ds: Seq[Double], qs: Seq[Double], d2s: Seq[Double]) =>
      var cn = 0.0; var cd = 0.0; var cq = 0.0; var cd2 = 0.0
      segs.indices.map { i =>
        val out = (segs(i), cn, cd, cq, cd2)
        val sw = ws(i); val sw2 = sw * sw
        cn = cn * sw + ns(i)
        cd = cd * sw + ds(i)
        cq = cq * sw + qs(i)
        cd2 = cd2 * sw2 + d2s(i)
        out
      }
    }
    val foldUdf = udf { (ords: Seq[Long], vs: Seq[java.lang.Double],
        cn: Double, cd: Double, cq: Double, cd2: Double) =>
      var num = cn; var den = cd; var sq = cq; var den2 = cd2
      ords.zip(vs).map { case (o, x) =>
        if (x != null) {
          val xv = x.doubleValue()
          num = num * w + xv; den = den * w + 1.0
          sq = sq * w + xv * xv; den2 = den2 * w2 + 1.0
        } else if (!ignoreNa) {
          num = num * w + 0.0; den = den * w + 0.0
          sq = sq * w + 0.0; den2 = den2 * w2 + 0.0
        }
        val m = num / den
        val corrDen = den * den - den2
        val v =
          if (den == 0.0 || corrDen == 0.0) None
          else Some(((sq / den - m * m) * (den * den)) / corrDen)
        (o, v, v.flatMap(x0 => if (x0 < 0) None else Some(math.sqrt(x0))))
      }
    }
    val keys = partitionBy.map(col)
    val wOrd = Window.partitionBy(keys: _*).orderBy(col("__o"))
    val seg = df
      .select((keys :+ col(orderCol).cast("long").as("__o") :+
        col(valueCol).cast("double").as("__v")): _*)
      .filter(col("__o").isNotNull)
      .withColumn("__seg", ((row_number().over(wOrd) - 1) / segLen).cast("long"))
      .groupBy((keys :+ col("__seg")): _*)
      .agg(array_sort(collect_list(struct(col("__o").as("o"), col("__v").as("v"))))
        .as("__rs"))
      .withColumn("__s", sumUdf(transform(col("__rs"), r => r.getField("v"))))
    val carries = seg
      .groupBy(keys: _*)
      .agg(array_sort(collect_list(struct(col("__seg").as("g"),
        col("__s._1").as("w"), col("__s._2").as("n"), col("__s._3").as("d"),
        col("__s._4").as("q"), col("__s._5").as("d2")))).as("__sm"))
      .select((keys :+ explode(carryUdf(
        transform(col("__sm"), r => r.getField("g")),
        transform(col("__sm"), r => r.getField("w")),
        transform(col("__sm"), r => r.getField("n")),
        transform(col("__sm"), r => r.getField("d")),
        transform(col("__sm"), r => r.getField("q")),
        transform(col("__sm"), r => r.getField("d2")))).as("__c")): _*)
      .select((keys :+ col("__c._1").as("__seg") :+ col("__c._2").as("__cn") :+
        col("__c._3").as("__cd") :+ col("__c._4").as("__cq") :+
        col("__c._5").as("__cd2")): _*)
    seg.join(carries, partitionBy :+ "__seg")
      .select((keys :+ explode(foldUdf(
        transform(col("__rs"), r => r.getField("o")),
        transform(col("__rs"), r => r.getField("v")),
        col("__cn"), col("__cd"), col("__cq"), col("__cd2"))).as("__e")): _*)
      .select((keys :+ col("__e._1").as(orderCol) :+ col("__e._2").as(varAs) :+
        col("__e._3").as(stdAs)): _*)
  }

  /** pandas/cudf `Series.ewm(alpha).var()` / `.std()` (adjust=True,
    * bias=False — the pandas defaults; [cudf/core/window/ewm.py ::
    * ExponentialMovingWindow.var/std]). Four Horner folds ride the same
    * single pass as [[ewmMean]]'s two:
    *   num  = Σ wᵢ·xᵢ   (wᵢ = (1−α)^(t−i)):  num  = (1−α)·num + x
    *   den  = Σ wᵢ:                          den  = (1−α)·den + 1
    *   sq   = Σ wᵢ·xᵢ²:                      sq   = (1−α)·sq  + x²
    *   den2 = Σ wᵢ²:                         den2 = (1−α)²·den2 + 1
    * biased var = sq/den − (num/den)², debiased by den²/(den²−den2)
    * (the pandas bias=False correction); the first row's correction
    * denominator is 0 → null (pandas NaN). std = sqrt(var), null when
    * var < 0 (fp cancellation guard, both engines). The oracle replays
    * each fold via DuckDB list_reduce in identical order and combines
    * with the identically-parenthesized expression, so results are
    * bit-for-bit. Same per-key-bounded memory contract and `ignoreNa`
    * null semantics as [[ewmMean]] (pandas default false: a null still
    * consumes a decay step; var/std emit null until the debias
    * denominator is nonzero).
    */
  def ewmVar(df: DataFrame, partitionBy: Seq[String], orderCol: String,
      valueCol: String, alpha: Double, varAs: String, stdAs: String,
      ignoreNa: Boolean = false): DataFrame = {
    require(alpha > 0 && alpha <= 1, "need 0 < alpha <= 1")
    val w = 1.0 - alpha
    val w2 = w * w
    val vUdf = udf { (ords: Seq[Long], vs: Seq[java.lang.Double]) =>
      var num = 0.0; var den = 0.0; var sq = 0.0; var den2 = 0.0
      ords.zip(vs).map { case (o, x) =>
        if (x != null) {
          val xv = x.doubleValue()
          num = num * w + xv
          den = den * w + 1.0
          sq = sq * w + xv * xv
          den2 = den2 * w2 + 1.0
        } else if (!ignoreNa) {
          num = num * w; den = den * w; sq = sq * w; den2 = den2 * w2
        }
        val m = num / den
        val corrDen = den * den - den2
        val v =
          if (den == 0.0 || corrDen == 0.0) None
          else Some(((sq / den - m * m) * (den * den)) / corrDen)
        (o, v, v.flatMap(x0 => if (x0 < 0) None else Some(math.sqrt(x0))))
      }
    }
    val sorted = array_sort(collect_list(
      struct(col("__o").as("o"), col("__v").as("v"))))
    df.select((partitionBy.map(col) :+
        col(orderCol).cast("long").as("__o") :+
        col(valueCol).cast("double").as("__v")): _*)
      .filter(col("__o").isNotNull)
      .groupBy(partitionBy.map(col): _*)
      .agg(sorted.as("__rs"))
      .select((partitionBy.map(col) :+
        explode(vUdf(transform(col("__rs"), r => r.getField("o")),
          transform(col("__rs"), r => r.getField("v")))).as("__e")): _*)
      .select((partitionBy.map(col) :+
        col("__e._1").as(orderCol) :+ col("__e._2").as(varAs) :+
        col("__e._3").as(stdAs)): _*)
  }

  /** pandas `Series.ewm(alpha).cov(other)` / `.corr(other)`
    * (adjust=True, bias=False — [cudf/core/window/ewm.py ::
    * ExponentialMovingWindow.cov/corr], pandas semantics): the pairwise
    * extension of [[ewmVar]]. Six Horner folds ride one pass over each
    * group's ordered (x, y) rows (wᵢ = (1−α)^(t−i)):
    *   numx = Σ wᵢxᵢ, numy = Σ wᵢyᵢ, numxy = Σ wᵢxᵢyᵢ,
    *   sqx = Σ wᵢxᵢ², sqy = Σ wᵢyᵢ², den = Σ wᵢ, den2 = Σ wᵢ²
    * cov  = (numxy/den − (numx/den)(numy/den)) · den²/(den²−den2)
    *        (the pandas bias=False debias, exactly [[ewmVar]]'s);
    * corr = biased-cov / sqrt(biased-varx · biased-vary) — the debias
    *        factors cancel in the ratio, the pandas formulation.
    * First row: debias denominator 0 → cov null (pandas NaN); corr null
    * whenever either biased variance is ≤ 0 (constant-so-far series).
    * A pair observes only when BOTH x and y are non-null (pandas aligns
    * the two series first — a half-null pair is a null observation);
    * with the default ignoreNa=false a null pair still consumes a decay
    * step. Same per-key-bounded memory contract as [[ewmMean]], same
    * DuckDB list_reduce fold replay for the oracle (each moment's input
    * list — xy, x², y² — is materialized per row in SQL so the fold
    * order is bit-identical).
    */
  def ewmCov(df: DataFrame, partitionBy: Seq[String], orderCol: String,
      xCol: String, yCol: String, alpha: Double, covAs: String,
      corrAs: String, ignoreNa: Boolean = false): DataFrame = {
    require(alpha > 0 && alpha <= 1, "need 0 < alpha <= 1")
    val w = 1.0 - alpha
    val w2 = w * w
    val cUdf = udf { (ords: Seq[Long], xs: Seq[java.lang.Double],
        ys: Seq[java.lang.Double]) =>
      var numx = 0.0; var numy = 0.0; var numxy = 0.0
      var sqx = 0.0; var sqy = 0.0; var den = 0.0; var den2 = 0.0
      ords.indices.map { i =>
        val x = xs(i); val y = ys(i)
        if (x != null && y != null) {
          val xv = x.doubleValue(); val yv = y.doubleValue()
          numx = numx * w + xv; numy = numy * w + yv
          numxy = numxy * w + xv * yv
          sqx = sqx * w + xv * xv; sqy = sqy * w + yv * yv
          den = den * w + 1.0; den2 = den2 * w2 + 1.0
        } else if (!ignoreNa) {
          numx *= w; numy *= w; numxy *= w
          sqx *= w; sqy *= w; den *= w; den2 *= w2
        }
        if (den == 0.0) (ords(i), None, None)
        else {
          val mx = numx / den; val my = numy / den
          val bcov = numxy / den - mx * my
          val bvx = sqx / den - mx * mx
          val bvy = sqy / den - my * my
          val corrDen = den * den - den2
          val cov = if (corrDen == 0.0) None
            else Some((bcov * (den * den)) / corrDen)
          val corr = if (bvx <= 0.0 || bvy <= 0.0) None
            else Some(bcov / math.sqrt(bvx * bvy))
          (ords(i), cov, corr)
        }
      }
    }
    val sorted = array_sort(collect_list(
      struct(col("__o").as("o"), col("__x").as("x"), col("__y").as("y"))))
    df.select((partitionBy.map(col) :+
        col(orderCol).cast("long").as("__o") :+
        col(xCol).cast("double").as("__x") :+
        col(yCol).cast("double").as("__y")): _*)
      .filter(col("__o").isNotNull)
      .groupBy(partitionBy.map(col): _*)
      .agg(sorted.as("__rs"))
      .select((partitionBy.map(col) :+
        explode(cUdf(transform(col("__rs"), r => r.getField("o")),
          transform(col("__rs"), r => r.getField("x")),
          transform(col("__rs"), r => r.getField("y")))).as("__e")): _*)
      .select((partitionBy.map(col) :+
        col("__e._1").as(orderCol) :+ col("__e._2").as(covAs) :+
        col("__e._3").as(corrAs)): _*)
  }

  /** pandas `Series.ewm(halflife=<timedelta>, times=<col>).mean()`
    * (adjust=True — [cudf/core/window/ewm.py] exposes halflife too):
    * decay follows ACTUAL elapsed time, not row count. With per-step
    * gap Δᵢ = tᵢ − tᵢ₋₁ (in `halflife` units) the Horner fold becomes
    *   num = num·2^(−Δ) + x,  den = den·2^(−Δ) + 1,  y = num/den —
    * irregular series decay correctly through gaps, and duplicate
    * timestamps (Δ=0) weigh equally, the pandas times= contract. The
    * order key is (time, tieBreak) so replay order is total. Integral
    * Δ/halflife gives decay = exact powers of two — pow(0.5, k) is
    * verified bit-identical between the JVM and DuckDB here — so the
    * oracle's list_reduce replay hash-matches. Same memory contract as
    * [[ewmMean]].
    */
  def ewmMeanHalflife(df: DataFrame, partitionBy: Seq[String],
      timeCol: String, tieBreak: String, valueCol: String,
      halflife: Double, as: String): DataFrame = {
    require(halflife > 0, "need halflife > 0")
    val hlUdf = udf { (ts: Seq[Double], ks: Seq[Long], vs: Seq[Double]) =>
      var num = 0.0; var den = 0.0
      ts.indices.map { i =>
        val d = if (i == 0) 1.0 else math.pow(0.5, (ts(i) - ts(i - 1)) / halflife)
        num = num * d + vs(i)
        den = den * d + 1.0
        (ks(i), num / den)
      }
    }
    val sorted = array_sort(collect_list(
      struct(col("__t").as("t"), col("__k").as("k"), col("__v").as("v"))))
    df.select((partitionBy.map(col) :+
        col(timeCol).cast("double").as("__t") :+
        col(tieBreak).cast("long").as("__k") :+
        col(valueCol).cast("double").as("__v")): _*)
      .filter(col("__t").isNotNull && col("__k").isNotNull && col("__v").isNotNull)
      .groupBy(partitionBy.map(col): _*)
      .agg(sorted.as("__rs"))
      .select((partitionBy.map(col) :+
        explode(hlUdf(
          transform(col("__rs"), r => r.getField("t")),
          transform(col("__rs"), r => r.getField("k")),
          transform(col("__rs"), r => r.getField("v")))).as("__e")): _*)
      .select((partitionBy.map(col) :+
        col("__e._1").as(tieBreak) :+ col("__e._2").as(as)): _*)
  }

  /** Full pairwise correlation/covariance matrix (pandas/dask
    * `df.corr()` / `df.cov()` — [dask/dataframe/core.py :: corr] computes
    * every pair): ALL n·(n+1)/2 upper-triangle pairs (diagonal included)
    * in ONE aggregation pass — the co-moment buffers for every pair ride
    * the same partial→final aggregate, so the input is scanned once and
    * nothing is joined. At 100 TB this is a map-side-combined global
    * agg with an O(n²) (columns, not rows) result row, then a constant-
    * size Expand to long form (col_a, col_b, corr, cov) — the layout a
    * downstream heatmap/feature-selection join actually wants.
    */
  def corrMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column")
    // index-based intermediate aliases: name-based ones (corr__a__b)
    // could collide for column names that themselves contain "__"
    val pairs = for {
      i <- cols.indices; j <- cols.indices if i <= j
    } yield (i, j)
    val aggs = pairs.flatMap { case (i, j) => Seq(
      corr(col(cols(i)), col(cols(j))).as(s"corr__${i}_$j"),
      covar_samp(col(cols(i)), col(cols(j))).as(s"cov__${i}_$j")) }
    val entries = pairs.map { case (i, j) =>
      struct(lit(cols(i)).as("col_a"), lit(cols(j)).as("col_b"),
        col(s"corr__${i}_$j").as("corr"),
        col(s"cov__${i}_$j").as("cov")) }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(entries: _*)).as("e"))
      .select(col("e.col_a").as("col_a"), col("e.col_b").as("col_b"),
        col("e.corr").as("corr"), col("e.cov").as("cov"))
  }

  /** Per-group outlier screening, both classic flavors at once:
    * z-score vs the group's sample mean/std and Tukey 1.5·IQR fences
    * from exact linearly-interpolated quartiles — the first-pass data-
    * cleaning step of any metrics/training pipeline. Group statistics
    * come from ONE aggregation (joined back broadcast-style; groups ≪
    * rows), so the data is scanned once and shuffled once on the key.
    * z is rounded to 6 decimals BEFORE the flag comparison so the flag
    * is a pure function of the rounded value in any engine.
    *
    * @return input rows + (z, iqr_lo, iqr_hi, is_z_outlier |z|>zMax,
    *         is_iqr_outlier). Groups with zero variance get z = null
    *         and never flag on z.
    */
  def outlierFlags(df: DataFrame, keys: Seq[String], valueCol: String,
      zMax: Double = 3.0, iqrK: Double = 1.5): DataFrame = {
    require(keys.nonEmpty, "need at least one group key")
    val v = col(valueCol).cast("double")
    val stats = df.groupBy(keys.map(col): _*)
      .agg(avg(v).as("__mu"), stddev_samp(v).as("__sd"),
        expr(s"percentile($valueCol, 0.25)").as("__q1"),
        expr(s"percentile($valueCol, 0.75)").as("__q3"))
      .withColumn("__lo", round(col("__q1") - lit(iqrK) * (col("__q3") - col("__q1")), 6))
      .withColumn("__hi", round(col("__q3") + lit(iqrK) * (col("__q3") - col("__q1")), 6))
    // no forced broadcast hint: AQE broadcasts the stats side when the
    // key cardinality is small and degrades to a shuffled join when a
    // pathological key space would OOM a forced broadcast
    df.join(stats, keys)
      .withColumn("z", when(col("__sd") > 0,
        round((v - col("__mu")) / col("__sd"), 6)))
      .withColumn("iqr_lo", col("__lo"))
      .withColumn("iqr_hi", col("__hi"))
      .withColumn("is_z_outlier",
        coalesce(abs(col("z")) > zMax, lit(false)))
      .withColumn("is_iqr_outlier", v < col("__lo") || v > col("__hi"))
      .drop("__mu", "__sd", "__q1", "__q3", "__lo", "__hi")
  }

  /** Per-group ROBUST outlier screening via median/MAD — the
    * 50%-breakdown companion to [[outlierFlags]]: mean/std (and even
    * quartile fences) drift under heavy contamination, the median
    * absolute deviation does not, which is why robust-z is the
    * standard screen for genuinely dirty feeds. robust_z =
    * |v − median| / (1.4826·MAD) (the Gaussian consistency constant),
    * rounded to 6 decimals BEFORE the flag comparison — the
    * [[outlierFlags]] determinism contract. Zero-MAD groups (≥ half
    * the group at one value) yield robust_z = null and never flag.
    *
    * Two grouped stat passes are INHERENT to MAD (the deviation needs
    * the median first); both are single aggregations joined back by
    * key — groups ≪ rows, AQE picks broadcast vs shuffle.
    *
    * @return input rows + (med, mad, robust_z, is_mad_outlier)
    */
  def outlierFlagsMad(df: DataFrame, keys: Seq[String], valueCol: String,
      kMad: Double = 3.5): DataFrame = {
    require(keys.nonEmpty, "need at least one group key")
    val v = col(valueCol).cast("double")
    val med = df.groupBy(keys.map(col): _*)
      .agg(expr(s"percentile($valueCol, 0.5)").as("__med"))
    val dev = df.join(med, keys)
      .withColumn("__ad", abs(v - col("__med")))
    val mad = dev.groupBy(keys.map(col): _*)
      .agg(expr("percentile(__ad, 0.5)").as("__mad"))
    dev.join(mad, keys)
      .withColumn("med", round(col("__med"), 6))
      .withColumn("mad", round(col("__mad"), 6))
      .withColumn("robust_z", when(col("__mad") > 0,
        round(col("__ad") / (lit(1.4826) * col("__mad")), 6)))
      .withColumn("is_mad_outlier",
        coalesce(col("robust_z") > kMad, lit(false)))
      .drop("__med", "__mad", "__ad")
  }

  /** Per-group OLS trend: slope, intercept, and R² of `valueCol`
    * against the row position within each group — "is this user/
    * source/metric trending, and how cleanly" as one bounded
    * aggregation (the full-series companion to the rolling q71j
    * slope). All five sufficient statistics (n, Σx, Σy, Σxy, Σx², Σy²)
    * are exact 64-bit integers over pre-quantized values; the only
    * doubles are the final ratios — single expressions over exact
    * operands, rounded to 6 decimals, shared verbatim with the
    * engine replay ([[olsExprs]]). Groups with a degenerate x-spread
    * (n < 2) or zero y-variance get null slope/R² rather than
    * fabricated numbers.
    */
  def groupOls(df: DataFrame, keys: Seq[String], orderCols: Seq[String],
      valueCol: String): DataFrame = {
    require(keys.nonEmpty, "need at least one group key")
    require(orderCols.nonEmpty, "need at least one order column")
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    df.withColumn("__x", row_number().over(w).cast("long"))
      .withColumn("__y", col(valueCol).cast("long"))
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(col("__x")).as("sx"), sum(col("__y")).as("sy"),
        sum(col("__x") * col("__y")).as("sxy"),
        sum(col("__x") * col("__x")).as("sxx"),
        sum(col("__y") * col("__y")).as("syy"))
      .selectExpr(keys :+ "n" :+
        (olsSlopeExpr + " AS slope") :+
        (olsInterceptExpr + " AS intercept") :+
        (olsR2Expr + " AS r2"): _*)
  }

  /** Final-ratio expressions over the exact sufficient statistics —
    * one string each, parsed identically by Spark and DuckDB.
    * Numerators/denominators are cast to DOUBLE before any division;
    * products that could exceed 2^63 are formed in double space from
    * exact operands, so both engines round identically.
    */
  def olsSlopeExpr: String =
    "CASE WHEN n >= 2 THEN ROUND(CAST(n * sxy - sx * sy AS DOUBLE)" +
      " / CAST(n * sxx - sx * sx AS DOUBLE), 6) END"
  def olsInterceptExpr: String =
    "CASE WHEN n >= 2 THEN ROUND((CAST(sy AS DOUBLE)" +
      " - (CAST(n * sxy - sx * sy AS DOUBLE)" +
      " / CAST(n * sxx - sx * sx AS DOUBLE)) * CAST(sx AS DOUBLE))" +
      " / CAST(n AS DOUBLE), 6) END"
  def olsR2Expr: String =
    "CASE WHEN n >= 2 AND n * syy - sy * sy != 0 THEN" +
      " ROUND((CAST(n * sxy - sx * sy AS DOUBLE)" +
      " * CAST(n * sxy - sx * sy AS DOUBLE))" +
      " / (CAST(n * sxx - sx * sx AS DOUBLE)" +
      " * CAST(n * syy - sy * sy AS DOUBLE)), 6) END"

  /** Integer CUSUM change-point: per group, the position where the
    * cumulative sum deviates most from the uniform trend — the
    * classic mean-shift detector (a metric that jumped mid-series
    * shows a V-shaped CUSUM whose vertex is the change point). To
    * stay engine-exact, the textbook Σ(xᵢ − x̄) is cross-multiplied by
    * n: dev_k = n·prefix_k − k·total — pure 64-bit integers, no mean,
    * no division — which scales the statistic by n without moving its
    * argmax. Emits the vertex (position, order-key value, signed dev)
    * per group; ties break to the earliest position.
    *
    * One Exchange+Sort for the two windows, one bounded per-group
    * rollup; `valueCol` must already be integral (quantize first —
    * cents, micro-units — as every exact op here does).
    */
  def cusumChangePoint(df: DataFrame, keys: Seq[String], orderCol: String,
      valueCol: String): DataFrame = {
    require(keys.nonEmpty, "need at least one group key")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(orderCol))
    val wAll = Window.partitionBy(keys.map(col): _*)
    val scored = df
      .withColumn("__k", row_number().over(w))
      .withColumn("__prefix", sum(col(valueCol))
        .over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("__n", count(lit(1)).over(wAll))
      .withColumn("__total", sum(col(valueCol)).over(wAll))
      .withColumn("__dev",
        col("__n") * col("__prefix") - col("__k") * col("__total"))
    val best = Window.partitionBy(keys.map(col): _*)
      .orderBy(abs(col("__dev")).desc, col("__k"))
    scored
      .withColumn("__rk", row_number().over(best))
      .filter(col("__rk") === 1)
      .select(keys.map(col) ++ Seq(col("__k").as("change_pos"),
        col(orderCol).as("change_at"), col("__dev").as("dev_n"),
        col("__n").as("n_points")): _*)
  }

  /** Slowly-changing-dimension (type 2) interval construction: collapse
    * a change-event stream into validity intervals per key — the
    * standard warehouse transform that turns an append-only log into
    * an as-of-joinable dimension ([[AsofJoin]] is the natural
    * consumer). Consecutive rows whose tracked attributes are
    * unchanged are folded into one interval; each surviving row gets
    * `valid_from` = its own order position and `valid_to` = the next
    * change's position (null = current version).
    *
    * Determinism contract: `orderCols` must be a per-key unique order
    * (pass a tiebreaker column, e.g. an event id — the same contract
    * as [[ewmMean]]); change detection compares attributes null-safely
    * (`<=>`), so null attribute values are ordinary states, not
    * wildcards.
    *
    * 100 TB posture: two windows over the SAME (key, orderCols)
    * partitioning — Catalyst plans one Exchange + one Sort reused by
    * both Window operators; no joins, no driver data. The second
    * window runs on the change rows only (a fraction of the log).
    */
  def scd2Intervals(df: DataFrame, key: String, orderCols: Seq[String],
      attrs: Seq[String]): DataFrame = {
    require(orderCols.nonEmpty, "need at least one order column")
    require(attrs.nonEmpty, "need at least one tracked attribute")
    val w = Window.partitionBy(col(key)).orderBy(orderCols.map(col): _*)
    val changed = attrs.map(a =>
      !(col(a) <=> lag(col(a), 1).over(w))).reduce(_ || _) ||
      row_number().over(w) === 1
    df.select(col(key) +: (orderCols ++ attrs).map(col): _*)
      .withColumn("__chg", changed)
      .filter(col("__chg"))
      .withColumn("valid_from", col(orderCols.head))
      .withColumn("valid_to", lead(col(orderCols.head), 1).over(w))
      .drop("__chg")
      .drop(orderCols: _*)
  }

  /** CDC changeset apply — the Delta/Iceberg-style MERGE reduced to its
    * deterministic core: fold a batch of keyed change rows
    * (op = 'U' upsert-full-row / 'D' delete, plus a version column)
    * into a snapshot. Within the changeset the LAST version per key
    * wins (last-write-wins; `version` must order changes uniquely per
    * key — pass a tiebroken column, the [[scd2Intervals]] contract);
    * a winning 'U' inserts or replaces the row, a winning 'D' removes
    * it, untouched snapshot rows pass through.
    *
    * 100 TB posture: one window over the changeset (small side) + one
    * left-anti join of the snapshot against the touched-key set + a
    * union — the snapshot is scanned once and only shuffles on the
    * key; with a small changeset the anti join broadcasts and the
    * snapshot never shuffles at all.
    *
    * @param changes must carry `key`, `op`, `version`, and EVERY
    *                snapshot attribute column (full-row upsert)
    */
  def applyChangeSet(snapshot: DataFrame, changes: DataFrame, key: String,
      op: String = "op", version: String = "version"): DataFrame = {
    val attrs = snapshot.columns.filterNot(_ == key)
    val missing = (Seq(key, op, version) ++ attrs)
      .filterNot(changes.columns.contains)
    require(missing.isEmpty,
      s"changeset is missing required columns: ${missing.mkString(", ")}")
    val w = Window.partitionBy(col(key)).orderBy(col(version).desc)
    // Fail fast on malformed ops: a winning row whose op is outside
    // {'U','D'} (an 'I', a typo, a null) must NOT silently delete the
    // key. raise_error keeps the check inside the single changeset
    // scan — no extra validation job.
    val opOk = upper(col(op)).isin("U", "D")
    val checkedOp = when(opOk, upper(col(op))).otherwise(raise_error(concat(
      lit("applyChangeSet: op must be 'U' or 'D', got '"),
      coalesce(col(op).cast("string"), lit("null")),
      lit(s"' for key "), col(key).cast("string"))))
    val latest = changes.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .withColumn("__op", checkedOp)
    val untouched = snapshot.join(latest.select(col(key)), Seq(key), "left_anti")
    val upserts = latest.filter(col("__op") === "U")
      .select((key +: attrs).map(col): _*)
    untouched.unionByName(upserts)
  }

  /** Time-travel snapshot reconstruction — `AS OF` over a CDC log: the
    * state the table had after applying every change with
    * `version <= asOfVersion` to the base snapshot. The log's tail
    * (later versions) is filtered out BEFORE the [[applyChangeSet]]
    * fold, so reconstruction cost tracks the changes up to the asked
    * version, not the full log.
    *
    * Semantics are exactly [[applyChangeSet]]'s (last-write-wins per
    * key within the kept prefix, 'U' upsert / 'D' delete, op-domain
    * fail-fast) — this is the one-parameter time-travel surface a
    * Delta/Iceberg user reaches for, expressed over the same
    * deterministic core so every historical snapshot hash-gates.
    *
    * 100 TB posture: the version filter is a pushed-down predicate on
    * the (partitioned-by-version-range) change log; everything after
    * inherits applyChangeSet's one-scan-plus-keyed-join shape.
    */
  def snapshotAt(snapshot: DataFrame, changes: DataFrame, key: String,
      asOfVersion: Long, op: String = "op",
      version: String = "version"): DataFrame =
    applyChangeSet(snapshot, changes.filter(col(version) <= asOfVersion),
      key, op, version)

  /** Exact distinct-key count per trailing window of `windowDays`
    * calendar days — the "7-day active users by day" family, computed
    * WITHOUT a count-distinct-over-window (which no engine distributes)
    * and without self-joining the event table against itself.
    *
    * Dataflow: collapse events to distinct (day, key) pairs (the only
    * pass over the raw table), fan each pair out to the ≤`windowDays`
    * window-end days it contributes to (explode of a generated date
    * sequence — shuffle is windowDays·|distinct pairs|, independent of
    * raw event volume), re-distinct on (window day, key) so a key seen
    * on several days in one window counts once, and count per day.
    * Only days that actually appear in the data are reported (semi-join
    * against the observed-day set).
    *
    * 100 TB posture: per-event cost is O(1) map-side; the blowup factor
    * is the WINDOW LENGTH, not data volume or key cardinality, and the
    * heavy re-distinct shuffles (day, key) pairs — already deduped
    * once — partitioned across all 𝑑ays. No global sort, no window
    * function, no per-key state.
    */
  def trailingDistinct(df: DataFrame, ts: String, key: String,
      windowDays: Int, as: String = "n_distinct"): DataFrame = {
    require(windowDays >= 1 && windowDays <= 370,
      s"windowDays must be in [1, 370], got $windowDays")
    val dk = df.select(to_date(col(ts)).as("__day"), col(key).as("__k"))
      .filter(col("__day").isNotNull && col("__k").isNotNull)
      .distinct()
    val observed = dk.select(col("__day")).distinct()
    val contrib = dk.select(explode(sequence(col("__day"),
        date_add(col("__day"), windowDays - 1))).as("__day"), col("__k"))
      .distinct()
    contrib.join(observed, Seq("__day"), "left_semi")
      .groupBy(col("__day").as("day"))
      .agg(count(lit(1)).as(as))
  }

  /** Point-in-time (temporal) enrichment join — the consumer side of
    * [[scd2Intervals]]: attach to every fact row the dimension version
    * that was valid at the fact's timestamp, i.e. the half-open
    * interval `[valid_from, valid_to)` containing `ts` (null
    * `valid_to` = current version, open-ended). Facts before a key's
    * first version keep null attributes (left join).
    *
    * Spark-first plan: because the dimension carries an EQUALITY key,
    * this is a plain key-equi-join (hash or sort-merge, AQE-eligible)
    * with the interval predicate as a cheap post-filter — no range-bin
    * machinery needed; per-key fan-out is bounded by that key's
    * version count, and SCD2 intervals are non-overlapping by
    * construction so each fact matches at most one version (a fact ON
    * a boundary t matches only the interval OPENING at t — `[t, t)` is
    * empty). At 100 TB both sides shuffle on the key once; the
    * dimension is usually orders of magnitude smaller and broadcasts.
    *
    * @param facts fact rows; all columns pass through
    * @param dim   SCD2 dimension: key + validFrom + validTo + attrs
    * @return facts ++ the matching version's attribute columns
    */
  def pointInTimeJoin(facts: DataFrame, dim: DataFrame, key: String,
      ts: String, validFrom: String = "valid_from",
      validTo: String = "valid_to"): DataFrame = {
    val dimAttrs = dim.columns.filterNot(_ == key)
    val clash = dimAttrs.toSet.intersect(facts.columns.toSet)
    require(clash.isEmpty,
      s"dimension columns collide with fact columns: ${clash.mkString(", ")}")
    val f = facts.alias("__f")
    val dm = dim.alias("__d")
    val cond = col(s"__f.$key") === col(s"__d.$key") &&
      col(s"__f.$ts") >= col(s"__d.$validFrom") &&
      (col(s"__d.$validTo").isNull || col(s"__f.$ts") < col(s"__d.$validTo"))
    f.join(dm, cond, "left")
      .select(facts.columns.map(c => col(s"__f.$c")) ++
        dimAttrs.map(c => col(s"__d.$c")): _*)
  }

  /** Build a MERGEABLE aggregate snapshot: per key, the closed-form
    * state (n, sum in cents through DECIMAL(38,0), min, max) from
    * which count/sum/mean/min/max — and, merged with any other
    * snapshot of disjoint rows, the exact same statistics — are
    * derivable without rescanning the rows. The state discipline every
    * incremental rollup / materialized view lives on: history is
    * aggregated ONCE, each new partition folds in via
    * [[mergeAggSnapshot]].
    */
  def aggSnapshot(df: DataFrame, keys: Seq[String],
      valueCol: String): DataFrame = {
    require(keys.nonEmpty, "need at least one group key")
    val cents = round(col(valueCol) * 100).cast("long")
    df.filter(col(valueCol).isNotNull)
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(cents.cast("decimal(38,0)")).as("sum_c"),
        min(cents).as("min_c"),
        max(cents).as("max_c"))
  }

  /** Merge two [[aggSnapshot]] states over DISJOINT row sets — the
    * incremental-ETL fold (reference shape: every mergeable-aggregate
    * system from Spark's own partial aggregation to Druid/Cube
    * rollups): count/sum add, min/max fold, keys present on one side
    * only pass through. merge(snapshot(A), snapshot(B)) ==
    * snapshot(A ∪ B) EXACTLY (decimal sums — no fp re-association
    * drift), which is what the q290 gate proves: the Spark side
    * merges yesterday's state with today's delta, the oracle rescans
    * everything.
    *
    * 100 TB posture: the merge touches only the two STATE frames
    * (|keys| rows each) — one keyed shuffle over state, history rows
    * are never read again. `mean_c` is derived at read time
    * (sum div n, floor — derive, never store, or merged means drift).
    */
  def mergeAggSnapshot(snap: DataFrame, delta: DataFrame,
      keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "need at least one group key")
    val want = keys ++ Seq("n", "sum_c", "min_c", "max_c")
    require(want.forall(snap.columns.contains) &&
      want.forall(delta.columns.contains),
      s"both sides must carry aggSnapshot state ${want.mkString(", ")}")
    snap.select(want.map(col): _*)
      .unionByName(delta.select(want.map(col): _*))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("n")).as("n"),
        sum(col("sum_c")).as("sum_c"),
        min(col("min_c")).as("min_c"),
        max(col("max_c")).as("max_c"))
      .withColumn("mean_c", expr("CAST(sum_c div n AS BIGINT)"))
  }

  /** 100 TB tier of [[robustZscoreBy]] — median/MAD at BUCKET
    * resolution (the q216b/q246b histogram-tier discipline): center =
    * the lower edge of the group's median bucket, scale = the lower
    * edge of the |dev| median bucket, both from O(groups·nBins)
    * aggregation state — NO per-group sort window, so group size never
    * concentrates in one task. All-integer ladder: bucket width =
    * (hi−lo) div nBins in cents (required to divide exactly so edges
    * are integers both engines agree on); values outside [lo, hi)
    * clamp into the edge buckets. A scale below one bucket width reads
    * as 0 and emits NULL z (below-resolution — the exact tier is the
    * answer there, not a fabricated scale). Two corpus scans (value
    * histogram, then |dev| histogram against the broadcast centers) +
    * two bounded cumulative walks over the groups·nBins frame.
    *
    * @return grp, id, dev_c (cents from the bucket-resolution center),
    *         z_bp
    */
  def robustZscoreByHist(df: DataFrame, group: String, id: String,
      valueCol: String, loCents: Long, hiCents: Long,
      nBins: Int): DataFrame = {
    require(nBins >= 2 && nBins <= 4096, s"nBins in [2,4096], got $nBins")
    require(hiCents > loCents && (hiCents - loCents) % nBins == 0,
      s"(hi - lo) must divide by nBins exactly for integer edges, " +
        s"got ${hiCents - loCents} / $nBins")
    val w = (hiCents - loCents) / nBins
    val base = df.select(col(group).as("grp"), col(id),
        round(col(valueCol) * 100).cast("long").as("__c"))
      .filter(col("grp").isNotNull && col("__c").isNotNull)
    // integral div (Spark's `/` on longs is double division); trunc-vs-
    // floor divergence on negative operands is absorbed by the 0-clamp
    val bucketExpr =
      s"LEAST(GREATEST(__s div ${w}L, 0L), ${nBins - 1L}L)"
    def medianEdge(h: DataFrame, lo: Long, out: String): DataFrame = {
      val wCum = Window.partitionBy(col("grp")).orderBy(col("__b"))
      h.withColumn("__cume", sum(col("__cnt")).over(wCum))
        .withColumn("__n", sum(col("__cnt")).over(Window.partitionBy(col("grp"))))
        .filter(col("__cume") >= expr("(__n + 1) div 2"))
        .groupBy(col("grp"))
        .agg(min(col("__b")).as("__mb"))
        .select(col("grp"), (lit(lo) + col("__mb") * lit(w)).as(out))
    }
    val center = medianEdge(
      base.withColumn("__s", col("__c") - lit(loCents))
        .groupBy(col("grp"), expr(bucketExpr).as("__b"))
        .agg(count(lit(1)).as("__cnt")),
      loCents, "__center")
    val dev = base.join(broadcast(center), "grp")
      .withColumn("dev_c", col("__c") - col("__center"))
    val scale = medianEdge(
      dev.withColumn("__s", abs(col("dev_c")))
        .groupBy(col("grp"), expr(bucketExpr).as("__b"))
        .agg(count(lit(1)).as("__cnt")),
      0L, "__scale")
    dev.join(broadcast(scale), "grp")
      .withColumn("z_bp",
        expr("""CASE WHEN __scale <= 0 THEN NULL ELSE
                |  (dev_c * 10000 - pmod(dev_c * 10000, __scale))
                |    div __scale
                |END""".stripMargin))
      .select(col("grp"), col(id), col("dev_c"), col("z_bp"))
  }

  /** Per-group ROBUST z-score — the median/MAD outlier screen
    * ([[trimmedMeanBy]] makes a group KPI spike-proof; this scores
    * every ROW against its group, the per-segment data-cleaning pass
    * that a global scaler (q283) can't do when segments live on
    * different scales). center = the group's lower median, scale = the
    * group's MAD (median of |x − med|), both EXACT type-1 order
    * statistics at rank floor((n−1)/2) — rank selection is
    * duplicate-stable, no interpolation, so the integer z replays
    * bit-for-bit. z_bp = floor(dev·10⁴ / mad) via the signed
    * positive-mod spelling; MAD = 0 (≥ half the group on one value)
    * emits NULL — flag such groups, don't fake a scale. The classic
    * 1.4826 normal-consistency factor is deliberately NOT applied
    * (it's irrational — consumers comparing to sigma thresholds
    * multiply their threshold instead; documented contract).
    *
    * Plan: two group-partitioned rank windows (bounded per group —
    * groups are categorical segments by contract) + two keyed joins of
    * |groups|-row frames; rows shuffle by the group key only.
    *
    * @return grp, id, dev_c (signed cents from the group median), z_bp
    */
  def robustZscoreBy(df: DataFrame, group: String, id: String,
      valueCol: String): DataFrame = {
    val base = df.select(col(group).as("grp"), col(id),
        round(col(valueCol) * 100).cast("long").as("__c"))
      .filter(col("grp").isNotNull && col("__c").isNotNull)
    val wv = Window.partitionBy(col("grp")).orderBy(col("__c"))
    val med = base
      .withColumn("__r", row_number().over(wv).cast("long") - 1L)
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(col("grp"))))
      .filter(col("__r") === expr("(__n - 1) div 2"))
      .select(col("grp"), col("__c").as("__med"))
    val dev = base.join(med, "grp")
      .withColumn("dev_c", col("__c") - col("__med"))
    val wa = Window.partitionBy(col("grp")).orderBy(abs(col("dev_c")))
    val mad = dev
      .withColumn("__r", row_number().over(wa).cast("long") - 1L)
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(col("grp"))))
      .filter(col("__r") === expr("(__n - 1) div 2"))
      .select(col("grp"), abs(col("dev_c")).as("__mad"))
    dev.join(mad, "grp")
      .withColumn("z_bp",
        expr("""CASE WHEN __mad = 0 THEN NULL ELSE
                |  (dev_c * 10000 - pmod(dev_c * 10000, __mad)) div __mad
                |END""".stripMargin))
      .select(col("grp"), col(id), col("dev_c"), col("z_bp"))
  }

  /** TRIMMED MEAN per group — the drift-resistant KPI (a mean a single
    * corrupt feed can't drag): exact per-group quantile bounds at
    * [pLo, pHi] (QUANTILE_CONT semantics, the [[outlierFlagsMad]]
    * percentile contract), then the plain mean of the values INSIDE
    * the closed bounds, rounded to 6dp. Reports how many rows were
    * trimmed on each side — a trim count spike is itself the alert.
    *
    * Two grouped percentile passes + one filtered re-aggregation, all
    * on the same group key (one Exchange reused); deterministic:
    * bounds are exact order statistics, membership is a closed-
    * interval comparison, and the final mean is one division rounded
    * once.
    *
    * @return (keys…, n, n_trimmed_lo, n_trimmed_hi, lo, hi,
    *         trimmed_mean)
    */
  def trimmedMeanBy(df: DataFrame, keys: Seq[String], valueCol: String,
      pLo: Double = 0.05, pHi: Double = 0.95): DataFrame = {
    require(keys.nonEmpty, "need at least one group key")
    require(pLo >= 0 && pHi <= 1 && pLo < pHi,
      s"need 0 <= pLo < pHi <= 1, got [$pLo, $pHi]")
    val v = col(valueCol).cast("double")
    val bounds = df.groupBy(keys.map(col): _*)
      .agg(expr(s"percentile($valueCol, CAST($pLo AS DOUBLE))").as("__lo"),
        expr(s"percentile($valueCol, CAST($pHi AS DOUBLE))").as("__hi"))
    df.join(bounds, keys)
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(when(v < col("__lo"), 1L).otherwise(0L)).as("n_trimmed_lo"),
        sum(when(v > col("__hi"), 1L).otherwise(0L)).as("n_trimmed_hi"),
        round(first(col("__lo")), 6).as("lo"),
        round(first(col("__hi")), 6).as("hi"),
        round(avg(when(v >= col("__lo") && v <= col("__hi"), v)), 6)
          .as("trimmed_mean"))
  }

  /** COHORT RETENTION matrix — the product-analytics staple: users
    * cohorted by their FIRST activity week, then for each (cohort
    * week, weeks-since) cell the count of cohort users active that
    * week and the retention share in floor basis points. Weeks are
    * epoch-day div 7 (engine-identical integer arithmetic — no
    * ISO-week dialect drift), `weeks_since` = activity week − cohort
    * week.
    *
    * Two aggregations on the user key (first-week + distinct activity
    * weeks; one Exchange reused) + one bounded cohort-size join —
    * never a user × week cross.
    *
    * @return (cohort_week, weeks_since, n_active, cohort_size,
    *         retention_bp)
    */
  def cohortRetention(df: DataFrame, userCol: String,
      tsCol: String): DataFrame = {
    // integer div chain (Column./ is DOUBLE division — div keeps it
    // exact and engine-identical)
    val wk = expr(s"(unix_micros($tsCol) div 86400000000L) div 7L")
    val uw = df.filter(col(userCol).isNotNull)
      .select(col(userCol).as("__u"), wk.as("__w"))
      .distinct()
    val cohort = uw.groupBy(col("__u")).agg(min(col("__w")).as("__cw"))
    val sizes = cohort.groupBy(col("__cw"))
      .agg(count(lit(1)).as("cohort_size"))
    uw.join(cohort, "__u")
      .groupBy(col("__cw"), (col("__w") - col("__cw")).as("weeks_since"))
      .agg(count(lit(1)).as("n_active"))
      .join(sizes, "__cw")
      .select(col("__cw").as("cohort_week"), col("weeks_since"),
        col("n_active"), col("cohort_size"),
        expr("(10000 * n_active) div cohort_size").as("retention_bp"))
  }

  /** Seasonal-naive FORECAST BACKTEST — the "is this series even
    * forecastable / did the pipeline break last Tuesday" screen run
    * before any real model: per key, bucket the metric to days (sums
    * in integer cents), forecast day d as day d − `season`, and score
    * the overlap with integer-exact errors. Missing days are handled
    * by an equi-JOIN on (key, d − season) — not a lag window, whose
    * row-offset semantics silently mis-align over gaps.
    *
    * Metrics (all association-order-free integers, divisions on
    * positive operands only — the engine-portable `div` subset):
    * MAE in milli-cents = floor(1000·Σ|err| / n), WAPE in ppm =
    * floor(1e6·Σ|err| / Σ|actual|); the signed error sum is emitted
    * raw (no signed division — Spark `div` truncates toward zero
    * while other engines floor, so signed ratios do not replay).
    *
    * One aggregation to daily totals + one self-equi-join + one
    * per-key aggregation; shuffles carry (key, day, cents) longs.
    *
    * @return (key, n_scored, sum_err_cents, sum_abs_err_cents,
    *         sum_abs_actual_cents, mae_milli, wape_ppm)
    */
  def seasonalNaiveBacktest(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, season: Int = 7): DataFrame = {
    require(season >= 1 && season <= 1000,
      s"season must be in [1, 1000], got $season")
    val daily = df
      .filter(col(keyCol).isNotNull && col(valueCol).isNotNull &&
        col(tsCol).isNotNull)
      .groupBy(col(keyCol).as("k"),
        expr(s"unix_micros($tsCol) div 86400000000L").as("d"))
      .agg(sum(round(col(valueCol) * 100).cast("long")).as("cents"))
    val fc = daily.select(col("k"), (col("d") + season).as("d"),
      col("cents").as("fc_cents"))
    daily.join(fc, Seq("k", "d"))
      .withColumn("err", col("cents") - col("fc_cents"))
      .groupBy(col("k").as(keyCol))
      .agg(count(lit(1)).as("n_scored"),
        sum(col("err")).as("sum_err_cents"),
        sum(abs(col("err"))).as("sum_abs_err_cents"),
        sum(abs(col("cents"))).as("sum_abs_actual_cents"))
      .withColumn("mae_milli",
        expr("(1000 * sum_abs_err_cents) div n_scored"))
      .withColumn("wape_ppm",
        expr("CASE WHEN sum_abs_actual_cents = 0 THEN NULL" +
          " ELSE (1000000 * sum_abs_err_cents) div sum_abs_actual_cents END"))
  }

  /** CDC changeset EMITTER — the inverse of [[applyChangeSet]]: diff
    * two keyed snapshots into the minimal (key, op, version, attrs…)
    * changeset that replays `oldDf` into `newDf` — 'U' for keys added
    * or whose attributes changed (null-safely compared), 'D' for keys
    * removed; unchanged keys emit nothing. The round-trip
    * `applyChangeSet(old, emitChangeSet(old, new, …)) == new` is the
    * op's contract (spec-pinned), which is what makes an emitted feed
    * trustworthy before it is published to downstream consumers.
    *
    * One full-outer join on the key (the [[graft.ops.Dedup
    * .snapshotDiff]] shape, but carrying the new attributes out);
    * deleted keys carry the OLD attribute values (the applyChangeSet
    * column contract — the payload of a 'D' row is ignored on apply).
    * Null-keyed rows are DROPPED on both sides (a keyed CDC feed has
    * no null keys; a full-outer join would otherwise mis-diff an
    * unchanged null-key row into a spurious D + U pair).
    *
    * @return (key, op, version, attrs…) — `version` is the constant
    *         the caller stamps the batch with
    */
  def emitChangeSet(oldDf: DataFrame, newDf: DataFrame, key: String,
      version: Long, op: String = "op",
      versionCol: String = "version"): DataFrame = {
    val attrs = newDf.columns.filterNot(_ == key).toSeq
    require(oldDf.columns.sorted.sameElements(newDf.columns.sorted),
      "snapshots must share one schema; evolve columns before diffing")
    val o = oldDf.filter(col(key).isNotNull)
      .select((col(key).as("__k") +:
        attrs.map(c => col(c).as(s"__o_$c"))) :+ lit(1).as("__in_o"): _*)
    val n = newDf.filter(col(key).isNotNull)
      .select((col(key).as("__k") +:
        attrs.map(c => col(c).as(s"__n_$c"))) :+ lit(1).as("__in_n"): _*)
    val changed = attrs.map(c => !(col(s"__o_$c") <=> col(s"__n_$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    o.join(n, Seq("__k"), "full_outer")
      .withColumn(op,
        when(col("__in_n").isNull, "D")
          .when(col("__in_o").isNull || changed, "U"))
      .filter(col(op).isNotNull)
      .select((col("__k").as(key) +: col(op) +:
        lit(version).as(versionCol) +:
        attrs.map(c => when(col(op) === "D", col(s"__o_$c"))
          .otherwise(col(s"__n_$c")).as(c))): _*)
  }

  /** FUNCTIONAL-DEPENDENCY check — does X determine Y (the profiling
    * question behind every "is this column a safe partition/join key"
    * decision, and the violation census when it should hold but
    * doesn't): per distinct X, the number of distinct null-safe Y
    * values; keys with more than one are violations. Reports key and
    * row counts plus the violating-row share in floor basis points.
    *
    * One (x, y) distinct + two rollups — the [[graft.ops.Validate.mutualInfoNano]] scan
    * shape without the log terms.
    *
    * @return one row: (n_keys, n_violating_keys, n_rows,
    *         n_rows_in_violating, fd_bp) — fd_bp = 0 iff X → Y holds
    */
  def fdCheck(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val rows = df.select(col(xCol).cast("string").as("x"),
        coalesce(col(yCol).cast("string"), lit("\u0000null")).as("y"))
      .filter(col("x").isNotNull)
    val perKey = rows.groupBy(col("x"))
      .agg(count(lit(1)).as("nr"), countDistinct(col("y")).as("ny"))
    perKey.agg(count(lit(1)).as("n_keys"),
        sum(when(col("ny") > 1, 1L).otherwise(0L)).as("n_violating_keys"),
        sum(col("nr")).as("n_rows"),
        sum(when(col("ny") > 1, col("nr")).otherwise(0L))
          .as("n_rows_in_violating"))
      .withColumn("fd_bp",
        expr("(10000 * n_rows_in_violating) div n_rows"))
  }
}
