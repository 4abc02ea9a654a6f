package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.AsofJoin

/** As-of join surface — the operator the reference cannot run (SURVEY
  * §2.3 marks merge_asof unsupported: cudf lacks the kernel). Oracles
  * use DuckDB's native ASOF JOIN, so the gate cross-checks our
  * union+window implementation against an independent native one.
  */
object AsofQueries extends QueryGroup {

  private def purchases(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.events(s, d).filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))

  override def queries: Map[String, Q] = Map(
    // backward as-of: latest preceding view of the same user
    "q130_asof_backward" -> ((s, d) => {
      val views = Tables.events(s, d).filter(col("event_type") === "view")
        .select(col("user_id"), col("ts"), col("event_id").as("view_id"))
      AsofJoin.asofJoin(purchases(s, d), views, "ts", "ts",
          by = Seq("user_id"), rightCols = Seq("view_id"))
        .filter(col("view_id").isNotNull)
        .select(col("event_id"), col("user_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("p_ts"),
          col("view_id"))
        .orderBy(col("event_id"))
    }),

    // forward as-of with tolerance: next error within 1 hour
    "q131_asof_forward_tol" -> ((s, d) => {
      val errors = Tables.events(s, d).filter(col("event_type") === "error")
        .select(col("user_id"), col("ts"), col("event_id").as("err_id"))
      AsofJoin.asofJoin(purchases(s, d), errors, "ts", "ts",
          by = Seq("user_id"), rightCols = Seq("err_id"),
          direction = "forward", tolerance = lit(3600))
        .select(col("event_id"), col("user_id"), col("err_id"))
        .orderBy(col("event_id"))
    }),

    // nearest as-of: closer of the preceding/following view, ties
    // backward (pandas direction='nearest')
    "q132_asof_nearest" -> ((s, d) => {
      val views = Tables.events(s, d).filter(col("event_type") === "view")
        .select(col("user_id"), col("ts"), col("event_id").as("view_id"))
      AsofJoin.asofJoin(purchases(s, d), views, "ts", "ts",
          by = Seq("user_id"), rightCols = Seq("view_id"),
          direction = "nearest")
        .select(col("event_id"), col("user_id"), col("view_id"))
        .orderBy(col("event_id"))
    }),

    // the same backward as-of through the PHYSICAL operator
    // (graft.plans.AsofMergeJoinExec — custom LogicalPlan + Strategy +
    // SparkPlan, one merge pass per partition) against the same native
    // DuckDB ASOF oracle; left-join semantics, so unmatched purchases
    // keep a null view_id
    "q133_asof_merge_exec" -> ((s, d) => {
      val views = Tables.events(s, d).filter(col("event_type") === "view")
        .select(col("user_id"), col("ts"), col("event_id").as("view_id"))
      graft.plans.AsofMergeJoin.asofBackward(purchases(s, d), views,
          "ts", "ts", by = Seq("user_id"), rightCols = Seq("view_id"))
        .select(col("event_id"), col("user_id"), col("view_id"))
        .orderBy(col("event_id"))
    }),

    // forward through the physical operator (earliest view at/after the
    // purchase), natively replayed by DuckDB ASOF with >=
    "q133b_asof_merge_forward" -> ((s, d) => {
      val views = Tables.events(s, d).filter(col("event_type") === "view")
        .select(col("user_id"), col("ts"), col("event_id").as("view_id"))
      graft.plans.AsofMergeJoin.asofMerge(purchases(s, d), views,
          "ts", "ts", by = Seq("user_id"), rightCols = Seq("view_id"),
          direction = "forward")
        .select(col("event_id"), col("user_id"), col("view_id"))
        .orderBy(col("event_id"))
    }),

    // nearest through the physical operator (ties backward) — same
    // two-ASOF oracle construction as the Dataset-level q132
    "q133c_asof_merge_nearest" -> ((s, d) => {
      val views = Tables.events(s, d).filter(col("event_type") === "view")
        .select(col("user_id"), col("ts"), col("event_id").as("view_id"))
      graft.plans.AsofMergeJoin.asofMerge(purchases(s, d), views,
          "ts", "ts", by = Seq("user_id"), rightCols = Seq("view_id"),
          direction = "nearest")
        .select(col("event_id"), col("user_id"), col("view_id"))
        .orderBy(col("event_id"))
    }),

    // merge_ordered(fill_method='ffill'): interleave each user's click
    // and view series on event_id (disjoint ids — the classic ordered
    // union) and forward-fill both value columns within the user group;
    // oracle is a FULL OUTER JOIN + last_value(IGNORE NULLS) window
    "q134_merge_ordered" -> ((s, d) => {
      val ev = Tables.events(s, d).filter(col("user_id") % 4 === 0)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id"), col("value").as("click_v"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("event_id"), col("value").as("view_v"))
      graft.ops.FrameOps.mergeOrdered(clicks, views, on = Seq("event_id"),
          by = Seq("user_id"), fillMethod = Some("ffill"))
        .select(col("user_id"), col("event_id"),
          round(col("click_v"), 6).as("click_v"),
          round(col("view_v"), 6).as("view_v"))
        .orderBy(col("user_id"), col("event_id"))
    })
  )

  override def oracle: Map[String, String] = Map(
    "q130_asof_backward" ->
      """WITH p AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
        |           FROM events WHERE event_type = 'purchase'),
        |v AS (SELECT event_id AS view_id, user_id, CAST(ts AS TIMESTAMP) AS ts
        |      FROM events WHERE event_type = 'view')
        |SELECT p.event_id, p.user_id,
        |  STRFTIME(p.ts, '%Y-%m-%d %H:%M:%S') AS p_ts, v.view_id
        |FROM p ASOF JOIN v ON p.user_id = v.user_id AND v.ts <= p.ts
        |ORDER BY p.event_id""".stripMargin,

    "q131_asof_forward_tol" ->
      """WITH p AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
        |           FROM events WHERE event_type = 'purchase'),
        |e AS (SELECT event_id AS err_id, user_id, CAST(ts AS TIMESTAMP) AS ts
        |      FROM events WHERE event_type = 'error')
        |SELECT p.event_id, p.user_id,
        |  CASE WHEN EPOCH(e.ts) - EPOCH(p.ts) <= 3600 THEN e.err_id END AS err_id
        |FROM p ASOF LEFT JOIN e ON p.user_id = e.user_id AND e.ts >= p.ts
        |ORDER BY p.event_id""".stripMargin,

    "q133_asof_merge_exec" ->
      """WITH p AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
        |           FROM events WHERE event_type = 'purchase'),
        |v AS (SELECT event_id AS view_id, user_id, CAST(ts AS TIMESTAMP) AS ts
        |      FROM events WHERE event_type = 'view')
        |SELECT p.event_id, p.user_id, v.view_id
        |FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND v.ts <= p.ts
        |ORDER BY p.event_id""".stripMargin,

    "q133b_asof_merge_forward" ->
      """WITH p AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
        |           FROM events WHERE event_type = 'purchase'),
        |v AS (SELECT event_id AS view_id, user_id, CAST(ts AS TIMESTAMP) AS ts
        |      FROM events WHERE event_type = 'view')
        |SELECT p.event_id, p.user_id, v.view_id
        |FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND v.ts >= p.ts
        |ORDER BY p.event_id""".stripMargin,

    "q133c_asof_merge_nearest" ->
      """WITH p AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
        |           FROM events WHERE event_type = 'purchase'),
        |v AS (SELECT event_id AS view_id, user_id, CAST(ts AS TIMESTAMP) AS ts
        |      FROM events WHERE event_type = 'view'),
        |b AS (SELECT p.event_id, p.user_id, p.ts, v.view_id AS b_id, v.ts AS b_ts
        |      FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND v.ts <= p.ts),
        |f AS (SELECT p.event_id, v.view_id AS f_id, v.ts AS f_ts
        |      FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND v.ts > p.ts)
        |SELECT b.event_id, b.user_id,
        |  CASE WHEN b_id IS NULL THEN f_id
        |       WHEN f_id IS NULL THEN b_id
        |       WHEN ABS(EPOCH(f_ts) - EPOCH(b.ts)) < ABS(EPOCH(b.ts) - EPOCH(b_ts)) THEN f_id
        |       ELSE b_id END AS view_id
        |FROM b JOIN f USING (event_id)
        |ORDER BY b.event_id""".stripMargin,

    // two native ASOF joins (backward inclusive, forward strict — a
    // distance-0 match is always claimed by the backward side), closer
    // wins, ties backward
    "q132_asof_nearest" ->
      """WITH p AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
        |           FROM events WHERE event_type = 'purchase'),
        |v AS (SELECT event_id AS view_id, user_id, CAST(ts AS TIMESTAMP) AS ts
        |      FROM events WHERE event_type = 'view'),
        |b AS (SELECT p.event_id, p.user_id, p.ts, v.view_id AS b_id, v.ts AS b_ts
        |      FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND v.ts <= p.ts),
        |f AS (SELECT p.event_id, v.view_id AS f_id, v.ts AS f_ts
        |      FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND v.ts > p.ts)
        |SELECT b.event_id, b.user_id,
        |  CASE WHEN b_id IS NULL THEN f_id
        |       WHEN f_id IS NULL THEN b_id
        |       WHEN ABS(EPOCH(f_ts) - EPOCH(b.ts)) < ABS(EPOCH(b.ts) - EPOCH(b_ts)) THEN f_id
        |       ELSE b_id END AS view_id
        |FROM b JOIN f USING (event_id)
        |ORDER BY b.event_id""".stripMargin,

    "q134_merge_ordered" ->
      """WITH c AS (SELECT user_id, event_id, value AS click_v FROM events
        |  WHERE event_type = 'click' AND user_id % 4 = 0),
        |v AS (SELECT user_id, event_id, value AS view_v FROM events
        |  WHERE event_type = 'view' AND user_id % 4 = 0),
        |j AS (SELECT user_id, event_id, click_v, view_v
        |  FROM c FULL OUTER JOIN v USING (user_id, event_id))
        |SELECT user_id, event_id,
        |  ROUND(last_value(click_v IGNORE NULLS) OVER w, 6) AS click_v,
        |  ROUND(last_value(view_v IGNORE NULLS) OVER w, 6) AS view_v
        |FROM j
        |WINDOW w AS (PARTITION BY user_id ORDER BY event_id
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, event_id""".stripMargin
  )
}
