package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** Nested list/struct surface — SURVEY.md §2.9. Reference anchors:
  * [python/dask_cudf/dask_cudf/accessors.py :: ListMethods/StructMethods],
  * kernels [cpp/src/lists/]. Everything maps to Spark array functions and
  * higher-order functions (transform/filter/aggregate) — codegen-friendly,
  * no UDFs, so the plan scales linearly over a 100 TB embedding column.
  */
object NestedQueries extends QueryGroup {

  override def queries: Map[String, Q] = Map(
    // list.len / list.get / negative index / contains on a token array
    "q60_list_basic" -> ((s, d) => {
      val toks = Tables.documents(s, d).select(col("doc_id"), split(col("text"), " ").as("toks"))
      toks.select(
          col("doc_id"),
          size(col("toks")).as("n_toks"),
          element_at(col("toks"), 1).as("first_tok"),
          element_at(col("toks"), -1).as("last_tok"),
          array_contains(col("toks"), "table").cast("int").as("has_table"),
          size(array_distinct(col("toks"))).as("n_uniq"),
          array_position(col("toks"), "table").cast("int").as("pos_table"))
        .orderBy(col("doc_id"))
    }),

    // list.sort_values + join back to string; slice
    "q61_list_sort_slice" -> ((s, d) => {
      val toks = Tables.documents(s, d)
        .filter(col("doc_id") % 7 === 0)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
      toks.select(
          col("doc_id"),
          array_join(slice(sort_array(array_distinct(col("toks"))), 1, 5), ",").as("top5_sorted"),
          array_join(slice(col("toks"), 2, 3), ",").as("slice_2_3"))
        .orderBy(col("doc_id"))
    }),

    // higher-order functions over the float embedding (list<float>):
    // transform / filter / aggregate — the §2.9 embeddings-math row
    "q62_list_hof" -> ((s, d) => {
      Tables.embeddings(s, d)
        .select(
          col("vec_id"),
          round(sqrt(aggregate(
            transform(col("embedding"), x => x.cast("double") * x.cast("double")),
            lit(0.0), (acc, x) => acc + x)), 4).as("l2_norm"),
          size(filter(col("embedding"), x => x > 0)).as("n_pos"),
          round(aggregate(col("embedding"), lit(0.0), (acc, x) => acc + x.cast("double")), 4).as("sum_all"),
          round(element_at(col("embedding"), 1).cast("double"), 6).as("e0"))
        .orderBy(col("vec_id"))
    }),

    // explode / posexplode (list → rows)
    "q63_list_explode" -> ((s, d) => {
      Tables.embeddings(s, d)
        .filter(col("vec_id") < 5)
        .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos0", "v")))
        .select(col("vec_id"), (col("pos0") + 1).as("pos"), round(col("v").cast("double"), 6).as("val"))
        .orderBy(col("vec_id"), col("pos"))
    }),

    // explode_outer: pandas explode keeps a null row for an empty list
    // (plain explode silently drops the parent row)
    "q63b_explode_outer" -> ((s, d) => {
      Tables.documents(s, d)
        .filter(col("doc_id") % 7 === 0)
        .select(col("doc_id"),
          filter(split(col("text"), " "), t => length(t) > 9).as("longtoks"))
        .select(col("doc_id"), explode_outer(col("longtoks")).as("tok"))
        .orderBy(col("doc_id"), col("tok"))
    }),

    // struct build / field access / struct-in-array
    "q64_struct" -> ((s, d) => {
      Tables.customer(s, d)
        .filter(col("c_custkey") % 37 === 0)
        .withColumn("st", struct(col("c_mktsegment").as("seg"), col("c_acctbal").as("bal")))
        .select(
          col("c_custkey"),
          col("st").getField("seg").as("seg"),
          round(col("st").getField("bal"), 2).as("bal"),
          col("st.seg").as("seg2"))
        .orderBy(col("c_custkey"))
    }),

    // zip_with + flatten (pairwise ops across two lists)
    "q65_list_zip" -> ((s, d) => {
      val e = Tables.embeddings(s, d).filter(col("vec_id") < 50)
      val a = e.select(col("vec_id"), col("embedding").as("ea"))
      val b = e.select((col("vec_id") - 1).as("vec_id"), col("embedding").as("eb"))
      a.join(b, Seq("vec_id"))
        .select(
          col("vec_id"),
          round(aggregate(zip_with(col("ea"), col("eb"),
            (x, y) => x.cast("double") * y.cast("double")), lit(0.0), (acc, x) => acc + x), 6).as("dot"))
        .orderBy(col("vec_id"))
    }),

    // array set algebra (reference lists union/intersect/difference
    // kernels [cpp/src/lists/set_operations.cu]); results are sorted +
    // joined so element order never enters the comparison
    "q66_array_setops" -> ((s, d) => {
      val t = Tables.documents(s, d).filter(col("doc_id") % 7 === 0)
        .select(col("doc_id"),
          slice(split(col("text"), " "), 1, 6).as("a1"),
          slice(split(col("text"), " "), 4, 6).as("a2"))
      t.select(col("doc_id"),
          array_join(array_sort(array_intersect(col("a1"), col("a2"))), ",").as("inter"),
          array_join(array_sort(array_union(col("a1"), col("a2"))), ",").as("uni"),
          array_join(array_sort(array_except(col("a1"), col("a2"))), ",").as("dif"))
        .orderBy(col("doc_id"))
    }),

    // sequence generation / repeat / flatten (reference sequences +
    // interleave/tile [cpp/src/lists/sequences.cu, reshape/])
    "q67_sequence_ops" -> ((s, d) => {
      Tables.lineitem(s, d).filter(col("l_orderkey") % 1499 === 0)
        .select(col("l_orderkey"), col("l_linenumber"),
          array_join(transform(sequence(lit(1), col("l_linenumber")),
            x => x.cast("string")), ",").as("seq_1_n"),
          array_join(array_repeat(col("l_returnflag"), 3), "").as("rf3"),
          array_join(transform(
            flatten(array(sequence(lit(1), lit(3)), sequence(lit(4), lit(6)))),
            x => x.cast("string")), ",").as("flat16"),
          size(sequence(lit(0), col("l_linenumber"), lit(2))).as("n_step2"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // map column ops (reference struct/map dtypes): build, size, lookup,
    // keys, value-fold — entries sorted before join so map iteration
    // order never enters the comparison
    "q68_map_ops" -> ((s, d) => {
      Tables.lineitem(s, d).filter(col("l_orderkey") % 1499 === 0)
        .withColumn("m", map_from_arrays(
          array(lit("qty"), lit("disc"), lit("tax")),
          array(col("l_quantity"), col("l_discount"), col("l_tax"))))
        .select(col("l_orderkey"), col("l_linenumber"),
          size(col("m")).as("m_size"),
          round(element_at(col("m"), "qty"), 2).as("m_qty"),
          array_join(array_sort(map_keys(col("m"))), ",").as("keys_sorted"),
          round(aggregate(map_values(col("m")), lit(0.0), (a, x) => a + x), 2).as("vals_sum"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    })
  )

  override def oracle: Map[String, String] = Map(
    "q60_list_basic" ->
      """SELECT doc_id,
        |  CAST(LEN(STRING_SPLIT(text,' ')) AS INTEGER) AS n_toks,
        |  STRING_SPLIT(text,' ')[1] AS first_tok,
        |  STRING_SPLIT(text,' ')[-1] AS last_tok,
        |  CAST(LIST_CONTAINS(STRING_SPLIT(text,' '), 'table') AS INTEGER) AS has_table,
        |  CAST(LEN(LIST_DISTINCT(STRING_SPLIT(text,' '))) AS INTEGER) AS n_uniq,
        |  CAST(LIST_POSITION(STRING_SPLIT(text,' '), 'table') AS INTEGER) AS pos_table
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q61_list_sort_slice" ->
      """SELECT doc_id,
        |  ARRAY_TO_STRING(LIST_SLICE(LIST_SORT(LIST_DISTINCT(STRING_SPLIT(text,' '))), 1, 5), ',') AS top5_sorted,
        |  ARRAY_TO_STRING(LIST_SLICE(STRING_SPLIT(text,' '), 2, 4), ',') AS slice_2_3
        |FROM documents WHERE doc_id % 7 = 0 ORDER BY doc_id""".stripMargin,

    "q62_list_hof" ->
      """SELECT vec_id,
        |  ROUND(SQRT(LIST_SUM(LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)))), 4) AS l2_norm,
        |  CAST(LEN(LIST_FILTER(embedding, x -> x > 0)) AS INTEGER) AS n_pos,
        |  ROUND(LIST_SUM(LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE))), 4) AS sum_all,
        |  ROUND(CAST(embedding[1] AS DOUBLE), 6) AS e0
        |FROM embeddings ORDER BY vec_id""".stripMargin,

    "q63_list_explode" ->
      """SELECT vec_id, CAST(pos AS INTEGER) AS pos, ROUND(CAST(val AS DOUBLE), 6) AS val FROM (
        |  SELECT vec_id,
        |    UNNEST(range(1, LEN(embedding)+1)) AS pos,
        |    UNNEST(embedding) AS val
        |  FROM embeddings WHERE vec_id < 5
        |) ORDER BY vec_id, pos""".stripMargin,

    // UNNEST drops empty-list parents, so the null rows come from an
    // explicit UNION ALL branch
    "q63b_explode_outer" ->
      """WITH t AS (SELECT doc_id,
        |  LIST_FILTER(STRING_SPLIT(text, ' '), x -> LENGTH(x) > 9) AS l
        |  FROM documents WHERE doc_id % 7 = 0)
        |SELECT doc_id, tok FROM (
        |  SELECT doc_id, CAST(NULL AS VARCHAR) AS tok FROM t WHERE LEN(l) = 0
        |  UNION ALL SELECT doc_id, UNNEST(l) AS tok FROM t WHERE LEN(l) > 0
        |) ORDER BY doc_id, tok""".stripMargin,

    "q64_struct" ->
      """SELECT c_custkey, c_mktsegment AS seg, ROUND(c_acctbal, 2) AS bal,
        |  c_mktsegment AS seg2
        |FROM customer WHERE c_custkey % 37 = 0 ORDER BY c_custkey""".stripMargin,

    "q65_list_zip" ->
      """SELECT a.vec_id,
        |  ROUND(LIST_SUM(LIST_TRANSFORM(range(1, LEN(a.embedding)+1),
        |    i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))), 6) AS dot
        |FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
        |WHERE a.vec_id < 50 AND b.vec_id < 50
        |ORDER BY a.vec_id""".stripMargin,

    // DuckDB has no list_union/list_except — emulate with concat+distinct
    // and a membership filter; LIST_SLICE end is inclusive (Spark slice
    // takes a length), hence (1,6) and (4,9). COALESCE because DuckDB's
    // ARRAY_TO_STRING([]) is NULL where Spark's array_join([]) is ''
    // (found at sf0.1: a doc whose first-6 tokens ⊆ tokens 4–9).
    "q66_array_setops" ->
      """SELECT doc_id,
        |  COALESCE(ARRAY_TO_STRING(LIST_SORT(LIST_DISTINCT(
        |    LIST_INTERSECT(LIST_SLICE(STRING_SPLIT(text,' '),1,6), LIST_SLICE(STRING_SPLIT(text,' '),4,9)))), ','), '') AS inter,
        |  COALESCE(ARRAY_TO_STRING(LIST_SORT(LIST_DISTINCT(
        |    LIST_CONCAT(LIST_SLICE(STRING_SPLIT(text,' '),1,6), LIST_SLICE(STRING_SPLIT(text,' '),4,9)))), ','), '') AS uni,
        |  COALESCE(ARRAY_TO_STRING(LIST_SORT(LIST_FILTER(LIST_DISTINCT(LIST_SLICE(STRING_SPLIT(text,' '),1,6)),
        |    x -> NOT LIST_CONTAINS(LIST_SLICE(STRING_SPLIT(text,' '),4,9), x))), ','), '') AS dif
        |FROM documents WHERE doc_id % 7 = 0 ORDER BY doc_id""".stripMargin,

    "q67_sequence_ops" ->
      """SELECT l_orderkey, l_linenumber,
        |  ARRAY_TO_STRING(LIST_TRANSFORM(range(1, l_linenumber + 1), x -> CAST(x AS VARCHAR)), ',') AS seq_1_n,
        |  REPEAT(l_returnflag, 3) AS rf3,
        |  '1,2,3,4,5,6' AS flat16,
        |  CAST(LEN(range(0, l_linenumber + 1, 2)) AS INTEGER) AS n_step2
        |FROM lineitem WHERE l_orderkey % 1499 = 0
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q68_map_ops" ->
      """SELECT l_orderkey, l_linenumber,
        |  3 AS m_size,
        |  ROUND(l_quantity, 2) AS m_qty,
        |  'disc,qty,tax' AS keys_sorted,
        |  ROUND(l_quantity + l_discount + l_tax, 2) AS vals_sum
        |FROM lineitem WHERE l_orderkey % 1499 = 0
        |ORDER BY l_orderkey, l_linenumber""".stripMargin
  )
}
