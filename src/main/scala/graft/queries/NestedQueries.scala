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
        |ORDER BY a.vec_id""".stripMargin
  )
}
