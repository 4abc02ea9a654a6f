package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One learned BPE merge rule: at iteration `iter` the adjacent token
  * pair (`l_tok`, `r_tok`) had the highest corpus frequency
  * (`pair_cnt`) and was fused into the single token `l_tok+r_tok`.
  */
case class BpeMerge(iter: Int, l_tok: String, r_tok: String, pair_cnt: Long)

/** Distributed BPE (byte-pair-encoding) tokenizer TRAINING — the
  * vocabulary-learning counterpart to [[TextAnalysis.wordpieceTokenize]]
  * (which applies a given vocab). Covers the reference's subword
  * pipeline end-to-end: learn merges from a corpus, then encode with
  * them ([python/custreamz + nvtext subword_tokenize families;
  * SURVEY §2.7 nvtext]).
  *
  * Classic word-frequency-dictionary formulation (Sennrich et al. 2016,
  * "Neural Machine Translation of Rare Words with Subword Units"): the
  * corpus is scanned ONCE into (distinct word, count); every training
  * iteration then runs over that dictionary alone. At 100 TB the
  * dictionary is a few million short strings regardless of corpus
  * size, so per-iteration cost is O(|dict|): pair counting is one
  * shuffle on bounded (l,r) keys with map-side partial aggregation,
  * the winning pair is a single-row driver scalar (same contract as
  * the k-means / connected-components convergence counts), and the
  * merge rewrite is a map-side string replace. Encoding the full
  * corpus afterwards is a broadcast join of the learned dictionary —
  * the 100-TB text never shuffles.
  *
  * NOTE this operator is EAGER (like [[Corpus.decontaminateLarge]]):
  * each of the `nMerges` iterations materializes the dictionary
  * (`localCheckpoint`) and collects the 1-row argmax to the driver.
  *
  * Merge semantics (deterministic, engine-independent): within-word
  * adjacent pairs; each rule is applied as TWO passes of
  * delimiter-guarded left-to-right replace-all over the space-joined
  * token string (" l r " -> " lr " on the space-padded string). Two
  * passes merge alternating chains exactly like the greedy reference
  * for l != r; for self-pair runs (e.g. "aaaa" under rule (a,a)) the
  * 4th+ occurrence in a run can differ from one-scan greedy — a
  * documented variant, bit-reproducible in any engine with standard
  * replace-all. Tiebreak: highest count, then (l_tok, r_tok) binary
  * ascending. No end-of-word marker (pure intra-word merges).
  */
object Bpe {

  /** Apply one merge rule to a space-joined token string: two
    * delimiter-guarded replace passes (see object scaladoc).
    */
  private[graft] def mergeOnce(toks: Column, l: String, r: String): Column = {
    val pat = lit(s" $l $r ")
    val rep = lit(s" $l$r ")
    val padded = concat(lit(" "), toks, lit(" "))
    trim(replace(replace(padded, pat, rep), pat, rep))
  }

  /** Word-frequency dictionary with char-level initial tokenization:
    * one corpus scan -> (word, cnt, toks="c h a r s").
    */
  private[graft] def wordDict(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(split(Dedup.normText(col(textCol)), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .withColumn("toks", trim(regexp_replace(col("w"), "(.)", "$1 ")))

  /** Run the training loop; returns the learned rules and the final
    * per-word tokenization dictionary (w, cnt, toks).
    */
  private def train(df: DataFrame, textCol: String, nMerges: Int)
      : (Seq[BpeMerge], DataFrame) = {
    require(nMerges >= 1, s"nMerges must be >= 1, got $nMerges")
    var dict = wordDict(df, textCol).localCheckpoint(true)
    val rules = Seq.newBuilder[BpeMerge]
    var k = 1
    var exhausted = false
    while (k <= nMerges && !exhausted) {
      val sp = split(col("toks"), " ")
      val top = dict
        .select(col("cnt"),
          explode(arrays_zip(
            slice(sp, lit(1), size(sp) - 1),
            slice(sp, lit(2), size(sp) - 1))).as("p"))
        .select(col("p.0").as("l"), col("p.1").as("r"), col("cnt"))
        .groupBy("l", "r").agg(sum("cnt").as("c"))
        .orderBy(col("c").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      if (top.isEmpty) exhausted = true // every word fully merged
      else {
        val (l, r, c) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        rules += BpeMerge(k, l, r, c)
        dict = dict.withColumn("toks", mergeOnce(col("toks"), l, r))
          .localCheckpoint(true)
        k += 1
      }
    }
    (rules.result(), dict)
  }

  /** Learn the top `nMerges` merge rules from `df(textCol)`. Returns
    * one row per rule: (iter, l_tok, r_tok, pair_cnt), iter ascending.
    */
  def learnMerges(df: DataFrame, textCol: String, nMerges: Int): DataFrame = {
    val spark = df.sparkSession
    val (rules, _) = train(df, textCol, nMerges)
    spark.createDataFrame(rules).orderBy(col("iter"))
  }

  /** Learn `nMerges` rules on `df` itself, then encode every document
    * with the final dictionary: a broadcast join on the word — the
    * corpus text itself never shuffles. Returns per-document
    * (idCol, n_words, n_subwords).
    */
  def encode(df: DataFrame, idCol: String, textCol: String,
      nMerges: Int): DataFrame = {
    val (_, dict) = train(df, textCol, nMerges)
    val sizes = dict.select(col("w"),
      size(split(col("toks"), " ")).as("n_sub"))
    df.select(col(idCol),
        explode(split(Dedup.normText(col(textCol)), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .join(broadcast(sizes), "w")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"),
        sum(col("n_sub")).as("n_subwords"))
  }
}
