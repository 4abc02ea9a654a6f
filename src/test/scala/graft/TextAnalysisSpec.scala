package graft

import org.apache.spark.sql.functions._
import graft.ops.{Porter, TextAnalysis}

/** nvtext long-tail parity: Porter stemmer golden values (canonical
  * examples from Porter 1980), char n-grams, code points.
  */
class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("porter stemmer matches canonical examples") {
    val golden = Map(
      "caresses" -> "caress", "ponies" -> "poni", "ties" -> "ti",
      "caress" -> "caress", "cats" -> "cat",
      "feed" -> "feed", "agreed" -> "agre", "plastered" -> "plaster",
      "bled" -> "bled", "motoring" -> "motor", "sing" -> "sing",
      "conflated" -> "conflat", "troubled" -> "troubl", "sized" -> "size",
      "hopping" -> "hop", "tanned" -> "tan", "falling" -> "fall",
      "hissing" -> "hiss", "fizzed" -> "fizz", "failing" -> "fail",
      "filing" -> "file", "happy" -> "happi", "sky" -> "sky",
      "relational" -> "relat", "conditional" -> "condit",
      "rational" -> "ration", "valenci" -> "valenc", "digitizer" -> "digit",
      "operator" -> "oper", "feudalism" -> "feudal",
      "decisiveness" -> "decis", "hopefulness" -> "hope",
      "formaliti" -> "formal", "formative" -> "form", "formalize" -> "formal",
      "electriciti" -> "electr", "electrical" -> "electr", "hopeful" -> "hope",
      "goodness" -> "good", "revival" -> "reviv", "allowance" -> "allow",
      "inference" -> "infer", "airliner" -> "airlin", "gyroscopic" -> "gyroscop",
      "adjustable" -> "adjust", "defensible" -> "defens", "irritant" -> "irrit",
      "replacement" -> "replac", "adjustment" -> "adjust", "dependent" -> "depend",
      "adoption" -> "adopt", "homologou" -> "homolog", "communism" -> "commun",
      "activate" -> "activ", "angulariti" -> "angular", "homologous" -> "homolog",
      "effective" -> "effect", "bowdlerize" -> "bowdler",
      "probate" -> "probat", "rate" -> "rate", "cease" -> "ceas",
      "controll" -> "control", "roll" -> "roll")
    val bad = golden.filter { case (in, want) => Porter.stem(in) != want }
      .map { case (in, want) => s"$in: got ${Porter.stem(in)}, want $want" }
    assert(bad.isEmpty, bad.mkString("; "))
  }

  test("porter stemmer runs as a column expression") {
    val res = Seq("running", "flies", "denied").toDF("w")
      .select(TextAnalysis.porterStem(col("w"))).as[String].collect().toSeq
    assert(res == Seq("run", "fli", "deni"))
  }

  test("char ngrams are distinct sliding windows over normalized text") {
    val res = Seq("abcabc").toDF("t")
      .select(TextAnalysis.charNgrams(col("t"), 3)).as[Seq[String]].head()
    assert(res == Seq("abc", "bca", "cab"))
  }

  test("code points round-trip ascii") {
    val res = Seq("Ab z").toDF("t")
      .select(TextAnalysis.codePoints(col("t"))).as[Seq[Int]].head()
    assert(res == Seq(65, 98, 32, 122))
  }

  test("wordpiece greedy longest-match-first: golden splits") {
    val v = TextAnalysis.wordpieceVocab
    def pieces(w: String): List[String] =
      TextAnalysis.wordpieceWord(w).map(v)
    assert(pieces("the") == List("the"))            // full-word hit
    assert(pieces("fast") == List("fast"))          // beats prefix 'fa'
    assert(pieces("faster") == List("fast", "##er"))
    assert(pieces("slow") == List("sl", "##ow"))    // beats single 's'
    assert(pieces("window") == List("wind", "##ow"))
    assert(pieces("customer") == List("cust", "##omer"))
    assert(pieces("scan") == List("sca", "##n"))    // single-char cont
    assert(pieces("a") == List("a"))
    assert(pieces("x9z") == List("[UNK]"))          // digit kills WHOLE word
    assert(pieces("zzz") == List("z", "##z", "##z"))
    assert(pieces("##ow") == List("[UNK]"))         // no cont piece at pos 0
  }

  test("wordpieceTokenize emits per-doc counts and the id stream") {
    val df = Seq((1L, "The  FAST window"), (2L, ""), (3L, "x9z scan"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.wordpieceTokenize(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    val v = TextAnalysis.wordpieceVocab
    val ids = Seq(v.indexOf("the"), v.indexOf("fast"),
      v.indexOf("wind"), v.indexOf("##ow")).mkString(" ")
    assert(r(0).getAs[Int]("n_words") == 3 &&
      r(0).getAs[String]("token_ids") == ids)
    assert(r(1).getAs[Int]("n_tokens") == 0 &&
      r(1).getAs[String]("token_ids") == "")
    assert(r(2).getAs[Int]("n_unk") == 1) // x9z -> [UNK], scan -> 2 ids
    assert(r(2).getAs[Int]("n_tokens") == 3)
  }
}
