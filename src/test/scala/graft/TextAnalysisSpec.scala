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
}
