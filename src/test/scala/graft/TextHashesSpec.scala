package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import graft.expressions.{HashSpec, TextHashes}

/** Golden tests for the deterministic hash kernels — expected values
  * computed independently (reference Python implementation of the same
  * spec), so Scala, codegen, and DuckDB-oracle paths all agree.
  */
class TextHashesSpec extends SparkSpec {

  private def u(s: String) = UTF8String.fromString(s)

  test("polyHash golden values") {
    assert(HashSpec.polyHash(u("abc")) == 304891L)
    assert(HashSpec.polyHash(u("key agg row")) == 293698969L)
    assert(HashSpec.polyHash(u("")) == 7L)
  }

  test("minHash golden signature") {
    val sig = HashSpec.minHash(u("the quick brown fox jumps"), 5, 16).toLongArray()
    assert(sig.toSeq == Seq(698968100L, 164948032L, 60912750L, 96907903L,
      238578213L, 8576328L, 416243676L, 5076404L, 426807584L, 182741867L,
      50063287L, 360407330L, 46727851L, 11154542L, 126905521L, 544848L))
  }

  test("minHash short string uses whole string as single shingle") {
    val sig = HashSpec.minHash(u("abc"), 5, 3).toLongArray()
    assert(sig.toSeq == Seq(914690L, 1525689L, 2136688L))
  }

  test("simHash32 golden value") {
    assert(HashSpec.simHash32(u("key agg row scan slow")) == 1708188488L)
  }

  test("dotF accumulates in index order") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val a = new GenericArrayData(Array(1.0f, 2.0f, 3.0f))
    val b = new GenericArrayData(Array(4.0f, 5.0f, 6.0f))
    assert(HashSpec.dotF(a, b) == 32.0)
  }

  test("expressions run inside a Spark plan (codegen path)") {
    import spark.implicits._
    val df = Seq("the quick brown fox jumps", "key agg row scan slow").toDF("t")
    val row = df.select(
      TextHashes.poly_hash(col("t")).as("ph"),
      TextHashes.minhash_sig(col("t")).as("mh"),
      TextHashes.simhash32(col("t")).as("sh"),
      TextHashes.dot_f(
        array(lit(1.0f), lit(2.0f)), array(lit(3.0f), lit(4.0f))).as("dot"))
      .collect()
    assert(row(0).getAs[Seq[Long]]("mh").head == 698968100L)
    assert(row(1).getAs[Long]("sh") == 1708188488L)
    assert(row(0).getAs[Double]("dot") == 11.0)
  }

  test("editDistanceBounded: property vs full-matrix DP on random strings") {
    import org.apache.spark.unsafe.types.UTF8String
    def full(s: String, t: String): Int = {
      val d = Array.tabulate(s.length + 1, t.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to s.length; j <- 1 to t.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (s(i - 1) == t(j - 1)) 0 else 1))
      d(s.length)(t.length)
    }
    val rnd = new scala.util.Random(17)
    def randStr() = Seq.fill(rnd.nextInt(12))("abc" (rnd.nextInt(3))).mkString
    for (_ <- 1 to 500; k <- 0 to 4) {
      val (s, t) = (randStr(), randStr())
      val expect = { val f = full(s, t); if (f <= k) f else -1 }
      val got = graft.expressions.HashSpec.editDistanceBounded(
        UTF8String.fromString(s), UTF8String.fromString(t), k)
      assert(got == expect, s"s=$s t=$t k=$k got=$got expect=$expect")
    }
  }

  test("editDistanceBounded works through codegen in a real plan") {
    import spark.implicits._
    val df = Seq(("kitten", "sitting"), ("same", "same"), ("a", "zzzzzz"))
      .toDF("a", "b")
      .select(TextHashes.edit_distance_bounded(col("a"), col("b"), 3).as("d"))
    assert(df.collect().map(_.getInt(0)).toSeq == Seq(3, 0, -1))
  }

  test("editDistanceBounded counts code points, matching Spark builtin on non-ASCII") {
    // deliberate divergence from DuckDB levenshtein (UTF-8 BYTES:
    // '😀'→'a' measures 4 there); the kernel's contract is Unicode
    // code points — the semantics of Spark's own levenshtein — so gate
    // agreement with the builtin on BMP + supplementary-plane text
    import spark.implicits._
    val pairs = Seq(("café", "cafe"), ("😀", "a"), ("ab😀cd", "abcd"),
      ("привет", "привёт"), ("中文文本", "中文"), ("𝕏y", "xy"))
    val df = pairs.toDF("a", "b").select(
      TextHashes.edit_distance_bounded(col("a"), col("b"), 10).as("banded"),
      levenshtein(col("a"), col("b")).as("builtin"))
    df.collect().foreach { r =>
      assert(r.getInt(0) == r.getInt(1),
        s"banded=${r.getInt(0)} builtin=${r.getInt(1)}")
    }
    // out-of-band sentinel still fires on non-ASCII
    val far = Seq(("😀😀😀😀😀", "x")).toDF("a", "b")
      .select(TextHashes.edit_distance_bounded(col("a"), col("b"), 2).as("d"))
    assert(far.collect().head.getInt(0) == -1)
  }
}
