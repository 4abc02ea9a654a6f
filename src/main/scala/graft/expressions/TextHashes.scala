package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic text/vector hash kernels — SURVEY.md §2.7 nvtext row
  * (minhash / jaccard / fingerprinting; reference kernels live in
  * [cpp/src/text/] e.g. minhash, and [python/cudf/cudf/core/column/
  * string.py (nvtext section)]) and §2.9 embeddings math.
  *
  * Everything is specified over plain integer arithmetic (31-base
  * polynomial rolling hash mod 1e9+7, Knuth multiplicative mix mod 2^32)
  * so the DuckDB oracle can replay bit-identical values with
  * list_reduce/list_transform SQL — the differential-testing story of
  * SURVEY §5 extended to custom kernels.
  *
  * Expressions implement doGenCode as a static call into [[HashSpec]]:
  * one JVM method call per row from inside whole-stage codegen (no
  * interpreted fallback, no closure allocation on the hot path).
  */
object HashSpec {
  val P: Long = 1000000007L

  /** 31-base polynomial rolling hash of the UTF-8 code units, seed 7,
    * mod P. Matches DuckDB: list_reduce(list_prepend(7, codes), (a,x) ->
    * (a*31+x) % P). ASCII-safe; multi-byte text hashes byte-wise.
    */
  def polyHash(s: UTF8String): Long = {
    // Horner unrolled 6 wide: acc*31^6 + Σ b_k*31^(5-k), ONE `%` per 6
    // bytes instead of per byte (the modulo is ~20-40 cycles; measured
    // 2x on the gopherRepetition census, scripts/stress_r16.scala).
    // Bit-identical to the per-byte spec: ((a*31+b1)*31+b2)... mod P
    // telescopes. No overflow: acc < P ~ 2^30, P*31^6 ~ 8.9e17 < 2^63;
    // byte terms add < 7.6e9.
    val bytes = s.getBytes
    var acc = 7L
    var i = 0
    val n = bytes.length
    while (i + 6 <= n) {
      acc = (acc * 887503681L                    // 31^6
        + (bytes(i) & 0xff) * 28629151L          // 31^5
        + (bytes(i + 1) & 0xff) * 923521L        // 31^4
        + (bytes(i + 2) & 0xff) * 29791L         // 31^3
        + (bytes(i + 3) & 0xff) * 961L           // 31^2
        + (bytes(i + 4) & 0xff) * 31L
        + (bytes(i + 5) & 0xff)) % P
      i += 6
    }
    while (i < n) {
      acc = (acc * 31 + (bytes(i) & 0xff)) % P
      i += 1
    }
    acc
  }

  /** MinHash signature over distinct k-char shingles of the input.
    * sig(i) = min over shingles of ((2i+3)*polyHash(sh) + 1217*i + 17) % P.
    * Strings shorter than k use the whole string as the single shingle.
    */
  def minHash(s: UTF8String, k: Int, n: Int): ArrayData = {
    val str = s.toString
    val hs = new java.util.HashSet[Long]()
    if (str.length < k) hs.add(polyHash(UTF8String.fromString(str)))
    else {
      var i = 0
      val seen = new java.util.HashSet[String]()
      while (i + k <= str.length) {
        val sh = str.substring(i, i + k)
        if (seen.add(sh)) hs.add(polyHash(UTF8String.fromString(sh)))
        i += 1
      }
    }
    val sig = new Array[Long](n)
    var j = 0
    while (j < n) {
      val a = 2L * j + 3
      val b = 1217L * j + 17
      var mn = Long.MaxValue
      val it = hs.iterator()
      while (it.hasNext) {
        val h = it.next()
        val v = (a * h + b) % P
        if (v < mn) mn = v
      }
      sig(j) = mn
      j += 1
    }
    new GenericArrayData(sig)
  }

  /** 32-bit SimHash over whitespace tokens. Token hash = Knuth mix of the
    * polynomial hash: (polyHash(tok) * 2654435761) mod 2^32; bit j of the
    * output is set iff the sum over tokens of (+1 / -1 by bit j) is > 0.
    */
  def simHash32(s: UTF8String): Long = {
    val toks = s.toString.split(" ")
    val votes = new Array[Int](32)
    var t = 0
    while (t < toks.length) {
      if (toks(t).nonEmpty) {
        val h = (polyHash(UTF8String.fromString(toks(t))) * 2654435761L) % 4294967296L
        var j = 0
        while (j < 32) {
          if (((h >> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
          j += 1
        }
      }
      t += 1
    }
    var out = 0L
    var j = 0
    while (j < 32) {
      if (votes(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }

  /** Signed-random-projection bucket — see [[RandomProjectionBits]]. */
  def rpBits(v: ArrayData, nBits: Int): Long = {
    val d = v.numElements()
    var bucket = 0L
    var j = 0
    while (j < nBits) {
      var s = 0.0
      var i = 0
      while (i < d) {
        val w = ((1103515245L * (j.toLong * d + i) + 12345L) % 2001L) - 1000L
        s += v.getFloat(i).toDouble * w
        i += 1
      }
      if (s > 0) bucket |= (1L << j)
      j += 1
    }
    bucket
  }

  /** Dot product of two float arrays, accumulated in index order as
    * double (deterministic summation order → oracle-stable).
    */
  def dotF(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    s
  }

  /** Ukkonen-banded Levenshtein over Unicode CODE POINTS: exact
    * distance when <= k, −1 otherwise. Visits only the |i−j| <= k band
    * (O(k·len) time, O(len) space) and exits as soon as a whole row's
    * band exceeds k. Code points (not UTF-16 code units — r8 advice)
    * so the metric agrees with character-counting engines (DuckDB
    * `levenshtein`, the q198 oracle) on supplementary-plane text too,
    * not just ASCII/BMP.
    */
  def editDistanceBounded(a: UTF8String, b: UTF8String, k: Int): Int = {
    val s = a.toString.codePoints().toArray
    val t = b.toString.codePoints().toArray
    val n = s.length
    val m = t.length
    if (math.abs(n - m) > k) return -1
    if (n == 0) return m // <= k by the length guard
    if (m == 0) return n
    val INF = Int.MaxValue / 2
    var prev = new Array[Int](m + 1)
    var cur = new Array[Int](m + 1)
    java.util.Arrays.fill(prev, INF)
    var j = 0
    while (j <= math.min(m, k)) { prev(j) = j; j += 1 }
    var i = 1
    while (i <= n) {
      java.util.Arrays.fill(cur, INF)
      val lo = math.max(1, i - k)
      val hi = math.min(m, i + k)
      if (i <= k) cur(0) = i
      var best = INF
      var jj = lo
      while (jj <= hi) {
        val cost = if (s(i - 1) == t(jj - 1)) 0 else 1
        var v = prev(jj - 1) + cost
        if (prev(jj) + 1 < v) v = prev(jj) + 1
        if (cur(jj - 1) + 1 < v) v = cur(jj - 1) + 1
        cur(jj) = v
        if (v < best) best = v
        jj += 1
      }
      if (i <= k && cur(0) < best) best = cur(0)
      if (best > k) return -1
      val tmp = prev; prev = cur; cur = tmp
      i += 1
    }
    if (prev(m) <= k) prev(m) else -1
  }

  /** Hilbert-curve index of a 16-bit (x, y) cell — the classic
    * quadrant-rotation xy→d walk (16 levels, pure 64-bit integers, no
    * lookup tables), shared verbatim by interpreted eval, codegen, and
    * the DuckDB oracle's level-unrolled CTE replay. Unlike the Morton
    * z-value ([[graft.ops.Layout.zValue]]), consecutive Hilbert
    * indices are always 4-adjacent grid cells, so range partitions of
    * the index cover squarer, never-split tiles of key space — the
    * better min/max-stat layout when both dimensions carry selective
    * predicates.
    */
  def hilbertXY2D(xIn: Long, yIn: Long): Long = {
    var x = xIn & 0xFFFFL
    var y = yIn & 0xFFFFL
    var d = 0L
    var s = 32768L
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0L) {
        if (rx == 1L) { x = 65535L - x; y = 65535L - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }
}

/** polyHash(string) → long. */
case class PolyHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(v: Any): Any =
    HashSpec.polyHash(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.HashSpec.polyHash($c)")
  override protected def withNewChildInternal(c: Expression): PolyHash = copy(c)
}

/** minhash signature(string) → array<long> of length n over k-shingles. */
case class MinHashSig(child: Expression, k: Int, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    HashSpec.minHash(v.asInstanceOf[UTF8String], k, n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.HashSpec.minHash($c, $k, $n)")
  override protected def withNewChildInternal(c: Expression): MinHashSig = copy(child = c)
}

/** simhash32(string) → long (lower 32 bits used). */
case class SimHash32(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(v: Any): Any =
    HashSpec.simHash32(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.HashSpec.simHash32($c)")
  override protected def withNewChildInternal(c: Expression): SimHash32 = copy(c)
}

/** dot_f(array<float>, array<float>) → double, index-order accumulation.
  * The codegen'd scale path for §2.9 embeddings math / M6 similarity —
  * ~64 fused multiply-adds per row vs. the HOF aggregate's per-element
  * Catalyst eval.
  */
case class DotProductF(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    HashSpec.dotF(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expressions.HashSpec.dotF($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProductF =
    copy(left = l, right = r)
}

/** hilbert_index(long, long) → long: 16-bit Hilbert curve position. */
case class HilbertIndex(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    HashSpec.hilbertXY2D(a.asInstanceOf[Long], b.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.expressions.HashSpec.hilbertXY2D($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): HilbertIndex =
    copy(left = l, right = r)
}

/** Signed-random-projection LSH bucket id over array<float> → long.
  * Hyperplane weights are derived from an LCG over (bit, dim) indices —
  * w(j,i) = ((1103515245*(j*D+i) + 12345) mod 2001) - 1000 — integer
  * arithmetic both engines replay exactly; bit j of the bucket is set
  * iff sum_i w(j,i)*x_i > 0 (index-order double accumulation; weight
  * magnitude ~1e3 makes a sign flip from fp ordering impossible in
  * practice). The scale path for M6 similarity search: same-bucket
  * join replaces the O(N²) pair scan.
  */
case class RandomProjectionBits(child: Expression, nBits: Int) extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(v: Any): Any =
    HashSpec.rpBits(v.asInstanceOf[ArrayData], nBits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.HashSpec.rpBits($c, $nBits)")
  override protected def withNewChildInternal(c: Expression): RandomProjectionBits =
    copy(child = c)
}

/** Bounded (Ukkonen-banded) edit distance: exact Levenshtein when it
  * is <= `bound`, −1 otherwise. The DP only visits the |i−j| <= bound
  * band and abandons a row whose whole band already exceeds the bound,
  * so a pair-scoring pass costs O(bound·len) instead of O(len²) — the
  * form a 100 TB fuzzy-match join can actually afford (candidate pairs
  * come from blocking/minhash; this scores them; almost all score
  * "too far" and exit after a few rows). Spark's builtin levenshtein
  * always fills the full matrix; cuDF's edit_distance kernel is the
  * same full-matrix shape — the band is the scale win.
  *
  * Differential gate: DuckDB replays it as
  * CASE WHEN levenshtein(a,b) <= k THEN levenshtein(a,b) ELSE -1 END —
  * an INDEPENDENT full-matrix implementation agreeing with the banded
  * one exactly on every in-band value (q198) — for ASCII text (the
  * q198 fixture). On non-ASCII the engines deliberately diverge:
  * DuckDB's levenshtein counts UTF-8 BYTES (measured: '😀'→'a' = 4),
  * while this kernel counts Unicode code points — the semantics of
  * Spark's builtin levenshtein, with which it agrees on ALL text
  * (spec-gated in TextHashesSpec, incl. supplementary-plane).
  */
case class EditDistanceBounded(left: Expression, right: Expression,
    bound: Int) extends BinaryExpression {
  require(bound >= 0, s"bound must be >= 0, got $bound")
  override def dataType: DataType = IntegerType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    HashSpec.editDistanceBounded(a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String], bound)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.expressions.HashSpec.editDistanceBounded($a, $b, $bound)")
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): EditDistanceBounded = copy(left = l, right = r)
}

/** Column-level entry points for the custom expressions.
  * Spark 4 made Column representation-agnostic; the classic
  * Column↔Expression bridge lives in sql.classic.ExpressionUtils.
  */
object TextHashes {
  import org.apache.spark.sql.graft.ColumnBridge.{column, expression}

  def poly_hash(c: Column): Column = column(PolyHash(expression(c)))
  def minhash_sig(c: Column, k: Int = 5, n: Int = 16): Column =
    column(MinHashSig(expression(c), k, n))
  def simhash32(c: Column): Column = column(SimHash32(expression(c)))
  def dot_f(a: Column, b: Column): Column =
    column(DotProductF(expression(a), expression(b)))
  def rp_bits(c: Column, nBits: Int = 8): Column =
    column(RandomProjectionBits(expression(c), nBits))
  def edit_distance_bounded(a: Column, b: Column, bound: Int): Column =
    column(EditDistanceBounded(expression(a), expression(b), bound))
  def hilbert_index(a: Column, b: Column): Column =
    column(HilbertIndex(expression(a.cast("long")), expression(b.cast("long"))))
}
