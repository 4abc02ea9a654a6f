package graft

import org.apache.spark.sql.functions._
import graft.ops.Layout

/** Z-order layout: the Morton arithmetic itself, and the property it
  * exists for — a box predicate on either dimension touches fewer files
  * than under a single-column sort.
  */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zValue interleaves bits (known values)") {
    val got = Seq((15, 0), (0, 15), (3, 5), (65535, 65535), (0, 0))
      .toDF("a", "b")
      .select(Layout.zValue($"a", $"b").as("z"))
      .collect().map(_.getLong(0)).toSeq
    // spread(15)=0b01010101=85; spread(3)=0b0101=5; spread(5)=0b010001=17
    assert(got == Seq(85L, 170L, 5L | (17L << 1), 0xFFFFFFFFL, 0L))
  }

  test("hilbertXY2D: continuity — the first 4096 positions walk the 64x64 origin block in unit steps") {
    // the curve's defining property (and what Z lacks): consecutive
    // indices are 4-adjacent cells. {d < 4^k} must be exactly the
    // [0, 2^k)^2 block, walked with |Δx| + |Δy| = 1 at every step.
    val cells = for (x <- 0 until 64; y <- 0 until 64)
      yield (graft.expressions.HashSpec.hilbertXY2D(x, y), x, y)
    assert(cells.map(_._1).sorted == (0L until 4096L))
    val walk = cells.sortBy(_._1)
    walk.sliding(2).foreach { case Seq((_, x0, y0), (_, x1, y1)) =>
      assert(math.abs(x1 - x0) + math.abs(y1 - y0) == 1,
        s"jump at ($x0,$y0)->($x1,$y1)")
    }
    // corners of the full 16-bit curve: start at (0,0); d covers [0, 2^32)
    assert(graft.expressions.HashSpec.hilbertXY2D(0, 0) == 0L)
    val corner = graft.expressions.HashSpec.hilbertXY2D(65535L, 0L)
    assert(corner == (1L << 32) - 1L, s"end corner d=$corner")
  }

  test("hilbert_index expression: codegen == interpreted == reference loop") {
    val rng = new scala.util.Random(7)
    val pts = Seq((0L, 0L), (65535L, 65535L), (65535L, 0L), (0L, 65535L)) ++
      Seq.fill(200)((rng.nextInt(65536).toLong, rng.nextInt(65536).toLong))
    val df = pts.toDF("x", "y")
    val viaExpr = df.select(Layout.hValue($"x", $"y")).collect().map(_.getLong(0))
    assert(viaExpr.toSeq == pts.map { case (x, y) =>
      graft.expressions.HashSpec.hilbertXY2D(x, y) })
    // interpreted path (codegen off) must agree
    val conf = spark.conf
    val oldWs = conf.get("spark.sql.codegen.wholeStage")
    val oldFm = conf.get("spark.sql.codegen.factoryMode")
    try {
      conf.set("spark.sql.codegen.wholeStage", "false")
      conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      val interp = df.select(Layout.hValue($"x", $"y")).collect().map(_.getLong(0))
      assert(interp.toSeq == viaExpr.toSeq)
    } finally {
      conf.set("spark.sql.codegen.wholeStage", oldWs)
      conf.set("spark.sql.codegen.factoryMode", oldFm)
    }
  }

  test("hilbert layout prunes a 2-d box at least as well as single-column sort") {
    val li = Tables.lineitem(spark, sfSmall)
      .select($"l_orderkey", $"l_partkey", $"l_suppkey")
    val hDir = s"${System.getProperty("java.io.tmpdir")}/graft-hilbert-test"
    val plainDir = s"${System.getProperty("java.io.tmpdir")}/graft-plain-h-test"
    Layout.hilbertOrderBy(li, $"l_partkey", $"l_suppkey", nFiles = 8)
      .write.mode("overwrite").parquet(hDir)
    li.repartitionByRange(8, $"l_orderkey").sortWithinPartitions($"l_orderkey")
      .write.mode("overwrite").parquet(plainDir)
    def filesTouched(dir: String): Long =
      spark.read.parquet(dir)
        .filter($"l_partkey".between(100, 140) && $"l_suppkey".between(10, 20))
        .select(input_file_name()).distinct().count()
    val (hf, pf) = (filesTouched(hDir), filesTouched(plainDir))
    assert(hf < pf, s"hilbert files=$hf plain files=$pf")
    assert(hf <= 4, s"hilbert files=$hf")
  }

  test("z-ordered layout prunes more files than single-column sort for a 2-d box") {
    val li = Tables.lineitem(spark, sfSmall)
      .select($"l_orderkey", $"l_partkey", $"l_suppkey")
    val zDir = s"${System.getProperty("java.io.tmpdir")}/graft-zorder-test"
    val plainDir = s"${System.getProperty("java.io.tmpdir")}/graft-plain-test"
    Layout.zOrderBy(li, $"l_partkey", $"l_suppkey", nFiles = 8)
      .write.mode("overwrite").parquet(zDir)
    li.repartitionByRange(8, $"l_orderkey").sortWithinPartitions($"l_orderkey")
      .write.mode("overwrite").parquet(plainDir)
    def filesTouched(dir: String): Long =
      spark.read.parquet(dir)
        .filter($"l_partkey".between(100, 140) && $"l_suppkey".between(10, 20))
        .select(input_file_name()).distinct().count()
    val (zf, pf) = (filesTouched(zDir), filesTouched(plainDir))
    // orderkey order is uncorrelated with the box → matches land in ~all
    // 8 files; the z layout confines the box to a few space rectangles
    assert(zf < pf, s"z files=$zf plain files=$pf")
    assert(zf <= 4, s"z files=$zf")
  }

  test("clusteringDepth: range-clustered layout ~1-2, round-robin layout = nFiles") {
    import graft.ops.Layout
    val li = graft.Tables.lineitem(spark, "/root/testdata/sf0.001")
    val sortedDir = java.nio.file.Files
      .createTempDirectory("graft_depth_sorted").toString
    val rrDir = java.nio.file.Files
      .createTempDirectory("graft_depth_rr").toString
    li.repartitionByRange(4, $"l_orderkey")
      .sortWithinPartitions($"l_orderkey")
      .write.mode("overwrite").parquet(sortedDir)
    li.repartition(4).write.mode("overwrite").parquet(rrDir)
    val s = Layout.clusteringDepth(spark, sortedDir, "l_orderkey")
      .collect().head
    val r = Layout.clusteringDepth(spark, rrDir, "l_orderkey")
      .collect().head
    assert(s.getLong(0) == 4 && r.getLong(0) == 4,
      s"files: sorted=${s.getLong(0)} rr=${r.getLong(0)}")
    // range clustering: intervals disjoint except possibly shared
    // boundary keys -> depth <= 2; round-robin: every file spans the
    // whole key range -> depth = nFiles (nothing prunes)
    assert(s.getLong(2) <= 2, s"sorted depth=${s.getLong(2)}")
    assert(r.getLong(2) == 4, s"rr depth=${r.getLong(2)}")
    assert(s.getLong(1) == 0 && r.getLong(1) == 0)
  }

  test("clusteringDepth: all-NULL-key files excluded from the sweep, reported") {
    import graft.ops.Layout
    // 2 all-null files + 2 disjoint-range files: depth must come from
    // the 2 real intervals (1), n_files = 2, n_null_files = 2 — before
    // the r15 ADVICE fix the null bounds sorted to one end and the
    // all-null files inflated n_files (r15 ADVICE item 3)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_depth_null").toString
    val df = Seq[(Integer, Int)]((1, 0), (2, 0), (10, 1), (11, 1),
      (null.asInstanceOf[Integer], 2), (null.asInstanceOf[Integer], 2),
      (null.asInstanceOf[Integer], 3))
      .toDF("k", "p")
    df.coalesce(1).write.mode("overwrite").partitionBy("p").parquet(dir)
    val out = Layout.clusteringDepth(spark, dir, "k").collect().head
    assert(out.getLong(0) == 2, s"n_files: $out")          // p=0, p=1
    assert(out.getLong(1) == 2, s"n_null_files: $out")     // p=2, p=3
    assert(out.getLong(2) == 1, s"depth of disjoint [1,2],[10,11]: $out")
  }
}
