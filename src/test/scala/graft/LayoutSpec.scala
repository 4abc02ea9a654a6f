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
}
