package graft

import org.apache.spark.sql.types._

/** SURVEY §1.3 / §7.4 widen-on-ingest policy for unsigned integers,
  * executable: the reference stores uint8..uint64 natively
  * ([cudf/core/dtypes.py] dtype table); Spark has no unsigned types, so
  * each widens to the next signed type that holds the full range —
  * uint8→short, uint16→int, uint32→long, uint64→decimal(20,0). The
  * fixture (src/test/resources/unsigned_ints.parquet) carries the max
  * value of every width, so truncation or sign-wrap would fail loudly.
  */
class UnsignedSpec extends SparkSpec {

  private lazy val df = spark.read.parquet(
    getClass.getResource("/unsigned_ints.parquet").getPath)

  test("uint8/16/32/64 widen to short/int/long/decimal(20,0) on ingest") {
    val types = df.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(types("u8") == ShortType)
    assert(types("u16") == IntegerType)
    assert(types("u32") == LongType)
    assert(types("u64") == DecimalType(20, 0))
  }

  test("values above the signed range survive unwrapped") {
    val r = df.orderBy("u8").collect()
    assert(r.map(_.getShort(0)).toSeq == Seq(0, 200, 255))
    assert(r.map(_.getInt(1)).toSeq == Seq(0, 60000, 65535))
    assert(r.map(_.getLong(2)).toSeq == Seq(0L, 3000000000L, 4294967295L))
    assert(r.map(_.getDecimal(3).toBigInteger.toString).toSeq ==
      Seq("0", "9223372036854775817", "18446744073709551615"))
  }

  test("widened columns aggregate with full-range arithmetic") {
    import org.apache.spark.sql.functions._
    val agg = df.agg(sum("u32").as("s32"), max("u64").as("m64")).head()
    assert(agg.getLong(0) == 0L + 3000000000L + 4294967295L)
    assert(agg.getDecimal(1).toBigInteger.toString == "18446744073709551615")
  }
}
