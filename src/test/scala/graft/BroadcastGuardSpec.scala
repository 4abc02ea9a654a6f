package graft

import graft.ops.BroadcastGuard

/** Focused spec for the r18 shared broadcast-size guard (ADVICE r17):
  * the 14 iterative-op guard sites used to `.toLong` the raw session
  * value of spark.sql.autoBroadcastJoinThreshold, which throws on the
  * unit-suffixed byte strings Spark itself accepts ("10MB", "10m").
  */
class BroadcastGuardSpec extends SparkSpec {

  private def withThreshold[A](v: String)(f: => A): A = {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val old = spark.conf.get(key)
    spark.conf.set(key, v)
    try f finally spark.conf.set(key, old)
  }

  test("numeric threshold parses and bounds the estimate strictly") {
    withThreshold((1L << 20).toString) {
      assert(BroadcastGuard.thresholdBytes(spark) === (1L << 20))
      // 16384 rows x 64 B == 1 MiB exactly -> NOT under the threshold
      assert(!BroadcastGuard.fits(spark, 16384L, BroadcastGuard.RowBytesNarrow))
      assert(BroadcastGuard.fits(spark, 16383L, BroadcastGuard.RowBytesNarrow))
    }
  }

  test("unit-suffixed thresholds no longer throw (the r17 ADVICE bug)") {
    withThreshold("10MB") {
      assert(BroadcastGuard.thresholdBytes(spark) === 10L * 1024 * 1024)
      assert(BroadcastGuard.fits(spark, 1000L, BroadcastGuard.RowBytesLabeled))
    }
    withThreshold("10m") {
      assert(BroadcastGuard.thresholdBytes(spark) === 10L * 1024 * 1024)
    }
  }

  test("disabled threshold (-1) means never broadcast") {
    withThreshold("-1") {
      assert(!BroadcastGuard.fits(spark, 1L, BroadcastGuard.RowBytesNarrow))
    }
  }

  test("an unparseable value falls back to the 10 MB default") {
    withThreshold("not-a-size") {
      assert(BroadcastGuard.thresholdBytes(spark) === (10L << 20))
    }
  }
}
