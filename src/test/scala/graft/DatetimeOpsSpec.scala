package graft

import java.time.{DayOfWeek, LocalDate}
import org.apache.spark.sql.functions._
import graft.ops.DatetimeOps

/** Pins DatetimeOps against java.time ground truth — important because
  * the q53c oracle replays the same closed-form formula in DuckDB (a
  * formula bug would pass the differential gate), while q50c's oracle
  * is DuckDB's independent native isocalendar.
  */
class DatetimeOpsSpec extends SparkSpec {
  import spark.implicits._

  private def bruteBusdays(s: LocalDate, e: LocalDate): Int =
    Iterator.iterate(s)(_.plusDays(1)).takeWhile(_.isBefore(e))
      .count(d => d.getDayOfWeek != DayOfWeek.SATURDAY &&
        d.getDayOfWeek != DayOfWeek.SUNDAY)

  test("busdayCount matches day-by-day iteration over all dow x span combos") {
    // 14 consecutive start days x spans 0..30 — covers every
    // (start-dow, remainder) pair several times over
    val cases = for {
      off <- 0 until 14
      span <- 0 to 30
    } yield (LocalDate.of(2024, 2, 26).plusDays(off).toString,
      LocalDate.of(2024, 2, 26).plusDays(off + span).toString)
    val df = cases.toDF("s", "e")
      .select(col("s").cast("date").as("s"), col("e").cast("date").as("e"))
    val got = df.select(col("s"), col("e"),
        DatetimeOps.busdayCount(col("s"), col("e")).as("b"))
      .collect()
      .map(r => ((r.getDate(0).toString, r.getDate(1).toString), r.getInt(2)))
      .toMap
    cases.foreach { case (s, e) =>
      assert(got((s, e)) == bruteBusdays(LocalDate.parse(s), LocalDate.parse(e)),
        s"busdays($s, $e)")
    }
  }

  test("isocalendar matches java.time IsoFields across year boundaries") {
    import java.time.temporal.IsoFields
    // Dec 28 .. Jan 5 around several new years, incl. leap years — the
    // zone where iso year != calendar year
    val dates = for {
      y <- Seq(2015, 2016, 2020, 2021, 2024, 2025)
      off <- -5 to 5
    } yield LocalDate.of(y, 1, 1).plusDays(off).toString
    val got = dates.toDF("d").select(col("d").cast("date").as("d"))
      .select(col("d"), DatetimeOps.isoYear(col("d")).as("iy"),
        DatetimeOps.isoWeek(col("d")).as("iw"),
        DatetimeOps.isoDow(col("d")).as("idw"))
      .collect()
      .map(r => (r.getDate(0).toString, (r.getInt(1), r.getInt(2), r.getInt(3))))
      .toMap
    dates.foreach { s =>
      val d = LocalDate.parse(s)
      val want = (d.get(IsoFields.WEEK_BASED_YEAR),
        d.get(IsoFields.WEEK_OF_WEEK_BASED_YEAR), d.getDayOfWeek.getValue)
      assert(got(s) == want, s"isocalendar($s)")
    }
  }

  test("seasonalDecompose: alternating period-2 series decomposes to zero residual") {
    import org.apache.spark.sql.functions._
    // one event per hourly slot, values 10/20 alternating: trend =
    // floor 3-slot MA (1333/1666 cents, NULL at edges), seasonal =
    // per-phase floor-mean of detrended (667 / -666), residual 0
    val rows = (0 until 6).map { h =>
      (h.toLong, f"2024-01-01 $h%02d:00:00", if (h % 2 == 0) 10.0 else 20.0)
    }
    val df = rows.toDF("event_id", "tss", "value")
      .withColumn("ts", to_timestamp(col("tss")))
    val out = graft.ops.DatetimeOps.seasonalDecompose(df, "ts", "value",
        bucketSeconds = 3600L, period = 2)
      .orderBy("slot_ts").collect()
    assert(out.length == 6)
    def opt(r: org.apache.spark.sql.Row, i: Int): Option[Long] =
      if (r.isNullAt(i)) None else Some(r.getLong(i))
    // columns: slot_ts, n_events, v_c, trend_c, seasonal_c, resid_c
    val trend = out.map(opt(_, 3))
    assert(trend.toSeq == Seq(None, Some(1333L), Some(1666L),
      Some(1333L), Some(1666L), None), trend.mkString(","))
    val seasonal = out.map(opt(_, 4))
    assert(seasonal.toSeq == Seq(None, Some(667L), Some(-666L),
      Some(667L), Some(-666L), None), seasonal.mkString(","))
    val resid = out.map(opt(_, 5))
    assert(resid.toSeq == Seq(None, Some(0L), Some(0L), Some(0L),
      Some(0L), None), resid.mkString(","))
    // partition invariance
    val out7 = graft.ops.DatetimeOps.seasonalDecompose(df.repartition(7),
        "ts", "value", 3600L, 2)
      .orderBy("slot_ts").collect().map(_.toString)
    assert(out7.toSeq == out.map(_.toString).toSeq)
  }

  test("seasonalDecomposeBy: one series equals the global op; series isolate") {
    import org.apache.spark.sql.functions._
    val rows = (0 until 6).flatMap { h =>
      Seq((h.toLong, "a", f"2024-01-01 $h%02d:00:00",
             if (h % 2 == 0) 10.0 else 20.0),
          (h.toLong + 100, "b", f"2024-01-01 $h%02d:00:00", 50.0))
    }
    val df = rows.toDF("event_id", "series", "tss", "value")
      .withColumn("ts", to_timestamp(col("tss")))
    val by = graft.ops.DatetimeOps.seasonalDecomposeBy(df, "series",
        "ts", "value", 3600L, 2)
      .orderBy("series", "slot_ts").collect()
    val global = graft.ops.DatetimeOps.seasonalDecompose(
        df.filter(col("series") === "a"), "ts", "value", 3600L, 2)
      .orderBy("slot_ts").collect()
    val aRows = by.filter(_.getString(0) == "a")
      .map(r => (1 until r.length).map(i =>
        if (r.isNullAt(i)) null else r.get(i)).toSeq)
    val gRows = global.map(r => (0 until r.length).map(i =>
      if (r.isNullAt(i)) null else r.get(i)).toSeq)
    assert(aRows.toSeq == gRows.toSeq, s"a-series != global")
    // constant series b: zero seasonal and residual everywhere the
    // trend is defined
    val bRows = by.filter(_.getString(0) == "b")
    assert(bRows.length == 6)
    bRows.filter(!_.isNullAt(4)).foreach { r =>
      assert(r.getLong(5) == 0L && r.getLong(6) == 0L, r.toString)
    }
  }
}
