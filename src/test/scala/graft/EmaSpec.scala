package graft

import java.sql.Timestamp
import graft.operators.EventAnalytics

/** Hand-computed fixture for [[EventAnalytics.exponentialMovingStats]]:
  * the recurrence contract (α=1/4 EMA, exact-power-of-two day decay,
  * decayed count → decayed average) on values where every expected number
  * is derived by the same IEEE ops the engine runs. */
class EmaSpec extends SparkSpec {
  import spark.implicits._

  private def ts(day: Int, sec: Int) =
    new Timestamp((day.toLong * 86400L + sec) * 1000L)

  test("ema/tds/tdavg recurrences match the hand fold") {
    // user 1: same-day pair then a 2-day gap; user 2: single event
    val df = Seq(
      (1L, ts(0, 10), 1L, 2.0),
      (1L, ts(0, 20), 2L, 4.0),
      (1L, ts(2, 5), 3L, 8.0),
      (2L, ts(5, 0), 4L, 10.0)
    ).toDF("user_id", "ts", "event_id", "value")
    val got = EventAnalytics.exponentialMovingStats(df)
      .orderBy("event_id")
      .as[(Long, Long, Double, Double, Double, Double, Double, Double, Double)]
      .collect()
    // ema: 2.0; 0.25*4+0.75*2 = 2.5; 0.25*8+0.75*2.5 = 3.875
    // tds: 2.0; 4+2*1 = 6.0 (Δ=0 → decay 1); 8+6*(1/4) = 9.5 (Δ=2)
    // tdn: 1.0; 2.0; 1+2*(1/4) = 1.5  → tdavg 2.0, 3.0, 9.5/1.5
    // tdmax: 2.0; max(4, 2·1) = 4.0; max(8, 4·1/4) = 8.0
    // holt (α=1/4, β=1/8): hl 2.0, 2.5, 3.921875; hb 0, 0.0625, 0.232421875
    val want = Seq(
      (1L, 1L, 2.0, 2.0, 2.0, 2.0, 1.0, 2.0, 0.0),
      (2L, 1L, 2.5, 6.0, 3.0, 4.0, 2.0, 2.5, 0.0625),
      (3L, 1L, 3.875, 9.5, 9.5 / 1.5, 8.0, 1.5, 3.921875, 0.232421875),
      (4L, 2L, 10.0, 10.0, 10.0, 10.0, 1.0, 10.0, 0.0))
    assert(got.toSeq == want)
  }

  test("tdmax recurrence: a decayed old peak can still dominate a small new value") {
    // peak 16 at day 0, small values after: day 2 → max(1, 16/4) = 4;
    // day 3 → max(1, 4/2) = 2 — the decayed peak wins twice, then a fresh
    // larger value takes over at day 4: max(3, 2/2) = 3
    val df = Seq(
      (1L, ts(0, 0), 1L, 16.0),
      (1L, ts(2, 0), 2L, 1.0),
      (1L, ts(3, 0), 3L, 1.0),
      (1L, ts(4, 0), 4L, 3.0)
    ).toDF("user_id", "ts", "event_id", "value")
    val got = EventAnalytics.exponentialMovingStats(df)
      .orderBy("event_id")
      .select($"event_id", $"tdmax", $"tdcount")
      .as[(Long, Double, Double)].collect().toSeq
    assert(got.map(_._2) == Seq(16.0, 4.0, 2.0, 3.0))
    // tdn: 1; 1 + 1/4 = 1.25; 1 + 1.25/2 = 1.625; 1 + 1.625/2 = 1.8125
    assert(got.map(_._3) == Seq(1.0, 1.25, 1.625, 1.8125))
  }

  test("pre-1970 runs: epoch day -1 is a real day, not a first-row sentinel") {
    // first event lands on 1969-12-31 (epoch day -1): a pd=-1 sentinel
    // would make the SECOND event also read as first (recurrence reset),
    // and a pre-1970 day gap must clamp at 0 from below, never index the
    // decay table at 0 (the r15 ADVICE trap)
    val df = Seq(
      (1L, ts(-1, 10), 1L, 2.0), // epoch day -1
      (1L, ts(-1, 20), 2L, 4.0), // same day: decay 1, NOT a reset
      (1L, ts(1, 5), 3L, 8.0)    // Δ = 2 days across the epoch
    ).toDF("user_id", "ts", "event_id", "value")
    val got = EventAnalytics.exponentialMovingStats(df)
      .orderBy("event_id")
      .as[(Long, Long, Double, Double, Double, Double, Double, Double, Double)]
      .collect()
    // identical hand fold as the day-0 fixture, shifted one day earlier
    val want = Seq(
      (1L, 1L, 2.0, 2.0, 2.0, 2.0, 1.0, 2.0, 0.0),
      (2L, 1L, 2.5, 6.0, 3.0, 4.0, 2.0, 2.5, 0.0625),
      (3L, 1L, 3.875, 9.5, 9.5 / 1.5, 8.0, 1.5, 3.921875, 0.232421875))
    assert(got.toSeq == want)
  }

  test("native decay walk is bit-identical to the HOF fold on the real corpus") {
    // the NativeExprParitySpec discipline: the contract queries run the
    // native DecayFoldExpr; this pins it bit-for-bit (== on doubles, no
    // tolerance) to the interpreted HOF reference over the real events file
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val native = EventAnalytics.exponentialMovingStats(ev)
      .orderBy("event_id").collect().toSeq
    val chain = EventAnalytics.exponentialMovingStatsChain(ev)
      .orderBy("event_id").collect().toSeq
    assert(native.size > 100)
    assert(native == chain)
  }

  test("ordering is (ts, id) — same-timestamp ties fold in id order") {
    val df = Seq(
      (1L, ts(0, 0), 2L, 4.0), // inserted out of id order
      (1L, ts(0, 0), 1L, 2.0)
    ).toDF("user_id", "ts", "event_id", "value")
    val got = EventAnalytics.exponentialMovingStats(df)
      .orderBy("event_id")
      .select($"event_id", $"ema")
      .as[(Long, Double)].collect()
    // id 1 first: ema 2.0; then id 2: 0.25*4+0.75*2 = 2.5
    assert(got.toSeq == Seq((1L, 2.0), (2L, 2.5)))
  }
}
