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
      .as[(Long, Long, Double, Double, Double)].collect()
    // ema: 2.0; 0.25*4+0.75*2 = 2.5; 0.25*8+0.75*2.5 = 3.875
    // tds: 2.0; 4+2*1 = 6.0 (Δ=0 → decay 1); 8+6*(1/4) = 9.5 (Δ=2)
    // tdn: 1.0; 2.0; 1+2*(1/4) = 1.5  → tdavg 2.0, 3.0, 9.5/1.5
    val want = Seq(
      (1L, 1L, 2.0, 2.0, 2.0),
      (2L, 1L, 2.5, 6.0, 3.0),
      (3L, 1L, 3.875, 9.5, 9.5 / 1.5),
      (4L, 2L, 10.0, 10.0, 10.0))
    assert(got.toSeq == want)
  }

  test("ordering is (ts, id) — same-timestamp ties fold in id order") {
    val df = Seq(
      (1L, ts(0, 0), 2L, 4.0), // inserted out of id order
      (1L, ts(0, 0), 1L, 2.0)
    ).toDF("user_id", "ts", "event_id", "value")
    val got = EventAnalytics.exponentialMovingStats(df)
      .orderBy("event_id")
      .as[(Long, Long, Double, Double, Double)].collect()
    // id 1 first: ema 2.0; then id 2: 0.25*4+0.75*2 = 2.5
    assert(got.map(r => (r._1, r._3)).toSeq == Seq((1L, 2.0), (2L, 2.5)))
  }
}
