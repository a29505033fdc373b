package graft.ops

import java.sql.Timestamp

import graft.SparkSessionTestWrapper
import org.scalatest.funsuite.AnyFunSuite

class SessionsSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  // user 1: two sessions split by a 31-minute gap; user 2: one session
  // whose events arrive out of order; the 1800s boundary itself does NOT
  // split (strictly-greater semantics)
  private lazy val events = Seq(
    (1L, 1L, ts("2024-01-01 10:00:00"), 1.0),
    (2L, 1L, ts("2024-01-01 10:10:00"), 2.0),
    (3L, 1L, ts("2024-01-01 10:40:00"), 3.0), // exactly 1800s after #2 → same session
    (4L, 1L, ts("2024-01-01 11:11:01"), 4.0), // 1861s after #3 → new session
    (6L, 2L, ts("2024-01-01 09:30:00"), 6.0),
    (5L, 2L, ts("2024-01-01 09:00:00"), 5.0)
  ).toDF("event_id", "user_id", "ts", "value")

  test("sessionize: strictly-greater gap starts a session; boundary does not") {
    val out = Sessions.sessionize(events, "user_id", "ts", "event_id")
      .select("event_id", "session_seq").as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 2L, 5L -> 1L, 6L -> 1L))
  }

  test("sessionStats: per-session span and totals; input order irrelevant") {
    val out = Sessions.sessionStats(events, "user_id", "ts", "event_id", "value")
      .as[(Long, Long, Long, Timestamp, Timestamp, Long)].collect().sortBy(r => (r._1, r._2))
    assert(out.toSeq == Seq(
      (1L, 1L, 3L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:40:00"), 600L),
      (1L, 2L, 1L, ts("2024-01-01 11:11:01"), ts("2024-01-01 11:11:01"), 400L),
      (2L, 1L, 2L, ts("2024-01-01 09:00:00"), ts("2024-01-01 09:30:00"), 1100L)))
  }

  test("sessionStats: the window's exchange is reused — exactly one shuffle") {
    val out = Sessions.sessionStats(events, "user_id", "ts", "event_id", "value")
    val shuffles = out.queryExecution.executedPlan.toString()
      .linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(shuffles == 1,
      "grouping on (user_id, session_seq) must reuse the window's hash(user_id) partitioning")
  }

  test("sessionStatsBucketed ≡ sessionStats across bucket widths (random corpus)") {
    // random events: a few human-scale users plus one hot machine key
    // whose sessions straddle many bucket boundaries
    val rnd = new scala.util.Random(41)
    val base = ts("2024-01-01 00:00:00").getTime
    val rows = (0 until 4000).map { i =>
      val user = if (i % 4 == 0) 999L else (i % 7).toLong
      // jumps frequently exceed the gap; same-second ties occur
      val t = new Timestamp(base + rnd.nextInt(400000) * 1000L)
      (i.toLong, user, t, rnd.nextInt(100) / 10.0)
    }
    val df = rows.toDF("event_id", "user_id", "ts", "value")
    val want = Sessions.sessionStats(df, "user_id", "ts", "event_id", "value")
      .collect().map(_.toSeq).toSet
    // bucket far below, at, and far above the gap — including widths
    // where whole buckets are empty between a session's events
    for (bucket <- Seq(600L, 1800L, 3600L, 86400L)) {
      val got = Sessions.sessionStatsBucketed(df, "user_id", "ts", "event_id", "value",
        gapSeconds = 1800L, bucketSeconds = bucket)
        .collect().map(_.toSeq).toSet
      assert(got == want, s"bucketSeconds=$bucket diverged from sessionStats")
    }
  }

  test("sessionStatsBucketed: level-2 partition holds stubs, not events") {
    // one entity, 100 events in one long session spanning 10 buckets:
    // level 1 must emit ~10 stubs that level 2 merges back into one row
    val rows = (0 until 100).map { i =>
      (i.toLong, 1L, new Timestamp(ts("2024-01-01 00:00:00").getTime + i * 60000L), 0.0)
    }
    val out = Sessions.sessionStatsBucketed(rows.toDF("event_id", "user_id", "ts", "value"),
      "user_id", "ts", "event_id", "value", gapSeconds = 1800L, bucketSeconds = 600L)
      .as[(Long, Long, Long, Timestamp, Timestamp, Long)].collect()
    assert(out.toSeq == Seq((1L, 1L, 100L,
      ts("2024-01-01 00:00:00"), ts("2024-01-01 01:39:00"), 0L)))
  }

  test("sessionStatsBucketed: exactly two exchanges — both groupBys reuse their window's partitioning") {
    val out = Sessions.sessionStatsBucketed(events, "user_id", "ts", "event_id", "value")
    val shuffles = out.queryExecution.executedPlan.toString()
      .linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(shuffles == 2,
      "level 1 shuffles by (entity, bucket), level 2 by entity; the stub " +
        "and session aggregations must reuse those exchanges, not add their own")
  }

  test("sessionize: same-timestamp ties are ordered by event id deterministically") {
    val tied = Seq(
      (2L, 9L, ts("2024-01-01 10:00:00"), 0.0),
      (1L, 9L, ts("2024-01-01 10:00:00"), 0.0),
      (3L, 9L, ts("2024-01-01 11:00:00"), 0.0)
    ).toDF("event_id", "user_id", "ts", "value")
    val out = Sessions.sessionize(tied, "user_id", "ts", "event_id")
      .select("event_id", "session_seq").as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 2L))
  }
}
