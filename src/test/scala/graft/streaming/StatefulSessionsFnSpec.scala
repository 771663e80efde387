package graft.streaming

import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
import org.scalatest.funsuite.AnyFunSuite
import java.time.{Instant, LocalDateTime, ZoneOffset}
import org.apache.spark.api.java.Optional

/** Direct unit coverage of the EventTimeTimeout state function's paths the
  * multi-batch MemoryStream test doesn't isolate: all-late input with no
  * prior state, pure timeout flush, and cross-batch out-of-order merge.
  * Spark's TestGroupState exists precisely for this. */
class StatefulSessionsFnSpec extends AnyFunSuite {

  private def t(h: Int, m: Int) = LocalDateTime.of(2024, 1, 1, h, m, 0)
  private def inst(h: Int, m: Int) = t(h, m).toInstant(ZoneOffset.UTC)
  private def ms(h: Int, m: Int) = inst(h, m).toEpochMilli

  private def state(buf: Option[StatefulSessions.SessionBuf],
                    wmMs: Long, timedOut: Boolean) =
    TestGroupState.create[StatefulSessions.SessionBuf](
      buf.map(Optional.of[StatefulSessions.SessionBuf]).getOrElse(Optional.empty()),
      GroupStateTimeout.EventTimeTimeout, 0L, Optional.of(java.lang.Long.valueOf(wmMs)),
      timedOut)

  private def ev(h: Int, m: Int, v: Double) =
    StatefulSessions.UtcEvent(1L, inst(h, m), v)

  test("all-late input with no prior state emits nothing and keeps no state") {
    val s = state(None, wmMs = ms(12, 0), timedOut = false)
    val out = StatefulSessions.watermarkStateFn(1L,
      Iterator(ev(9, 0, 1.0), ev(9, 30, 2.0)), s).toVector
    assert(out.isEmpty)
    assert(!s.exists, "late-only input must not create state")
  }

  test("pure timeout flush emits the buffered session and clears state") {
    val buf = StatefulSessions.SessionBuf(Seq(
      SessionEvent(1L, t(10, 0), 1.0), SessionEvent(1L, t(10, 10), 2.0)))
    val s = state(Some(buf), wmMs = ms(11, 50), timedOut = true)
    val out = StatefulSessions.watermarkStateFn(1L, Iterator.empty, s).toVector
    assert(out == Vector(UserSession(t(10, 0), t(10, 40), 1L, 2L, 3.0)))
    assert(s.isRemoved, "flushed state must be removed")
  }

  test("out-of-order events across batches merge into one session") {
    // batch 1 left an open session [10:20]; batch 2 delivers an EARLIER
    // event (10:05, still ahead of the watermark) — one merged session
    val buf = StatefulSessions.SessionBuf(Seq(SessionEvent(1L, t(10, 20), 4.0)))
    val s = state(Some(buf), wmMs = ms(10, 0), timedOut = false)
    val out = StatefulSessions.watermarkStateFn(1L, Iterator(ev(10, 5, 1.0)), s).toVector
    assert(out.isEmpty, "session still open — nothing closes at wm 10:00")
    assert(s.get.events.map(_.ts).sorted == Seq(t(10, 5), t(10, 20)),
      "early-but-on-time event must merge into the buffer")
    // timeout re-armed at last + gap
    assert(s.getTimeoutTimestampMs.get() == ms(10, 50))
  }

  test("a session the watermark already passed closes even without timeout flag") {
    val buf = StatefulSessions.SessionBuf(Seq(SessionEvent(1L, t(9, 0), 1.0)))
    val s = state(Some(buf), wmMs = ms(11, 0), timedOut = false)
    val out = StatefulSessions.watermarkStateFn(1L, Iterator(ev(11, 30, 2.0)), s).toVector
    assert(out == Vector(UserSession(t(9, 0), t(9, 30), 1L, 1L, 1.0)))
    assert(s.get.events.map(_.ts) == Seq(t(11, 30)), "new event stays buffered")
  }
}
