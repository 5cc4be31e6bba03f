package graft

import java.time.{Instant, ZoneId}
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.QuartzCron

/** Quartz cron schedule parity with the reference job's documented
  * expressions (resources/sdp_job.job.yml:11-19): daily `0 0 6 * * ?`,
  * hourly `0 0 * * * ?`, weekly `0 0 6 ? * MON`, evaluated in the job's
  * `timezone_id`. */
class QuartzCronSpec extends AnyFunSuite {

  private val LA = ZoneId.of("America/Los_Angeles")
  private val UTC = ZoneId.of("UTC")
  private def at(s: String): Instant = Instant.parse(s)
  private def next(expr: String, after: String, zone: ZoneId = UTC): String =
    QuartzCron.parse(expr).nextAfter(at(after), zone).get.toString

  test("daily 6 AM PT — the reference default — honors the zone and DST") {
    // PST (UTC-8): 6 AM local = 14:00 UTC
    assert(next("0 0 6 * * ?", "2024-01-15T00:00:00Z", LA) ==
      "2024-01-15T14:00:00Z")
    // PDT (UTC-7): 6 AM local = 13:00 UTC
    assert(next("0 0 6 * * ?", "2024-07-15T00:00:00Z", LA) ==
      "2024-07-15T13:00:00Z")
    // already past today's fire → tomorrow
    assert(next("0 0 6 * * ?", "2024-01-15T15:00:00Z", LA) ==
      "2024-01-16T14:00:00Z")
  }

  test("hourly top-of-hour; a fire time exactly at `after` is NOT re-fired") {
    assert(next("0 0 * * * ?", "2024-03-01T10:30:00Z") ==
      "2024-03-01T11:00:00Z")
    assert(next("0 0 * * * ?", "2024-03-01T11:00:00Z") ==
      "2024-03-01T12:00:00Z")
  }

  test("weekly MON 6 AM — quartz day names and 1=SUN numbering") {
    // 2024-01-15 is a Monday
    assert(next("0 0 6 ? * MON", "2024-01-13T00:00:00Z") ==
      "2024-01-15T06:00:00Z")
    // numeric: quartz 2 = MON
    assert(next("0 0 6 ? * 2", "2024-01-13T00:00:00Z") ==
      "2024-01-15T06:00:00Z")
    // 1 = SUN (2024-01-14)
    assert(next("0 0 6 ? * 1", "2024-01-13T00:00:00Z") ==
      "2024-01-14T06:00:00Z")
  }

  test("lists, ranges, steps, month names, seconds field") {
    assert(next("30 5,35 9-10 * * ?", "2024-06-01T09:06:00Z") ==
      "2024-06-01T09:35:30Z")
    assert(next("0 */15 8 * * ?", "2024-06-01T08:16:00Z") ==
      "2024-06-01T08:30:00Z")
    // value/step = from value to field max
    assert(next("0 20/25 12 * * ?", "2024-06-01T12:21:00Z") ==
      "2024-06-01T12:45:00Z")
    assert(next("0 0 0 1 MAR,SEP ?", "2024-04-01T00:00:00Z") ==
      "2024-09-01T00:00:00Z")
    // dom restricted, dow must be ? — fires on the 29th of each month
    assert(next("0 0 12 29 * ?", "2024-01-30T00:00:00Z") ==
      "2024-02-29T12:00:00Z")
  }

  test("optional year field bounds the schedule; exhausted → None") {
    assert(next("0 0 6 1 1 ? 2026", "2024-06-01T00:00:00Z") ==
      "2026-01-01T06:00:00Z")
    assert(QuartzCron.parse("0 0 6 1 1 ? 2024")
      .nextAfter(at("2024-06-01T00:00:00Z"), UTC).isEmpty)
  }

  test("DST fall-back overlap: nextAfter stays STRICTLY after — the " +
      "repeated local hour never re-fires back-to-back") {
    // America/Los_Angeles 2024-11-03: 01:30 PDT (08:30Z) repeats as
    // 01:30 PST (09:30Z). After the FIRST occurrence, the earlier-offset
    // resolution of the same local time is ≤ after; the schedule must
    // advance to the later-offset occurrence instead of re-firing.
    val schedule = "0 30 1 * * ?"
    val first = next(schedule, "2024-11-03T00:00:00Z", LA)
    assert(first == "2024-11-03T08:30:00Z") // 01:30 PDT
    // Quartz fire-once semantics: the repeated 01:30 local time does NOT
    // re-fire at its second (PST) occurrence — next fire is tomorrow
    val second = next(schedule, first, LA)
    assert(second == "2024-11-04T09:30:00Z")
    // but when `after` lands INSIDE the overlap's second pass (01:00 PST
    // = 09:00Z), the earlier-offset resolution of 01:30 precedes `after`
    // (08:30Z); the later-offset occurrence (09:30Z) must fire instead of
    // violating the strictly-after contract (the back-to-back re-fire bug)
    assert(next(schedule, "2024-11-03T09:00:00Z", LA) ==
      "2024-11-03T09:30:00Z")
    // monotonicity through the whole overlap at a finer cadence
    var t = at("2024-11-03T07:59:00Z")
    (1 to 5).foreach { _ =>
      val n = QuartzCron.parse("0 */20 1 * * ?").nextAfter(t, LA).get
      assert(n.isAfter(t), s"$n not after $t")
      t = n
    }
  }

  test("parse failures are loud: field count, L/W/#, dom+dow both set, " +
      "stray ?, bad values") {
    Seq(
      "0 0 6 * *",            // 5 fields
      "0 0 6 L * ?",          // L
      "0 0 6 ? * 6#3",        // #
      "0 0 6 15W * ?",        // W
      "0 0 6 15 * MON",       // dom AND dow restricted
      "0 ? 6 * * ?",          // ? outside dom/dow
      "0 0 25 * * ?",         // hour out of range
      "0 0 6 * FOO ?"         // bad month name
    ).foreach { e =>
      assertThrows[IllegalArgumentException](QuartzCron.parse(e))
    }
  }
}
