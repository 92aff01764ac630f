package graft.engine

import java.sql.Timestamp
import java.time.{DayOfWeek, LocalDate, LocalDateTime}
import java.time.temporal.TemporalAdjusters

/** Stats-range date algebra: converts a named range into a concrete
  * [from, to) window anchored at the **max listened_at present in the
  * data**, not the wall clock — the reference derives ranges from the
  * data's own high-water mark so a lagging import still produces the right
  * windows (stats/__init__.py:150-218, range_selector.py:18-26).
  *
  * Semantics per range (mirroring the reference's dateutil arithmetic):
  *   - `this_week` starts the Monday of the anchor's week; `week` is the
  *     previous complete Monday–Sunday week.
  *   - `this_month`/`month`, `this_year`/`year` likewise (calendar-aligned
  *     current vs previous complete period).
  *   - `quarter` is the previous complete calendar quarter,
  *     `half_yearly` the previous complete half-year.
  *   - `all_time` spans epoch → anchor.
  * All windows are half-open [from, to).
  */
object StatsRange {

  val names: Seq[String] = Seq(
    "this_week", "week", "this_month", "month", "quarter",
    "half_yearly", "this_year", "year", "all_time")

  /** [from, to) for the named range, anchored at `maxListenedAt`. */
  def window(range: String, maxListenedAt: Timestamp): (Timestamp, Timestamp) = {
    val anchor = maxListenedAt.toLocalDateTime
    val day = anchor.toLocalDate
    val next = anchor.plusSeconds(1) // to-bound includes the anchor listen

    def ts(d: LocalDate): Timestamp = Timestamp.valueOf(d.atStartOfDay)

    range match {
      case "this_week" =>
        (ts(day.`with`(TemporalAdjusters.previousOrSame(DayOfWeek.MONDAY))),
          Timestamp.valueOf(next))
      case "week" =>
        val thisMonday = day.`with`(
          TemporalAdjusters.previousOrSame(DayOfWeek.MONDAY))
        (ts(thisMonday.minusWeeks(1)), ts(thisMonday))
      case "this_month" =>
        (ts(day.withDayOfMonth(1)), Timestamp.valueOf(next))
      case "month" =>
        val first = day.withDayOfMonth(1)
        (ts(first.minusMonths(1)), ts(first))
      case "quarter" =>
        val qStartMonth = ((day.getMonthValue - 1) / 3) * 3 + 1
        val thisQ = LocalDate.of(day.getYear, qStartMonth, 1)
        (ts(thisQ.minusMonths(3)), ts(thisQ))
      case "half_yearly" =>
        val hStartMonth = if (day.getMonthValue <= 6) 1 else 7
        val thisH = LocalDate.of(day.getYear, hStartMonth, 1)
        (ts(thisH.minusMonths(6)), ts(thisH))
      case "this_year" =>
        (ts(day.withDayOfYear(1)), Timestamp.valueOf(next))
      case "year" =>
        val first = day.withDayOfYear(1)
        (ts(first.minusYears(1)), ts(first))
      case "all_time" =>
        (new Timestamp(0L), Timestamp.valueOf(next))
      case other =>
        throw new IllegalArgumentException(s"unknown stats range: $other")
    }
  }
}
