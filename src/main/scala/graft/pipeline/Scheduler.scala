package graft.pipeline

import java.time.{Duration, LocalDate, LocalDateTime}
import java.time.format.DateTimeFormatter

/** The reference's timer-trigger semantics as a plain utility
  * (rq_tradein_report/__init__.py + function.json):
  *
  *  - T1: a fixed daily fire time (cron `0 0 6 * * *` — 06:00);
  *  - T2: each run's extraction window is `[yesterday, today]` — a 1-day
  *    lookback re-reading yesterday so late-arriving updates are caught
  *    by the MERGE (`__init__.py:12-19`);
  *  - T3: missed-fire detection (`myTimer.past_due`, `__init__.py:9-10`);
  *  - F8: the date arithmetic producing the window bounds
  *    (`today - timedelta(days=1)`).
  *
  * Pure functions over an injected clock — the actual scheduling loop
  * belongs to whatever invokes the pipeline (cron, Airflow, a streaming
  * trigger); these encode the reference's *semantics* so every caller
  * computes the same windows.
  */
object Scheduler {

  private val DateFmt = DateTimeFormatter.ofPattern("yyyy-MM-dd")

  /** F8 + T2: the daily overlapping extraction window — StartDate =
    * yesterday, StopDate = today (`__init__.py:12-19`), plus the
    * reference's fixed report parameters sans anything
    * deployment-specific. */
  def windowParams(today: LocalDate): Map[String, String] = Map(
    "StartDate" -> today.minusDays(1).format(DateFmt),
    "StopDate"  -> today.format(DateFmt))

  /** T1: the next fire instant at `fireHour` (daily) strictly after
    * `now`. */
  def nextFire(now: LocalDateTime, fireHour: Int = 6): LocalDateTime = {
    val todayFire = now.toLocalDate.atTime(fireHour, 0)
    if (now.isBefore(todayFire)) todayFire else todayFire.plusDays(1)
  }

  /** T3: a fire is past due when it is being processed more than `grace`
    * after its scheduled instant (the platform's `past_due` flag,
    * log-only in the reference). */
  def pastDue(scheduled: LocalDateTime, processingAt: LocalDateTime,
      grace: Duration = Duration.ofMinutes(1)): Boolean =
    Duration.between(scheduled, processingAt).compareTo(grace) > 0

  /** Fires missed between two processing instants (e.g. across an
    * outage): every scheduled instant in (lastProcessed, now]. */
  def missedFires(lastProcessed: LocalDateTime, now: LocalDateTime,
      fireHour: Int = 6): Seq[LocalDateTime] =
    Iterator.iterate(nextFire(lastProcessed, fireHour))(_.plusDays(1))
      .takeWhile(!_.isAfter(now)).toSeq
}
