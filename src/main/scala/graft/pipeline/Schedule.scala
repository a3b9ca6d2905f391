package graft.pipeline

import java.time.{Instant, ZoneId, ZonedDateTime}

/** Cron-cadence scheduling for the batch job graph — the reference's
  * per-table schedule definitions (reference:
  * dagster_code/schedules/all_schedules.py:12-47 — 5-field cron
  * expressions like "40 1 * * *" / "2 7-18/3 * * *" with an explicit
  * execution timezone, one per extraction/mart job).
  *
  * DRIVER-side control flow only, like [[Dag]]: nothing here sleeps
  * or spawns threads — the host's loop (a cron daemon, a workflow
  * runner, or the streaming twin EventStream for continuous loads)
  * asks "what is due in (lastRun, now]?" and hands the due sub-graph
  * to [[Dag.run]]. Time is always passed IN, so schedules are
  * deterministic and unit-testable; evaluation is in the spec's
  * declared timezone (the reference pins Africa/Lagos).
  */
object Schedule {

  /** A job bound to a 5-field cron cadence (minute hour day-of-month
    * month day-of-week), evaluated in `zone`.
    */
  final case class CronSpec(job: String, cron: String,
                            zone: ZoneId = ZoneId.of("UTC")) {
    private[pipeline] val parsed = Cron.parse(cron)
    /** True when the cron matches the wall-clock minute containing `t`. */
    def matches(t: Instant): Boolean =
      Cron.matches(parsed, t.atZone(zone))
  }

  /** Minimal 5-field cron; each field accepts `*`, `N`, `A-B`,
    * lists (`A,B`), and step forms (`A-B/S`, asterisk/S). Standard
    * convention: when BOTH day-of-month and day-of-week are
    * restricted, a time matching EITHER fires. Sunday is 0 (and 7).
    */
  private[pipeline] object Cron {
    final case class Parsed(minutes: Set[Int], hours: Set[Int],
                            dom: Set[Int], months: Set[Int], dow: Set[Int],
                            domAny: Boolean, dowAny: Boolean)

    private def field(expr: String, min: Int, max: Int): Set[Int] =
      expr.split(',').toSeq.flatMap { part =>
        val (rangePart, step) = part.split('/') match {
          case Array(r)    => (r, 1)
          case Array(r, s) => (r, s.toInt)
          case _ => throw new IllegalArgumentException(s"bad cron field: $part")
        }
        require(step >= 1, s"bad cron step: $part")
        val (lo, hi) = rangePart match {
          case "*" => (min, max)
          case r if r.contains('-') =>
            val Array(a, b) = r.split('-'); (a.toInt, b.toInt)
          // "N/S" starts at N and steps to the field max (cron convention)
          case n => val v = n.toInt; if (step == 1) (v, v) else (v, max)
        }
        require(lo >= min && hi <= max && lo <= hi, s"cron field out of range: $part")
        lo to hi by step
      }.toSet

    def parse(cron: String): Parsed = {
      val f = cron.trim.split("\\s+")
      require(f.length == 5, s"expected 5 cron fields, got '$cron'")
      Parsed(
        minutes = field(f(0), 0, 59),
        hours   = field(f(1), 0, 23),
        dom     = field(f(2), 1, 31),
        months  = field(f(3), 1, 12),
        // 0-7 with both 0 and 7 meaning Sunday → normalize to 0-6
        dow     = field(f(4), 0, 7).map(_ % 7),
        domAny  = f(2) == "*",
        dowAny  = f(4) == "*")
    }

    def matches(p: Parsed, t: ZonedDateTime): Boolean = {
      val dayOk =
        if (p.domAny && p.dowAny) true
        else {
          val domHit = p.dom.contains(t.getDayOfMonth)
          val dowHit = p.dow.contains(t.getDayOfWeek.getValue % 7)
          if (p.domAny) dowHit
          else if (p.dowAny) domHit
          else domHit || dowHit // standard cron OR when both restricted
        }
      p.minutes.contains(t.getMinute) && p.hours.contains(t.getHour) &&
        p.months.contains(t.getMonthValue) && dayOk
    }
  }

  /** Jobs with at least one matching cron minute in `(lastRun, now]` —
    * the catch-up window a polling loop hands in. A job that matched
    * several minutes in the window is still due ONCE (the reference's
    * loaders are idempotent delete+insert, so a missed tick folds into
    * the next run — the README's idempotency strategy). The scan is
    * minute-granular and bounded by the window length; a daily poll
    * over an hourly cron does 1440 cheap checks.
    */
  def due(specs: Seq[CronSpec], lastRun: Instant, now: Instant): Seq[String] = {
    require(!now.isBefore(lastRun), "now must be >= lastRun")
    val firstMinute = lastRun.truncatedTo(java.time.temporal.ChronoUnit.MINUTES)
      .plusSeconds(60)
    specs.filter { s =>
      Iterator.iterate(firstMinute)(_.plusSeconds(60))
        .takeWhile(!_.isAfter(now))
        .exists(s.matches)
    }.map(_.job).distinct
  }

  /** The next instant at-or-after `from` when `spec` fires (minute
    * granularity), or None within `horizonDays`. For "when does the
    * 1:40am Lagos extract run next?" introspection and test pinning.
    */
  def nextFire(spec: CronSpec, from: Instant,
               horizonDays: Int = 366): Option[Instant] = {
    val start = from.truncatedTo(java.time.temporal.ChronoUnit.MINUTES)
    Iterator.iterate(start)(_.plusSeconds(60))
      .take(horizonDays * 1440)
      .find(spec.matches)
  }

  /** One scheduler step: run the sub-graph of nodes whose spec is due
    * in `(lastRun, now]`, in dependency order with [[Dag.run]]'s
    * retry/skip semantics. Dependencies on nodes that are NOT due are
    * dropped — each reference job runs on its own cadence against
    * whatever its upstream last materialized (Dagster schedule
    * semantics; cross-job freshness is [[graft.operators.Quality.freshness]]'s
    * job, not the scheduler's). Nodes without a spec never run here.
    */
  def step(nodes: Seq[Dag.Node], specs: Seq[CronSpec],
           lastRun: Instant, now: Instant,
           maxRetries: Int = 0): Map[String, Dag.Status] = {
    val dueJobs = due(specs, lastRun, now).toSet
    val sub = nodes.filter(n => dueJobs.contains(n.name))
      .map(n => n.copy(deps = n.deps.filter(dueJobs.contains)))
    Dag.run(sub, maxRetries)
  }
}
