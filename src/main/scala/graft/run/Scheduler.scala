package graft.run

import java.nio.file.{Files, Path, Paths}
import java.time.LocalDate

/** Orchestrator scheduling semantics for the reference DAG
  * (dags/earthquake_etl_dag.py:80-131): `@daily` schedule with catchup,
  * modeled engine-side since no Airflow runs in this environment.
  *
  * Semantics preserved:
  *  - `@daily` + `catchup=True`: every logical date in [start, today) runs
  *    exactly once, oldest first (the backfill order).
  *  - `catchup=False`: only the most recent complete interval runs.
  *  - Exactly-once per logical date via a success-marker ledger
  *    (`<ledger>/<date>/_SUCCESS`, written only AFTER the run returns) —
  *    a crashed or failed run leaves its date pending, so the next tick
  *    retries it; a completed date is never re-run.
  *  - Run independence (`depends_on_past=False`, the reference default): a
  *    failing date does not block later dates in the same catchup sweep.
  *
  * Per-task retries within a run are [[PipelineMain.withRetries]] — the two
  * layers compose exactly as Airflow's task retries + DAG-run scheduling.
  */
object Scheduler {

  final case class SweepResult(ran: Seq[LocalDate], failed: Seq[LocalDate])

  /** Logical dates still needing a run. A date's interval is complete only
    * when the date is strictly before `today` (Airflow runs an interval
    * after it closes). */
  def pendingDates(start: LocalDate, today: LocalDate,
                   done: LocalDate => Boolean, catchup: Boolean): Seq[LocalDate] = {
    if (!today.isAfter(start)) return Seq.empty
    val all = Iterator.iterate(start)(_.plusDays(1)).takeWhile(_.isBefore(today)).toSeq
    (if (catchup) all else all.takeRight(1)).filterNot(done)
  }

  private def marker(ledgerDir: String, date: LocalDate): Path =
    Paths.get(ledgerDir, date.toString, "_SUCCESS")

  def isDone(ledgerDir: String, date: LocalDate): Boolean =
    Files.exists(marker(ledgerDir, date))

  /** One scheduler tick: run every pending logical date through `runFor`,
    * marking success only for runs that return normally. Failed dates are
    * reported and stay pending for the next tick. */
  def sweep(ledgerDir: String, start: LocalDate, today: LocalDate,
            catchup: Boolean = true)(runFor: LocalDate => Unit): SweepResult = {
    val pending = pendingDates(start, today, isDone(ledgerDir, _), catchup)
    val (ok, bad) = pending.partition { d =>
      try { runFor(d); true }
      catch {
        case e: Throwable =>
          System.err.println(s"[scheduler] run $d failed: ${e.getMessage}")
          false
      }
    }
    ok.foreach { d =>
      val m = marker(ledgerDir, d)
      Files.createDirectories(m.getParent)
      Files.writeString(m, "")
    }
    SweepResult(ok, bad)
  }
}

/** Backfill entrypoint: the 4-task pipeline under `@daily` catchup
  * scheduling. Each logical date gets its own lake prefix (the
  * date-partitioned runs an orchestrator produces), with per-task retries
  * inside each run. Config via env (X3): GRAFT_LAKE_DIR,
  * GRAFT_SCHEDULE_START (ISO date), GRAFT_TODAY (ISO date, injectable for
  * determinism), GRAFT_CATCHUP (true|false). */
object BackfillMain {
  def main(args: Array[String]): Unit = {
    val lake = sys.env.getOrElse("GRAFT_LAKE_DIR",
      java.nio.file.Files.createTempDirectory("graft_lake").toString)
    val start = LocalDate.parse(sys.env.getOrElse("GRAFT_SCHEDULE_START", "2024-01-01"))
    val today = LocalDate.parse(sys.env.getOrElse("GRAFT_TODAY",
      LocalDate.now(java.time.ZoneOffset.UTC).toString))
    val catchup = sys.env.getOrElse("GRAFT_CATCHUP", "true").toBoolean
    val spark = graft.GraftSession.local()
    try {
      val res = Scheduler.sweep(s"$lake/_scheduler", start, today, catchup) { date =>
        val runDir = s"$lake/runs/$date"
        val bronze = s"$runDir/bronze/raw_earthquakes.json"
        PipelineMain.withRetries(s"fetch@$date") {
          graft.ingest.UsgsGeoJson.writeBronze(bronze)
        }
        val silver = PipelineMain.withRetries(s"silver@$date") {
          graft.jobs.BronzeToSilver.run(spark, bronze, s"$runDir/silver")
        }
        PipelineMain.withRetries(s"gold@$date") {
          graft.jobs.SilverToGold.run(spark, s"$runDir/silver", s"$runDir/gold")
        }
        println(s"[backfill] $date complete (${silver.count()} silver rows)")
      }
      println(s"[backfill] ran=${res.ran.size} failed=${res.failed.size}")
    } finally spark.stop()
  }
}
