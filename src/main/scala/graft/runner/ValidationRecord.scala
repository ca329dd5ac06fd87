package graft.runner

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.report.{RunStatus, ValidationReport}
import graft.schema.TableSchema

/** Run-level validation record + state machine — the engine's equivalent of
  * the reference's mutable `Validation` row (reference: model.py:27-36 —
  * id/resource_id/status/created/finished/report/error — with upsert-reset
  * semantics in jobs.py:30-41 and logic.py:120-131, and the
  * created → running → success|failure|error lifecycle documented at
  * logic.py:154-162).
  *
  * Storage is an append-only parquet log with LATEST-WINS reads (one row per
  * transition, keyed by resource_id; `latest` takes the row with the highest
  * `updated` stamp) — the immutable-log re-imagining of the reference's
  * single mutable SQL row, which is what an Iceberg/warehouse deployment
  * actually wants: the full transition history is the audit trail, and
  * "upsert" is a read-side projection instead of a write-side mutation.
  */
object ValidationRecord {

  final case class Record(
      id: String,
      resource_id: String,
      status: String,
      created: Long,
      finished: Option[Long],
      report_json: Option[String],
      error: Option[String],
      updated: Long
  )

  /** Legal transitions (logic.py:154-162): created → running →
    * success | failure | error; a re-run RESETS any terminal record back to
    * created (logic.py:120-131). */
  private val legal: Map[String, Set[String]] = Map(
    RunStatus.Created -> Set(RunStatus.Running),
    RunStatus.Running -> Set(RunStatus.Success, RunStatus.Failure, RunStatus.Error),
    RunStatus.Success -> Set(RunStatus.Created),
    RunStatus.Failure -> Set(RunStatus.Created),
    RunStatus.Error   -> Set(RunStatus.Created)
  )

  final case class IllegalTransition(from: String, to: String)
      extends RuntimeException(s"illegal validation-record transition: $from -> $to")

  def transition(r: Record, to: String, now: Long): Record = {
    if (!legal(r.status).contains(to)) throw IllegalTransition(r.status, to)
    val reset = to == RunStatus.Created
    r.copy(
      id = if (reset) java.util.UUID.randomUUID().toString else r.id,
      status = to,
      created = if (reset) now else r.created,
      finished = if (legal.keySet -- Set(RunStatus.Created, RunStatus.Running) contains to) Some(now) else None,
      report_json = if (reset) None else r.report_json,
      error = if (reset) None else r.error,
      updated = now
    )
  }

  def create(resourceId: String, now: Long = System.currentTimeMillis()): Record =
    Record(java.util.UUID.randomUUID().toString, resourceId, RunStatus.Created, now, None, None, None, now)

  // ---- persistence: append-only log, latest-wins ----

  def append(spark: SparkSession, dir: String, r: Record): Unit = {
    import spark.implicits._
    Seq(r).toDF().write.mode(SaveMode.Append).parquet(dir)
  }

  /** Latest record per resource (the reference's one-mutable-row view). */
  def latest(spark: SparkSession, dir: String, resourceId: String): Option[Record] = {
    if (!new java.io.File(dir).exists()) return None
    import spark.implicits._
    spark.read
      .parquet(dir)
      .filter(col("resource_id") === resourceId)
      .orderBy(col("updated").desc)
      .limit(1)
      .as[Record]
      .collect()
      .headOption
  }

  /** Full lifecycle driver, mirroring run_validation_job (jobs.py:27-51):
    * upsert-reset to created → running → run the engine → terminal status
    * with report, any throwable trapped into status `error` with the error
    * payload and a `{"valid": false}` report (jobs.py:45-48). Every
    * transition is appended to the record log. */
  // strictly monotone wall-clock stamps: latest-wins reads must not tie when
  // two transitions land in the same millisecond
  private val lastStamp = new java.util.concurrent.atomic.AtomicLong(0L)
  private def monotonicNow(): Long =
    lastStamp.updateAndGet(prev => math.max(prev + 1, System.currentTimeMillis()))

  def runRecorded(
      spark: SparkSession,
      recordDir: String,
      resourceId: String,
      df: org.apache.spark.sql.DataFrame,
      schema: TableSchema,
      cfg: ValidationConfig
  ): (Record, Option[ValidationReport]) = {
    def now() = monotonicNow()
    val base = latest(spark, recordDir, resourceId) match {
      case Some(prev) if prev.status != RunStatus.Created =>
        // terminal or stale-running record: reset (re-run semantics)
        val r = if (legal(prev.status).contains(RunStatus.Created)) transition(prev, RunStatus.Created, now())
                else create(resourceId, now()) // stuck in running: fresh record
        append(spark, recordDir, r); r
      case Some(prev) => prev
      case None =>
        val r = create(resourceId, now()); append(spark, recordDir, r); r
    }
    val running = transition(base, RunStatus.Running, now())
    append(spark, recordDir, running)
    try {
      val (report, status) = ValidationRunner.run(df, schema, cfg)
      val done = running.copy(status = status, finished = Some(now()),
        report_json = Some(report.toJson), updated = now())
      append(spark, recordDir, done)
      (done, Some(report))
    } catch {
      case e: Exception =>
        val failed = running.copy(status = RunStatus.Error, finished = Some(now()),
          report_json = Some("""{"valid": false}"""), error = Some(e.getMessage), updated = now())
        append(spark, recordDir, failed)
        (failed, None)
    }
  }
}
