package graft.runner

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.schema.TableSchema

/** Per-partition lineage, metrics, and checkpoint/resume.
  *
  * The reference keeps ONE mutable validation record per resource
  * (model.py:27-46, upserted in jobs.py:30-41). At 10^12 rows a single
  * verdict is useless for restarts, so the engine generalises it: the run is
  * split into `numPartitions` STABLE buckets (`pmod(xxhash64(key), P)` — a
  * table-content property, NOT `spark_partition_id()`, which changes with
  * parallelism), processed in driver-side batches; each finished batch
  * atomically appends its per-partition verdict rows (pass/fail, row count,
  * violation count) to a lineage table. A crashed run re-reads the lineage
  * table and processes only the partitions with no verdict — resume is a
  * metadata filter, the engine never re-validates finished buckets.
  *
  * Storage is Parquet-append behind this API (no Iceberg runtime jar in the
  * sandbox — see BASELINE.md); swapping in an Iceberg table is a MERGE/append
  * through the same call surface.
  */
object Lineage {

  /** Stable content-derived partition id: survives cluster resizes,
    * repartitioning, and input-split changes. */
  def stablePartitionId(key: Column, numPartitions: Int): Column =
    pmod(xxhash64(key), lit(numPartitions)).cast("int")

  final case class Verdict(
      run_id: String,
      partition_id: Int,
      row_count: Long,
      violation_count: Long,
      valid: Boolean,
      finished_at: Long
  )

  def completedPartitions(spark: SparkSession, lineageDir: String, runId: String): Set[Int] = {
    if (!new java.io.File(lineageDir).exists()) return Set.empty
    spark.read
      .parquet(lineageDir)
      .filter(col("run_id") === runId)
      .select("partition_id")
      .distinct()
      .collect()
      .map(_.getInt(0))
      .toSet
  }

  def appendVerdicts(spark: SparkSession, lineageDir: String, verdicts: Seq[Verdict]): Unit = {
    import spark.implicits._
    verdicts.toDF().write.mode(SaveMode.Append).parquet(lineageDir)
  }

  final case class ResumableResult(
      runId: String,
      verdicts: Seq[Verdict],
      /** partitions skipped because an earlier run already committed them */
      resumedPartitions: Set[Int]
  ) {
    def valid: Boolean = verdicts.forall(_.valid)
    def totalViolations: Long = verdicts.map(_.violation_count).sum
  }

  /** Resumable validation run over an ARBITRARY DataFrame.
    *
    * Execution shape per batch (here the `_pid` filter does NOT prune the
    * scan — it is a computed column, so every batch re-reads the table;
    * choose `batchSize = numPartitions` (one batch) unless you need finer
    * crash granularity). At real scale, ingest once with
    * [[ingestPartitioned]] and resume with [[runResumableStored]]: `_pid`
    * is then a PHYSICAL partition column and every batch filter prunes at
    * the file listing (PartitionFilters), reading only its own buckets.
    *  1. the checks plan runs ONCE — its violations go straight to the sink
    *     (when `violationsDir` is set) or straight into one bounded
    *     per-partition aggregation (when not). No persist, no second run of
    *     the expensive check suite;
    *  2. per-partition ROW counts are a groupBy on the bucket key — that
    *     scan is column-pruned to the single key column;
    *  3. violation counts are read back from the (tiny) written sink, so the
    *     numbers in the lineage table are the numbers durably on disk;
    *  4. the sink write is IDEMPOTENT: dynamic partition overwrite on
    *     (run_id, partition_id) — a batch that crashed after writing but
    *     before the verdict commit is simply rewritten on resume, never
    *     duplicated. Verdict append remains the atomic commit point.
    *
    * @param key           stable-bucket key (e.g. image_id)
    * @param numPartitions lineage buckets (metadata granularity, independent
    *                      of Spark task parallelism)
    * @param batchSize     buckets per driver commit — the unit of progress a
    *                      crash can lose
    * @param violationsDir when set, each batch also writes its violation
    *                      rows (partitioned by run_id, partition_id for
    *                      pruned re-reads)
    */
  def runResumable(
      df: DataFrame,
      schema: TableSchema,
      cfg: ValidationConfig,
      key: Column,
      numPartitions: Int,
      batchSize: Int,
      lineageDir: String,
      runId: String,
      violationsDir: Option[String] = None
  ): ResumableResult = {
    val withPid = df.withColumn("_pid", stablePartitionId(key, numPartitions))
    runBatches(withPid, schema, cfg, numPartitions, batchSize, lineageDir, runId, violationsDir)
  }

  private def numPartitionsFile(path: String) = new java.io.File(path, "_graft_num_partitions.txt")

  /** Ingest `df` as a parquet table PHYSICALLY PARTITIONED by the stable
    * bucket id (directory per `_pid`) — the scale path for resumable runs:
    * [[runResumableStored]] batch filters then hit PartitionFilters, so a
    * resume reads ONLY the pending buckets' files instead of re-scanning the
    * whole table per batch (the honest cost [[runResumable]]'s scaladoc
    * documents for computed `_pid`). One shuffle-free write pass; the bucket
    * count is persisted next to the data (underscore file — invisible to the
    * parquet reader). */
  def ingestPartitioned(df: DataFrame, key: Column, numPartitions: Int, path: String): Unit = {
    df.withColumn("_pid", stablePartitionId(key, numPartitions))
      .write
      .mode(SaveMode.Overwrite)
      .partitionBy("_pid")
      .parquet(path)
    java.nio.file.Files.writeString(numPartitionsFile(path).toPath, numPartitions.toString)
  }

  def storedNumPartitions(path: String): Int =
    java.nio.file.Files.readString(numPartitionsFile(path).toPath).trim.toInt

  /** Resumable validation over an [[ingestPartitioned]] table: identical
    * semantics to [[runResumable]], but `_pid` is a PHYSICAL partition
    * column, so each batch's `isin` filter prunes at the file listing —
    * the batch scan reads only its own buckets' directories. */
  def runResumableStored(
      spark: SparkSession,
      path: String,
      schema: TableSchema,
      cfg: ValidationConfig,
      batchSize: Int,
      lineageDir: String,
      runId: String,
      violationsDir: Option[String] = None
  ): ResumableResult = {
    val numPartitions = storedNumPartitions(path)
    runBatches(spark.read.parquet(path), schema, cfg, numPartitions, batchSize, lineageDir, runId, violationsDir)
  }

  /** Shared batch loop: `withPid` must carry an int `_pid` bucket column
    * (computed for [[runResumable]], physical for [[runResumableStored]]). */
  private def runBatches(
      withPid: DataFrame,
      schema: TableSchema,
      cfg: ValidationConfig,
      numPartitions: Int,
      batchSize: Int,
      lineageDir: String,
      runId: String,
      violationsDir: Option[String]
  ): ResumableResult = {
    val spark = withPid.sparkSession
    val done = completedPartitions(spark, lineageDir, runId)
    val pending = (0 until numPartitions).filterNot(done.contains)
    val cfgPid = cfg.copy(partitionIdCol = Some("_pid"))

    val verdicts = Seq.newBuilder[Verdict]
    pending.grouped(batchSize).foreach { batch =>
      val sub = withPid.filter(col("_pid").isin(batch: _*))
      val result = ValidationRunner.plan(sub, schema, cfgPid)

      // column-pruned count scan: reads only the bucket-key column
      val rowCounts = sub
        .groupBy(col("_pid"))
        .agg(count(lit(1)).as("rows"))
        .collect()
        .map(r => r.getInt(0) -> r.getLong(1))
        .toMap

      val violCounts: Map[Int, Long] = violationsDir match {
        case Some(dir) =>
          result.violations
            .withColumn("run_id", lit(runId))
            .write
            .mode(SaveMode.Overwrite)
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("run_id", "partition_id")
            .parquet(dir)
          if (!new java.io.File(dir).exists()) Map.empty[Int, Long] // zero-violation batch, nothing written yet
          else spark.read
            .parquet(dir)
            .filter(col("run_id") === runId && col("partition_id").isin(batch: _*))
            .groupBy(col("partition_id"))
            .agg(count(lit(1)).as("viols"))
            .collect()
            .map(r => r.getInt(0) -> r.getLong(1))
            .toMap
        case None =>
          result.violations
            .groupBy(col("partition_id"))
            .agg(count(lit(1)).as("viols"))
            .collect()
            .map(r => r.getInt(0) -> r.getLong(1))
            .toMap
      }

      val now = System.currentTimeMillis()
      val batchVerdicts = batch.map { p =>
        val v = violCounts.getOrElse(p, 0L)
        Verdict(runId, p, rowCounts.getOrElse(p, 0L), v, v == 0, now)
      }
      // atomic commit point: verdicts appear only after the batch finished
      appendVerdicts(spark, lineageDir, batchVerdicts)
      verdicts ++= batchVerdicts
    }
    ResumableResult(runId, verdicts.result(), done)
  }

  /** Run-summary aggregations over the lineage table — the engine's
    * equivalent of the reference's status-overview report
    * (commands.py:254-383). */
  def statusOverview(spark: SparkSession, lineageDir: String): DataFrame =
    spark.read
      .parquet(lineageDir)
      .groupBy(col("run_id"))
      .agg(
        count(lit(1)).as("partitions"),
        sum(when(col("valid"), 1).otherwise(0)).as("valid_partitions"),
        sum(col("row_count")).as("rows"),
        sum(col("violation_count")).as("violations"),
        max(col("finished_at")).as("last_update")
      )
}
