package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.runner.{Lineage, ValidationConfig, ValidationRunner}
import graft.schema._

/** Per-partition lineage/checkpoint semantics: stable bucket ids, batch
  * commits, resume-by-metadata-filter. */
class LineageSpec extends SparkSpec {
  import spark.implicits._

  private def fc = FieldConstraints()
  private def tmp(): String = Files.createTempDirectory("graft_lineage").toString

  test("stable partition id is a content property, invariant to parallelism") {
    val df1 = (1L to 1000L).map(i => (i, s"k$i")).toDF("_rid", "k").repartition(2)
    val df2 = (1L to 1000L).map(i => (i, s"k$i")).toDF("_rid", "k").repartition(13)
    val p1 = df1.select(col("k"), Lineage.stablePartitionId(col("k"), 16)).collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    val p2 = df2.select(col("k"), Lineage.stablePartitionId(col("k"), 16)).collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(p1 == p2)
    assert(p1.values.toSet.subsetOf((0 until 16).toSet))
  }

  test("resumable run: verdicts per partition, violations attributed to buckets") {
    val lineageDir = tmp() + "/lineage"
    val df = (1L to 500L).map(i => (i, if (i % 50 == 0) "" else s"v$i")).toDF("_rid", "a")
    val schema = TableSchema(Seq(Field("a", constraints = fc.copy(required = true))))
    val cfg = ValidationConfig(rowNumberCol = "_rid", options = ValidationOptions(checks = Seq("schema")))
    val res = Lineage.runResumable(df, schema, cfg, col("_rid"), numPartitions = 8, batchSize = 3, lineageDir, "run1")
    assert(res.verdicts.size == 8)
    assert(res.resumedPartitions.isEmpty)
    assert(res.verdicts.map(_.row_count).sum == 500)
    assert(res.totalViolations == 10) // every 50th row
    assert(!res.valid)
    // violations live in the buckets their rows hash to
    val badPids = (1L to 500L)
      .filter(_ % 50 == 0)
      .map(i => i) // key is _rid
    assert(res.verdicts.count(!_.valid) > 0)
  }

  test("resume: completed partitions are skipped, totals match a fresh run") {
    val lineageDir = tmp() + "/lineage"
    val df = (1L to 400L).map(i => (i, if (i % 40 == 0) "" else s"v$i")).toDF("_rid", "a")
    val schema = TableSchema(Seq(Field("a", constraints = fc.copy(required = true))))
    val cfg = ValidationConfig(rowNumberCol = "_rid", options = ValidationOptions(checks = Seq("schema")))

    // first (interrupted) run: pretend only partitions 0-4 committed by
    // seeding the lineage table with their verdicts from a full dry run
    val dry = Lineage.runResumable(df, schema, cfg, col("_rid"), 10, 10, tmp() + "/dry", "run1")
    val firstFive = dry.verdicts.filter(_.partition_id < 5)
    Lineage.appendVerdicts(spark, lineageDir, firstFive)

    // resumed run processes ONLY partitions 5-9
    val resumed = Lineage.runResumable(df, schema, cfg, col("_rid"), 10, 2, lineageDir, "run1")
    assert(resumed.resumedPartitions == Set(0, 1, 2, 3, 4))
    assert(resumed.verdicts.map(_.partition_id).toSet == Set(5, 6, 7, 8, 9))
    // lineage table now has all 10 partitions, totals equal the dry run
    val all = spark.read.parquet(lineageDir)
    assert(all.count() == 10)
    val totalViols = all.agg(sum("violation_count")).head().getLong(0)
    assert(totalViols == dry.totalViolations)
    val totalRows = all.agg(sum("row_count")).head().getLong(0)
    assert(totalRows == 400)
  }

  test("a different run id starts fresh in the same lineage table") {
    val lineageDir = tmp() + "/lineage"
    val df = (1L to 100L).map(i => (i, s"v$i")).toDF("_rid", "a")
    val schema = TableSchema(Seq(Field("a")))
    val cfg = ValidationConfig(rowNumberCol = "_rid")
    val r1 = Lineage.runResumable(df, schema, cfg, col("_rid"), 4, 4, lineageDir, "runA")
    val r2 = Lineage.runResumable(df, schema, cfg, col("_rid"), 4, 4, lineageDir, "runB")
    assert(r1.verdicts.size == 4 && r2.verdicts.size == 4)
    assert(r2.resumedPartitions.isEmpty)
    val overview = Lineage.statusOverview(spark, lineageDir).collect()
    assert(overview.length == 2)
    assert(overview.forall(_.getLong(1) == 4)) // partitions per run
  }

  test("violations sink: appended per batch, partitioned by bucket") {
    val lineageDir = tmp() + "/lineage"
    val violDir = tmp() + "/violations"
    val df = (1L to 200L).map(i => (i, if (i <= 20) "" else s"v$i")).toDF("_rid", "a")
    val schema = TableSchema(Seq(Field("a", constraints = fc.copy(required = true))))
    val cfg = ValidationConfig(rowNumberCol = "_rid", options = ValidationOptions(checks = Seq("schema")))
    val res = Lineage.runResumable(df, schema, cfg, col("_rid"), 4, 2, lineageDir, "run1", Some(violDir))
    val written = spark.read.parquet(violDir)
    assert(written.count() == 20)
    assert(written.columns.contains("partition_id"))
    assert(written.filter(col("code") =!= "required-constraint").count() == 0)
  }

  test("sink write is idempotent: a batch replayed after a crash-before-verdict never duplicates") {
    val lineageDir = tmp() + "/lineage"
    val violDir = tmp() + "/violations"
    val df = (1L to 200L).map(i => (i, if (i <= 20) "" else s"v$i")).toDF("_rid", "a")
    val schema = TableSchema(Seq(Field("a", constraints = fc.copy(required = true))))
    val cfg = ValidationConfig(rowNumberCol = "_rid", options = ValidationOptions(checks = Seq("schema")))
    // simulate the crash window: violations written, verdicts NOT committed
    // (run with a throwaway lineage dir so nothing is marked done)...
    Lineage.runResumable(df, schema, cfg, col("_rid"), 4, 4, tmp() + "/crashed", "run1", Some(violDir))
    // ...then the resumed run reprocesses every batch against the SAME sink
    val res = Lineage.runResumable(df, schema, cfg, col("_rid"), 4, 2, lineageDir, "run1", Some(violDir))
    val written = spark.read.parquet(violDir).filter(col("run_id") === "run1")
    assert(written.count() == 20) // dynamic partition overwrite, not append
    assert(res.totalViolations == 20) // verdict counts == durable sink counts
    // distinct run ids do not clobber each other's partitions
    Lineage.runResumable(df, schema, cfg, col("_rid"), 4, 4, tmp() + "/l2", "run2", Some(violDir))
    assert(spark.read.parquet(violDir).count() == 40)
    assert(spark.read.parquet(violDir).filter(col("run_id") === "run1").count() == 20)
  }

  test("ingestPartitioned + runResumableStored: batch scans are PARTITION-PRUNED to the batch's buckets") {
    val base = tmp()
    val tableDir = base + "/table"
    val df = (1L to 400L).map(i => (i, if (i % 40 == 0) "" else s"v$i")).toDF("_rid", "a")
    Lineage.ingestPartitioned(df, col("_rid"), numPartitions = 8, tableDir)
    assert(Lineage.storedNumPartitions(tableDir) == 8)

    // the physical layout: one directory per bucket, and a batch filter
    // lists ONLY the batch's files — the resume-path promise runResumable's
    // computed _pid cannot keep
    val stored = spark.read.parquet(tableDir)
    val batchScan = stored.filter(col("_pid").isin(0, 3))
    val plan = batchScan.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && "_pid#\\d+ IN \\(0,3\\)".r.findFirstIn(plan).isDefined,
      s"batch filter must be a partition filter:\n${plan.take(600)}")
    batchScan.collect()
    val scan = batchScan.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.head
    val scannedFiles = scan.metrics("numFiles").value
    val batchFilesOnDisk = Seq(0, 3).map { p =>
      new java.io.File(tableDir, s"_pid=$p").listFiles().count(_.getName.endsWith(".parquet"))
    }.sum
    val allFilesOnDisk = (0 until 8).map { p =>
      new java.io.File(tableDir, s"_pid=$p").listFiles().count(_.getName.endsWith(".parquet"))
    }.sum
    assert(scannedFiles == batchFilesOnDisk && batchFilesOnDisk < allFilesOnDisk,
      s"batch scan must read only the batch's files: read $scannedFiles, batch has $batchFilesOnDisk of $allFilesOnDisk")

    // end-to-end: stored resume produces the same verdicts as the computed-
    // _pid path on the same data
    val schema = TableSchema(Seq(Field("a", constraints = fc.copy(required = true))))
    val cfg = ValidationConfig(rowNumberCol = "_rid", options = ValidationOptions(checks = Seq("schema")))
    val storedRes = Lineage.runResumableStored(spark, tableDir, schema, cfg,
      batchSize = 3, base + "/lineage_stored", "run1")
    val computedRes = Lineage.runResumable(df, schema, cfg, col("_rid"), 8, 3, base + "/lineage_computed", "run1")
    def norm(r: Lineage.ResumableResult) =
      r.verdicts.map(v => (v.partition_id, v.row_count, v.violation_count, v.valid)).sortBy(_._1)
    assert(norm(storedRes) == norm(computedRes))
    assert(storedRes.totalViolations == 10)

    // resume skips committed buckets and still prunes
    val resumed = Lineage.runResumableStored(spark, tableDir, schema, cfg,
      batchSize = 8, base + "/lineage_stored", "run1")
    assert(resumed.verdicts.isEmpty && resumed.resumedPartitions == (0 until 8).toSet)
  }

  test("per-partition row-count scan is column-pruned to the bucket key") {
    val df = (1L to 100L).map(i => (i, s"v$i", i * 2.0)).toDF("_rid", "a", "b")
    val tmpDir = tmp() + "/t"
    df.write.parquet(tmpDir)
    val stored = spark.read.parquet(tmpDir)
    val withPid = stored.withColumn("_pid", Lineage.stablePartitionId(col("_rid"), 8))
    val agg = withPid.groupBy(col("_pid")).agg(count(lit(1)).as("rows"))
    val plan = agg.queryExecution.executedPlan.toString
    val readSchema = "ReadSchema: struct<([^>]*)>".r.findFirstMatchIn(plan).map(_.group(1)).getOrElse("?")
    assert(readSchema == "_rid:bigint", s"expected key-only scan, got $readSchema")
  }
}
