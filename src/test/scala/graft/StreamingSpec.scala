package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.runner.{ValidationConfig, ValidationRunner}
import graft.schema._

/** The stateless check suite composes with Structured Streaming:
  * readStream → violations → writeStream (continuous-ingest admission
  * monitoring; stateful checks remain batch per SURVEY §2.9). */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("streaming violations: per-batch row checks through MemoryStream") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, Double)]
    val df = input.toDF().toDF("_rid", "cat", "amt")
    val schema = TableSchema(
      Seq(
        Field("cat", constraints = FieldConstraints(enumVals = Some(Seq("a", "b")))),
        Field("amt", "number", constraints = FieldConstraints(minimum = Some(0)))
      )
    )
    val viols = ValidationRunner.streamingViolations(
      df, schema,
      ValidationConfig(rowNumberCol = "_rid", options = ValidationOptions(checks = Seq("schema")))
    )
    assert(viols.isStreaming)
    val q = viols
      .writeStream
      .format("memory")
      .queryName("graft_stream_viols")
      .outputMode("append")
      .start()
    try {
      input.addData((2L, "a", 1.0), (3L, "z", 2.0), (4L, "b", -5.0))
      q.processAllAvailable()
      input.addData((5L, "z", -1.0))
      q.processAllAvailable()
      val got = spark
        .table("graft_stream_viols")
        .select("row_number", "code")
        .collect()
        .map(r => (r.getLong(0), r.getString(1)))
        .sortBy(t => (t._1, t._2))
        .toSeq
      assert(
        got == Seq(
          (3L, "enumerable-constraint"),
          (4L, "minimum-constraint"),
          (5L, "enumerable-constraint"),
          (5L, "minimum-constraint")
        )
      )
    } finally q.stop()
  }

  test("windowed violation rates: watermarked event-time windows finalize in append mode") {
    import graft.streaming.StreamingChecks
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, java.sql.Timestamp, String)]
    val df = input.toDF().toDF("_rid", "ts", "cat")
    val schema = TableSchema(
      Seq(Field("cat", constraints = FieldConstraints(enumVals = Some(Seq("a", "b")))))
    )
    val rates = StreamingChecks.windowedViolationRates(
      df, schema,
      ValidationConfig(rowNumberCol = "_rid", options = ValidationOptions(checks = Seq("schema"))),
      tsCol = "ts", windowDuration = "1 minute", watermarkDelay = "0 seconds"
    )
    assert(rates.isStreaming)
    val q = rates
      .selectExpr("CAST(window.start AS STRING) AS w", "code", "violations")
      .writeStream.format("memory").queryName("graft_stream_rates").outputMode("append").start()
    try {
      def ts(s: String) = java.sql.Timestamp.valueOf(s)
      // window [10:00, 10:01): two enum violations; [10:01, 10:02): one
      input.addData(
        (1L, ts("2026-01-01 10:00:05"), "z"),
        (2L, ts("2026-01-01 10:00:40"), "z"),
        (3L, ts("2026-01-01 10:00:50"), "a"), // valid
        (4L, ts("2026-01-01 10:01:10"), "z")
      )
      q.processAllAvailable()
      // the watermark updates at batch END: batch 2 carries it past window 1,
      // batch 3 (empty-of-violations) triggers emission of window 2
      input.addData((5L, ts("2026-01-01 10:03:00"), "a"))
      q.processAllAvailable()
      input.addData((6L, ts("2026-01-01 10:05:00"), "a"))
      q.processAllAvailable()
      val got = spark.table("graft_stream_rates")
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).sortBy(_._1).toSeq
      assert(got == Seq(
        ("2026-01-01 10:00:00", "enumerable-constraint", 2L),
        ("2026-01-01 10:01:00", "enumerable-constraint", 1L)
      ))
    } finally q.stop()
  }

  test("windowed sketch drift: shifted window alerts, matching window does not") {
    import graft.streaming.StreamingChecks
    implicit val sqlCtx = spark.sqlContext
    // baseline: uniform-ish values 0..999 (batch sketch, serialized bytes —
    // what a SketchDrift snapshot holds)
    val baseline = spark.range(1000).select(col("id").cast("double").as("v"))
      .agg(graft.exprs.SketchAgg.kll(col("v"))).head().getAs[Array[Byte]](0)
    val input = MemoryStream[(java.sql.Timestamp, Double)]
    val df = input.toDF().toDF("ts", "v")
    val drift = StreamingChecks.windowedSketchDrift(
      df, col("v"), "ts", baseline,
      windowDuration = "1 minute", watermarkDelay = "0 seconds", psiThreshold = 0.2)
    assert(drift.isStreaming)
    val q = drift
      .selectExpr("CAST(window.start AS STRING) AS w", "n", "psi", "ks", "drifted")
      .writeStream.format("memory").queryName("graft_stream_drift").outputMode("append").start()
    try {
      def ts(s: String) = java.sql.Timestamp.valueOf(s)
      // window 1: same distribution as baseline; window 2: shifted far right
      input.addData((0 until 200).map(i => (ts("2026-01-01 10:00:30"), (i * 5).toDouble)): _*)
      q.processAllAvailable()
      input.addData((0 until 200).map(i => (ts("2026-01-01 10:01:30"), 5000.0 + i)): _*)
      q.processAllAvailable()
      input.addData((ts("2026-01-01 10:05:00"), 1.0)) // advance watermark past both
      q.processAllAvailable()
      val got = spark.table("graft_stream_drift")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(4))).sortBy(_._1).toSeq
      assert(got == Seq(
        ("2026-01-01 10:00:00", 200L, false),
        ("2026-01-01 10:01:00", 200L, true)
      ))
      // psi of the shifted window is large, matching window small
      val psis = spark.table("graft_stream_drift")
        .collect().map(r => (r.getString(0), r.getDouble(2))).toMap
      assert(psis("2026-01-01 10:00:00") < 0.1)
      assert(psis("2026-01-01 10:01:00") > 1.0)
    } finally q.stop()
  }

  test("stateful streaming uniqueness: first occurrence wins ACROSS batches") {
    import graft.streaming.StreamingChecks
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val df = input.toDF().toDF("_rid", "key")
    val viols = StreamingChecks.streamingUniqueViolations(df, Seq("key"), "_rid")
    assert(viols.isStreaming)
    val q = viols.writeStream.format("memory").queryName("graft_stream_uni").outputMode("append").start()
    try {
      input.addData((1L, "x"), (2L, "x"), (3L, "y"))
      q.processAllAvailable()
      input.addData((4L, "x"), (5L, "y"), (6L, "z"), (7L, null))
      q.processAllAvailable()
      val got = spark.table("graft_stream_uni")
        .collect().map(r => (r.getLong(1), r.getString(0))).sortBy(_._1).toSeq
      // 2 duplicates x in batch 1; 4 (x) and 5 (y) duplicate ACROSS batches;
      // 6 (z) first; 7 (null key) skipped
      assert(got == Seq(
        (2L, "unique-constraint"),
        (4L, "unique-constraint"),
        (5L, "unique-constraint")
      ))
    } finally q.stop()
  }

  test("streaming exact dedup: first occurrence wins across batches, (id, kept_id) like batch dedup") {
    import graft.streaming.StreamingChecks
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val df = input.toDF().toDF("doc_id", "text")
    val out = StreamingChecks.streamingExactDedup(df, col("text"), col("doc_id"))
    assert(out.isStreaming)
    val q = out.writeStream.format("memory").queryName("graft_stream_dedup").outputMode("append").start()
    try {
      input.addData((1L, "the quick brown fox"), (2L, "another doc body"), (3L, "The  Quick Brown FOX"))
      q.processAllAvailable()
      input.addData((4L, "the quick brown fox"), (5L, "a fresh third doc"))
      q.processAllAvailable()
      val got = spark.table("graft_stream_dedup")
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      // 3 dups 1 within its batch (fingerprint is case/whitespace-normalised);
      // 4 dups 1 ACROSS batches; 2 and 5 are keepers
      assert(got == Seq((3L, 1L), (4L, 1L)))
    } finally q.stop()
  }

  test("streaming contamination: stateless row-local overlap against the benchmark set") {
    import graft.streaming.StreamingChecks
    implicit val sqlCtx = spark.sqlContext
    val bench = Seq((100L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val input = MemoryStream[(Long, String)]
    val df = input.toDF().toDF("doc_id", "text")
    val out = StreamingChecks.streamingContaminated(
      df, col("text"), col("doc_id"), bench, col("text"), minOverlap = 2)
    assert(out.isStreaming)
    val q = out.writeStream.format("memory").queryName("graft_stream_contam").outputMode("append").start()
    try {
      input.addData(
        (1L, "alpha beta gamma delta epsilon zeta"), // full overlap
        (2L, "alpha beta gamma unrelated tail here"), // 1 shared 3-gram — under threshold
        (3L, "totally different words in this doc"))
      q.processAllAvailable()
      input.addData((4L, "prefix words then alpha beta gamma delta epsilon zeta"))
      q.processAllAvailable()
      val got = spark.table("graft_stream_contam")
        .collect().map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
      assert(got == Seq((1L, 4), (4L, 4)))
    } finally q.stop()
  }

  test("streaming ops replay on BATCH frames: same semantics, no stream needed (q58/q59 path)") {
    import graft.streaming.StreamingChecks
    val docs = Seq(
      (1L, "the quick brown fox"),
      (2L, "another doc body"),
      (3L, "The  Quick Brown FOX  "), // dups 1 under normalization
      (4L, "the quick brown fox"), // dups 1 exactly
      (5L, "alpha beta gamma delta epsilon zeta")
    ).toDF("doc_id", "text")
    val dedup = StreamingChecks.streamingExactDedup(docs, col("text"), col("doc_id"))
    assert(!dedup.isStreaming)
    assert(dedup.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      == Seq((3L, 1L), (4L, 1L)))

    val bench = Seq((100L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val contam = StreamingChecks.streamingContaminated(
      docs, col("text"), col("doc_id"), bench, col("text"), minOverlap = 2)
    assert(!contam.isStreaming)
    assert(contam.collect().map(r => (r.getLong(0), r.getInt(1))).toSeq == Seq((5L, 4)))
  }

  test("streamingContaminated fails FAST on an oversized benchmark, naming the batch path") {
    import graft.streaming.StreamingChecks
    val docs = Seq((1L, "some words here")).toDF("doc_id", "text")
    val bench = Seq((100L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val ex = intercept[IllegalArgumentException] {
      StreamingChecks.streamingContaminated(
        docs, col("text"), col("doc_id"), bench, col("text"),
        minOverlap = 2, maxBenchmarkShingles = 2L)
    }
    assert(ex.getMessage.contains("contaminatedDocs"), s"must redirect to the batch operator: ${ex.getMessage}")
  }
}
