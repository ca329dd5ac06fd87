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
}
