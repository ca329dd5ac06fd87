package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query on SPARK_GRAFT_SF_DIR at the
  * parallelism given by SPARK_GRAFT_CPUS, prints ONE JSON line.
  *
  * The same binary at two parallelism levels (SPARK_GRAFT_CPUS=8 vs 32) on
  * identical input is the sandbox proxy for the north rule's N vs 4N executor
  * scaling-efficiency criterion (see BASELINE.md).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.ansi.enabled", "false")
      // local proxy for many-block tables at scale: without this the ~10MB
      // test parquet files become ONE scan partition and nothing parallelises
      .config("spark.sql.files.maxPartitionBytes", String.valueOf(2 * 1024 * 1024))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // JVM/codegen warmup outside the timed region
    spark.range(1000000).selectExpr("sum(id)").collect()
    try SparkEntry.queries.head._2(spark, sfDir).count()
    catch { case _: Throwable => () }

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try fn(spark, sfDir).count()
      catch { case _: Throwable => () }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // headline throughput: validated lineitem rows/sec on the multi-check
    // single-pass query (the engine's core operation)
    val liRows =
      try spark.read.parquet(s"$sfDir/lineitem.parquet").count()
      catch { case _: Throwable => 0L }
    val mcTime = results.find(_._1 == "q14_multicheck_summary").map(_._2).getOrElse(Double.NaN)
    val rps = if (mcTime > 0) liRows / mcTime else 0.0

    // image+caption validation throughput on a STORED table (the target
    // workload): generation/encode is setup, not validation — materialize the
    // synthetic table to parquet once, then time the full validation pass
    // (decode + dims/fmt + caption + uniqueness) reading it back.
    val imgN = if (sfDir.contains("0.1")) 50000L else if (sfDir.contains("0.01")) 10000L else 2000L
    val imgPath = s"${System.getProperty("java.io.tmpdir")}/graft_bench_images_$imgN"
    if (!new java.io.File(imgPath, "_SUCCESS").exists())
      graft.images.SyntheticImages
        .generateWithId(spark, imgN)
        .write.mode("overwrite").parquet(imgPath)
    val stored = spark.read.parquet(imgPath)
    val t0 = System.nanoTime()
    val imgViol = graft.images.ImageChecks
      .violations(stored, org.apache.spark.sql.functions.col("row_id"))
      .count()
    val metaViol = {
      import org.apache.spark.sql.functions.col
      graft.runner.ValidationRunner
        .plan(
          stored.drop("bytes").withColumnRenamed("row_id", "_rid"),
          graft.schema.TableSchema(
            Seq(graft.schema.Field("image_id", constraints = graft.schema.FieldConstraints(unique = true)))
          ),
          graft.runner.ValidationConfig(rowNumberCol = "_rid")
        )
        .violations
        .count()
    }
    val imgTime = (System.nanoTime() - t0) / 1e9
    val imgRps = imgN / imgTime

    println(
      s"""{"metric":"total","value":$total,"unit":"sec","rows_per_sec_multicheck":$rps,"image_rows":$imgN,"image_validation_sec":$imgTime,"image_rows_per_sec":$imgRps,"image_violations":${imgViol + metaViol},"cpus":$cpus,"queries":$qs,"sf":"$sfDir"}"""
    )
    spark.stop()
  }
}
