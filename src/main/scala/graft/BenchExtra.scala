package graft

import org.apache.spark.sql.SparkSession

/** Diagnostic benchmark main for the optimization rounds (guide §1.4):
  * NOT part of the driver protocol — `Bench` stays the frozen harness.
  *
  * Usage:
  *   SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 \
  *     sbt "runMain graft.BenchExtra q01 q142" [env knobs below]
  *
  * For every query whose name starts with one of the args it
  *   - writes `plans/r06/<query>_<tag>.txt` with explain("formatted")
  *     (tag from SPARK_GRAFT_PLAN_TAG, default "explain"),
  *   - times N samples (SPARK_GRAFT_BENCH_SAMPLES, default 3) of the
  *     noop-sink write (computes every column, discards output) and of the
  *     frozen harness's `count()` action, printing min + samples.
  * Jobs are labelled with setJobDescription so event logs are readable. */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
      .config("spark.sql.files.maxPartitionBytes", String.valueOf(2 * 1024 * 1024))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    spark.range(1000000).selectExpr("sum(id)").collect()
    try {
      graft.images.SyntheticImages.materialized(spark, SparkEntry.imageCount(sfDir))
      SparkEntry.lshStore(spark, sfDir)
      SparkEntry.ivfStore(spark, sfDir)
      SparkEntry.knnStore(spark, sfDir)
      SparkEntry.knnIvfStore(spark, sfDir)
    } catch { case _: Throwable => () }

    val samples = sys.env.getOrElse("SPARK_GRAFT_BENCH_SAMPLES", "3").toInt
    val tag = sys.env.getOrElse("SPARK_GRAFT_PLAN_TAG", "explain")
    val noPlans = sys.env.get("SPARK_GRAFT_NO_PLANS").contains("1")
    val prefixes = if (args.isEmpty) Seq("") else args.toSeq
    val planDir = new java.io.File("plans/r06")
    planDir.mkdirs()

    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => prefixes.exists(name.startsWith) }
      .foreach { case (name, fn) =>
        if (!noPlans) {
          val plan = try {
            val qe = fn(spark, sfDir).queryExecution
            qe.explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
          } catch { case e: Throwable => s"explain failed: $e" }
          val out = new java.io.PrintWriter(new java.io.File(planDir, s"${name}_$tag.txt"))
          try out.write(plan) finally out.close()
        }
        def time(action: org.apache.spark.sql.DataFrame => Unit, label: String): Unit = {
          var failed: Option[Throwable] = None
          val xs = (1 to samples).map { i =>
            spark.sparkContext.setJobDescription(s"$name/$label/$i")
            val t0 = System.nanoTime()
            try action(fn(spark, sfDir))
            catch { case e: Throwable => failed = Some(e) }
            (System.nanoTime() - t0) / 1e9
          }
          spark.sparkContext.setJobDescription(null)
          // a failing query must never masquerade as a fast one
          failed match {
            case Some(e) => println(s"[extra] $name $label FAILED: $e")
            case None =>
              println(f"[extra] $name $label min=${xs.min}%.3f samples=${xs.map(x => f"$x%.3f").mkString(",")}")
          }
        }
        time(_.write.format("noop").mode("overwrite").save(), "noop")
        time(_.count(): Unit, "count")
      }
    spark.stop()
  }
}
