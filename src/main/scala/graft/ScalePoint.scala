package graft

import org.apache.spark.sql.SparkSession

/** One-off larger-scale throughput point for BENCH.md: the 20M-row bench
  * workload (synthetic image+caption metadata validation + uniqueness,
  * Bench.scaleThroughput) at an arbitrary row count — used to record a 10×
  * (200M-row) point so round-over-round comparisons don't live entirely at
  * sf0.1's noise floor.
  *
  * Usage: runMain graft.ScalePoint [rows] [cpus] [samples]
  * (defaults 200000000 32 2)
  */
object ScalePoint {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 200000000L
    val cpus = if (args.length > 1) args(1).toInt else 32
    val samples = if (args.length > 2) args(2).toInt else 2
    val spark = SparkSession
      .builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Bench.scaleThroughput(spark, math.min(n / 100, 2000000L), cpus) // codegen warmup
    val xs = (1 to samples).map(_ => Bench.scaleThroughput(spark, n, cpus))
    val best = xs.map(_._2).min
    println(
      s"""{"metric":"scale_point","rows":$n,"cpus":$cpus,"sec":$best,"rows_per_sec":${(n / best).toLong},"samples":[${xs
          .map(_._2)
          .mkString(",")}],"violations":${xs.head._3}}"""
    )
    spark.stop()
  }
}
