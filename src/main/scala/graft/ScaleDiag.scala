package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Stage-level diagnostic for the N→4N scaling modes: runs ONE bench
  * workload at one pinned parallelism level with a stage-metrics listener
  * and prints, per stage, wall time vs summed executor run/CPU time,
  * shuffle bytes + fetch-wait + write time, spill and GC — the numbers
  * that decide WHERE a sub-bar efficiency ratio comes from (CPU work
  * growing with the level? shuffle I/O flat across levels because both
  * share one host disk? seams between stages?).
  *
  * Usage: runMain graft.ScaleDiag [mode] [rows] [cpus] [shufflePartitions]
  * (defaults contamination 20000000 8 64; pin with GRAFT_SCALING_PIN=1
  * like ScalingBench — binds the whole process via taskset.)
  */
object ScaleDiag {
  def main(args: Array[String]): Unit = {
    val mode = if (args.length > 0) args(0) else "contamination"
    val n = if (args.length > 1) args(1).toLong else 20000000L
    val cpus = if (args.length > 2) args(2).toInt else 8
    val shufflePartitions = if (args.length > 3) args(3).toInt else 64
    if (sys.env.get("GRAFT_SCALING_PIN").exists(_ == "1")) {
      new ProcessBuilder(
        "taskset", "-a", "-p", "-c", s"0-${cpus - 1}",
        ProcessHandle.current().pid().toString).inheritIO().start().waitFor()
    }
    val spark = SparkSession
      .builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    case class St(id: Int, name: String, tasks: Int, wallMs: Long, runMs: Long,
        cpuMs: Long, gcMs: Long, shReadMb: Long, fetchWaitMs: Long,
        shWriteMb: Long, shWriteMs: Long, spillMb: Long)
    val stages = collection.mutable.ArrayBuffer.empty[St]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo; val m = i.taskMetrics
        stages.synchronized {
          stages += St(
            i.stageId,
            i.name.takeWhile(_ != '\n').take(60),
            i.numTasks,
            (for { s <- i.submissionTime; c <- i.completionTime } yield c - s).getOrElse(-1L),
            m.executorRunTime,
            m.executorCpuTime / 1000000L,
            m.jvmGCTime,
            m.shuffleReadMetrics.totalBytesRead >> 20,
            m.shuffleReadMetrics.fetchWaitTime,
            m.shuffleWriteMetrics.bytesWritten >> 20,
            m.shuffleWriteMetrics.writeTime / 1000000L,
            (m.memoryBytesSpilled + m.diskBytesSpilled) >> 20)
        }
      }
    })

    def run(rows: Long): (Long, Double, Long) = mode match {
      case "hammingknn"     => Bench.hammingKnnThroughput(spark, rows)
      case "imagecanonical" => Bench.imageCanonicalThroughput(spark, rows)
      case "contamination"  => Bench.contaminationThroughput(spark, rows)
      case "linededup"      => Bench.lineDedupThroughput(spark, rows)
      case "setsim"         => Bench.setSimThroughput(spark, rows)
      case m                 => sys.error(s"unknown mode $m")
    }
    run(math.min(n / 100, 2000000L)) // codegen warmup
    stages.synchronized(stages.clear())
    val (work, sec, res) = run(n)

    val all = stages.synchronized(stages.toList).sortBy(_.id)
    all.foreach { s =>
      println(
        s"""{"stage":${s.id},"tasks":${s.tasks},"wall_ms":${s.wallMs},"run_ms":${s.runMs},""" +
          s""""cpu_ms":${s.cpuMs},"gc_ms":${s.gcMs},"sh_read_mb":${s.shReadMb},""" +
          s""""fetch_wait_ms":${s.fetchWaitMs},"sh_write_mb":${s.shWriteMb},""" +
          s""""sh_write_ms":${s.shWriteMs},"spill_mb":${s.spillMb},"name":"${s.name}"}""")
    }
    val stageWall = all.map(_.wallMs).sum
    println(
      s"""{"metric":"scale_diag","mode":"$mode","rows":$n,"work":$work,"cpus":$cpus,""" +
        s""""sec":$sec,"result":$res,"stage_wall_ms":$stageWall,""" +
        s""""seam_ms":${(sec * 1000).toLong - stageWall},""" +
        s""""cpu_ms_total":${all.map(_.cpuMs).sum},"run_ms_total":${all.map(_.runMs).sum},""" +
        s""""sh_read_mb_total":${all.map(_.shReadMb).sum},"sh_write_mb_total":${all.map(_.shWriteMb).sum},""" +
        s""""fetch_wait_ms_total":${all.map(_.fetchWaitMs).sum},"sh_write_ms_total":${all.map(_.shWriteMs).sum},""" +
        s""""gc_ms_total":${all.map(_.gcMs).sum},"spill_mb_total":${all.map(_.spillMb).sum}}""")
    spark.stop()
  }
}
