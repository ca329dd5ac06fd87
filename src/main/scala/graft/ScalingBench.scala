package graft

import org.apache.spark.sql.SparkSession

/** Scaling-efficiency evidence for the north rule's N → 4N criterion.
  *
  * Runs the SAME validation job (20M-row synthetic image-metadata table,
  * ~1% injected violations: row checks + image_id uniqueness, via
  * Bench.scaleThroughput) at two local parallelism levels, INTERLEAVED
  * several times in one process so host-load drift hits both levels equally,
  * and reports median throughput at each plus the scaling efficiency
  * (tpHigh / tpLow / (high/low)).
  *
  * Usage: runMain graft.ScalingBench [lowCpus] [highCpus] [rounds] [rows]
  * (defaults 8 32 3 20000000)
  */
object ScalingBench {
  def main(args: Array[String]): Unit = {
    val low = if (args.length > 0) args(0).toInt else 8
    val high = if (args.length > 1) args(1).toInt else 32
    val rounds = if (args.length > 2) args(2).toInt else 3
    val n = if (args.length > 3) args(3).toLong else 20000000L

    // GRAFT_SCALING_PIN=1: bind the WHOLE process (task threads, GC, shuffle
    // IO) to exactly `cpus` cores via taskset before each level. Without it,
    // local[2] still runs GC/IO threads on every host core — measured 2.7
    // cores of process CPU for shuffle-heavy modes — overstating the low
    // level's capacity and compressing the N→4N ratio. Pinning makes
    // "cluster of N cores" mean N cores, like a real N-core executor host.
    val pin = sys.env.get("GRAFT_SCALING_PIN").exists(_ == "1")
    def pinTo(cpus: Int): Unit = if (pin) {
      val p = new ProcessBuilder(
        "taskset", "-a", "-p", "-c", s"0-${cpus - 1}",
        ProcessHandle.current().pid().toString).redirectErrorStream(true).start()
      p.waitFor()
    }

    def session(cpus: Int): SparkSession = {
      pinTo(cpus)
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      val s = SparkSession
        .builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", "64") // fixed across levels: identical plan, only thread count varies
        .config("spark.sql.ansi.enabled", "false")
      // AQE's default 64MB coalesce target strangles reduce-side parallelism
      // at local data sizes; 4MB keeps all cores busy (no-op at real scale)
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      s
    }

    val nEmb = n / 10 // embedding suite: vectors are ~70B each vs 8B rows
    val nText = n / 40 // minhash suite: ~350B docs, 48 shingles + 32 hashes each
    // image suite: real PNG/JPEG decodes. Sized so the timed region is tens
    // of seconds at the LOW level — at 50k images the pass is ~3 s on 8
    // cores and fixed job overhead (~1.5 s: scheduling, footer reads, two
    // count jobs) eats the ratio (measured 0.68 "efficiency" that is pure
    // amortization, not decode scaling)
    val nImg = sys.env.get("GRAFT_SCALING_IMG").map(_.toLong).getOrElse(200000L)

    // warmup both codegen paths once
    {
      val s = session(low)
      Bench.scaleThroughput(s, math.min(n / 10, 2000000L), low)
      Bench.embeddingThroughput(s, math.min(nEmb / 10, 200000L))
      Bench.knnJoinThroughput(s, math.min(nEmb / 10, 200000L))
      Bench.textThroughput(s, math.min(nEmb / 10, 200000L))
      Bench.hammingKnnThroughput(s, math.min(nEmb / 10, 200000L))
      Bench.contaminationThroughput(s, math.min(nText / 10, 100000L))
      Bench.imageThroughput(s, nImg) // also materializes the stored table
      if (sys.env.get("GRAFT_SCALING_MODES").exists(_.contains("streaming")))
        Bench.streamingThroughput(s, nEmb) // full-size: materializes the doc table untimed
      if (sys.env.get("GRAFT_SCALING_MODES").exists(_.contains("linededup")))
        Bench.lineDedupThroughput(s, 100000)
      if (sys.env.get("GRAFT_SCALING_MODES").exists(_.contains("spandedup")))
        Bench.spanDedupThroughput(s, 100000)
      if (sys.env.get("GRAFT_SCALING_MODES").exists(_.contains("exactincr")))
        Bench.exactIncrementalThroughput(s, 1000000)
      if (sys.env.get("GRAFT_SCALING_MODES").exists(_.contains("imagecanonical")))
        Bench.imageCanonicalThroughput(s, 200000)
      if (sys.env.get("GRAFT_SCALING_MODES").exists(_.contains("semdedup")))
        Bench.semDedupThroughput(s, 200000)
      if (sys.env.get("GRAFT_SCALING_MODES").exists(_.contains("kmeans")))
        Bench.kmeansThroughput(s, 500000)
      if (sys.env.get("GRAFT_SCALING_MODES").exists(_.contains("bpe")))
        Bench.bpeThroughput(s, 500000)
      if (sys.env.get("GRAFT_SCALING_MODES").exists(_.contains("pq")))
        Bench.pqThroughput(s, n) // full-size: materializes the codes table untimed
      if (sys.env.get("GRAFT_SCALING_MODES").exists(_.contains("dsir")))
        Bench.dsirThroughput(s, 200000)
      if (sys.env.get("GRAFT_SCALING_MODES").exists(_.contains("editdist")))
        Bench.editDistThroughput(s, 500000)
      if (sys.env.get("GRAFT_SCALING_MODES").exists(_.contains("bpeapply")))
        Bench.bpeApplyThroughput(s, 200000)
      if (sys.env.get("GRAFT_SCALING_MODES").exists(_.contains("quantiles")))
        Bench.quantilesThroughput(s, 2000000)
      if (sys.env.get("GRAFT_SCALING_MODES").exists(_.contains("asof")))
        Bench.asOfThroughput(s, 1000000)
      if (sys.env.get("GRAFT_SCALING_MODES").exists(_.contains("rangejoin")))
        Bench.rangeJoinThroughput(s, 1000000)
      if (sys.env.get("GRAFT_SCALING_MODES").exists(_.contains("sessionize")))
        Bench.sessionizeThroughput(s, 1000000)
      if (sys.env.get("GRAFT_SCALING_MODES").exists(_.contains("rolling")))
        Bench.rollingThroughput(s, 1000000)
      if (sys.env.get("GRAFT_SCALING_MODES").exists(_.contains("funnel")))
        Bench.funnelThroughput(s, 1000000)
      if (sys.env.get("GRAFT_SCALING_MODES").exists(_.contains("setsim")))
        Bench.setSimThroughput(s, 200000)
      s.stop()
    }

    // (mode, cpus) -> samples; min-of-runs = least-contended sample, the
    // standard capacity measure on a host with noisy-neighbor CPU steal
    // (observed 2.6x spread between repeats of the identical job)
    val times = collection.mutable.Map[(String, Int), List[Double]]().withDefaultValue(Nil)
    // GRAFT_SCALING_MODES=text,knnjoin runs a subset (extra samples for one
    // workload without re-paying the whole suite)
    val modes = sys.env
      .get("GRAFT_SCALING_MODES")
      .map(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty))
      .getOrElse(Seq("rowchecks", "full", "salted", "embedding", "knnjoin", "text", "image"))
    for (_ <- 1 to rounds; cpus <- Seq(low, high); mode <- modes) {
      val s = session(cpus)
      val (_, sec, _) =
        if (mode == "embedding") Bench.embeddingThroughput(s, nEmb)
        else if (mode == "knnjoin") Bench.knnJoinThroughput(s, nEmb)
        // hammingknn/contamination are CHEAP per row — at nEmb/nText sizes
        // the timed region is seconds and the fixed job envelope fakes a
        // ~0.5 "efficiency" (the image-mode lesson, round 3): size them so
        // the LOW level runs tens of seconds
        else if (mode == "hammingknn") Bench.hammingKnnThroughput(s, n / 2)
        else if (mode == "contamination") Bench.contaminationThroughput(s, nEmb)
        else if (mode == "streaming") Bench.streamingThroughput(s, nEmb)
        else if (mode == "linededup") Bench.lineDedupThroughput(s, nEmb * 2)
        else if (mode == "spandedup") Bench.spanDedupThroughput(s, nEmb / 2)
        else if (mode == "exactincr") Bench.exactIncrementalThroughput(s, n)
        else if (mode == "imagecanonical") Bench.imageCanonicalThroughput(s, n)
        else if (mode == "semdedup") Bench.semDedupThroughput(s, n / 4)
        else if (mode == "kmeans") Bench.kmeansThroughput(s, n / 2)
        else if (mode == "bpe") Bench.bpeThroughput(s, n)
        else if (mode == "pq") Bench.pqThroughput(s, n)
        else if (mode == "dsir") Bench.dsirThroughput(s, n / 10)
        else if (mode == "editdist") Bench.editDistThroughput(s, n * 2)
        else if (mode == "bpeapply") Bench.bpeApplyThroughput(s, n / 2)
        else if (mode == "quantiles") Bench.quantilesThroughput(s, n * 20)
        else if (mode == "asof") Bench.asOfThroughput(s, n)
        else if (mode == "rangejoin") Bench.rangeJoinThroughput(s, n)
        else if (mode == "sessionize") Bench.sessionizeThroughput(s, n)
        else if (mode == "rolling") Bench.rollingThroughput(s, n)
        else if (mode == "funnel") Bench.funnelThroughput(s, n)
        else if (mode == "setsim") Bench.setSimThroughput(s, n / 2)
        else if (mode == "text") Bench.textThroughput(s, nText)
        else if (mode == "image") Bench.imageThroughput(s, nImg)
        else Bench.scaleThroughput(s, n, cpus,
          withUniqueness = mode != "rowchecks",
          uniquenessSalts = if (mode == "salted") 16 else 0)
      s.stop()
      times((mode, cpus)) = sec :: times((mode, cpus))
      System.err.println(s"[scaling] mode=$mode cpus=$cpus sec=$sec")
    }

    val parts = modes.map { mode =>
      val nm =
        if (mode == "text") nText
        else if (mode == "contamination" || mode == "streaming") nEmb
        else if (mode == "linededup") nEmb * 2
        else if (mode == "spandedup") nEmb / 2
        // batch sizing must mirror Bench.exactIncrementalThroughput's env
        // knob or the published rows/sec mis-scales by the divisor
        else if (mode == "exactincr")
          math.max(n / sys.env.get("GRAFT_EXACTINCR_BATCH_DIV").map(_.toLong).getOrElse(10L), 1L)
        else if (mode == "semdedup") n / 4
        else if (mode == "kmeans") n / 2
        else if (mode == "dsir") n / 10
        else if (mode == "editdist") n * 2
        else if (mode == "bpeapply") n / 2
        else if (mode == "quantiles") n * 20
        else if (mode == "image") nImg
        else if (mode == "embedding" || mode == "knnjoin") nEmb
        else if (mode == "hammingknn" || mode == "setsim") n / 2
        else n
      val tLow = times((mode, low)).min
      val tHigh = times((mode, high)).min
      val eff = (tLow / tHigh) / (high.toDouble / low)
      s""""$mode":{"sec_low":$tLow,"sec_high":$tHigh,"rows_per_sec_low":${(nm / tLow).toLong},"rows_per_sec_high":${(nm / tHigh).toLong},"efficiency":${"%.3f".format(eff)},"runs_low":${times((mode, low)).sorted.mkString("[", ",", "]")},"runs_high":${times((mode, high)).sorted.mkString("[", ",", "]")}}"""
    }
    println(
      s"""{"metric":"scaling_efficiency","low_cpus":$low,"high_cpus":$high,"rows":$n,${parts.mkString(",")}}"""
    )
  }
}
