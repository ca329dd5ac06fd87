package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Quantifies the residual recall loss of `Dedup.minHashPairs`' hot-bucket
  * path on a boilerplate-heavy corpus — the measurement VERDICT r4 asked
  * for: the operator truncates buckets past `maxBucket` to a two-band
  * prefix-extension plus a bounded deterministic sample, which is
  * bounded-loss, not exact; this probe runs the trade against BRUTE-FORCE
  * ground truth at a size where the hot path is live (every band's modal
  * bucket far exceeds maxBucket) and reports:
  *  - pair recall (verified pairs found / brute-force pairs),
  *  - CLUSTER-MEMBERSHIP recall (docs that still land in the dedup
  *    component — the metric a canonicalization pipeline actually consumes:
  *    one surviving pair per doc suffices),
  *  - uncapped-banding recall (same banding, no cap) to separate banding
  *    loss from hot-path loss,
  *  - the `graft.minhash.hot` / `graft.minhash.hotrecall` beacons of the
  *    capped run (the in-job evidence channel).
  *
  * Fixture: `family` docs share 50 base tokens with ONE doc-unique token
  * each (pairwise jaccard ≈ 0.78–0.88, all above the 0.7 threshold, all
  * DISTINCT shingle sets — so nothing collapses pre-banding and every
  * band's modal bucket holds ~77% of the family), plus `fillers` unique
  * background docs.
  *
  * Usage: runMain graft.HotProbe [family] [fillers] [cpus]
  * (defaults 4000 100000 32)
  */
object HotProbe {
  def main(args: Array[String]): Unit = {
    val family = if (args.length > 0) args(0).toInt else 4000
    val fillers = if (args.length > 1) args(1).toLong else 100000L
    val cpus = if (args.length > 2) args(2).toInt else 32
    val threshold = 0.7
    val spark = SparkSession
      .builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val fam = family
    val textU = udf { (id: Long) =>
      def tok(seed: Long): String = {
        var z = seed + 0x9e3779b97f4a7c15L
        z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
        z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
        "w" + java.lang.Long.toUnsignedString((z ^ (z >>> 31)) % 50000)
      }
      if (id < fam) {
        val toks = Array.tabulate(50)(i => tok(1000000L + i))
        toks((1 + id % 48).toInt) = s"zz$id"
        toks.mkString(" ")
      } else Array.tabulate(50)(i => tok(id * 131L + i)).mkString(" ")
    }
    val corpus = spark.range(0, fam + fillers, 1, 64)
      .select(col("id"), textU(col("id")).as("text"))
      .localCheckpoint(true)

    // brute-force ground truth over the family block (the only block with
    // pairs; the capped/uncapped runs see the full corpus)
    val jac = udf { (a: Seq[Long], b: Seq[Long]) =>
      var i = 0; var j = 0; var inter = 0
      while (i < a.length && j < b.length) {
        if (a(i) == b(j)) { inter += 1; i += 1; j += 1 }
        else if (a(i) < b(j)) i += 1
        else j += 1
      }
      inter.toDouble / (a.length + b.length - inter)
    }
    val sh = corpus.filter(col("id") < fam)
      .select(col("id"), graft.text.TextOps.wordShingleHashes(col("text")).as("sh"))
      .localCheckpoint(true)
    val brute = sh.select(col("id").as("id_a"), col("sh").as("_sa"))
      .join(sh.select(col("id").as("id_b"), col("sh").as("_sb")), col("id_a") < col("id_b"))
      .filter(jac(col("_sa"), col("_sb")) >= threshold)
      .select(col("id_a"), col("id_b"))
      .localCheckpoint(true)
    val brutePairs = brute.count()

    // capped run (operator defaults: maxBucket=1000, hot sample = cap),
    // beacons captured through the observation listener
    val seen = scala.collection.concurrent.TrieMap.empty[String, Seq[Long]]
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(f: String, qe: org.apache.spark.sql.execution.QueryExecution, d: Long): Unit =
        qe.observedMetrics.foreach { case (name, row) =>
          seen.put(name, (0 until row.length).map(i => if (row.isNullAt(i)) 0L else row.getLong(i)))
        }
      override def onFailure(f: String, qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    def runPairs(maxBucket: Int): (org.apache.spark.sql.DataFrame, Double, Long) = {
      val t0 = System.nanoTime()
      val raw = graft.dedup.Dedup
        .minHashPairs(corpus, col("text"), col("id"), threshold = threshold, maxBucket = maxBucket)
        .filter(col("id_a") < fam && col("id_b") < fam)
      // count() through the Dataset API fires the observation listener
      // (localCheckpoint's internal job would not)
      val n = raw.count()
      val sec = (System.nanoTime() - t0) / 1e9
      (raw.localCheckpoint(true), sec, n)
    }
    val (capped, secCapped, cappedPairs) = runPairs(1000)
    Thread.sleep(2000) // listener delivery is async
    val hotRows = seen.get("graft.minhash.hot").map(_.head).getOrElse(0L)
    val hotRecovered = seen.get("graft.minhash.hotrecall").map(_.head).getOrElse(0L)
    val (uncapped, secUncapped, uncappedPairs) = runPairs(Int.MaxValue)

    val cappedFound = capped.join(brute, Seq("id_a", "id_b"), "left_semi").count()
    val uncappedFound = uncapped.join(brute, Seq("id_a", "id_b"), "left_semi").count()
    val nodesBrute = brute.select(explode(array(col("id_a"), col("id_b"))).as("id")).distinct().count()
    val nodesCapped = capped.join(brute, Seq("id_a", "id_b"), "left_semi")
      .select(explode(array(col("id_a"), col("id_b"))).as("id")).distinct().count()

    println(
      s"""{"metric":"minhash_hot_probe","family":$fam,"fillers":$fillers,"threshold":$threshold,"maxBucket":1000,""" +
        s""""brute_pairs":$brutePairs,"capped_pairs":$cappedPairs,"capped_true":$cappedFound,""" +
        s""""pair_recall":${"%.4f".format(cappedFound.toDouble / brutePairs)},""" +
        s""""uncapped_pairs":$uncappedPairs,"uncapped_true":$uncappedFound,""" +
        s""""banding_recall":${"%.4f".format(uncappedFound.toDouble / brutePairs)},""" +
        s""""nodes_brute":$nodesBrute,"nodes_capped":$nodesCapped,""" +
        s""""membership_recall":${"%.4f".format(nodesCapped.toDouble / nodesBrute)},""" +
        s""""hot_rows":$hotRows,"hot_recovered":$hotRecovered,""" +
        s""""sec_capped":${"%.1f".format(secCapped)},"sec_uncapped":${"%.1f".format(secUncapped)}}""")
    spark.stop()
  }
}
