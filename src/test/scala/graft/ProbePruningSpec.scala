package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.ann.Ann

/** HammingProbePruning: the injected optimizer rule turns a hand-written
  * `bit_count(sig ^ q) <= h` filter over an LSH store into a
  * partition-pruned read — same files as the hand-built lshTopKStored
  * probe, identical results to the unpruned query. */
class ProbePruningSpec extends SparkSpec {
  import spark.implicits._

  private def vecs(n: Int) = (0 until n).map { i =>
    (i.toLong, Seq.tabulate(16)(d => math.sin(i * 7 + d * 3).toFloat))
  }.toDF("vec_id", "embedding")

  test("rule adds the prefix partition filter; results identical; idempotent") {
    val path = Files.createTempDirectory("graft_prune").toString + "/store"
    Ann.writeLshBucketed(vecs(400), col("embedding"), col("vec_id"), path,
      numBits = 8, prefixBits = 4)
    val store = spark.read.parquet(path)
    // metadata survives the parquet round trip
    assert(store.schema("sig").metadata.getLong("graft.lsh.numBits") == 8L)

    val planes = Ann.hyperplanes(8, 16)
    val q = (0 until 16).map(d => math.sin(11 * 7 + d * 3))
    val qSig = planes.zipWithIndex.map { case (p, i) =>
      if (p.zip(q).map { case (a, b) => a * b }.sum >= 0) 1L << i else 0L
    }.sum
    val probe = store.filter(bit_count(col("sig").bitwiseXOR(lit(qSig))) <= 1)

    val before = probe.collect().map(_.getLong(0)).sorted.toSeq
    assert(!probe.queryExecution.optimizedPlan.toString.contains("IN"),
      "without the rule there is no prefix IN-filter to prune with")

    val saved = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = saved :+ graft.plans.HammingProbePruning
    try {
      val probed = store.filter(bit_count(col("sig").bitwiseXOR(lit(qSig))) <= 1)
      val planAfter = probed.queryExecution.executedPlan.toString
      assert(planAfter.contains("sig_prefix") && planAfter.contains("PartitionFilters"),
        s"rule must add a sig_prefix partition filter:\n${planAfter.take(600)}")
      // hamming<=1 over 8 bits: at most 5 distinct 4-bit prefixes of 16
      val after = probed.collect().map(_.getLong(0)).sorted.toSeq
      assert(after == before, "pruning must not change results")
      // idempotence under the fixed-point batch: exactly ONE In(sig_prefix)
      val optimized = probed.queryExecution.optimizedPlan.toString
      assert("sig_prefix#\\d+ IN".r.findAllIn(optimized).size == 1, optimized.take(400))
    } finally spark.experimental.extraOptimizations = saved
  }

  test("rule leaves non-probe filters and prefix-constrained filters alone") {
    val path = Files.createTempDirectory("graft_prune2").toString + "/store"
    Ann.writeLshBucketed(vecs(100), col("embedding"), col("vec_id"), path,
      numBits = 8, prefixBits = 4)
    val store = spark.read.parquet(path)
    val saved = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = saved :+ graft.plans.HammingProbePruning
    try {
      // plain filter untouched (no bit_count shape)
      val plain = store.filter(col("id") > 50)
      assert(!plain.queryExecution.optimizedPlan.toString.contains("IN"))
      assert(plain.count() == 49)
      // already prefix-constrained: rule must not stack another IN
      val manual = store
        .filter(col("sig_prefix") === (3L >>> 0))
        .filter(bit_count(col("sig").bitwiseXOR(lit(3L))) <= 1)
      manual.collect()
      val opt = manual.queryExecution.optimizedPlan.toString
      assert("sig_prefix#\\d+ IN".r.findAllIn(opt).isEmpty, opt.take(400))
    } finally spark.experimental.extraOptimizations = saved
  }
}
