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

  test("multi-relation plans: rule bails when sig/sig_prefix attribution is ambiguous") {
    // a self-join exposes TWO sig and TWO sig_prefix attributes below the
    // filter; pairing the probed sig with the wrong store's partition column
    // would silently drop rows — the rule must not rewrite such a plan
    val path = Files.createTempDirectory("graft_prune3").toString + "/store"
    Ann.writeLshBucketed(vecs(50), col("embedding"), col("vec_id"), path,
      numBits = 8, prefixBits = 4)
    val store = spark.read.parquet(path)
    val a = store.as("a")
    val b = store.as("b")
    val joined = a.join(b, col("a.id") === col("b.id"))
      .filter(bit_count(col("a.sig").bitwiseXOR(lit(3L))) <= 1)
    // apply the rule DIRECTLY to the analyzed plan (filter still above the
    // join, both relations' outputs visible) — must be a no-op
    val analyzed = joined.queryExecution.analyzed
    val rewritten = graft.plans.HammingProbePruning(analyzed)
    assert(rewritten.toString == analyzed.toString,
      s"ambiguous multi-relation plan must not be rewritten:\n${rewritten.toString.take(400)}")
  }

  test("prefix ball == projected full-signature ball (the cheap computation is exact)") {
    for {
      numBits <- Seq(8, 16, 24)
      prefixBits <- Seq(2, 4, numBits)
      h <- 0 to 3
      qSig <- Seq(0L, 0x5aL, (1L << numBits) - 1)
    } {
      val projected = Ann.sigsWithin(qSig, numBits, h)
        .map(_ >>> (numBits - prefixBits)).distinct.toSet
      val direct = Ann.sigsWithin(
        qSig >>> (numBits - prefixBits), prefixBits, math.min(h, prefixBits)).toSet
      assert(direct == projected, s"numBits=$numBits prefixBits=$prefixBits h=$h q=$qSig")
    }
  }
}
