package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.sources.ZOrderStore

/** Z-order layout store: Morton math, partition-pruned rectangle probes,
  * exactness vs the brute-force filter. */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("interleave: column and driver twins agree, Morton bit layout") {
    assert(ZOrderStore.interleave(0L, 0L, 4) == 0L)
    assert(ZOrderStore.interleave(1L, 0L, 4) == 1L)
    assert(ZOrderStore.interleave(0L, 1L, 4) == 2L)
    assert(ZOrderStore.interleave(3L, 3L, 4) == 15L)
    assert(ZOrderStore.interleave(5L, 2L, 4) == (1L | 8L | 16L)) // x bits 0,2 -> 0,4; y bit 1 -> 3
    val got = spark.range(1).select(
      (0 until 8).map(i => ZOrderStore.interleaveCol(lit(i.toLong % 4), lit(i.toLong / 4), 4).as(s"z$i")): _*)
      .head()
    (0 until 8).foreach { i =>
      assert(got.getLong(i) == ZOrderStore.interleave(i % 4, i / 4, 4), s"i=$i")
    }
  }

  test("rangeProbe: prunes partitions, equals the brute-force rectangle filter") {
    val path = Files.createTempDirectory("graft_z").toString + "/store"
    val df = (0 until 2000).map { i =>
      (i.toLong, (i % 97).toLong, (i % 41).toDouble / 2.0)
    }.toDF("event_id", "uid", "v")
    ZOrderStore.write(df, col("uid"), col("v"), path, bitsPerDim = 3)
    val dirs = new java.io.File(path).listFiles().count(_.getName.startsWith("z="))
    val probe = ZOrderStore.rangeProbe(spark, path, 10.0, 30.0, 2.0, 8.0)
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), s"probe must push a partition filter:\n$plan")
    // the probed cell set is a strict subset of the store's directories:
    // uid cells [0..7] over [0,96] -> 10..30 maps to cells 0..2 of 8;
    // v cells over [0,20] -> 2..8 maps to cells 0..3 of 8
    val zs = "values=\\[([^\\]]*)\\]".r.findFirstMatchIn(plan)
    val got = probe.select("event_id").as[Long].collect().sorted.toSeq
    val want = df.filter(col("uid").between(10, 30) && col("v").between(2.0, 8.0))
      .select("event_id").as[Long].collect().sorted.toSeq
    assert(want.nonEmpty && got == want, s"got ${got.size} want ${want.size}")
    assert(dirs > 12, s"store should have more dirs than the probe touches (got $dirs)")
  }

  test("rangeProbe: rectangle disjoint from the data bounds is empty without a scan") {
    val path = Files.createTempDirectory("graft_z2").toString + "/store"
    val df = (0 until 100).map(i => (i.toLong, i.toLong, i.toDouble)).toDF("id", "a", "b")
    ZOrderStore.write(df, col("a"), col("b"), path, bitsPerDim = 2)
    val probe = ZOrderStore.rangeProbe(spark, path, 1000.0, 2000.0, 0.0, 10.0)
    assert(probe.count() == 0L)
  }

  test("write: degenerate single-value dimension lands everything in cell 0") {
    val path = Files.createTempDirectory("graft_z3").toString + "/store"
    val df = (0 until 50).map(i => (i.toLong, 7L, i.toDouble)).toDF("id", "a", "b")
    ZOrderStore.write(df, col("a"), col("b"), path, bitsPerDim = 3)
    val got = ZOrderStore.rangeProbe(spark, path, 7.0, 7.0, 10.0, 20.0)
      .select("id").as[Long].collect().sorted.toSeq
    assert(got == (10L to 20L).toSeq)
  }
}
