package graft

import org.apache.spark.sql.functions._
import graft.dedup.SetSimJoin

/** Prefix-filter set-similarity join: exact equivalence to the brute-force
  * Jaccard join (prefixes only prune, never drop), boundary thresholds
  * inclusive, duplicate tokens collapse to sets, no cartesian plan. */
class SetSimJoinSpec extends SparkSpec {
  import spark.implicits._

  private def brute(a: Seq[(Long, String)], b: Seq[(Long, String)],
                    n: Long, d: Long): Set[(Long, Long, Long, Long, Long)] = {
    def ts(s: String) = s.trim.split("\\s+").filter(_.nonEmpty).toSet
    val pairs = for {
      (ia, sa) <- a
      (ib, sb) <- b
      xa = ts(sa)
      xb = ts(sb)
      if xa.nonEmpty && xb.nonEmpty
      inter = (xa & xb).size.toLong
      if inter * (d + n) >= n * (xa.size + xb.size)
    } yield (ia, ib, inter, xa.size.toLong, xb.size.toLong)
    pairs.toSet
  }

  test("jaccardJoin == brute force, including exact-threshold boundary pairs") {
    // J(4-of-5, 5) cases: |A|=5,|B|=5,inter=4 -> J = 4/6 = 2/3 — sits
    // EXACTLY on tau=2/3; must be kept (inclusive)
    val a = Seq(
      (0L, "a b c d e"), (2L, "x y z"), (4L, "p q r s"),
      (6L, "m m m n"), // dup tokens collapse -> {m, n}
      (8L, " ")        // blank -> excluded
    )
    val b = Seq(
      (1L, "a b c d f"), // inter 4 with id 0 -> J = 2/3 boundary
      (3L, "x y z"),     // identical to id 2 -> J = 1
      (5L, "p q"),       // subset: J = 2/4 = 1/2 < 2/3
      (7L, "n m"),       // == {m,n} -> J = 1 with id 6
      (9L, "zz")
    )
    val got = SetSimJoin.jaccardJoin(
        a.toDF("id", "txt").repartition(3), col("id"), col("txt"),
        b.toDF("id", "txt").repartition(2), col("id"), col("txt"), 2L, 3L)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(got == brute(a, b, 2L, 3L))
    assert(got.contains((0L, 1L, 4L, 5L, 5L)), "boundary J == tau must be inclusive")
  }

  test("jaccardJoin == brute force on a dense shared-vocab corpus (prefix never loses)") {
    // 40 docs per side over an 18-token vocab — heavy token sharing, many
    // near-threshold pairs; sizes vary so the ceil prefix math is exercised
    val vocab = ('a' to 'r').map(_.toString)
    def doc(i: Int, drop: Int) =
      vocab.zipWithIndex.filter { case (_, j) => (j + i) % drop != 0 }.map(_._1).mkString(" ")
    val a = (0 until 40).map(i => (i.toLong * 2, doc(i, 5 + i % 4)))
    val b = (0 until 40).map(i => (i.toLong * 2 + 1, doc(i + 1, 4 + i % 5)))
    val got = SetSimJoin.jaccardJoin(
        a.toDF("id", "txt").repartition(4), col("id"), col("txt"),
        b.toDF("id", "txt").repartition(4), col("id"), col("txt"), 4L, 5L)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val want = brute(a, b, 4L, 5L)
    assert(want.nonEmpty, "fixture must produce positives")
    assert(got == want)
  }

  test("selfJaccardPairs == brute force over ordered within-corpus pairs") {
    val vocab = ('a' to 'r').map(_.toString)
    def doc(i: Int, drop: Int) =
      vocab.zipWithIndex.filter { case (_, j) => (j + i) % drop != 0 }.map(_._1).mkString(" ")
    val corpus = (0 until 60).map(i => (i.toLong, doc(i, 4 + i % 6))) ++
      Seq((100L, "a b c d e"), (101L, "a b c d e"), (102L, " ")) // exact dup + blank
    val got = SetSimJoin.selfJaccardPairs(
        corpus.toDF("id", "txt").repartition(4), col("id"), col("txt"), 4L, 5L)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val want = brute(corpus, corpus, 4L, 5L)
      .filter { case (ia, ib, _, _, _) => ia < ib }
    assert(want.nonEmpty, "fixture must produce positives")
    assert(got == want)
    assert(got.contains((100L, 101L, 5L, 5L, 5L)), "exact dup pair must surface")
  }

  test("an id split across multiple rows keeps exact set semantics (cross-row dedup)") {
    // id 0 arrives as two rows whose token lists overlap on "c": its set is
    // {a,b,c,d,e} (size 5, "c" once) — identical to id 1's single row, so
    // the pair must surface at J = 1 with sizes 5/5
    val a = Seq((0L, "a b c"), (0L, "c d e"), (2L, "x y z"))
    val b = Seq((1L, "a b c d e"), (3L, "x q"))
    val got = SetSimJoin.jaccardJoin(
        a.toDF("id", "txt").repartition(3), col("id"), col("txt"),
        b.toDF("id", "txt").repartition(2), col("id"), col("txt"), 9L, 10L)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(got == Set((0L, 1L, 5L, 5L, 5L)))
  }

  test("plan: prefix equi-join + verify join only — no cartesian") {
    val a = (0 until 100).map(i => (i.toLong, s"t${i % 7} t${i % 11} t${i % 13}"))
    val b = (0 until 100).map(i => (i.toLong + 1000, s"t${i % 7} t${i % 11} t${i % 17}"))
    val plan = SetSimJoin.jaccardJoin(
        a.toDF("id", "txt"), col("id"), col("txt"),
        b.toDF("id", "txt"), col("id"), col("txt"), 9L, 10L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"set-sim join must never go all-pairs:\n$plan")
  }
}
