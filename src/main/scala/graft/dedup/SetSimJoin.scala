package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact set-similarity join with PREFIX FILTERING (Chaudhuri et al.,
  * ICDE 2006; PPJoin, Xiao et al., WWW 2008): all cross-corpus pairs whose
  * token-set Jaccard meets a rational threshold n/d — exactly, never
  * approximately. The cross-corpus sibling of the in-corpus MinHash pass:
  * "which of OUR documents near-match THEIR corpus" (contamination
  * attribution at document granularity, licensing audits, cross-crawl
  * overlap).
  *
  * The classic pigeonhole does the pruning: order every set by one GLOBAL
  * (df, token) total order — rarest tokens first — and keep only each
  * set's first |s| − ceil(τ·|s|) + 1 tokens. Any pair with J ≥ τ shares
  * ≥ ceil(τ·|s|) tokens, more than fit in either suffix, so the pair MUST
  * collide inside the prefixes; joining prefixes (instead of all tokens)
  * shrinks the candidate join by ~1/(1−τ) per side and skips the
  * stopword-bucket blow-up, since high-df tokens land at the ORDER'S END
  * and rarely make a prefix.
  *
  * Everything is integer arithmetic: τ is the rational n/d, the prefix
  * length uses exact ceiling division, and the final verdict is
  * (d+n)·|A∩B| ≥ n·(|A|+|B|) — equivalent to J ≥ n/d with no float in
  * sight, so a SQL oracle restates it hash-exactly.
  *
  * Scale shape: token explode → one df aggregate → per-set rank window
  * (sets are document-bounded) → prefix equi-join on token → candidate
  * dedup + the τ·max ≤ min length filter → one verify join counting the
  * true intersection. Cost is O(candidates), never |A|×|B|; the residual
  * verify is exact, so prefix geometry only affects speed, not results.
  * Tokenization is the repo's whitespace convention (TextOps.tokens). */
object SetSimJoin {

  private def ceilDiv(x: Column, d: Long): Column = {
    val y = x + lit(d - 1)
    ((y - pmod(y, lit(d))) / d).cast("long")
  }

  private def tokenSet(df: DataFrame, id: Column, text: Column): DataFrame =
    df.filter(trim(text) =!= "")
      .select(id.as("id"), explode(split(trim(text), "\\s+")).as("t"))
      .distinct()

  /** (id_a, id_b, inter, size_a, size_b) for every cross pair with
    * Jaccard(tokens(a), tokens(b)) ≥ tauNum/tauDen. */
  def jaccardJoin(
      a: DataFrame,
      aId: Column,
      aText: Column,
      b: DataFrame,
      bId: Column,
      bText: Column,
      tauNum: Long,
      tauDen: Long
  ): DataFrame = {
    require(tauNum > 0 && tauNum <= tauDen, "threshold must be in (0, 1]")
    val ta = tokenSet(a, aId, aText)
    val tb = tokenSet(b, bId, bText)
    val dfreq = ta.union(tb).groupBy("t").agg(count(lit(1)).as("_df"))

    // rarest-first global order (df, token); prefix = sz - ceil(tau*sz) + 1
    def prefix(ts: DataFrame): DataFrame = {
      val sz = ts.groupBy("id").agg(count(lit(1)).as("sz"))
      val w = Window.partitionBy(col("id")).orderBy(col("_df"), col("t"))
      ts.join(dfreq, "t")
        .withColumn("_rk", row_number().over(w))
        .join(sz, "id")
        .filter(col("_rk") <= col("sz") - ceilDiv(col("sz") * tauNum, tauDen) + 1)
        .select(col("id"), col("t"), col("sz"))
    }

    val cand = prefix(ta).select(col("id").as("id_a"), col("t"), col("sz").as("size_a"))
      .join(prefix(tb).select(col("id").as("id_b"), col("t"), col("sz").as("size_b")), "t")
      .select("id_a", "id_b", "size_a", "size_b")
      .distinct()
      // length filter: J >= tau forces tau*max <= min
      .filter(greatest(col("size_a"), col("size_b")) * tauNum
        <= least(col("size_a"), col("size_b")) * tauDen)

    cand
      .join(ta.select(col("id").as("id_a"), col("t")), "id_a")
      .join(tb.select(col("id").as("_ib"), col("t").as("_tb")),
        col("id_b") === col("_ib") && col("t") === col("_tb"))
      .groupBy("id_a", "id_b", "size_a", "size_b")
      .agg(count(lit(1)).as("inter"))
      .filter(col("inter") * (tauDen + tauNum) >= (col("size_a") + col("size_b")) * tauNum)
      .select("id_a", "id_b", "inter", "size_a", "size_b")
  }
}
