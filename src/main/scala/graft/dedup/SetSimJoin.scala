package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact set-similarity join with PREFIX FILTERING (Chaudhuri et al.,
  * ICDE 2006; PPJoin, Xiao et al., WWW 2008): all pairs whose token-set
  * Jaccard meets a rational threshold n/d — exactly, never approximately.
  * Two entry points: [[jaccardJoin]] for cross-corpus pairs ("which of OUR
  * documents near-match THEIR corpus" — contamination attribution at
  * document granularity, licensing audits, cross-crawl overlap) and
  * [[selfJaccardPairs]] for within-corpus dedup pairs (the exact sibling
  * of the probabilistic MinHash pass — same output contract as
  * `Dedup.minHashPairs`' verified pairs, but with guaranteed full recall).
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
  * Scale shape: token explode → one df aggregate → per-set df-sorted
  * token array in ONE hash aggregation (sets are document-bounded; never
  * a rank window, which would sort-shuffle every token row) → prefix
  * equi-join on token with the PPJoin length + position filters applied
  * BEFORE the pair-dedup shuffle → arrays join back by id and a codegen'd
  * array_intersect counts the true intersection. Cost is O(candidates),
  * never |A|×|B|; the residual verify is exact, so prefix geometry only
  * affects speed, not results. Tokenization is the repo's whitespace
  * convention (TextOps.tokens). */
object SetSimJoin {

  // MAGNITUDE CONTRACT: tauNum/tauDen ≤ ~1e6 (enforced at the entry
  // points) keeps every long product below 2^53, where the exact-multiple
  // double division below is correctly rounded — a ~1e18-scale rational
  // would silently overflow the filters' long multiplications instead of
  // failing fast
  private def ceilDiv(x: Column, d: Long): Column = {
    val y = x + lit(d - 1)
    ((y - pmod(y, lit(d))) / d).cast("long")
  }

  // per-doc token dedup is row-local (array_distinct before the explode)
  // — never a (id, token) DISTINCT shuffle over every token row. An id
  // split across MULTIPLE rows can still emit the same token twice; the
  // collect_set in sets() below removes those, so multi-row ids keep
  // exact set semantics without a pre-aggregation shuffle.
  private def tokenSet(df: DataFrame, id: Column, text: Column): DataFrame =
    df.filter(trim(text) =!= "")
      .select(id.as("id"), explode(array_distinct(graft.text.TextOps.tokens(text))).as("t"))

  // Per-set df-sorted token array in ONE hash aggregation (a window
  // row_number would sort-shuffle EVERY token row; collect+sort pays a
  // document-bounded in-row sort instead), then slice the rarest-first
  // prefix of length sz − ceil(τ·sz) + 1. collect_set (not _list): a
  // duplicate (id, t) from a multi-row id carries the same _df after the
  // join, so set-dedup restores exact global (id, token) distinctness.
  // `_arr.t` field extraction over the struct array is native — no HOF.
  private def sets(ts: DataFrame, dfreq: DataFrame, tauNum: Long, tauDen: Long): DataFrame =
    ts.join(dfreq, "t")
      .groupBy("id")
      .agg(sort_array(collect_set(struct(col("_df"), col("t")))).as("_arr"))
      .select(
        col("id"),
        col("_arr"),
        size(col("_arr")).cast("long").as("sz"))
      .withColumn("pref",
        slice(col("_arr.t"), lit(1),
          (col("sz") - ceilDiv(col("sz") * tauNum, tauDen) + 1).cast("int")))

  // positional prefix rows: the token's 1-based rank in the full df-sorted
  // array — feeds the PPJoin position filter below
  private def prefRows(s: DataFrame, idAs: String, szAs: String, pAs: String): DataFrame =
    s.select(col("id").as(idAs), col("sz").as(szAs),
        posexplode(col("pref")).as(Seq("_p0", "t")))
      .withColumn(pAs, col("_p0") + 1).drop("_p0")

  // candidate pruning shared by both entry points. required overlap
  // alpha = ceil(n*(sa+sb)/(n+d)); a qualifying pair's FIRST common token
  // sits in both prefixes at positions (i, j) with overlap <=
  // 1 + min(sz_a - i, sz_b - j), so filtering each collision by that bound
  // never loses a qualifying pair (PPJoin, Xiao 2008). Both filters run
  // BEFORE the pair-dedup shuffle, and the dedup carries ONLY
  // (id_a, id_b) — sizes rejoin with the verify arrays.
  private def candidates(pa: DataFrame, pb: DataFrame, tauNum: Long, tauDen: Long): DataFrame = {
    val alpha = ceilDiv((col("size_a") + col("size_b")) * tauNum, tauDen + tauNum)
    pa.join(pb, "t")
      // length filter: J >= tau forces tau*max <= min
      .filter(greatest(col("size_a"), col("size_b")) * tauNum
        <= least(col("size_a"), col("size_b")) * tauDen)
      .filter(lit(1) + least(col("size_a") - col("_pA"), col("size_b") - col("_pB")) >= alpha)
  }

  // exact verify: join the token SETS back by id (arrays ride two hash
  // joins, never a re-explode) and count the true intersection with a
  // codegen'd SORTED-MERGE over the (df, token) struct arrays — both
  // sides are sorted by the same global (df, token-binary) order
  // sort_array produced, and a token determines its df, so the struct
  // intersection count IS |tokens_a ∩ tokens_b|. (array_intersect built
  // a per-row hash set per candidate pair — r6.)
  private def verify(cand: DataFrame, sa: DataFrame, sb: DataFrame,
                     tauNum: Long, tauDen: Long): DataFrame =
    cand
      .join(sa.select(col("id").as("id_a"), col("_arr").as("_ta"), col("sz").as("size_a")), "id_a")
      .join(sb.select(col("id").as("id_b"), col("_arr").as("_tb"), col("sz").as("size_b")), "id_b")
      .withColumn("inter",
        graft.exprs.VectorExprs.sortedStructIntersectNative(col("_ta"), col("_tb")).cast("long"))
      .filter(col("inter") * (tauDen + tauNum) >= (col("size_a") + col("size_b")) * tauNum)
      .select("id_a", "id_b", "inter", "size_a", "size_b")

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
      tauDen: Long,
      truncate: DataFrame => DataFrame = _.localCheckpoint(true)
  ): DataFrame = {
    require(tauNum > 0 && tauNum <= tauDen, "threshold must be in (0, 1]")
    require(tauDen <= 1000000L, s"tauDen must be <= 1e6 (magnitude contract, see ceilDiv): $tauDen")
    val ta = tokenSet(a, aId, aText)
    val tb = tokenSet(b, bId, bText)
    // ONE global order across both corpora — df over the union, so the
    // same token ranks identically in an A-prefix and a B-prefix.
    // MATERIALIZED ONCE (r6): dfreq feeds both sets() calls and each set
    // frame feeds a prefix side AND a verify side — without the cut,
    // Catalyst inlined the whole explode→df-join→collect_set chain into
    // every consumer (the r6-before plan ran the ObjectHashAggregate chain
    // 4× with 8 parquet scans). dfreq is vocabulary-bounded and the set
    // frames are one row per doc, so the cut is cheap at any scale.
    val dfreq = truncate(ta.union(tb).groupBy("t").agg(count(lit(1)).as("_df")))
    val sa = truncate(sets(ta, dfreq, tauNum, tauDen))
    val sb = truncate(sets(tb, dfreq, tauNum, tauDen))
    val cand = candidates(
        prefRows(sa, "id_a", "size_a", "_pA"),
        prefRows(sb, "id_b", "size_b", "_pB"), tauNum, tauDen)
      .select("id_a", "id_b")
      .distinct()
    verify(cand, sa, sb, tauNum, tauDen)
  }

  /** Within-corpus variant: (id_a, id_b, inter, size_a, size_b) for every
    * pair id_a < id_b with Jaccard ≥ tauNum/tauDen. The df aggregate and
    * the per-set array aggregation run ONCE over the corpus (not twice as
    * a self-call of [[jaccardJoin]] would); the prefix self-join halves
    * its output with the id_a < id_b canonicalization before the
    * pair-dedup shuffle. Feed the result to `Dedup.components` for
    * exact-recall canonical ids. */
  def selfJaccardPairs(
      df: DataFrame,
      id: Column,
      text: Column,
      tauNum: Long,
      tauDen: Long,
      truncate: DataFrame => DataFrame = _.localCheckpoint(true)
  ): DataFrame = {
    require(tauNum > 0 && tauNum <= tauDen, "threshold must be in (0, 1]")
    require(tauDen <= 1000000L, s"tauDen must be <= 1e6 (magnitude contract, see ceilDiv): $tauDen")
    val ts = tokenSet(df, id, text)
    val dfreq = ts.groupBy("t").agg(count(lit(1)).as("_df"))
    // materialized ONCE (r6): s feeds both prefix sides and both verify
    // sides — the r6-before plan re-ran the set aggregation 4× (see
    // jaccardJoin's note); one row per doc, cheap cut at any scale
    val s = truncate(sets(ts, dfreq, tauNum, tauDen))
    val cand = candidates(
        prefRows(s, "id_a", "size_a", "_pA"),
        prefRows(s, "id_b", "size_b", "_pB"), tauNum, tauDen)
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
    verify(cand, s, s, tauNum, tauDen)
  }
}
