package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.stats.{Packing, Sampling}

/** The END-TO-END curation pipeline: every stage exists (and is oracled)
  * individually — this operator chains them as ONE DataFrame program and
  * pins the execution discipline that matters at 100 TB: each stage
  * boundary is MATERIALIZED EXACTLY ONCE (`localCheckpoint`) and every
  * downstream consumer reads that materialization, never re-derives the
  * stage. Without the explicit cut, Catalyst would inline the whole chain
  * into each of the many self-joins downstream stages make (line dedup
  * reads its input three times, the minhash family more), re-running
  * verdict kernels and the line shuffle per reference — the same
  * single-pass discipline the validation engine enforces for its checks
  * (reference analogue: the one-loop multi-check pass, jobs.py:418-427).
  *
  * Stages (mirrors a C4/RefinedWeb-style curation chain):
  *  1. composite keep/drop verdicts ([[TextOps.curationVerdicts]]) — drop
  *     flagged docs;
  *  2. corpus-level line dedup ([[Dedup.dedupLines]]) — strip boilerplate,
  *     reassemble docs;
  *  3. near-dup canonicalization (MinHash pairs → connected components,
  *     [[Dedup.components]]) — keep one doc per component (id == comp);
  *  4. per-stratum cap ([[Sampling.quotaSample]], deterministic hash
  *     membership);
  *  5. sequence packing ([[Packing.assignBins]]) — contiguous token-budget
  *     bins over the survivors in id order.
  * Output: (id, bin) for every surviving doc.
  *
  * On a cluster, replace `localCheckpoint` with a reliable-storage cut
  * (`checkpoint(true)` or a parquet round-trip) via `truncate` — the
  * plan shape is identical. */
object CurationPipeline {

  def run(
      corpus: DataFrame,
      text: Column,
      id: Column,
      stratum: Column,
      quota: Int,
      budget: Long,
      minTokens: Int = 30,
      maxTokens: Int = 10000,
      bands: Int = 4,
      threshold: Double = 0.5,
      hash: Column => Column = c => pmod(c * lit(2654435761L), lit(4294967296L)),
      truncate: DataFrame => DataFrame = _.localCheckpoint(true),
      keepBest: Boolean = false
  ): DataFrame =
    Packing.assignBins(
      survivors(corpus, text, id, stratum, quota, minTokens, maxTokens, bands,
        threshold, hash, truncate, keepBest),
      col("id"), col("id"), TextOps.tokenCount(col("text")), budget)

  /** [[run]] continued to the TRAINING-SEQUENCE endpoint: survivors are
    * split into `chunkBudget`-token chunks ([[TextOps.splitOversized]] —
    * so no single doc overshoots a bin by more than one chunk), packed,
    * and materialized to one sequence per bin
    * ([[graft.stats.Packing.packedSequences]]). Chunk ids are
    * `id * 2^20 + chunk` — callers' ids must fit 43 bits and docs must
    * chunk below 2^20 pieces (guaranteed here: verdicts cap docs at
    * `maxTokens` tokens upstream). Output: (bin, seq_text, n_docs,
    * total_tokens) where n_docs counts CHUNKS. */
  def runToSequences(
      corpus: DataFrame,
      text: Column,
      id: Column,
      stratum: Column,
      quota: Int,
      chunkBudget: Int,
      seqBudget: Long,
      minTokens: Int = 30,
      maxTokens: Int = 10000,
      bands: Int = 4,
      threshold: Double = 0.5,
      hash: Column => Column = c => pmod(c * lit(2654435761L), lit(4294967296L)),
      truncate: DataFrame => DataFrame = _.localCheckpoint(true),
      keepBest: Boolean = false
  ): DataFrame =
    sequencesFrom(
      truncate(survivors(corpus, text, id, stratum, quota, minTokens, maxTokens,
        bands, threshold, hash, truncate, keepBest)),
      chunkBudget, seqBudget, truncate)

  /** The sequence endpoint over an ALREADY-CURATED survivor set (the
    * `(id, text, _st)` frame [[survivors]] produces — e.g. read back from
    * a stage checkpoint or a persisted curation run): chunk → pack →
    * assemble, without re-deriving the five curation stages. */
  def sequencesFrom(
      survivors: DataFrame,
      chunkBudget: Int,
      seqBudget: Long,
      truncate: DataFrame => DataFrame = _.localCheckpoint(true)
  ): DataFrame = {
    // packedSequences reads its input twice (bin assignment + the join
    // back) — cut the chunk fan-out once so the split kernel runs once
    val chunks = truncate(
      TextOps.splitOversized(survivors, col("text"), col("id"), chunkBudget)
        .select((col("id") * lit(1L << 20) + col("chunk")).as("cid"), col("text")))
    Packing.packedSequences(chunks, col("text"), col("cid"), col("cid"),
      TextOps.tokenCount(col("text")), seqBudget)
  }

  /** Stages 0–4 (verdicts → line dedup → canonical → cap): the surviving
    * (id, text, _st) rows every endpoint packs. Public so a persisted
    * curation run can be packed to different endpoints ([[run]]'s bins,
    * [[sequencesFrom]]'s sequences) without re-running the stages.
    * `keepBest = true` swaps stage 3's min-id representative for the
    * LONGEST member of each near-dup component (ties → lowest id) via
    * [[Dedup.componentsKeepBest]] — the keep-the-best-copy curation rule. */
  def survivors(
      corpus: DataFrame,
      text: Column,
      id: Column,
      stratum: Column,
      quota: Int,
      minTokens: Int,
      maxTokens: Int,
      bands: Int,
      threshold: Double,
      hash: Column => Column,
      truncate: DataFrame => DataFrame,
      keepBest: Boolean = false
  ): DataFrame = {
    // stage 0: project the pipeline's working set once — id, text, stratum
    val stage0 = truncate(
      corpus.select(id.cast("long").as("id"), text.as("text"), stratum.as("_st")))

    // stage 1: composite verdicts; survivors = NOT flagged (one anti join
    // against the tiny flagged frame)
    val flagged = TextOps
      .curationVerdicts(stage0, col("text"), col("id"), minTokens, maxTokens)
      .select(col("doc_id").as("id"))
    val stage1 = truncate(stage0.join(flagged, Seq("id"), "left_anti"))

    // stage 2: corpus-level line dedup; the stratum rides back via one
    // equi-join on id (dedupLines output covers every stage-1 row)
    val stage2 = truncate(
      Dedup.dedupLines(stage1, col("text"), col("id"))
        .join(stage1.select(col("id"), col("_st")), Seq("id")))

    // stage 3: near-dup canonical ids over the REBUILT texts; keep one doc
    // per component (the id == comp representative). The caller's truncate
    // contract is forwarded into the pair/CC internals (r6) so a
    // reliable-storage cut governs EVERY materialization in the pipeline,
    // not just the stage boundaries.
    val pairs = Dedup.minHashPairs(stage2, col("text"), col("id"), bands = bands,
      threshold = threshold, truncate = truncate)
    val keepers =
      if (keepBest)
        Dedup.componentsKeepBest(stage2, col("id"),
            TextOps.tokenCount(col("text")).cast("long"), pairs, col("id_a"), col("id_b"),
            truncate = truncate)
          .filter(col("id") === col("keep_id"))
          .select(col("id"))
      else
        Dedup.components(stage2, col("id"), pairs, col("id_a"), col("id_b"),
          truncate = truncate)
          .filter(col("id") === col("comp"))
          .select(col("id"))
    val stage3 = truncate(stage2.join(keepers, Seq("id"), "left_semi"))

    // stage 4: deterministic per-stratum cap (hash membership — resumable,
    // partitioning-independent)
    Sampling.quotaSample(stage3, col("_st"), hash(col("id")), col("id"), quota)
  }
}
