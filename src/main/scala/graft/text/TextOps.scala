package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType}

/** Text-analysis operators for large-scale training-data pipelines: token
  * counting, quality scoring, language ID, and document fingerprinting.
  *
  * All of these are pure per-row Column expressions (no UDF, no shuffle) —
  * they run inside whole-stage codegen in the same scan as any validation
  * checks, which is exactly what you want when profiling 100 TB of text: one
  * pass, column-pruned to just the text column.
  */
object TextOps {

  /** Whitespace tokenizer (consecutive whitespace collapsed). */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count estimate: words + punctuation marks + digit runs —
    * a cheap, deterministic proxy for tokenizer cost accounting. */
  def subwordCountEstimate(text: Column): Column =
    size(filter(split(text, "(?<=\\W)|(?=\\W)"), t => trim(t) =!= ""))

  val defaultStopwords: Seq[String] =
    Seq("the", "a", "an", "of", "and", "or", "to", "in", "is", "it")

  /** Number of tokens that are stopwords. */
  def stopwordCount(text: Column, stopwords: Seq[String] = defaultStopwords): Column =
    size(filter(tokens(text), t => t.isin(stopwords: _*)))

  /** Punctuation character count. */
  def punctCount(text: Column): Column =
    length(text) - length(regexp_replace(text, "[\\p{Punct}]", ""))

  /** Quality signals in one struct: chars, tokens, mean token length,
    * stopword ratio, punctuation ratio. Mirrors the length/punct/stopword
    * heuristics used by large-scale corpus filters (C4/Gopher-style rules). */
  def qualityStruct(text: Column, stopwords: Seq[String] = defaultStopwords): Column = {
    val n = tokenCount(text)
    struct(
      length(text).as("n_chars"),
      n.as("n_tokens"),
      (length(text).cast("double") / n).as("mean_token_len"),
      (stopwordCount(text, stopwords).cast("double") / n).as("stopword_ratio"),
      (punctCount(text).cast("double") / greatest(length(text), lit(1))).as("punct_ratio")
    )
  }

  /** Marker-stopword language-ID heuristic: pick the language whose marker
    * words occur most among the tokens; `unk` when nothing matches. The
    * marker lists are deliberately tiny — this is an n-gram/stopword
    * heuristic, not a model. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "la", "les", "et", "est"),
    "es" -> Seq("el", "la", "los", "y", "es")
  )

  def langId(text: Column): Column = {
    val toks = tokens(text)
    val scored = langMarkers.map { case (lang, markers) =>
      struct(size(filter(toks, t => t.isin(markers: _*))).as("score"), lit(lang).as("lang"))
    }
    val best = array_max(array(scored: _*))
    when(best.getField("score") > 0, best.getField("lang")).otherwise(lit("unk"))
  }

  /** Document fingerprint: 64-bit hash of the whitespace-normalised,
    * lowercased text. Deterministic across runs/partitions — usable as an
    * exact-dedup key at any scale. */
  def fingerprint(text: Column): Column =
    xxhash64(lower(regexp_replace(trim(text), "\\s+", " ")))

  /** Character n-gram shingles (for MinHash / Jaccard). */
  def charShingles(text: Column, n: Int = 5): Column = {
    val norm = lower(regexp_replace(trim(text), "\\s+", " "))
    val idx = sequence(lit(0), greatest(length(norm) - n, lit(0)))
    array_distinct(transform(idx, i => norm.substr(i + 1, lit(n))))
  }

  /** Word n-gram shingles. */
  def wordShingles(text: Column, n: Int = 3): Column = {
    val toks = tokens(text)
    val idx = sequence(lit(0), greatest(size(toks) - n, lit(0)))
    array_distinct(
      transform(idx, i => concat_ws(" ", slice(toks, i + 1, lit(n))))
    )
  }

  /** SimHash-64 over token hashes, computed natively (no UDF): per bit b,
    * sum +1/-1 votes of each token's xxhash64 bit b, then pack the sign bits.
    * Stays inside codegen; cost is 64 aggregate ops per row over the token
    * array — fine for profiling passes, and fully distributed. */
  def simhash64(text: Column): Column = {
    val hashes = transform(tokens(text), t => xxhash64(t))
    // one aggregate pass accumulating all 64 bit-vote counters in an array,
    // then pack sign bits; bit positions are Scala Ints so the shifts are
    // constant-folded
    val counters = aggregate(
      hashes,
      array((0 until 64).map(_ => lit(0)): _*),
      (acc, h) =>
        array((0 until 64).map { b =>
          element_at(acc, b + 1) +
            when(shiftright(h, b).bitwiseAND(1) === 1, 1).otherwise(-1)
        }: _*)
    )
    // pack MSB-first with acc*2+bit so `counters` appears exactly ONCE in the
    // expression tree (no 64× recomputation of the aggregate)
    aggregate(
      sequence(lit(64), lit(1), lit(-1)),
      lit(0L),
      // shiftleft (not *2): no signed-overflow at the MSB under ANSI mode
      (acc, b) => shiftleft(acc, 1).bitwiseOR(when(element_at(counters, b) > 0, 1L).otherwise(0L))
    )
  }

  /** Hamming distance between two 64-bit signatures. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))
}
