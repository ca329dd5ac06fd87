package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ann.Ann
import graft.dedup.Dedup
import graft.images.{ImageOps, SyntheticImages}
import graft.runner.{ValidationConfig, ValidationRunner}
import graft.schema._
import graft.stats.SketchDrift

/** End-to-end training-data pipeline over one image+caption table: the
  * composition a real user runs — admission validation → caption dedup →
  * image embeddings → bucketed ANN store + probe → drift snapshot. Each
  * stage consumes the previous stage's output; the point is that the
  * operators COMPOSE, not just pass their unit specs. */
class PipelineSpec extends SparkSpec {

  test("CurationPipeline.run == the five stages composed by hand (verdicts→lines→canonical→cap→packing)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.text.{CurationPipeline, TextOps}
    import graft.dedup.Dedup
    import graft.stats.{Packing, Sampling}
    // a corpus that exercises every stage: a too-short doc (dropped), a
    // shared boilerplate line (line-deduped), two near-identical docs
    // (canonicalized to one), and enough per-lang rows for the cap to bite
    val base = "the cat sat on the mat and it is a fine day in the park " * 3
    val docs = ((1L to 20L).map(i => (i, s"$base variant $i\nshared footer line", if (i % 2 == 0) "en" else "de")) :+
      ((30L, "tiny", "en")) :+ // dropped: too-short
      ((31L, s"$base variant 4\nshared footer line", "en")) // near-dup of doc 4
      ).toDF("doc_id", "text", "lang")
    val got = CurationPipeline
      .run(docs, col("text"), col("doc_id"), col("lang"), quota = 8, budget = 40L, bands = 32)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq

    val hash = pmod(col("id") * lit(2654435761L), lit(4294967296L))
    val s0 = docs.select(col("doc_id").cast("long").as("id"), col("text"), col("lang").as("_st"))
    val s1 = s0.join(TextOps.curationVerdicts(s0, col("text"), col("id"))
      .select(col("doc_id").as("id")), Seq("id"), "left_anti")
    val s2 = Dedup.dedupLines(s1, col("text"), col("id"))
      .join(s1.select(col("id"), col("_st")), Seq("id"))
    val pairs = Dedup.minHashPairs(s2, col("text"), col("id"), bands = 32, threshold = 0.5)
    val s3 = s2.join(
      Dedup.components(s2, col("id"), pairs, col("id_a"), col("id_b"))
        .filter(col("id") === col("comp")).select("id"), Seq("id"), "left_semi")
    val s4 = Sampling.quotaSample(s3, col("_st"), hash, col("id"), quota = 8)
    val manual = Packing.assignBins(s4, col("id"), col("id"), TextOps.tokenCount(col("text")), budget = 40L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(got == manual)
    assert(!got.map(_._1).contains(30L), "the too-short doc must be dropped")
    assert(got.map(_._1).contains(4L) != got.map(_._1).contains(31L),
      "exactly one of the near-dup pair survives canonicalization")
    assert(got.map(_._2).distinct.size > 1, "packing must produce multiple bins")
  }

  test("CurationPipeline.runToSequences == split+pack+assemble composed by hand over run()'s survivors") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.text.{CurationPipeline, TextOps}
    import graft.stats.Packing
    val base = "the cat sat on the mat and it is a fine day in the park " * 3
    val docs = ((1L to 20L).map(i => (i, s"$base variant $i\nshared footer line", if (i % 2 == 0) "en" else "de")) :+
      ((30L, "tiny", "en")) :+
      ((31L, s"$base variant 4\nshared footer line", "en"))
      ).toDF("doc_id", "text", "lang")
    val got = CurationPipeline
      .runToSequences(docs, col("text"), col("doc_id"), col("lang"),
        quota = 8, chunkBudget = 8, seqBudget = 40L, bands = 32)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    // hand-composed: run() at a budget only decides bins, so recover the
    // SURVIVOR ids from run()'s output, then split/pack/assemble manually
    val survivorIds = CurationPipeline
      .run(docs, col("text"), col("doc_id"), col("lang"), quota = 8, budget = 40L, bands = 32)
      .select("id").collect().map(_.getLong(0)).toSet
    val s4 = {
      // rebuild survivor texts exactly as the pipeline does (verdict stage
      // never edits text; line dedup does) — reuse the stage operators
      import graft.dedup.Dedup
      val s0 = docs.select(col("doc_id").cast("long").as("id"), col("text"))
      Dedup.dedupLines(s0, col("text"), col("id")).filter(col("id").isin(survivorIds.toSeq: _*))
    }
    val chunks = TextOps.splitOversized(s4, col("text"), col("id"), budget = 8)
      .select((col("id") * lit(1L << 20) + col("chunk")).as("cid"), col("text"))
      .localCheckpoint(true)
    val manual = Packing.packedSequences(chunks, col("text"), col("cid"), col("cid"),
        TextOps.tokenCount(col("text")), budget = 40L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    assert(got == manual)
    // chunking really happened: more chunks than surviving docs
    assert(got.map(_._3).sum > survivorIds.size)
    // no sequence overshoots budget by more than one chunk's tokens
    got.foreach { case (_, _, _, tot) => assert(tot < 40L + 8L) }
  }

  test("CurationPipeline keepBest: the LONGER near-dup member survives instead of the min id") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.text.CurationPipeline
    // single-line docs (line dedup can't touch them) with disjoint content
    // words; doc 20 = doc 3's body + a longer tail -> near-dup pair {3, 20}
    def body(i: Int) = (0 until 12).map(j => s"the p${i}x$j of q${i}y$j and r${i}z$j").mkString(" ")
    val docs = Seq(
      (1L, body(1), "en"),
      (3L, body(3), "en"),
      (20L, body(3) + " plus some extra trailing content words here now", "en")
    ).toDF("doc_id", "text", "lang")
    def survivors(kb: Boolean) = CurationPipeline
      .run(docs, col("text"), col("doc_id"), col("lang"),
        quota = 50, budget = 40L, bands = 32, keepBest = kb)
      .select("id").collect().map(_.getLong(0)).toSet
    val dflt = survivors(false)
    val best = survivors(true)
    assert(dflt.contains(3L) && !dflt.contains(20L), s"min-id rule keeps doc 3: $dflt")
    assert(best.contains(20L) && !best.contains(3L), s"keepBest keeps the longer doc 20: $best")
    assert(dflt - 3L == best - 20L, "only the pair's representative differs")
  }

  test("ShardedSink: shard=K layout on disk, round-robin bins, token totals within one budget") {
    import spark.implicits._
    import graft.text.TextOps
    val tmp = Files.createTempDirectory("graft_shard").toString
    // 40 docs × 10 tokens, budget 20 → 20 bins of exactly 2 docs, 4 shards
    val docs = (1L to 40L).map(i => (i, Seq.fill(10)(s"w$i").mkString(" "))).toDF("doc_id", "text")
    val asg = graft.sources.ShardedSink
      .write(docs, col("doc_id"), col("doc_id"), TextOps.tokenCount(col("text")),
        budget = 20L, shards = 4, path = s"$tmp/out")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    // round-robin: shard == bin % 4, every shard used
    assert(asg.forall { case (_, bin, shard) => shard == bin % 4 })
    assert(asg.map(_._3).distinct.sorted == Seq(0L, 1L, 2L, 3L))
    // physical layout: one directory per shard, rows land in THEIR shard
    val dirs = new java.io.File(s"$tmp/out").listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.toSeq == Seq("shard=0", "shard=1", "shard=2", "shard=3"))
    val back = spark.read.parquet(s"$tmp/out")
      .select(col("id"), col("bin"), col("shard").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    assert(back == asg, "read-back assignment must equal the returned manifest")
    // uniform bins round-robin exactly: every shard carries the same token total
    val totals = back.groupBy(_._3).view.mapValues(_.size * 10L).values.toSeq
    assert(totals.max == totals.min, s"shard totals $totals")
  }

  test("validate → dedup → embed → ANN store → drift: stages compose end to end") {
    val tmp = Files.createTempDirectory("graft_pipe").toString
    val n = 600L
    val imgs = SyntheticImages.generateWithId(spark, n).cache()

    // 1. admission: metadata checks (dims sane, fmt known, caption present).
    //    The generator injects ~1% violations, so strict admission rejects;
    //    a pipeline ingests the CLEAN subset instead.
    val schema = TableSchema(Seq(
      Field("w", ftype = "integer", constraints = FieldConstraints(minimum = Some(1))),
      Field("fmt", constraints = FieldConstraints(enumVals = Some(Seq("png", "jpeg")))),
      Field("caption", constraints = FieldConstraints(required = true))
    ))
    // admission runs on the declared-metadata PROJECTION (header checks are
    // reference-faithful schema-typed errors, so the validated view must
    // carry exactly the schema's columns — and pruning bytes out of the
    // admission scan is what you want at scale anyway)
    val cfg = ValidationConfig(rowNumberCol = "row_id")
    def meta(df: org.apache.spark.sql.DataFrame) = df.select("w", "fmt", "caption", "row_id")
    assert(ValidationRunner.validateOrReject(meta(imgs), schema, cfg).isLeft) // fail-closed works
    val badRows = ValidationRunner.plan(meta(imgs), schema, cfg).violations
      .select("row_number").distinct()
      .collect().map(_.getLong(0)).toSet
    val clean = imgs.filter(!col("row_id").isin(badRows.toSeq: _*))
    assert(ValidationRunner.validateOrReject(meta(clean), schema, cfg).isRight)

    // 2. dedup: drop rows whose caption duplicates an earlier row's
    //    (duplicate image_id mutations carry borrowed captions)
    val dupIds = Dedup.exact(clean, col("caption"), col("row_id"))
      .select("id").collect().map(_.getLong(0)).toSet
    val deduped = clean.filter(!col("row_id").isin(dupIds.toSeq: _*)).cache()
    val total = deduped.count()
    assert(total > 0 && total < n)
    assert(deduped.select(countDistinct(col("caption"))).head().getLong(0) == total)

    // 3. multimodal: real image embeddings from the bytes column —
    // materialized to parquet so the ANN store and the probe read ONE
    // frozen evaluation (a lazy frame could be recomputed between them)
    val embPath = s"$tmp/embedded"
    ImageOps.withImageEmbedding(deduped)
      .select(col("row_id"), col("embedding"))
      .filter(col("embedding").isNotNull)
      .write.parquet(embPath)
    val embedded = spark.read.parquet(embPath)

    // 4. ANN: LSH-bucketed store; probing with row 1's own embedding must
    //    return row 1 at rank 1 (cosine ~1 beats every other gradient)
    val store = s"$tmp/annstore"
    Ann.writeLshBucketed(embedded, col("embedding"), col("row_id"), store,
      numBits = 8, prefixBits = 4)
    val probeId = embedded.select(min("row_id")).head().getLong(0)
    val q = embedded.filter(col("row_id") === probeId)
      .select("embedding").head().getSeq[Float](0).map(_.toDouble)
    val top = Ann.lshTopKStored(spark, store, q, 3, numBits = 8, prefixBits = 4, probeHamming = 2)
      .collect()
    assert(top.head.getLong(0) == probeId && top.head.getDouble(1) > 0.999999)

    // 5. drift: snapshot a smooth per-row statistic (hash of image_id —
    //    uniform by construction; KLL sketches are mergeable but merge-ORDER-
    //    nondeterministic, and on atom-heavy columns like `w` or clustered
    //    `phash` the decile edges land on atoms, so run-to-run rank noise can
    //    swing whole atoms between PSI buckets); a shifted tomorrow drifts,
    //    an identical day does not
    val snap = s"$tmp/snapshot"
    val today = deduped.select(xxhash64(col("image_id")).cast("double").as("v"))
    SketchDrift.writeSnapshot(today, Seq("v"), snap)
    val same = SketchDrift.driftAgainstSnapshot(today, snap).head()
    assert(same.getDouble(1) < 0.1, s"same-day psi ${same.getDouble(1)}")
    val moved = SketchDrift.driftAgainstSnapshot(
      today.select((col("v") + lit(1.0e19)).as("v")), snap).head()
    assert(moved.getDouble(1) > 1.0, s"shifted psi ${moved.getDouble(1)}")
  }
}
