package graft.stats

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Sequence packing for training pipelines: assign documents, in a
  * deterministic global order, to contiguous fixed-budget bins (training
  * sequences of ~budget tokens). The bin of a document is decided by the
  * EXACT prefix sum of weights before it: `bin = (sum of earlier weights)
  * div budget` — the greedy contiguous packing every data loader can
  * reconstruct, and an ANSI-SQL window can oracle.
  *
  * The naive Spark expression — `sum(w).over(Window.orderBy(order))` with
  * no partition key — collapses the whole table into ONE task (Spark emits
  * a single-partition Exchange for a global window), which is the classic
  * 100-TB scale killer. This implementation is the textbook two-phase
  * distributed scan instead:
  *
  *  1. range-repartition + sort by the order column (one shuffle, the same
  *     one any global sort pays),
  *  2. per-partition weight totals — a tiny job over P values whose map
  *     output is reused by step 3 (same shuffle dependency, nothing
  *     recomputed),
  *  3. driver turns the P totals into per-partition prefix OFFSETS
  *     (exclusive scan over ≤ thousands of longs), and a second pass adds
  *     the local running sum to the partition's offset.
  *
  * Every partition computes its rows' global prefix sums exactly, whatever
  * the sampled range boundaries were — the output is a pure function of
  * (order, weight, budget). */
object Packing {

  /** Returns (id, bin): `id` cast to long, `bin` = 0-based bin index under
    * `budget` (a document larger than the budget still gets the bin its
    * start offset falls in — callers split oversized docs upstream).
    * `order` must be a TOTAL order (unique values, e.g. the doc id) — with
    * ties the prefix sum depends on tie placement; weights must be
    * non-null. */
  def assignBins(
      df: DataFrame,
      id: Column,
      order: Column,
      weight: Column,
      budget: Long,
      partitions: Int = 0
  ): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    val spark = df.sparkSession
    val p = if (partitions > 0) partitions else spark.sessionState.conf.numShufflePartitions
    // ROW CONTRACT: everything below the .rdd drop reads fields by ordinal —
    // getLong(0)=_id, getLong(2)=_w. If this select list ever grows, the
    // ordinals (and the Row(...) construction) must move with it.
    val prepared = df
      .select(id.cast("long").as("_id"), order.as("_o"), weight.cast("long").as("_w"))
      .repartitionByRange(p, col("_o"))
      .sortWithinPartitions("_o")
    // keep ONE lineage so the second pass reuses the range shuffle's map
    // output instead of re-shuffling
    val rdd = prepared.rdd
    val partSums: Array[Long] = rdd
      .mapPartitionsWithIndex { (i, it) =>
        var s = 0L
        while (it.hasNext) s += it.next().getLong(2)
        Iterator((i, s))
      }
      .collect()
      .sortBy(_._1)
      .map(_._2)
    val offsets = partSums.scanLeft(0L)(_ + _) // exclusive prefix per partition
    val bc = spark.sparkContext.broadcast(offsets)
    val out = rdd.mapPartitionsWithIndex { (i, it) =>
      var run = bc.value(i)
      it.map { r =>
        val before = run
        run += r.getLong(2)
        Row(r.getLong(0), before / budget)
      }
    }
    import org.apache.spark.sql.types._
    spark.createDataFrame(out,
      StructType(Seq(StructField("id", LongType, false), StructField("bin", LongType, false))))
  }

  /** Materialize packed bins into TRAINING SEQUENCES: one row per bin with
    * its member documents concatenated in global `order` — the final text a
    * data loader feeds a tokenizer ([[assignBins]] decides membership; this
    * builds the sequence). `order` must cast to long (it is the sort key
    * inside each bin's assembly kernel).
    *
    * Scale shape: one 8-byte-keyed shuffle on `bin`; each reduce group is
    * ONE bin — bounded at ~budget tokens plus one doc's overshoot by
    * construction, so group state never grows with corpus size (split
    * oversized docs upstream with
    * [[graft.text.TextOps.splitOversized]]). The in-group concat is a
    * primitive sort+mkString kernel on the collected (order, text) structs.
    * Output: (bin, seq_text, n_docs, total_tokens). */
  def packedSequences(
      df: DataFrame,
      text: Column,
      id: Column,
      order: Column,
      weight: Column,
      budget: Long,
      sep: String = " "
  ): DataFrame = {
    val bins = assignBins(df, id, order, weight, budget)
    val keyed = df
      .select(id.cast("long").as("id"), order.cast("long").as("_o"),
        text.as("_t"), weight.cast("long").as("_w"))
      .join(bins, Seq("id"))
    val sepL = sep
    val assemble = udf { (xs: Seq[Row]) =>
      xs.sortBy(_.getLong(0)).map(_.getString(1)).mkString(sepL)
    }
    keyed
      .groupBy("bin")
      .agg(
        assemble(collect_list(struct(col("_o"), col("_t")))).as("seq_text"),
        count(lit(1)).as("n_docs"),
        sum(col("_w")).as("total_tokens"))
  }
}
