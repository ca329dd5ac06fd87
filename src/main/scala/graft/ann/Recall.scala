package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ANN quality monitoring: recall@k of an approximate candidate list
  * against the exact top-k — the metric every IVF/PQ/LSH deployment
  * tracks to tune nprobe / code size / band geometry. The approximate
  * probes trade recall for scan cost ([[Ann.ivfTopK]], [[Pq.ivfPqProbe]],
  * [[Ann.lshTopKStored]]); this is the measurement that makes the trade
  * explicit instead of asserted.
  */
object Recall {

  /** recall@k: |approx ∩ exact| / k over the two id columns. Both inputs
    * should already be their engine's top-k (this function trusts and
    * counts them; pass `limit(k)` results with a DETERMINISTIC tie-break
    * so the metric is reproducible). One broadcast-sized equi-join — k
    * rows on each side regardless of corpus size. Output: one row
    * (k, hits, recall). */
  def atK(approx: DataFrame, aid: Column, exact: DataFrame, eid: Column, k: Int): DataFrame = {
    require(k >= 1, s"k must be positive: $k")
    val a = approx.select(aid.cast("long").as("id")).distinct()
    val e = exact.select(eid.cast("long").as("id")).distinct()
    a.join(e, Seq("id"))
      .agg(count(lit(1)).as("hits"))
      .select(lit(k.toLong).as("k"), col("hits"),
        (col("hits").cast("double") / lit(k.toDouble)).as("recall"))
  }
}
