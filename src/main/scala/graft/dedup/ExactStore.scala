package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.sources.BucketedStore
import graft.text.TextOps

/** INCREMENTAL exact dedup against a persisted corpus — the exact-match
  * sibling of [[MinHashStore]] (admission screening: is this batch doc
  * identical, modulo whitespace/case, to ANYTHING already ingested?).
  *
  * The corpus is fingerprinted ONCE ([[TextOps.fingerprint]]: xxhash64 of
  * the whitespace-normalized lowercased text) and stored as a BUCKETED
  * table keyed on the 8-byte fingerprint — one row per DISTINCT
  * fingerprint carrying its keeper (min id). Each incoming batch pays one
  * fingerprint pass plus one exchange of the BATCH side into the store's
  * bucketing; the store side joins with NO shuffle and NO re-hashing
  * (the [[BucketedStore]] Exchange-elision mechanics, PlanSpec-asserted).
  * What an admission run touches of the corpus is the compact store scan
  * only — 16 bytes per distinct corpus doc, never the corpus text and
  * never a corpus-side shuffle (the two costs that make naive
  * re-deduplication of corpus ∪ batch unpayable at 100 TB). Collisions:
  * ~n²/2⁶⁴ expected false matches — the accepted trade of every hash-keyed
  * exact-dedup path here ([[Dedup.exact]], [[Dedup.dedupLines]]).
  *
  * The store lives in the session catalog (`saveAsTable`): within a
  * session it is written once and reused; a new session re-registers it.
  */
object ExactStore {

  /** Fingerprint `corpus` and write the (fp, kept_id) store bucketed by
    * fp. `buckets` fixes the layout every batch join will co-locate to.
    * A managed-table location left behind by a PREVIOUS session (the
    * in-memory catalog forgets tables, the warehouse dir doesn't —
    * Spark 4 then refuses with LOCATION_ALREADY_EXISTS) is removed
    * first, so re-registering in a fresh process just works. */
  def write(corpus: DataFrame, text: Column, id: Column, table: String, buckets: Int = 64): Unit = {
    val spark = corpus.sparkSession
    // quote each dot-separated part: one backtick pair around "db.tbl"
    // would name a SINGLE identifier in the default database
    val parts = table.split('.')
    spark.sql(s"DROP TABLE IF EXISTS ${parts.map(p => s"`$p`").mkString(".")}")
    // warehouse dir arrives as a URI (possibly percent-encoded); decode it
    // before touching the filesystem, falling back to the raw string when
    // it is not a parseable URI
    val wh = {
      val c = spark.conf.get("spark.sql.warehouse.dir")
      if (c.startsWith("file:"))
        try java.nio.file.Paths.get(java.net.URI.create(c)).toString
        catch { case _: IllegalArgumentException => c.stripPrefix("file:") }
      else c
    }
    // managed layout: default-db tables at <wh>/<tbl>, qualified at
    // <wh>/<db>.db/<tbl>
    val loc =
      if (parts.length == 2)
        new java.io.File(new java.io.File(wh, parts(0).toLowerCase + ".db"), parts(1).toLowerCase)
      else new java.io.File(wh, table.toLowerCase)
    if (loc.exists()) {
      def rm(f: java.io.File): Unit = {
        val kids = f.listFiles()
        if (kids != null) kids.foreach(rm)
        f.delete(): Unit
      }
      rm(loc)
    }
    BucketedStore.writeBucketed(
      corpus
        .select(TextOps.fingerprint(text).as("fp"), id.cast("long").as("kept_id"))
        .groupBy("fp")
        .agg(min("kept_id").as("kept_id")),
      table, "fp", buckets)
  }

  /** Batch rows whose normalized text already exists in the stored corpus:
    * (id, kept_id) with kept_id = the corpus keeper (min corpus id of the
    * fingerprint). Rows NOT returned are novel and safe to ingest. */
  def incrementalExactDups(batch: DataFrame, text: Column, id: Column, table: String): DataFrame =
    batch
      .select(id.cast("long").as("id"), TextOps.fingerprint(text).as("fp"))
      .join(batch.sparkSession.table(table), Seq("fp"))
      .select(col("id"), col("kept_id"))
}
