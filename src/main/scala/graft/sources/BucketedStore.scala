package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed table storage for CO-LOCATED joins: write once bucketed+sorted
  * by the join key, and every subsequent key-equijoin between tables
  * bucketed the same way (same key, same bucket count) runs with NO shuffle
  * on either side — at 100 TB that turns the referential-check join
  * (fact ⋈ dimension-keys) from the dominant cost into a local merge per
  * bucket. The write pays one shuffle ONCE; every downstream join,
  * uniqueness-by-key aggregation, and FK check amortizes it.
  *
  * This is plain Spark bucketing (`bucketBy`/`sortBy` + the session
  * catalog), not a custom format: Catalyst's `EnsureRequirements` sees the
  * bucketed `HashPartitioning` and elides the `Exchange` (PlanSpec asserts
  * exactly that).
  */
object BucketedStore {

  /** Write `df` as a bucketed, per-bucket-sorted parquet table registered in
    * the session catalog. `buckets` must match across tables that will be
    * joined shuffle-free. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .saveAsTable(table)

  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)

  /** FK violations between two bucketed tables (both bucketed on their join
    * key with the same bucket count): rows of `factTable` whose `factKey`
    * has no match in `dimTable.dimKey` — a left-anti join that runs
    * SHUFFLE-FREE over the co-located buckets. */
  def fkViolationsBucketed(
      spark: SparkSession,
      factTable: String,
      factKey: String,
      dimTable: String,
      dimKey: String
  ): DataFrame = {
    import org.apache.spark.sql.functions.col
    spark.table(factTable).join(
      spark.table(dimTable).select(col(dimKey).as(factKey)),
      Seq(factKey),
      "left_anti"
    )
  }
}
