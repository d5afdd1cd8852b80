package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table support: the co-located join path for repeated
  * fact-fact joins at scale.
  *
  * At 100 TB the lineitem ⋈ orders join on orderkey is the dominant
  * shuffle of every query that touches both tables. Bucketing both
  * sides on the join key at ingest (`bucketBy(n, key)` + `sortBy`)
  * makes every subsequent join exchange-free: each task sort-merge
  * joins bucket i of the left with bucket i of the right, so the
  * O(data) network shuffle happens ONCE at write time instead of per
  * query. `BucketingSpec` proves the property from the physical plan
  * (no Exchange above either scan).
  *
  * Sizing rule: buckets ≈ table_size / target_partition_size (128-256
  * MB of parquet per bucket); both sides MUST use the same bucket
  * count or Spark falls back to shuffling the smaller side.
  */
object Bucketing {

  /** Ingest a frame as a bucketed+sorted managed parquet table. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int, sortCols: Seq[String] = Nil): Unit =
    df.write
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key, sortCols: _*)
      .mode("overwrite")
      .saveAsTable(table)

  /** Join two tables bucketed on the same key — planned without any
    * exchange when bucket layouts line up. */
  def colocatedJoin(spark: SparkSession, left: String, right: String,
      key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
