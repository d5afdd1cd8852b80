package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Output sizing for large writes — the ingest half of the bucketing
  * story.
  *
  * At 100 TB the failure mode is not the transform but the write:
  * thousands of tiny files (one per task) or multi-GB monoliths that
  * downstream scans can't split. `writePartitioned` pins both ends:
  * directory partitioning by the pruning columns readers filter on,
  * `maxRecordsPerFile` to cap file size, and a repartition on the
  * partition columns so each directory is written by few tasks instead
  * of every task appending to every directory (the small-files
  * explosion: tasks × partitions files).
  */
object Ingest {

  def writePartitioned(df: DataFrame, path: String,
      partitionCols: Seq[String], maxRecordsPerFile: Long,
      sortCols: Seq[String] = Nil): Unit = {
    val reshaped = df
      .repartition(partitionCols.map(col): _*)
      .sortWithinPartitions((partitionCols ++ sortCols).map(col): _*)
    reshaped.write
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCols: _*)
      .mode("overwrite")
      .parquet(path)
  }
}
