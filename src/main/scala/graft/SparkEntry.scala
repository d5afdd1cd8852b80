package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.Relational
import graft.functions.{Dedup, Multimodal, Similarity, TextAnalysis}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the union of every module's query map; each key has a
  * matching DuckDB `oracleSql` entry unless the op is not
  * SQL-expressible (hash/probe-dependent ops: dd_simhash, ss_ivf_topk
  * → the driver records a rows-only check and the ScalaTest specs
  * assert their semantics against the exact variants instead;
  * dd_minhash_lsh and ss_quantized_topk ARE oracle-checked — see their
  * scaladoc for the determinism argument).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ TextAnalysis.queries ++ Dedup.queries ++
      Similarity.queries ++ Multimodal.queries ++
      graft.pipeline.PipelineQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ TextAnalysis.oracles ++ Dedup.oracles ++
      Similarity.oracles ++ Multimodal.oracles ++
      graft.pipeline.PipelineQueries.oracles

  /** Registered queries tagged heavier-by-design (eager staged
    * execution) — the union over modules' tags; Bench derives its
    * round-comparable `shared_excludes` from THIS registry instead of
    * a hardcoded literal (round 20, r19 verdict #5). Only the dedup
    * module registers staged operators today. */
  def benchHeavy: Set[String] = Dedup.benchHeavy
}
