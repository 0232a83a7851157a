package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries`/`oracleSql` are assembled from per-module [[Op]] lists; each op
  * id matches SURVEY.md §2's inventory (plus the scale-extension ids).
  */
object SparkEntry {

  /** All registered operators, one module per SURVEY.md §2 family. */
  def allOps: Seq[Op] =
    graft.ops.CoreOps.ops ++ graft.ops.ScalarOps.ops ++
      graft.ops.JoinOps.ops ++ graft.ops.AggOps.ops ++
      graft.ops.WindowOps.ops ++ graft.ops.ChunkOps.ops ++
      graft.ops.SourceSinkOps.ops ++ graft.ops.StreamOps.ops ++
      graft.ops.TextOps.ops ++ graft.ops.DedupOps.ops ++
      graft.ops.SimOps.ops ++ graft.ops.MultimodalOps.ops ++
      graft.ops.PipelineOps.ops ++ graft.ops.CurationOps.ops ++
      graft.ops.LayoutOps.ops

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    graft.ops.CoreOps.q1Agg.build(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allOps.map(o => o.id -> o.build).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allOps.flatMap(o => o.oracle.map(o.id -> _)).toMap
}
