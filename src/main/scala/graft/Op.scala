package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One operator from SURVEY.md §2: a Spark-first implementation plus
  * (when SQL-expressible) its DuckDB oracle for the driver's
  * correctness gate. */
final case class Op(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Registry {
  def ops: Seq[Op] =
    graft.operators.MarketQueries.ops ++
    graft.operators.RelationalQueries.ops ++
    graft.operators.Dedup.ops ++
    graft.operators.Similarity.ops ++
    graft.operators.TextAnalysis.ops ++
    graft.operators.Curation.ops ++
    graft.operators.Multimodal.ops ++
    graft.streaming.BatchEquivalents.ops

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ops.map(o => o.name -> o.fn).toMap

  def oracleSql: Map[String, String] =
    ops.flatMap(o => o.oracle.map(o.name -> _)).toMap
}
