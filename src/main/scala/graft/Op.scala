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

  /** Queries whose work is ELIMINATED under `count()` and must be
    * timed through the noop sink (materializes every column — the
    * cost a real consumer pays). Two shapes qualify: verdict shapes
    * (a left-outer join with a unique, otherwise-unreferenced right
    * side — Catalyst correctly drops the join and the whole banded
    * subtree) and pure projections (per-row transforms with no
    * row-count-changing or aggregating stage — column pruning under
    * count() deletes every computed expression, leaving a bare scan).
    * ONE list consumed by Bench AND ScaleProbe, so the two
    * instruments can never time the same query differently. */
  val fullyMaterialized: Set[String] = Set(
    "dedup_gate", "mm_resize", "mm_meta", "mm_frame_sample",
    "doc_chunking", "text_pii_redact", "embedding_quantize",
    "corpus_shuffle", "text_token_count", "text_stats", "text_langid",
    "text_fingerprint", "text_quality_gopher")
}
