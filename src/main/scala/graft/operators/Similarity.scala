package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{Op, Tables}
import graft.functions.{round6, round6Sql}

/** Similarity search over the `embeddings` table (`Array[Float]`).
  *
  * `ann_bruteforce_topk` is the exact baseline: broadcast the (small)
  * query set against the corpus — map-side only, no shuffle until the
  * per-query top-k. `ann_lsh_topk` is the scale path: random-hyperplane
  * LSH buckets both sides so each query only scores its bucket.
  *
  * Dot products are reduced in DECIMAL(38,12) (exact, order-free) so
  * the DuckDB oracle sees bit-identical cosines — see SURVEY.md §4.
  */
object Similarity {

  /** Exact decimal dot product of two float-array columns. */
  def ddot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) =>
        (x.cast(DoubleType) * y.cast(DoubleType)).cast(DecimalType(38, 12))),
      lit(0).cast(DecimalType(38, 12)),
      (acc, x) => (acc + x).cast(DecimalType(38, 12)))

  def ddotSql(a: String, b: String): String =
    s"""CAST(list_sum(list_transform(list_zip($a, $b),
       |  x -> CAST(CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE) AS DECIMAL(38,12)))) AS DOUBLE)""".stripMargin

  def norm2Sql(a: String): String =
    s"""CAST(list_sum(list_transform($a,
       |  x -> CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(38,12)))) AS DOUBLE)""".stripMargin

  /** Attach squared L2 norm (computed once per vector, not per pair). */
  def withNorm2(emb: DataFrame): DataFrame =
    emb.withColumn("n2", ddot(col("embedding"), col("embedding")).cast(DoubleType))

  private def cosine(dot: Column, na2: Column, nb2: Column): Column =
    dot / (sqrt(na2) * sqrt(nb2))

  // --- ann_bruteforce_topk ---------------------------------------------

  private def annBruteforce(s: SparkSession, dir: String): DataFrame = {
    val v = withNorm2(Tables.embeddings(s, dir))
    val q = v.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"), col("n2").as("qn2"))
    val scored = v.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        cosine(ddot(col("q_emb"), col("embedding")).cast(DoubleType),
          col("qn2"), col("n2")).as("cos_raw"))
    val w = Window.partitionBy("query_id").orderBy(col("cos_raw").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        round6(col("cos_raw")).as("cos_sim"))
      .orderBy("query_id", "rank")
  }

  private val annBruteforceSql =
    s"""WITH v AS (
       |  SELECT vec_id, embedding, ${norm2Sql("embedding")} AS n2 FROM embeddings),
       |scored AS (
       |  SELECT q.vec_id AS query_id, v.vec_id AS neighbor_id,
       |         ${ddotSql("q.embedding", "v.embedding")} / (sqrt(q.n2) * sqrt(v.n2)) AS cos_raw
       |  FROM v q JOIN v ON q.vec_id < 10 AND v.vec_id <> q.vec_id),
       |ranked AS (
       |  SELECT query_id, neighbor_id, cos_raw,
       |         CAST(row_number() OVER (PARTITION BY query_id
       |           ORDER BY cos_raw DESC, neighbor_id) AS INTEGER) AS rank
       |  FROM scored)
       |SELECT query_id, neighbor_id, rank, ${round6Sql("cos_raw")} AS cos_sim
       |FROM ranked WHERE rank <= 5
       |ORDER BY query_id, rank""".stripMargin

  // --- ann_lsh_topk -----------------------------------------------------
  // 6 fixed random hyperplanes → 64 sign buckets; queries score only
  // their bucket. Hash family is code-local (not SQL-portable) →
  // rows-only oracle; SimilaritySpec checks recall vs brute force.

  private val planes: Array[Array[Double]] = {
    val rnd = new scala.util.Random(42)
    Array.fill(6)(Array.fill(64)(rnd.nextGaussian()))
  }

  private def bucketCol(emb: Column): Column =
    planes.zipWithIndex.map { case (pl, i) =>
      val dot = aggregate(
        zip_with(emb, typedLit(pl.toSeq), (x, y) => x.cast(DoubleType) * y),
        lit(0.0), (acc, x) => acc + x)
      when(dot > 0, lit(1 << i)).otherwise(lit(0))
    }.reduce(_ + _)

  private def annLsh(s: SparkSession, dir: String): DataFrame = {
    val v = withNorm2(Tables.embeddings(s, dir)).withColumn("bucket", bucketCol(col("embedding")))
    val q = v.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        col("n2").as("qn2"), col("bucket").as("q_bucket"))
    val scored = v.join(broadcast(q),
        col("bucket") === col("q_bucket") && col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        cosine(ddot(col("q_emb"), col("embedding")).cast(DoubleType),
          col("qn2"), col("n2")).as("cos_raw"))
    val w = Window.partitionBy("query_id").orderBy(col("cos_raw").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        round6(col("cos_raw")).as("cos_sim"))
      .orderBy("query_id", "rank")
  }

  val ops: Seq[Op] = Seq(
    Op("ann_bruteforce_topk", annBruteforce, Some(annBruteforceSql)),
    Op("ann_lsh_topk", annLsh, None))
}
