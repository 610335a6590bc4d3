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

  // --- ann_ivf_topk -----------------------------------------------------
  // IVF (inverted-file) index: k-means coarse quantizer → vectors
  // assigned to their nearest centroid's posting list → queries probe
  // the 2 nearest lists only. Everything is DataFrame-native: the
  // centroid table is itself a (tiny, broadcast) DataFrame, Lloyd
  // iterations are join+aggregate rounds, and assignment picks
  // max_by(score) over the k candidate centroids — no driver-side
  // vector math, no literal-array codegen blowup. Deterministic:
  // init = the first k vectors by vec_id. Rows-only oracle; recall vs
  // brute force asserted in SimilaritySpec.

  private val IvfK = 10
  private val IvfProbes = 2
  private val LloydIters = 5

  /** score monotone in -||x-c||²: c·x − ||c||²/2. */
  private def centScore(emb: Column, cent: Column, cn2: Column): Column = {
    import graft.plans.VecDotProduct.vec_dot
    vec_dot(emb, cent) - cn2 / 2.0
  }

  private def withCentNorm(cents: DataFrame): DataFrame =
    cents.withColumn("cn2", ddot(col("cent"), col("cent")).cast(DoubleType))

  /** nearest-centroid assignment: broadcast the k-row centroid table,
    * score every (vector, centroid) pair, keep the argmax. */
  private def assign(v: DataFrame, cents: DataFrame): DataFrame =
    v.crossJoin(broadcast(withCentNorm(cents)))
      .groupBy("vec_id")
      .agg(max_by(col("cid"),
        struct(centScore(col("embedding"), col("cent"), col("cn2")), -col("cid"))).as("list_id"))

  /** k-means training as join+aggregate rounds; centroids never leave
    * the cluster. */
  private def trainCentroids(v: DataFrame): DataFrame = {
    var cents = v.filter(col("vec_id") < IvfK)
      .select(col("vec_id").cast("int").as("cid"), col("embedding").as("cent"))
      .localCheckpoint()
    for (_ <- 1 to LloydIters) {
      val assigned = assign(v, cents)
      cents = v.join(assigned, "vec_id")
        .select(col("list_id").as("cid"), posexplode(col("embedding")).as(Seq("d", "x")))
        .groupBy("cid", "d").agg(avg(col("x")).as("m"))
        .groupBy("cid")
        .agg(transform(array_sort(collect_list(struct(col("d"), col("m")))),
          e => e.getField("m").cast("float")).as("cent"))
        .localCheckpoint()
    }
    cents
  }

  private def annIvf(s: SparkSession, dir: String): DataFrame = {
    graft.plans.VecDotProduct.register(s)
    val v = withNorm2(Tables.embeddings(s, dir))
    val cents = trainCentroids(v)
    val indexed = v.join(broadcast(assign(v, cents)), "vec_id")
    // each query probes its IvfProbes nearest centroid lists
    val pw = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("cid"))
    val probes = v.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"), col("n2").as("qn2"))
      .crossJoin(broadcast(withCentNorm(cents)))
      .withColumn("score", centScore(col("q_emb"), col("cent"), col("cn2")))
      .withColumn("pr", row_number().over(pw))
      .filter(col("pr") <= IvfProbes)
      .select(col("query_id"), col("q_emb"), col("qn2"), col("cid").as("probe"))
    val scored = indexed.join(broadcast(probes),
        col("list_id") === col("probe") && col("vec_id") =!= col("query_id"))
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
    Op("ann_lsh_topk", annLsh, None),
    Op("ann_ivf_topk", annIvf, None))
}
