package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

object Micro {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[micro] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
  }
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("8")
    val dir = "/root/testdata/sf0.1"
    val docs = Tables.documents(spark, dir)
    time("warmup")(spark.range(100000).selectExpr("sum(id)").collect())
    val toks = split(col("text"), " ")
    val n = size(toks)
    val idx = when(n >= 3, sequence(lit(1), n - 2)).otherwise(array().cast(ArrayType(IntegerType)))
    val sh = array_distinct(transform(idx, i =>
      concat_ws(" ", element_at(toks, i), element_at(toks, i + 1), element_at(toks, i + 2))))
    time("shingles explode count")(
      println(docs.select(col("doc_id"), col("source"), explode(sh).as("shingle")).count()))
    val shdf = docs.select(col("doc_id"), col("source"), explode(sh).as("shingle"))
    time("self join count")(
      println(shdf.as("a").join(shdf.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.source") === col("b.source") &&
        col("a.doc_id") < col("b.doc_id")).count()))
    val emb = Tables.embeddings(spark, dir)
    time("emb pair count")(
      println(emb.as("a").join(emb.as("b"),
        col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id")).count()))
    val dotD = aggregate(zip_with(col("a.embedding"), col("b.embedding"),
      (x, y) => x.cast(DoubleType) * y.cast(DoubleType)), lit(0.0), (acc, x) => acc + x)
    time("emb pair double-dot")(
      println(emb.as("a").join(emb.as("b"),
        col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
        .select(dotD.as("d")).filter(col("d") > 0.2).count()))
    val dotDec = operators.Similarity.ddot(col("a.embedding"), col("b.embedding"))
    time("emb pair decimal-dot")(
      println(emb.as("a").join(emb.as("b"),
        col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
        .select(dotDec.cast(DoubleType).as("d")).filter(col("d") > 0.2).count()))
    // t-digest reduce path: 10k partial merges into one accumulator,
    // swept over δ (centroid count ~2δ). Per-merge cost must scale
    // LINEARLY in δ — the pre-sized splice is O(c) per merge; the
    // earlier element-wise Array :+ was O(c²), which a δ sweep exposes
    // as per-merge µs growing ~4× per δ doubling instead of ~2×.
    for (delta <- Seq(100, 200, 400, 800)) {
      val tdAgg = plans.TDigestSketch(
        org.apache.spark.sql.catalyst.expressions.Literal(0.0), delta, Seq(0.5))
      val t0 = System.nanoTime()
      val acc = new plans.TDigestBuffer(delta)
      var i = 0
      while (i < 10000) {
        val part = new plans.TDigestBuffer(delta)
        var j = 0
        while (j < 400) {
          part.add((((i * 400L + j) * 2654435761L) % 100000L).toDouble / 7.0)
          j += 1
        }
        tdAgg.merge(acc, part)
        i += 1
      }
      val el = (System.nanoTime() - t0) / 1e9
      println(f"[micro] tdigest 10k merges δ=$delta%-4d: $el%.2f s " +
        f"(${el * 1e6 / 10000}%.1f µs/merge, centroids=${acc.means.length})")
    }
    spark.stop()
  }
}
