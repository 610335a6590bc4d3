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
    // t-digest reduce path: 10k partial merges into one accumulator.
    // Cost must stay flat per merge (pre-sized splice); the earlier
    // element-wise Array :+ made this O(centroids²) per merge.
    val tdAgg = plans.TDigestSketch(
      org.apache.spark.sql.catalyst.expressions.Literal(0.0), 100, Seq(0.5))
    time("tdigest 10k partial merges (δ=100, 400 points each)") {
      val acc = new plans.TDigestBuffer(100)
      var i = 0
      while (i < 10000) {
        val part = new plans.TDigestBuffer(100)
        var j = 0
        while (j < 400) {
          part.add((((i * 400L + j) * 2654435761L) % 100000L).toDouble / 7.0)
          j += 1
        }
        tdAgg.merge(acc, part)
        i += 1
      }
      println(s"total=${acc.total} centroids=${acc.means.length}")
    }
    spark.stop()
  }
}
