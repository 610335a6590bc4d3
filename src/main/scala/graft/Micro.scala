package graft

/** Scratch micro-measurement main (per-round body; prior rounds'
  * numbers live in MICRO_r07.txt / PROBE_r*.txt). Round-15 body
  * attributes mm_phash_neardup's sf0.1 regression (r13 5.0 s → r14
  * 8.5 s, same round that memoized the signature table inside
  * simhashChunkPairs): decomposes the op into the signature build
  * (per-byte grams → md5 → 64 bit-votes) and the banded self-join,
  * and times the pair pipeline with and without the sig
  * materialization — if Spark's ReuseExchange already shares the
  * aggregation between the two identical self-join sides, the
  * checkpoint is pure overhead at this scale and the memoization
  * should gate on corpus size.
  */
object Micro {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[micro] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
  }
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    time("warmup")(spark.range(100000).selectExpr("sum(id)").collect())
    val dir = "/root/testdata/sf0.1"
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    val docs = Tables.documents(spark, dir)
      .withColumn("payload", col("text").cast(org.apache.spark.sql.types.BinaryType))
    for (rep <- 1 to 3) {
      time(s"phash sigs only        rep$rep")(
        noop(operators.Multimodal.phashSigsOf(spark, docs)))
      time(s"phash pairs MEMOIZED   rep$rep")(
        noop(operators.Multimodal.phashPairsOf(spark, docs, 16)))
      time(s"phash pairs UNMATERIAL rep$rep")(
        noop(operators.Multimodal.phashPairsOf(spark, docs, 16, identity)))
    }
    spark.stop()
  }
}
