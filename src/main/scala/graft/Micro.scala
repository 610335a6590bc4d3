package graft

/** Scratch micro-measurement main. Round-7 shingle/pair numbers are
  * committed as MICRO_r07.txt; current body decomposes the kNN-graph
  * edge bootstrap (the one @build exhibit with a big x16 overshoot:
  * PROBE_r11 measured 92x at 128 initial partitions and 87x at 1024,
  * so partition width is NOT the constraint) into its two stages at
  * both probe scales: multiprobe pairing + exact top-k, then the
  * symmetrize + distinct on top. */
object Micro {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[micro] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
  }
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("16")
    time("warmup")(spark.range(100000).selectExpr("sum(id)").collect())
    graft.plans.VecDotProduct.register(spark)
    for (dir <- Seq("/root/testdata/sf0.1", "target/tmp/scale16")) {
      val vn = operators.Similarity
        .withNorm2(Tables.embeddings(spark, dir)).localCheckpoint()
      time(s"multiprobe pairing + exact top-k  $dir")(
        operators.Similarity.knnMultiprobeOver(spark, vn)
          .write.mode("overwrite").format("noop").save())
      time(s"edges (+symmetrize +distinct)     $dir")(
        operators.Similarity.knnEdgesOver(spark, vn)
          .write.mode("overwrite").format("noop").save())
    }
    spark.stop()
  }
}
