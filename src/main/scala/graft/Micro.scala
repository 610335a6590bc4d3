package graft

/** Scratch micro-measurement main (per-round body; prior rounds'
  * numbers live in MICRO_r07.txt / PROBE_r*.txt). Round-13 body
  * decomposes embedding_pca — the slowest bench row (~14 s at sf0.1,
  * stable across reps, so not VM weather) — by iteration count: the
  * iters=0 run is the two corpus passes (d×d moment matrix +
  * projection) and the fixed overhead; the marginal cost per extra
  * power-iteration round isolates the metadata-scale loop's
  * job-scheduling + checkpoint overhead from real compute. */
object Micro {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[micro] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
  }
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    time("warmup")(spark.range(100000).selectExpr("sum(id)").collect())
    val dir = "/root/testdata/sf0.1"
    val v = Tables.embeddings(spark, dir)
    val n = v.count()
    for (iters <- Seq(0, 1, 2, 8); rep <- 1 to 2)
      time(s"pca iters=$iters rep$rep")(
        operators.Similarity.pcaOver(v, n, iters)
          .write.mode("overwrite").format("noop").save())
    // stage isolation: the raw d×d moment pass, double vs decimal sums
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    def sxxD(sumCast: org.apache.spark.sql.Column => org.apache.spark.sql.Column) = v
      .select(col("embedding"), posexplode(col("embedding")).as(Seq("i", "xif")))
      .select(col("i"), col("xif").cast(DoubleType).as("xi"),
        posexplode(col("embedding")).as(Seq("j", "xjf")))
      .groupBy(col("i"), col("j"))
      .agg(sumCast(col("xi") * col("xjf").cast(DoubleType)).as("sx"))
    for (rep <- 1 to 2) {
      time(s"sxx decimal rep$rep")(
        sxxD(c => sum(c.cast(DecimalType(38, 12))).cast(DoubleType))
          .write.mode("overwrite").format("noop").save())
      time(s"sxx double  rep$rep")(
        sxxD(c => sum(c)).write.mode("overwrite").format("noop").save())
      time(s"explode-only rep$rep")(
        v.select(col("embedding"), posexplode(col("embedding")).as(Seq("i", "xif")))
          .select(col("i"), col("xif").cast(DoubleType).as("xi"),
            posexplode(col("embedding")).as(Seq("j", "xjf")))
          .agg(sum(col("i")), sum(col("xjf")))
          .write.mode("overwrite").format("noop").save())
    }
    // mm_audio_vad energy derivation: the retired interpreted HOF
    // chain (aggregate/transform/split per frame) vs the codegen'd
    // FrameEnergies loop, frame stream only (no downstream agg)
    graft.plans.FrameEnergies.register(spark)
    val docs = Tables.documents(spark, dir)
    val payload = col("text").cast(org.apache.spark.sql.types.BinaryType)
    val fb = 256
    for (rep <- 1 to 2) {
      time(s"vad energies interpreted rep$rep") {
        val nFrames = ceil(length(payload).cast(DoubleType) / fb)
          .cast(org.apache.spark.sql.types.IntegerType)
        val frame = col("payload").substr(col("frame_idx") * fb + 1, lit(fb))
        docs.withColumn("payload", payload)
          .withColumn("frame_idx",
            explode(when(nFrames > 0, sequence(lit(0), nFrames - 1))
              .otherwise(array().cast("array<int>"))))
          .select(col("doc_id"), col("frame_idx"),
            aggregate(transform(split(frame.cast(org.apache.spark.sql.types.StringType), ""),
                c => when(length(c) > 0,
                  (ascii(c) - 128).cast(org.apache.spark.sql.types.LongType) * (ascii(c) - 128))
                  .otherwise(lit(0L))),
              lit(0L), (acc, x) => acc + x).as("num"))
          .write.mode("overwrite").format("noop").save()
      }
      time(s"vad energies codegen     rep$rep")(
        docs.select(col("doc_id"), posexplode(
            graft.plans.FrameEnergies.frame_energies(payload, fb))
          .as(Seq("frame_idx", "num")))
          .write.mode("overwrite").format("noop").save())
    }
    spark.stop()
  }
}
