package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Temporary stage-timing harness (deleted before commit). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val s = GraftSession.local("32")
    val dir = "/root/testdata/sf0.1"
    def time[A](nm: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $nm%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val v = Tables.embeddings(s, dir)
    time("count")(v.count())
    // stage 1: means
    val dims = v.select(col("vec_id"), posexplode(col("embedding")).as(Seq("i", "xf")))
      .select(col("i"), col("xf").cast(DoubleType).as("x"))
    val n = v.count()
    val means = time("means") {
      val m = dims.groupBy("i")
        .agg((sum(col("x").cast(DecimalType(38, 12))).cast(DoubleType) / lit(n)).as("m"))
        .localCheckpoint()
      m.count(); m
    }
    // stage 2: full covariance (the committed shape)
    val sxx = v
      .select(col("embedding"), posexplode(col("embedding")).as(Seq("i", "xif")))
      .select(col("i"), col("xif").cast(DoubleType).as("xi"),
        posexplode(col("embedding")).as(Seq("j", "xjf")))
      .groupBy(col("i"), col("j"))
      .agg(sum((col("xi") * col("xjf").cast(DoubleType)).cast(DecimalType(38, 12)))
        .cast(DoubleType).as("sx"))
    time("sxx-full")(sxx.localCheckpoint().count())
    // stage 2b: upper-triangle variant
    val sxxUt = v
      .select(col("embedding"), posexplode(col("embedding")).as(Seq("i", "xif")))
      .select(col("i"), col("xif").cast(DoubleType).as("xi"),
        posexplode(col("embedding")).as(Seq("j", "xjf")))
      .filter(col("j") >= col("i"))
      .groupBy(col("i"), col("j"))
      .agg(sum((col("xi") * col("xjf").cast(DoubleType)).cast(DecimalType(38, 12)))
        .cast(DoubleType).as("sx"))
    time("sxx-uppertri")(sxxUt.localCheckpoint().count())
    // stage 3: 8 power-iteration rounds on a precomputed cov frame
    val cov = sxx
      .join(broadcast(means.select(col("i"), col("m").as("mi"))), "i")
      .join(broadcast(means.select(col("i").as("j"), col("m").as("mj"))), "j")
      .select(col("i"), col("j"), (col("sx") / lit(n) - col("mi") * col("mj")).as("c"))
      .localCheckpoint()
    time("cov-materialize")(cov.count())
    var w = means.select(col("i"), lit(1.0).as("w")).localCheckpoint()
    time("power-8-rounds") {
      for (_ <- 1 to 8) {
        val u = cov
          .join(broadcast(w.select(col("i").as("j"), col("w").as("wj"))), "j")
          .groupBy("i")
          .agg(sum((col("c") * col("wj")).cast(DecimalType(38, 12))).cast(DoubleType).as("u"))
        val nrm = u.agg(
          sqrt(sum((col("u") * col("u")).cast(DecimalType(38, 12))).cast(DoubleType)).as("nrm"))
        w = u.crossJoin(broadcast(nrm))
          .select(col("i"), (col("u") / col("nrm")).as("w")).localCheckpoint()
      }
      w.count()
    }
    // stage 4: projection pass (the committed dims-join shape)
    val dims2 = v.select(col("vec_id"), posexplode(col("embedding")).as(Seq("i", "xf")))
      .select(col("vec_id"), col("i"), col("xf").cast(DoubleType).as("x"))
    time("project")(dims2
      .join(broadcast(means), "i")
      .join(broadcast(w), "i")
      .groupBy("vec_id")
      .agg(sum(((col("x") - col("m")) * col("w")).cast(DecimalType(38, 12)))
        .cast(DoubleType).as("p"))
      .localCheckpoint().count())
    s.stop()
  }
}
