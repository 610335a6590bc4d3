package graft

object Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    val name = args.headOption.getOrElse("q1_partition_counts")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val reps = if (args.length > 2) args(2).toInt else 1
    val df = Registry.queries(name)(spark, dir)
    df.explain("formatted")
    for (i <- 1 to reps) {
      val t0 = System.nanoTime()
      println(s"rows: ${Registry.queries(name)(spark, dir).count()}")
      println(f"time[$i]: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
