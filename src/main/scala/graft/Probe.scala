package graft

object Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    val name = args.headOption.getOrElse("q1_partition_counts")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val df = Registry.queries(name)(spark, dir)
    df.explain("formatted")
    val t0 = System.nanoTime()
    println(s"rows: ${df.count()}")
    println(f"time: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
