package graft

object Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    val df = Registry.queries("q1_partition_counts")(spark, "/root/testdata/sf0.001")
    df.printSchema()
    df.show(10, truncate = false)
    spark.stop()
  }
}
