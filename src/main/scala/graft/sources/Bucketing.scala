package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Bucketed-table layout for shuffle-free fact-to-fact joins.
  *
  * At 100 TB the lineitem⋈orders join is the dominant shuffle; writing
  * both tables bucketed AND sorted by the join key once means every
  * subsequent join is a zip of co-located, pre-sorted buckets — no
  * Exchange, no Sort, just the merge. This is the batch analog of the
  * reference lake's partition pruning: pay the layout cost at write
  * time, win on every read.
  */
object Bucketing {

  val Buckets = 8

  /** Writes lineitem + orders as bucketed, sorted managed tables
    * (idempotent). The default in-memory catalog forgets tables across
    * JVMs while their warehouse directories persist, so a stale
    * location is cleared before re-creating. */
  def ensureBucketedTables(spark: SparkSession, dir: String): Unit = {
    def clearStaleLocation(table: String): Unit = {
      val loc = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), table)
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles.foreach(rm)
          f.delete()
        }
        rm(loc)
      }
    }
    if (!spark.catalog.tableExists("li_bucketed")) {
      clearStaleLocation("li_bucketed")
      Tables.lineitem(spark, dir)
        .write.bucketBy(Buckets, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("li_bucketed")
    }
    if (!spark.catalog.tableExists("ord_bucketed")) {
      clearStaleLocation("ord_bucketed")
      Tables.orders(spark, dir)
        .write.bucketBy(Buckets, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("ord_bucketed")
    }
  }

  /** Revenue per order status via the bucketed layout — the join plan
    * must contain no shuffle on the join key. */
  def bucketedJoin(spark: SparkSession): DataFrame =
    spark.table("li_bucketed")
      .join(spark.table("ord_bucketed"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"))
      .orderBy("o_orderstatus")
}
