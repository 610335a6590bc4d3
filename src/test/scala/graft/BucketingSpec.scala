package graft

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Bucketing

class BucketingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("bucketed join runs without shuffling either fact table") {
    Bucketing.ensureBucketedTables(spark, sf)
    // force the sort-merge path (orders would otherwise broadcast at
    // this test size) so the assertion is about bucketing, not size
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"), col("l_orderkey") === col("o_orderkey"))
        .select("l_orderkey", "o_orderstatus")
      val plan = joined.queryExecution.explainString(ExplainMode.fromString("formatted"))
      assert(plan.contains("SortMergeJoin"), plan.take(1200))
      // no Exchange between the scans and the join: buckets are co-located
      val joinSection = plan.substring(0, plan.indexOf("(1) Scan"))
      assert(!joinSection.contains("Exchange"),
        plan.linesIterator.filter(_.contains("Exchange")).mkString("\n"))

      // and the result matches the plain (shuffled) join
      val got = Bucketing.bucketedJoin(spark).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val want = Tables.lineitem(spark, sf)
        .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == want)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }
}
