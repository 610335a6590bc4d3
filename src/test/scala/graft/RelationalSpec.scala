package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RelationalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("r3 star join broadcasts every dimension") {
    val plan = Registry.queries("r3_revenue_by_region")(spark, sf)
      .queryExecution.executedPlan.toString
    // customer, nation, region must all arrive via broadcast, never shuffle
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 3, plan.take(2000))
  }

  test("r4 running totals are monotone within a customer") {
    val rows = Registry.queries("r4_window_running")(spark, sf)
      .select("o_custkey", "rn", "running_spend").collect()
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getInt(1)).map(_.getDouble(2))
      assert(sorted.zip(sorted.tail).forall { case (a, b) => b >= a })
    }
  }

  test("r6 as-of join: every matched quote precedes its trade") {
    val rows = Registry.queries("r6_asof_join")(spark, sf).collect()
    assert(rows.nonEmpty)
    // quote events must be 'view' events: check ids differ from trades
    rows.filter(!_.isNullAt(4)).foreach { r =>
      assert(r.getLong(4) != r.getLong(0))
    }
  }

  test("r8 salted aggregation matches the unsalted plan") {
    val salted = Registry.queries("r8_skew_salted_join")(spark, sf).collect()
    val o  = Tables.orders(spark, sf).select("o_orderkey", "o_orderstatus")
    val li = Tables.lineitem(spark, sf)
    val plain = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    salted.foreach { r =>
      assert(plain(r.getString(0)) == r.getLong(2), r.toString)
    }
  }
}
