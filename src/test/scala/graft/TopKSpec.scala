package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The transparent heap top-k rewrite: same declarative query, custom
  * physical operator under extensions, identical results. */
class TopKSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  private def topkQuery(s: SparkSession) = {
    val o = Tables.orders(s, sf)
    val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
    o.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
  }

  test("extensions swap the window sort for TopKPerGroupExec, same rows") {
    val want = topkQuery(spark).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet

    val saved = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[4]")
        .appName("graft-topk-test")
        .withExtensions(new graft.plans.GraftExtensions)
        .config(graft.plans.TopKPerGroup.EnabledKey, "true") // rewrite is opt-in
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      val df = topkQuery(s2)
      val plan = df.queryExecution.executedPlan.toString
      // nodeName strips the Exec suffix in plan strings
      assert(plan.contains("TopKPerGroup"), plan.take(1500))
      assert(!plan.contains("Window "), "window operator should be gone:\n" + plan.take(1500))
      // (AdaptiveSparkPlanExec hides the inner plan from `exists`; the
      // string match above plus successful execution below prove the
      // custom operator planned and ran — an unplanned logical node
      // would throw at execute())
      val got = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
      assert(got == want,
        s"only-topk=${(got -- want).take(3)} only-window=${(want -- got).take(3)}")

      // spill-safe sorted mode: same rows, the planner's (spillable)
      // SortExec owns memory and the operator streams first-k-per-group
      s2.conf.set(graft.plans.TopKPerGroup.ModeKey, "sorted")
      try {
        val dfSorted = topkQuery(s2)
        val planSorted = dfSorted.queryExecution.executedPlan.toString
        assert(planSorted.contains("TopKPerGroup"), planSorted.take(1500))
        assert(planSorted.contains("Sort "), "sorted mode should require a sort:\n" +
          planSorted.take(1500))
        val gotSorted = dfSorted.collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
        assert(gotSorted == want,
          s"only-sorted=${(gotSorted -- want).take(3)} only-window=${(want -- gotSorted).take(3)}")
      } finally s2.conf.set(graft.plans.TopKPerGroup.ModeKey, "heap")
    } finally {
      saved.foreach { s =>
        SparkSession.setDefaultSession(s)
        SparkSession.setActiveSession(s)
      }
    }
  }

  test("marker alias scopes the rewrite to one plan; the session gate stays off") {
    val mk = graft.plans.TopKPerGroup.MarkerPrefix
    graft.plans.TopKPerGroup.install(spark)
    assert(spark.conf.getOption(graft.plans.TopKPerGroup.EnabledKey).forall(_ != "true"),
      "install() must not flip the session-wide gate")

    // a marked rank filter gets the heap operator…
    val o = Tables.orders(spark, sf)
    val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val marked = o.withColumn(s"${mk}rn", row_number().over(w))
      .filter(col(s"${mk}rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col(s"${mk}rn").as("rn"))
    assert(marked.queryExecution.executedPlan.toString.contains("TopKPerGroup"))

    // …while the identical unmarked query in the same session keeps the
    // stock spillable Window plan (this is what building an ANN
    // DataFrame must NOT change)
    val plain = topkQuery(spark)
    val plainPlan = plain.queryExecution.executedPlan.toString
    assert(!plainPlan.contains("TopKPerGroup"), plainPlan.take(1500))
    assert(plainPlan.contains("Window"), plainPlan.take(1500))

    // and the marked plan returns exactly the window-plan rows
    val want = plain.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    val got = marked.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == want)
  }

  test("building an ANN query leaves the session gate off") {
    val before = spark.conf.getOption(graft.plans.TopKPerGroup.EnabledKey)
    // exercised for the side effect: exactTopK used to flip the session
    // conf, silently switching every later rank-filter query onto the
    // non-spilling heap operator
    SparkEntry.queries("ann_bruteforce_topk")(spark, sf).collect()
    val after = spark.conf.getOption(graft.plans.TopKPerGroup.EnabledKey)
    assert(after.forall(_ != "true"), s"ANN build flipped $before -> $after")
    val plainPlan = topkQuery(spark).queryExecution.executedPlan.toString
    assert(!plainPlan.contains("TopKPerGroup"), plainPlan.take(1500))
  }
}
