package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Source/sink breadth: every format the engine supports round-trips
  * the events feed with schema + values intact. (Avro is absent from
  * this container's Spark distribution; JDBC has no database here.) */
class SourcesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  private def events = Tables.events(spark, sf)
    .select(col("event_id"), col("ts").cast("timestamp").as("ts"),
      col("user_id"), col("event_type"), col("value"))

  test("json round-trip preserves schema and values") {
    val path = "target/tmp/sources-json"
    events.write.mode("overwrite").json(path)
    val back = spark.read.schema(events.schema).json(path)
    assert(back.count() == events.count())
    assert(back.agg(sum("event_id")).head.getLong(0) ==
      events.agg(sum("event_id")).head.getLong(0))
  }

  test("orc round-trip preserves schema and values") {
    val path = "target/tmp/sources-orc"
    events.write.mode("overwrite").orc(path)
    val back = spark.read.orc(path)
    assert(back.schema == events.schema)
    assert(back.count() == events.count())
  }

  test("csv round-trip with header and explicit schema") {
    val path = "target/tmp/sources-csv"
    events.write.mode("overwrite").option("header", "true")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS").csv(path)
    val back = spark.read.option("header", "true").schema(events.schema)
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS").csv(path)
    assert(back.count() == events.count())
    val a = back.agg(sum("value")).head.getDouble(0)
    val b = events.agg(sum("value")).head.getDouble(0)
    assert(math.abs(a - b) < 1e-6)
  }
}
