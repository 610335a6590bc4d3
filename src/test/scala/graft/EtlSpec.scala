package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.MarketEtl

/** Exercises the reference-shaped ETL end-to-end on a synthetic
  * Hive-partitioned CSV lake written under target/. */
class EtlSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  val base = "target/tmp/etl-lake"

  def writeCsvLake(): Unit = {
    // two symbols × one month, Binance trades CSV layout (no header):
    // trade_id,price,quantity,quote_qty,time(epoch ms),is_buyer_maker,is_best_match
    val rows = Map(
      "BTCUSDT" -> Seq(
        "1,50000.0,0.5,25000.0,1721995200000,True,True",
        "2,50010.0,1.0,50010.0,1721995260000,False,True",
        "3,-1.0,1.0,-1.0,1721995320000,True,True",      // DQ: negative price
        "4,50020.0,0.0,0.0,1721995380000,True,True"),   // DQ: zero qty
      "ETHUSDT" -> Seq(
        "10,3000.0,2.0,6000.0,1721995200000,False,False",
        "11,3001.5,4.0,12006.0,1721995500000,True,False"))
    rows.foreach { case (sym, lines) =>
      val dir = Paths.get(s"$base/symbol=$sym/year=2024/month=07")
      Files.createDirectories(dir)
      Files.writeString(dir.resolve(s"$sym-trades-2024-07.csv"),
        lines.mkString("\n"))
    }
  }

  test("csv lake → normalize → DQ → partitioned parquet round-trip") {
    writeCsvLake()
    val out = "target/tmp/etl-out"
    MarketEtl.run(spark, base, out)

    val back = spark.read.parquet(out)
    // 6 input rows, 2 dropped by DQ
    assert(back.count() == 4)
    // partition metadata recovered from paths and survives the lake layout
    val parts = back.select("year", "month", "day", "symbol").distinct().collect()
    assert(parts.forall(_.getInt(0) == 2024))
    assert(back.filter(col("symbol") === "BTCUSDT").count() == 2)
    // boolean normalization
    assert(back.schema("is_buyer_maker").dataType.typeName == "boolean")
    // timestamp conversion: epoch ms 1721995200000 = 2024-07-26T12:00:00
    val t = back.filter(col("trade_id") === 1).select(date_format(col("trade_time"), "yyyy-MM-dd HH:mm:ss")).head.getString(0)
    assert(t == "2024-07-26 12:00:00")
  }

  test("catalog: external table + partition discovery + pruned SQL scan") {
    // depends on the lake written by the round-trip test
    writeCsvLake()
    val out = "target/tmp/etl-out-catalog"
    graft.etl.MarketEtl.run(spark, base, out)
    val parts = graft.etl.Catalog.register(
      spark, "trades_lake", new java.io.File(out).getAbsolutePath)
    assert(parts.count() == 2) // one (y,m,d,symbol) partition per symbol
    val viaSql = spark.sql(
      "SELECT count(*) FROM trades_lake WHERE symbol = 'BTCUSDT' AND year = 2024")
    // the partition predicate must prune at planning time, not filter rows
    val plan = viaSql.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("symbol") && plan.contains("PartitionFilters"), plan.take(1200))
    assert(viaSql.head.getLong(0) == 2)
  }

  test("DQ calendar predicate rejects impossible dates incl. leap-year") {
    import graft.functions.validCalendar
    val df = spark.range(1).select(
      validCalendar(lit(2023), lit(2), lit(29)).as("feb29_2023"),
      validCalendar(lit(2024), lit(2), lit(29)).as("feb29_2024"),
      validCalendar(lit(1900), lit(2), lit(29)).as("feb29_1900"),
      validCalendar(lit(2000), lit(2), lit(29)).as("feb29_2000"),
      validCalendar(lit(2024), lit(9), lit(31)).as("sep31"),
      validCalendar(lit(2024), lit(12), lit(31)).as("dec31"),
      validCalendar(lit(2024), lit(1), lit(0)).as("day0"))
    val r = df.head
    assert(!r.getBoolean(0)); assert(r.getBoolean(1))
    assert(!r.getBoolean(2)); assert(r.getBoolean(3))
    assert(!r.getBoolean(4)); assert(r.getBoolean(5))
    assert(!r.getBoolean(6))
  }

  test("malformed CSV rows survive the read as nulls and die at the DQ gate") {
    val dir = Paths.get(s"$base-corrupt/symbol=XXXUSDT/year=2024/month=07")
    Files.createDirectories(dir)
    Files.writeString(dir.resolve("XXXUSDT-trades-2024-07.csv"),
      Seq(
        "1,100.0,1.0,100.0,1721995200000,True,True",
        "garbage,not,a,number,row,True,True",        // malformed numerics
        "totally broken line",                        // wrong arity
        "2,101.0,2.0,202.0,1721995260000,False,True").mkString("\n"))
    val raw = graft.etl.MarketEtl.readTradesCsv(spark, s"$base-corrupt")
    assert(raw.count() == 4) // permissive read keeps all rows
    val clean = graft.etl.MarketEtl.dqFilter(graft.etl.MarketEtl.normalize(raw))
    assert(clean.count() == 2) // DQ drops both malformed rows
    assert(clean.select("trade_id").collect().map(_.getLong(0)).sorted.sameElements(Array(1L, 2L)))
  }

  test("distributed zip ingest extracts and parses archived CSVs") {
    import java.util.zip.{ZipEntry, ZipOutputStream}
    val zipDir = Paths.get("target/tmp/zip-lake")
    Files.createDirectories(zipDir)
    for (sym <- Seq("AAAUSDT", "BBBUSDT")) {
      val zos = new ZipOutputStream(Files.newOutputStream(zipDir.resolve(s"$sym-trades.zip")))
      zos.putNextEntry(new ZipEntry(s"$sym-trades-2024-07.csv"))
      val rows = (1 to 100).map(i =>
        s"$i,${100.0 + i},1.5,${(100.0 + i) * 1.5},${1721995200000L + i * 1000},True,False")
      zos.write(rows.mkString("\n").getBytes("UTF-8"))
      zos.closeEntry(); zos.close()
    }
    val df = graft.etl.ZipIngest.readZippedCsv(
      spark, "target/tmp/zip-lake", graft.etl.MarketEtl.tradesCsvSchema)
    assert(df.count() == 200)
    assert(df.select("archive").distinct().count() == 2)
    val r = df.filter(col("trade_id") === 7 && col("archive").contains("AAAUSDT")).head
    assert(r.getAs[Double]("price") == 107.0)
    assert(r.getAs[String]("is_buyer_maker") == "True")
  }

  test("partition audit groups by lake partition columns") {
    val audit = MarketEtl.partitionAudit(
      MarketEtl.dqFilter(MarketEtl.normalize(MarketEtl.readTradesCsv(spark, base))))
    val rows = audit.collect()
    assert(rows.length == 2) // one (y,m,d,symbol) group per symbol here
    assert(rows.map(_.getAs[Long]("count")).sum == 4)
  }
}
