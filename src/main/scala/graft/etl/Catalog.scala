package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The reference's catalog layer (sql/athena_create_trades_tales.sql +
  * sql/athena_repair_partitions.sql) re-expressed on Spark's catalog:
  * an external partitioned table over the parquet lake plus partition
  * discovery (`MSCK REPAIR TABLE` — same statement Athena uses), which
  * is what turns the Hive layout into partition-pruned scans for every
  * SQL consumer. */
object Catalog {

  /** CREATE EXTERNAL TABLE over a partitioned trades lake
    * (athena_create_trades_tales.sql:5-27). */
  def createTradesTable(spark: SparkSession, name: String, location: String): Unit =
    spark.sql(
      s"""CREATE TABLE IF NOT EXISTS $name (
         |  trade_id BIGINT,
         |  trade_time TIMESTAMP_NTZ,
         |  price DOUBLE,
         |  quantity DOUBLE,
         |  quote_qty DOUBLE,
         |  is_buyer_maker BOOLEAN,
         |  is_best_match BOOLEAN,
         |  load_dt DATE,
         |  year INT,
         |  month INT,
         |  day INT,
         |  symbol STRING
         |) USING PARQUET
         |PARTITIONED BY (year, month, day, symbol)
         |LOCATION '$location'""".stripMargin)

  /** Partition discovery (athena_repair_partitions.sql): scans the lake
    * layout and registers every partition in the catalog. */
  def repairPartitions(spark: SparkSession, name: String): Unit =
    spark.sql(s"MSCK REPAIR TABLE $name")

  /** Register + discover in one call; returns the partition listing
    * (SHOW PARTITIONS — the reference's verification step). */
  def register(spark: SparkSession, name: String, location: String): DataFrame = {
    createTradesTable(spark, name, location)
    repairPartitions(spark, name)
    spark.sql(s"SHOW PARTITIONS $name")
  }
}
