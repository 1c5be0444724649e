package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated fixture tables
  * (`/root/testdata/sf*`; see TESTDATA.md / FIXTURES.md).
  *
  * All loaders return plain DataFrames so Catalyst can push filters and
  * prune columns into the Parquet scans. The only impedance mismatch is
  * `events.ts`, stored as parquet TIMESTAMP(NANOS) which Spark's vectorized
  * reader rejects; we read it as nanosecond longs
  * (`spark.sql.legacy.parquet.nanosAsLong`) and derive a microsecond
  * TimestampType column, truncating exactly like DuckDB's
  * `CAST(ts AS TIMESTAMP)` (floor for post-epoch values).
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")

  /** The ns-long `ts` column -> microsecond TimestampType. Integer
    * division — `/` would promote to DOUBLE and ns-since-epoch (~1.7e18)
    * exceeds double's 2^53 integer precision (±1µs drift). Shared by the
    * batch loader and both streaming read paths so the precision rule
    * lives in exactly one place.
    */
  def nsTsToMicros: org.apache.spark.sql.Column =
    timestamp_micros(expr("ts div 1000"))

  /** `events` with `ts` converted ns-long -> microsecond timestamp. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(spark, dir, "events").withColumn("ts", nsTsToMicros)
  }
}
