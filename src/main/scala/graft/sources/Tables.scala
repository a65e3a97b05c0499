package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the driver-generated star schema (TESTDATA.md).
  *
  * Mirrors the reference's Source contract (`core/base.py:77-131`): a source is a
  * named, lazily-read, partitioned collection. Here each table is a parquet scan
  * whose partitioning comes from the file layout; Catalyst handles column pruning
  * and predicate pushdown at the scan (SURVEY §4).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "region")
  /** The driver has shipped `events.ts` under two parquet encodings across
    * rounds: TIMESTAMP(NANOS) (which Spark only reads as a long, under
    * `nanosAsLong`) and TIMESTAMP(MICROS) with isAdjustedToUTC=false (which
    * Spark reads as TIMESTAMP_NTZ). Normalize either to a plain µs
    * TimestampType column — both conversions are lossless (the data carries
    * µs precision) and epoch-exact under the UTC session timezone every
    * entry point pins.
    */
  def normalizeTs(df: DataFrame, c: String = "ts"): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    df.schema(c).dataType match {
      case LongType =>
        df.withColumn(c, timestamp_micros(expr(s"`$c` div 1000")))
      case TimestampNTZType =>
        df.withColumn(c, col(c).cast(TimestampType))
      case _ => df
    }
  }

  def events(spark: SparkSession, dir: String): DataFrame = {
    // idempotent guard: set once per session, not a mutation per call
    if (!spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"))
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(table(spark, dir, "events"))
  }
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}
