package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided Parquet testdata (TESTDATA.md).
  *
  * All reads go through here so filter/column pushdown is uniform and the
  * nanosecond-timestamp handling of `events.ts` is decided in one place.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** `events.ts` canonicalizes to a LongType of epoch-nanos whatever the
    * file's physical type (DuckDB parity: `epoch_ns(ts)`). Generations of
    * the driver testdata have shipped it as INT64 TIMESTAMP(NANOS) — which
    * Spark reads as a nanos long only under the legacy flag — and as
    * TIMESTAMP(MICROS), which arrives as TIMESTAMP_NTZ; every downstream
    * op does integer bucket arithmetic on nanos, so the seam absorbs the
    * difference here. The NTZ value is interpreted in the session timezone
    * (pinned UTC by every entry point), matching DuckDB's naive-timestamp
    * epoch_ns.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = load(s, d, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => df
      case _ => df.withColumn("ts",
        org.apache.spark.sql.functions.expr(
          "unix_micros(cast(ts as timestamp)) * 1000"))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
