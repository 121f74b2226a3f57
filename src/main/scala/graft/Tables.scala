package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated testdata tables (see TESTDATA.md).
  *
  * Every operator in this library takes `(SparkSession, sfDir)` and reads
  * only via these loaders, so the scan layer is a single choke point: at
  * cluster scale this is where bucketing specs / catalog tables would be
  * substituted for raw parquet paths without touching any operator code.
  */
object Tables {
  /** The generator has shipped timestamps as µs-with-UTC, ns-as-long and
    * (currently) tz-less µs across rounds; Spark 4 reads the tz-less form
    * as TIMESTAMP_NTZ, which half the timestamp functions (`unix_micros`,
    * watermarks, ...) reject. Normalize every NTZ column to plain
    * TimestampType here — all sessions this library builds run in UTC, so
    * the NTZ wall-clock and the LTZ instant coincide and DuckDB (which
    * reads the same files as naive µs timestamps) stays value-identical.
    */
  private def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val raw = spark.read.parquet(s"$dir/$name.parquet")
    val ntz = raw.schema.fields.filter(_.dataType == TimestampNTZType)
    ntz.foldLeft(raw)((df, f) => df.withColumn(f.name, col(f.name).cast(TimestampType)))
  }

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** `events.ts` is nanosecond parquet, which Spark 4 only reads with
    * `spark.sql.legacy.parquet.nanosAsLong=true` (set in every session this
    * library builds). Truncate nanos → micros here so downstream operators
    * see a plain TimestampType, exactly matching DuckDB's ns→µs read.
    *
    * POST-EPOCH CONTRACT: every epoch-day/dow bucketing in this library
    * (`unix_micros(ts) div 86400000000` in q91/q95/q97/q107/q112/q128/q137/
    * q142/q149/rollups) uses Spark's `div`, which truncates toward zero,
    * where DuckDB's `//` floors — the two agree ONLY for ts >= 1970-01-01.
    * The generator's data is all post-epoch (asserted by a spec on this
    * loader); a deployment with pre-epoch timestamps must swap `div` for a
    * floor-div before the oracle parity claim holds.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = load(s, d, "events")
    if (raw.schema("ts").dataType == LongType)
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
