package graft

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The end-to-end ETL shape of the reference pipeline, Spark-first:
  * ingest raw delimited files → normalize/clean → exact-dedupe → derive
  * trip metrics → publish partitioned parquet.
  *
  * Every stage is a pure DataFrame→DataFrame function so the whole run is
  * one lazy plan: Catalyst fuses the clean/derive projections into the
  * scan, and the only wide operations are the dedupe (shuffle on the key)
  * and the final partitioned write. At 100 TB each stage scales by
  * partition count alone — no driver-side state.
  */
object Pipeline {

  /** Raw-events CSV schema (the ingest contract; extra/bad fields land in
    * `_corrupt`).
    */
  val rawEventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType),
    StructField("_corrupt", StringType)))

  /** Stage 1 — ingest: schema-enforced CSV read, corrupt rows quarantined
    * into `_corrupt` instead of failing the job (PERMISSIVE).
    */
  def ingestCsv(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(rawEventSchema)
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .csv(path)

  /** Canonical event fields every vendor feed must map into. */
  val canonicalFields: Seq[(String, DataType)] = Seq(
    "event_id"   -> LongType,
    "ts"         -> TimestampType,
    "user_id"    -> LongType,
    "event_type" -> StringType,
    "value"      -> DoubleType,
    "props"      -> StringType)

  /** One vendor's mapping into the canonical schema: canonical column name
    * → expression over that vendor's raw columns. Unmapped canonical
    * columns become typed nulls, so a vendor missing a field still unions.
    */
  final case class VendorMapping(vendor: String, columns: Map[String, Column])

  /** Stage 1b — multi-source normalization: heterogeneous vendor feeds
    * (different column names, orders, and types) are projected into the
    * canonical schema and unioned, with a lineage column recording the
    * source vendor. Each projection is narrow (fused into its scan) and
    * the union is plan-level only — no shuffle, any number of vendors.
    */
  def normalize(vendors: Seq[(DataFrame, VendorMapping)]): DataFrame =
    vendors.map { case (df, m) =>
      val cols = canonicalFields.map { case (name, dt) =>
        m.columns.getOrElse(name, lit(null)).cast(dt).as(name)
      } :+ lit(m.vendor).as("ingest_vendor")
      df.select(cols: _*)
    }.reduce(_.unionByName(_))

  /** Stage 2 — clean: drop corrupt rows, normalize strings, null-guard
    * required fields, clamp out-of-domain values.
    */
  def clean(df: DataFrame): DataFrame =
    df.filter(col("_corrupt").isNull)
      .drop("_corrupt")
      .filter(col("event_id").isNotNull && col("ts").isNotNull && col("user_id").isNotNull)
      .withColumn("event_type", lower(trim(col("event_type"))))
      .filter(col("event_type").isin("click", "view", "signup", "purchase", "error"))
      .withColumn("value", when(col("value") < 0, lit(0.0)).otherwise(col("value")))

  /** Stage 3 — dedupe: exactly-once by event_id, keeping the first-seen
    * row deterministically (min struct, one shuffle).
    */
  def dedupe(df: DataFrame): DataFrame =
    df.withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("event_id"))
          .orderBy(col("ts"), col("user_id"))))
      .filter(col("rn") === 1)
      .drop("rn")

  /** Stage 4 — derive: publication fields (date partition, hour bucket,
    * value band) — narrow projections, fused into the scan by Catalyst.
    */
  def derive(df: DataFrame): DataFrame =
    df.withColumn("event_date", to_date(col("ts")))
      .withColumn("hour", hour(col("ts")))
      .withColumn("value_band",
        when(col("value") < 10, "low")
          .when(col("value") < 100, "mid")
          .otherwise("high"))

  /** Stage 5 — publish: parquet partitioned by event_date (the layout the
    * downstream analytical queries prune on).
    */
  def publish(df: DataFrame, outDir: String): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy("event_date").parquet(outDir)

  /** Stage 5b — incremental publish: dynamic partition overwrite replaces
    * ONLY the event_date partitions present in `df`, leaving every other
    * published partition untouched. Re-running the same day is idempotent,
    * which is the periodic-refresh contract: each run recomputes its date
    * range and swaps those partitions in place, never a full rewrite of
    * history. (At 100 TB a full overwrite per refresh is a non-starter.)
    */
  def publishIncremental(df: DataFrame, outDir: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("event_date").parquet(outDir)

  /** Publish-time MANIFEST: one row per published partition with its row
    * count and the min/max of the given stat columns — the external
    * pruning index a consumer (or a non-Spark reader) uses to skip
    * partitions without touching data, and the per-refresh reconciliation
    * record ("day X: N rows, value in [lo, hi]") an audit trail keeps.
    * One scan of the published data, one partition-key-sized result; at
    * 100 TB this is the same aggregate every partial-agg rollup rides.
    */
  def manifest(spark: SparkSession, publishedDir: String,
      statCols: Seq[String]): DataFrame = {
    val stats = statCols.flatMap { c =>
      Seq(min(col(c)).as(s"${c}_min"), max(col(c)).as(s"${c}_max"))
    }
    spark.read.parquet(publishedDir)
      .groupBy(col("event_date"))
      .agg(count(lit(1)).as("n_rows"), stats: _*)
  }

  /** Maintenance — compaction: rewrite a date-partitioned dataset so each
    * partition holds ~`filesPerPartition` files instead of one tiny file
    * per original shuffle task. High-parallelism incremental publishes
    * fragment partitions (32 tasks × N days = 32 small files per day); at
    * 100 TB the resulting file-count explosion dominates scan planning and
    * NameNode/listing pressure, so periodic compaction is part of the
    * publish contract.
    *
    * Shape: one shuffle on (event_date, salt) — the salt spreads each
    * date's rows over AT MOST `filesPerPartition` writer tasks, so every
    * date directory compacts to ≤ that many files while distinct dates
    * still compact in parallel (a bare `repartition(n, col)` would instead
    * set the TOTAL task count and funnel everything through n tasks).
    * The rewrite lands in a sibling temp dir, then swaps via
    * rename(dir→dir.old) / rename(tmp→dir) / delete(dir.old): the live
    * path is never in a deleted state, a crash mid-swap leaves a
    * recoverable `.old`, and both renames are checked. Hadoop-FS-API, so
    * any supported filesystem.
    */
  def compact(spark: SparkSession, dir: String, filesPerPartition: Int = 1): Unit = {
    val base = dir.stripSuffix("/")
    val tmp = base + ".compacting"
    spark.read.parquet(dir)
      .repartition(col("event_date"),
        pmod(xxhash64(col("event_id")), lit(filesPerPartition)))
      .write.mode(SaveMode.Overwrite).partitionBy("event_date").parquet(tmp)
    val conf = spark.sessionState.newHadoopConf()
    val fs = new org.apache.hadoop.fs.Path(tmp).getFileSystem(conf)
    def p(s: String) = new org.apache.hadoop.fs.Path(s)
    val old = base + ".old"
    fs.delete(p(old), true)
    require(fs.rename(p(base), p(old)), s"compact: rename $base -> $old failed")
    require(fs.rename(p(tmp), p(base)), s"compact: rename $tmp -> $base failed")
    fs.delete(p(old), true)
  }

  /** QA accounting for the clean stage — one conditional-sum pass over the
    * raw input, publishable next to the data: how many rows arrived, and
    * how many each clean rule dropped or rewrote. `clean` itself stays a
    * pure filter; callers who need the audit run this on the same raw
    * frame (one extra scan, no shuffle beyond the single-row agg).
    */
  def cleanAudit(df: DataFrame): DataFrame = {
    val ok = col("_corrupt").isNull
    val nullReq = col("event_id").isNull || col("ts").isNull || col("user_id").isNull
    // null-safe: a NULL event_type makes isin() SQL-NULL, which clean()'s
    // filter drops — coalesce to true so those rows land in n_bad_event_type
    // and the counters reconcile exactly to n_raw
    val badType = coalesce(
      !lower(trim(col("event_type"))).isin("click", "view", "signup", "purchase", "error"),
      lit(true))
    df.agg(
      count(lit(1)).as("n_raw"),
      sum(when(!ok, 1L).otherwise(0L)).as("n_corrupt"),
      sum(when(ok && nullReq, 1L).otherwise(0L)).as("n_null_required"),
      sum(when(ok && !nullReq && badType, 1L).otherwise(0L)).as("n_bad_event_type"),
      sum(when(ok && !nullReq && !badType && col("value") < 0, 1L).otherwise(0L))
        .as("n_value_clamped"),
      sum(when(ok && !nullReq && !badType, 1L).otherwise(0L)).as("n_published"))
  }

  /** Full run: raw CSV dir → published partitioned parquet; returns the
    * published DataFrame for inspection.
    */
  def run(spark: SparkSession, rawCsvDir: String, outDir: String): DataFrame = {
    publish(derive(dedupe(clean(ingestCsv(spark, rawCsvDir)))), outDir)
    spark.read.parquet(outDir)
  }
}
