package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Loaders for the star-schema test tables (see TESTDATA.md).
  *
  * Everything is plain `spark.read.parquet`, so Catalyst sees a real
  * file-source relation: filter pushdown, column pruning and partition
  * coalescing all apply. At cluster scale the same entry points accept
  * directories of many files / partitioned layouts unchanged.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** The events table's `ts` column has shipped in two parquet encodings
    * across data generations: nanosecond timestamps (which Spark's
    * vectorized reader rejects — read as a nanos-since-epoch long under
    * `nanosAsLong` and rebuild the microsecond TIMESTAMP) and plain
    * microsecond timestamps without a zone (read as TIMESTAMP_NTZ — cast
    * to the session-zone TIMESTAMP, a value-preserving relabel under the
    * UTC session zone every entry point pins). Dispatch on the read type
    * so both generations produce the identical TIMESTAMP column.
    */
  def events(spark: SparkSession, dir: String): DataFrame =
    eventsTsAsNanosLong(spark, dir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))

  /** Single decode point for the `ts` generations: normalize to a
    * nanos-since-epoch LONG, the lossless common denominator both
    * encodings decode to. `events` derives its TIMESTAMP from this, and
    * probes that replicate events at scale (ScaleProbe) read the long
    * directly. Any encoding outside the two known generations (plus an
    * already-decoded session-zone TIMESTAMP) fails HERE with the observed
    * type, not rows later in a downstream operator.
    */
  def eventsTsAsNanosLong(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = apply(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => raw
      case org.apache.spark.sql.types.TimestampNTZType =>
        // value-preserving relabel only under the UTC session zone every
        // entry point pins (Verify/Bench/PlanAudit/ScaleProbe)
        raw.withColumn("ts", unix_micros(col("ts").cast("timestamp")) * lit(1000L))
      case org.apache.spark.sql.types.TimestampType =>
        raw.withColumn("ts", unix_micros(col("ts")) * lit(1000L))
      case other => throw new IllegalStateException(
        s"events.ts: unsupported parquet type $other — known generations are " +
          "int64 nanos (nanosAsLong) and TIMESTAMP_NTZ micros")
    }
  }

  /** Generic readers so pipelines aren't parquet-only. Pass `schema` in
    * production: `inferSchema` is a convenience fallback that SCANS THE
    * DATA TWICE (once to infer, once to read) — at 100 TB that doubles
    * ingest cost, an explicit schema reads once.
    */
  def csv(spark: SparkSession, path: String, header: Boolean = true,
      schema: Option[StructType] = None): DataFrame = {
    val base = spark.read.option("header", header.toString)
    schema match {
      case Some(s) => base.schema(s).csv(path)
      case None    => base.option("inferSchema", "true").csv(path)
    }
  }

  def json(spark: SparkSession, path: String): DataFrame =
    spark.read.json(path)

  /** ORC — the other columnar interchange format (Hive-ecosystem tables
    * arrive as ORC): same pushdown/pruning contract as parquet (predicate
    * pushdown + column pruning reach the stripe reader).
    */
  def orc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Text corpus: one row per line (`value`), the raw-crawl entry point.
    * `wholeFile = true` reads one row per FILE instead (document-per-file
    * corpora); at scale pair with a small-files compaction pass — a
    * billion tiny files is a listing problem before it is a read problem.
    */
  def text(spark: SparkSession, path: String, wholeFile: Boolean = false): DataFrame =
    spark.read.option("wholetext", wholeFile.toString).text(path)

  /** Multimodal payload ingest: Spark's `binaryFile` source — one row per
    * file with (path, modificationTime, length, content: binary), the
    * front door for image/audio/video directories feeding
    * [[graft.operators.Multimodal]] decode stages (m01's binary+metadata
    * shape straight from storage). `glob` prunes at LISTING time
    * (pathGlobFilter), so `*.jpg` never reads the `.json` sidecars.
    * Files larger than `spark.sql.sources.binaryFile.maxLength` (int max)
    * fail fast — shard long videos upstream.
    */
  def binaryFiles(spark: SparkSession, path: String, glob: String = "*"): DataFrame =
    spark.read.format("binaryFile").option("pathGlobFilter", glob).load(path)
}
