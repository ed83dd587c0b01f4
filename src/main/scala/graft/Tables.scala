package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver's parquet fixtures (TESTDATA.md).
  *
  * Scale notes: each table is one parquet file per scale factor; at 100 TB
  * these become partitioned directories and the same `spark.read.parquet`
  * call picks up partition pruning + predicate pushdown unchanged. All
  * queries in this library go through these loaders so the storage layout
  * can change in one place.
  */
object Tables {
  private def p(dir: String, name: String) = s"$dir/$name.parquet"

  /** Fixture schemas memoized per path (r15, guide §6/§1.2): every
    * bare `read.parquet` runs footer-based schema inference on the
    * driver per CALL, and the suite builds each table relation
    * thousands of times across queries and bench reps. A fixture's
    * schema is immutable metadata, so it is read once per JVM and
    * passed explicitly thereafter — the scan itself is planned exactly
    * as before (this memoizes METADATA, never data or results).
    *
    * Boundary notes (round-15 ADVICE): the cache is keyed on PATH alone
    * and shared across sessions in the JVM, safe because fixture files
    * are immutable for a JVM's lifetime. One inference-order dependency
    * exists: the events schema must be inferred with
    * `spark.sql.legacy.parquet.nanosAsLong` set (nanos fixtures fail
    * inference otherwise), which [[events]] guarantees by setting the
    * conf before its first `read` — any new call site that reads the
    * events path must go through [[events]], never [[read]] directly. */
  private val schemaCache = new java.util.concurrent.ConcurrentHashMap[
    String, org.apache.spark.sql.types.StructType]()

  private def read(s: SparkSession, path: String): DataFrame = {
    val sch = schemaCache.computeIfAbsent(path,
      _ => s.read.parquet(path).schema)
    s.read.schema(sch).parquet(path)
  }

  def region(s: SparkSession, dir: String): DataFrame   = read(s, p(dir, "region"))
  def nation(s: SparkSession, dir: String): DataFrame   = read(s, p(dir, "nation"))
  def customer(s: SparkSession, dir: String): DataFrame = read(s, p(dir, "customer"))
  def supplier(s: SparkSession, dir: String): DataFrame = read(s, p(dir, "supplier"))
  def part(s: SparkSession, dir: String): DataFrame     = read(s, p(dir, "part"))
  def orders(s: SparkSession, dir: String): DataFrame   = read(s, p(dir, "orders"))
  def lineitem(s: SparkSession, dir: String): DataFrame = read(s, p(dir, "lineitem"))
  def documents(s: SparkSession, dir: String): DataFrame  = read(s, p(dir, "documents"))
  def embeddings(s: SparkSession, dir: String): DataFrame = read(s, p(dir, "embeddings"))

  /** The fixtures have shipped `events.ts` under two encodings: parquet
    * INT64 TIMESTAMP(NANOS) — which Spark's vectorized reader rejects
    * ([PARQUET_TYPE_ILLEGAL]) unless read as raw long nanos via
    * `spark.sql.legacy.parquet.nanosAsLong` — and plain µs timestamps
    * (no timezone, so Spark infers TIMESTAMP_NTZ). Both normalize to the
    * same pair, dtype-dispatched at plan time:
    *   - `ts_ns`  : long, epoch nanoseconds (exact — never goes through a
    *                double, 1.7e18 > 2^53 would lose precision)
    *   - `ts`     : TimestampType, truncated to microseconds (Spark's native
    *                resolution), for window()/session_window()/watermarks.
    * Under the repo-wide UTC session timezone the NTZ→instant cast is the
    * identity DuckDB's `epoch_us(ts)` applies, so oracle arithmetic is
    * unchanged across encodings.
    */
  def normalizeEventsTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.LongType
    val tsNs = df.schema("ts").dataType match {
      case LongType => col("ts")
      case _        => expr("unix_micros(cast(ts as timestamp)) * 1000")
    }
    df.select(col("event_id"), tsNs.as("ts_ns"), col("user_id"),
        col("event_type"), col("value"), col("props"))
      .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
  }

  def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventsTs(read(s, p(dir, "events")))
  }
}
