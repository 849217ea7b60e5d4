package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet fixtures (TESTDATA.md).
  *
  * Tables mirror the relational surface the reference delegates to its
  * embedded engine (SURVEY.md §2.B): a TPC-H-ish star schema plus
  * `events` (stream-shaped) and `documents`/`embeddings` (LLM-pipeline
  * extension tables, SURVEY.md §7.5).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** `events.ts` must surface as Spark's native µs `TimestampType` for
    * downstream event-time semantics (windows, watermarks) and for the
    * DuckDB oracle compare (session TZ is pinned to UTC everywhere, so
    * NTZ wall-clock == LTZ instant). The fixture's physical type has
    * drifted across driver regenerations — TIMESTAMP(NANOS) (read as
    * BIGINT under `spark.sql.legacy.parquet.nanosAsLong=true`) vs
    * timestamp[us] (read as TIMESTAMP_NTZ) — so the conversion branches
    * on the *read* dtype instead of assuming one encoding (VERDICT r12
    * "what's wrong" #1: the unconditional nanos rewrite crashed 24
    * queries when the fixture became µs).
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") {
      // The NTZ->LTZ cast below is instant-correct ONLY under a UTC
      // session (wall-clock == instant). Every entry point pins
      // spark.sql.session.timeZone=UTC; a future one that forgets must
      // fail HERE, loudly, instead of silently shifting every event
      // instant by the local offset (ADVICE r13).
      require(spark.conf.get("spark.sql.session.timeZone") == "UTC",
        "Tables.load(events) requires spark.sql.session.timeZone=UTC — " +
          "the TimestampNTZ->Timestamp normalization reads fixture " +
          "wall-clock as the instant; a non-UTC session would skew all " +
          "event-time results")
      val out = df.schema("ts").dataType match {
        case LongType          => df.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
        case TimestampNTZType  => df.withColumn("ts", col("ts").cast(TimestampType))
        case TimestampType     => df
        case other => throw new IllegalStateException(
          s"events.ts read as unsupported type $other — fixture drifted again; extend Tables.load")
      }
      assert(out.schema("ts").dataType == TimestampType, "events.ts must normalize to TimestampType")
      out
    } else df
  }

  /** Register fixture tables as temp views so `spark.sql` queries
    * (grouping sets, correlated subqueries, …) resolve by name — the
    * Spark analog of the reference's `ctx.register_table`
    * (examples/simple_query.rs:72). Query builders register only the
    * views they read (no whole-catalog side effects per invocation).
    */
  def register(spark: SparkSession, dir: String, tables: String*): Unit =
    tables.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))

  def registerAll(spark: SparkSession, dir: String): Unit =
    register(spark, dir, names: _*)
}
