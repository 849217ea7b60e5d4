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

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark has no native
    * type for: sessions must set `spark.sql.legacy.parquet.nanosAsLong=true`
    * (done in Verify/Bench/specs), and the loader converts the raw nanos to
    * Spark's native µs TimestampType here so downstream queries see a
    * normal timestamp column.
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") df.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts DIV 1000)"))
    else df
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
