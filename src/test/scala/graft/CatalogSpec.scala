package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Pins the catalog/introspection surface the reference enables via
  * `with_information_schema(true)` (reference examples/simple_query.rs:53,
  * which makes `SHOW TABLES` / schema queries work against registered
  * tables). Spark's equivalents — `SHOW TABLES`, `DESCRIBE`,
  * `spark.catalog.listTables/listColumns` — are built in; this spec proves
  * they resolve the same registered-view surface a reference user would
  * introspect.
  */
class CatalogSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("catalog-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("SHOW TABLES lists every registered fixture view") {
    Tables.registerAll(spark, sfDir)
    val shown = spark.sql("SHOW TABLES")
      .collect().map(_.getAs[String]("tableName")).toSet
    assert(Tables.names.toSet.subsetOf(shown),
      s"missing from SHOW TABLES: ${Tables.names.toSet.diff(shown)}")
  }

  test("DESCRIBE reports the parquet schema for a registered view") {
    Tables.register(spark, sfDir, "nation")
    val desc = spark.sql("DESCRIBE nation")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(desc === Map(
      "n_nationkey" -> "int", "n_name" -> "string", "n_regionkey" -> "int"))
  }

  test("spark.catalog.listTables/listColumns resolve views programmatically") {
    Tables.register(spark, sfDir, "region", "events")
    val listed = spark.catalog.listTables()
      .collect().filter(_.isTemporary).map(_.name).toSet
    assert(Set("region", "events").subsetOf(listed))
    // events.ts must surface as a real timestamp (the nanos conversion in
    // Tables.load), not the raw parquet int64 — catalog metadata agrees
    // with what queries see.
    val cols = spark.catalog.listColumns("events")
      .collect().map(c => c.name -> c.dataType).toMap
    assert(cols("ts") === "timestamp")
    assert(cols.contains("user_id") && cols.contains("event_type"))
  }

  test("information_schema-style query: count columns per table via DESCRIBE") {
    Tables.register(spark, sfDir, "lineitem")
    val n = spark.sql("DESCRIBE lineitem").count()
    // The fixture is TPC-H-ish (TESTDATA.md), carrying the 11 columns the
    // queries use rather than full TPC-H's 16.
    assert(n === 11, s"lineitem fixture exposes 11 columns, got $n")
  }
}
