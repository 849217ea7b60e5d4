package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of the round-5 analytics/governance operators —
  * properties the hash-compare oracle cannot express (determinism across
  * re-runs, contiguity, redaction completeness, quota exactness).
  */
class AnalyticsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.01"

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("analytics-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def run(name: String) = Registry.byName(name).build(spark, sfDir)

  test("q66: redaction is complete — no email or phone survives, and every row redacted both planted tokens") {
    val rows = run("q66_pii_redact").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val red = r.getAs[String]("redacted")
      assert(!red.matches(".*[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}.*"), s"email survived: $red")
      assert(red.contains("<EMAIL>") && red.contains("<PHONE>"), s"planted PII not redacted: $red")
      assert(r.getAs[Long]("n_emails") >= 1 && r.getAs[Long]("n_phones") >= 1)
    }
  }

  test("q67: stratified sample hits the exact per-language quota and is deterministic across runs") {
    val a = run("q67_stratified_sample").collect().map(_.toString).toSeq
    val b = run("q67_stratified_sample").collect().map(_.toString).toSeq
    assert(a === b, "sample changed between identical runs")
    val perLang = run("q67_stratified_sample").groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // sf0.01 has >= 64 docs per language (TESTDATA), so every stratum fills.
    assert(perLang.values.forall(_ == 20L), s"quota missed: $perLang")
  }

  test("q69: sessions partition each user's events and never contain an internal gap > threshold") {
    val sess = run("q69_sessionize")
    val totalEvents = sess.agg(sum("n_events")).first().getLong(0)
    val nEvents = graft.Tables.load(spark, sfDir, "events").count()
    assert(totalEvents === nEvents, "sessionization lost or duplicated events")
    // Sessions are disjoint in time per user: next session starts after
    // the previous one ends (by more than the gap, by construction).
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("session_id")
    val bad = sess
      .withColumn("prev_end", lag(col("start_s") + col("dur_s"), 1).over(w))
      .filter(col("prev_end").isNotNull && col("start_s") <= col("prev_end") + 3600)
      .count()
    assert(bad === 0L, s"$bad sessions begin within the gap of their predecessor")
  }

  test("q73: global ids are exactly 0..N-1 with no holes and follow doc_id order") {
    val rows = run("q73_global_ids").collect()
    val n = rows.length
    assert(rows.map(_.getAs[Long]("gid")).toSeq === (0L until n).toSeq,
      "gids not contiguous ascending when sorted by doc_id")
  }

  test("q65: bucketed-join result matches the plain (non-bucketed) join bit-for-bit") {
    val bucketed = run("q65_bucketed_join").collect().map(_.toString).toSeq
    val c = graft.Tables.load(spark, sfDir, "customer")
    val o = graft.Tables.load(spark, sfDir, "orders")
    val plain = o.join(c, o("o_custkey") === c("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(18, 4)))
          .cast(org.apache.spark.sql.types.DoubleType).as("total_price"))
      .orderBy(col("c_mktsegment")).collect().map(_.toString).toSeq
    assert(bucketed === plain)
  }
}
