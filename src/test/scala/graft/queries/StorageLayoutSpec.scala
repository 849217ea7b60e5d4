package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Storage-layout levers that only pay off at cluster scale — asserted on
  * the physical plan, not just the result:
  *
  *   - q65's bucketed join must NOT shuffle either input: the whole point
  *     of bucketing the fact table once is that every later join is
  *     map-side. A regression that re-introduces `Exchange
  *     hashpartitioning(o_custkey...)` silently costs a 100 TB shuffle
  *     per query at scale while still returning correct rows.
  *   - Partitioned writes must prune at the source: a reader with a
  *     partition-column predicate should list only matching directories
  *     (PartitionFilters in the scan), never scan-and-filter.
  */
class StorageLayoutSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("storage-layout")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("q65: bucketed sort-merge join reads both sides in place — no exchange on either join input") {
    val df = Registry.byName("q65_bucketed_join").build(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected SMJ (merge hint + bucketed layout):\n$plan")
    assert(!plan.contains("Exchange hashpartitioning(o_custkey"),
      s"orders side re-shuffled — bucketed layout not used:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning(c_custkey"),
      s"customer side re-shuffled — bucketed layout not used:\n$plan")
    // The bucketed scan itself is visible in the plan: all 8 buckets of
    // each side selected (no bucket pruning predicate in this query).
    assert(plan.contains("SelectedBucketsCount: 8 out of 8"), s"bucketed read not planned:\n$plan")
  }

  test("q65: the only exchanges are post-join (aggregate/sort), never under the join") {
    val df = Registry.byName("q65_bucketed_join").build(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    // groupBy(c_mktsegment) + orderBy legitimately shuffle the 5-row-ish
    // aggregate; the join inputs must contribute zero exchanges.
    val exchanges = plan.split("\n").count(_.trim.startsWith("+- Exchange") ) +
      plan.split("\n").count(_.trim.startsWith(":- Exchange"))
    assert(exchanges <= 2, s"unexpected exchange count ($exchanges):\n$plan")
  }

  test("partitioned parquet write + partition-pruned read: scan lists only the matching directory") {
    val root = graft.BuildPaths.scratch("partitioned-events")
    graft.Tables.load(spark, sfDir, "events")
      .write.mode("overwrite").partitionBy("event_type").parquet(root)

    val clicks = spark.read.parquet(root).filter(org.apache.spark.sql.functions.col("event_type") === "click")
    val plan = clicks.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters:") && plan.contains("event_type"),
      s"partition predicate not pushed to directory listing:\n$plan")
    // Pruning is real, not cosmetic: the scan's data filters must NOT
    // re-check event_type (it is a partition column, resolved at listing).
    val expected = graft.Tables.load(spark, sfDir, "events")
      .filter(org.apache.spark.sql.functions.col("event_type") === "click").count()
    assert(clicks.count() === expected)
  }

  test("q77: the day-range predicate prunes partitions at listing time — no data-filter re-check") {
    val plan = Registry.byName("q77_partition_pruned").build(spark, sfDir)
      .queryExecution.executedPlan.toString
    val scanLine = plan.split("\n").find(_.contains("PartitionFilters:"))
    assert(scanLine.isDefined, s"no partitioned scan in plan:\n$plan")
    assert(scanLine.get.matches(".*PartitionFilters: \\[[^\\]]*\\(d#\\d+ >= .*"),
      s"day range not in PartitionFilters:\n${scanLine.get}")
    // The data/pushed filters must be EMPTY — pruning happened at
    // directory listing, not per-row (the only predicate is on `d`).
    assert(scanLine.get.contains("DataFilters: []"),
      s"partition predicate re-checked per-row:\n${scanLine.get}")
    assert(scanLine.get.contains("PushedFilters: []"),
      s"partition predicate pushed as a data filter:\n${scanLine.get}")
  }

  test("partition + data predicates split correctly: day range prunes directories, row predicate pushes to parquet") {
    import org.apache.spark.sql.functions.col
    // Mixed-filter query over q77's layout: the day range must land in
    // PartitionFilters (directory listing) while the event_type equality
    // lands in PushedFilters (parquet row groups) — each pruning level
    // doing its own job, neither leaking into the other.
    Registry.byName("q77_partition_pruned").build(spark, sfDir) // ensures layout
    val root = graft.BuildPaths.scratch(
      s"events_by_day/${sfDir.replaceAll("[^A-Za-z0-9]", "_")}")
    val plan = spark.read.parquet(root)
      .filter(col("d").between("2024-01-08", "2024-01-14") && col("event_type") === "click")
      .queryExecution.executedPlan.toString
    val scanLine = plan.split("\n").find(_.contains("PartitionFilters:"))
    assert(scanLine.isDefined, s"no partitioned scan:\n$plan")
    assert(scanLine.get.matches(".*PartitionFilters: \\[[^\\]]*\\(d#\\d+ >= .*"),
      s"day range not pruning directories:\n${scanLine.get}")
    assert(scanLine.get.matches(".*PushedFilters: \\[[^\\]]*EqualTo\\(event_type,click\\).*"),
      s"row predicate not pushed to parquet:\n${scanLine.get}")
  }
}
