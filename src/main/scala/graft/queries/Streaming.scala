package graft.queries

import java.util.UUID
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.nats.{NatsDemo, NatsTransport}
import graft.Tables

/** The reference's namesake surface: SQL over a live NATS subject
  * (SURVEY §2.A), exercised end-to-end through both DSv2 read paths.
  * Correctness-only entries (noBench): their latency is publisher-paced,
  * not engine-paced.
  */
object Streaming {

  private val rowSchema = StructType(Seq(
    StructField("id", IntegerType, nullable = false),
    StructField("name", StringType, nullable = false)))

  private val canonicalRows = Seq("1,apple", "2,banana", "3,orange")

  private val canonicalOracle =
    """SELECT * FROM (VALUES (1, 'apple'), (2, 'banana'), (3, 'orange')) AS t(id, name)
      |ORDER BY id""".stripMargin

  private val sinkId = new AtomicInteger(0)

  val defs: Seq[QueryDef] = Seq(

    // The reference's canonical one-shot workload: `SELECT id, name FROM
    // nats_table limit 3` over a live subject (tests/integration_test.rs:53),
    // via the DSv2 batch path — pushed LIMIT terminates the subscription
    // after 3 rows (working A7).
    QueryDef.noBench("q30_nats_e2e", canonicalOracle) { (s, _) =>
      val url = s"memory://q30-${UUID.randomUUID()}"
      NatsDemo.cyclicPublisher(url, "nats_table", canonicalRows)
      s.read.format("nats").schema(rowSchema)
        .option("url", url).option("subject", "nats_table")
        .option("collectTimeoutMs", "20000")
        .load()
        .limit(3)
        .orderBy("id")
    },

    // Same workload through the micro-batch streaming path (A1): publish
    // after the subscription is live, drain via the memory sink, return the
    // materialized result as a batch DataFrame for the correctness gate.
    QueryDef.noBench("q31_nats_stream", canonicalOracle) { (s, _) =>
      val url = s"memory://q31-${UUID.randomUUID()}"
      val sink = s"nats_stream_sink_${sinkId.incrementAndGet()}"
      val conn = NatsTransport.connect(url)
      val q = s.readStream.format("nats").schema(rowSchema)
        .option("url", url).option("subject", "nats_table")
        .option("batchSize", canonicalRows.size.toString) // full-batch admission
        .load()
        .writeStream.format("memory").queryName(sink).start()
      try {
        NatsDemo.awaitSubscriber(url, "nats_table")
        canonicalRows.foreach(m => conn.publish("nats_table", m.getBytes))
        q.processAllAvailable()
      } finally {
        q.stop()
        conn.close()
      }
      s.sql(s"SELECT id, name FROM $sink ORDER BY id")
    },

    // Event-time tumbling window aggregation — the same window() operator
    // Structured Streaming uses for watermarked streams (exercised in
    // streaming mode by NatsSourceSpec's watermark test), verified here in
    // batch mode against DuckDB's time_bucket. Output pins epoch seconds:
    // raw timestamps would hash-differ on ns-vs-us precision.
    QueryDef(
      "q50_tumbling_window",
      """SELECT CAST(epoch(time_bucket(INTERVAL '1 hour', ts)) AS BIGINT) AS hour_start,
        |       event_type, COUNT(*) AS n,
        |       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM events
        |GROUP BY time_bucket(INTERVAL '1 hour', ts), event_type
        |ORDER BY hour_start, event_type""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("value").cast(DecimalType(18, 4))).cast(DoubleType).as("sum_value"))
        .select(
          unix_timestamp(col("w.start")).as("hour_start"),
          col("event_type"), col("n"), col("sum_value"))
        .orderBy(col("hour_start"), col("event_type"))
    }
  )
}
