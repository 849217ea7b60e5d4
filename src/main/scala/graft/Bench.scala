package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Paths}

/** Driver-run benchmark: times every benchable SparkEntry query on
  * `SPARK_GRAFT_SF_DIR` and emits ONE JSON line.
  *
  * Measurement design (round-1 post-mortem):
  *   - materialize through the built-in `noop` sink, not `.count()` —
  *     counting lets Catalyst prune projections/sort payloads/window
  *     columns, understating real work;
  *   - deterministic (sorted) query order, one warm-up pass (JVM,
  *     codegen caches, parquet footers), then median of 3 timed runs;
  *   - JSON is printed AND written to `$BENCH_OUT` (if set) because
  *     sbt's default logger prefixes stdout lines with `[info] `,
  *     which made round 1's output unparseable (`run/outputStrategy`
  *     in build.sbt also forces clean stdout).
  */
object Bench {
  private def materialize(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val defs = graft.queries.Registry.all.filter(_.bench)
    val names = defs.map(_.name).sorted
    val build = defs.map(d => d.name -> d.build).toMap

    def timeOne(name: String): Double = {
      val t0 = System.nanoTime()
      try materialize(build(name)(spark, sfDir))
      catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          return -1.0
      }
      (System.nanoTime() - t0) / 1e9
    }

    names.foreach(timeOne) // warm-up pass, discarded
    val runs = Seq.fill(3)(names.map(n => n -> timeOne(n)).toMap)
    val med = names.map { n => n -> runs.map(_(n)).sorted.apply(1) }

    // A crashing query reports -1.0; keep it out of the total (it would
    // LOWER the sum, masquerading as a speedup) and surface it explicitly
    // so the driver can tell fast from broken (ADVICE r2).
    val failed = med.collect { case (n, v) if v < 0 => n }
    val qs = med.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = med.collect { case (_, v) if v >= 0 => v }.sum
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failedJson,"sf":"$sfDir"}"""
    println(json)
    sys.env.get("BENCH_OUT").foreach(p => Files.writeString(Paths.get(p), json))
    spark.stop()
  }
}
