package graft.functions

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The `spark.sql.extensions` wiring must expose the same function surface
  * as the imperative GraftFunctions.register path — a session configured
  * with GraftExtensions resolves every graft function by name in SQL.
  */
class GraftExtensionsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .appName("graft-extensions-spec")
    .config("spark.sql.shuffle.partitions", "2")
    .withExtensions(new GraftExtensions)
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("all graft functions resolve through the extensions path") {
    val row = spark.sql(
      """SELECT
        |  cosine_similarity(array(cast(1.0 as float), cast(0.0 as float)),
        |                    array(cast(1.0 as float), cast(0.0 as float))) AS cos,
        |  graft_simhash32('a b c') AS sh,
        |  size(graft_minhash_sig('a b c d')) AS mh_k,
        |  size(graft_shingle_hashes('a b c d')) AS n_sh,
        |  size(graft_lsh_buckets(array(cast(0.5 as float)))) AS n_bk,
        |  size(graft_text_counts('the der x')) AS n_tc
        |""".stripMargin).collect()(0)
    assert(math.abs(row.getDouble(0) - 1.0) < 1e-12)
    assert(row.getLong(1) === Sketches.simhash32(
      org.apache.spark.unsafe.types.UTF8String.fromString("a b c")))
    assert(row.getInt(2) === Sketches.K)
    assert(row.getInt(3) === 2) // 4 tokens -> 2 word-3-grams
    assert(row.getInt(4) === Sketches.TABLES)
    assert(row.getInt(5) === 7)
    // the aggregate resolves too
    val agg = spark.sql(
      "SELECT size(graft_minhash_agg(h)) FROM VALUES (1L), (2L) AS t(h)")
      .collect()(0).getInt(0)
    assert(agg === Sketches.K)
  }

  test("wrong arity fails with a clear error, not an index exception") {
    val e = intercept[Exception](spark.sql("SELECT cosine_similarity(array(cast(1.0 as float)))").collect())
    assert(!e.isInstanceOf[IndexOutOfBoundsException])
  }
}
