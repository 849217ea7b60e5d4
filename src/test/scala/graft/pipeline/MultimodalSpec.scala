package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The multimodal plumbing is real even though the decoder is a stub:
  * these tests pin the executor-side batch shape (iterator-to-iterator,
  * partition-preserving) and the decode formula the q49 oracle replays.
  */
class MultimodalSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("multimodal-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("decodeStub is deterministic and matches the SQL-expressible formula") {
    val payload = "hello multimodal".getBytes("UTF-8")
    val (w1, h1, f1) = Multimodal.decodeStub(payload)
    val (w2, h2, f2) = Multimodal.decodeStub(payload)
    assert((w1, h1, f1) === (w2, h2, f2))
    // the formula the q49 oracle replays: h1 = first 8 md5 hex chars
    val h = java.lang.Long.parseLong(Multimodal.md5Hex(payload).substring(0, 8), 16)
    assert(w1 === 64 + (h % 193).toInt)
    assert(h1 === 64 + ((h / 193) % 193).toInt)
    assert(f1 === 1 + (h % 7).toInt)
    // dimensions stay in the documented [64, 256] envelope
    assert(w1 >= 64 && w1 < 257 && h1 >= 64 && h1 < 257 && f1 >= 1 && f1 <= 7)
  }

  test("extractFeatures is partition-preserving and row-complete") {
    import spark.implicits._
    val media = (0L until 100L)
      .map(i => Multimodal.Media(i, s"payload-$i".getBytes("UTF-8"), if (i % 2 == 0) "png" else "wav"))
      .toDS()
      .repartition(7)
    val feats = Multimodal.extractFeatures(media)
    assert(feats.rdd.getNumPartitions === 7) // narrow transform: no shuffle
    val rows = feats.collect()
    assert(rows.length === 100)
    assert(rows.map(_.doc_id).toSet === (0L until 100L).toSet)
    assert(rows.forall(f => f.byte_len > 0 && f.width >= 64))
    assert(feats.columns.toSeq ===
      Seq("doc_id", "format", "byte_len", "width", "height", "n_frames"))
  }
}
