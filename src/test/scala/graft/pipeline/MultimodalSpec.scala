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

  test("resizeStub preserves aspect within bounds and never exceeds the target") {
    // no-op inside bounds
    assert(Multimodal.resizeStub(100, 224, 224) === ((100, 224)))
    // downscale pins the max dimension to the target, floors the other
    assert(Multimodal.resizeStub(256, 128, 224) === ((224, 112)))
    val (w, h) = Multimodal.resizeStub(251, 173, 224)
    assert(w === 224 && h === math.floor(173 * 224.0 / 251).toInt)
    // exhaustive over the decoder's [64, 256] envelope: never exceeds 224
    for (a <- 64 to 256; b <- Seq(64, 131, 224, 256)) {
      val (x, y) = Multimodal.resizeStub(a, b, 224)
      assert(x <= 224 && y <= 224, s"($a,$b) -> ($x,$y)")
    }
  }

  test("sampleFrames expands rows iterator-to-iterator: ceil(n_frames/2) frames per media") {
    import spark.implicits._
    val media = (0L until 60L)
      .map(i => Multimodal.Media(i, s"vid-$i".getBytes("UTF-8"), "wav"))
      .toDS()
      .repartition(5)
    val frames = Multimodal.sampleFrames(media, 224, 2)
    assert(frames.rdd.getNumPartitions === 5) // narrow: no shuffle
    val byDoc = frames.collect().groupBy(_.doc_id)
    assert(byDoc.keySet === (0L until 60L).toSet)
    byDoc.foreach { case (id, fs) =>
      val (_, _, n) = Multimodal.decodeStub(s"vid-$id".getBytes("UTF-8"))
      assert(fs.length === (n + 1) / 2, s"doc $id: n_frames=$n")
      // sampled indices are 1, 3, 5, ... and hashes are deterministic
      assert(fs.map(_.frame_idx).sorted.toSeq === (1 to n by 2).toSeq)
      fs.foreach(f => assert(f.frame_hash ===
        Multimodal.frameHash(s"vid-$id".getBytes("UTF-8"), f.frame_idx)))
    }
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
