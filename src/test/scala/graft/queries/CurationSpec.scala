package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Property pins for the round-15 curation/objective operators, beyond
  * the DuckDB gate: an INDEPENDENT in-memory reimplementation for the
  * substring dedup (the BpeSpec convention — two agreeing engines can
  * still share a bug; a third, structurally different implementation
  * cannot), the span-corruption reconstruction invariant (input +
  * target must rebuild the original document), and the semantic
  * guarantees (k-anonymity's k, redaction completeness, conservation)
  * that row/hash equality alone does not state.
  */
class CurationSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("curation-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def docs(): Seq[(Long, String)] =
    graft.Tables.load(spark, sfDir, "documents")
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq

  // ---- q180: independent in-memory substring dedup ----

  test("q180: Spark output equals an independent in-memory implementation") {
    val K = 8
    val corpus = docs().map { case (id, t) => (id, t.toLowerCase.split(" ", -1).toVector) }
    // gram -> all occurrences (docId, pos 1-based), insertion-ordered
    val occ = scala.collection.mutable.LinkedHashMap.empty[String, Vector[(Long, Int)]]
    for ((id, ws) <- corpus; p <- 1 to ws.length - K + 1) {
      val g = ws.slice(p - 1, p - 1 + K).mkString(" ")
      occ(g) = occ.getOrElse(g, Vector.empty) :+ (id, p)
    }
    val cut = scala.collection.mutable.Set.empty[(Long, Int)]
    for ((_, os) <- occ if os.length >= 2) {
      val keep = os.min // lexicographic (docId, pos) — the canonical pick
      for (o <- os if o != keep; off <- 0 until K) cut += ((o._1, o._2 + off))
    }
    val expected = corpus.map { case (id, ws) =>
      val keptWords = (1 to ws.length).filter(p => !cut((id, p))).map(p => ws(p - 1))
      (id, ws.length.toLong, keptWords.length.toLong,
        ws.length.toLong - keptWords.length,
        java.security.MessageDigest.getInstance("MD5")
          .digest(keptWords.mkString(" ").getBytes("UTF-8"))
          .map("%02x".format(_)).mkString)
    }.sortBy(_._1)
    val got = Registry.byName("q180_substring_dedup").build(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))).toSeq
    assert(got.size === expected.size)
    got.zip(expected).foreach { case (g, e) => assert(g === e, s"doc ${e._1}") }
    // and the operator actually bites on this corpus
    assert(expected.map(_._4).sum > 0, "no spans were excised — vacuous fixture")
  }

  // ---- q184: reconstruction invariant ----

  test("q184: substituting each target span back into the input rebuilds the original document") {
    val K = 8 // unused; kept for symmetry with q180's width
    assert(K == 8)
    val rows = Registry.byName("q184_span_corruption").build(spark, sfDir).collect()
    // Rebuild input/target streams independently (same public rule) and
    // check (a) digests match the operator and (b) substitution restores
    // the original text — the invariant that makes the pair trainable.
    def h60(sv: String): Long =
      java.lang.Long.parseLong(
        java.security.MessageDigest.getInstance("MD5")
          .digest(sv.getBytes("UTF-8")).map("%02x".format(_)).mkString.substring(0, 15), 16)
    def md5(sv: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(sv.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val byId = docs().toMap
    var checkedSpans = 0L
    rows.foreach { r =>
      val id = r.getLong(0)
      val ws = byId(id).toLowerCase.split(" ", -1).toVector
      val masked = ws.indices.map { i =>
        val pos = i + 1
        val block = (pos - 1) / 20
        val off = h60(s"sc:$id:$block") % 18
        ((pos - 1) % 20) >= off && ((pos - 1) % 20) <= off + 2
      }
      // spans: consecutive masked positions within a block
      val spanBlocks = ws.indices.filter(masked).map(i => i / 20).distinct.sorted
      val spanK = spanBlocks.zipWithIndex.toMap // block -> 0-based
      val input = ws.indices.flatMap { i =>
        if (!masked(i)) Seq(ws(i))
        else {
          val b = i / 20
          val firstInBlock = ws.indices.filter(j => masked(j) && j / 20 == b).min
          if (i == firstInBlock) Seq(s"<extra_id_${spanK(b) + 1}>") else Nil
        }
      }.mkString(" ")
      val target = spanBlocks.flatMap { b =>
        s"<extra_id_${spanK(b) + 1}>" +:
          ws.indices.filter(j => masked(j) && j / 20 == b).map(ws(_))
      }.mkString(" ")
      assert(md5(input) === r.getString(4), s"doc $id input digest")
      assert(md5(target) === r.getString(5), s"doc $id target digest")
      // substitution restores the original
      var rebuilt = input
      spanBlocks.foreach { b =>
        val toks = ws.indices.filter(j => masked(j) && j / 20 == b).map(ws(_)).mkString(" ")
        rebuilt = rebuilt.replace(s"<extra_id_${spanK(b) + 1}>", toks)
      }
      assert(rebuilt === ws.mkString(" "), s"doc $id does not reconstruct")
      checkedSpans += spanBlocks.size
    }
    assert(checkedSpans > 0, "no spans masked anywhere — vacuous corpus")
  }

  // ---- q181/q190: redaction completeness + idempotence ----

  test("q181: redacted text contains no residual PII match; redaction is idempotent") {
    val pii = Curation.piiInjectedText
    val redacted = Curation.redactPii(pii)
    val twice = Curation.redactPii(Curation.redactPii(pii))
    val bad = graft.Tables.load(spark, sfDir, "documents")
      .filter(col("text").isNotNull)
      .select(
        (regexp_count(redacted, lit(Curation.EmailPat)) +
          regexp_count(redacted, lit(Curation.SsnPat)) +
          regexp_count(redacted, lit(Curation.PhonePat))).as("residual"),
        (md5(redacted) === md5(twice)).as("idem"))
      .agg(sum(col("residual")).as("residual"),
        sum(when(col("idem"), 0).otherwise(1)).as("not_idem"))
      .collect()(0)
    assert(bad.getLong(0) === 0L, "residual PII after redaction")
    assert(bad.getLong(1) === 0L, "redaction not idempotent")
  }

  // ---- q188: the k guarantee and level minimality ----

  test("q188: every published group has >= k members, and the next-finer level would violate k") {
    val out = Registry.byName("q188_kanon_generalize").build(spark, sfDir).collect()
    assert(out.nonEmpty)
    val lvl = out.head.getInt(0)
    assert(out.forall(_.getLong(4) >= 5L), "published group under k")
    if (lvl > 0) {
      // recompute the next-finer level's min group size directly
      val d = graft.Tables.load(spark, sfDir, "documents")
        .filter(col("text").isNotNull)
        .select(col("lang"), col("source"), expr("n_chars DIV 100").as("b"))
      val finer = lvl match {
        case 1 => d.groupBy(col("lang"), col("source"), col("b")).count()
        case 2 => d.groupBy(col("lang"), col("source")).count()
        case _ => d.groupBy(col("lang")).count()
      }
      val minFiner = finer.agg(min(col("count"))).collect()(0).getLong(0)
      assert(minFiner < 5L,
        s"level $lvl chosen but finer level min=$minFiner clears k — walk not minimal")
    }
  }

  // ---- q183/q185/q186: conservation and arithmetic guarantees ----

  test("q183: batches partition the vector set; collisions never exceed pairs") {
    val out = Registry.byName("q183_contrastive_batches").build(spark, sfDir).collect()
    val n = graft.Tables.load(spark, sfDir, "embeddings").count()
    assert(out.map(_.getLong(1)).sum === n, "vectors lost or duplicated across batches")
    assert(out.forall(r => r.getLong(3) <= r.getLong(2)), "collisions > pairs")
  }

  test("q185: both strategies batch every doc; waste is non-negative everywhere") {
    val out = Registry.byName("q185_length_batching").build(spark, sfDir).collect()
    val total = graft.Tables.load(spark, sfDir, "documents")
      .filter(col("text").isNotNull).count()
    val globalRow = out.filter(_.getLong(0) == -1L)
    assert(globalRow.length === 1)
    assert(globalRow.head.getLong(1) === total)
    assert(out.filter(_.getLong(0) >= 0L).map(_.getLong(1)).sum === total)
    assert(out.forall(_.getLong(4) >= 0L), "negative padding waste")
  }

  test("q192/q173 coherence: boundary segments cover exactly the packed tokens of every chunk") {
    // The attention-boundary table and the packed-id table are two views
    // of ONE packing; their per-(source, chunk) token totals must agree
    // or a trainer would mask a different stream than it loads.
    val b = Registry.byName("q192_pack_boundaries").build(spark, sfDir)
      .select(col("source"), col("chunk"), col("n_tokens").as("bt"))
    val p = Registry.byName("q173_bpe_ids").build(spark, sfDir)
      .select(col("source"), col("chunk"), col("n_tokens").as("pt"))
    val diff = b.join(p, Seq("source", "chunk"), "full_outer")
      .filter(col("bt").isNull || col("pt").isNull || col("bt") =!= col("pt"))
      .count()
    assert(diff === 0L, "boundary table and packed-id table disagree on chunk contents")
  }

  test("q186: effective tokens never exceed 4 epochs of the source; cap flag is consistent") {
    val out = Registry.byName("q186_repeat_epochs").build(spark, sfDir).collect()
    out.foreach { r =>
      val (tokens, epochs, effective, capped) =
        (r.getLong(1), r.getLong(3), r.getLong(4), r.getInt(5))
      assert(epochs <= 4000000L)
      assert(effective <= 4L * tokens)
      assert((capped == 1) === (epochs == 4000000L), "cap flag inconsistent")
    }
  }
}
