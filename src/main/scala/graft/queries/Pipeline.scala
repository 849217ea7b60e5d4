package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

import graft.Tables

/** Training-data pipeline operators over `documents` / `embeddings` /
  * `events` (the north-star surface beyond reference parity, SURVEY §7.5).
  *
  * Every operator is designed for the 100 TB shape first:
  *   - dedup is the one-shuffle window idiom, not dropDuplicates (whose
  *     kept-row is nondeterministic) and never a driver-side collect;
  *   - near-dup candidate generation joins on MinHash band buckets —
  *     all-pairs comparison never appears in any plan;
  *   - similarity search is embarrassingly parallel per row with a single
  *     top-k TakeOrdered at the end.
  *
  * Cross-engine determinism for the DuckDB oracle: all hashing reduces to
  * md5 (identical everywhere) mapped to a 60-bit integer, all integer
  * arithmetic, and any floating-point output is either a single division
  * or rounded to 6 decimals (association drift across engines is ~1e-13).
  */
object Pipeline {

  private def T(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ---- shared MinHash family: k=12 permutations over a 60-bit md5 base
  // hash reduced mod the Mersenne prime 2^31-1; 6 bands x 2 rows.
  // (a_i * h + b_i) stays < 2^46 — no int64 overflow in either engine.
  private val P = 2147483647L
  private val K = 12
  private val hashA: Array[Long] = Array.tabulate(K)(i => 2L * i + 3)
  private val hashB: Array[Long] = Array.tabulate(K)(i => 5L * i + 1)
  private val bands: Seq[(Int, Int)] = (0 until K / 2).map(j => (2 * j, 2 * j + 1))

  val defs: Seq[QueryDef] = Seq(

    // ---- exact dedup: the scalable keep-first idiom (one shuffle, no
    // driver state). dropDuplicates keeps an arbitrary row; partition +
    // row_number pins the representative deterministically. ----
    QueryDef(
      "q40_dedup_exact",
      """SELECT event_id, user_id, event_type, value FROM (
        |  SELECT event_id, user_id, event_type, value,
        |    ROW_NUMBER() OVER (PARTITION BY user_id, event_type, value ORDER BY event_id) AS rn
        |  FROM events) t
        |WHERE rn = 1
        |ORDER BY event_id""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("user_id"), col("event_type"), col("value"))
        .orderBy(col("event_id"))
      T(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .drop("rn")
        .orderBy(col("event_id"))
    },

    // ---- near-dup candidates via MinHash-LSH: shingle -> minhash
    // signature -> band buckets -> bucket join. The only joins are on
    // band keys; candidate count is output, never all-pairs. ----
    QueryDef("q41_near_dup", minhashOracle) { (s, dir) =>
      val docs = T(s, dir, "documents")
      val words = docs
        .select(col("doc_id"), split(lower(col("text")), " ").as("ws"))
        .filter(size(col("ws")) >= 3)
      val shingles = words
        .select(col("doc_id"),
          explode(sequence(lit(1), size(col("ws")) - 2)).as("i"), col("ws"))
        .select(col("doc_id"), concat_ws(" ",
          element_at(col("ws"), col("i")),
          element_at(col("ws"), col("i") + 1),
          element_at(col("ws"), col("i") + 2)).as("s"))
      val hp = shingles.select(col("doc_id"),
        (conv(substring(md5(col("s")), 1, 15), 16, 10).cast(LongType) % P).as("hp"))
      val sig = hp.groupBy(col("doc_id"))
        .agg(
          min((col("hp") * hashA(0) + hashB(0)) % P).as("m0"),
          (1 until K).map(i =>
            min((col("hp") * hashA(i) + hashB(i)) % P).as(s"m$i")): _*)
      val bandRows = sig.select(col("doc_id"),
        expr(bands.zipWithIndex.map { case ((x, y), j) =>
          s"$j, concat(m$x, '_', m$y)"
        }.mkString(s"stack(${bands.size}, ", ", ", ") as (band, key)")))
      val a = bandRows.as("a"); val b = bandRows.as("b")
      a.join(b, col("a.band") === col("b.band") && col("a.key") === col("b.key")
          && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .distinct()
        .orderBy(col("doc_a"), col("doc_b"))
    },

    // ---- similarity search: brute-force cosine top-k against one query
    // vector (the exactness baseline; the LSH-bucketed variant is the
    // scale pre-filter). Single scan, per-row fold, one TakeOrdered; the
    // plan's BroadcastNestedLoopJoin has a 1-ROW build side (the query
    // vector) — this is an N x 1 broadcast, not an all-pairs join. ----
    QueryDef(
      "q42_topk_cosine",
      """WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
        |p AS (SELECT e.vec_id, e.label,
        |        unnest(e.embedding)::DOUBLE AS x, unnest(q.qe)::DOUBLE AS y
        |      FROM embeddings e, q),
        |s AS (SELECT vec_id, label, SUM(x*y) AS dot, SUM(x*x) AS na, SUM(y*y) AS nb
        |      FROM p GROUP BY vec_id, label)
        |SELECT vec_id, label, round(dot / (sqrt(na) * sqrt(nb)), 6) AS cos_r
        |FROM s WHERE vec_id <> 0
        |ORDER BY cos_r DESC, vec_id
        |LIMIT 20""".stripMargin) { (s, dir) =>
      val e = T(s, dir, "embeddings")
      val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qe"))
      val dbl = (c: Column) => transform(c, x => x.cast(DoubleType))
      val withQ = e.filter(col("vec_id") =!= 0).crossJoin(broadcast(q))
        .select(col("vec_id"), col("label"),
          dbl(col("embedding")).as("ed"), dbl(col("qe")).as("qd"))
      val fold = (c: Column) => aggregate(c, lit(0.0), (acc, x) => acc + x)
      withQ
        .select(col("vec_id"), col("label"),
          fold(zip_with(col("ed"), col("qd"), (x, y) => x * y)).as("dot"),
          fold(zip_with(col("ed"), col("ed"), (x, y) => x * y)).as("na"),
          fold(zip_with(col("qd"), col("qd"), (x, y) => x * y)).as("nb"))
        .select(col("vec_id"), col("label"),
          round(col("dot") / (sqrt(col("na")) * sqrt(col("nb"))), 6).as("cos_r"))
        .orderBy(col("cos_r").desc, col("vec_id"))
        .limit(20)
    },

    // ---- text analysis: language-ID heuristic (stopword markers),
    // quality ratios, and a BPE-ish regex token count, aggregated per
    // (labelled lang, predicted lang). All per-doc work is scan-local. ----
    QueryDef("q43_text_stats", textStatsOracle) { (s, dir) =>
      val markers = Seq("en" -> "the", "de" -> "der", "es" -> "el", "fr" -> "le", "zh" -> "的")
      val docs = T(s, dir, "documents")
        .withColumn("ws", split(lower(col("text")), " "))
        .withColumn("n_tok", size(col("ws")))
      val withCounts = markers.foldLeft(docs) { case (df, (code, word)) =>
        df.withColumn(s"c_$code", size(filter(col("ws"), w => w === word)))
      }
      val pred = when(col("c_en") >= greatest(col("c_de"), col("c_es"), col("c_fr"), col("c_zh")) && col("c_en") > 0, "en")
        .when(col("c_de") >= greatest(col("c_es"), col("c_fr"), col("c_zh")) && col("c_de") > 0, "de")
        .when(col("c_es") >= greatest(col("c_fr"), col("c_zh")) && col("c_es") > 0, "es")
        .when(col("c_fr") >= col("c_zh") && col("c_fr") > 0, "fr")
        .when(col("c_zh") > 0, "zh")
        .otherwise("und")
      withCounts
        .withColumn("lang_pred", pred)
        .withColumn("n_rgx", size(regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"), lit(0))))
        .withColumn("n_stop", col("c_en") + col("c_de") + col("c_es") + col("c_fr") + col("c_zh"))
        .groupBy(col("lang"), col("lang_pred"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_tok")).as("sum_tokens"),
          sum(col("n_rgx")).as("sum_rgx_tokens"),
          (sum(col("n_tok")).cast(DoubleType) / count(lit(1))).as("avg_tokens"),
          (sum(col("n_stop")).cast(DoubleType) / sum(col("n_tok"))).as("stop_ratio"),
          (sum(col("n_chars")).cast(DoubleType) / sum(col("n_tok"))).as("chars_per_tok"))
        .orderBy(col("lang"), col("lang_pred"))
    }
  )

  /** DuckDB mirror of q41, generated from the same hash-family constants
    * so both engines are in lockstep by construction. */
  private def minhashOracle: String = {
    val minCols = (0 until K).map(i =>
      s"min((hp * ${hashA(i)} + ${hashB(i)}) % $P) AS m$i").mkString(",\n        ")
    val bandSelects = bands.zipWithIndex.map { case ((x, y), j) =>
      s"SELECT doc_id, $j AS band, m$x || '_' || m$y AS key FROM mh"
    }.mkString("\n  UNION ALL ")
    s"""WITH words AS (
       |  SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
       |sh AS (
       |  SELECT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS s
       |  FROM words, unnest(generate_series(1, len(ws)-2)) AS u(i)
       |  WHERE len(ws) >= 3),
       |h AS (
       |  SELECT doc_id, ('0x' || substr(md5(s), 1, 15))::BIGINT % $P AS hp FROM sh),
       |mh AS (
       |  SELECT doc_id,
       |        $minCols
       |  FROM h GROUP BY doc_id),
       |bands AS (
       |  $bandSelects)
       |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |FROM bands a JOIN bands b
       |  ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  private def textStatsOracle: String =
    """WITH d AS (
      |  SELECT lang, n_chars, string_split(lower(text), ' ') AS ws, lower(text) AS lt
      |  FROM documents),
      |c AS (
      |  SELECT lang, n_chars, len(ws) AS n_tok,
      |    len(regexp_extract_all(lt, '[a-z0-9]+')) AS n_rgx,
      |    len(list_filter(ws, x -> x = 'the')) AS c_en,
      |    len(list_filter(ws, x -> x = 'der')) AS c_de,
      |    len(list_filter(ws, x -> x = 'el')) AS c_es,
      |    len(list_filter(ws, x -> x = 'le')) AS c_fr,
      |    len(list_filter(ws, x -> x = '的')) AS c_zh
      |  FROM d),
      |p AS (
      |  SELECT *,
      |    CASE WHEN c_en >= greatest(c_de, c_es, c_fr, c_zh) AND c_en > 0 THEN 'en'
      |         WHEN c_de >= greatest(c_es, c_fr, c_zh) AND c_de > 0 THEN 'de'
      |         WHEN c_es >= greatest(c_fr, c_zh) AND c_es > 0 THEN 'es'
      |         WHEN c_fr >= c_zh AND c_fr > 0 THEN 'fr'
      |         WHEN c_zh > 0 THEN 'zh'
      |         ELSE 'und' END AS lang_pred,
      |    c_en + c_de + c_es + c_fr + c_zh AS n_stop
      |  FROM c)
      |SELECT lang, lang_pred, COUNT(*) AS n_docs,
      |  CAST(SUM(n_tok) AS BIGINT) AS sum_tokens,
      |  CAST(SUM(n_rgx) AS BIGINT) AS sum_rgx_tokens,
      |  CAST(SUM(n_tok) AS DOUBLE) / COUNT(*) AS avg_tokens,
      |  CAST(SUM(n_stop) AS DOUBLE) / SUM(n_tok) AS stop_ratio,
      |  CAST(SUM(n_chars) AS DOUBLE) / SUM(n_tok) AS chars_per_tok
      |FROM p
      |GROUP BY lang, lang_pred
      |ORDER BY lang, lang_pred""".stripMargin
}
