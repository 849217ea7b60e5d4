package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass, scan-local sketch kernels backing the native expressions in
  * [[SketchExpressions]]. Each is the hot inner loop of a Pipeline operator
  * (SimHash q44, MinHash-LSH q41, sign-LSH buckets q46/q54, n-gram Jaccard
  * q45, text stats q43) — computed per ROW in one pass, with no explode, no
  * per-token expression trees, and no shuffle. At 100 TB this is the
  * difference between a map-only stage and shuffling every token of the
  * corpus; the downstream candidate joins stay on compact sketch keys.
  *
  * Every kernel is bit-compatible with the SQL formulation it replaced
  * (asserted by SketchParitySpec):
  *   - tokenization is Spark's own `split(lower(text), ' ')`
  *     (UTF8String.toLowerCase + regex split, trailing empties kept);
  *   - hashing is the cross-engine 60-bit md5 prefix idiom
  *     `conv(substr(md5(x),1,15),16,10)::BIGINT` — here computed directly
  *     from the first 8 digest bytes (big-endian >>> 4), no hex round-trip;
  *   - LSH planes replay the md5 sign grid the DuckDB oracles generate.
  */
object Sketches {

  // ---- shared constants (referenced by Pipeline's oracle generators so
  // Spark and DuckDB stay in lockstep by construction) ----
  val P: Long = 2147483647L // Mersenne prime 2^31-1
  val K: Int = 12           // minhash permutations; 6 bands x 2 rows
  val hashA: Array[Long] = Array.tabulate(K)(i => 2L * i + 3)
  val hashB: Array[Long] = Array.tabulate(K)(i => 5L * i + 1)

  val SIMBITS: Int = 32
  /** SimHash pigeonhole geometry + verify radius, shared by the q44
    * generator (Pipeline), the stored pair artifact (SketchStore), and
    * both of their oracle mirrors — one constant set so the artifact
    * and the generator cannot drift (ADVICE r17). */
  val SIMCHUNKS: Int = 4
  val HAMMING_MAX: Int = 3

  val TABLES: Int = 8 // sign-LSH hash tables
  val PLANES: Int = 6 // sign bits per table
  val DIM: Int = 64   // embedding dimensionality

  private val SPACE = UTF8String.fromString(" ")

  private val digests = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** `conv(substr(md5(x), 1, 15), 16, 10)::BIGINT` without the hex string:
    * the first 15 hex chars are the first 60 bits of the digest.
    */
  def md5Prefix60(bytes: Array[Byte]): Long =
    md5Prefix60(bytes, 0, bytes.length)

  /** Slice variant: hash `len` bytes at `off` without materializing a
    * per-call array — the hot path for per-position windows (trigrams). */
  def md5Prefix60(bytes: Array[Byte], off: Int, len: Int): Long = {
    val md = digests.get()
    md.reset()
    md.update(bytes, off, len)
    val d = md.digest()
    (((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) | ((d(2) & 0xffL) << 40) |
      ((d(3) & 0xffL) << 32) | ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)) >>> 4
  }

  private def tokens(text: UTF8String): Array[UTF8String] =
    text.toLowerCase.split(SPACE, -1)

  /** 32-bit SimHash of whitespace tokens (every occurrence votes, empty
    * tokens included — same population as explode(split(...))), majority
    * rule `2 * ones > n` per bit. One pass, no shuffle (was: explode +
    * 33-aggregate groupBy).
    */
  def simhash32(text: UTF8String): Long = {
    val ws = tokens(text)
    val n = ws.length
    val bs = new Array[Int](SIMBITS)
    var j = 0
    while (j < n) {
      val h = md5Prefix60(ws(j).getBytes)
      var i = 0
      while (i < SIMBITS) {
        bs(i) += ((h >>> i) & 1L).toInt
        i += 1
      }
      j += 1
    }
    var sh = 0L
    var i = 0
    while (i < SIMBITS) {
      if (2 * bs(i) > n) sh |= 1L << i
      i += 1
    }
    sh
  }

  /** 60-bit hash of the word-3-gram starting at token i (bytes of
    * `concat_ws(" ", w(i), w(i+1), w(i+2))`). */
  /** 60-bit hash of the k-token gram at position i: the tokens joined
    * with single spaces, md5-prefixed — the generalized [[shingleHash]]
    * (round 21, backs q180's word-8-gram explode). Bit-compatible with
    * `conv(substr(md5(array_join(slice(ws, i+1, k), ' ')), 1, 15), 16,
    * 10)::BIGINT` (SketchParitySpec). */
  private def gramHash(ws: Array[UTF8String], i: Int, k: Int): Long = {
    var len = k - 1 // single-space separators
    var j = i
    while (j < i + k) { len += ws(j).getBytes.length; j += 1 }
    val out = new Array[Byte](len)
    var off = 0
    j = i
    while (j < i + k) {
      val b = ws(j).getBytes
      System.arraycopy(b, 0, out, off, b.length)
      off += b.length
      if (j < i + k - 1) { out(off) = ' '; off += 1 }
      j += 1
    }
    md5Prefix60(out)
  }

  /** Ordered 60-bit hashes of ALL k-token grams (index j = gram starting
    * at token j; duplicates kept), or null when the text has fewer than
    * k tokens — one pass replacing q180's per-position
    * sequence-explode + slice + array_join + md5 expression tree. */
  def gramHashes(text: UTF8String, k: Int): ArrayData = {
    val ws = tokens(text)
    if (ws.length < k) return null
    val out = new Array[Long](ws.length - (k - 1))
    var i = 0
    while (i <= ws.length - k) {
      out(i) = gramHash(ws, i, k)
      i += 1
    }
    new GenericArrayData(out)
  }

  private def shingleHash(ws: Array[UTF8String], i: Int): Long = {
    val a = ws(i).getBytes; val b = ws(i + 1).getBytes; val c = ws(i + 2).getBytes
    val out = new Array[Byte](a.length + b.length + c.length + 2)
    System.arraycopy(a, 0, out, 0, a.length)
    out(a.length) = ' '
    System.arraycopy(b, 0, out, a.length + 1, b.length)
    out(a.length + b.length + 1) = ' '
    System.arraycopy(c, 0, out, a.length + b.length + 2, c.length)
    md5Prefix60(out)
  }

  /** MinHash signature (K permutations over word-3-gram hashes mod P), or
    * null when the document has fewer than 3 tokens — the same rows the
    * old `filter(size(ws) >= 3)` dropped before shingling. */
  def minhashSig(text: UTF8String): ArrayData = {
    val ws = tokens(text)
    if (ws.length < 3) return null
    val mins = Array.fill(K)(Long.MaxValue)
    var i = 0
    while (i <= ws.length - 3) {
      val hp = shingleHash(ws, i) % P
      var k = 0
      while (k < K) {
        val v = (hp * hashA(k) + hashB(k)) % P
        if (v < mins(k)) mins(k) = v
        k += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** All word-3-gram 60-bit hashes of a document (with duplicates — the
    * caller dedups after explode, on longs instead of strings), or null
    * when fewer than 3 tokens. */
  def shingleHashes(text: UTF8String): ArrayData = {
    val ws = tokens(text)
    if (ws.length < 3) return null
    val out = new Array[Long](ws.length - 2)
    var i = 0
    while (i <= ws.length - 3) {
      out(i) = shingleHash(ws, i)
      i += 1
    }
    new GenericArrayData(out)
  }

  // q98/q124 "line" width in words (the boundary rule is a parameter —
  // real corpora segment on newlines); referenced by Pipeline so the
  // kernel and the SQL/oracle formulations stay in lockstep.
  val LINE_WORDS: Int = 5

  /** 60-bit hashes of the fixed [[LINE_WORDS]]-word non-overlapping
    * "lines" (q98's segmentation; the final partial segment included),
    * duplicates kept — one pass replacing the sequence-explode +
    * slice + array_join + md5 expression tree. Never null: any non-null
    * text tokenizes to at least one (possibly empty) token = one
    * segment, matching `ceil(len(ws) / width)` in SQL. */
  def lineHashes(text: UTF8String): ArrayData = {
    val ws = tokens(text)
    val n = ws.length
    val width = LINE_WORDS
    val nSegs = (n + width - 1) / width
    val out = new Array[Long](nSegs)
    var s = 0
    while (s < nSegs) {
      val start = s * width
      val end = math.min(n, start + width)
      var len = end - start - 1 // single-space separators
      var j = start
      while (j < end) { len += ws(j).getBytes.length; j += 1 }
      val joined = new Array[Byte](len)
      var off = 0
      j = start
      while (j < end) {
        val b = ws(j).getBytes
        System.arraycopy(b, 0, joined, off, b.length)
        off += b.length
        if (j < end - 1) { joined(off) = ' '; off += 1 }
        j += 1
      }
      out(s) = md5Prefix60(joined)
      s += 1
    }
    new GenericArrayData(out)
  }

  /** 60-bit hashes of every char trigram (one per position, RAW text —
    * no lowercasing: q126's `substring(text, i, 3)` population over
    * code points), or null when the document has fewer than 3 chars
    * (the `length(text) >= 3` rows). One pass replacing the
    * sequence-explode + per-position substring + md5 expression tree —
    * the corpus-heavy step of language ID. */
  def trigramHashes(text: UTF8String): ArrayData = {
    val n = text.numChars()
    if (n < 3) return null
    // One UTF-8 byte pass: record each code point's byte offset, then
    // hash byte windows [cp(i), cp(i+3)) in place — no per-position
    // substring/UTF8String/array allocations (this kernel's md5 count is
    // irreducible; the allocations around it were not).
    val bytes = text.getBytes
    val offs = new Array[Int](n + 1)
    var b = 0; var c = 0
    while (c < n) {
      offs(c) = b
      val first = bytes(b)
      b += (if ((first & 0x80) == 0) 1
            else if ((first & 0xe0) == 0xc0) 2
            else if ((first & 0xf0) == 0xe0) 3
            else 4)
      c += 1
    }
    offs(n) = bytes.length
    val out = new Array[Any](n - 2)
    var i = 0
    while (i <= n - 3) {
      out(i) = md5Prefix60(bytes, offs(i), offs(i + 3) - offs(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Per-position word-bigram hash pairs for LM scoring (q103):
    * (h1, h2) = (hash of the prefix word, hash of `w_i + ' ' + w_{i+1}`)
    * at every position, duplicates kept — one pass replacing the
    * sequence-explode + two per-row md5 expression trees. Null when the
    * document has fewer than 2 tokens (the `size(ws) >= 2` population). */
  def bigramHashes(text: UTF8String): ArrayData = {
    val ws = tokens(text)
    if (ws.length < 2) return null
    val out = new Array[Any](ws.length - 1)
    var i = 0
    while (i <= ws.length - 2) {
      val a = ws(i).getBytes
      val b = ws(i + 1).getBytes
      val joined = new Array[Byte](a.length + b.length + 1)
      System.arraycopy(a, 0, joined, 0, a.length)
      joined(a.length) = ' '
      System.arraycopy(b, 0, joined, a.length + 1, b.length)
      out(i) = org.apache.spark.sql.catalyst.InternalRow(
        md5Prefix60(a), md5Prefix60(joined))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Deterministic ±1 hyperplane component from md5 — identical to the
    * formula the DuckDB oracle writes in SQL (and to Pipeline.planeSign). */
  def planeSign(t: Int, p: Int, d: Int): Long =
    1L - 2L * (md5Prefix60(s"${t}_${p}_${d}".getBytes("UTF-8")) % 2L)

  // Flattened [t][p][d] sign grid, built once per JVM (3072 md5 calls).
  private lazy val signGrid: Array[Long] = {
    val g = new Array[Long](TABLES * PLANES * DIM)
    var t = 0
    while (t < TABLES) {
      var p = 0
      while (p < PLANES) {
        var d = 1
        while (d <= DIM) {
          g((t * PLANES + p) * DIM + d - 1) = planeSign(t, p, d)
          d += 1
        }
        p += 1
      }
      t += 1
    }
    g
  }

  /** Sign-LSH bucket keys, one per hash table: bit p of table t is set when
    * the dot product of the integer-quantized vector with plane (t, p) is
    * positive. Replaces a 64-way explode + 3072-row grid join + two
    * shuffled aggregations with one scan-local pass. */
  def lshBuckets(emb: ArrayData): ArrayData = {
    val n = math.min(emb.numElements(), DIM)
    val xi = new Array[Long](n)
    var d = 0
    while (d < n) {
      xi(d) = math.floor(emb.getFloat(d).toDouble * 32768.0).toLong
      d += 1
    }
    val out = new Array[Long](TABLES)
    var t = 0
    while (t < TABLES) {
      var bk = 0L
      var p = 0
      while (p < PLANES) {
        val base = (t * PLANES + p) * DIM
        var pr = 0L
        d = 0
        while (d < n) {
          pr += xi(d) * signGrid(base + d)
          d += 1
        }
        if (pr > 0) bk |= 1L << p
        p += 1
      }
      out(t) = bk
      t += 1
    }
    new GenericArrayData(out)
  }

  // ---- duplicated-span detection (q102): strided rolling windows over
  // the lowercased text. 32-char windows every 8 chars ≈ the ExactSubstr
  // idea at 1/8 the window count — a span duplicated across documents
  // collides on at least one aligned-enough window.
  val SPAN_W: Int = 32
  val SPAN_S: Int = 8

  /** 60-bit hashes of the strided SPAN_W-codepoint windows of
    * `lower(text)` (duplicates kept; callers array_distinct scan-locally),
    * or null when the text is shorter than one window — the same rows the
    * oracle's `generate_series(1, len - (W-1), S)` leaves empty. */
  def spanHashes(text: UTF8String): ArrayData = {
    val lt = text.toLowerCase
    val n = lt.numChars()
    if (n < SPAN_W) return null
    val count = (n - SPAN_W) / SPAN_S + 1
    val out = new Array[Long](count)
    var j = 0
    while (j < count) {
      val start = j * SPAN_S
      out(j) = md5Prefix60(lt.substringSQL(start + 1, SPAN_W).getBytes)
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Shannon entropy (bits/char) over the text's code points, as
    * `log2(n) - sum(c_i * log2(c_i)) / n` — the exact arithmetic shape the
    * DuckDB oracle writes, so cross-engine drift is the two engines' log2
    * ulp difference only (rounded away at 6 decimals by the caller).
    * 0.0 for empty text (callers filter len > 0 to match the oracle's
    * vanishing empty-series rows). */
  /** Unicode NFC normalization (UAX#15) — the multilingual-corpus
    * canonicalization step (mC4-style pipelines normalize before
    * tokenizing, so "é" composed and "e"+U+0301 dedup/hash/count the
    * same). The JDK's java.text.Normalizer implements the same standard
    * DuckDB's nfc_normalize does (cross-engine agreement spot-validated
    * on composed/decomposed Latin, Hangul jamo, combining-mark ordering,
    * compatibility chars, 4-byte emoji). Fast path: isNormalized avoids
    * the String round-trip for already-NFC (incl. all-ASCII) text. */
  def nfc(text: UTF8String): UTF8String = {
    val s = text.toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) text
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  // ---- HTML/markup text extraction (q174) ----
  //
  // The step before every text operator on real web crawl (C4/RefinedWeb
  // start from markup). Semantics are DEFINED as this regex-pass chain —
  // the DuckDB oracle runs it literally, the kernel here replicates it
  // with hand-rolled linear scans (no regex engine in the hot path; at
  // 100 TB this runs once per fetched page):
  //   1. (?is)<script[^>]*>.*?</script>  -> ''   (global)
  //   2. (?is)<style[^>]*>.*?</style>    -> ''   (global)
  //   3. <[^>]*>                         -> ' '  (global)
  //   4. entity chain, each a full literal pass in this order:
  //      &lt; &gt; &quot; &#39; &nbsp;(->space) and &amp; LAST
  //      (so double-encoded '&amp;lt;' decodes one level, like the chain)
  //   5. [ \t\r\n]+ -> ' ', then trim spaces.
  // Pass ORDER is load-bearing for pathological interleavings (e.g.
  // '<style>x<script>y</style>z</script>w' — script spans are excised
  // over the WHOLE document before style matching sees it); a single
  // interleaved scan would disagree with the chain. Each pass scans the
  // ORIGINAL input of that pass left-to-right, non-overlapping — exactly
  // regexp_replace(..., 'g') / SQL replace semantics.

  /** ASCII-case-insensitive indexOf (the (?i) of the chain is only ever
    * applied to the ASCII words 'script'/'style'). */
  private def indexOfIc(s: String, target: String, from: Int): Int = {
    val n = s.length; val m = target.length
    var i = math.max(from, 0)
    while (i + m <= n) {
      if (s.regionMatches(true, i, target, 0, m)) return i
      i += 1
    }
    -1
  }

  /** One global pass of `(?is)<tag[^>]*>.*?</tag>` -> ''. */
  private def stripBlocks(s: String, tag: String): String = {
    val open = "<" + tag
    val close = "</" + tag + ">"
    val out = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '<' && s.regionMatches(true, i, open, 0, open.length)) {
        // open tag = '<tag' + [^>]* + '>' (first '>' after the name)
        val gt = s.indexOf('>', i + open.length)
        val end = if (gt < 0) -1 else indexOfIc(s, close, gt + 1)
        if (gt >= 0 && end >= 0) { i = end + close.length }
        else { out.append(c); i += 1 } // no full match at this position
      } else { out.append(c); i += 1 }
    }
    out.toString
  }

  /** One global pass of `<[^>]*>` -> ' '. */
  private def stripTags(s: String): String = {
    val out = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '<') {
        val gt = s.indexOf('>', i + 1)
        if (gt >= 0) { out.append(' '); i = gt + 1 }
        else { out.append(c); i += 1 }
      } else { out.append(c); i += 1 }
    }
    out.toString
  }

  /** `[ \t\r\n]+` -> ' ' then trim spaces. */
  private def collapseWs(s: String): String = {
    val out = new java.lang.StringBuilder(s.length)
    var i = 0
    var pendingSpace = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == ' ' || c == '\t' || c == '\r' || c == '\n') pendingSpace = true
      else {
        if (pendingSpace && out.length > 0) out.append(' ')
        pendingSpace = false
        out.append(c)
      }
      i += 1
    }
    out.toString
  }

  def htmlText(html: UTF8String): UTF8String = {
    var s = html.toString
    s = stripBlocks(s, "script")
    s = stripBlocks(s, "style")
    s = stripTags(s)
    s = s.replace("&lt;", "<").replace("&gt;", ">").replace("&quot;", "\"")
      .replace("&#39;", "'").replace("&nbsp;", " ").replace("&amp;", "&")
    UTF8String.fromString(collapseWs(s))
  }

  def charEntropy(text: UTF8String): Double = {
    val s = text.toString
    if (s.isEmpty) return 0.0
    val counts = new java.util.HashMap[Integer, Array[Long]]()
    var i = 0
    var n = 0L
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val slot = counts.get(cp)
      if (slot == null) counts.put(cp, Array(1L)) else slot(0) += 1
      n += 1
      i += Character.charCount(cp)
    }
    val ln2 = math.log(2.0)
    var acc = 0.0
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next()(0).toDouble
      acc += c * (math.log(c) / ln2)
    }
    math.log(n.toDouble) / ln2 - acc / n
  }

  private val MARKERS: Array[UTF8String] =
    Array("the", "der", "el", "le", "的").map(UTF8String.fromString)

  /** One-pass text statistics: [n_tok, n_rgx, c_en, c_de, c_es, c_fr, c_zh]
    * where n_rgx counts maximal `[a-z0-9]+` runs (what
    * `regexp_extract_all(lower(text), '[a-z0-9]+')` extracts — the class is
    * ASCII-only, so a byte scan is exact even in multi-byte text) and c_*
    * are exact-match stopword-marker token counts. */
  def textCounts(text: UTF8String): ArrayData = {
    val lt = text.toLowerCase
    val ws = lt.split(SPACE, -1)
    val counts = new Array[Long](7)
    counts(0) = ws.length
    val bytes = lt.getBytes
    var prev = false
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      val cur = (b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')
      if (cur && !prev) counts(1) += 1
      prev = cur
      i += 1
    }
    var j = 0
    while (j < ws.length) {
      var m = 0
      while (m < MARKERS.length) {
        if (ws(j).equals(MARKERS(m))) counts(2 + m) += 1
        m += 1
      }
      j += 1
    }
    new GenericArrayData(counts)
  }
}
