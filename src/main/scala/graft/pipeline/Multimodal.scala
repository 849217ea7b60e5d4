package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset}

/** Multimodal column handling: media as opaque `binary` payloads with
  * typed metadata, and a batch-shaped feature-extraction pass.
  *
  * The Spark-side plumbing is real — schema, encoders, iterator-to-
  * iterator mapPartitions (the Scala analog of a mapInPandas batch UDF),
  * partition-preserving execution. IMAGE decode is real too:
  * [[decodeImage]] parses actual PNG/JPEG/GIF/BMP bytes with the JDK's
  * built-in ImageIO readers. The remaining environment seam is
  * audio/video (no codecs ship with the JDK): [[decodeStub]] derives
  * deterministic fake dimensions from the payload's md5, and also serves
  * as the documented fallback for image-labeled payloads that are not
  * decodable images. Swapping in an av codec changes only that one
  * function; everything around it (and its tests) stays.
  */
object Multimodal {

  /** One media row: opaque payload + the metadata a catalog would carry. */
  final case class Media(doc_id: Long, payload: Array[Byte], format: String)

  /** Extracted per-media features (width/height/frames faked, see above). */
  final case class Features(
      doc_id: Long, format: String, byte_len: Int,
      width: Int, height: Int, n_frames: Int)

  def md5Hex(bytes: Array[Byte]): String = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(bytes)
    d.map("%02x".format(_)).mkString
  }

  /** STUB decoder — deterministic fake (width, height, n_frames) from the
    * first 8 md5 hex chars. Used for audio/video (no codecs ship with the
    * JDK) and as the documented fallback for image payloads that fail to
    * parse; the arithmetic is kept SQL-expressible so the whole pipeline
    * stays oracle-checkable.
    */
  def decodeStub(payload: Array[Byte]): (Int, Int, Int) = {
    val h1 = java.lang.Long.parseLong(md5Hex(payload).substring(0, 8), 16)
    val width = 64 + (h1 % 193).toInt
    val height = 64 + ((h1 / 193) % 193).toInt
    val nFrames = 1 + (h1 % 7).toInt
    (width, height, nFrames)
  }

  /** REAL image decode via the JDK's ImageIO — PNG/JPEG/GIF/BMP readers
    * ship with every JRE, no external codec needed. None when the payload
    * is not a decodable image. */
  def decodeImage(payload: Array[Byte]): Option[(Int, Int)] =
    try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload)))
      .map(img => (img.getWidth, img.getHeight))
    catch { case _: java.io.IOException => None }

  /** Formats the JDK can genuinely decode. */
  val ImageFormats: Set[String] = Set("png", "jpeg", "jpg", "gif", "bmp")

  /** Format-aware decode: REAL header parse for image formats (a decoded
    * still image is one frame); the deterministic stub for audio/video
    * (the remaining environment seam) and for image-labeled payloads that
    * are not actually decodable — media keeps flowing with derived
    * metadata instead of killing the batch, the same keep-streaming
    * philosophy as the codec's skip-malformed policy (and what keeps the
    * synthetic text-payload fixtures oracle-checkable).
    */
  def decode(payload: Array[Byte], format: String): (Int, Int, Int) =
    if (ImageFormats(format.toLowerCase(java.util.Locale.ROOT)))
      decodeImage(payload) match {
        case Some((w, h)) => (w, h, 1)
        case None         => decodeStub(payload)
      }
    else decodeStub(payload)

  /** Batch feature extraction: iterator-to-iterator per partition, so
    * executors stream batches without materializing a partition in memory
    * — the shape a heavyweight decoder needs (model/codec handles are
    * initialized once per partition, before the iterator is consumed).
    */
  def extractFeatures(media: Dataset[Media]): Dataset[Features] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition init of a heavyweight decoder would go here
      it.map { m =>
        val (w, h, f) = decode(m.payload, m.format)
        Features(m.doc_id, m.format, m.payload.length, w, h, f)
      }
    }
  }

  def extractFeaturesDf(media: DataFrame): DataFrame = {
    import media.sparkSession.implicits._
    extractFeatures(media.as[Media]).toDF()
  }

  /** One sampled frame after decode → resize → frame-sample. */
  final case class Frame(
      doc_id: Long, format: String, frame_idx: Int,
      scaled_w: Int, scaled_h: Int, frame_hash: Long)

  /** Aspect-preserving resize to a max dimension of `target` (no-op when
    * already within bounds). Pure integer/double arithmetic kept
    * SQL-expressible for the oracle. */
  def resizeStub(w: Int, h: Int, target: Int): (Int, Int) = {
    val m = math.max(w, h)
    if (m <= target) (w, h)
    else (math.floor(w * target.toDouble / m).toInt,
      math.floor(h * target.toDouble / m).toInt)
  }

  /** STUB frame content hash: 60-bit md5 prefix of "md5hex(payload)_idx" —
    * what a real pipeline would compute over decoded frame bytes. */
  def frameHash(payload: Array[Byte], frameIdx: Int): Long =
    graft.functions.Sketches.md5Prefix60(
      s"${md5Hex(payload)}_$frameIdx".getBytes("UTF-8"))

  /** decode → resize → sample every `everyNth` frame, as a row-EXPANDING
    * iterator-to-iterator pass (flatMap): one media row yields
    * ceil(n_frames / everyNth) frame rows without materializing a
    * partition — the batch shape real video frame extraction needs.
    * Frame indices are 1-based; sampling keeps 1, 1+everyNth, ...
    */
  def sampleFrames(media: Dataset[Media], target: Int, everyNth: Int): Dataset[Frame] = {
    require(target > 0 && everyNth > 0)
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { m =>
        val (w, h, f) = decode(m.payload, m.format)
        val (sw, sh) = resizeStub(w, h, target)
        (1 to f).iterator
          .filter(i => (i - 1) % everyNth == 0)
          .map(i => Frame(m.doc_id, m.format, i, sw, sh, frameHash(m.payload, i)))
      }
    }
  }

  def sampleFramesDf(media: DataFrame, target: Int, everyNth: Int): DataFrame = {
    import media.sparkSession.implicits._
    sampleFrames(media.as[Media], target, everyNth).toDF()
  }
}
