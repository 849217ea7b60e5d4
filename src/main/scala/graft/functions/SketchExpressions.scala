package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions over the [[Sketches]] kernels. Each stays
  * inside whole-stage codegen: doGenCode emits one static call into the
  * kernel (the StaticInvoke pattern Spark's own built-ins use), so the
  * surrounding operators stay codegen-fused and there is no per-row
  * closure/serialization cost a UDF would pay.
  *
  * Why expressions and not the previous SQL formulations: a document's
  * sketch depends only on its own row, so it belongs in the scan-local map
  * phase. The SQL forms (explode + per-token md5 expression trees +
  * multi-aggregate groupBy, or a 3072-row hyperplane-grid join) shuffle
  * every token/dimension of the corpus to compute what one pass over the
  * row already determines. Downstream LSH candidate joins then operate on
  * compact sketch keys — the 100 TB shape.
  */
private[functions] trait SketchUnary extends UnaryExpression {
  protected def expectedInput: DataType
  protected def kernel: String // static method on graft.functions.Sketches

  override def checkInputDataTypes(): TypeCheckResult = (expectedInput, child.dataType) match {
    case (StringType, StringType)                       => TypeCheckResult.TypeCheckSuccess
    case (ArrayType(FloatType, _), ArrayType(FloatType, _)) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects ${expectedInput.simpleString}, got ${child.dataType.simpleString}")
  }
}

/** 32-bit SimHash of `split(lower(text), ' ')` tokens (q44). */
case class SimHash32(child: Expression) extends SketchUnary {
  protected def expectedInput: DataType = StringType
  protected def kernel: String = "simhash32"
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash32"
  override protected def nullSafeEval(input: Any): Any =
    Sketches.simhash32(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Sketches.simhash32($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHash32 =
    copy(child = newChild)
}

/** Base for kernels returning `array<bigint>` that is null for documents
  * with fewer than 3 tokens (the population the old `size(ws) >= 3`
  * filter kept). */
private[functions] trait NullableArraySketch extends SketchUnary {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.Sketches.$kernel($c);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
}

/** K-permutation MinHash signature over word-3-gram hashes (q41). */
case class MinHashSignature(child: Expression) extends NullableArraySketch {
  protected def expectedInput: DataType = StringType
  protected def kernel: String = "minhashSig"
  override def prettyName: String = "graft_minhash_sig"
  override protected def nullSafeEval(input: Any): Any =
    Sketches.minhashSig(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

/** All word-3-gram 60-bit hashes of a document, duplicates kept (q45). */
case class ShingleHashes(child: Expression) extends NullableArraySketch {
  protected def expectedInput: DataType = StringType
  protected def kernel: String = "shingleHashes"
  override def prettyName: String = "graft_shingle_hashes"
  override protected def nullSafeEval(input: Any): Any =
    Sketches.shingleHashes(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

/** Ordered k-token word-gram 60-bit hashes (array index = start token;
  * duplicates kept; null under k tokens) — q180's span grams in one
  * kernel pass (round 21), replacing the per-position sequence-explode +
  * slice + array_join + md5 expression tree. `k` must fold to an int. */
case class GramHashes(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, IntegerType) if right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (string, int literal), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_gram_hashes"
  override protected def nullSafeEval(text: Any, k: Any): Any =
    Sketches.gramHashes(text.asInstanceOf[UTF8String], k.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, k) => {
      s"""
         |${ev.value} = graft.functions.Sketches.gramHashes($t, $k);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): GramHashes =
    copy(left = newLeft, right = newRight)
}

/** Strided rolling-window 60-bit span hashes over lower(text) (q102). */
case class SpanHashes(child: Expression) extends NullableArraySketch {
  protected def expectedInput: DataType = StringType
  protected def kernel: String = "spanHashes"
  override def prettyName: String = "graft_span_hashes"
  override protected def nullSafeEval(input: Any): Any =
    Sketches.spanHashes(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): SpanHashes =
    copy(child = newChild)
}

/** Fixed 5-word non-overlapping line hashes, q98's segmentation (q124).
  * Unlike the >=3-token sketches this is never null for non-null text,
  * so it rides the plain defineCodeGen path. */
case class LineHashes(child: Expression) extends SketchUnary {
  protected def expectedInput: DataType = StringType
  protected def kernel: String = "lineHashes"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_line_hashes"
  override protected def nullSafeEval(input: Any): Any =
    Sketches.lineHashes(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Sketches.lineHashes($c)")
  override protected def withNewChildInternal(newChild: Expression): LineHashes =
    copy(child = newChild)
}

/** Per-position word-bigram (prefix-hash, bigram-hash) pairs (q103). */
case class BigramHashes(child: Expression) extends SketchUnary {
  protected def expectedInput: DataType = StringType
  protected def kernel: String = "bigramHashes"
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("h1", LongType, nullable = false),
      StructField("h2", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_bigram_hashes"
  override protected def nullSafeEval(input: Any): Any =
    Sketches.bigramHashes(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.Sketches.bigramHashes($c);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
  override protected def withNewChildInternal(newChild: Expression): BigramHashes =
    copy(child = newChild)
}

/** Per-position char-trigram hashes for language ID (q126). */
case class TrigramHashes(child: Expression) extends SketchUnary {
  protected def expectedInput: DataType = StringType
  protected def kernel: String = "trigramHashes"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_trigram_hashes"
  override protected def nullSafeEval(input: Any): Any =
    Sketches.trigramHashes(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.Sketches.trigramHashes($c);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
  override protected def withNewChildInternal(newChild: Expression): TrigramHashes =
    copy(child = newChild)
}

/** Unicode NFC normalization (q167) — UAX#15 canonical composition. */
case class NfcNormalize(child: Expression) extends SketchUnary {
  protected def expectedInput: DataType = StringType
  protected def kernel: String = "nfc"
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"
  override protected def nullSafeEval(input: Any): Any =
    Sketches.nfc(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Sketches.nfc($c)")
  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

/** HTML/markup -> text extraction (q174): script/style excision, tag
  * stripping, entity decoding, whitespace collapse — the documented
  * regex-chain semantics as hand-rolled linear scans (see
  * Sketches.htmlText). */
case class HtmlText(child: Expression) extends SketchUnary {
  protected def expectedInput: DataType = StringType
  protected def kernel: String = "htmlText"
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_html_text"
  override protected def nullSafeEval(input: Any): Any =
    Sketches.htmlText(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Sketches.htmlText($c)")
  override protected def withNewChildInternal(newChild: Expression): HtmlText =
    copy(child = newChild)
}

/** Shannon entropy in bits/char over the text's code points (q104). */
case class CharEntropy(child: Expression) extends SketchUnary {
  protected def expectedInput: DataType = StringType
  protected def kernel: String = "charEntropy"
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_char_entropy"
  override protected def nullSafeEval(input: Any): Any =
    Sketches.charEntropy(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Sketches.charEntropy($c)")
  override protected def withNewChildInternal(newChild: Expression): CharEntropy =
    copy(child = newChild)
}

/** Sign-LSH bucket keys, one per hash table (q46 / q54). */
case class LshBuckets(child: Expression) extends SketchUnary {
  protected def expectedInput: DataType = ArrayType(FloatType)
  protected def kernel: String = "lshBuckets"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_lsh_buckets"
  override protected def nullSafeEval(input: Any): Any =
    Sketches.lshBuckets(input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Sketches.lshBuckets($c)")
  override protected def withNewChildInternal(newChild: Expression): LshBuckets =
    copy(child = newChild)
}

/** One-pass token/marker statistics: [n_tok, n_rgx, c_en, c_de, c_es,
  * c_fr, c_zh] (q43). */
case class TextCounts(child: Expression) extends SketchUnary {
  protected def expectedInput: DataType = StringType
  protected def kernel: String = "textCounts"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_text_counts"
  override protected def nullSafeEval(input: Any): Any =
    Sketches.textCounts(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Sketches.textCounts($c)")
  override protected def withNewChildInternal(newChild: Expression): TextCounts =
    copy(child = newChild)
}
