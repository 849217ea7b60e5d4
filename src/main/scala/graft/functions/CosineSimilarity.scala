package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst cosine similarity over two `array<float>` columns.
  *
  * Why an Expression and not a UDF: this stays inside whole-stage codegen
  * (the generated loop below is inlined into the stage's Java), avoids
  * per-row serialization to Scala objects, and keeps the surrounding
  * operators codegen-fused — the preference order for extending Spark
  * (custom Expression > Scala UDF, see the project brief / SURVEY §7.5).
  *
  * Semantics are pinned to the composable form used by q42
  * (`aggregate(zip_with(...))`): a single left-to-right summation of
  * x*y, x*x, y*y in double, then dot / (sqrt(na)*sqrt(nb)). Identical
  * IEEE operation sequence → bit-identical results, so both share one
  * DuckDB oracle. Empty or length-mismatched inputs yield NaN (the same
  * 0/0 the fold form produces on empty arrays).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_similarity expects array<float|double> inputs, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "cosine_similarity"

  private def elementsNullable(dt: DataType): Boolean = dt match {
    case ArrayType(_, containsNull) => containsNull
    case _ => false
  }

  // Element accessor per input type (round 21): `array<double>` inputs —
  // the serve/truth legs score double vectors (midpoint queries) — read
  // elements directly; `array<float>` elements widen exactly, so both
  // paths feed the identical double accumulation loop.
  private def isDoubleArr(dt: DataType): Boolean = dt match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  // A null *element* yields a null result (see nullSafeEval), so the
  // expression is nullable whenever the element type admits nulls — not
  // only when a whole input can be null.
  override def nullable: Boolean =
    left.nullable || right.nullable ||
      elementsNullable(left.dataType) || elementsNullable(right.dataType)

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements() || n == 0) Double.NaN
    else {
      val lDouble = isDoubleArr(left.dataType)
      val rDouble = isDoubleArr(right.dataType)
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < n) {
        // Null elements null-propagate, matching the fold form
        // (zip_with product of a null is null; the aggregate sum of a
        // null is null) — NOT silently read as 0.0.
        if (x.isNullAt(i) || y.isNullAt(i)) return null
        val xv = if (lDouble) x.getDouble(i) else x.getFloat(i).toDouble
        val yv = if (rDouble) y.getDouble(i) else y.getFloat(i).toDouble
        dot += xv * yv; na += xv * xv; nb += yv * yv
        i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      // ev.isNull is a compile-time "false" literal when nullable=false, in
      // which case no null-element branch is emitted (nor needed).
      val nullElementCheck =
        if (nullable)
          s"""if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"""
        else ""
      def get(arr: String, idx: String, dbl: Boolean): String =
        if (dbl) s"$arr.getDouble($idx)" else s"(double) $arr.getFloat($idx)"
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements() || $n == 0) {
         |  ${ev.value} = Double.NaN;
         |} else {
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullElementCheck
         |    double $xv = ${get(a, i, isDoubleArr(left.dataType))};
         |    double $yv = ${get(b, i, isDoubleArr(right.dataType))};
         |    $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
         |  }
         |  ${ev.value} = ${if (nullable) s"${ev.isNull} ? -1.0 : " else ""}$dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

/** Native squared-L2 distance over two `array<double>` columns (round
  * 21, optimization: guide §4.1 "prefer built-ins/codegen over
  * interpreted paths"). Replaces the interpreted
  * `aggregate(zip_with(v, c, (x,y) -> (x-y)*(x-y)), 0.0, +)` fold that
  * the k-means assignment and every PQ encode/LUT leg evaluated per
  * candidate row — a higher-order function runs the lambda per element
  * with no codegen, and Probe measured it as the dominant stage of the
  * graph/IVFPQ harness entries.
  *
  * Semantics are pinned to the fold form (SketchParitySpec): one
  * left-to-right summation of (x-y)*(x-y) in double — the identical
  * IEEE operation sequence, so results are bit-identical and every
  * existing oracle pairing is unchanged. Edge cases match zip_with +
  * aggregate exactly: two empty arrays fold to the 0.0 init; a length
  * mismatch zips a null in (null product, null sum) → null; a null
  * element null-propagates. */
case class Dist2(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dist2 expects (array<double>, array<double>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_dist2"

  private def elementsNullable(dt: DataType): Boolean = dt match {
    case ArrayType(_, containsNull) => containsNull
    case _ => false
  }

  // Length mismatch returns null (zip_with pads with null), so the
  // expression is nullable even over non-null inputs.
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) null
    else {
      var acc = 0.0
      var i = 0
      while (i < n) {
        if (x.isNullAt(i) || y.isNullAt(i)) return null
        val d = x.getDouble(i) - y.getDouble(i)
        acc += d * d
        i += 1
      }
      acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      val nullElementCheck =
        if (elementsNullable(left.dataType) || elementsNullable(right.dataType))
          s"""if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"""
        else ""
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullElementCheck
         |    double $d = $a.getDouble($i) - $b.getDouble($i);
         |    $acc += $d * $d;
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Dist2 =
    copy(left = newLeft, right = newRight)
}

/** Native dot product over two `array<double>` columns (round 22,
  * guide §4.1 "reduce per-row work in the hot loop"). The scoring legs
  * of the graph/serve family all read [[java.lang.Math]] pairs off
  * frames that ALREADY carry each vector's precomputed norm
  * (vecsWithNorms / the query panels), yet `cosine_similarity`
  * recomputes Σx² and Σy² per pair — two of its three multiply-adds
  * per element are redundant there. `graft_dot(a, b) / (na * nb)` is
  * bit-identical to `cosine_similarity(a, b)` when na/nb are the
  * precomputed `sqrt(Σx²)` values: the kernel's per-pair
  * `sqrt(na_recomputed)` is the same left-to-right IEEE fold as the
  * stored norm (the established q42/q53 shared-oracle argument), and
  * the division's operand order is unchanged.
  *
  * Edge semantics mirror [[CosineSimilarity]] exactly so the quotient
  * matches in every case: empty or length-mismatched inputs yield NaN
  * (NaN / anything = NaN, as cosine's 0/0); a null element
  * null-propagates. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot expects (array<double>, array<double>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_dot"

  private def elementsNullable(dt: DataType): Boolean = dt match {
    case ArrayType(_, containsNull) => containsNull
    case _ => false
  }

  override def nullable: Boolean =
    left.nullable || right.nullable ||
      elementsNullable(left.dataType) || elementsNullable(right.dataType)

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements() || n == 0) Double.NaN
    else {
      var dot = 0.0
      var i = 0
      while (i < n) {
        if (x.isNullAt(i) || y.isNullAt(i)) return null
        dot += x.getDouble(i) * y.getDouble(i)
        i += 1
      }
      dot
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val nullElementCheck =
        if (nullable)
          s"""if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"""
        else ""
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements() || $n == 0) {
         |  ${ev.value} = Double.NaN;
         |} else {
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullElementCheck
         |    $dot += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  ${ev.value} = ${if (nullable) s"${ev.isNull} ? -1.0 : " else ""}$dot;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Registration: as a session extension (`.withExtensions(GraftExtensions)`)
  * or imperatively on a live session. */
object GraftFunctions {

  private val cosineInfo = new ExpressionInfo(
    classOf[CosineSimilarity].getName, null, "cosine_similarity",
    "_FUNC_(a, b) - cosine similarity of two float vectors",
    "", "", "", "", "", "", "built-in")

  private[functions] val cosineBuilder: Seq[Expression] => Expression = {
    case Seq(a, b) => CosineSimilarity(a, b)
    case other => throw new IllegalArgumentException(
      s"cosine_similarity expects 2 arguments, got ${other.size}")
  }

  private val dist2Info = new ExpressionInfo(
    classOf[Dist2].getName, null, "graft_dist2",
    "_FUNC_(a, b) - squared L2 distance of two double vectors",
    "", "", "", "", "", "", "built-in")

  private[functions] val dist2Builder: Seq[Expression] => Expression = {
    case Seq(a, b) => Dist2(a, b)
    case other => throw new IllegalArgumentException(
      s"graft_dist2 expects 2 arguments, got ${other.size}")
  }

  private val dotInfo = new ExpressionInfo(
    classOf[DotProduct].getName, null, "graft_dot",
    "_FUNC_(a, b) - dot product of two double vectors",
    "", "", "", "", "", "", "built-in")

  private[functions] val dotBuilder: Seq[Expression] => Expression = {
    case Seq(a, b) => DotProduct(a, b)
    case other => throw new IllegalArgumentException(
      s"graft_dot expects 2 arguments, got ${other.size}")
  }

  private def unary(name: String, make: Expression => Expression)
    : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(name),
      new ExpressionInfo(classOf[Sketches.type].getName, null, name),
      { case Seq(c) => make(c)
        case other => throw new IllegalArgumentException(
          s"$name expects 1 argument, got ${other.size}") })

  private val sketchFns = Seq(
    unary("graft_simhash32", SimHash32),
    unary("graft_minhash_sig", MinHashSignature),
    unary("graft_shingle_hashes", ShingleHashes),
    unary("graft_lsh_buckets", LshBuckets),
    unary("graft_text_counts", TextCounts),
    unary("graft_span_hashes", SpanHashes),
    unary("graft_line_hashes", LineHashes),
    unary("graft_bigram_hashes", BigramHashes),
    unary("graft_trigram_hashes", TrigramHashes),
    unary("graft_char_entropy", CharEntropy),
    unary("graft_nfc", NfcNormalize),
    unary("graft_html_text", HtmlText),
    unary("graft_minhash_agg", (c: Expression) => MinHashAgg(c)),
    gramHashesFn,
    bottomKFn)

  private lazy val gramHashesFn
    : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("graft_gram_hashes"),
      new ExpressionInfo(classOf[GramHashes].getName, null, "graft_gram_hashes"),
      { case Seq(t, k) => GramHashes(t, k)
        case other => throw new IllegalArgumentException(
          s"graft_gram_hashes expects 2 arguments, got ${other.size}") })

  private lazy val bottomKFn
    : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("graft_bottomk_distinct"),
      new ExpressionInfo(classOf[BottomKDistinctAgg].getName, null, "graft_bottomk_distinct"),
      { case Seq(c, k) => BottomKDistinctAgg(c, k)
        case other => throw new IllegalArgumentException(
          s"graft_bottomk_distinct expects 2 arguments, got ${other.size}") })

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("cosine_similarity"), cosineInfo, cosineBuilder)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_dist2"), dist2Info, dist2Builder)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_dot"), dotInfo, dotBuilder)
    sketchFns.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
  }

  /** The sketch functions in SparkSessionExtensions.injectFunction form. */
  private[functions] def injectables
    : Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    sketchFns
}

/** `spark.sql.extensions=graft.functions.GraftExtensions` wiring — the
  * same function set GraftFunctions.register installs imperatively. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(
      (FunctionIdentifier("cosine_similarity"),
        new ExpressionInfo(classOf[CosineSimilarity].getName, null, "cosine_similarity"),
        GraftFunctions.cosineBuilder)) // arity-checked, same as register()
    ext.injectFunction(
      (FunctionIdentifier("graft_dist2"),
        new ExpressionInfo(classOf[Dist2].getName, null, "graft_dist2"),
        GraftFunctions.dist2Builder))
    ext.injectFunction(
      (FunctionIdentifier("graft_dot"),
        new ExpressionInfo(classOf[DotProduct].getName, null, "graft_dot"),
        GraftFunctions.dotBuilder))
    GraftFunctions.injectables.foreach(ext.injectFunction)
  }
}
