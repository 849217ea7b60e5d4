package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Group-level MinHash: aggregates pre-hashed item values (60-bit md5
  * prefixes mod P, the corpus-wide hash idiom) into a K-permutation
  * signature per group — `array<bigint>` of K minima.
  *
  * This is the TypedImperativeAggregate extension path (SURVEY §7.5): one
  * mutable long[K] buffer per group instead of K separate `min(...)`
  * aggregate buffers, with a compact 8*K-byte serialized form for
  * partial/final shuffles. Map-side partial aggregation applies as usual,
  * so the shuffle carries one signature per (partition, group), never the
  * items. The per-document MinHash (q41) stays a scalar expression — a
  * document's items live in its own row; this aggregate is for groups
  * whose items arrive as ROWS (a user's events, a source's shingles).
  *
  * Semantics are pinned to K separate `min((hp * a_k + b_k) % P)` columns
  * — the formulation the DuckDB oracle uses — so results are bit-identical
  * by construction. Duplicate items are harmless (min over a multiset
  * equals min over its set), which is what makes signatures mergeable.
  * Null inputs are skipped exactly like SQL `min`, including the all-null
  * group: a buffer no update ever touched evals to NULL, matching
  * `array(min(h1), …)` over an all-null group. The sentinel is
  * unambiguous because every real hash is `x % P` with P = 2^31-1, so
  * |x| < P << Long.MaxValue — a slot can hold Long.MaxValue only if no
  * input row was non-null.
  */
case class MinHashAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  private val K = Sketches.K

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a BIGINT item hash, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true // all-null group evals to NULL, like SQL min
  override def prettyName: String = "graft_minhash_agg"

  override def createAggregationBuffer(): Array[Long] = Array.fill(K)(Long.MaxValue)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val hp = v.asInstanceOf[Long]
      var k = 0
      while (k < K) {
        val x = (hp * Sketches.hashA(k) + Sketches.hashB(k)) % Sketches.P
        if (x < buffer(k)) buffer(k) = x
        k += 1
      }
    }
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var k = 0
    while (k < K) {
      if (other(k) < buffer(k)) buffer(k) = other(k)
      k += 1
    }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = {
    // Untouched sentinel: update() lowers every slot below P on the first
    // non-null input, so slot 0 at Long.MaxValue means the group saw no
    // non-null rows — return NULL, matching SQL min over an all-null group.
    if (buffer(0) == Long.MaxValue) null
    else new GenericArrayData(buffer.clone())
  }

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * K)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(K)(bb.getLong())
  }

  override def defaultResult: Option[Literal] = None

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MinHashAgg =
    copy(child = newChild)
}
