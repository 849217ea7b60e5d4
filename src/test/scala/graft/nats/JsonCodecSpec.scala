package graft.nats

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The JSON payload codec: the CSV codec's strictness model
  * (error-not-null, exact field set, six-type whitelist) transposed onto
  * one-flat-object-per-message payloads. See JsonCodec's Scaladoc for the
  * deliberate divergences (real JSON booleans, empty string allowed).
  */
class JsonCodecSpec extends AnyFunSuite {

  private val basic = StructType(Seq(
    StructField("id", IntegerType, nullable = false),
    StructField("name", StringType, nullable = false)))

  private val allTypes = StructType(Seq(
    StructField("i", IntegerType, nullable = false),
    StructField("f", DoubleType, nullable = false),
    StructField("b", BooleanType, nullable = false),
    StructField("s", StringType, nullable = false),
    StructField("t", TimestampType, nullable = false),
    StructField("d", DateType, nullable = false)))

  private def codec(s: StructType): JsonCodec =
    JsonCodec(s).fold(e => fail(s"codec rejected: ${e.message}"), identity)

  // ---- happy path ----

  test("flat object parses to catalyst values") {
    assert(codec(basic).parse("""{"id":1,"name":"apple"}""").map(_.toSeq) ===
      Right(Seq[Any](1, UTF8String.fromString("apple"))))
  }

  test("key order is free; all six types in one payload") {
    val payload =
      """{"d":"1970-02-01","s":"hello","i":7,"b":true,"t":"1970-01-01 00:01:00","f":1.5}"""
    assert(codec(allTypes).parse(payload).map(_.toSeq) ===
      Right(Seq[Any](7, 1.5, true, UTF8String.fromString("hello"), 60000000L, 31)))
  }

  test("double accepts both JSON integers and floats; int does not accept floats") {
    val sd = StructType(Seq(StructField("f", DoubleType, nullable = false)))
    assert(codec(sd).parse("""{"f":42}""").map(_.toSeq) === Right(Seq[Any](42.0)))
    assert(codec(sd).parse("""{"f":-2.5e3}""").map(_.toSeq) === Right(Seq[Any](-2500.0)))
    val si = StructType(Seq(StructField("i", IntegerType, nullable = false)))
    assert(codec(si).parse("""{"i":4.0}""").isLeft, "4.0 is not an Int32")
  }

  test("empty string is a valid JSON value (unlike CSV, where it is ambiguous-missing)") {
    assert(codec(basic).parse("""{"id":1,"name":""}""").map(_.toSeq) ===
      Right(Seq[Any](1, UTF8String.fromString(""))))
  }

  test("string values containing commas and quotes survive (CSV cannot frame these)") {
    val got = codec(basic).parse("""{"id":1,"name":"a,b \"c\" d"}""")
    assert(got.map(_.toSeq) === Right(Seq[Any](1, UTF8String.fromString("a,b \"c\" d"))))
  }

  // ---- strict typing: error, never null ----

  test("JSON null is rejected for every type") {
    for (f <- allTypes.fields) {
      val s = StructType(Seq(f))
      assert(codec(s).parse(s"""{"${f.name}":null}""").isLeft, s"${f.dataType} must reject null")
    }
  }

  test("strings are not numbers and numbers are not strings") {
    val si = StructType(Seq(StructField("i", IntegerType, nullable = false)))
    assert(codec(si).parse("""{"i":"42"}""").isLeft)
    val ss = StructType(Seq(StructField("s", StringType, nullable = false)))
    assert(codec(ss).parse("""{"s":42}""").isLeft)
  }

  test("boolean accepts only JSON true/false — not 1/0, not strings") {
    val s = StructType(Seq(StructField("b", BooleanType, nullable = false)))
    val c = codec(s)
    assert(c.parse("""{"b":true}""").map(_.toSeq) === Right(Seq[Any](true)))
    assert(c.parse("""{"b":false}""").map(_.toSeq) === Right(Seq[Any](false)))
    assert(c.parse("""{"b":1}""").isLeft)
    assert(c.parse("""{"b":"true"}""").isLeft)
  }

  test("int32 range enforced") {
    val s = StructType(Seq(StructField("i", IntegerType, nullable = false)))
    assert(codec(s).parse("""{"i":2147483647}""").map(_.toSeq) ===
      Right(Seq[Any](Int.MaxValue)))
    assert(codec(s).parse("""{"i":2147483648}""").isLeft)
    assert(codec(s).parse("""{"i":-2147483649}""").isLeft)
  }

  test("timestamp and date use the same wire formats as CSV, same strictness") {
    val st = StructType(Seq(StructField("t", TimestampType, nullable = false)))
    assert(codec(st).parse("""{"t":"2024-01-15 10:30:00"}""").map(_.toSeq) ===
      Right(Seq[Any](1705314600000000L)))
    for (bad <- Seq("2024-01-15", "2024-01-15T10:30:00", "2024-13-01 00:00:00"))
      assert(codec(st).parse(s"""{"t":"$bad"}""").isLeft, s"'$bad' must be rejected")
    val sd = StructType(Seq(StructField("d", DateType, nullable = false)))
    assert(codec(sd).parse("""{"d":"1969-12-31"}""").map(_.toSeq) === Right(Seq[Any](-1)))
    for (bad <- Seq("2024/01/15", "2024-02-30"))
      assert(codec(sd).parse(s"""{"d":"$bad"}""").isLeft, s"'$bad' must be rejected")
  }

  // ---- shape errors ----

  test("field set must equal the schema: missing, unknown, duplicate keys rejected") {
    val c = codec(basic)
    assert(c.parse("""{"id":1}""").isLeft, "missing field")
    assert(c.parse("""{"id":1,"name":"a","extra":2}""").isLeft, "unknown field")
    assert(c.parse("""{"id":1,"id":2,"name":"a"}""") match {
      case Left(CodecError.DuplicateField("id")) => true
      case _ => false
    })
  }

  test("nested objects, arrays, non-objects, malformed and trailing JSON rejected") {
    val c = codec(basic)
    assert(c.parse("""{"id":1,"name":{"x":1}}""").isLeft, "nested object")
    assert(c.parse("""{"id":[1],"name":"a"}""").isLeft, "array value")
    assert(c.parse("""[1,"apple"]""").isLeft, "top-level array")
    assert(c.parse(""""just a string"""").isLeft, "top-level scalar")
    assert(c.parse("""{"id":1,"name":"a"""").isLeft, "truncated")
    assert(c.parse("""{"id":1,"name":"a"} extra""").isLeft, "trailing content")
    assert(c.parse("""1,apple""").isLeft, "a CSV payload is not JSON")
  }

  test("schema validation shares the CSV rules (empty, dup names, whitelist)") {
    assert(JsonCodec(StructType(Nil)).isLeft)
    assert(JsonCodec(StructType(Seq(
      StructField("a", IntegerType), StructField("a", StringType)))).isLeft)
    assert(JsonCodec(StructType(Seq(StructField("x", LongType)))).isLeft)
  }

  // ---- encode: the sink inverse ----

  test("encode then parse is the identity across all six types") {
    val c = codec(allTypes)
    val values = Array[Any](7, 1.5, true, UTF8String.fromString("a,b \"q\""), 60000000L, 31)
    val enc = c.encode(values)
    assert(enc.isRight)
    assert(enc.flatMap(c.parse).map(_.toSeq) === Right(values.toSeq))
  }

  test("encode rejects sub-second timestamps like the CSV codec") {
    val s = StructType(Seq(StructField("t", TimestampType, nullable = false)))
    assert(codec(s).encode(Array[Any](500000L)).isLeft)
    assert(codec(s).encode(Array[Any](60000000L)).isRight)
  }

  test("PayloadCodec.apply selects by name and rejects unknown codecs") {
    assert(PayloadCodec("csv", basic).exists(_.isInstanceOf[CsvCodec]))
    assert(PayloadCodec("JSON", basic).exists(_.isInstanceOf[JsonCodec]))
    assert(PayloadCodec("avro", basic).isLeft)
  }
}
