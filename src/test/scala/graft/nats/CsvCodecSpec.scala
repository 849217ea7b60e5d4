package graft.nats

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Ports the 16 test intents of the reference's orphaned codec suite
  * (reference src/codec/csv_test.rs:11-285 — never compiled there,
  * SURVEY §5.1; made real here). Property-based coverage lives in
  * [[CsvCodecProps]] (plain ScalaCheck, run by sbt's scalacheck framework).
  */
class CsvCodecSpec extends AnyFunSuite {

  private val basic = StructType(Seq(
    StructField("id", IntegerType, nullable = false),
    StructField("name", StringType, nullable = false)))

  private def codec(s: StructType): CsvCodec =
    CsvCodec(s).fold(e => fail(s"codec rejected: ${e.message}"), identity)

  // ---- per-type parse (csv_test.rs:11-24, 78-162) ----

  test("int + string payload parses to catalyst values") {
    assert(codec(basic).parse("1,apple").map(_.toSeq) ===
      Right(Seq[Any](1, UTF8String.fromString("apple"))))
  }

  test("float64 parses, including exponent and sign forms") {
    val s = StructType(Seq(StructField("x", DoubleType, nullable = false)))
    val c = codec(s)
    assert(c.parse("3.14").map(_.toSeq) === Right(Seq[Any](3.14)))
    assert(c.parse("-2.5e3").map(_.toSeq) === Right(Seq[Any](-2500.0)))
    assert(c.parse("42").map(_.toSeq) === Right(Seq[Any](42.0)))
  }

  test("boolean accepts exactly the 4 tokens, case-insensitive") {
    val s = StructType(Seq(StructField("b", BooleanType, nullable = false)))
    val c = codec(s)
    assert(c.parse("true").map(_.toSeq) === Right(Seq[Any](true)))
    assert(c.parse("TRUE").map(_.toSeq) === Right(Seq[Any](true)))
    assert(c.parse("1").map(_.toSeq) === Right(Seq[Any](true)))
    assert(c.parse("false").map(_.toSeq) === Right(Seq[Any](false)))
    assert(c.parse("0").map(_.toSeq) === Right(Seq[Any](false)))
    // Spark's cast would accept these; the reference codec must not
    // (ref src/codec/csv.rs:144-154, SURVEY §1.2)
    for (bad <- Seq("t", "f", "yes", "no", "y", "n", "2", "on"))
      assert(c.parse(bad).isLeft, s"'$bad' must be rejected")
  }

  test("timestamp parses yyyy-MM-dd HH:mm:ss as UTC microseconds") {
    val s = StructType(Seq(StructField("ts", TimestampType, nullable = false)))
    // 2024-01-15 10:30:00 UTC = 1705314600 epoch seconds
    assert(codec(s).parse("2024-01-15 10:30:00").map(_.toSeq) ===
      Right(Seq[Any](1705314600000000L)))
    assert(codec(s).parse("1970-01-01 00:00:00").map(_.toSeq) === Right(Seq[Any](0L)))
  }

  test("date parses yyyy-MM-dd to days since unix epoch (NOT the reference's days-from-CE bug)") {
    val s = StructType(Seq(StructField("d", DateType, nullable = false)))
    assert(codec(s).parse("1970-01-01").map(_.toSeq) === Right(Seq[Any](0)))
    assert(codec(s).parse("1970-01-02").map(_.toSeq) === Right(Seq[Any](1)))
    assert(codec(s).parse("1969-12-31").map(_.toSeq) === Right(Seq[Any](-1)))
    // 2025-07-25 is 20294 days after 1970-01-01 (the reference would store
    // 739457 via num_days_from_ce — ref src/codec/csv.rs:177, SURVEY §2.C1)
    assert(codec(s).parse("2025-07-25").map(_.toSeq) === Right(Seq[Any](20294)))
  }

  test("all six types in one payload") {
    val s = StructType(Seq(
      StructField("i", IntegerType, nullable = false),
      StructField("f", DoubleType, nullable = false),
      StructField("b", BooleanType, nullable = false),
      StructField("s", StringType, nullable = false),
      StructField("t", TimestampType, nullable = false),
      StructField("d", DateType, nullable = false)))
    val got = codec(s).parse("7,1.5,true,hello,1970-01-01 00:01:00,1970-02-01")
    assert(got.map(_.toSeq) ===
      Right(Seq[Any](7, 1.5, true, UTF8String.fromString("hello"), 60000000L, 31)))
  }

  // ---- schema validation (csv_test.rs:27-75) ----

  test("empty schema rejected") {
    assert(CsvCodec(StructType(Nil)).isLeft)
  }

  test("duplicate field names rejected") {
    val s = StructType(Seq(
      StructField("a", IntegerType), StructField("a", StringType)))
    assert(CsvCodec(s) match {
      case Left(CodecError.DuplicateField("a")) => true
      case _ => false
    })
  }

  test("empty field name rejected") {
    val s = StructType(Seq(StructField("", IntegerType)))
    assert(CsvCodec(s).isLeft)
  }

  test("unsupported data types rejected (whitelist of six)") {
    for (dt <- Seq(LongType, FloatType, ShortType, BinaryType,
        DecimalType(10, 2), ArrayType(IntegerType))) {
      val s = StructType(Seq(StructField("x", dt)))
      assert(CsvCodec(s).isLeft, s"$dt must be rejected")
    }
  }

  // ---- value errors: error-not-null (csv_test.rs:164-249) ----

  test("empty value is an error, not a null") {
    val c = codec(basic)
    assert(c.parse(",apple").isLeft)   // empty first field
    assert(c.parse("1,").isLeft)       // empty trailing field (arity still 2)
  }

  test("malformed timestamp rejected") {
    val s = StructType(Seq(StructField("ts", TimestampType, nullable = false)))
    for (bad <- Seq("2024-01-15", "2024-01-15T10:30:00", "not-a-time",
        "2024-13-01 00:00:00", "2024-01-32 00:00:00"))
      assert(codec(s).parse(bad).isLeft, s"'$bad' must be rejected")
  }

  test("malformed date rejected") {
    val s = StructType(Seq(StructField("d", DateType, nullable = false)))
    for (bad <- Seq("2024/01/15", "15-01-2024", "2024-02-30", "x"))
      assert(codec(s).parse(bad).isLeft, s"'$bad' must be rejected")
  }

  test("arity mismatch both directions rejected") {
    val c = codec(basic)
    assert(c.parse("1").isLeft)             // too few
    assert(c.parse("1,apple,extra").isLeft) // too many
  }

  test("non-numeric int rejected, including floats, whitespace, overflow") {
    val s = StructType(Seq(StructField("i", IntegerType, nullable = false)))
    for (bad <- Seq("abc", "1.5", " 1", "1 ", "0x10", "2147483648"))
      assert(codec(s).parse(bad).isLeft, s"'$bad' must be rejected")
  }

  test("non-numeric double rejected, including java-isms rust would accept differently") {
    val s = StructType(Seq(StructField("f", DoubleType, nullable = false)))
    for (bad <- Seq("abc", " 1.5", "1.5 ", "1.5f", "1.5d"))
      assert(codec(s).parse(bad).isLeft, s"'$bad' must be rejected")
  }

  // ---- encode: the parse inverse used by the sink ----

  test("encode rejects sub-second timestamps instead of silently truncating") {
    val s = StructType(Seq(StructField("ts", TimestampType, nullable = false)))
    val c = codec(s)
    // whole seconds round-trip: encode . parse = identity
    for (micros <- Seq(0L, 60000000L, 1705314600000000L, -86400000000L)) {
      val enc = c.encode(Array[Any](micros))
      assert(enc.isRight, s"$micros µs must encode")
      assert(enc.flatMap(c.parse).map(_.toSeq) === Right(Seq[Any](micros)))
    }
    // fractional seconds are an error, never silent truncation — including
    // pre-1970 values where truncation-toward-zero would shift forward 1 s
    for (micros <- Seq(500000L, 1705314600123456L, -500000L, -86400000000L + 1L))
      assert(c.encode(Array[Any](micros)).isLeft, s"$micros µs must be rejected")
  }
}
