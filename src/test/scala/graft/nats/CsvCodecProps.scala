package graft.nats

import org.scalacheck.{Gen, Prop, Properties}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** ScalaCheck round-trip/rejection properties over the codec's 6-type
  * domain (SURVEY §5.2.5). Run by sbt's native ScalaCheck framework
  * (scalatestplus bridge is not in the offline cache).
  */
object CsvCodecProps extends Properties("CsvCodec") {

  private def codec(dt: DataType): CsvCodec =
    CsvCodec(StructType(Seq(StructField("x", dt, nullable = false))))
      .getOrElse(sys.error("codec rejected"))

  private val intC = codec(IntegerType)
  private val dblC = codec(DoubleType)
  private val strC = codec(StringType)
  private val dateC = codec(DateType)
  private val tsC = codec(TimestampType)

  property("every i32 round-trips") = Prop.forAll { (i: Int) =>
    intC.parse(i.toString).map(_.toSeq) == Right(Seq[Any](i))
  }

  property("every finite double round-trips via toString") =
    Prop.forAll { (d: Double) =>
      (d.isNaN || d.isInfinite) ||
        dblC.parse(d.toString).map(_.toSeq) == Right(Seq[Any](d))
    }

  property("comma-free nonempty strings pass through unchanged") =
    Prop.forAll(Gen.alphaNumStr.suchThat(_.nonEmpty)) { s =>
      strC.parse(s).map(_.toSeq) == Right(Seq[Any](UTF8String.fromString(s)))
    }

  property("epoch days ±200y round-trip through ISO format") =
    Prop.forAll(Gen.choose(-73000, 73000)) { days =>
      val str = java.time.LocalDate.ofEpochDay(days.toLong).toString
      dateC.parse(str).map(_.toSeq) == Right(Seq[Any](days))
    }

  property("epoch seconds round-trip through timestamp format at µs precision") =
    Prop.forAll(Gen.choose(-2000000000L, 2000000000L)) { epochSec =>
      val str = java.time.LocalDateTime
        .ofEpochSecond(epochSec, 0, java.time.ZoneOffset.UTC)
        .format(CsvCodec.tsFormat)
      tsC.parse(str).map(_.toSeq) == Right(Seq[Any](epochSec * 1000000L))
    }

  property("ints with junk suffix are rejected") =
    Prop.forAll(Gen.alphaChar, Gen.choose(0, 1000)) { (c, i) =>
      intC.parse(s"$i$c").isLeft
    }

  property("arity violations are rejected for any extra fields") =
    Prop.forAll(Gen.choose(1, 5)) { extra =>
      intC.parse("1" + ",2" * extra).isLeft
    }

  property("encode/parse round-trip: ints") = Prop.forAll { (i: Int) =>
    intC.encode(Array[Any](i)).flatMap(intC.parse).map(_.toSeq) == Right(Seq[Any](i))
  }

  property("encode/parse round-trip: epoch days") =
    Prop.forAll(Gen.choose(-73000, 73000)) { days =>
      dateC.encode(Array[Any](days)).flatMap(dateC.parse).map(_.toSeq) == Right(Seq[Any](days))
    }

  property("encode/parse round-trip: whole-second timestamps") =
    Prop.forAll(Gen.choose(-2000000000L, 2000000000L)) { epochSec =>
      val micros = epochSec * 1000000L
      tsC.encode(Array[Any](micros)).flatMap(tsC.parse).map(_.toSeq) == Right(Seq[Any](micros))
    }

  property("strings with commas are not encodable (framing)") =
    Prop.forAll(Gen.alphaNumStr) { s =>
      strC.encode(Array[Any](UTF8String.fromString(s + "," + s))).isLeft
    }

  property("sub-second timestamps are never encodable (error-not-silent)") =
    Prop.forAll(Gen.choose(-2000000000L, 2000000000L), Gen.choose(1L, 999999L)) {
      (epochSec, subMicros) =>
        tsC.encode(Array[Any](epochSec * 1000000L + subMicros)).isLeft
    }
}
