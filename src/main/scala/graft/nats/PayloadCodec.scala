package graft.nats

import org.apache.spark.sql.types._

/** One NATS message payload ⇄ one row of Catalyst-internal values.
  *
  * The reference hard-codes a single CSV codec behind a `codec` field it
  * threads through the source (reference src/data_source.rs:24, always a
  * `CsvCodec`); the seam exists there precisely so other wire formats can
  * plug in. This trait is that seam made explicit: [[CsvCodec]] is the
  * parity implementation, [[JsonCodec]] the first extension (JSON being
  * the other payload format NATS tooling emits by default).
  *
  * Contract shared by all implementations (reference src/codec/csv.rs):
  *   - the schema is validated at construction: non-empty, unique non-empty
  *     field names, only the six whitelisted types (csv.rs:75-85);
  *   - every malformed payload is an error, never a null row (csv.rs:116-121);
  *   - parse returns Catalyst-internal values (Int, Double, Boolean,
  *     UTF8String, Long µs, Int epoch-days) so a DSv2 PartitionReader wraps
  *     them in an InternalRow without conversion;
  *   - encode is the inverse: encode-then-parse is the identity.
  */
trait PayloadCodec extends Serializable {
  def schema: StructType
  def parse(payload: String): Either[CodecError, Array[Any]]
  def encode(values: Array[Any]): Either[CodecError, String]
}

object PayloadCodec {
  import CodecError._

  private[nats] val supported: Set[DataType] =
    Set(IntegerType, DoubleType, BooleanType, StringType, TimestampType, DateType)

  /** Schema rules every codec enforces at construction
    * (reference src/codec/csv.rs:48-91). */
  private[nats] def validateSchema(schema: StructType): Option[CodecError] = {
    if (schema.fields.isEmpty)
      return Some(SchemaMismatch("Schema must have at least one field"))
    val seen = scala.collection.mutable.HashSet.empty[String]
    for (f <- schema.fields) {
      if (f.name.isEmpty)
        return Some(SchemaMismatch("Field name cannot be empty"))
      if (!seen.add(f.name))
        return Some(DuplicateField(f.name))
      if (!supported.contains(f.dataType))
        return Some(TypeError(s"Unsupported data type: ${f.dataType.sql} in field ${f.name}"))
    }
    None
  }

  /** Select a codec by the `codec` source option ("csv" default, "json"). */
  def apply(name: String, schema: StructType): Either[CodecError, PayloadCodec] =
    name.toLowerCase match {
      case "csv"  => CsvCodec(schema)
      case "json" => JsonCodec(schema)
      case other  => Left(TypeError(
        s"Unsupported payload codec: '$other'. Supported: csv, json"))
    }

  /** Throwing variant for DSv2 call sites (getTable / writer factories). */
  def strict(name: String, schema: StructType): PayloadCodec =
    apply(name, schema).fold(e => throw new IllegalArgumentException(e.message), identity)
}
