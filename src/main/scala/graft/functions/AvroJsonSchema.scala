package graft.functions

import scala.jdk.CollectionConverters._

/** User-supplied Avro schema support for the avro-json-compat serializer
  * (reference: pkg/app/pulsar.go:174-189 `avro-json-compat=<path>`,
  * pkg/pulsar/serializers.go:202-222 NewAvroJSONSerializer).
  *
  * The schema is parsed and validated at PLAN time (construction fails like
  * goavro.NewCodec on an invalid schema); serialization then emits the
  * record's fields in schema order, applying schema defaults for values the
  * sample doesn't carry (e.g. tenant_id default "").
  */
object AvroJsonSchema {

  /** The engine-known record fields and how they serialize. */
  val KnownFields: Set[String] = Set("timestamp", "value", "name", "labels", "tenant_id")

  final case class Field(name: String, default: Option[String])

  final case class Parsed(fields: Seq[Field]) {
    /** Compact spec passed into the serializer expression: name[=default] csv. */
    def spec: String = fields.map {
      case Field(n, Some(d)) => s"$n=$d"
      case Field(n, None) => n
    }.mkString(",")
  }

  /** Parse + validate; throws IllegalArgumentException on anything goavro
    * would reject or the engine cannot serialize.
    */
  def parse(schemaJson: String): Parsed = {
    val schema =
      try new org.apache.avro.Schema.Parser().parse(schemaJson)
      catch {
        case e: Exception =>
          throw new IllegalArgumentException(s"invalid avro schema: ${e.getMessage}", e)
      }
    require(schema.getType == org.apache.avro.Schema.Type.RECORD,
      s"avro schema must be a record, got ${schema.getType}")
    val fields = schema.getFields.asScala.map { f =>
      val n = f.name()
      require(KnownFields.contains(n),
        s"avro schema field '$n' is not serializable from a sample (known: ${KnownFields.mkString(", ")})")
      val expectMap = n == "labels"
      val t = f.schema().getType
      require(
        if (expectMap) t == org.apache.avro.Schema.Type.MAP
        else t == org.apache.avro.Schema.Type.STRING,
        s"avro schema field '$n' has unsupported type $t")
      val default =
        if (f.hasDefaultValue) Some(String.valueOf(f.defaultVal())) else None
      Field(n, default)
    }.toSeq
    require(fields.nonEmpty, "avro schema has no fields")
    Parsed(fields)
  }

  /** Serialize with an explicit field spec (see [[Parsed.spec]]); labels must
    * be pre-sorted. Fields without a sample value use the schema default;
    * a missing value with no default is an error (goavro validation parity).
    */
  def serialize(
      spec: String,
      timestampMs: Long,
      value: Double,
      labelKeys: Array[String],
      labelValues: Array[String],
      tenantId: String): String = {
    val sb = new java.lang.StringBuilder(96)
    sb.append('{')
    var first = true
    spec.split(",", -1).foreach { f =>
      val eq = f.indexOf('=')
      val (name, default) = if (eq >= 0) (f.substring(0, eq), Some(f.substring(eq + 1))) else (f, None)
      if (!first) sb.append(',')
      first = false
      PromKernel.appendJsonString(sb, name)
      sb.append(':')
      name match {
        case "timestamp" => PromKernel.appendJsonString(sb, PromKernel.rfc3339Nano(timestampMs))
        case "value" => PromKernel.appendJsonString(sb, PromKernel.valueString(value))
        case "name" =>
          var n = ""
          var i = 0
          while (i < labelKeys.length) { if (labelKeys(i) == "__name__") n = labelValues(i); i += 1 }
          PromKernel.appendJsonString(sb, n)
        case "labels" =>
          sb.append('{')
          var i = 0
          while (i < labelKeys.length) {
            if (i > 0) sb.append(',')
            PromKernel.appendJsonString(sb, labelKeys(i))
            sb.append(':')
            PromKernel.appendJsonString(sb, labelValues(i))
            i += 1
          }
          sb.append('}')
        case "tenant_id" =>
          val t = if (tenantId == null) "" else tenantId
          if (t.nonEmpty) PromKernel.appendJsonString(sb, t)
          else default match {
            case Some(d) => PromKernel.appendJsonString(sb, d)
            case None => throw new IllegalStateException(
              "tenant_id absent and schema has no default (goavro would reject)")
          }
      }
    }
    sb.append('}')
    sb.toString
  }
}
