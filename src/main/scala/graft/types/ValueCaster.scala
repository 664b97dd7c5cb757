package graft.types

import java.math.BigDecimal
import java.time.{LocalDate, LocalDateTime, OffsetDateTime, ZoneOffset}
import scala.collection.mutable.ArrayBuffer

/** Wire-text → typed-value casting for CDC payloads: the Spark rendition of
  * the reference's ValueCaster + ArrayLexer
  * (`/root/reference/lib/sequin/postgres/value_caster.ex`,
  * `/root/reference/lib/sequin/postgres/array_lexer.ex`).
  *
  * The replication protocol delivers every cell as text; this module turns
  * those strings into JVM values suitable for `Row`/`InternalRow`
  * construction against the Spark schema from [[sparkType]]. Unknown types
  * fall back to the raw string (value_caster.ex:75-81); the
  * `unchanged_toast` sentinel is surfaced as [[UnchangedToast]] so the
  * TOAST-resolution operator (P8) can coalesce it against the old image.
  */
object ValueCaster {

  /** Sentinel for TOAST columns omitted from the wire (decoder.ex:428-430). */
  case object UnchangedToast

  val ToastSentinel = "unchanged_toast"

  /** pg type name → Spark SQL type (SURVEY §1.3 table). */
  def sparkType(pgType: String): org.apache.spark.sql.types.DataType = {
    import org.apache.spark.sql.types._
    pgType match {
      case "bool"                                      => BooleanType
      case "int2" | "int4" | "int8" | "oid"            => LongType
      case "float4" | "float8"                         => DoubleType
      case "numeric" | "money"                         => DecimalType(38, 18)
      case "bytea"                                     => BinaryType
      case "timestamp"                                 => TimestampNTZType
      case "timestamptz"                               => TimestampType
      case "date"                                      => DateType
      case "json" | "jsonb"                            => StringType // JSON doc
      case "vector"                                    => ArrayType(FloatType)
      case "interval" =>
        StructType(Seq(StructField("months", IntegerType),
          StructField("days", IntegerType), StructField("micros", LongType)))
      case t if t.startsWith("_")                      => ArrayType(sparkType(t.stripPrefix("_")))
      case _                                           => StringType
    }
  }

  /** Cast one wire-text cell. `null` stays null; unparseable values fall
    * back to the raw string, mirroring value_caster.ex's error tolerance.
    */
  def cast(pgType: String, value: String): Any = {
    if (value == null) return null
    if (value == ToastSentinel) return UnchangedToast
    try {
      pgType match {
        case "bool" => value == "t" || value == "true"
        case "int2" | "int4" | "int8" | "oid" => value.toLong
        case "float4" | "float8" => value.toDouble
        case "numeric" | "money" =>
          new BigDecimal(value.stripPrefix("$").replace(",", ""))
        case "bytea" =>
          if (value.startsWith("\\x")) hexToBytes(value.drop(2))
          else value.getBytes("UTF-8")
        case "timestamp" => LocalDateTime.parse(value.replace(' ', 'T'))
        case "timestamptz" =>
          OffsetDateTime.parse(normalizeTzText(value))
            .withOffsetSameInstant(ZoneOffset.UTC)
        case "date" => LocalDate.parse(value)
        case "interval" =>
          val (m, d, us) = parseInterval(value)
          org.apache.spark.sql.Row(m, d, us) // matches sparkType's struct

        case "vector" =>
          value.stripPrefix("[").stripSuffix("]").split(",").map(_.trim.toFloat).toSeq
        case t if t.startsWith("_") =>
          lexArrayTagged(value).map {
            case (null, _) => null
            // pg multidimensional arrays keep the same type name; only BARE
            // elements are nested literals — a quoted element beginning with
            // '{' is a text value (array_lexer.ex keeps quoted elements as
            // strings during lexing)
            case (s, false) if s.startsWith("{") => cast(t, s)
            case (s, _)                          => cast(t.stripPrefix("_"), s)
          }
        case _ => value
      }
    } catch { case _: Exception => value }
  }

  /** Postgres `interval` text → (months, days, microseconds), the shape the
    * reference normalizes to (value_caster.ex:153-251). Accepts
    * "[N year[s]] [N mon[s]] [N day[s]] [HH:MM:SS[.ffffff]]".
    */
  def parseInterval(text: String): (Int, Int, Long) = {
    var months = 0
    var days = 0
    var micros = 0L
    val parts = text.trim.split("\\s+")
    var i = 0
    while (i < parts.length) {
      val p = parts(i)
      if (p.contains(":")) {
        val neg = p.startsWith("-")
        val hms = p.stripPrefix("-").split(":")
        val secParts = hms(2).split("\\.")
        var us = hms(0).toLong * 3600000000L + hms(1).toLong * 60000000L +
          secParts(0).toLong * 1000000L
        if (secParts.length > 1)
          us += secParts(1).padTo(6, '0').take(6).toLong
        micros += (if (neg) -us else us)
        i += 1
      } else if (i + 1 < parts.length) {
        val n = p.toInt
        parts(i + 1).stripSuffix("s") match {
          case "year" => months += 12 * n
          case "mon"  => months += n
          case "day"  => days += n
          case _      => ()
        }
        i += 2
      } else i += 1
    }
    (months, days, micros)
  }

  /** Postgres array-literal lexer: `{a,"b,c",NULL,{nested}}` → elements
    * (nested arrays kept as raw text for recursive casting). Mirrors
    * array_lexer.ex (quoted elements, backslash escapes, NULL, nesting).
    */
  def lexArray(text: String): Seq[String] = lexArrayTagged(text).map(_._1)

  /** [[lexArray]] plus a was-quoted flag per element. `cast` needs it to
    * distinguish a bare nested literal `{a}` (recurse) from a quoted text
    * value `"{a}"` (string) — the reference lexer keeps quoted elements as
    * strings (array_lexer.ex), so quoting must survive depth-0 lexing.
    */
  def lexArrayTagged(text: String): Seq[(String, Boolean)] = {
    val t = text.trim
    require(t.startsWith("{") && t.endsWith("}"), s"not an array literal: $text")
    val inner = t.substring(1, t.length - 1)
    if (inner.isEmpty) return Nil
    val out = ArrayBuffer.empty[(String, Boolean)]
    val cur = new StringBuilder
    var depth = 0
    var inQuotes = false
    var wasQuoted = false
    var i = 0
    def flush(): Unit = {
      val s = cur.toString
      out += (if (!wasQuoted && s == "NULL") (null, false) else (s, wasQuoted))
      cur.clear(); wasQuoted = false
    }
    while (i < inner.length) {
      val c = inner.charAt(i)
      c match {
        // Inside a nested array the raw text is re-lexed recursively, so
        // quotes and escapes must pass through VERBATIM — consuming them
        // here would mis-split elements like {{"a,b"},{c}} on re-lex.
        case '\\' if inQuotes && i + 1 < inner.length =>
          if (depth > 0) cur += c
          cur += inner.charAt(i + 1); i += 1
        case '"' =>
          inQuotes = !inQuotes
          if (depth > 0) cur += c else wasQuoted = true
        case '{' if !inQuotes => depth += 1; cur += c
        case '}' if !inQuotes => depth -= 1; cur += c
        case ',' if !inQuotes && depth == 0 => flush()
        case _ => cur += c
      }
      i += 1
    }
    flush()
    out.toSeq
  }

  private def hexToBytes(hex: String): Array[Byte] =
    hex.grouped(2).map(h => Integer.parseInt(h, 16).toByte).toArray

  /** Postgres emits `2024-01-01 00:00:00+00`; ISO parsers want `T` and a
    * full offset.
    */
  private def normalizeTzText(v: String): String = {
    val t = v.replace(' ', 'T')
    if (t.matches(".*[+-]\\d{2}$")) t + ":00" else t
  }
}
