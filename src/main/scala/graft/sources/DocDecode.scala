package graft.sources

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Document payload decoding — the reference's ingest formats
  * (lnx-ffi/src/format.rs:2-13): JSON "a single object", NDJSON
  * "potentially multiple documents", MSGPACK "potentially multiple
  * documents _or_ a single object map".
  *
  * JSON/NDJSON stay Spark-native (`from_json`, codegen'd); MSGPACK is a
  * self-contained binary parser below (the format spec is public;
  * no external msgpack library exists in this sandbox).
  */
object DocDecode {

  final val Json = "json"
  final val NdJson = "ndjson"
  final val Msgpack = "msgpack"

  /** Decode one request payload (the REST-body analogue — payloads are
    * request-sized, so driver-side parse + parallelize is the right
    * shape; bulk data lives in tables, not request bodies) into rows of
    * `schema`. Missing fields are null (apis/mod.rs:124-127); unknown
    * fields are ignored.
    */
  def decode(spark: SparkSession, format: String, payload: Array[Byte],
      schema: StructType): DataFrame = format match {
    case Json | NdJson =>
      // Spark-native JSON path: one record per Dataset element, typed by
      // the table schema, FAILFAST so malformed payloads error loudly
      import spark.implicits._
      val records =
        if (format == Json) Seq(new String(payload, UTF_8))
        else new String(payload, UTF_8).split('\n').toSeq.map(_.trim).filter(_.nonEmpty)
      spark.read.schema(schema).option("mode", "FAILFAST").json(spark.createDataset(records))
    case Msgpack =>
      val rows = MsgPack.decodeDocs(payload).map(coerceRow(_, schema))
      spark.createDataFrame(spark.sparkContext.parallelize(rows.toList), schema)
    case other => throw new IllegalArgumentException(s"unknown format $other")
  }

  /** Distributed variant: a DataFrame with a binary `payloadCol`, one
    * payload per row (e.g. a queue of request bodies), exploded into
    * documents. Msgpack parse runs per-partition (mapPartitions — a
    * decode kernel, like the PNG/WAV path in ops.Multimodal).
    */
  def decodePayloads(df: DataFrame, payloadCol: String, format: String,
      schema: StructType): DataFrame = {
    val spark = df.sparkSession
    format match {
      case Json | NdJson =>
        // codegen path: split to lines, from_json each line. FAILFAST
        // matches the driver-side decode() contract: a malformed line
        // must error loudly, not surface as an all-null row (PERMISSIVE
        // from_json returns a null struct for garbage)
        val lines =
          if (format == Json) array(col(payloadCol).cast("string"))
          else split(col(payloadCol).cast("string"), "\n")
        df.select(explode(lines).as("__line"))
          .filter(length(trim(col("__line"))) > 0)
          .select(from_json(col("__line"), schema, Map("mode" -> "FAILFAST")).as("d"))
          .select(col("d.*"))
      case Msgpack =>
        val rdd = df.select(col(payloadCol)).rdd.mapPartitions { it =>
          // a NULL payload cell yields no documents, mirroring the
          // JSON branch (split(null) explodes to nothing) — without the
          // guard decodeDocs NPEs, violating the codec's IAE-only
          // malformed-input contract
          it.flatMap { r =>
            val p = r.getAs[Array[Byte]](0)
            if (p == null) Nil else MsgPack.decodeDocs(p).map(coerceRow(_, schema))
          }
        }
        spark.createDataFrame(rdd, schema)
      case other => throw new IllegalArgumentException(s"unknown format $other")
    }
  }

  /** Driver-local decode for the request-body ingest path: the caller
    * (LnxSession.ingest) normalizes and upserts on the driver anyway,
    * so msgpack rows must not pay a parallelize -> collect round trip
    * (a full Spark job per request) for data that never needed to leave
    * the driver. JSON/NDJSON still go through spark.read (FAILFAST
    * Jackson) and collect back — request bodies are small by contract.
    */
  def decodeLocal(spark: SparkSession, format: String, payload: Array[Byte],
      schema: StructType): Seq[Row] = format match {
    case Msgpack => MsgPack.decodeDocs(payload).map(coerceRow(_, schema))
    case Json | NdJson => decode(spark, format, payload, schema).collect().toSeq
    case other => throw new IllegalArgumentException(s"unknown format $other")
  }

  /** decodeLocal plus per-document field PRESENCE (which keys the wire
    * document actually carried). Every wire format distinguishes an
    * explicit null from an absent field, but the parsed rows alone
    * erase it (from_json yields null for both) — and the DEFAULT-column
    * contract needs it: only a truly ABSENT field takes the declared
    * default; an explicit wire null stores NULL, exactly like SQL
    * INSERT of an explicit NULL (LnxSession.ingest).
    */
  def decodeLocalWithPresence(spark: SparkSession, format: String, payload: Array[Byte],
      schema: StructType): Seq[(Row, Set[String])] = format match {
    case Msgpack =>
      MsgPack.decodeDocs(payload).map(d => (coerceRow(d, schema), d.keySet))
    case Json | NdJson =>
      val rows = decode(spark, format, payload, schema).collect().toSeq
      val pres = jsonPresence(format, payload)
      // both sides walk the records (and top-level arrays) in payload
      // order; a mismatch means the two parsers disagreed on document
      // boundaries — fail loudly rather than misalign defaults
      require(rows.size == pres.size,
        s"presence/row count mismatch: ${rows.size} rows vs ${pres.size} documents")
      rows.zip(pres)
    case other => throw new IllegalArgumentException(s"unknown format $other")
  }

  /** Top-level key set per JSON document, in decode-row order (records
    * in payload order; a top-level array expands element-by-element,
    * mirroring Spark's JSON reader). Jackson is Spark's own bundled
    * JSON parser, so boundary behavior matches the row path.
    */
  private def jsonPresence(format: String, payload: Array[Byte]): Seq[Set[String]] = {
    import scala.jdk.CollectionConverters._
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val records =
      if (format == Json) Seq(new String(payload, UTF_8))
      else new String(payload, UTF_8).split('\n').toSeq.map(_.trim).filter(_.nonEmpty)
    records.flatMap { rec =>
      val node = mapper.readTree(rec)
      def keys(n: com.fasterxml.jackson.databind.JsonNode): Set[String] =
        n.fieldNames().asScala.toSet
      if (node.isArray) node.elements().asScala.map(keys).toSeq
      else Seq(keys(node))
    }
  }

  // mirror of the SQL dialect's timestamp range gate
  // (LnxSession.toSqlTimestamp): Timestamp.from does NOT throw on
  // millis overflow, it silently wraps — bound epoch seconds to the
  // micros-safe window first
  private val MaxEpochSecond = Long.MaxValue / 1000000L

  /** Coerce a decoded field value to the declared Spark type — the
    * schema-full boundary: documents are typed by the table DDL, not by
    * the wire format's value tags (a msgpack uint8 inserts fine into a
    * bigint column). Semantics mirror the SQL dialect's literal binding
    * (LnxSession.litValue) so the same logical document means the same
    * thing through every ingress: datetime takes epoch-second integers
    * or UTC-parsed ISO strings, date takes epoch-day integers or
    * yyyy-mm-dd, and scalars stringify into text columns (the JSON
    * path's Jackson already does; a typed wire format must not be
    * stricter than the untyped one).
    */
  private[graft] def coerce(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (l: Long, LongType) => l
    case (l: Long, IntegerType) =>
      if (l < Int.MinValue || l > Int.MaxValue)
        throw new IllegalArgumentException(s"int32 out of range: $l")
      l.toInt
    case (l: Long, DoubleType) => l.toDouble
    case (l: Long, FloatType) => l.toFloat
    case (d: Double, DoubleType) => d
    case (d: Double, FloatType) => d.toFloat
    // whole-double narrowing must range-check LOUDLY like the Long
    // path above: d.toLong/.toInt saturate at MaxValue, silently
    // storing 2147483647 for a payload that encoded 3e10 as float64.
    // 9.223372036854776E18 is 2^63 exactly — the first whole double
    // OUTSIDE long range (Long.MaxValue itself is not a double).
    case (d: Double, LongType) if d.isWhole =>
      if (d < -9.223372036854776e18 || d >= 9.223372036854776e18)
        throw new IllegalArgumentException(s"int64 out of range: $d")
      d.toLong
    case (d: Double, IntegerType) if d.isWhole =>
      if (d < Int.MinValue.toDouble || d > Int.MaxValue.toDouble)
        throw new IllegalArgumentException(s"int32 out of range: $d")
      d.toInt
    case (s: String, StringType) => s
    case (l: Long, StringType) => l.toString
    case (d: Double, StringType) => d.toString
    case (b: Boolean, StringType) => b.toString
    case (b: Boolean, BooleanType) => b
    case (b: Array[Byte], BinaryType) => b
    case (s: String, BinaryType) => s.getBytes(UTF_8)
    // registered/attached tables carry Spark types outside the lnx DDL
    // set; bind them like the dialect does (LnxSession.litValue)
    case (l: Long, ShortType) =>
      if (l < Short.MinValue || l > Short.MaxValue)
        throw new IllegalArgumentException(s"int16 out of range: $l")
      l.toShort
    case (l: Long, ByteType) =>
      if (l < Byte.MinValue || l > Byte.MaxValue)
        throw new IllegalArgumentException(s"int8 out of range: $l")
      l.toByte
    case (l: Long, _: DecimalType) => java.math.BigDecimal.valueOf(l)
    case (d: Double, _: DecimalType) => java.math.BigDecimal.valueOf(d)
    case (l: Long, TimestampType) =>
      // datetime IS a UNIX-epoch value in the reference
      // (apis/mod.rs:178-179): integers are epoch seconds
      if (l < -MaxEpochSecond || l > MaxEpochSecond)
        throw new IllegalArgumentException(s"epoch seconds out of timestamp range: $l")
      java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(l))
    case (s: String, TimestampType) =>
      // UTC wall-clock parse: the stored instant must be independent of
      // the JVM default timezone, exactly like the dialect's literals
      val inst =
        try java.time.LocalDateTime.parse(s.trim.replace(' ', 'T'))
          .toInstant(java.time.ZoneOffset.UTC)
        catch {
          case _: java.time.format.DateTimeParseException =>
            throw new IllegalArgumentException(s"not a timestamp value: $s")
        }
      if (inst.getEpochSecond < -MaxEpochSecond || inst.getEpochSecond > MaxEpochSecond)
        throw new IllegalArgumentException(s"timestamp out of range: $s")
      java.sql.Timestamp.from(inst)
    case (l: Long, DateType) =>
      // Spark DateType is int32 days-since-epoch; the int32 window also
      // keeps java.sql.Date's millis constructor from wrapping
      if (l < Int.MinValue || l > Int.MaxValue)
        throw new IllegalArgumentException(s"epoch days out of date range: $l")
      java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(l))
    case (s: String, DateType) =>
      val ds = s.trim
      if (!ds.matches("""\d{4}-\d{2}-\d{2}"""))
        throw new IllegalArgumentException(s"malformed date value '$s' (expected yyyy-mm-dd)")
      try java.sql.Date.valueOf(ds)
      catch {
        case _: IllegalArgumentException =>
          throw new IllegalArgumentException(s"malformed date value '$s' (expected yyyy-mm-dd)")
      }
    case (xs: Seq[_], ArrayType(et, _)) => xs.map(coerce(_, et))
    case (other, t) => throw new IllegalArgumentException(
      s"cannot coerce ${other.getClass.getSimpleName} to ${t.simpleString}")
  }

  private[sources] def coerceRow(doc: Map[String, Any], schema: StructType): Row =
    // schema-ful rows: decodeLocal consumers access fields BY NAME
    // (getAs[Any](name) needs row.schema), matching what a collected
    // DataFrame row carries
    new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
      schema.fields.map(f => coerce(doc.getOrElse(f.name, null), f.dataType)), schema)
}

/** Self-contained MessagePack codec (public spec,
  * https://github.com/msgpack/msgpack/blob/master/spec.md). Decodes the
  * full scalar/str/bin/array/map families; ext types are rejected with
  * a clear error (the reference's document model has no ext values).
  * Integers surface as Long (uint64 above Long.MaxValue is rejected —
  * same narrowing contract as the SQL dialect's uint64 range check);
  * the encoder exists for the oracle/spec roundtrip and emits canonical
  * smallest-width tags.
  */
object MsgPack {

  /** Top-level document semantics (format.rs:10-13): a single map = one
    * document; an array of maps = many; a concatenated stream of maps
    * (the NDJSON analogue) = many.
    */
  def decodeDocs(payload: Array[Byte]): Seq[Map[String, Any]] = {
    var pos = 0
    val docs = Seq.newBuilder[Map[String, Any]]
    var first = true
    while (pos < payload.length) {
      val (v, next) = decodeValue(payload, pos)
      // `case o` must not dereference o: a decoded nil is null, and an
      // NPE from the ERROR PATH would break the fails-loudly-with-IAE
      // contract exactly where it matters (fuzz-found)
      def kind(x: Any) = if (x == null) "nil" else x.getClass.getSimpleName
      v match {
        case m: Map[_, _] => docs += m.asInstanceOf[Map[String, Any]]
        case xs: Seq[_] if first =>
          xs.foreach {
            case m: Map[_, _] => docs += m.asInstanceOf[Map[String, Any]]
            case o => throw new IllegalArgumentException(
              s"array element is not a document map: ${kind(o)}")
          }
        case o => throw new IllegalArgumentException(
          s"top-level value is not a document: ${kind(o)}")
      }
      first = false
      pos = next
    }
    docs.result()
  }

  /** Decode one value at `pos`; returns (value, position-after). */
  def decodeValue(b: Array[Byte], pos: Int): (Any, Int) = decodeValue(b, pos, 0)

  /** Recursion depth is bounded: a crafted payload of nested fixarray
    * headers (0x91 repeated) recurses once per byte, and the resulting
    * StackOverflowError is an Error no lenient handler catches — the
    * malformed-input contract promises IllegalArgumentException, never
    * a task-killing crash. 128 levels is far beyond any honest document.
    */
  private final val MaxDepth = 128

  private def decodeValue(b: Array[Byte], pos: Int, depth: Int): (Any, Int) = {
    require(pos < b.length, s"truncated msgpack at $pos")
    require(depth < MaxDepth, s"msgpack nesting deeper than $MaxDepth at $pos")
    val tag = b(pos) & 0xFF
    def u8(i: Int) = b(i) & 0xFF
    def u16(i: Int) = (u8(i) << 8) | u8(i + 1)
    def u32(i: Int): Long = ((u8(i).toLong << 24) | (u8(i + 1) << 16) |
      (u8(i + 2) << 8) | u8(i + 3)) & 0xFFFFFFFFL
    def i64(i: Int): Long = (0 until 8).foldLeft(0L)((acc, k) => (acc << 8) | u8(i + k))
    def need(n: Int): Unit = require(pos + n <= b.length, s"truncated msgpack at $pos")
    // 32-bit lengths/counts arrive as unsigned; a crafted value >= 2^31
    // would narrow negative via toInt and make the arr/map loops silently
    // yield EMPTY collections at a misaligned offset — validate against
    // the remaining payload first (an element/byte needs >= 1 byte, so
    // any honest length is <= bytes remaining) and fail LOUDLY otherwise
    def len32(i: Int, what: String): Int = {
      val n = u32(i)
      require(n <= (b.length - pos).toLong, s"$what length $n exceeds payload at $pos")
      n.toInt
    }
    def str(off: Int, len: Int): (String, Int) = {
      require(pos + off + len <= b.length, s"truncated str at $pos")
      (new String(b, pos + off, len, UTF_8), pos + off + len)
    }
    def bin(off: Int, len: Int): (Array[Byte], Int) = {
      require(pos + off + len <= b.length, s"truncated bin at $pos")
      (java.util.Arrays.copyOfRange(b, pos + off, pos + off + len), pos + off + len)
    }
    def arr(off: Int, n: Int): (Seq[Any], Int) = {
      var p = pos + off
      val out = Seq.newBuilder[Any]
      var i = 0
      while (i < n) { val (v, q) = decodeValue(b, p, depth + 1); out += v; p = q; i += 1 }
      (out.result(), p)
    }
    def map(off: Int, n: Int): (Map[String, Any], Int) = {
      var p = pos + off
      val out = Map.newBuilder[String, Any]
      var i = 0
      while (i < n) {
        val (k, q) = decodeValue(b, p, depth + 1)
        val key = k match {
          case s: String => s
          case o => throw new IllegalArgumentException( // o may be null (nil key)
            s"map key must be a string, got ${if (o == null) "nil" else o.getClass.getSimpleName}")
        }
        val (v, r) = decodeValue(b, q, depth + 1)
        out += (key -> v); p = r; i += 1
      }
      (out.result(), p)
    }
    tag match {
      case t if t <= 0x7F => (t.toLong, pos + 1) // positive fixint
      case t if t >= 0xE0 => (b(pos).toLong, pos + 1) // negative fixint
      case t if (t & 0xF0) == 0x80 => map(1, t & 0x0F) // fixmap
      case t if (t & 0xF0) == 0x90 => arr(1, t & 0x0F) // fixarray
      case t if (t & 0xE0) == 0xA0 => str(1, t & 0x1F) // fixstr
      case 0xC0 => (null, pos + 1)
      case 0xC2 => (false, pos + 1)
      case 0xC3 => (true, pos + 1)
      case 0xC4 => need(2); bin(2, u8(pos + 1))
      case 0xC5 => need(3); bin(3, u16(pos + 1))
      case 0xC6 => need(5); bin(5, len32(pos + 1, "bin32"))
      case 0xCA => need(5); (java.lang.Float.intBitsToFloat(u32(pos + 1).toInt).toDouble, pos + 5)
      case 0xCB => need(9); (java.lang.Double.longBitsToDouble(i64(pos + 1)), pos + 9)
      case 0xCC => need(2); (u8(pos + 1).toLong, pos + 2)
      case 0xCD => need(3); (u16(pos + 1).toLong, pos + 3)
      case 0xCE => need(5); (u32(pos + 1), pos + 5)
      case 0xCF =>
        need(9)
        val v = i64(pos + 1)
        // same narrowing as the dialect's uint64: no unsigned 64-bit
        // host type, values above 2^63-1 are an error, not a wrap
        if (v < 0) throw new IllegalArgumentException(s"uint64 above Long.MaxValue at $pos")
        (v, pos + 9)
      case 0xD0 => need(2); (b(pos + 1).toLong, pos + 2)
      case 0xD1 => need(3); (u16(pos + 1).toShort.toLong, pos + 3)
      case 0xD2 => need(5); (u32(pos + 1).toInt.toLong, pos + 5)
      case 0xD3 => need(9); (i64(pos + 1), pos + 9)
      case 0xD9 => need(2); str(2, u8(pos + 1))
      case 0xDA => need(3); str(3, u16(pos + 1))
      case 0xDB => need(5); str(5, len32(pos + 1, "str32"))
      case 0xDC => need(3); arr(3, u16(pos + 1))
      case 0xDD => need(5); arr(5, len32(pos + 1, "arr32"))
      case 0xDE => need(3); map(3, u16(pos + 1))
      case 0xDF => need(5); map(5, len32(pos + 1, "map32"))
      case 0xC1 => throw new IllegalArgumentException(s"invalid msgpack tag 0xC1 at $pos")
      case t => throw new IllegalArgumentException(
        f"unsupported msgpack tag 0x$t%02X at $pos (ext types are not documents)")
    }
  }

  /** Canonical smallest-width encoder (roundtrip support for the oracle
    * gate and specs; the reference direction is decode).
    */
  def encode(v: Any): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    encodeTo(v, out)
    out.toByteArray
  }

  private def encodeTo(v: Any, o: java.io.ByteArrayOutputStream): Unit = {
    def be(n: Long, bytes: Int): Unit = {
      var k = (bytes - 1) * 8
      while (k >= 0) { o.write(((n >> k) & 0xFF).toInt); k -= 8 }
    }
    v match {
      case null => o.write(0xC0)
      case b: Boolean => o.write(if (b) 0xC3 else 0xC2)
      case i: Int => encodeTo(i.toLong, o)
      case l: Long =>
        if (l >= 0 && l <= 0x7F) o.write(l.toInt)
        else if (l < 0 && l >= -32) o.write((l & 0xFF).toInt)
        else if (l >= 0 && l <= 0xFF) { o.write(0xCC); be(l, 1) }
        else if (l >= 0 && l <= 0xFFFF) { o.write(0xCD); be(l, 2) }
        else if (l >= 0 && l <= 0xFFFFFFFFL) { o.write(0xCE); be(l, 4) }
        else if (l >= Byte.MinValue && l < 0) { o.write(0xD0); be(l & 0xFF, 1) }
        else if (l >= Short.MinValue && l < 0) { o.write(0xD1); be(l & 0xFFFF, 2) }
        else if (l >= Int.MinValue && l < 0) { o.write(0xD2); be(l & 0xFFFFFFFFL, 4) }
        else { o.write(0xD3); be(l, 8) }
      case f: Float => o.write(0xCA); be(java.lang.Float.floatToIntBits(f).toLong & 0xFFFFFFFFL, 4)
      case d: Double => o.write(0xCB); be(java.lang.Double.doubleToLongBits(d), 8)
      case s: String =>
        val b = s.getBytes(UTF_8)
        if (b.length <= 31) o.write(0xA0 | b.length)
        else if (b.length <= 0xFF) { o.write(0xD9); be(b.length.toLong, 1) }
        else if (b.length <= 0xFFFF) { o.write(0xDA); be(b.length.toLong, 2) }
        else { o.write(0xDB); be(b.length.toLong, 4) }
        o.write(b, 0, b.length)
      case b: Array[Byte] =>
        if (b.length <= 0xFF) { o.write(0xC4); be(b.length.toLong, 1) }
        else if (b.length <= 0xFFFF) { o.write(0xC5); be(b.length.toLong, 2) }
        else { o.write(0xC6); be(b.length.toLong, 4) }
        o.write(b, 0, b.length)
      case xs: Seq[_] =>
        if (xs.length <= 15) o.write(0x90 | xs.length)
        else if (xs.length <= 0xFFFF) { o.write(0xDC); be(xs.length.toLong, 2) }
        else { o.write(0xDD); be(xs.length.toLong, 4) }
        xs.foreach(encodeTo(_, o))
      case m: Map[_, _] =>
        val entries = m.toSeq.asInstanceOf[Seq[(String, Any)]]
        if (entries.length <= 15) o.write(0x80 | entries.length)
        else if (entries.length <= 0xFFFF) { o.write(0xDE); be(entries.length.toLong, 2) }
        else { o.write(0xDF); be(entries.length.toLong, 4) }
        entries.foreach { case (k, x) => encodeTo(k, o); encodeTo(x, o) }
      case other => throw new IllegalArgumentException(
        s"cannot msgpack-encode ${other.getClass.getSimpleName}")
    }
  }
}
