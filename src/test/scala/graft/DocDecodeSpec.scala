package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{DocDecode, MsgPack}

/** S3 document decode — JSON / NDJSON / MSGPACK payloads into schema-full
  * rows (lnx-ffi/src/format.rs:2-13), plus the session ingest path.
  */
class DocDecodeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType),
    StructField("score", DoubleType), StructField("ok", BooleanType),
    StructField("tags", ArrayType(StringType))))

  // ---- msgpack value-level roundtrips ----

  private def rt(v: Any): Any = MsgPack.decodeValue(MsgPack.encode(v), 0)._1

  test("msgpack scalar roundtrips across every width family") {
    // fixint boundaries, each int width, negative widths, 64-bit extremes
    val longs = Seq(0L, 1L, 127L, 128L, 255L, 256L, 65535L, 65536L, 4294967295L,
      4294967296L, Long.MaxValue, -1L, -32L, -33L, -128L, -129L, -32768L, -32769L,
      Int.MinValue.toLong, Int.MinValue.toLong - 1, Long.MinValue,
      9007199254740993L) // 2^53+1: must NOT round-trip through double
    longs.foreach(l => assert(rt(l) === l, s"long $l"))
    assert(rt(null) === null)
    assert(rt(true) === true)
    assert(rt(false) === false)
    assert(rt(3.25d) === 3.25d)
    assert(rt(1.5f) === 1.5d) // float32 decodes as double (exact for 1.5)
    assert(rt("") === "")
    assert(rt("héllo wörld") === "héllo wörld")
  }

  test("msgpack str/bin/array/map length-tag boundaries") {
    // fixstr(31) / str8(32, 255) / str16(256) / str32(65536)
    Seq(31, 32, 255, 256, 65536).foreach { n =>
      val s = "x" * n
      assert(rt(s) === s, s"str length $n")
    }
    val bin = Array.tabulate[Byte](300)(i => (i % 251).toByte)
    assert(rt(bin).asInstanceOf[Array[Byte]].toSeq === bin.toSeq)
    // fixarray(15) / array16(16) boundary; nested arrays
    assert(rt(Seq.tabulate(15)(_.toLong)) === Seq.tabulate(15)(_.toLong))
    assert(rt(Seq.tabulate(16)(_.toLong)) === Seq.tabulate(16)(_.toLong))
    assert(rt(Seq(Seq(1L, 2L), Seq("a"))) === Seq(Seq(1L, 2L), Seq("a")))
    // fixmap(15) / map16(16) boundary
    val m15 = (0 until 15).map(i => s"k$i" -> i.toLong).toMap
    val m16 = (0 until 16).map(i => s"k$i" -> i.toLong).toMap
    assert(rt(m15) === m15)
    assert(rt(m16) === m16)
  }

  test("property: random nested values roundtrip encode -> decodeValue (seeded)") {
    // the spec-vector tests pin each tag family; this sweeps the
    // COMPOSITIONS — nested arrays/maps mixing every width family,
    // strings straddling the fixstr/str8/str16 byte-length boundaries
    // (incl. multi-byte UTF-8, where char count != byte count), and the
    // full signed-integer ladder. Int widens to Long and f32 widens to
    // Double on decode (documented); the generator emits Long/Double so
    // identity is exact, with NaN compared by bit pattern.
    val rnd = new scala.util.Random(0xBEEF5EEDL)
    val longs = Seq(0L, 1L, 127L, 128L, 255L, 256L, 65535L, 65536L,
      4294967295L, 4294967296L, -1L, -32L, -33L, -128L, -129L, -32768L,
      -32769L, Int.MinValue.toLong, Int.MinValue - 1L, Long.MaxValue, Long.MinValue)
    val doubles = Seq(0.0, -0.0, 1.5, -2.25, 1e300, -1e-300,
      Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity)
    def genStr(): String = {
      val target = Seq(0, 1, 31, 32, 255, 256)(rnd.nextInt(6))
      val sb = new StringBuilder
      while (sb.length < target)
        sb.append(if (rnd.nextInt(5) == 0) 'é' else ('a' + rnd.nextInt(26)).toChar)
      sb.toString
    }
    def gen(depth: Int): Any = rnd.nextInt(if (depth >= 3) 6 else 8) match {
      case 0 => null
      case 1 => rnd.nextBoolean()
      case 2 => if (rnd.nextBoolean()) longs(rnd.nextInt(longs.length)) else rnd.nextLong()
      case 3 => doubles(rnd.nextInt(doubles.length))
      case 4 => genStr()
      case 5 => Array.fill[Byte](rnd.nextInt(40))(rnd.nextInt().toByte)
      case 6 => Seq.fill(rnd.nextInt(5))(gen(depth + 1))
      case _ => (0 until rnd.nextInt(5)).map(i => s"k$i" -> gen(depth + 1)).toMap
    }
    def same(a: Any, b: Any): Boolean = (a, b) match {
      case (x: Array[Byte], y: Array[Byte]) => java.util.Arrays.equals(x, y)
      case (x: Seq[_], y: Seq[_]) =>
        x.length == y.length && x.lazyZip(y).forall(same)
      case (x: Map[_, _], y: Map[_, _]) =>
        val ym = y.asInstanceOf[Map[String, Any]]
        x.size == y.size && x.asInstanceOf[Map[String, Any]].forall {
          case (k, v) => ym.contains(k) && same(v, ym(k)) }
      case (x: Double, y: Double) =>
        java.lang.Double.doubleToLongBits(x) == java.lang.Double.doubleToLongBits(y)
      case (x, y) => x == y
    }
    for (i <- 1 to 1500) {
      val v = gen(0)
      val enc = MsgPack.encode(v)
      val (back, consumed) = MsgPack.decodeValue(enc, 0)
      assert(consumed === enc.length, s"case $i: trailing bytes after decode of $v")
      assert(same(back, v), s"case $i: $v -> $back")
    }
  }

  test("fuzz: arbitrary byte streams decode or throw IllegalArgumentException only (seeded)") {
    // the decoder's total-function contract: any input either decodes or
    // raises IAE — never a hang (negative-size / non-advancing offsets),
    // an NPE, an array-bounds error, or a StackOverflowError (crafted
    // nesting). Random streams probe the tag dispatch; bit-flipped VALID
    // documents probe the deep paths (length fields, nested structures)
    // that pure noise rarely reaches.
    val rnd = new scala.util.Random(0xFA22L)
    def check(b: Array[Byte], what: => String): Unit =
      try { MsgPack.decodeDocs(b); () }
      catch {
        case _: IllegalArgumentException => ()
        case e: Throwable => fail(s"$what threw ${e.getClass.getName}: ${e.getMessage}")
      }
    for (i <- 1 to 4000)
      check(Array.fill[Byte](rnd.nextInt(64))(rnd.nextInt().toByte), s"noise case $i")
    val valid = MsgPack.encode(Map[String, Any](
      "id" -> 123456789L, "name" -> "abcdefghij", "ok" -> true,
      "tags" -> Seq("alpha", "beta", "gamma"), "score" -> 1.5,
      "nested" -> Map[String, Any]("k" -> Seq(1L, 2L, 3L))))
    for (i <- 1 to 4000) {
      val m = valid.clone()
      (0 to rnd.nextInt(3)).foreach(_ => m(rnd.nextInt(m.length)) = rnd.nextInt().toByte)
      check(m, s"mutation case $i")
    }
  }

  test("msgpack malformed input fails loudly, never silently") {
    // truncated payloads at every cut point of an encoded doc
    val full = MsgPack.encode(Map[String, Any]("id" -> 123456L, "name" -> "abc"))
    (1 until full.length).foreach { cut =>
      intercept[Exception](MsgPack.decodeDocs(full.take(cut)))
    }
    // invalid tag 0xC1
    intercept[IllegalArgumentException](MsgPack.decodeValue(Array(0xC1.toByte), 0))
    // ext types are not documents
    intercept[IllegalArgumentException](
      MsgPack.decodeValue(Array(0xD4.toByte, 0x01, 0x00), 0))
    // uint64 above Long.MaxValue: rejected (same narrowing as the dialect)
    val big = Array(0xCF.toByte) ++ Array.fill[Byte](8)(0xFF.toByte)
    intercept[IllegalArgumentException](MsgPack.decodeValue(big, 0))
    // non-map document
    intercept[IllegalArgumentException](MsgPack.decodeDocs(MsgPack.encode(Seq(1L, 2L))))
    // crafted 32-bit lengths >= 2^31: previously narrowed NEGATIVE via
    // toInt, making arr/map decode a silently-empty collection at a
    // misaligned offset — must fail loudly instead
    for (tag <- Seq(0xDB, 0xDD, 0xDF, 0xC6)) {
      val crafted = Array[Byte](tag.toByte, 0x80.toByte, 0, 0, 0) ++
        Array.fill[Byte](16)(0)
      intercept[IllegalArgumentException](MsgPack.decodeValue(crafted, 0))
    }
    // and an in-range-but-over-payload 32-bit count also fails loudly
    val overCount = Array[Byte](0xDD.toByte, 0, 0, 0x10, 0) // arr32 of 4096 elems, no bytes
    intercept[IllegalArgumentException](MsgPack.decodeValue(overCount, 0))
    // deep nesting: repeated one-element fixarray headers recurse once
    // per byte — must fail with IAE, not kill the task with
    // StackOverflowError (an Error no lenient handler catches)
    val deep = Array.fill[Byte](100000)(0x91.toByte) :+ 0x01.toByte
    intercept[IllegalArgumentException](MsgPack.decodeValue(deep, 0))
  }

  test("whole-double narrowing range-checks loudly instead of saturating") {
    import org.apache.spark.sql.types._
    // 3e10 encoded as float64 into an int32 column: previously
    // d.toInt silently saturated to Int.MaxValue
    intercept[IllegalArgumentException](DocDecode.coerce(3.0e10, IntegerType))
    // 1e19 into int64: previously saturated to Long.MaxValue
    intercept[IllegalArgumentException](DocDecode.coerce(1.0e19, LongType))
    // 2^63 exactly is the first whole double OUTSIDE long range
    intercept[IllegalArgumentException](DocDecode.coerce(9.223372036854776e18, LongType))
    // in-range whole doubles still narrow exactly
    assert(DocDecode.coerce(3.0e10, LongType) === 30000000000L)
    assert(DocDecode.coerce(-2147483648.0, IntegerType) === Int.MinValue)
    assert(DocDecode.coerce(-9.223372036854776e18, LongType) === Long.MinValue)
  }

  test("msgpack top-level shapes: single map, array of maps, concatenated stream") {
    val d1 = Map[String, Any]("id" -> 1L)
    val d2 = Map[String, Any]("id" -> 2L)
    assert(MsgPack.decodeDocs(MsgPack.encode(d1)) === Seq(d1))
    assert(MsgPack.decodeDocs(MsgPack.encode(Seq(d1, d2))) === Seq(d1, d2))
    assert(MsgPack.decodeDocs(MsgPack.encode(d1) ++ MsgPack.encode(d2)) === Seq(d1, d2))
  }

  // ---- DataFrame-level decode ----

  private val doc1 = Map[String, Any]("id" -> 1L, "name" -> "alpha", "score" -> 0.5d,
    "ok" -> true, "tags" -> Seq("x", "y"))
  private val doc2 = Map[String, Any]("id" -> 2L, "name" -> "beta") // missing fields -> null

  test("decode(msgpack) yields schema-typed rows; missing fields are null") {
    val df = DocDecode.decode(spark, DocDecode.Msgpack,
      MsgPack.encode(Seq(doc1, doc2)), schema)
    assert(df.schema === schema)
    val rows = df.orderBy("id").collect()
    assert(rows(0) === Row(1L, "alpha", 0.5d, true, Seq("x", "y")))
    assert(rows(1) === Row(2L, "beta", null, null, null))
  }

  test("decode(json/ndjson) through the Spark-native reader") {
    val j = """{"id": 7, "name": "solo", "score": 1.25, "ok": false, "tags": ["t"]}"""
    val one = DocDecode.decode(spark, DocDecode.Json, j.getBytes("UTF-8"), schema).collect()
    assert(one.toSeq === Seq(Row(7L, "solo", 1.25d, false, Seq("t"))))
    val nd = "{\"id\": 1, \"name\": \"a\"}\n\n{\"id\": 2, \"name\": \"b\"}\n"
    val many = DocDecode.decode(spark, DocDecode.NdJson, nd.getBytes("UTF-8"), schema)
      .orderBy("id").select("id", "name").collect()
    assert(many.toSeq === Seq(Row(1L, "a"), Row(2L, "b")))
  }

  test("decodePayloads: distributed decode of a binary payload column") {
    import spark.implicits._
    val payloads = Seq(
      MsgPack.encode(Seq(doc1, doc2)),
      MsgPack.encode(Map[String, Any]("id" -> 3L, "name" -> "gamma")))
    val df = payloads.toDF("payload").repartition(2)
    val out = DocDecode.decodePayloads(df, "payload", DocDecode.Msgpack, schema)
    assert(out.select("id").orderBy("id").collect().map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L))
    // ndjson payloads through the codegen from_json path
    val ndPayloads = Seq("{\"id\": 10}\n{\"id\": 11}".getBytes("UTF-8"))
    val out2 = DocDecode.decodePayloads(ndPayloads.toDF("payload"), "payload",
      DocDecode.NdJson, schema)
    assert(out2.select("id").orderBy("id").collect().map(_.getLong(0)).toSeq === Seq(10L, 11L))
  }

  test("decodePayloads(json/ndjson) fails loudly on malformed lines, like driver-side decode") {
    import spark.implicits._
    val bad = Seq("{\"id\": 20}\nnot json at all\n{\"id\": 21}".getBytes("UTF-8"))
    val out = DocDecode.decodePayloads(bad.toDF("payload"), "payload",
      DocDecode.NdJson, schema)
    val e = intercept[Exception](out.collect())
    // FAILFAST surfaces as a SparkException chain, never as all-null rows
    assert(e.toString.toLowerCase.contains("malformed") ||
      Option(e.getCause).exists(_.toString.toLowerCase.contains("malformed")), e.toString)
  }

  test("coerce mirrors the dialect's literal binding: datetime/date/short/byte/stringify") {
    def c(v: Any, dt: DataType): Any = {
      val s = StructType(Seq(StructField("x", dt)))
      DocDecode.decode(spark, DocDecode.Msgpack,
        MsgPack.encode(Map[String, Any]("x" -> v)), s).collect()(0).get(0)
    }
    // datetime: epoch-second integers and UTC-parsed ISO strings agree
    val ts = c(1600000000L, TimestampType).asInstanceOf[java.sql.Timestamp]
    assert(ts.toInstant.getEpochSecond === 1600000000L)
    assert(c("2020-09-13 12:26:40", TimestampType) === ts) // same instant, TZ-independent
    intercept[Exception](c(Long.MaxValue / 1000L, TimestampType)) // micros-unsafe epoch
    intercept[Exception](c("not a time", TimestampType))
    // date: epoch-day integers and strict yyyy-mm-dd
    assert(c(18518L, DateType) ===
      java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(18518L)))
    assert(c("2020-09-13", DateType) === java.sql.Date.valueOf("2020-09-13"))
    intercept[Exception](c("13/09/2020", DateType))
    // registered-frame types outside the DDL set
    assert(c(5L, ShortType) === 5.toShort)
    intercept[Exception](c(40000L, ShortType))
    assert(c(-7L, ByteType) === (-7).toByte)
    intercept[Exception](c(200L, ByteType))
    // scalars stringify into text columns — the typed wire format must
    // not be stricter than the JSON path's Jackson
    assert(c(123L, StringType) === "123")
    assert(c(true, StringType) === "true")
  }

  test("decodePayloads(msgpack): NULL payload cells yield no rows, like the JSON branch") {
    val s = StructType(Seq(StructField("id", LongType)))
    val data = Seq(Row(MsgPack.encode(Map[String, Any]("id" -> 1L))), Row(null))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(data, 2),
      StructType(Seq(StructField("payload", BinaryType))))
    val out = DocDecode.decodePayloads(df, "payload", DocDecode.Msgpack, s)
    assert(out.collect().map(_.getLong(0)).toSeq === Seq(1L))
  }

  test("session ingest: msgpack into datetime/date columns (the dialect's epoch semantics)") {
    val sess = new graft.sql.LnxSession(spark)
    sess.execute("CREATE TABLE ingest_ts (id bigint primary key, at datetime, d date)")
    sess.ingest("ingest_ts", DocDecode.Msgpack, MsgPack.encode(Seq(
      Map[String, Any]("id" -> 1L, "at" -> 1600000000L, "d" -> "2020-09-13"),
      Map[String, Any]("id" -> 2L, "at" -> "2020-09-13 12:26:40", "d" -> 18518L))))
    val rows = sess.execute("SELECT id, at, d FROM ingest_ts ORDER BY id").collect()
    assert(rows(0).getTimestamp(1) === rows(1).getTimestamp(1)) // same instant both ways
    assert(rows(0).getDate(2) === rows(1).getDate(2))
    // epoch-integer predicate binds against the ingested value
    assert(sess.execute("SELECT id FROM ingest_ts WHERE at >= 1600000000").count() === 2)
  }

  test("session ingest: msgpack payload upserts by primary key") {
    val sess = new graft.sql.LnxSession(spark)
    sess.execute("CREATE TABLE ingest_t (id bigint primary key, name text, weight float64)")
    sess.ingest("ingest_t", DocDecode.Msgpack, MsgPack.encode(Seq(
      Map[String, Any]("id" -> 1L, "name" -> "first", "weight" -> 0.1d),
      Map[String, Any]("id" -> 2L, "name" -> "second", "weight" -> 0.2d))))
    // re-ingest id=2 with new values + a new id=3: UPSERT semantics
    sess.ingest("ingest_t", DocDecode.Msgpack, MsgPack.encode(Seq(
      Map[String, Any]("id" -> 2L, "name" -> "second-v2", "weight" -> 2.0d),
      Map[String, Any]("id" -> 3L, "name" -> "third", "weight" -> 0.3d))))
    val rows = sess.execute("SELECT id, name, weight FROM ingest_t ORDER BY id").collect()
    assert(rows.map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq ===
      Seq((1L, "first", 0.1d), (2L, "second-v2", 2.0d), (3L, "third", 0.3d)))
  }

  test("CREATE TABLE rejects the reserved column name 'score'") {
    val sess = new graft.sql.LnxSession(spark)
    intercept[graft.sql.LnxSql.ParseException](
      sess.execute("CREATE TABLE bad_t (id bigint primary key, score float64)"))
  }

  test("session ingest: type normalization applies (ip canonical form)") {
    val sess = new graft.sql.LnxSession(spark)
    sess.execute("CREATE TABLE ingest_ip (id bigint primary key, addr ip)")
    sess.ingest("ingest_ip", DocDecode.Json,
      """{"id": 1, "addr": "0:0:0:0:0:0:0:1"}""".getBytes("UTF-8"))
    // canonicalized on ingest: the alternate spelling matches by
    // equality (both normalize to the same stored 16-byte hex form)…
    assert(sess.execute("SELECT id FROM ingest_ip WHERE addr = '::1'")
      .collect().map(_.getLong(0)).toSeq === Seq(1L))
    // …and SELECT renders the canonical display text, not the input verbatim
    val addr = sess.execute("SELECT addr FROM ingest_ip ORDER BY id")
      .collect()(0).getString(0)
    assert(addr === "0:0:0:0:0:0:0:1")
  }
}
