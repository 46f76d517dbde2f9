package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.index.Fieldnorm

class FieldnormSpec extends AnyFunSuite {

  test("small values 0..23 are exact") {
    for (v <- 0 until 24) {
      assert(Fieldnorm.encode(v.toLong) === v)
      assert(Fieldnorm.decode(v) === v.toLong)
    }
  }

  test("decode is a floor approximation and encode is monotone") {
    var prevId = -1
    for (v <- 0 to 2000000) {
      val id = Fieldnorm.encode(v.toLong)
      assert(id >= prevId, s"encode not monotone at $v")
      assert(Fieldnorm.decode(id) <= v.toLong, s"decode > input at $v")
      prevId = id
    }
  }

  test("id -> decode -> encode roundtrips (table values are fixpoints)") {
    for (id <- 0 until 256) {
      assert(Fieldnorm.encode(Fieldnorm.decode(id)) === id)
    }
  }

  test("table is strictly increasing") {
    for (id <- 1 until 256) {
      assert(Fieldnorm.Table(id) > Fieldnorm.Table(id - 1))
    }
  }

  test("encode is total: negative fails loud, huge lengths saturate at the u8 ceiling") {
    intercept[IllegalArgumentException](Fieldnorm.encode(-1L))
    assert(Fieldnorm.encode(Int.MaxValue.toLong) === 255)
    // beyond ~2^31 tokens the raw encoding would exceed 255 and index
    // past the 256-entry decode tables; it saturates instead (SmallFloat)
    assert(Fieldnorm.encode(Int.MaxValue.toLong + 1000L) === 255)
    assert(Fieldnorm.encode(Long.MaxValue) === 255)
  }

  test("Spark SQL expression matches the Scala implementation") {
    val spark = TestSpark.spark
    import spark.implicits._
    val lens = ((0L to 5000L) ++ Seq(100000L, 123456789L, Int.MaxValue.toLong)).toDF("len")
    val got = lens
      .selectExpr("len", Fieldnorm.encodeSql("len", duck = false) + " as id")
      .selectExpr("len", "id", Fieldnorm.decodeSql("id", duck = false) + " as dec")
      .collect()
    got.foreach { r =>
      val len = r.getLong(0)
      assert(r.getLong(1) === Fieldnorm.encode(len).toLong, s"encode mismatch at $len")
      assert(r.getLong(2) === Fieldnorm.decode(Fieldnorm.encode(len)), s"decode mismatch at $len")
    }
  }
}
