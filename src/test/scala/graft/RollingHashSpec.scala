package graft

import graft.functions.RollingHash31
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

class RollingHashSpec extends SparkTestBase {
  import SparkTestBase.spark.implicits._

  private def model(s: String): Long = {
    var h = 0L
    s.codePoints().forEach(cp => h = (h * 31L + cp) % 2147483647L)
    h
  }

  test("codegen path equals the scala model on real data") {
    val got = Tables(spark, sf, "documents")
      .select($"text", RollingHash31.column($"text").as("fp"))
      .as[(String, Long)].collect()
    got.foreach { case (text, fp) => assert(fp == model(text), s"text=$text") }
    assert(got.nonEmpty)
  }

  test("edge cases: empty, single char, unicode") {
    val df = Seq("", "a", "héllo wörld", "汉字テキスト", "a b\tc\nd").toDF("s")
    val got = df.select($"s", RollingHash31.column($"s")).as[(String, Long)].collect()
    got.foreach { case (s, fp) => assert(fp == model(s)) }
  }

  test("property: expression matches model on random ascii strings") {
    val gen = Gen.listOf(Gen.asciiPrintableChar).map(_.mkString)
    (0 until 200).foreach { i =>
      val s = gen.pureApply(Gen.Parameters.default, Seed(42L + i))
      assert(RollingHash31.hash(UTF8String.fromString(s)) == model(s), s"s=$s")
    }
  }
}
