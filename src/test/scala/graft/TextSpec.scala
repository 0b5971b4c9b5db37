package graft

import graft.functions.RollingMinHash
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge.{column, expression}

/** RollingMinHash semantics: matches a BigInt-exact reference model and is
  * stable under content shifts (the winnowing property). */
class TextSpec extends SparkSuite {
  import spark.implicits._

  private val Mod = BigInt((1L << 61) - 1)
  private def refModel(s: String, k: Int): Long =
    if (s.length < k) -1L
    else (0 to s.length - k).map { i =>
      s.substring(i, i + k).foldLeft(BigInt(0))((h, c) =>
        (h * 257 + c.toInt) mod Mod)
    }.min.toLong

  private def fp(texts: Seq[String], k: Int): Seq[Long] =
    texts.toDF("text")
      .select(column(RollingMinHash(expression(col("text")), k)))
      .as[Long].collect().toSeq

  test("matches the BigInt reference model") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "aaaaaaaaaaaaaaaaaaaaaa",
      "short", // < k → -1 sentinel
      "spark sql whole stage codegen pipelines are fused")
    assert(fp(texts, 16) === texts.map(refModel(_, 16)))
    assert(fp(texts, 4) === texts.map(refModel(_, 4)))
  }

  test("shift-stable: prefix insertion far from the min window keeps fp") {
    val core = "zzz unique rare window payload qqq and lots of filler text"
    // the minimal 16-gram lives inside `core`; shifting it right by a
    // prefix must not change the minimum unless the prefix wins
    val a = refModel("AAAA " + core, 16)
    val b = refModel("BBBBBBBB " + core, 16)
    val direct = refModel(core, 16)
    assert(a == direct || b == direct || a == b,
      "min k-gram should usually survive shifts for distinctive cores")
    val Seq(fa, fb) = fp(Seq("AAAA " + core, "BBBBBBBB " + core), 16)
    assert(fa === a && fb === b)
  }
}
