package graft.expressions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.TextFunctions

class GearChunkerSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic pseudo-random ASCII text: chained md5 hex. */
  private def chainText(seed: String, blocks: Int): String =
    Iterator.iterate(seed)(h =>
      java.security.MessageDigest.getInstance("MD5")
        .digest(h.getBytes("UTF-8")).map(x => f"$x%02x").mkString)
      .drop(1).take(blocks).mkString

  private def starts(s: String, maskBits: Int = 4): Seq[Int] = {
    import org.apache.spark.unsafe.types.UTF8String
    GearChunkStarts.compute(UTF8String.fromString(s), maskBits)
      .toIntArray().toSeq
  }

  test("gear table is the md5-derived public table") {
    // spot-pin two entries against the definition: first 16 hex digits of
    // md5 of the decimal string, as an unsigned 64-bit value
    def ref(b: Int): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(b.toString.getBytes("UTF-8")).map(x => f"$x%02x").mkString
      java.lang.Long.parseUnsignedLong(hex.substring(0, 16), 16)
    }
    assert(GearChunkStarts.Gear(0) == ref(0))
    assert(GearChunkStarts.Gear(97) == ref(97))
    assert(GearChunkStarts.Gear.length == 256)
  }

  test("starts begin at 1, strictly increase, and partition the string") {
    val s = chainText("graft-gear", 40) // 1280 chars
    val st = starts(s)
    assert(st.head == 1)
    assert(st == st.sorted && st.distinct == st)
    assert(st.forall(p => p >= 1 && p <= s.length))
    // reassembly: consecutive (start, next) spans concatenate to s
    val spans = st :+ (s.length + 1)
    val rebuilt = spans.sliding(2).map { case Seq(a, b) =>
      s.substring(a - 1, b - 1) }.mkString
    assert(rebuilt == s)
  }

  test("boundary density tracks 2^-maskBits") {
    val s = chainText("graft-gear-density", 200) // 6400 chars
    val n4 = starts(s, 4).size // expect ~ len/16
    assert(n4 > s.length / 16 / 2 && n4 < s.length / 16 * 2,
      s"density off: $n4 boundaries in ${s.length} chars at maskBits=4")
    val n6 = starts(s, 6).size // expect ~ len/64; monotone in maskBits
    assert(n6 < n4)
  }

  test("content-defined locality: an edit re-chunks only its neighborhood") {
    val s = chainText("graft-gear-local", 60) // 1920 chars
    val ins = "INSERTED##"
    val at = 700
    val edited = s.substring(0, at) + ins + s.substring(at)
    val orig = starts(s)
    val got = starts(edited)
    // beyond the edit position + the 64-char hash horizon, every original
    // boundary reappears shifted by the insertion length — the property
    // fixed-stride chunking (tx_chunking) fundamentally lacks
    val horizon = at + ins.length + 64
    val tailOrig = orig.filter(_ > at + 64).map(_ + ins.length)
      .filter(_ > horizon)
    val tailGot = got.filter(_ > horizon)
    assert(tailOrig == tailGot)
    // and the prefix before the edit is untouched
    assert(orig.filter(_ <= at) == got.filter(_ <= at))
  }

  test("degenerate inputs: empty and single-char strings chunk as [1]; null is null") {
    assert(starts("") == Seq(1))
    assert(starts("x") == Seq(1))
    val df = Seq(Some("abcdef"), None).toDF("t")
      .select(TextFunctions.gearChunkStarts(col("t"), 4).as("st"))
    val rows = df.collect()
    assert(!rows(0).isNullAt(0))
    assert(rows(1).isNullAt(0))
  }

  test("codegen path equals direct compute, with fallback disabled") {
    val conf = "spark.sql.codegen.fallback"
    val old = spark.conf.get(conf)
    try {
      spark.conf.set(conf, "false")
      val texts = (0 until 8).map(i => chainText(s"gear-cg-$i", 20))
      val viaDf = texts.toDF("t")
        // two instances in one codegen scope (select + filter) — the
        // CosineSimilarity fused-scope regression shape
        .filter(size(TextFunctions.gearChunkStarts(col("t"), 4)) >= lit(1))
        .select(TextFunctions.gearChunkStarts(col("t"), 4).as("st"))
        .as[Seq[Int]].collect().toSeq
      assert(viaDf == texts.map(t => starts(t)))
    } finally spark.conf.set(conf, old)
  }
}
