package graft

import org.apache.spark.sql.functions._
import graft.functions.TextOps

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column, text: String): Any =
    Seq(text).toDF("t").select(c.as("r")).head().get(0)

  test("whitespace token count") {
    assert(one(TextOps.tokenCountWs(col("t")), "one two  three") == 3)
    assert(one(TextOps.tokenCountWs(col("t")), "   ") == 0)
    assert(one(TextOps.tokenCountWs(col("t")), "") == 0)
    assert(one(TextOps.tokenCountWs(col("t")), " padded words ") == 2)
  }

  test("bpe-ish token count splits letter/digit/symbol runs") {
    assert(one(TextOps.tokenCountBpeish(col("t")), "abc 123") == 2)
    assert(one(TextOps.tokenCountBpeish(col("t")), "abc123") == 2)   // letters + digits
    assert(one(TextOps.tokenCountBpeish(col("t")), "a-b") == 3)      // a, -, b
    assert(one(TextOps.tokenCountBpeish(col("t")), "hello, world!") == 4)
  }

  test("punctuation count") {
    assert(one(TextOps.punctCount(col("t")), "a,b.c!") == 3)
    assert(one(TextOps.punctCount(col("t")), "no punct here") == 0)
  }

  test("stopword ratio") {
    assert(one(TextOps.stopwordRatio(col("t")), "the cat and the dog") == 0.6)
    assert(one(TextOps.stopwordRatio(col("t")), "cat dog") == 0.0)
    assert(one(TextOps.stopwordRatio(col("t")), "") == 0.0)
  }

  test("language id heuristics") {
    assert(TextOps.langIdHeuristic("the cat sat on the mat with you") == "en")
    assert(TextOps.langIdHeuristic("el gato es una mascota para la casa") == "es")
    assert(TextOps.langIdHeuristic("le chat est dans les maisons pour une") == "fr")
    assert(TextOps.langIdHeuristic("der Hund ist nicht ein Tier und das") == "de")
    assert(TextOps.langIdHeuristic("Привет как дела сегодня вечером") == "ru")
    assert(TextOps.langIdHeuristic("今日は天気がいいですね") == "ja")
    assert(TextOps.langIdHeuristic("今天天气很好") == "zh")
    assert(TextOps.langIdHeuristic("") == "und")
    assert(TextOps.langIdHeuristic("xyzzy plugh") == "und")
  }

  test("fingerprint is whitespace-insensitive but order-sensitive") {
    assert(TextOps.fingerprint64("a b c") == TextOps.fingerprint64("a  b\tc"))
    assert(TextOps.fingerprint64("a b c") != TextOps.fingerprint64("c b a"))
  }

  test("simhash: near-dup texts have small hamming distance") {
    val base = (1 to 100).map(i => s"tok$i").mkString(" ")
    val near = base + " extra"
    val far = (200 to 300).map(i => s"q$i").mkString(" ")
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val (hBase, hNear, hFar) =
      (TextOps.simhash64(base), TextOps.simhash64(near), TextOps.simhash64(far))
    assert(ham(hBase, hNear) < 8)
    assert(ham(hBase, hFar) > 10)
  }

  test("minhash signature: jaccard estimate tracks true similarity") {
    val a = (1 to 80).map(i => s"tok$i").mkString(" ")
    val b = (1 to 76).map(i => s"tok$i").mkString(" ") + " x1 x2 x3 x4"
    val c = (500 to 580).map(i => s"z$i").mkString(" ")
    def est(x: String, y: String): Double = {
      val (sx, sy) = (TextOps.minhashSignature(x, 64, 5), TextOps.minhashSignature(y, 64, 5))
      sx.zip(sy).count { case (u, v) => u == v } / 64.0
    }
    assert(est(a, b) > 0.6)
    assert(est(a, c) < 0.2)
  }

  test("gopher rules: metrics and verdict on crafted docs") {
    val prose = "the quick brown fox jumps over a lazy dog and then " +
      ("walks calmly onward through quiet fields " * 8)
    val bullets = "- item one\n- item two\n- item three"
    val symbols = "### ### ### word ... more ... dots ..."
    val df = Seq((1L, prose), (2L, bullets), (3L, symbols), (4L, ""))
      .toDF("id", "text")
      .select(col("id"),
        TextOps.meanWordLen(col("text")).as("mwl"),
        TextOps.symbolRatio(col("text")).as("sym"),
        TextOps.bulletLineRatio(col("text")).as("bul"),
        TextOps.alphaWordRatio(col("text")).as("alpha"),
        TextOps.stopwordHits(col("text")).as("stops"),
        TextOps.gopherPass(col("text")).as("pass"))
    val rows = df.collect().map(r => r.getLong(0) -> r).toMap
    assert(rows(1L).getBoolean(6), "running prose should pass")
    assert(rows(2L).getDouble(3) == 1.0, "all lines bulleted")
    assert(!rows(2L).getBoolean(6), "bullet list fails (too short + bullets)")
    assert(rows(3L).getDouble(2) > 0.1, "symbol-heavy doc above symbol cut")
    assert(!rows(3L).getBoolean(6))
    assert(rows(4L).getDouble(1) == 0.0 && !rows(4L).getBoolean(6), "empty doc")
    // stopword hits counts DISTINCT stopwords
    assert(rows(1L).getInt(5) >= 2)
  }

  test("gopher ellipsis anchor matches RE2 end-of-string on CRLF text") {
    // "...\r\n" splits to "...\r": RE2's $ (the DuckDB oracle) does NOT
    // match before the trailing \r — the \z anchor must agree
    val df = Seq((1L, "Read more...\r\nplain line"), (2L, "Read more...\nplain line"))
      .toDF("id", "text")
      .select(col("id"), TextOps.ellipsisLineRatio(col("text")).as("r"))
    val m = df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(m(1L) == 0.0, "CRLF line must not count as ellipsis-terminated")
    assert(m(2L) == 0.5)
  }
}
