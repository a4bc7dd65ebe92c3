package graft

import graft.functions.HashEmbedder

class EmbedSpec extends SparkSpec {

  test("embedding has the configured dimension") {
    assert(HashEmbedder.embed("hello world", 64).length == 64)
    assert(HashEmbedder.embed("hello world", 128).length == 128)
  }

  test("embedding is deterministic") {
    val a = HashEmbedder.embed("the quick brown fox", 64)
    val b = HashEmbedder.embed("the quick brown fox", 64)
    assert(a.sameElements(b))
  }

  test("embedding is L2-normalized for non-empty text") {
    val v = HashEmbedder.embed("some words here", 64)
    val norm = math.sqrt(v.map(x => x.toDouble * x).sum)
    assert(math.abs(norm - 1.0) < 1e-5)
  }

  test("empty/null text embeds to the zero vector") {
    assert(HashEmbedder.embed("", 64).forall(_ == 0.0f))
    assert(HashEmbedder.embed(null, 64).forall(_ == 0.0f))
  }

  test("tokenization is case-insensitive and strips punctuation") {
    assert(HashEmbedder.tokens("Hello, WORLD!").toSeq == Seq("hello", "world"))
  }

  test("property: same tokens (any case/punct) embed identically") {
    val rnd = new scala.util.Random(42)
    (1 to 100).foreach { _ =>
      val ws = List.fill(rnd.nextInt(30))(s"w${rnd.nextInt(50)}")
      val t1 = ws.mkString(" ")
      val t2 = ws.mkString(", ").toUpperCase
      assert(HashEmbedder.embed(t1, 32).sameElements(HashEmbedder.embed(t2, 32)))
    }
  }

  test("column API matches direct call over testdata") {
    import org.apache.spark.sql.functions.col
    val row = Tables(spark, sf, "documents")
      .select(col("text"), HashEmbedder.embedCol(col("text")).as("v"))
      .head()
    val expected = HashEmbedder.embed(row.getString(0), HashEmbedder.DefaultDim)
    assert(row.getSeq[Float](1).toArray.sameElements(expected))
  }
}
