package graft

import org.apache.spark.sql.functions._

import graft.operators.Bpe

class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("merge sequence matches hand derivation on a fixed corpus") {
    // word types: "abab" x3, "abc" x1 ->
    //   round 1: (a,b) count 3*2+1=7 > (b,a) 3 > (b,c) 1 -> merge (a,b)
    //   round 2: "abab" -> [ab, ab], "abc" -> [ab, c]:
    //            (ab,ab) 3, (ab,c) 1 -> merge (ab, ab)
    val docs = Seq((1L, "abab abab abab abc")).toDF("id", "text")
    val m = Bpe.trainMerges(docs, "text", nMerges = 2)
    assert(m.merges == IndexedSeq(("a", "b"), ("ab", "ab")), m.merges)
  }

  test("argmax tie-break is lexicographic on the pair") {
    // "xy" and "xz" both appear twice -> counts tie at 2; (x,y) < (x,z)
    val docs = Seq((1L, "xy xy xz xz")).toDF("id", "text")
    val m = Bpe.trainMerges(docs, "text", nMerges = 1)
    assert(m.merges == IndexedSeq(("x", "y")), m.merges)
  }

  test("encodeWord reconstructs the word and respects rank order") {
    val docs = Seq((1L, "abab abab abab abc")).toDF("id", "text")
    val m = Bpe.trainMerges(docs, "text", nMerges = 2)
    assert(m.encodeWord("abab") == Seq("abab"))
    assert(m.encodeWord("abc") == Seq("ab", "c"))
    assert(m.encodeWord("xyz") == Seq("x", "y", "z"), "unseen chars stay chars")
    assert(m.encodeWord("") == Nil)
    // every encoding concatenates back to the input
    Seq("abab", "abc", "aabba", "b").foreach { w =>
      assert(m.encodeWord(w).mkString == w)
    }
  }

  test("more merges never increase a document's token count") {
    val docs = Tables(spark, sf, "documents").limit(50)
    val m2 = Bpe.trainMerges(docs, "text", nMerges = 2)
    val m10 = Bpe.trainMerges(docs, "text", nMerges = 10)
    val c2 = Bpe.encodeCount(docs, "doc_id", "text", m2)
      .as[(Long, Long)].collect().toMap
    val c10 = Bpe.encodeCount(docs, "doc_id", "text", m10)
      .as[(Long, Long)].collect().toMap
    assert(c2.keySet == c10.keySet)
    c2.foreach { case (id, n2) =>
      assert(c10(id) <= n2, s"doc $id: 10-merge count ${c10(id)} > 2-merge $n2")
    }
    // zero merges == character count of the normalized words
    val m0 = Bpe.BpeModel(IndexedSeq.empty)
    val c0 = Bpe.encodeCount(docs, "doc_id", "text", m0)
      .as[(Long, Long)].collect().toMap
    val chars = docs.select(col("doc_id"),
        aggregate(filter(split(lower(trim(col("text"))), "[ \\t\\n\\f\\r]+"),
          x => length(x) > 0), lit(0L), (a, x) => a + length(x)).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(c0 == chars)
  }

  test("training is deterministic across partitionings") {
    val docs = Tables(spark, sf, "documents").limit(80)
    val a = Bpe.trainMerges(docs, "text", nMerges = 12)
    val b = Bpe.trainMerges(docs.repartition(7), "text", nMerges = 12)
    assert(a.merges == b.merges)
  }

  test("head merge equals the independent weighted-pair argmax") {
    val docs = Tables(spark, sf, "documents")
    val m = Bpe.trainMerges(docs, "text", nMerges = 1)
    // independent recomputation from the word-type table
    val types = Bpe.wordTypes(docs, "text", 1000000)
      .as[(String, Long)].collect()
    val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
    types.foreach { case (w, c) =>
      (0 until w.length - 1).foreach { i =>
        val p = (w(i).toString, w(i + 1).toString)
        counts(p) = counts.getOrElse(p, 0L) + c
      }
    }
    val want = counts.toSeq.minBy { case ((l, r), c) => (-c, l, r) }._1
    assert(m.merges.head == want)
  }

  test("maxTypes cap keeps training deterministic (count desc, word asc)") {
    val docs = Seq((1L, "aa aa bb bb cc")).toDF("id", "text")
    // cap to 2 types: aa and bb (count 2 each) beat cc; tie aa < bb
    val m = Bpe.trainMerges(docs, "text", nMerges = 1, maxTypes = 2)
    assert(m.merges == IndexedSeq(("a", "a")),
      "capped type table must keep the highest-count types")
  }
}
