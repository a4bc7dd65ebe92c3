package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf
import scala.util.hashing.MurmurHash3

/** Deterministic text embedder replacing the reference's OpenAI
  * `text-embedding-3-small` call (reference README.md:122-127, model DDL
  * README.md:205-213). The reference itself documents that embeddings are
  * non-deterministic across calls yet search-equivalent (README.md:170),
  * which licenses a deterministic in-engine substitute in this zero-egress
  * build.
  *
  * Algorithm: the classic feature-hashing trick (Weinberger et al., ICML
  * 2009): lowercase, split on non-alphanumerics, hash each token with
  * MurmurHash3, bucket = hash mod dim, sign = hash bit 31, accumulate,
  * L2-normalize. Deterministic, stateless, embarrassingly parallel — no
  * model weights to broadcast, so it scales to 100 TB as a pure map.
  *
  * Dim defaults to 64 to match the testdata corpus
  * (`embeddings.parquet`, 64-dim `list<float>`); the reference used 1536
  * (README.md:170,380).
  */
object HashEmbedder {
  val DefaultDim = 64
  val Seed = 42

  def tokens(text: String): Array[String] =
    if (text == null) Array.empty
    else text.toLowerCase.split("[^\\p{L}\\p{N}]+").filter(_.nonEmpty)

  def embed(text: String, dim: Int): Array[Float] = {
    val v = new Array[Float](dim)
    val ts = tokens(text)
    var i = 0
    while (i < ts.length) {
      val h = MurmurHash3.stringHash(ts(i), Seed)
      val idx = java.lang.Math.floorMod(h, dim)
      val sign = if ((h >>> 31) == 0) 1.0f else -1.0f
      v(idx) += sign
      i += 1
    }
    // L2-normalize (float32 arithmetic, deterministic)
    var ss = 0.0f
    var j = 0
    while (j < dim) { ss += v(j) * v(j); j += 1 }
    if (ss > 0.0f) {
      val inv = (1.0 / math.sqrt(ss.toDouble)).toFloat
      var k = 0
      while (k < dim) { v(k) *= inv; k += 1 }
    }
    v
  }

  /** Column function: STRING -> ARRAY<FLOAT> (the reference's
    * `ml_predict('vector_encoding', content)`, README.md:279-281).
    */
  def embedUdf(dim: Int = DefaultDim) =
    udf((text: String) => embed(text, dim))

  def embedCol(c: Column, dim: Int = DefaultDim): Column = embedUdf(dim)(c)
}
