package graft

import graft.training.TrainingPrep
import org.apache.spark.sql.functions._

/** Semantics of the greedy BPE apply kernel — the rows-only-gated op
  * (td47) carries its correctness here: hand-computed merge sequences,
  * rank priority, word-boundary isolation, and the mined-ranks
  * composition.
  */
class BpeEncodeSpec extends SparkSpec {

  private def encode(text: String, merges: Seq[String]): Seq[String] = {
    import spark.implicits._
    Seq(text).toDF("t")
      .select(graft.functions.VectorExpressions.bpe_encode(col("t"), merges)
        .as("p"))
      .head().getSeq[String](0)
  }

  test("greedy lowest-rank merges, hand-computed") {
    // "abcab": chars a,b,c,a,b -> rank0 "a b" merges BOTH occurrences ->
    // [ab, c, ab] -> rank1 "ab c" -> [abc, ab]
    assert(encode("abcab", Seq("a b", "ab c")) == Seq("abc", "ab"))
    // rank order matters: with priorities flipped, "b c" fires first
    assert(encode("abc", Seq("b c", "a b")) == Seq("a", "bc"))
    assert(encode("abc", Seq("a b", "b c")) == Seq("ab", "c"))
    // no applicable merge -> bare characters
    assert(encode("xyz", Seq("a b")) == Seq("x", "y", "z"))
    // cascading merges converge to one piece
    assert(encode("aaaa", Seq("a a", "aa aa")) == Seq("aaaa"))
  }

  test("words are isolated: merges never cross a space; empty text yields no pieces") {
    // "a b" as SEPARATE WORDS must not merge (the pair is within-word)
    assert(encode("a b", Seq("a b")) == Seq("a", "b"))
    assert(encode("ab ab", Seq("a b")) == Seq("ab", "ab"))
    assert(encode("", Seq("a b")).isEmpty)
    assert(encode("q", Seq.empty) == Seq("q"))
  }

  test("left-to-right tie handling: all occurrences of the best pair merge in one pass") {
    // "aaa" with merge "a a": left-to-right gives [aa, a], not [a, aa]
    assert(encode("aaa", Seq("a a")) == Seq("aa", "a"))
    assert(encode("aaaaa", Seq("a a")) == Seq("aa", "aa", "a"))
  }

  test("bpeEncode over a corpus with mined ranks: counts and fingerprints are deterministic") {
    import spark.implicits._
    val docs = Seq((1L, "the then there"), (2L, "he her the"), (3L, "zq"))
      .toDF("doc_id", "text")
    val merges = TrainingPrep.charPairMerges(docs, "text", k = 5)
      .collect().map(_.getString(0)).toSeq
    assert(merges.nonEmpty && merges.head == "h e") // 6 in-word "he" pairs
    val out = TrainingPrep.bpeEncode(docs, "doc_id", "text", merges)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
    // pieces shrink below char counts wherever merges apply
    assert(out(0)._3 < "thethenthere".length)
    assert(out(2)._3 == 2) // "zq" has no mined pair -> two chars
    // determinism: same input, same fingerprint
    val again = TrainingPrep.bpeEncode(docs, "doc_id", "text", merges)
      .orderBy("doc_id").collect().map(_.getString(3))
    assert(out.map(_._4).toSeq == again.toSeq)
  }
}
