package graft.text

class BpeSpec extends graft.SparkSuite {
  import spark.implicits._

  // the Sennrich et al. worked example: {low:5, lower:2, newest:6, widest:3}
  private val counts = Array[(String, Long)](
    ("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))

  test("trainFromCounts reproduces the classic worked example") {
    val merges = Bpe.trainFromCounts(counts, 4)
    // round 1: (e,s) and (s,t</w>) both hit 9 (newest 6 + widest 3);
    // the tie breaks to the lexicographically smaller pair (e,s)
    assert(merges.head == ("e", "s"))
    // round 2: (es,t</w>) 9; round 3: (l,o) 7; round 4: 6-way tie
    // (e,w)/(n,e)... breaks to (e,w)
    assert(merges == Seq(("e", "s"), ("es", "t</w>"), ("l", "o"), ("e", "w")))
    // determinism: training twice gives identical merges
    assert(Bpe.trainFromCounts(counts, 4) == merges)
  }

  test("encodeWord applies merges greedily by rank, all occurrences") {
    val merges = Bpe.trainFromCounts(counts, 10)
    val rank = merges.zipWithIndex.toMap
    // a trained word should encode to few symbols; an unseen word
    // falls back toward characters
    val newest = Bpe.encodeWord("newest", rank)
    assert(newest.mkString("|").replace("|", "") == "newest</w>")
    assert(newest.length < 6)
    val unseen = Bpe.encodeWord("zq", rank)
    assert(unseen.toSeq == Seq("z", "q</w>"))
    assert(Bpe.encodeWord("", rank).isEmpty)
  }

  test("distributed encode matches a local re-encode, fingerprints stable") {
    val docs = Seq((1L, "low lower newest"), (2L, "widest low"),
      (3L, "")).toDF("doc_id", "text")
    val merges = Bpe.trainFromCounts(counts, 6)
    val out = Bpe.encode(docs, merges)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(3))).toMap
    val rank = merges.zipWithIndex.toMap
    def local(text: String): Long =
      text.split(" ").filter(_.nonEmpty)
        .map(w => Bpe.encodeWord(w, rank).length.toLong).sum
    assert(out(1L)._1 == local("low lower newest"))
    assert(out(2L)._1 == local("widest low"))
    assert(out(3L)._1 == 0L)
    // same token stream -> same fingerprint; different -> different
    val again = Bpe.encode(docs, merges)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(again(1L) == out(1L)._2)
    assert(out(1L)._2 != out(2L)._2)
  }

  test("train end-to-end on a DataFrame sample is deterministic") {
    val docs = (0L until 50L).map(i =>
      (i, if (i % 2 == 0) "alpha beta alpha" else "beta gamma"))
      .toDF("doc_id", "text")
    val m1 = Bpe.train(docs, nMerges = 5, sampleHexCeil = "ff")
    val m2 = Bpe.train(docs, nMerges = 5, sampleHexCeil = "ff")
    assert(m1 == m2)
    assert(m1.nonEmpty)
  }
}
