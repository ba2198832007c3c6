package graft.text

class CollocationsSpec extends graft.SparkSuite {

  test("lift ranks the planted collocation first; integer formula exact") {
    import spark.implicits._
    // "new york" always co-occurs; "the" is everywhere (low lift)
    val docs = Seq(
      (1L, "new york the cat the dog"),
      (2L, "new york the bird the fish"),
      (3L, "the cat the dog the bird")).toDF("doc_id", "text")
    val top = Collocations.topByLift(docs, k = 5, minCount = 2).collect()
    val first = top.head
    assert((first.getString(0), first.getString(1)) == (("new", "york")))
    // by hand: bigrams per doc = 5, N = 15; c12(new,york)=2, c1(new)=2,
    // c2(york)=2 -> (2*1e6 div 2) * 15 div 2 = 7_500_000
    assert(first.getLong(2) == 2L && first.getLong(3) == 2L
      && first.getLong(4) == 2L)
    assert(first.getLong(5) == 7500000L)
    // every returned lift respects the ordering contract
    val lifts = top.map(_.getLong(5)).toSeq
    assert(lifts == lifts.sorted.reverse)
  }

  test("minCount prunes rare bigrams before the joins") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b a b a b"),
      (2L, "c d")).toDF("doc_id", "text")
    val got = Collocations.topByLift(docs, k = 10, minCount = 3)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got.contains(("a", "b")))
    assert(!got.contains(("c", "d"))) // count 1 < 3
  }

  test("plan: sort-limited top-k, no global sort exchange of the full table") {
    import spark.implicits._
    val docs = Seq((1L, "a b a b")).toDF("doc_id", "text")
    val plan = Collocations.topByLift(docs, k = 5, minCount = 1)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k must be sort-limited:\n$plan")
  }
}
