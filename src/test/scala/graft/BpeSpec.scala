package graft

import graft.operators.Bpe

class BpeSpec extends SparkSpec {
  import spark.implicits._

  // the Sennrich-paper-style corpus: low×5 lower×2 newest×6 widest×3
  private def corpus = Seq(
    (1L, (Seq.fill(5)("low") ++ Seq.fill(2)("lower")).mkString(" ")),
    (2L, (Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")))
    .toDF("doc_id", "text")

  test("pairStats: frequency-weighted adjacent pairs match hand counts") {
    val stats = Bpe.pairStats(Bpe.wordFreq(corpus, "text"))
      .as[(String, String, Long)].collect()
      .map { case (a, b, n) => (a, b) -> n }.toMap
    // l-o: low 5 + lower 2; e-s: newest 6 + widest 3; s-t: same 9;
    // w-e: lower 2 + newest 6; e-r only in lower
    assert(stats(("l", "o")) === 7L)
    assert(stats(("o", "w")) === 7L)
    assert(stats(("e", "s")) === 9L)
    assert(stats(("s", "t")) === 9L)
    assert(stats(("w", "e")) === 8L)
    assert(stats(("e", "r")) === 2L)
    assert(stats(("n", "e")) === 6L)
  }

  test("train: deterministic merge sequence with lexicographic tie-break") {
    // round 1: (e,s) and (s,t) tie at 9 → lexicographic picks (e,s)
    // round 2: es-t now 9 (newest, widest) → (es,t)
    // round 3: l-o and o-w tie at 7 → (l,o); w-est at 6 loses
    val merges = Bpe.train(corpus, "text", merges = 3)
    assert(merges.map(m => (m.rank, m.a, m.b, m.n)) === Seq(
      (0, "e", "s", 9L),
      (1, "es", "t", 9L),
      (2, "l", "o", 7L)))
    // rerun is identical — the sequence is a pure function of the corpus
    assert(Bpe.train(corpus, "text", merges = 3) === merges)
    // a corpus with nothing left to merge stops early instead of spinning
    val tiny = Seq((1L, "a b a")).toDF("doc_id", "text")
    assert(Bpe.train(tiny, "text", merges = 5) === Seq.empty)
  }

  test("mergePair: left-to-right non-overlapping application") {
    assert(Bpe.mergePair(Seq("a", "a", "a"), "a", "a") === Seq("aa", "a"))
    assert(Bpe.mergePair(Seq("x", "a", "b", "a", "b"), "a", "b") ===
      Seq("x", "ab", "ab"))
    assert(Bpe.mergePair(Seq("a"), "a", "a") === Seq("a"))
  }

  test("tokenize replays the trained merges in rank order; stream-safe") {
    val merges = Bpe.train(corpus, "text", merges = 3)
    val docs = Seq((10L, "lowest newest")).toDF("doc_id", "text")
    val toks = Bpe.tokenize(docs, "doc_id", "text", merges)
      .as[(Long, Seq[String])].collect().toMap
    // lowest: l·o·w·e·s·t →(e,s)→ es →(es,t)→ est →(l,o)→ lo
    // newest: n·e·w·e·s·t →(e,s)(es,t)→ n,e,w,est ((l,o) no-op)
    assert(toks(10L) === Seq("lo", "w", "est", "n", "e", "w", "est"))
    // an empty merge table degrades to characters
    assert(Bpe.tokenize(docs, "doc_id", "text", Seq.empty)
      .as[(Long, Seq[String])].collect().head._2.take(6) ===
      Seq("l", "o", "w", "e", "s", "t"))
    // the tokenizer is a narrow per-row map — works unchanged at ingest
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)](spark)
    assert(Bpe.tokenize(mem.toDF().toDF("doc_id", "text"),
      "doc_id", "text", merges).isStreaming)
  }

  test("minFreq caps the word table (the production-scale knob)") {
    val vocab = Bpe.wordFreq(corpus, "text", minFreq = 4)
      .as[(String, Long)].collect().toMap
    assert(vocab === Map("low" -> 5L, "newest" -> 6L))
  }
}
