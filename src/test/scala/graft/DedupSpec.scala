package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"), // near-dup of 1
    (3L, "completely different content about spark engines and shuffles"),
    (4L, "the quick brown fox jumps over the lazy dog") // exact dup of 1
  ).toDF("doc_id", "text")

  test("exact dedup groups identical content, smallest id survives") {
    val out = Dedup.exact(docs, "doc_id", "text")
    val dupGroup = out.filter(col("n_dups") === 2).select("keep_id").as[Long].collect()
    assert(dupGroup === Seq(1L))
    assert(out.count() === 3)
  }

  test("shingles: n-grams of words; short docs collapse to one shingle") {
    val sh = docs.filter(col("doc_id") === 1)
      .select(Dedup.shingles(col("text"), 3).as("s"))
      .as[Seq[String]].head()
    assert(sh.contains("the quick brown"))
    assert(sh.size === 7) // 9 words -> 7 trigrams, all distinct
    val short = Seq((1L, "two words")).toDF("doc_id", "text")
      .select(Dedup.shingles(col("text"), 3).as("s")).as[Seq[String]].head()
    assert(short === Seq("two words"))
  }

  test("minhash LSH near-dup pairs: finds planted near-dups, exact counts") {
    val pairs = Dedup.nearDupPairs(docs, "doc_id", "text",
        shingleN = 3, minNum = 1, minDen = 2) // J >= 0.5
      .select("a_id", "b_id", "n_common", "n_union")
      .as[(Long, Long, Int, Int)].collect().toSet
    // docs 1,2 share 6 of 8 trigrams; 1,4 identical (7 of 7)
    assert(pairs === Set((1L, 2L, 6, 8), (1L, 4L, 7, 7), (2L, 4L, 6, 8)))
  }

  test("nearDupPairsAgainst: bipartite pairs only (no corpus-corpus), brute-force exact") {
    val pairs = Dedup.nearDupPairsAgainst(
        docs.filter(col("doc_id") === 4), docs.filter(col("doc_id") =!= 4),
        "doc_id", "text", shingleN = 3, minNum = 1, minDen = 2)
      .as[(Long, Long, Int, Int)].collect().toSet
    // new doc 4 vs corpus {1,2,3}: identical to 1, near-dup of 2, far
    // from 3 — and the corpus-internal (1,2) pair must NOT appear
    assert(pairs === Set((4L, 1L, 7, 7), (4L, 2L, 6, 8)))
    // re-ingest: a batch doc sharing the CORPUS doc's id still pairs
    // against the old version (same-id pairs are the update comparison)
    val reingest = Dedup.nearDupPairsAgainst(
        docs.filter(col("doc_id") === 1), docs.filter(col("doc_id") <= 2),
        "doc_id", "text", shingleN = 3, minNum = 1, minDen = 2)
      .as[(Long, Long, Int, Int)].collect().toSet
    assert(reingest === Set((1L, 1L, 7, 7), (1L, 2L, 6, 8)))
  }

  test("simHash expression and aggregate forms agree; hamming tracks similarity") {
    val exprSig = docs.select(col("doc_id"),
      Dedup.simHash(Dedup.tokenSet(col("text"))).as("sig"))
    val aggSig = Dedup.simHashAgg(docs, "doc_id", Dedup.tokenSet(col("text")))
      .select(col("doc").as("doc_id"), col("simhash").as("sig"))
    val e = exprSig.as[(Long, Long)].collect().toMap
    val a = aggSig.as[(Long, Long)].collect().toMap
    assert(e === a)
    val d12 = java.lang.Long.bitCount(e(1L) ^ e(2L)) // near-dups
    val d13 = java.lang.Long.bitCount(e(1L) ^ e(3L)) // unrelated
    assert(e(1L) === e(4L)) // identical docs, identical signature
    assert(d12 < d13)
  }

  test("simHashPairs with maxHamming < bands equals brute-force pairs") {
    val toks = Dedup.tokenSet(col("text"))
    // brute force: all pairs within hamming <= 7 over the same signatures
    val sigs = Dedup.simHashAgg(docs, "doc_id", toks)
      .select(col("doc").as("doc_id"), col("simhash").as("sig"))
    val brute = sigs.as[(Long, Long)].collect()
    val expect = (for {
      (a, sa) <- brute; (b, sb) <- brute if a < b
      h = java.lang.Long.bitCount(sa ^ sb) if h <= 7
    } yield (a, b, h)).toSet
    val banded = Dedup.simHashPairs(docs, "doc_id", toks, maxHamming = 7, bands = 8)
      .as[(Long, Long, Int)].collect().toSet
    assert(banded === expect)
    assert(expect.exists { case (a, b, h) => a == 1L && b == 4L && h == 0 })
  }

  test("resolveComponents labels chains, stars, and disjoint clusters") {
    // chain 1-2-3-4 (diameter 3, exercises multi-round propagation),
    // star 10-{11,12,13}, disjoint pair 20-21
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (10L, 12L),
      (10L, 13L), (20L, 21L)).toDF("a_id", "b_id")
    val labels = Dedup.resolveComponents(pairs, "a_id", "b_id")
      .as[(Long, Long)].collect().toMap
    assert(labels === Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L,
      20L -> 20L, 21L -> 20L))
  }

  test("resolveComponentsStar matches propagation on chains, stars, and clusters") {
    // a 9-node chain needs 8 propagation rounds but only ~3 star rounds;
    // include a star, a triangle-with-tail, and a disjoint pair
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L), (6L, 7L), (7L, 8L), (8L, 9L),
      (10L, 11L), (10L, 12L), (10L, 13L),
      (30L, 31L), (31L, 32L), (30L, 32L), (32L, 33L),
      (20L, 21L)).toDF("a_id", "b_id")
    val star = Dedup.resolveComponentsStar(pairs, "a_id", "b_id")
      .as[(Long, Long)].collect().toMap
    val prop = Dedup.resolveComponents(pairs, "a_id", "b_id")
      .as[(Long, Long)].collect().toMap
    assert(star === prop)
    assert(star(9L) === 1L && star(13L) === 10L && star(33L) === 30L && star(21L) === 20L)
  }

  test("dupSpans merges duplicated windows into maximal spans, within and across docs") {
    val corpus = Seq(
      (1L, "a b c d e f g h"),              // shares "a b c d" with doc 2
      (2L, "x x a b c d y z"),
      (3L, "p q r s t u v w"),              // no duplicated gram — absent
      (4L, "m n o m n o m n o"),            // self-repetition: whole doc one span
      (5L, "a b c z1 z2 z3 z4 a b c z5")    // two disjoint islands in one doc
    ).toDF("doc_id", "text")
    val out = Dedup.dupSpans(corpus, "doc_id", "text", n = 3)
      .as[(Long, Int, Int)].collect().toSet
    assert(out === Set(
      (1L, 0, 4),  // windows 0,1 overlap -> [0,4)
      (2L, 2, 4),  // windows 2,3 -> [2,6)... tokens 2..5
      (4L, 0, 9),  // every window duplicated within the doc
      (5L, 0, 3), (5L, 7, 3))) // gap between islands splits the spans
    // spans never overlap within a doc and each covers >= n tokens
    out.groupBy(_._1).foreach { case (_, spans) =>
      val sorted = spans.toSeq.sortBy(_._2)
      sorted.foreach { case (_, _, len) => assert(len >= 3) }
      sorted.sliding(2).foreach {
        case Seq((_, s1, l1), (_, s2, _)) => assert(s2 > s1 + l1)
        case _ =>
      }
    }
  }

  test("stripDupSpans cuts exactly the marked spans; clean docs pass intact") {
    def md5Of(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val corpus = Seq(
      (1L, "a b c d e f g h"),           // span [0,4) cut → "e f g h"
      (2L, "x x a b c d y z"),           // span [2,6) cut → "x x y z"
      (3L, "p q r s t u v w"),           // untouched
      (4L, "m n o m n o m n o"),         // fully covered → empty
      (5L, "a b c z1 z2 z3 z4 a b c z5") // two islands cut → "z1 z2 z3 z4 z5"
    ).toDF("doc_id", "text")
    val out = Dedup.stripDupSpans(corpus, "doc_id", "text", n = 3)
      .as[(Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) === ((4L, md5Of("e f g h"))))
    assert(out(2L) === ((4L, md5Of("x x y z"))))
    assert(out(3L) === ((8L, md5Of("p q r s t u v w"))))
    assert(out(4L) === ((0L, md5Of(""))))
    assert(out(5L) === ((5L, md5Of("z1 z2 z3 z4 z5"))))
  }

  test("portableHash64 matches the md5-prefix definition") {
    val h = Seq(Tuple1("hello")).toDF("t")
      .select(Dedup.portableHash64(col("t"))).as[Long].head()
    val md5hex = java.security.MessageDigest.getInstance("MD5")
      .digest("hello".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(h === java.lang.Long.parseLong(md5hex.take(15), 16))
  }

  test("line dedup keeps the first corpus-wide occurrence; blanks are structural") {
    val docs = Seq(
      (1L, "alpha\nshared\n\nbeta"),
      (2L, "shared\ngamma"),
      (3L, "shared")).toDF("doc_id", "text")
    val out = Dedup.lineDedup(docs, "doc_id", "text").orderBy("doc_id")
      .as[(Long, Int, Long, String)].collect()
    // doc 1 is first everywhere: keeps all 4 lines incl. the blank
    assert(out(0) === ((1L, 4, 4L, "alpha\nshared\n\nbeta")))
    // doc 2 loses 'shared' (first seen at doc 1 pos 1)
    assert(out(1) === ((2L, 2, 1L, "gamma")))
    // doc 3 loses everything: rebuilds to '' with n_kept 0
    assert(out(2) === ((3L, 1, 0L, "")))
  }

  test("line dedup orders within a document by position, not content") {
    val docs = Seq((1L, "zz\naa\nmm")).toDF("doc_id", "text")
    val out = Dedup.lineDedup(docs, "doc_id", "text")
      .select("text_dedup").as[String].head()
    assert(out === "zz\naa\nmm")
  }

  test("ngramJaccard computes exact similarity between two columns") {
    val df = Seq(("a b c d", "a b c d"), ("a b c d", "x y z w"))
      .toDF("l", "r")
      .select(Dedup.ngramJaccard(col("l"), col("r"), 2).as("j"))
      .as[Double].collect()
    assert(df(0) === 1.0)
    assert(df(1) === 0.0)
  }

  test("keepBestPerComponent: best score survives, ties to min id, nulls never beat a score") {
    // components: {1,2,3} (canonical 1), {4,5} (canonical 4); 6,7 singletons
    val comps = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L))
      .toDF("node", "canonical")
    val docs = Seq(
      (1L, Some(10L)), (2L, Some(30L)), (3L, Some(30L)), // tie 2 vs 3 → 2
      (4L, None), (5L, Some(1L)),                        // null loses → 5
      (6L, Some(7L)),                                    // singleton kept
      (7L, None))                                        // all-null singleton kept
      .toDF("doc_id", "score")
    val out = Dedup.keepBestPerComponent(docs, comps, "doc_id", col("score"))
      .select("doc_id", "canonical").as[(Long, Long)].collect().sorted
    assert(out.toSeq === Seq((2L, 1L), (5L, 4L), (6L, 6L), (7L, 7L)))
  }

  test("containmentPairs: asymmetric threshold, df cap excludes boilerplate grams") {
    // doc 1 = "q w e r" (3 distinct 2-shingles: qw, we, er); doc 2 quotes
    // all of doc 1 plus more; doc 3 shares only the boilerplate gram
    // "zz zz" with everyone (df 3 > maxDf 2 → excluded everywhere).
    val docs = Seq(
      (1L, "q w e r zz zz"),
      (2L, "q w e r t y zz zz"),
      (3L, "a b zz zz"))
      .toDF("doc_id", "text")
    val got = Dedup.containmentPairs(docs, "doc_id", "text",
        shingleN = 2, minNum = 3, minDen = 4, maxDf = 2)
      .as[(Long, Long, Long, Long)].collect().sorted.toSeq
    // doc1 kept grams: qw we er (er zz / zz zz excluded or df-capped):
    // shingles(2) of doc1 = qw, we, er, r-zz, zz-zz. df: zz-zz = 3 docs
    // → dropped at maxDf 2; r-zz only in doc1 (df 1, kept, unpaired).
    // doc1∩doc2 = {qw, we, er} = 3 of doc1's 4 kept grams → 3/4 ≥ 3/4 ✓;
    // in doc2's direction 3 of its 6 kept grams → 1/2 < 3/4 ✗.
    assert(got === Seq((1L, 2L, 3L, 4L)))
    // doc 3 pairs with nobody: its only shared gram is df-capped
    assert(!got.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("noveltyReport: hand-counted unseen-gram ppm; empty docs carry one gram") {
    val corpus = Seq((1L, "a b c d"), (2L, "x y z w")).toDF("doc_id", "text")
    val fresh = Seq(
      (10L, "a b c d"),   // both 3-grams seen → novelty 0
      (11L, "a b q"),     // one 3-gram "a b q", unseen → 1e6 ppm
      (12L, "b c d x y"), // grams: bcd(seen), cdx, dxy, xyz? no — "c d x","d x y" unseen; "b c d" seen → 2/3
      (13L, "")           // the [""] gram, corpus-unseen → 1e6 ppm
    ).toDF("doc_id", "text")
    val got = graft.operators.Dedup.noveltyReport(
        fresh, corpus, "doc_id", "text", shingleN = 3)
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got(10L) === ((10L, 2L, 0L, 0L)))
    assert(got(11L) === ((11L, 1L, 1L, 1000000L)))
    assert(got(12L) === ((12L, 3L, 2L, 666666L)))
    assert(got(13L) === ((13L, 1L, 1L, 1000000L)))
  }

  test("containmentPairsAgainst: corpus-df distinctiveness, unseen grams dilute") {
    val corpus = Seq(
      (1L, "q w e r"),      // grams qw we er
      (2L, "q w e r t"))    // grams qw we er rt
      .toDF("doc_id", "text")
    // new doc 10 = all of doc 1 plus one fresh gram ("x y" unseen, df 0,
    // still counted in n_src): kept size 5 {qw,we,er,rx?...}
    val newDocs = Seq((10L, "q w e r x")).toDF("doc_id", "text")
    val got = Dedup.containmentPairsAgainst(newDocs, corpus, "doc_id", "text",
        shingleN = 2, minNum = 3, minDen = 4, maxDf = 5)
      .as[(Long, Long, Long, Long)].collect().sorted.toSeq
    // new grams: qw we er rx. corpus df: qw 2, we 2, er 2, rx 0 → all kept,
    // n_src 4. vs doc1: common {qw,we,er} = 3 → 4*3 ≥ 3*4 ✓; vs doc2: same
    // 3 common ✓ (rt not in new doc).
    assert(got === Seq((10L, 1L, 3L, 4L), (10L, 2L, 3L, 4L)))
  }

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private def bruteFuzzy(names: Seq[String], k: Int): Set[(String, String, Int)] = {
    val ds = names.distinct
    (for {
      a <- ds; b <- ds if a < b
      d = lev(a, b) if d <= k
    } yield (a, b, d)).toSet
  }

  test("fuzzyKeyPairs equals brute-force Levenshtein, typo-cluster case") {
    val names = Seq("kitten", "sitten", "sittin", "sitting", "kitchen",
      "mitten", "spark engine", "spark engines", "shuffle")
    val df = names.zipWithIndex.map { case (n, i) => (i.toLong, n) }
      .toDF("id", "name")
    for (k <- 1 to 2) {
      val got = Dedup.fuzzyKeyPairs(df, "name", maxDist = k)
        .as[(String, String, Int)].collect().toSet
      assert(got === bruteFuzzy(names, k), s"mismatch at maxDist=$k")
    }
  }

  test("fuzzyKeyPairs: short strings exact on both candidate paths") {
    // every string here is at or below the prefix path's short-pool bound
    // for k=2,q=2 (len <= 5) — pairs may share ZERO bigrams yet be within
    // distance 2; the deletes path needs no pool (variants reach "")
    val names = Seq("ab", "cd", "a", "abc", "xy", "xyz", "q")
    val df = names.zipWithIndex.map { case (n, i) => (i.toLong, n) }
      .toDF("id", "name")
    val got = Dedup.fuzzyPairsDeletes(df, "name", maxDist = 2)
      .as[(String, String, Int)].collect().toSet
    assert(got === bruteFuzzy(names, 2))
    assert(got.contains(("ab", "cd", 2)), "zero-shared-gram pair must surface")
    val gotPrefix = Dedup.fuzzyPairsPrefix(df, "name", maxDist = 2, q = 2)
      .as[(String, String, Int)].collect().toSet
    assert(gotPrefix === bruteFuzzy(names, 2))
  }

  test("fuzzyPairsPrefix: maxDist=3 equals brute force (the dispatch's gram path)") {
    val rnd = new scala.util.Random(11)
    val alphabet = "abcd"
    val names = Seq.fill(90)(
      (0 until (4 + rnd.nextInt(9))).map(_ => alphabet(rnd.nextInt(4))).mkString)
    val df = names.zipWithIndex.map { case (n, i) => (i.toLong, n) }
      .toDF("id", "name")
    val got = Dedup.fuzzyKeyPairs(df, "name", maxDist = 3)
      .as[(String, String, Int)].collect().toSet
    assert(got === bruteFuzzy(names, 3))
  }

  test("jaccardPairs: exact threshold join equals brute force, including low thresholds") {
    val rnd = new scala.util.Random(23)
    val words = Seq("red", "fish", "blue", "bird", "green", "cat", "dog", "run")
    val base = Seq.fill(40)((0 until (4 + rnd.nextInt(10)))
      .map(_ => words(rnd.nextInt(words.size))).mkString(" "))
    // plant explicit near-dups: copy with one word changed
    val planted = base.take(8).map(t => t.split(" ").updated(0, "swap").mkString(" "))
    val docs = (base ++ planted).zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val df = docs.toDF("doc_id", "text")
    def hset(t: String): Set[Long] = {
      val w = t.toLowerCase.split("\\s+").toSeq
      val sh = if (w.size < 3) Seq(w.mkString(" ")) else w.sliding(3).map(_.mkString(" ")).toSeq
      sh.distinct.map { s =>
        val md = java.security.MessageDigest.getInstance("MD5")
        val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
        java.lang.Long.parseLong(hex.take(15), 16)
      }.toSet
    }
    val sets = docs.map { case (i, t) => i -> hset(t) }.toMap
    for ((num, den) <- Seq((1, 2), (3, 10), (4, 5))) {
      val expect = (for {
        a <- docs.map(_._1); b <- docs.map(_._1) if a < b
        c = sets(a).intersect(sets(b)).size
        if den * c >= num * (sets(a).size + sets(b).size - c)
      } yield (a, b, c.toLong, sets(a).size.toLong, sets(b).size.toLong)).toSet
      val got = Dedup.jaccardPairs(df, "doc_id", "text", 3, num, den)
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      assert(got === expect, s"tau=$num/$den mismatch")
    }
  }

  test("jaccardPairsAgainst: directed new-vs-corpus equals brute force; " +
      "corpus-unseen grams fill prefixes without breaking completeness") {
    val rnd = new scala.util.Random(37)
    val words = Seq("red", "fish", "blue", "bird", "green", "cat", "dog", "run")
    val corpus = Seq.fill(30)((0 until (4 + rnd.nextInt(10)))
      .map(_ => words(rnd.nextInt(words.size))).mkString(" "))
    // new docs: near-copies of corpus docs PLUS fresh never-seen tokens
    // (df = 0 grams must sort to the prefix front and stay complete)
    val fresh = corpus.take(6).map(t =>
      (t.split(" ").take(6) ++ Seq("novel" + rnd.nextInt(100))).mkString(" "))
    val oldDocs = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val newDocs = fresh.zipWithIndex.map { case (t, i) => (1000L + i, t) }
    def hset(t: String): Set[Long] = {
      val w = t.toLowerCase.split("\\s+").toSeq
      val sh = if (w.size < 3) Seq(w.mkString(" ")) else w.sliding(3).map(_.mkString(" ")).toSeq
      sh.distinct.map { s =>
        val md = java.security.MessageDigest.getInstance("MD5")
        val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
        java.lang.Long.parseLong(hex.take(15), 16)
      }.toSet
    }
    val so = oldDocs.map { case (i, t) => i -> hset(t) }.toMap
    val sn = newDocs.map { case (i, t) => i -> hset(t) }.toMap
    for ((num, den) <- Seq((1, 2), (3, 10))) {
      val expect = (for {
        n <- newDocs.map(_._1); o <- oldDocs.map(_._1)
        c = sn(n).intersect(so(o)).size
        if den * c >= num * (sn(n).size + so(o).size - c)
      } yield (n, o, c.toLong, sn(n).size.toLong, so(o).size.toLong)).toSet
      val got = Dedup.jaccardPairsAgainst(newDocs.toDF("doc_id", "text"),
          oldDocs.toDF("doc_id", "text"), "doc_id", "text", 3, num, den)
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      assert(got === expect, s"tau=$num/$den mismatch")
    }
  }

  test("JaccardIndex overloads: jaccardPairs(index) and jaccardPairsAgainst(new, index) " +
      "equal the direct two-frame forms row for row") {
    // the r14 gram-sharing overloads (q_icp_attach tokenizes the standing
    // corpus ONCE) must be pure plan sharing — identical output to the
    // direct forms on a corpus with near-dups, fresh unseen tokens, and
    // docs shorter than the shingle width
    val rnd = new scala.util.Random(59)
    val words = Seq("red", "fish", "blue", "bird", "green", "cat", "dog", "run")
    val corpus = Seq.fill(35)((0 until (2 + rnd.nextInt(12)))
      .map(_ => words(rnd.nextInt(words.size))).mkString(" "))
    val fresh = corpus.take(7).map(t =>
      (t.split(" ").take(6) ++ Seq("novel" + rnd.nextInt(100))).mkString(" "))
    val oldDocs = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val newDocs = fresh.zipWithIndex.map { case (t, i) => (1000L + i, t) }
      .toDF("doc_id", "text")
    for ((num, den) <- Seq((1, 2), (3, 10))) {
      val idx = Dedup.jaccardIndex(oldDocs, "doc_id", "text", 3, num, den)
      val selfDirect = Dedup.jaccardPairs(oldDocs, "doc_id", "text", 3, num, den)
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      val selfIdx = Dedup.jaccardPairs(idx)
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      assert(selfIdx === selfDirect, s"self-join tau=$num/$den mismatch")
      val agDirect = Dedup.jaccardPairsAgainst(newDocs, oldDocs,
          "doc_id", "text", 3, num, den)
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      val agIdx = Dedup.jaccardPairsAgainst(newDocs, idx, "doc_id", "text", 3)
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      assert(agIdx === agDirect, s"against tau=$num/$den mismatch")
    }
  }

  test("resolveFuzzyEntities: transitive chains share one canonical; singletons self-map") {
    // aaaa—aaab—aabb chain under maxDist=1: the ends are distance 2 apart
    // yet must land in ONE component via the middle link
    val names = Seq("aaaa", "aaab", "aabb", "zzzz", "aaaa") // dup row
    val got = Dedup.resolveFuzzyEntities(
        names.zipWithIndex.map { case (n, i) => (i.toLong, n) }.toDF("id", "name"),
        "name", maxDist = 1)
      .as[(String, String)].collect().toMap
    assert(got === Map("aaaa" -> "aaaa", "aaab" -> "aaaa", "aabb" -> "aaaa",
      "zzzz" -> "zzzz"))
  }

  test("fuzzyKeyPairs: randomized strings equal brute force; duplicates collapse") {
    val rnd = new scala.util.Random(7)
    val alphabet = "abcde"
    val names = Seq.fill(120)(
      (0 until (3 + rnd.nextInt(8))).map(_ => alphabet(rnd.nextInt(5))).mkString)
    val df = (names ++ names.take(30)) // row-level duplicates
      .zipWithIndex.map { case (n, i) => (i.toLong, n) }.toDF("id", "name")
    for (path <- Seq("deletes", "prefix")) {
      val pairs = if (path == "deletes")
        Dedup.fuzzyPairsDeletes(df, "name", maxDist = 1)
      else Dedup.fuzzyPairsPrefix(df, "name", maxDist = 1, q = 2)
      val got = pairs.as[(String, String, Int)].collect().toSeq
      assert(got.size === got.distinct.size, s"[$path] one row per distinct pair")
      assert(got.toSet === bruteFuzzy(names, 1), s"[$path] mismatch")
    }
  }

  test("sortedNeighborhoodPairs: equals brute-force sliding window over the " +
      "global sort, once per pair, across partition boundaries") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = Seq.tabulate(500)(i =>
      (i.toLong, f"key#${rnd.nextInt(80)}%04d")) // heavy ties: ids break order
    val w = 7
    // tiny buckets force windows to straddle range partitions (500 rows /
    // 16 partitions ≈ 31 rows, window 7 crosses every boundary; bucket
    // count beyond row count also exercises near-empty partitions)
    for (b <- Seq(3, 16, 200)) {
      val got = graft.operators.Dedup.sortedNeighborhoodPairs(
        rows.toDF("id", "k"), "id", "k", window = w, buckets = b)
        .as[(Long, String, Long, String)].collect().toSet
      val sorted = rows.sortBy { case (i, k) => (k, i) }
      val brute = (for {
        i <- sorted.indices
        j <- (i + 1) until math.min(i + w, sorted.size)
      } yield (sorted(i)._1, sorted(i)._2, sorted(j)._1, sorted(j)._2)).toSet
      assert(got === brute, s"buckets=$b")
    }
  }
}
