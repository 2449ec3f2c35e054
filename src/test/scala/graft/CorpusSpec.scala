package graft

import org.apache.spark.sql.functions._

import graft.operators.Corpus

class CorpusSpec extends SparkSpec {
  import spark.implicits._

  test("chunk: windows advance by stride, overlap carried, tail short") {
    // 10 tokens, chunk 4, overlap 1 -> stride 3: starts 0,3,6. A window at
    // start 9 would hold only t10 (1 token = the overlap), already covered
    // by chunk 2 (t7..t10), so it is NOT emitted.
    val docs = Seq((1L, (1 to 10).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text")
    val chunks = Corpus.chunk(docs, "doc_id", "text", chunkTokens = 4, overlapTokens = 1)
      .orderBy("chunk_no")
      .select("chunk_no", "chunk_tokens").as[(Int, Int)].collect().toSeq
    assert(chunks === Seq((0, 4), (1, 4), (2, 4)))
    // 11 tokens: the tail window (t10, t11) adds a token beyond the
    // overlap, so it IS emitted, short
    val docs11 = Seq((1L, (1 to 11).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text")
    val chunks11 = Corpus.chunk(docs11, "doc_id", "text", 4, 1)
      .orderBy("chunk_no")
      .select("chunk_no", "chunk_tokens").as[(Int, Int)].collect().toSeq
    assert(chunks11 === Seq((0, 4), (1, 4), (2, 4), (3, 2)))
    // overlap: chunk 1 starts at token 4 (t4..t7), sharing t4 with chunk 0
    val md5 = Corpus.chunk(docs, "doc_id", "text", 4, 1)
      .filter(col("chunk_no") === 1).select("chunk_md5").as[String].head()
    val expect = java.security.MessageDigest.getInstance("MD5")
      .digest("t4 t5 t6 t7".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(md5 === expect)
  }

  test("chunk: short and empty docs produce exactly one chunk") {
    val docs = Seq((1L, "a b"), (2L, "")).toDF("doc_id", "text")
    val n = Corpus.chunk(docs, "doc_id", "text", 8, 2)
      .groupBy("doc_id").count().as[(Long, Long)].collect().toMap
    assert(n === Map(1L -> 1L, 2L -> 1L))
  }

  test("chunk keeps passthrough columns for downstream composition") {
    val docs = Seq((1L, 100L, "a b c")).toDF("doc_id", "ts", "text")
    val out = Corpus.chunk(docs, "doc_id", "text", 8, 2, keepCols = Seq("ts"))
    assert(out.columns.toSeq === Seq("doc_id", "ts", "chunk_no", "chunk_tokens", "chunk_md5"))
    assert(out.select("ts").as[Long].head() === 100L)
  }

  test("streaming chunk-dedup at ingest: repeated chunks suppressed within watermark") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long, String)]
    val chunked = Corpus.chunk(
      mem.toDF().toDF("doc_id", "ts_ms", "text"),
      "doc_id", "text", chunkTokens = 2, overlapTokens = 0,
      keepCols = Seq("ts_ms"))
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_millis(col("ts_ms")))
    val deduped = graft.streaming.StreamingState.dedupWithinWatermark(
      chunked, Seq("chunk_md5"), "ts", "10 minutes")
    val q = deduped.writeStream.format("memory").queryName("chunk_dedup_sink").start()
    try {
      mem.addData((1L, 1000L, "alpha beta gamma delta"))
      q.processAllAvailable()
      // doc 2 repeats doc 1's first window and adds a new one
      mem.addData((2L, 2000L, "alpha beta epsilon zeta"))
      q.processAllAvailable()
    } finally q.stop()
    val kept = spark.table("chunk_dedup_sink")
      .select("doc_id", "chunk_no").as[(Long, Int)].collect().toSet
    // doc1: both windows kept; doc2: "alpha beta" suppressed, "epsilon zeta" kept
    assert(kept === Set((1L, 0), (1L, 1), (2L, 1)))
  }

  test("repetitionStats: top-bigram share and duplicate-trigram fraction") {
    // "a a a b": bigrams (a a)×2, (a b)×1 → top 2/3; trigrams (a a a),
    // (a a b) both unique → dup 0. "x y x y x y": bigrams (x y)×3,(y x)×2
    // → top 3/5; trigrams (x y x)×2,(y x y)×2 → dup 4/4 = 1.
    val docs = Seq((1L, "a a a b"), (2L, "x y x y x y"), (3L, "solo"))
      .toDF("doc_id", "text")
    val out = Corpus.repetitionStats(docs, "doc_id", "text")
      .as[(Long, Option[Long], Option[Double], Option[Double])]
      .collect().map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(out(1L) === ((Some(3L), Some(2.0 / 3), Some(0.0))))
    assert(out(2L) === ((Some(5L), Some(3.0 / 5), Some(1.0))))
    // shorter than a bigram: kept, with null stats
    assert(out(3L) === ((None, None, None)))
  }

  test("contamination counts distinct shared n-grams per test doc") {
    val test = Seq((1L, "alpha beta gamma delta"), (2L, "zeta eta theta iota"))
      .toDF("doc_id", "text")
    val train = Seq((10L, "alpha beta gamma epsilon"), (11L, "beta gamma delta"))
      .toDF("doc_id", "text")
    val out = Corpus.contamination(test, train, "doc_id", "text", n = 3)
      .as[(Long, Long)].collect().toMap
    // doc 1 shares "alpha beta gamma" (train 10) and "beta gamma delta"
    // (train 11); doc 2 shares nothing and is absent
    assert(out === Map(1L -> 2L))
  }

  test("packChunks: greedy per-doc binning, oversized chunk gets its own bin") {
    // capacity 10: [4,4,4] -> bins 0,0,1 ; [12,3] -> oversized 12 alone in
    // bin 0 (cur=12 > cap), next chunk overflows into bin 1
    val chunks = Seq(
      (1L, 0, 4), (1L, 1, 4), (1L, 2, 4),
      (2L, 0, 12), (2L, 1, 3)).toDF("doc_id", "chunk_no", "chunk_tokens")
    val out = Corpus.packChunks(chunks, "doc_id", "chunk_no", "chunk_tokens", 10)
      .select("doc_id", "chunk_no", "bin").as[(Long, Int, Int)].collect().toSet
    assert(out === Set((1L, 0, 0), (1L, 1, 0), (1L, 2, 1), (2L, 0, 0), (2L, 1, 1)))
    // bins never mix documents; capacity respected except oversized chunks
    val sums = Corpus.packChunks(chunks, "doc_id", "chunk_no", "chunk_tokens", 10)
      .groupBy("doc_id", "bin")
      .agg(org.apache.spark.sql.functions.sum("chunk_tokens").as("s"))
      .select("s").as[Long].collect()
    assert(sums.forall(s => s <= 10 || s == 12))
  }

  test("packChunksTyped (linear scan) equals the Catalyst-fold form") {
    val docs = Seq((1L, (1 to 95).map(i => s"t$i").mkString(" ")),
      (2L, (1 to 17).map(i => s"w$i").mkString(" "))).toDF("doc_id", "text")
    val chunks = Corpus.chunk(docs, "doc_id", "text", chunkTokens = 8, overlapTokens = 2)
    val hof = Corpus.packChunks(chunks, "doc_id", "chunk_no", "chunk_tokens", 20)
      .select("doc_id", "chunk_no", "chunk_tokens", "bin")
      .as[(Long, Int, Int, Int)].collect().toSet
    val typed = Corpus.packChunksTyped(chunks, "doc_id", "chunk_no", "chunk_tokens", 20)
      .select("doc_id", "chunk_no", "chunk_tokens", "bin")
      .as[(Long, Int, Int, Int)].collect().toSet
    assert(typed === hof)
    assert(hof.nonEmpty)
  }

  test("chunkAndPackAtIngest equals the batch chunk -> pack pipeline") {
    // within-row chunk+pack (streaming form, no shuffle) must produce the
    // exact rows of the batch two-step: chunk, re-group, greedy pack —
    // digest included. Lengths cover multi-bin, single-chunk, and empty.
    val docs = Seq(
      (1L, (1 to 95).map(i => s"t$i").mkString(" ")),
      (2L, (1 to 17).map(i => s"w$i").mkString(" ")),
      (3L, "solo"),
      (4L, "")).toDF("doc_id", "text")
    val chunks = Corpus.chunk(docs, "doc_id", "text", chunkTokens = 8, overlapTokens = 2)
    val batch = Corpus.packChunks(chunks, "doc_id", "chunk_no", "chunk_tokens", 20)
      .join(chunks, Seq("doc_id", "chunk_no", "chunk_tokens"))
      .select("doc_id", "chunk_no", "chunk_tokens", "chunk_md5", "bin")
      .as[(Long, Int, Int, String, Int)].collect().toSet
    val ingest = graft.streaming.StreamingCorpus.chunkAndPackAtIngest(
        docs, "doc_id", "text", chunkTokens = 8, overlapTokens = 2, capacity = 20)
      .select("doc_id", "chunk_no", "chunk_tokens", "chunk_md5", "bin")
      .as[(Long, Int, Int, String, Int)].collect().toSet
    assert(ingest === batch)
    assert(ingest.nonEmpty)
    // oversized-chunk regime (chunk window > capacity): every chunk gets
    // its own bin, same as the batch fold
    val over = graft.streaming.StreamingCorpus.chunkAndPackAtIngest(
        docs, "doc_id", "text", chunkTokens = 30, overlapTokens = 0, capacity = 20)
      .select("doc_id", "chunk_no", "chunk_tokens", "bin")
      .as[(Long, Int, Int, Int)].collect()
    assert(over.filter(_._1 == 1L).forall(r => r._2 === r._4),
      "each oversized chunk must occupy its own bin")
  }

  test("sampleMix applies per-stratum rates deterministically") {
    val docs = (1L to 300L).map(i => (i, s"src${i % 3}")).toDF("doc_id", "source")
    val out = Corpus.sampleMix(docs, col("doc_id"), col("source"),
      rates = Map("src0" -> 10, "src1" -> 0), defaultNum = 5, den = 10)
      .select("doc_id", "source").as[(Long, String)].collect()
    val bySrc = out.groupBy(_._2).view.mapValues(_.length).toMap
    assert(bySrc.getOrElse("src0", 0) === 100) // rate 10/10: all kept
    assert(!bySrc.contains("src1"))            // rate 0: none
    val d = bySrc.getOrElse("src2", 0)         // default 5/10: about half
    assert(d > 25 && d < 75, s"expected ~50, got $d")
    // same rows on a rerun — membership is a pure function of the key
    val again = Corpus.sampleMix(docs, col("doc_id"), col("source"),
      rates = Map("src0" -> 10, "src1" -> 0), defaultNum = 5, den = 10)
      .select("doc_id").as[Long].collect().toSet
    assert(again === out.map(_._1).toSet)
  }

  test("capPerStratum keeps best-n per stratum; hash order = exact-N sample") {
    val docs = Seq(
      (1L, "a", 10), (2L, "a", 30), (3L, "a", 20), (4L, "a", 30),
      (5L, "b", 5)).toDF("id", "src", "score")
    // top-2 by score desc: stratum a → ids 2,4 (tie at 30 breaks by id),
    // then 3; stratum b keeps its only row
    val top = Corpus.capPerStratum(docs, Seq("src"), -col("score"), "id", n = 2)
      .select("id").as[Long].collect().toSet
    assert(top === Set(2L, 4L, 5L))
    // full rows survive (semi-join keeps every input column)
    assert(Corpus.capPerStratum(docs, Seq("src"), -col("score"), "id", 2)
      .columns.toSeq === Seq("id", "src", "score"))
    // hash ordering: EXACTLY n rows per stratum (when available),
    // deterministic across partitionings — the exact-N uniform sample
    val many = (1L to 100L).map(i => (i, s"s${i % 4}")).toDF("id", "src")
    val ordHash = graft.operators.Dedup.portableHash64(col("id").cast("string"))
    val s1 = Corpus.capPerStratum(many, Seq("src"), ordHash, "id", 5)
      .select("id").as[Long].collect().toSet
    assert(s1.size === 20)
    val s2 = Corpus.capPerStratum(many.repartition(11), Seq("src"), ordHash, "id", 5)
      .select("id").as[Long].collect().toSet
    assert(s2 === s1, "exact-N sample must not depend on partitioning")
  }

  test("sampleTemperature damps dominant strata toward sqrt weights") {
    // strata: big=900 rows, small=100 → weights ⌊√n⌋ = 30 / 10, targets
    // for budget 200 = ⌊200·30/40⌋=150, ⌊200·10/40⌋=50. Proportional
    // sampling would keep 180/20 — temperature lifts the small stratum's
    // share from 10% to 25%.
    val docs = ((1L to 900L).map(i => (i, "big")) ++
      (1001L to 1100L).map(i => (i, "small"))).toDF("doc_id", "lang")
    val out = Corpus.sampleTemperature(docs, col("doc_id"), col("lang"), budget = 200)
      .select("doc_id", "lang").as[(Long, String)].collect()
    val byLang = out.groupBy(_._2).view.mapValues(_.length).toMap
    // hash-Bernoulli at rate 150/900 and 50/100: expect ≈ targets
    val big = byLang.getOrElse("big", 0)
    val small = byLang.getOrElse("small", 0)
    assert(big > 110 && big < 190, s"expected ~150 of 900, got $big")
    assert(small > 30 && small < 70, s"expected ~50 of 100, got $small")
    // membership is a pure function of (key, histogram): identical rerun,
    // and independent of input partitioning
    val again = Corpus.sampleTemperature(docs.repartition(13), col("doc_id"),
      col("lang"), budget = 200).select("doc_id").as[Long].collect().toSet
    assert(again === out.map(_._1).toSet)
    // a NULL stratum is a real stratum (null-safe join), not silently
    // dropped — 100 null-lang rows get the same isqrt weight as "small"
    val withNull = docs.union(
      (2001L to 2100L).map(i => (i, null.asInstanceOf[String])).toDF("doc_id", "lang"))
    val nullKept = Corpus.sampleTemperature(withNull, col("doc_id"),
        col("lang"), budget = 200)
      .filter(col("lang").isNull).count()
    assert(nullKept > 20 && nullKept < 70,
      s"null stratum must be sampled like any other, got $nullKept")
    // collision and bound guards fail loudly
    intercept[IllegalArgumentException] {
      Corpus.sampleTemperature(docs.withColumn("_tmN", lit(1)),
        col("doc_id"), col("lang"), budget = 10)
    }
    intercept[IllegalArgumentException] {
      Corpus.sampleTemperature(docs, col("doc_id"), col("lang"),
        budget = (1L << 31))
    }
  }

  test("mixEpochs replicates small strata into full epochs plus exact remainder") {
    // big=900, small=100, budget 2000: weights 30/10 (sum 40) → targets
    // t_big = 1500 (1 full epoch + 600/900 fractional), t_small = 500
    // (exactly 5 full epochs, remainder 0)
    val docs = ((1L to 900L).map(i => (i, "big")) ++
      (1001L to 1100L).map(i => (i, "small"))).toDF("doc_id", "lang")
    val out = Corpus.mixEpochs(docs, col("doc_id"), col("lang"), budget = 2000)
      .select("doc_id", "lang", "epoch").as[(Long, String, Long)].collect()
    val small = out.filter(_._2 == "small")
    assert(small.length === 500, "rem 0 ⇒ exactly 5 epochs of every small row")
    assert(small.groupBy(_._1).forall(_._2.map(_._3).sorted.toSeq == Seq(1L, 2L, 3L, 4L, 5L)))
    val bigByDoc = out.filter(_._2 == "big").groupBy(_._1).view.mapValues(_.length)
    assert(bigByDoc.values.forall(c => c == 1 || c == 2),
      "big rows carry 1 full epoch plus at most one fractional")
    val bigTotal = bigByDoc.values.sum
    assert(bigTotal > 1350 && bigTotal < 1650, s"E=1500, got $bigTotal")
    // pure function of (key, histogram): identical under repartition
    val again = Corpus.mixEpochs(docs.repartition(13), col("doc_id"),
        col("lang"), budget = 2000)
      .select("doc_id", "epoch").as[(Long, Long)].collect().toSet
    assert(again === out.map(r => (r._1, r._3)).toSet)
    intercept[IllegalArgumentException] {
      Corpus.mixEpochs(docs.withColumn("epoch", lit(1)), col("doc_id"),
        col("lang"), budget = 10)
    }
  }

  test("exportShards: deterministic shard, dense key-ordered seq, stable under repartition") {
    val df = (1L to 100L).toDF("id")
    val a = Corpus.exportShards(df, col("id"), 8)
      .as[(Long, Long, Int)].collect().toSet
    val b = Corpus.exportShards(df.repartition(7), col("id"), 8)
      .as[(Long, Long, Int)].collect().toSet
    assert(a === b, "sharding must not depend on input partitioning")
    a.groupBy(_._2).foreach { case (shard, rows) =>
      // seq is dense 1..n within the shard, in key order
      assert(rows.toSeq.sortBy(_._1).map(_._3) === (1 to rows.size),
        s"shard $shard seq not dense/key-ordered")
    }
  }

  test("approx thresholds track exact within the t-digest envelope on real data") {
    import graft.queries.Tables.t
    val docs = t(spark, sf, "documents").select(col("source"),
      graft.functions.TextAnalysis.qualityScore(col("text")).as("q"))
    val exact = Corpus.quantileThresholds(docs, Seq("source"), col("q"), 0.5)
      .as[(String, Double)].collect().toMap
    val approx = Corpus.approxQuantileThresholds(docs, Seq("source"), col("q"), 0.5)
      .as[(String, Double)].collect().toMap
    assert(exact.keySet === approx.keySet)
    exact.foreach { case (src, e) =>
      assert(math.abs(approx(src) - e) / math.max(math.abs(e), 1e-9) <= 0.02,
        s"stratum $src: approx ${approx(src)} drifted beyond 2% of exact $e")
    }
  }

  test("percentileGate keeps each stratum's top scores; empty strata = global gate") {
    // scores 1..10 per source: median (quantile_cont 0.5) of 1..10 is 5.5,
    // so exactly 6..10 survive in each stratum
    val rows = for (s <- Seq("a", "b"); i <- 1 to 10)
      yield (s"$s$i", s, i.toDouble)
    val df = rows.toDF("id", "source", "score")
    val gated = Corpus.percentileGate(df, Seq("source"), col("score"), 0.5)
      .select("id").as[String].collect().toSet
    assert(gated === (for (s <- Seq("a", "b"); i <- 6 to 10) yield s"$s$i").toSet)
    // global form: one threshold across strata (same data -> same cut)
    val global = Corpus.percentileGate(df, Nil, col("score"), 0.9)
      .select("id").as[String].collect().toSet
    // p=0.9 over twenty values (1..10 doubled): index 0.9*19 = 17.1
    // interpolates 9 -> 10 as 9.1, so only the 10s survive
    assert(global === Set("a10", "b10"))
  }

  test("streaming contamination gate: stream docs flagged against a static train set") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val train = Seq((10L, "alpha beta gamma epsilon")).toDF("doc_id", "text")
    val trainGrams = Corpus.ngramOccurrences(train, "doc_id", "text", 3)
      .select("g").distinct()
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    // stream-static left-semi join: the static gram set builds once per
    // batch, the stream side stays append-only
    // (production would dedup grams per doc within a watermark first; the
    // fixture has no repeated grams, so the count is already distinct)
    val flagged = Corpus.ngramOccurrences(
        mem.toDF().toDF("doc_id", "text"), "doc_id", "text", 3)
      .join(trainGrams, Seq("g"), "left_semi")
      .groupBy("doc_id").count()
    val q = flagged.writeStream.format("memory").queryName("contam_sink")
      .outputMode("complete").start()
    try {
      mem.addData((1L, "alpha beta gamma delta"), (2L, "zeta eta theta"))
      q.processAllAvailable()
    } finally q.stop()
    val kept = spark.table("contam_sink")
      .select("doc_id", "count").as[(Long, Long)].collect().toMap
    assert(kept === Map(1L -> 1L)) // only "alpha beta gamma" is shared
  }

  test("sampleByHash is deterministic and roughly proportional") {
    val docs = (1L to 1000L).map(i => (i, s"doc$i")).toDF("doc_id", "text")
    val a = Corpus.sampleByHash(docs, col("doc_id"), 1, 5)
      .select("doc_id").as[Long].collect().toSet
    val b = Corpus.sampleByHash(docs, col("doc_id"), 1, 5)
      .select("doc_id").as[Long].collect().toSet
    assert(a === b) // pure function of the key
    assert(a.size > 120 && a.size < 280, s"expected ~200 of 1000, got ${a.size}")
    // monotone: a larger fraction strictly contains the smaller one
    val wider = Corpus.sampleByHash(docs, col("doc_id"), 2, 5)
      .select("doc_id").as[Long].collect().toSet
    assert(a.subsetOf(wider))
  }

  test("samplePps: deterministic, size-biased, certain rows kept; overflow fails loudly") {
    val df = (1L to 200L).map(i => (i, if (i == 1) 100000L else 10L)).toDF("id", "w")
    val s1 = Corpus.samplePps(df, col("id"), col("w"), expected = 20)
    // the heavy row's inclusion probability caps at 1 -> always present,
    // ht_weight exactly 1
    assert(s1.filter(col("id") === 1).select("ht_weight")
      .as[Double].collect().toSeq === Seq(1.0))
    // membership is a pure function of (key, w, W): identical on re-run
    val ids1 = s1.select("id").as[Long].collect().toSet
    val ids2 = Corpus.samplePps(df, col("id"), col("w"), expected = 20)
      .select("id").as[Long].collect().toSet
    assert(ids1 === ids2 && ids1.contains(1L))
    // inverse inclusion probabilities are never < 1
    assert(s1.filter(col("ht_weight") < 1.0).count() === 0)
    // totals anywhere in long range are in the exact-decimal domain: the
    // old 2^20-bucket form would have overflowed here, the 60-bit decimal
    // form must not (and the heavy row stays certain with ht exactly 1)
    val wide = Seq((1L, Long.MaxValue / 4), (2L, Long.MaxValue / 4),
      (3L, 1000L)).toDF("id", "w")
    val wideOut = Corpus.samplePps(wide, col("id"), col("w"), expected = 10)
      .select("id", "ht_weight").as[(Long, Double)].collect().toMap
    assert(wideOut.contains(1L) && wideOut(1L) === 1.0)
    // a total weight past long range must not silently wrap — the decimal
    // sum sees the true total and the scalar guard raises
    val big = Seq((1L, Long.MaxValue / 2), (2L, Long.MaxValue / 2),
      (3L, Long.MaxValue / 2)).toDF("id", "w")
    intercept[Exception] {
      Corpus.samplePps(big, col("id"), col("w"), expected = 10).collect()
    }
  }

  test("samplePps: sub-2^-20 probabilities are not floored (full hash space)") {
    // one light row against a huge total: nominal p = 10*1/2^40 ≈ 2^-36.6,
    // far below the old 2^-20 bucket floor, which would have kept EVERY
    // such row with probability ~2^-20 (oversampled ~10^4x). In the 60-bit
    // space, keeping ~0 of 2000 light rows is overwhelmingly likely, and
    // any kept row's ht_weight must reflect the realized (tiny) p.
    val heavy = Seq((0L, (1L << 40) - 2000L))
    val light = (1L to 2000L).map(i => (i, 1L))
    val df = (heavy ++ light).toDF("id", "w")
    val out = Corpus.samplePps(df, col("id"), col("w"), expected = 10)
      .select("id", "ht_weight").as[(Long, Double)].collect()
    val lightKept = out.filter(_._1 != 0L)
    // E[light kept] = 2000 * 10/2^40 ≈ 1.8e-8 — observing even one would
    // mean the floor bug is back (under the old floor E would be ~2)
    assert(lightKept.isEmpty,
      s"light rows kept despite p≈2^-36.6: ${lightKept.mkString(",")}")
    // the heavy row is near-certain (p ≈ 1 - 2e-9... actually p = 10*w/W
    // > 1 -> certain) and carries ht exactly 1
    val heavyHt = out.filter(_._1 == 0L).map(_._2).toSeq
    assert(heavyHt === Seq(1.0))
  }

  test("assignSplits: deterministic hash-range splits; remainder joins the last") {
    val df = (1L to 2000L).toDF("id")
    val out = Corpus.assignSplits(df, col("id"), Seq(800, 100, 100))
      .select("id", "split").as[(Long, Int)].collect()
    val bySplit = out.groupBy(_._2).view.mapValues(_.length).toMap
    assert(bySplit.keySet === Set(0, 1, 2))
    // hash-proportional: 80/10/10 within sampling noise on 2000 keys
    assert(bySplit(0) > 1450 && bySplit(0) < 1750, s"got $bySplit")
    assert(bySplit(1) > 120 && bySplit(1) < 280)
    // pure function of the key: identical on re-run and under growth —
    // the first 1000 ids keep their split when 1000 more arrive
    val small = Corpus.assignSplits((1L to 1000L).toDF("id"), col("id"),
      Seq(800, 100, 100)).select("id", "split").as[(Long, Int)].collect().toMap
    assert(out.filter(_._1 <= 1000L).forall { case (id, s) => small(id) == s },
      "a document must never migrate between splits when the corpus grows")
    // fractions summing below den: remainder joins the LAST split
    val rem = Corpus.assignSplits(df, col("id"), Seq(100, 100), den = 1000)
      .select("split").as[Int].collect()
    assert(rem.count(_ == 1) > rem.count(_ == 0) * 5,
      "the 800/1000 remainder must fall into split 1")
    intercept[IllegalArgumentException] {
      Corpus.assignSplits(df, col("id"), Seq(900, 200))
    }
  }

  test("splitByComponent: a near-duplicate family never straddles splits") {
    // docs 1,2,3 are one duplicate family (component rep 1); 4,5 another;
    // 6 is a singleton with no component row
    val docs = (1L to 6L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val components = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L))
      .toDF("node", "component")
    val out = Corpus.splitByComponent(docs, "doc_id", components,
        Seq(500, 500))
      .select("doc_id", "split").as[(Long, Int)].collect().toMap
    assert(out.keySet === Set(1L, 2L, 3L, 4L, 5L, 6L))
    assert(Set(out(1L), out(2L), out(3L)).size === 1,
      "family {1,2,3} must land in ONE split")
    assert(Set(out(4L), out(5L)).size === 1,
      "family {4,5} must land in ONE split")
    // the family split equals the plain hash split of its representative
    val repSplit = Corpus.assignSplits(Seq(1L).toDF("k"), col("k"),
      Seq(500, 500)).select("split").as[Int].head()
    assert(out(1L) === repSplit)
  }

  test("dsirWeights: target-like docs upweighted, weights exact integers >= 1") {
    // target corpus speaks about foxes; raw corpus has one fox-like doc,
    // one off-topic doc, one doc shorter than the bigram
    val target = Seq(
      (100L, "the quick brown fox jumps over the lazy dog"),
      (101L, "a brown fox and a quick fox run past the dog"))
      .toDF("doc_id", "text")
    val raw = Seq(
      (1L, "the quick brown fox jumps over the sleepy dog"),
      (2L, "parquet shuffle partitions broadcast join exchange codegen stage"),
      (3L, "tiny"))
      .toDF("doc_id", "text")
    val w = Corpus.dsirWeights(raw, target, "doc_id", "text")
      .select("doc_id", "ds_weight").as[(Long, Long)].collect().toMap
    assert(w.keySet === Set(1L, 2L, 3L))
    assert(w.values.forall(_ >= 1L), "weights are clamped to >= 1")
    assert(w(1L) > w(2L),
      s"the target-like doc must outweigh the off-topic one: $w")
    assert(w(3L) === 1L, "a doc shorter than the n-gram gets the floor weight")
    // deterministic: importance is a pure function of the two corpora
    val again = Corpus.dsirWeights(raw, target, "doc_id", "text")
      .select("doc_id", "ds_weight").as[(Long, Long)].collect().toMap
    assert(again === w)
    // resample composes with the exact-decimal PPS membership: certain
    // rows (e*w >= W) carry ht exactly 1, membership is stable
    val res = Corpus.dsirResample(raw, target, "doc_id", "text", expected = 3)
    assert(res.filter(col("ht_weight") < 1.0).count() === 0)
    val ids = res.select("doc_id").as[Long].collect().toSet
    val ids2 = Corpus.dsirResample(raw, target, "doc_id", "text", expected = 3)
      .select("doc_id").as[Long].collect().toSet
    assert(ids === ids2)
  }

  test("rareTokenStats flags corpus-rare tokens with exact integer counts") {
    // df: a=4 docs, b=3, c=2, zzz=1; rareDen=2 → rare iff df·2 < 4 ⇔ df=1
    val docs = Seq(
      (1L, "a b c"), (2L, "a b"), (3L, "a zzz"), (4L, "a b c"))
      .toDF("doc_id", "text")
    val out = Corpus.rareTokenStats(docs, "doc_id", "text", rareDen = 2)
      .select("doc_id", "n_tokens", "n_rare", "rare_share")
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L) === ((3L, 0L, 0.0)))
    assert(out(2L) === ((2L, 0L, 0.0)))
    assert(out(3L) === ((2L, 1L, 0.5))) // zzz appears in one doc only
    assert(out(4L) === ((3L, 0L, 0.0)))
  }

  test("snapshotDiff classifies added/removed/changed/same") {
    val oldS = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    val newS = Seq((2L, "b"), (3L, "C2"), (4L, "d")).toDF("doc_id", "text")
    val out = Corpus.snapshotDiff(oldS, newS, "doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(out === Map(
      1L -> "removed", 2L -> "same", 3L -> "changed", 4L -> "added"))
    // empty sides: everything added / everything removed
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Corpus.snapshotDiff(empty, newS, "doc_id", "text")
      .filter(col("status") =!= "added").count() === 0)
    assert(Corpus.snapshotDiff(oldS, empty, "doc_id", "text")
      .filter(col("status") =!= "removed").count() === 0)
  }

  test("bigramTypicality: exact smoothed mean bigram probability; short docs NULL") {
    // corpus bigrams: "a b" ×2 (docs 1,2), "b c" ×1 (doc 1), "x y" ×1
    // (doc 3) → N = 4 occurrences, V = 3 distinct, N + V = 7
    val docs = Seq(
      (1L, "a b c"),   // grams: "a b"(c=2), "b c"(c=1) → n=2, Σc=3
      (2L, "a b"),     // "a b"(c=2)                    → n=1, Σc=2
      (3L, "x y"),     // "x y"(c=1)                    → n=1, Σc=1
      (4L, "solo"),    // < 2 tokens → n=0, NULL
      (5L, ""))        // empty → single "" token → n=0, NULL
      .toDF("doc_id", "text")
    val out = Corpus.bigramTypicality(docs, "doc_id", "text")
      .select("doc_id", "n_bigrams", "typicality")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2))))).toMap
    assert(out(1L) === ((2L, Some((3.0 + 2.0) / (2.0 * 7.0)))))
    assert(out(2L) === ((1L, Some((2.0 + 1.0) / (1.0 * 7.0)))))
    assert(out(3L) === ((1L, Some((1.0 + 1.0) / (1.0 * 7.0)))))
    assert(out(4L) === ((0L, None)))
    assert(out(5L) === ((0L, None)))
    // the common-bigram doc ranks above the rare-bigram doc
    assert(out(2L)._2.get > out(3L)._2.get)
  }

  test("scoreBuckets: per-stratum quartile labels, nulls stay null") {
    val df = Seq(
      ("en", 1L, Some(1.0)), ("en", 2L, Some(2.0)), ("en", 3L, Some(3.0)),
      ("en", 4L, Some(4.0)), ("en", 5L, Some(5.0)),
      ("es", 6L, Some(10.0)), ("es", 7L, Some(20.0)), ("es", 8L, None))
      .toDF("lang", "id", "s")
    val out = Corpus.scoreBuckets(df, Seq("lang"), col("s"))
      .select("id", "bucket").as[(Long, Option[String])].collect().toMap
    // en cuts: p25 = 2.0, p75 = 4.0 (linear interpolation over 1..5)
    assert(out(1L) === Some("tail"))
    assert(out(2L) === Some("middle"))
    assert(out(3L) === Some("middle"))
    assert(out(4L) === Some("head"))
    assert(out(5L) === Some("head"))
    // es cuts from the two non-null scores only: p25 = 12.5, p75 = 17.5
    assert(out(6L) === Some("tail"))
    assert(out(7L) === Some("head"))
    // a null score cannot be labeled tail
    assert(out(8L) === None)
    // global (strata-free) form: one broadcast cut pair
    val g = Corpus.scoreBuckets(df, Nil, col("s"))
    assert(g.filter(col("bucket") === "head").count() >= 1)
  }

  test("shuffleShards: a seeded permutation — complete, deterministic, seed-sensitive") {
    val docs = spark.range(1, 201).toDF("doc_id")
    val out = Corpus.shuffleShards(docs, col("doc_id"), seed = 7, numShards = 4)
      .select("doc_id", "shard", "seq").as[(Long, Long, Int)].collect()
    // complete: every doc exactly once
    assert(out.map(_._1).sorted.toSeq === (1L to 200L))
    // seq is contiguous 1..n within each shard (a valid dense order)
    out.groupBy(_._2).foreach { case (shard, rows) =>
      assert(rows.map(_._3).sorted.toSeq === (1 to rows.length),
        s"shard $shard seq not contiguous")
    }
    // deterministic under re-partitioning of the input
    val re = Corpus.shuffleShards(docs.repartition(7), col("doc_id"), 7, 4)
      .select("doc_id", "shard", "seq").as[(Long, Long, Int)].collect()
    assert(re.sortBy(_._1).toSeq === out.sortBy(_._1).toSeq)
    // a different seed yields a different permutation (same rows)
    val other = Corpus.shuffleShards(docs, col("doc_id"), seed = 8, numShards = 4)
      .select("doc_id", "shard", "seq").as[(Long, Long, Int)].collect()
    assert(other.map(_._1).sorted.toSeq === (1L to 200L))
    assert(other.sortBy(_._1).toSeq !== out.sortBy(_._1).toSeq,
      "seed 8 produced the identical permutation as seed 7")
    // and the permutation is not the identity-ish key order: some shard's
    // seq order must disagree with doc_id order
    val disordered = out.groupBy(_._2).exists { case (_, rows) =>
      val byGlobal = rows.sortBy(_._3).map(_._1)
      byGlobal.toSeq !== byGlobal.sorted.toSeq
    }
    assert(disordered, "seeded shuffle left every shard in key order")
  }

  test("packGlobal: offsets are the exact prefix sum of the shuffled stream; boundary docs straddle") {
    val docs = (1L to 50L).map(i => (i, (i % 7) * 3)).toDF("doc_id", "toks")
    val seqLen = 10
    val out = Corpus.packGlobal(docs, col("doc_id"), col("toks"),
        seed = 3, numShards = 4, seqLen = seqLen)
      .select("doc_id", "shard", "seq", "toks", "global_start",
        "first_seq", "last_seq")
      .as[(Long, Long, Int, Long, Long, Long, Long)].collect()
    // global order = (shard, seq); offsets must be the exact running sum
    val ordered = out.sortBy(r => (r._2, r._3))
    var acc = 0L
    ordered.foreach { case (id, _, _, tk, start, first, last) =>
      assert(start === acc, s"doc $id offset $start != running sum $acc")
      assert(first === start / seqLen)
      assert(last === (if (tk == 0) start / seqLen else (start + tk - 1) / seqLen))
      acc += tk
    }
    assert(acc === out.map(_._4).sum)
    // at least one doc crosses a sequence boundary (first_seq < last_seq)
    assert(out.exists(r => r._6 < r._7),
      "test corpus must exercise the boundary-straddling case")
    // zero-token docs sit at their offset with zero span
    assert(out.filter(_._4 == 0).forall(r => r._6 == r._7))
  }

  test("packGlobalSpans: spans repartition every doc; sequences fill to seqLen except the last") {
    val docs = (1L to 40L).map(i => (i, (i % 9) * 4)).toDF("doc_id", "toks")
    val seqLen = 16
    val packed = Corpus.packGlobal(docs, col("doc_id"), col("toks"),
      seed = 11, numShards = 3, seqLen = seqLen)
    val spans = Corpus.packGlobalSpans(packed, col("toks"), seqLen)
      .select("doc_id", "seq_id", "span_start", "span_tokens", "offset_in_seq")
      .as[(Long, Long, Long, Long, Long)].collect()
    val toks = docs.as[(Long, Long)].collect().toMap
    // every positive-token doc is exactly repartitioned by its spans
    spans.groupBy(_._1).foreach { case (id, ss) =>
      val sorted = ss.sortBy(_._2)
      assert(sorted.map(_._4).sum === toks(id), s"doc $id spans lose tokens")
      // spans are contiguous within the doc, starting at 0
      var pos = 0L
      sorted.foreach { sp => assert(sp._3 === pos); pos += sp._4 }
      assert(ss.forall(_._4 > 0), s"doc $id emits an empty span")
    }
    assert(spans.map(_._1).toSet === toks.filter(_._2 > 0).keySet)
    // every sequence except the last is filled to exactly seqLen, and
    // spans tile it from offset 0 without gaps
    val total = toks.values.sum
    val lastSeq = (total - 1) / seqLen
    spans.groupBy(_._2).foreach { case (sid, ss) =>
      val fill = ss.map(_._4).sum
      if (sid < lastSeq) assert(fill === seqLen, s"seq $sid holds $fill tokens")
      else assert(fill === total - lastSeq * seqLen)
      val tiles = ss.sortBy(_._5)
      var pos = 0L
      tiles.foreach { sp => assert(sp._5 === pos, s"seq $sid gap at $pos"); pos += sp._4 }
    }
  }

  test("interleaveBySource: dense per-stratum numbering, weight-ratio mix from the first rows") {
    val docs = ((1L to 90L).map(i => (i, "a")) ++ (91L to 120L).map(i => (i, "b")))
      .toDF("id", "src")
    val out = Corpus.interleaveBySource(docs, "src", col("id"),
        weights = Map("a" -> 3L), defaultWeight = 1L, seed = 1, numShards = 4)
      .select("id", "src", "dense", "ord")
      .as[(Long, String, Long, Long)].collect()
    // dense is exactly 1..n per stratum
    out.groupBy(_._2).foreach { case (srcName, rows) =>
      assert(rows.map(_._3).sorted.toSeq === (1L to rows.length),
        s"stratum $srcName numbering not dense")
    }
    // ord spacing: weight 3 emits every 1 (D/w = 3/3), weight 1 every 3
    out.filter(_._2 == "a").foreach(r => assert(r._4 === r._3 - 1))
    out.filter(_._2 == "b").foreach(r => assert(r._4 === (r._3 - 1) * 3))
    // reading in (ord, src, dense) order, every 20-row prefix holds the
    // 3:1 mix to within rounding — the no-front-loading property
    val ordered = out.sortBy(r => (r._4, r._2, r._3))
    for (n <- Seq(20, 40, 80)) {
      val a = ordered.take(n).count(_._2 == "a")
      assert(math.abs(a - n * 3 / 4) <= 2,
        s"prefix $n carries $a 'a'-rows, want ~${n * 3 / 4}")
    }
    // deterministic under re-partitioning
    val re = Corpus.interleaveBySource(docs.repartition(7), "src", col("id"),
        weights = Map("a" -> 3L), defaultWeight = 1L, seed = 1, numShards = 4)
      .select("id", "src", "dense", "ord")
      .as[(Long, String, Long, Long)].collect()
    assert(re.sortBy(_._1).toSeq === out.sortBy(_._1).toSeq)
  }

  test("collocations: exact Ochiai² ranking, minCount filters one-offs") {
    val docs = Seq("new york new york", "the cat the dog the cat").toDF("text")
    val got = Corpus.collocations(docs, col("text"), k = 5, minCount = 2)
      .as[(String, String, Long, Long, Long, Long)].collect().toSeq
    // (new,york): cnt 2, unigrams 2/2 → ⌊4e6/4⌋ = 1000000 (perfect pair);
    // (the,cat): cnt 2, unigrams 3/2 → ⌊4e6/6⌋ = 666666; all other pairs
    // occur once → dropped by minCount
    assert(got === Seq(("new", "york", 2L, 2L, 2L, 1000000L),
      ("the", "cat", 2L, 3L, 2L, 666666L)))
    // single-token docs produce no pairs and no failure
    assert(Corpus.collocations(Seq("solo").toDF("text"), col("text"), 3, 1)
      .count() === 0)
  }

  test("tokenShift: exact cross-multiplied ranking, other corpora ignored") {
    // a: "x x y" -> cnt(x)=2, cnt(y)=1, totA=3; b: "x z z z" -> cnt(x)=1,
    // cnt(z)=3, totB=4. Gaps |cntA*totB - cntB*totA|: z=9, x=5, y=4.
    val docs = Seq(("a", "x x y"), ("b", "x z z z"), ("c", "noise noise"))
      .toDF("src", "text")
    val top2 = Corpus.tokenShift(docs, col("src"), col("text"), "a", "b", k = 2)
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(top2 === Seq(("z", 0L, 3L, 9.0), ("x", 2L, 1L, 5.0)))
    // k beyond vocab returns everything, ties broken token-ascending
    val all = Corpus.tokenShift(docs, col("src"), col("text"), "a", "b", k = 10)
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(all === Seq(("z", 0L, 3L, 9.0), ("x", 2L, 1L, 5.0), ("y", 1L, 0L, 4.0)))
  }

  test("madOutliers equals the sequential lower-median/MAD gate, even and odd groups, ties") {
    val rnd = new scala.util.Random(41)
    // groups of varied size incl. an even-size group and heavy ties
    val rows = for {
      g <- Seq("a", "b", "c", "d")
      i <- 0 until (3 + rnd.nextInt(8))
    } yield (g + "_" + i, g, if (rnd.nextBoolean()) 10L else rnd.nextInt(1000).toLong)
    def lowerMedian(vs: Seq[Long]): Long = vs.sorted.apply((vs.size + 1) / 2 - 1)
    def model(num: Int, den: Int) = rows.groupBy(_._2).flatMap { case (g, rs) =>
      val med = lowerMedian(rs.map(_._3))
      val mad = lowerMedian(rs.map(r => math.abs(r._3 - med)))
      rs.filter(r => math.abs(r._3 - med) * den > mad * num)
        .map(r => (g, r._1, r._3, med, mad)) // join key leads the output
    }.toSet
    for ((num, den) <- Seq((3, 2), (1, 1), (1000000, 1))) {
      // at huge num only mad = 0 groups still flag (any deviation is
      // infinitely many MADs there — the tie-heavy group exercises it)
      val got = Corpus.madOutliers(rows.toDF("id", "g", "v"), "g", col("v"),
          num, den)
        .as[(String, String, Long, Long, Long)].collect().toSet
      assert(got === model(num, den), s"num=$num den=$den")
    }
  }

  test("freqOfFreq: exact hand counts, tail row keeps true frequencies, totals = corpus") {
    // a: 12× (tail), b: 2×, c: 2×, d e f: 1× each → N1=3, N2=2, tail 1 type/12 tokens
    val docs = Seq(
      (1L, ("a " * 12).trim + " b c d"),
      (2L, "b c e f")).toDF("doc_id", "text")
    val got = Corpus.freqOfFreq(docs, col("text"), maxF = 10)
      .as[(Long, Long, Long)].collect().toSet
    assert(got === Set((1L, 3L, 3L), (2L, 2L, 4L), (11L, 1L, 12L)))
    // n_tokens across rows must total the corpus token count exactly
    assert(got.toSeq.map(_._3).sum === 19L)
    // empty corpus: no rows, not a failure
    assert(Corpus.freqOfFreq(
      Seq.empty[(Long, String)].toDF("doc_id", "text"), col("text")).count() === 0)
  }

  test("packByOrder: exact prefix sums under an explicit order at any bucket count; zero-token docs; empty input") {
    // randomized: positions sparse and shuffled, token counts include 0
    val rnd = new scala.util.Random(11)
    val rows = rnd.shuffle((0 until 257).toList).zipWithIndex.map {
      case (p, i) => (i.toLong, p.toLong * 3 + 1, // sparse unique pos
        if (i % 17 == 0) 0L else rnd.nextInt(500).toLong)
    }
    val df = rows.toDF("doc_id", "pos", "n_tok")
    // sequential model: sort by pos, running exclusive sum
    var acc = 0L
    val expect = rows.sortBy(_._2).map { case (id, _, t) =>
      val start = acc; acc += t
      val first = start / 64
      val last = if (t == 0) first else (start + t - 1) / 64
      id -> ((start, first, last))
    }.toMap
    for (buckets <- Seq(1, 3, 32)) {
      val got = Corpus.packByOrder(df, col("pos"), col("n_tok"),
          seqLen = 64, buckets = buckets)
        .select("doc_id", "global_start", "first_seq", "last_seq")
        .as[(Long, Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      assert(got === expect, s"buckets=$buckets")
    }
    // empty input: empty output, no numbering crash
    assert(Corpus.packByOrder(
      Seq.empty[(Long, Long, Long)].toDF("doc_id", "pos", "n_tok"),
      col("pos"), col("n_tok"), seqLen = 64).count() === 0)
    // negative token counts fail loudly
    val bad = intercept[Exception] {
      Corpus.packByOrder(Seq((1L, 1L, -2L)).toDF("doc_id", "pos", "n_tok"),
        col("pos"), col("n_tok"), seqLen = 64).collect()
    }
    assert(bad.getMessage.contains("non-negative") ||
      Option(bad.getCause).exists(_.getMessage.contains("non-negative")))
  }

  test("sequenceManifest: hand spans; pieces tile every sequence exactly; per-doc lengths re-total") {
    // L = 4; docs in pos order: a(3) [0,3), b(6) [3,9), c(0), d(1) [9,10)
    // seq 0 = a[0..3) + b[0..1); seq 1 = b[1..5); seq 2 = b[5..6) + d
    val df = Seq((10L, 1L, 3L), (11L, 2L, 6L), (12L, 3L, 0L), (13L, 4L, 1L))
      .toDF("doc_id", "pos", "n_tok")
    val packed = Corpus.packByOrder(df, col("pos"), col("n_tok"), seqLen = 4)
    val got = Corpus.sequenceManifest(packed, col("n_tok"), seqLen = 4)
      .select("doc_id", "seq_id", "doc_off", "seq_off", "len")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(got === Set(
      (10L, 0L, 0L, 0L, 3L), (11L, 0L, 0L, 3L, 1L),
      (11L, 1L, 1L, 0L, 4L),
      (11L, 2L, 5L, 0L, 1L), (13L, 2L, 0L, 1L, 1L)),
      "zero-token doc 12 must be absent; spans must match the hand tiling")

    // randomized tiling invariants at a bigger scale: every sequence's
    // pieces cover [0, L) exactly once (the last up to the total), and
    // each doc's piece lengths re-total its token count
    val rnd2 = new scala.util.Random(7)
    val rows2 = (0 until 300).map(i =>
      (i.toLong, i.toLong, if (i % 13 == 0) 0L else rnd2.nextInt(150).toLong))
    val m = Corpus.sequenceManifest(
        Corpus.packByOrder(rows2.toDF("doc_id", "pos", "n_tok"),
          col("pos"), col("n_tok"), seqLen = 64),
        col("n_tok"), seqLen = 64)
      .select("doc_id", "seq_id", "seq_off", "len")
      .as[(Long, Long, Long, Long)].collect()
    val total = rows2.map(_._3).sum
    m.groupBy(_._2).foreach { case (seq, pieces) =>
      val want = math.min(64L, total - seq * 64)
      val sorted = pieces.sortBy(_._3)
      assert(sorted.map(_._4).sum === want, s"seq $seq must tile $want tokens")
      // contiguous, non-overlapping: offsets chain exactly
      sorted.foldLeft(0L) { (off, p) =>
        assert(p._3 === off, s"seq $seq has a gap/overlap at ${p._3}"); off + p._4
      }
    }
    val perDoc = m.groupBy(_._1).view.mapValues(_.map(_._4).sum).toMap
    rows2.filter(_._3 > 0).foreach { case (id, _, t) =>
      assert(perDoc(id) === t, s"doc $id pieces must re-total $t") }
    assert(!perDoc.keySet.exists(id => rows2.exists(r => r._1 == id && r._3 == 0L)))
  }
}
