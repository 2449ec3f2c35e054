package graft

import org.apache.spark.sql.functions._

import graft.queries.Tables.t

/** The approximate scale paths named in SCALING.md, pinned against their
  * exact twins on real testdata: HLL distinct counts and t-digest
  * percentiles are what replace exact distinct / sort-based percentile at
  * 100 TB, so their error envelope is part of the engine's contract.
  */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  test("capped_collect: exact at the cap, NULL past it, merge-bounded") {
    // keys: k0 holds exactly cap values, k1 cap+1 (overflow), k2 one —
    // spread over 16 partitions so partial buffers MUST merge
    val cap = 5
    val rows = (0 until cap).map(i => ("k0", i.toLong)) ++
      (0 to cap).map(i => ("k1", 100L + i)) ++ Seq(("k2", 7L))
    val got = rows.toDF("k", "v").repartition(16)
      .groupBy("k")
      .agg(call_function("capped_collect", col("v"), lit(cap)).as("docs"))
      .collect().map(r => r.getString(0) -> Option(r.getSeq[Long](1)))
      .toMap
    assert(got("k0") === Some(Seq(0L, 1L, 2L, 3L, 4L)))   // full + sorted
    assert(got("k1") === None)                             // df > cap → NULL
    assert(got("k2") === Some(Seq(7L)))
    // the hot-key bound: a 10k-value key under cap=3 still aggregates
    // (bounded buffers through every merge) and lands NULL
    val hot = (0 until 10000).map(i => ("hot", i.toLong)).toDF("k", "v")
      .repartition(32)
      .groupBy("k").agg(call_function("capped_collect", col("v"), lit(3)).as("d"))
      .collect()
    assert(hot.length === 1 && hot.head.isNullAt(1))
  }

  test("approx_count_distinct within its rsd envelope of the exact count") {
    val events = t(spark, sf, "events")
    val exact = events.select(countDistinct("user_id")).as[Long].head()
    val approx = events.select(approx_count_distinct("user_id", rsd = 0.05))
      .as[Long].head()
    assert(math.abs(approx - exact).toDouble / exact <= 0.15,
      s"approx=$approx exact=$exact drifted beyond 3x rsd")
  }

  test("HLL sketch artifacts: merge-of-parts equals sketch-of-whole, estimate in envelope") {
    import graft.functions.Sketches
    val events = t(spark, sf, "events")
    val exact = events.select(countDistinct("user_id")).as[Long].head()
    // per-day artifacts (the incremental form: build once per partition)
    val daily = Sketches.distinctSketches(
      events.withColumn("day", (col("ts") / lit(86400L * 1000 * 1000 * 1000)).cast("long")),
      Seq("day"), col("user_id"))
    assert(daily.schema("hll").dataType.typeName === "binary")
    // rollup by merging kilobyte sketches, no rescan of events
    val merged = daily.transform(d => Sketches.mergeSketches(d, Nil))
      .select(Sketches.estimate(col("hll"))).as[Long].head()
    // one-shot sketch over the whole table
    val whole = Sketches.distinctSketches(events, Nil, col("user_id"))
      .select(Sketches.estimate(col("hll"))).as[Long].head()
    assert(merged === whole,
      s"merging per-day sketches must equal sketching the whole: $merged vs $whole")
    assert(math.abs(merged - exact).toDouble / exact <= 0.05,
      s"estimate $merged drifted beyond the HLL envelope of exact $exact")
  }

  test("CMS artifacts: merge-of-parts equals sketch-of-whole, estimate bounded below and above") {
    import graft.functions.Sketches
    val (depth, width) = (4, 512)
    val toks = t(spark, sf, "documents")
      .select(col("doc_id"), explode(split(lower(col("text")), "\\s+")).as("token"))
    val n = toks.count()
    // merge of per-shard sketches == sketch of the whole corpus (cell-wise)
    val whole = Sketches.cmsBuild(toks, col("token"), depth, width)
    val parts = Seq(0, 1).map(p =>
      Sketches.cmsBuild(toks.filter(pmod(col("doc_id"), lit(2)) === p), col("token"), depth, width))
    val merged = Sketches.cmsMerge(parts.reduce(_ unionByName _))
    assert(merged.exceptAll(whole).isEmpty && whole.exceptAll(merged).isEmpty,
      "merged per-shard CMS must equal the whole-corpus CMS cell-for-cell")
    // linearity: weighted build from a per-item count table == raw build
    val viaCounts = Sketches.cmsBuild(
      toks.groupBy("token").agg(count(lit(1)).as("c")),
      col("token"), depth, width, weight = col("c"))
    assert(viaCounts.exceptAll(whole).isEmpty && whole.exceptAll(viaCounts).isEmpty,
      "weighted (pre-aggregated) CMS build must equal the raw-occurrence build")
    // point estimates: never below exact (collisions only add), and within
    // the CMS envelope exact + eN at e = e(uler)/width ~ 0.0053, delta 2^-4
    val exact = toks.groupBy("token").agg(count(lit(1)).as("exact"))
    val est = Sketches.cmsEstimate(whole, exact, col("token"), depth, width)
    val joined = exact.join(est, col("token") === col("item"))
      .select(col("token"), col("exact"), col("est")).as[(String, Long, Long)].collect()
    assert(joined.nonEmpty)
    joined.foreach { case (tk, ex, es) =>
      assert(es >= ex, s"CMS estimate $es below exact $ex for '$tk' — impossible")
    }
    val eps = math.E / width
    val overBudget = joined.count { case (_, ex, es) => es > ex + eps * n }
    assert(overBudget.toDouble / joined.length <= 0.10,
      s"$overBudget/${joined.length} tokens exceed the exact + eN envelope (delta should be ~6%)")
  }

  test("bloom artifacts: no false negatives, FPR in envelope, union == whole") {
    val toks = t(spark, sf, "documents")
      .select(col("source"), explode(split(lower(col("text")), "\\s+")).as("tok"))
    val (m, k) = (1 << 14, 4)
    val whole = toks.select("tok").distinct()
      .agg(expr(s"bloom_agg(tok, $m, $k)").as("bf"))
      .as[Array[Byte]].head()
    assert(whole.length === 8 + m / 8, "blob = header + bitset")

    // no false negatives: every inserted item answers true
    val inserted = toks.select("tok").distinct()
      .withColumn("hit", call_function("bloom_contains", lit(whole), col("tok")))
    assert(inserted.filter(!col("hit")).isEmpty,
      "bloom returned false for an inserted item — false negatives are impossible by construction")

    // false positives: deterministic, and within ~2x the analytic rate
    val nIns = inserted.count()
    val probes = inserted.select(concat(col("tok"), lit("_absent_probe")).as("p"))
    val fp = probes
      .filter(call_function("bloom_contains", lit(whole), col("p"))).count()
    val pFp = math.pow(1.0 - math.exp(-k.toDouble * nIns / m), k)
    assert(fp.toDouble / nIns <= math.max(2 * pFp, 0.01),
      s"fp rate ${fp.toDouble / nIns} exceeds 2x analytic $pFp (n=$nIns, m=$m, k=$k)")

    // union of per-source blooms is bit-identical to the whole-corpus bloom
    // (dup tokens across sources set the same bits — idempotent OR)
    val perSource = toks.distinct()
      .groupBy("source").agg(expr(s"bloom_agg(tok, $m, $k)").as("bf"))
    val unioned = perSource.agg(expr("bloom_union_agg(bf)").as("bf"))
      .as[Array[Byte]].head()
    assert(java.util.Arrays.equals(unioned, whole),
      "union of per-source bloom blobs must equal the whole-corpus blob")

    // geometry mismatches fail loudly, not silently
    val other = toks.select("tok").distinct()
      .agg(expr(s"bloom_agg(tok, ${m * 2}, $k)").as("bf"))
    intercept[Exception] {
      perSource.select("bf").union(other)
        .agg(expr("bloom_union_agg(bf)")).collect()
    }
  }

  test("bloom contamination: superset of exact contamination, streaming twin equal") {
    import graft.operators.Corpus
    import graft.streaming.StreamingQuality
    val docs = t(spark, sf, "documents")
    val test = docs.filter(col("source") === "src0")
    val train = docs.filter(col("source") =!= "src0")
    // exact per-TRAIN-doc overlap with the test grams (the decontamination
    // direction bloomContamination reports): contamination counts grams of
    // its FIRST argument, so the train corpus goes first here
    val exact = Corpus.contamination(train, test, "doc_id", "text", n = 8)
      .as[(Long, Long)].collect().toMap
    val bloomed = Corpus.bloomContamination(
      test, train, "doc_id", "text", n = 8, numBits = 1 << 18, k = 4)
      .as[(Long, Long)].collect().toMap
    // one-sided: every truly-shared gram is flagged, counts never lower
    exact.foreach { case (id, nShared) =>
      assert(bloomed.getOrElse(id, 0L) >= nShared,
        s"doc $id: bloom flagged ${bloomed.get(id)} < exact $nShared — a false negative")
    }
    // the stateless ingest form computes the identical counts per doc
    val blob = StreamingQuality.bloomArtifact(
      test, "doc_id", "text", n = 8, numBits = 1 << 18, k = 4)
    val atIngest = StreamingQuality.bloomDecontaminateAtIngest(
        train, "text", blob, n = 8)
      .filter(col("n_flagged") > 0)
      .select(col("doc_id"), col("n_flagged")).as[(Long, Long)].collect().toMap
    assert(atIngest === bloomed,
      "ingest-form bloom counts must equal the batch operator's")
  }

  test("approx_percentile brackets the exact percentile") {
    val li = t(spark, sf, "lineitem")
    val exact = li.select(percentile(col("l_extendedprice"), lit(0.5)))
      .as[Double].head()
    val approx = li.select(
      approx_percentile(col("l_extendedprice"), lit(0.5), lit(1000)))
      .as[Double].head()
    // t-digest with accuracy 1000 lands within a tight relative band
    assert(math.abs(approx - exact) / exact <= 0.02,
      s"approx=$approx exact=$exact")
  }

  test("portable HLL: registers match a reference computation, merge == whole, estimate in envelope") {
    import graft.functions.Sketches
    val p = 8
    val events = t(spark, sf, "events")
    val exact = events.select(countDistinct("event_id")).as[Long].head()
    val regs = Sketches.hllRegisters(events, col("event_id").cast("string"), p)
    // reference registers recomputed in plain Scala from the same md5 hash
    val users = events.select(col("event_id").cast("string")).distinct()
      .as[String].collect()
    val expected = users.map { u =>
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(u.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val h = java.lang.Long.parseLong(md.take(15), 16)
      val width = 60 - p
      val rest = h & ((1L << width) - 1)
      val rho = if (rest == 0) width + 1
        else java.lang.Long.numberOfLeadingZeros(rest) - (64 - width) + 1
      (h >>> width, rho)
    }.groupBy(_._1).map { case (b, rs) => (b, rs.map(_._2).max) }
    val got = regs.as[(Long, Int)].collect().toMap
    assert(got === expected,
      s"register table diverged from the reference computation")
    // merge of per-half artifacts == whole-corpus registers
    val parts = Seq(0, 1).map(h => Sketches.hllRegisters(
      events.filter(pmod(col("event_id"), lit(2)) === h),
      col("event_id").cast("string"), p))
    val merged = Sketches.hllMergeRegisters(parts.reduce(_ unionByName _))
    assert(merged.exceptAll(regs).isEmpty && regs.exceptAll(merged).isEmpty,
      "merged per-half registers must equal the whole-corpus registers")
    // raw estimate inside the HLL envelope (~1.04/sqrt(m) = 6.5% at p=8;
    // allow 3x) of the exact count — event_id cardinality (1k/10k) sits
    // above the 5m/2 small-range boundary where the raw estimator is valid
    val est = Sketches.hllEstimate(regs, p).select("est").as[Double].head()
    assert(math.abs(est - exact) / exact <= 3 * 1.04 / math.sqrt(1 << p),
      s"estimate $est drifted beyond the envelope of exact $exact")
    // strata form: per-type registers, rolled up, equal the whole
    val byType = Sketches.hllRegisters(
      events, col("event_id").cast("string"), p, strata = Seq("event_type"))
    val rolled = Sketches.hllMergeRegisters(byType.drop("event_type"))
    assert(rolled.exceptAll(regs).isEmpty && regs.exceptAll(rolled).isEmpty,
      "per-stratum registers rolled up must equal the whole-corpus registers")
    // small-range regime: v (untouched registers) is returned exactly so a
    // caller applies linear counting m·ln(m/v) — on the 15-user column the
    // corrected estimate is near-exact while the raw one is far off
    val uexact = events.select(countDistinct("user_id")).as[Long].head()
    val urow = Sketches.hllEstimate(
      Sketches.hllRegisters(events, col("user_id").cast("string"), p), p)
      .select("m", "v").as[(Int, Long)].head()
    val lc = urow._1 * math.log(urow._1.toDouble / urow._2)
    assert(math.abs(lc - uexact) / uexact <= 0.1,
      s"linear-counting estimate $lc drifted from exact $uexact")
  }

  test("nlz64 register path is bit-identical to the oracle-portable string path") {
    import graft.functions.Sketches
    val events = t(spark, sf, "events")
    for (p <- Seq(8, 12)) {
      val str = Sketches.hllRegisters(events, col("event_id").cast("string"), p)
      val nat = Sketches.hllRegistersNative(events, col("event_id").cast("string"), p)
      assert(nat.exceptAll(str).isEmpty && str.exceptAll(nat).isEmpty,
        s"p=$p: native nlz64 registers diverge from the string-pipeline registers")
    }
    // the expression itself on edge values
    val edge = Seq(1L, 2L, Long.MaxValue, -1L).toDF("x")
      .selectExpr("nlz64(x)").as[Int].collect().toSeq
    assert(edge === Seq(63, 62, 1, 0))
  }

  test("histogram artifact: threshold brackets the order statistic, merge == whole, edges clamp") {
    import graft.functions.Sketches
    val (lo, width, buckets) = (0L, 8L, 128)
    val docs = t(spark, sf, "documents")
    val hist = Sketches.histogramFixed(
      docs, col("n_chars"), lo, width, buckets, strata = Seq("lang"))
    val thr = Sketches.histogramThreshold(
        hist, pNum = 1, pDen = 2, lo = lo, width = width, strata = Seq("lang"))
      .select("lang", "n", "thr").as[(String, Long, Long)].collect()
    // the ceil(n/2)-th smallest value must lie in [thr, thr + width)
    val byLang = docs.select("lang", "n_chars").as[(String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    thr.foreach { case (lang, n, t0) =>
      val vals = byLang(lang)
      assert(n === vals.length)
      val kth = vals(((n + 1) / 2 - 1).toInt)
      assert(t0 <= kth && kth < t0 + width,
        s"$lang: median $kth outside threshold bucket [$t0, ${t0 + width})")
    }
    // merge of per-half artifacts == whole-corpus histogram (cell sum)
    val parts = Seq(0, 1).map(h => Sketches.histogramFixed(
      docs.filter(pmod(col("doc_id"), lit(2)) === h),
      col("n_chars"), lo, width, buckets, strata = Seq("lang")))
    val merged = Sketches.histogramMerge(
      parts.reduce(_ unionByName _), strata = Seq("lang"))
    val whole = hist.select(col("lang"), col("bucket"), col("cnt").cast("long"))
    val m2 = merged.select(col("lang"), col("bucket"), col("cnt").cast("long"))
    assert(m2.exceptAll(whole).isEmpty && whole.exceptAll(m2).isEmpty,
      "merged per-half histograms must equal the whole-corpus histogram")
    // out-of-bounds values clamp into the edge buckets
    val edge = Sketches.histogramFixed(
      Seq(-5L, 0L, 1023L, 5000L).toDF("v"), col("v"), lo, width, buckets)
      .as[(Long, Long)].collect().toMap
    assert(edge(0L) === 2L, "below-lo values must land in bucket 0")
    assert(edge((buckets - 1).toLong) === 2L,
      "above-hi values must land in the last bucket")
    // 65-bit tails: extreme outliers against an opposite-sign bound must
    // clamp to the CORRECT edge (plain BIGINT differences overflow and
    // used to flip Long.MaxValue into bucket 0)
    val wild = Sketches.histogramFixed(
      Seq(Long.MaxValue, Long.MinValue, 3L).toDF("v"), col("v"),
      lo = -100L, width = 10L, buckets = 16)
      .as[(Long, Long)].collect().toMap
    assert(wild(15L) === 1L, "Long.MaxValue belongs in the top bucket")
    assert(wild(0L) === 1L, "Long.MinValue belongs in bucket 0")
    assert(wild(10L) === 1L, "(3 - -100) div 10 = 10")
  }

  test("KMV sketch: merge == whole, estimator in envelope, short sketch exact") {
    import graft.functions.Sketches
    val k = 64
    val events = t(spark, sf, "events")
      .select(col("event_type"), col("user_id").cast("string").as("u"))
    // merge of per-type sketches must equal the sketch of the whole table
    // element-for-element (bottom-k of a union == bottom-k of merged
    // bottom-k's — the mergeability property)
    val perType = Sketches.kmvBuild(events, Seq("event_type"), col("u"), k)
    val merged = Sketches.kmvMerge(perType, Nil, k)
      .select(col("kmv")).as[Seq[Long]].head()
    val whole = Sketches.kmvBuild(events, Nil, col("u"), k)
      .select(col("kmv")).as[Seq[Long]].head()
    assert(merged === whole, "merged per-type KMV must equal whole-table KMV")
    assert(whole === whole.sorted && whole.distinct === whole,
      "sketch must be ascending distinct hashes")
    // estimator envelope: rel error of (k-1)/U_(k) is ~1/sqrt(k-2);
    // 5 sigma at k=64 is ~0.64 — generous but catches a broken estimator
    val exact = events.select(countDistinct("u")).as[Long].head()
    val est = Sketches.kmvBuild(events, Nil, col("u"), k)
      .select(Sketches.kmvEstimate(col("kmv"), k)).as[Double].head()
    assert(math.abs(est - exact) / exact <= 5.0 / math.sqrt(k - 2.0),
      s"KMV estimate $est drifted beyond envelope of exact $exact")
    // a sketch bigger than the distinct count is the exact count
    val estBig = Sketches.kmvBuild(events, Nil, col("u"), 100000)
      .select(Sketches.kmvEstimate(col("kmv"), 100000)).as[Double].head()
    assert(estBig === exact.toDouble, "short sketch must be the exact count")
  }

  test("F2 estimate: exact on extreme distributions, envelope on real keys") {
    import graft.functions.Sketches
    // all-same key: every lane sum = ±n, square exactly n² = F2
    val same = Seq.fill(500)("k").toDF("k")
    val s1 = Sketches.f2Estimate(same, col("k"), lanes = 9)
      .select("est_f2").as[Double].head()
    assert(s1 === 250000.0, s"single-key F2 must be exact, got $s1")
    // real key column: median-of-9 estimate within 5x of exact (loose —
    // lanes trade variance for size; the artifact exposes both values)
    val ev = t(spark, sf, "events").select("user_id")
    val exact = ev.groupBy("user_id").count()
      .agg(sum(col("count") * col("count"))).as[Long].head()
    val est = Sketches.f2Estimate(ev, col("user_id"), lanes = 9)
      .select("est_f2").as[Double].head()
    assert(est > exact / 5.0 && est < exact * 5.0,
      s"F2 estimate $est implausible vs exact $exact")
    // even lane count rejected (median would interpolate)
    val e = intercept[IllegalArgumentException] {
      Sketches.f2Estimate(ev, col("user_id"), lanes = 8)
    }
    assert(e.getMessage.contains("odd"))
  }

  test("KMV set estimates: identity, disjointness, and envelope vs exact truth") {
    import graft.functions.Sketches
    val k = 128
    val docs = t(spark, sf, "documents")
    val sh = docs.select(col("source"),
      explode(graft.operators.Dedup.shingles(col("text"), 3)).as("sh"))
    val m = Sketches.kmvOverlapMatrix(sh, "source", col("sh"), k)
    // self-consistency on one pair: estimates positive, union >= each of
    // intersect/anotb, jaccard = inter/union counts in [0, 1]
    val rows = m.select("stratum_a", "stratum_b", "est_intersect", "est_union",
        "est_anotb", "jaccard")
      .as[(String, String, Double, Double, Double, Double)].collect()
    assert(rows.length === 190, "20 sources -> 190 unordered pairs")
    rows.foreach { case (a, b, i, u, d, j) =>
      assert(u >= i - 1e-9 && u >= d - 1e-9 && j >= 0.0 && j <= 1.0,
        s"($a,$b): inconsistent set estimates i=$i u=$u d=$d j=$j")
    }
    // envelope vs exact truth for the first pair (exact sets are cheap at
    // test scale): theta-sketch rel error wrt the UNION size is ~1/sqrt(k)
    val (sa, sb) = (rows.head._1, rows.head._2)
    def set(src: String) = sh.filter(col("source") === src)
      .select("sh").distinct().as[String].collect().toSet
    val (ea, eb) = (set(sa), set(sb))
    val exactU = (ea union eb).size.toDouble
    val exactI = (ea intersect eb).size.toDouble
    val tol = 5.0 * exactU / math.sqrt(k.toDouble)
    assert(math.abs(rows.head._3 - exactI) <= tol,
      s"($sa,$sb) intersect est ${rows.head._3} vs exact $exactI beyond $tol")
    assert(math.abs(rows.head._4 - exactU) <= tol,
      s"($sa,$sb) union est ${rows.head._4} vs exact $exactU beyond $tol")
    // directed containments: in [0,1], and i/an · an = i/bn · bn (both
    // numerators are the same retained intersection)
    val cont = m.select("jaccard", "containment_a", "containment_b")
      .as[(Double, Double, Double)].collect()
    cont.foreach { case (j, ca, cb) =>
      assert(ca >= 0.0 && ca <= 1.0 && cb >= 0.0 && cb <= 1.0,
        s"containment out of range: $ca / $cb")
      assert(j <= ca + 1e-12 && j <= cb + 1e-12,
        s"jaccard $j must lower-bound both containments $ca / $cb")
    }
    // identical inputs: intersection estimate == distinct estimate, jaccard 1
    val dup = sh.withColumn("source", lit("x"))
      .unionByName(sh.withColumn("source", lit("y")))
    val self = Sketches.kmvOverlapMatrix(dup, "source", col("sh"), k)
      .select("est_a", "est_intersect", "est_anotb", "jaccard",
        "containment_a", "containment_b")
      .as[(Double, Double, Double, Double, Double, Double)].head()
    assert(self._1 === self._2 && self._3 === 0.0 && self._4 === 1.0,
      s"identical corpora must intersect fully: $self")
    assert(self._5 === 1.0 && self._6 === 1.0,
      s"identical corpora must contain each other fully: $self")
  }
}
