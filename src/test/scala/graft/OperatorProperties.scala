package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.operators.{Dedup, Similarity, Skew, Temporal}
import graft.state.Upserts

/** Randomized equivalence properties: the engine operators against
  * straight-line Scala reimplementations of their semantics, over
  * generated inputs. Few cases (each drives real Spark jobs), wide input
  * shapes (duplicate-heavy vocab, tiny and medium corpora).
  */
object OperatorProperties extends Properties("graft.operators") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5).withWorkers(1)

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val vocab = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta")
  private val docGen: Gen[List[(Long, String)]] = for {
    n <- Gen.choose(2, 8)
    texts <- Gen.listOfN(n, Gen.choose(3, 9).flatMap(len =>
      Gen.listOfN(len, Gen.oneOf(vocab)).map(_.mkString(" "))))
  } yield texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }

  private def jaccardShingles(t: String, n: Int): Set[String] = {
    val toks = t.toLowerCase.split("\\s+").toSeq
    if (toks.size < n) Set(toks.mkString(" "))
    else toks.sliding(n).map(_.mkString(" ")).toSet
  }

  property("nearDupPairs == brute-force shingle Jaccard") = forAll(docGen) { docs =>
    val df = docs.toDF("doc_id", "text")
    // r = 128/64 = 2 lanes per band: the J >= 0.5 gate needs narrow bands —
    // P[miss | J=0.5] = (1 - 0.5^r)^bands is ~0.13 at the production 32x4
    // layout (tuned for J >= 0.8, where it is 4.6e-8) but 1e-8 at 64x2.
    // Band count tracks the gate; this is the dial, not a fudge.
    val got = Dedup.nearDupPairs(df, "doc_id", "text", shingleN = 2, minNum = 1, minDen = 2,
        numHashes = 128, bands = 64)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val expected = (for {
      (a, ta) <- docs
      (b, tb) <- docs if a < b
      sa = jaccardShingles(ta, 2)
      sb = jaccardShingles(tb, 2)
      if 2 * (sa & sb).size >= (sa | sb).size
    } yield (a, b)).toSet
    got == expected
  }

  property("simHashPairs (sound banding) == brute-force hamming pairs") =
    forAll(docGen, Gen.oneOf((3, 4), (7, 8), (1, 2))) { case (docs, (maxH, bands)) =>
      val df = docs.toDF("doc_id", "text")
      val toks = Dedup.tokenSet(col("text"))
      val sigs = Dedup.simHashAgg(df, "doc_id", toks)
        .as[(Long, Long)].collect()
      val expected = (for {
        (a, sa) <- sigs; (b, sb) <- sigs if a < b
        h = java.lang.Long.bitCount(sa ^ sb) if h <= maxH
      } yield (a, b, h)).toSet
      val got = Dedup.simHashPairs(df, "doc_id", toks, maxH, bands)
        .as[(Long, Long, Int)].collect().toSet
      got == expected
    }

  property("funnel stepwise min-after-join == sequential per-user replay") = {
    val eventsGen: Gen[List[(Long, String, Long)]] = for {
      n <- Gen.choose(0, 40)
      rows <- Gen.listOfN(n, for {
        u <- Gen.choose(1L, 5L)
        t <- Gen.oneOf("view", "click", "purchase", "error")
        ms <- Gen.choose(0L, 50L) // small range: same-ms ties are common
      } yield (u, t, ms))
    } yield rows
    forAll(eventsGen) { rows =>
      val got = Temporal.funnel(rows.toDF("user_id", "event_type", "ms"),
          "user_id", "event_type", col("ms"), Seq("view", "click", "purchase"))
        .as[(Long, Long, Long, Long)].collect().toSet
      val expected = rows.groupBy(_._1).flatMap { case (u, es) =>
        def firstAfter(step: String, after: Long): Option[Long] = {
          val c = es.collect { case (_, t, ms) if t == step && ms > after => ms }
          if (c.isEmpty) None else Some(c.min)
        }
        for {
          tA <- firstAfter("view", Long.MinValue)
          tB <- firstAfter("click", tA)
          tC <- firstAfter("purchase", tB)
        } yield (u, tA, tB, tC)
      }.toSet
      got == expected
    }
  }

  property("funnelWindowed == sequential replay with conversion window; covers every entrant") = {
    val eventsGen: Gen[List[(Long, String, Long)]] = for {
      n <- Gen.choose(0, 40)
      rows <- Gen.listOfN(n, for {
        u <- Gen.choose(1L, 5L)
        t <- Gen.oneOf("view", "click", "purchase", "error")
        ms <- Gen.choose(0L, 50L)
      } yield (u, t, ms))
    } yield rows
    forAll(eventsGen, Gen.choose(1L, 30L)) { (rows, w) =>
      val got = Temporal.funnelWindowed(rows.toDF("user_id", "event_type", "ms"),
          "user_id", "event_type", col("ms"),
          Seq("view", "click", "purchase"), window = w)
        .as[(Long, Int, Long, Long)].collect().toSet
      val expected = rows.groupBy(_._1).flatMap { case (u, es) =>
        def firstIn(step: String, after: Long, deadline: Long): Option[Long] = {
          val c = es.collect {
            case (_, t, ms) if t == step && ms > after && ms <= deadline => ms
          }
          if (c.isEmpty) None else Some(c.min)
        }
        val entered = es.collect { case (_, "view", ms) => ms }
        if (entered.isEmpty) None
        else {
          val t1 = entered.min
          val t2 = firstIn("click", t1, t1 + w)
          val t3 = t2.flatMap(x => firstIn("purchase", x, t1 + w))
          val done = 1 + t2.size + t3.size
          Some((u, done, t1, t3.orElse(t2).getOrElse(t1)))
        }
      }.toSet
      got == expected
    }
  }

  property("resolveComponentsIncremental over any edge split == full-batch components") = {
    val gen: Gen[(List[(Long, Long)], Int)] = for {
      n <- Gen.choose(0, 25)
      edges <- Gen.listOfN(n, for {
        a <- Gen.choose(1L, 12L); b <- Gen.choose(1L, 12L)
      } yield (a, b))
      split <- Gen.choose(0, n)
    } yield (edges, split)
    forAll(gen) { case (edges, split) =>
      val full = Dedup.resolveComponentsStar(
          edges.toDF("a", "b"), "a", "b")
        .as[(Long, Long)].collect().toSet
      val (old, fresh) = edges.splitAt(split)
      val standing = Dedup.resolveComponentsStar(old.toDF("a", "b"), "a", "b")
      val inc = Dedup.resolveComponentsIncremental(
          standing, fresh.toDF("a", "b"), "a", "b")
        .as[(Long, Long)].collect().toSet
      // the incremental universe keeps every historical node (incl. ones
      // whose partners were self-loops); compare on the full path's nodes
      // plus check incremental's extras are self-labeled singletons
      val fullNodes = full.map(_._1)
      inc.filter(p => fullNodes(p._1)) == full &&
        inc.filterNot(p => fullNodes(p._1)).forall(p => p._1 == p._2)
    }
  }

  property("retentionCohorts == sequential cohort replay on random activity") = {
    val gen: Gen[List[(Long, Long)]] = for {
      n <- Gen.choose(0, 60)
      rows <- Gen.listOfN(n, for {
        u <- Gen.choose(1L, 6L)
        ts <- Gen.choose(0L, 99L) // period 10 → offsets 0..9
      } yield (u, ts))
    } yield rows
    forAll(gen) { rows =>
      val got = Temporal.retentionCohorts(rows.toDF("user_id", "ts"),
          "user_id", col("ts"), period = 10L)
        .as[(Long, Long, Long)].collect().toSet
      val periods = rows.map { case (u, ts) => (u, ts / 10) }.distinct
      val cohort = periods.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
      val expected = periods.groupBy { case (u, p) => (cohort(u), p - cohort(u)) }
        .map { case ((c, o), us) => (c, o, us.size.toLong) }.toSet
      got == expected
    }
  }

  property("CMS on random streams: est >= exact under forced collisions; halves merge to whole") =
    forAll(Gen.listOf(Gen.oneOf(vocab))) { toks =>
      import graft.functions.Sketches
      // width 16 << vocab x lanes: collisions are the norm, so the floor
      // property is exercised, not vacuous
      val (depth, width) = (3, 16)
      val df = toks.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "tok")
      val whole = Sketches.cmsBuild(df, col("tok"), depth, width)
      val est = Sketches.cmsEstimate(whole, vocab.toDF("tok"), col("tok"),
          depth, width)
        .as[(String, Long)].collect().toMap
      val exact = toks.groupBy(identity).view.mapValues(_.size).toMap
      val floorHolds = vocab.forall(v =>
        est(v) >= exact.getOrElse(v, 0).toLong)
      val halves = Seq(0, 1).map(p =>
        Sketches.cmsBuild(df.filter(pmod(col("id"), lit(2)) === p),
          col("tok"), depth, width))
      val merged = Sketches.cmsMerge(halves.reduce(_ unionByName _))
      val mergeHolds = merged.exceptAll(whole).isEmpty &&
        whole.exceptAll(merged).isEmpty
      floorHolds && mergeHolds
    }

  property("dupSpans == interval-union replay of duplicated windows") =
    forAll(docGen, Gen.choose(2, 4)) { (docs, n) =>
      val df = docs.toDF("doc_id", "text")
      val got = Dedup.dupSpans(df, "doc_id", "text", n)
        .as[(Long, Int, Int)].collect().toSet
      // model: every stride-1 window occurrence corpus-wide; windows whose
      // gram occurs >= 2 times survive; union their [s, s+n) intervals per
      // doc and report maximal connected spans
      val occ = docs.flatMap { case (id, t) =>
        val toks = t.toLowerCase.split("\\s+").toSeq
        if (toks.size < n) Nil
        else toks.sliding(n).zipWithIndex
          .map { case (w, s) => (id, s, w.mkString(" ")) }.toList
      }
      val freq = occ.groupBy(_._3).view.mapValues(_.size).toMap
      val expected = occ.filter(o => freq(o._3) >= 2).groupBy(_._1)
        .flatMap { case (id, hs) =>
          hs.map(_._2).sorted.foldLeft(List.empty[(Int, Int)]) {
            case ((st, en) :: rest, s) if s <= en => (st, math.max(en, s + n)) :: rest
            case (spans, s) => (s, s + n) :: spans
          }.map { case (st, en) => (id, st, en - st) }
        }.toSet
      got == expected
    }

  property("chunk == sliding-window reimplementation") =
    forAll(docGen, Gen.choose(2, 6), Gen.choose(0, 1)) { (docs, c, o) =>
      val df = docs.toDF("doc_id", "text")
      val got = graft.operators.Corpus.chunk(df, "doc_id", "text", c, o)
        .select("doc_id", "chunk_no", "chunk_tokens")
        .as[(Long, Int, Int)].collect().toSet
      val stride = c - o
      val expected = (for {
        (id, text) <- docs
        toks = text.split("\\s+").toSeq
        n = toks.size
        // starts stop at n − o − 1: the final window must add at least one
        // token beyond the carried overlap (mirrors Corpus.chunk)
        (s, i) <- (0 to math.max(n - o - 1, 0) by stride).zipWithIndex
      } yield (id, i, math.min(c, n - s))).toSet
      got == expected
    }

  property("greedy pack (batch and in-row forms) == sequential replay") =
    forAll(docGen, Gen.choose(2, 6), Gen.choose(4, 12)) { (docs, c, cap) =>
      val df = docs.toDF("doc_id", "text")
      val chunks = graft.operators.Corpus.chunk(df, "doc_id", "text", c, 0)
      val batch = graft.operators.Corpus
        .packChunks(chunks, "doc_id", "chunk_no", "chunk_tokens", cap)
        .select("doc_id", "chunk_no", "chunk_tokens", "bin")
        .as[(Long, Int, Int, Int)].collect().toSet
      val ingest = graft.streaming.StreamingCorpus
        .chunkAndPackAtIngest(df, "doc_id", "text", c, 0, cap)
        .select("doc_id", "chunk_no", "chunk_tokens", "bin")
        .as[(Long, Int, Int, Int)].collect().toSet
      // straight-line replay of the greedy rule per doc, in chunk order
      val expected = (for {
        (id, text) <- docs
        toks = text.split("\\s+").toSeq
        sizes = (0 to math.max(toks.size - 1, 0) by c)
          .map(s => math.min(c, toks.size - s))
      } yield {
        var bin = 0; var cur = 0L
        sizes.zipWithIndex.map { case (n, i) =>
          if (cur + n > cap && cur > 0) { bin += 1; cur = n.toLong }
          else cur += n
          (id, i, n, bin)
        }
      }).flatten.toSet
      batch == expected && ingest == expected
    }

  private val changelogGen: Gen[List[(String, Long, Long, String)]] = for {
    n <- Gen.choose(1, 25)
    rows <- Gen.listOfN(n, for {
      k <- Gen.oneOf("a", "b", "c")
      v <- Gen.choose(0L, 4L) // few versions -> frequent ties
    } yield (k, v))
  } yield rows.zipWithIndex.map { case ((k, v), i) => (k, i.toLong, v, s"val$i") }

  property("versionedUpsert == sequential strict-> replay") = forAll(changelogGen) { rows =>
    val df = rows.toDF("k", "arrival", "ver", "v")
    val got = Upserts.versionedUpsert(df, Seq("k"), col("ver"), col("arrival"))
      .select("k", "v").as[(String, String)].collect().toMap
    val expected = rows.groupBy(_._1).map { case (k, rs) =>
      k -> rs.sortBy(_._2).foldLeft(Option.empty[(String, Long, Long, String)]) {
        case (Some(cur), r) if r._3 <= cur._3 => Some(cur)
        case (_, r)                           => Some(r)
      }.get._4
    }
    got == expected
  }

  private val asofGen: Gen[(List[(Long, String, Long)], List[(Long, String, Long)])] = for {
    nl <- Gen.choose(1, 15)
    nr <- Gen.choose(0, 15)
    ls <- Gen.listOfN(nl, for { k <- Gen.oneOf("x", "y"); t <- Gen.choose(0L, 20L) } yield (k, t))
    rs <- Gen.listOfN(nr, for { k <- Gen.oneOf("x", "y"); t <- Gen.choose(0L, 20L) } yield (k, t))
  } yield (
    ls.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) },
    rs.zipWithIndex.map { case ((k, t), i) => (i.toLong + 1000, k, t) })

  property("asOfJoin == per-row latest-at-or-before lookup") = forAll(asofGen) {
    case (ls, rs) =>
      val left = ls.toDF("lid", "lk", "lt")
      val right = rs.toDF("rid", "rk", "rt")
      val got = Temporal.asOfJoin(left, right,
          col("lk"), col("rk"), col("lt"), col("rt"),
          leftId = Seq("lid"), tieBreak = Seq(col("rid")))
        .select("lid", "rid").as[(Long, Long)].collect().toMap
      val expected = (for {
        (lid, lk, lt) <- ls
        candidates = rs.filter { case (_, rk, rt) => rk == lk && rt <= lt }
        if candidates.nonEmpty
      } yield lid -> candidates.maxBy(r => (r._3, r._1))._1).toMap
      got == expected
  }

  property("asOfJoinSorted == asOfJoin (unbounded look-back), inner and left") =
    forAll(asofGen) { case (ls, rs) =>
      val left = ls.toDF("lid", "lk", "lt")
      val right = rs.toDF("rid", "rk", "rt")
      def run(jt: String) = {
        val plain = Temporal.asOfJoin(left, right,
            col("lk"), col("rk"), col("lt"), col("rt"),
            leftId = Seq("lid"), tieBreak = Seq(col("rid")), joinType = jt)
          .select("lid", "rid").as[(Long, Option[Long])].collect().toMap
        val sorted = Temporal.asOfJoinSorted(left, right,
            col("lk"), col("rk"), col("lt"), col("rt"),
            leftId = Seq("lid"), tieBreak = Seq(col("rid")), joinType = jt)
          .select("lid", "rid").as[(Long, Option[Long])].collect().toMap
        plain == sorted
      }
      run("inner") && run("left")
    }

  property("asOfJoinBanded == asOfJoin with tolerance, inner and left") =
    forAll(asofGen, Gen.choose(1L, 8L)) { case ((ls, rs), tol) =>
      val left = ls.toDF("lid", "lk", "lt")
      val right = rs.toDF("rid", "rk", "rt")
      def run(jt: String) = {
        val plain = Temporal.asOfJoin(left, right,
            col("lk"), col("rk"), col("lt"), col("rt"),
            leftId = Seq("lid"), tolerance = Some(lit(tol)),
            tieBreak = Seq(col("rid")), joinType = jt)
          .select("lid", "rid").as[(Long, Option[Long])].collect().toMap
        val banded = Temporal.asOfJoinBanded(left, right,
            col("lk"), col("rk"), col("lt"), col("rt"),
            leftId = Seq("lid"), tolerance = lit(tol),
            tieBreak = Seq(col("rid")), joinType = jt)
          .select("lid", "rid").as[(Long, Option[Long])].collect().toMap
        plain == banded
      }
      run("inner") && run("left")
    }

  property("saltedJoin == plain equi-join") = forAll(changelogGen, Gen.choose(2, 6)) {
    (rows, salts) =>
      val skewed = rows.toDF("k", "arrival", "ver", "v")
      val dim = Seq(("a", "A"), ("b", "B")).toDF("dk", "name")
      val got = Skew.saltedJoin(skewed, dim, col("k"), col("dk"), salts)
        .select("v", "name").as[(String, String)].collect().sorted.toSeq
      val expected = skewed.join(dim, col("k") === col("dk"))
        .select("v", "name").as[(String, String)].collect().sorted.toSeq
      got == expected
  }

  private val scoreGen: Gen[List[(String, Double, Long)]] = for {
    n <- Gen.choose(1, 30)
    rows <- Gen.listOfN(n, for {
      g <- Gen.oneOf("g1", "g2")
      s <- Gen.choose(-100, 100)
    } yield (g, s.toDouble))
  } yield rows.zipWithIndex.map { case ((g, s), i) => (g, s, i.toLong) }

  private val edgeGen: Gen[List[(Long, Long)]] = for {
    n <- Gen.choose(1, 25)
    edges <- Gen.listOfN(n, for {
      a <- Gen.choose(0L, 15L)
      b <- Gen.choose(0L, 15L) if a != b
    } yield (a, b))
  } yield edges

  property("resolveComponentsStar == union-find ground truth") = forAll(edgeGen) { edges =>
    val got = Dedup.resolveComponentsStar(edges.toDF("a_id", "b_id"), "a_id", "b_id")
      .as[(Long, Long)].collect().toMap
    // driver-side union-find over the same edges
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = parent.keys.map(x => x -> find(x)).toMap
    got == expected
  }

  property("scd2 == sequential run-collapse replay") = {
    val gen: Gen[List[(Long, Long, Long, String)]] = for {
      n <- Gen.choose(0, 30)
      rows <- Gen.listOfN(n, for {
        k <- Gen.choose(1L, 4L)
        ts <- Gen.choose(0L, 10L) // tight range: same-ts ties are common
        v <- Gen.oneOf("x", "y", "z")
      } yield (k, ts, v))
    } yield rows.zipWithIndex.map { case ((k, ts, v), i) => (k, ts, i.toLong, v) }
    forAll(gen) { rows =>
      val got = Temporal.scd2(
          rows.toDF("k", "ts", "seq", "v"), "k", "v", col("ts"), col("seq"))
        .select("k", "v", "valid_from", "valid_to")
        .as[(Long, String, Long, Option[Long])].collect().toSet
      // model: per key, order by (ts, seq), collapse same-value runs,
      // close each interval with the next run's start
      val expected = rows.groupBy(_._1).flatMap { case (k, es) =>
        val runs = es.sortBy(e => (e._2, e._3))
          .foldLeft(List.empty[(String, Long)]) {
            case (acc @ ((pv, _) :: _), (_, _, _, v)) if pv == v => acc
            case (acc, (_, ts, _, v)) => (v, ts) :: acc
          }.reverse
        runs.zipWithIndex.map { case ((v, from), i) =>
          (k, v, from, if (i + 1 < runs.size) Some(runs(i + 1)._2) else None)
        }
      }.toSet
      got == expected
    }
  }

  property("topKPerKey == sort-and-take per key") = forAll(scoreGen, Gen.choose(1, 6)) {
    (rows, k) =>
      val df = rows.toDF("g", "score", "id").repartition(5)
      val got = Similarity.topKPerKey(df, Seq("g"),
          struct((-col("score")).as("ns"), col("id").as("nid")), k)
        .select(col("g"), col("topk.nid"))
        .as[(String, Seq[Long])].collect().toMap
      val expected = rows.groupBy(_._1).map { case (g, rs) =>
        g -> rs.sortBy(r => (-r._2, r._3)).take(k).map(_._3)
      }
      got == expected
  }

  // random directed multigraphs: up to 10 nodes, duplicate edges and
  // self-loop attempts included (self-loops filtered by the generator for
  // pagerank since the integer model treats them as ordinary edges)
  private val graphGen: Gen[List[(Long, Long)]] = for {
    n <- Gen.choose(2, 10)
    m <- Gen.choose(1, 25)
    es <- Gen.listOfN(m, for {
      s <- Gen.choose(0L, n.toLong - 1)
      d <- Gen.choose(0L, n.toLong - 1)
    } yield (s, d))
  } yield es.filter(e => e._1 != e._2)

  property("pageRankExact == integer recurrence replay on random multigraphs") =
    forAll(graphGen, Gen.choose(0, 4)) { (edges, iters) =>
      edges.isEmpty || {
        val got = graft.operators.Graph.pageRankExact(
            edges.toDF("src", "dst"), iters)
          .as[(Long, Long)].collect().toMap
        val out = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
        val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
        val base = 1000000000L * 3 / 20
        var r = nodes.map(_ -> 1000000000L).toMap
        for (_ <- 1 to iters) {
          val contrib = edges.groupBy(_._2).view.mapValues(
            _.map { case (s, _) => ((r(s) * 17) / 20) / out(s) }.sum).toMap
          r = nodes.map(n => n -> (base + contrib.getOrElse(n, 0L))).toMap
        }
        got == r
      }
    }

  property("triangleCounts == cubic brute force on random graphs") =
    forAll(graphGen) { edges =>
      edges.isEmpty || {
        val got = graft.operators.Graph.triangleCounts(edges.toDF("src", "dst"))
          .as[(Long, Long, Long)].collect()
          .map(r => r._1 -> (r._2, r._3)).toMap
        val und = edges.map(e => (math.min(e._1, e._2), math.max(e._1, e._2)))
          .toSet
        val nodes = und.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
        def adj(a: Long, b: Long) = und((math.min(a, b), math.max(a, b)))
        val triples = for {
          x <- nodes; y <- nodes if y > x; z <- nodes if z > y
          if adj(x, y) && adj(y, z) && adj(x, z)
        } yield Seq(x, y, z)
        val perNode = triples.flatten.groupBy(identity).view.mapValues(_.size.toLong)
        val expected = nodes.map { n =>
          n -> ((und.count(e => e._1 == n || e._2 == n).toLong,
            perNode.getOrElse(n, 0L)))
        }.toMap
        got == expected
      }
    }

  private val intervalGen: Gen[List[(Long, Long, Long)]] = for {
    n <- Gen.choose(0, 12)
    ivs <- Gen.listOfN(n, for {
      lo <- Gen.choose(-40L, 90L)
      w <- Gen.choose(-3L, 25L) // negative widths: degenerate intervals
    } yield (lo, lo + w))
  } yield ivs.zipWithIndex.map { case ((lo, hi), i) => (i.toLong, lo, hi) }

  property("intervalOverlapJoin == naive overlap over non-degenerate rows, exactly once, any band") =
    forAll(intervalGen, intervalGen, Gen.oneOf(1L, 5L, 17L, 400L)) {
      (as, bs, band) =>
        val a = as.toDF("aid", "a_lo", "a_hi")
        val b = bs.map { case (i, lo, hi) => (i + 1000L, lo, hi) }
          .toDF("bid", "b_lo", "b_hi")
        val got = Temporal.intervalOverlapJoin(
            a, b, "a_lo", "a_hi", "b_lo", "b_hi", band)
          .select("aid", "bid").as[(Long, Long)].collect()
        val naive = for {
          (ai, alo, ahi) <- as if ahi >= alo
          (bi, blo, bhi) <- bs if bhi >= blo
          if alo <= bhi && blo <= ahi
        } yield (ai, bi + 1000L)
        got.toSet == naive.toSet && got.length == naive.size
    }

  property("slice-log compaction: standing rows invariant under any slice split and fold point") = {
    val gen = for {
      n <- Gen.choose(1, 14)
      rows = (0 until n).map(i => (i.toLong, i.toLong * 7))
      cuts <- Gen.listOf(Gen.choose(1, math.max(1, n - 1))).map(_.distinct.sorted)
    } yield (rows, cuts)
    forAll(gen) { case (rows, cuts) =>
      import graft.state.Artifacts
      val dir = java.nio.file.Files
        .createTempDirectory("graft_prop_compact").toString + "/slots"
      val ddl = "k BIGINT, v BIGINT, batch BIGINT"
      // split the rows at the generated cut points → one slice per segment
      val bounds = (0 +: cuts :+ rows.size).distinct.sorted
      val slices = bounds.zip(bounds.tail).zipWithIndex.map {
        case ((lo, hi), i) => i.toLong -> rows.slice(lo, hi)
      }
      slices.foreach { case (i, rs) =>
        rs.toDF("k", "v").write.mode("overwrite").parquet(s"$dir/batch=$i")
      }
      val expected = slices.flatMap { case (i, rs) =>
        rs.map { case (k, v) => (k, v, i) } }.toSet
      def standing() = Artifacts.readSlices(spark, dir, ddl)
        .as[(Long, Long, Long)].collect().toSet
      val pre = standing() == expected
      // fold at EVERY legal point in sequence (repeated maintenance) —
      // the standing rows must never change
      val folds = slices.map(_._1).dropRight(1)
      val posts = folds.map { upTo =>
        Artifacts.compactSlices(spark, dir, upTo, ddl)
        standing() == expected
      }
      pre && posts.forall(identity)
    }
  }
}
