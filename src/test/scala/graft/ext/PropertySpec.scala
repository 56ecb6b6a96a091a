package graft.ext

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property-based contracts (scalacheck driving the real Spark
  * operators on small random inputs): invariants that hand-picked
  * examples can miss — coverage totality, boundary buckets, fixed
  * points under random parameters. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def check(prop: Prop, n: Int = 15): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  test("fimTransform: for ANY text and id, stripping the sentinels " +
      "and re-assembling prefix+middle+suffix reconstructs the " +
      "original text byte-for-byte, in both PSM and SPM modes") {
    val gen = for {
      id <- Gen.choose(1L, 10000L)
      text <- Gen.listOf(Gen.alphaNumChar).map(_.mkString)
    } yield (id, text)
    check(Prop.forAll(gen) { case (id, text) =>
      val df = Seq((id, text)).toDF("doc_id", "text")
      val r = Assemble.fimTransform(df, "doc_id", "text",
        fimRateMilli = 1000, spmRateMilli = 500).collect().head
      val mode = r.getString(1); val out = r.getString(4)
      if (mode == "none") out == text // len < 2 gate
      else {
        val lo = r.getLong(2).toInt; val hi = r.getLong(3).toInt
        val pre = text.substring(0, lo)
        val mid = text.substring(lo, hi)
        val suf = text.substring(hi)
        val expect =
          if (mode == "spm")
            s"<|fim_suffix|>$suf<|fim_prefix|>$pre<|fim_middle|>$mid"
          else
            s"<|fim_prefix|>$pre<|fim_suffix|>$suf<|fim_middle|>$mid"
        out == expect && (pre + mid + suf) == text
      }
    }, n = 12)
  }

  test("annotateQuality: for ANY random text the fused single-pass " +
      "signals equal the standalone shuffling operators' " +
      "(repetitionSignals and charEntropy) outputs exactly") {
    val wordGen = Gen.oneOf("the", "cat", "sat", "on", "mat", "a", "b")
    val gen = Gen.choose(1, 30).flatMap(k =>
      Gen.listOfN(k, wordGen).map(_.mkString(" ")))
    check(Prop.forAll(gen) { text =>
      val df = Seq((1L, text)).toDF("doc_id", "text")
      val fused = TextAnalysis.annotateQuality(df, "doc_id", "text")
        .select("n_tokens", "n_distinct", "top_tok_n", "top_2gram_n",
          "max_run", "dup_tok_frac", "ent_n_chars", "ent_n_distinct",
          "entropy_unats").collect().head
      val rep = TextAnalysis.repetitionSignals(df, "doc_id", "text")
        .select("n_tokens", "n_distinct", "top_tok_n", "top_2gram_n",
          "max_run", "dup_tok_frac").collect().head
      val ent = TextAnalysis.charEntropy(df, "doc_id", "text")
        .select("n_chars", "n_distinct", "entropy_unats").collect().head
      fused.getLong(0) == rep.getLong(0) &&
      fused.getLong(1) == rep.getLong(1) &&
      fused.getLong(2) == rep.getLong(2) &&
      fused.getLong(3) == rep.getLong(3) &&
      fused.getLong(4) == rep.getLong(4) &&
      fused.getDouble(5) == rep.getDouble(5) &&
      fused.getLong(6) == ent.getLong(0) &&
      fused.getLong(7) == ent.getLong(1) &&
      fused.getLong(8) == ent.getLong(2)
    }, n = 10)
  }

  test("chunkText: for ANY (nTokens, chunkTokens, overlap) the chunk " +
      "rows tile the token range — first starts at 1, strides are " +
      "uniform, lengths are exact, the last chunk reaches token n") {
    val gen = for {
      n <- Gen.choose(0, 40)
      c <- Gen.choose(1, 8)
      o <- Gen.choose(0, c - 1)
    } yield (n, c, o)
    check(Prop.forAll(gen) { case (n, c, o) =>
      val text = (1 to n).map(i => s"t$i").mkString(" ")
      val df = Seq((1L, text)).toDF("doc_id", "text")
      val rows = TextAnalysis.chunkText(df, "doc_id", "text", c, o)
        .collect().map(r => (r.getInt(1), r.getInt(2), r.getInt(3)))
        .sortBy(_._1)
      val stride = c - o
      if (n == 0) rows.isEmpty
      else {
        val starts = rows.map(_._2)
        val expectStarts = (1 to n by stride).toArray
        starts.sameElements(expectStarts) &&
        rows.forall { case (idx, st, len) =>
          idx == (st - 1) / stride && len == math.min(c, n - st + 1)
        } &&
        rows.last._2 + rows.last._3 - 1 == n // tiles through the end
      }
    }, n = 20)
  }

  test("weightedTopK: for ANY weights, exactly min(k, positives) " +
      "rows, never a non-positive weight, ranks contiguous") {
    val gen = for {
      ws <- Gen.listOfN(12, Gen.choose(-2L, 9L))
      k <- Gen.choose(1, 8)
    } yield (ws, k)
    check(Prop.forAll(gen) { case (ws, k) =>
      val df = ws.zipWithIndex.map { case (w, i) => (i.toLong, w) }
        .toDF("id", "w")
      val out = Sampling.weightedTopK(df, "id", "w", k)
        .collect().map(r => (r.getLong(0), r.getInt(3)))
      val positives = ws.count(_ > 0)
      out.length == math.min(k, positives) &&
      out.map(_._2).sorted.sameElements(1 to out.length) &&
      out.forall { case (id, _) => ws(id.toInt) > 0 }
    })
  }

  test("curriculumPhases: for ANY corpus size and phase count the " +
      "assignment is exactly the equal-width formula and phases are " +
      "monotone in rank") {
    val gen = for {
      n <- Gen.choose(1, 25)
      p <- Gen.choose(1, 6)
    } yield (n, p)
    check(Prop.forAll(gen) { case (n, p) =>
      val df = (1 to n).map(i => (i.toLong, (i * 17 % 7).toLong))
        .toDF("id", "score")
      val out = Assemble.curriculumPhases(df, "id", Seq($"score"), p)
        .select($"rank", $"phase")
        .as[(Long, Int)].collect().sortBy(_._1)
      out.zipWithIndex.forall { case ((r, ph), i) =>
        r == i + 1 && ph == ((r - 1) * p / n + 1).toInt
      }
    })
  }

  test("profile: for ANY column contents the invariants hold — " +
      "n_null + non-null = n, distinct <= non-null, min <= max") {
    val gen = Gen.listOfN(10, Gen.option(Gen.choose(0L, 5L)))
    check(Prop.forAll(gen) { vs =>
      val df = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("id", "v")
      val p = Profiling.profile(df, Seq("v")).collect().head
      val (n, nNull, nd) = (p.getLong(1), p.getLong(2), p.getLong(3))
      val nonNull = n - nNull
      n == 10L && nNull == vs.count(_.isEmpty) && nd <= nonNull &&
      (nonNull == 0L ||
        (p.getString(4).toLong <= p.getString(5).toLong &&
          nd == vs.flatten.distinct.size))
    })
  }

  test("invertedIndex: for ANY corpus, ranks are 1..min(df, cap), df " +
      "equals the token's true document frequency, tf sums match") {
    val word = Gen.oneOf("a", "b", "c", "d")
    val doc = Gen.listOfN(6, word).map(_.mkString(" "))
    val gen = Gen.listOfN(5, doc)
    check(Prop.forAll(gen) { docs =>
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val out = Assemble.invertedIndex(df, "doc_id", "text", 2)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2),
          r.getLong(3), r.getLong(4)))
      val trueDf = docs.flatMap(_.split(" ").distinct).groupBy(identity)
        .map { case (t, xs) => t -> xs.size.toLong }
      out.groupBy(_._1).forall { case (tok, rows) =>
        rows.forall(_._2 == trueDf(tok)) &&
        rows.map(_._3).sorted.sameElements(
          1 to math.min(2, trueDf(tok).toInt)) &&
        rows.forall { case (_, _, _, id, tf) =>
          docs(id.toInt).split(" ").count(_ == tok).toLong == tf }
      }
    }, n = 12)
  }

  test("pageRank: a symmetric 2-cycle is a fixed point at the initial " +
      "mass for ANY damping (scale divisible by 1000 keeps the " +
      "arithmetic exact)") {
    val cyc = Seq(("a", "b"), ("b", "a")).toDF("src", "dst")
    check(Prop.forAll(Gen.choose(0L, 1000L)) { damp =>
      val rDf = Graph.pageRank(cyc, "src", "dst", iterations = 2,
        dampMilli = damp)
      val r = rDf.collect().map(x => x.getLong(1))
      rDf.unpersist() // persisted frame is caller-owned
      r.forall(_ == 1000000L)
    }, n = 8)
  }

  test("mmrTopK: at lambda = 1 (pure relevance) the greedy selection " +
      "IS the plain top-k, for ANY corpus") {
    val gen = Gen.listOfN(8, Gen.listOfN(3, Gen.choose(-5, 5)))
      .suchThat(_.exists(_.exists(_ != 0)))
    check(Prop.forAll(gen) { vs =>
      val rows = vs.zipWithIndex.collect {
        case (v, i) if v.exists(_ != 0) =>  // zero vectors have no cosine
          (i.toLong, v.map(_.toFloat).toArray)
      }
      val df = rows.toDF("vec_id", "embedding")
      val q = df.filter($"vec_id" === rows.head._1)
      val k = math.min(3, rows.length - 1)
      if (k < 1) true
      else {
        val mmr = Similarity.mmrTopK(df, q, kCand = rows.length, k = k,
            lambdaMilli = 1000)
          .collect().map(r => (r.getLong(1), r.getInt(3))).toSet
        val plain = Similarity.bruteForceTopK(df, q, k)
          .collect().map(r => (r.getLong(1), r.getInt(3))).toSet
        mmr == plain
      }
    }, n = 8)
  }

  test("lengthOutliers: partitioning-invariant and flag counts are " +
      "bounded by the rows, for ANY grouped integer data") {
    val gen = Gen.listOfN(20, Gen.zip(Gen.oneOf("a", "b"), Gen.choose(0L, 50L)))
    check(Prop.forAll(gen) { rows =>
      val df = rows.toDF("grp", "len")
      def run(d: org.apache.spark.sql.DataFrame) =
        TextAnalysis.lengthOutliers(d, "grp", "len", 2)
          .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
            r.getLong(3))).toSet
      val once = run(df)
      once == run(df.repartition(7)) &&
      once.forall { case (_, n, nOut, _) => nOut <= n }
    }, n = 10)
  }

  test("stupidBackoff: for ANY corpus, self-scoring never meets an " +
      "OOV and every rung yields finite non-negative surprisal; " +
      "scoring disjoint text is all-OOV") {
    val word = Gen.oneOf("a", "b", "c", "d")
    val gen = for {
      nDocs <- Gen.choose(1, 4)
      docs <- Gen.listOfN(nDocs, Gen.listOfN(6, word).map(_.mkString(" ")))
    } yield docs
    check(Prop.forAll(gen) { docs =>
      val df = docs.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val self = Assemble.stupidBackoff(df, df, "doc_id", "text")
        .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(4)))
      // self-scored: every token seen (no OOV), surprisal >= 0 (all
      // rung probabilities are true frequencies <= 1), token counts
      // match the 6-token docs
      val selfOk = self.forall { case (nTok, su, oov) =>
        nTok == 6L && su >= 0L && oov == 0L }
      val alien = Seq((99L, "z z z")).toDF("doc_id", "text")
      val out = Assemble.stupidBackoff(df, alien, "doc_id", "text")
        .collect().map(r => (r.getLong(1), r.getLong(4))).head
      selfOk && out == ((3L, 3L)) // every held-out token is OOV
    }, n = 10)
  }
}
