package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Corpus-assembly operators — the steps between "cleaned documents"
 * and "training batches" in an LLM data pipeline (engine extension
 * beyond the reference surface; BASELINE.json north star):
 *
 *  - unigram-LM surprisal scoring (the CCNet/KenLM quality-filter
 *    shape, with a corpus-trained unigram model standing in for the
 *    external KenLM binary — identical plan shape);
 *  - deterministic domain-mixture sampling (hit target domain
 *    proportions via downsampling only, exact integer arithmetic);
 *  - sequence packing (assign documents to fixed-token-budget
 *    training sequences, sharded for parallelism).
 *
 * All outputs are reproducible under any partitioning and replayable
 * by another engine — decisions key on ids and exact integers, never
 * on row order or Spark's RNG.
 */
object Assemble {

  private val Buckets = 1000000L

  /**
   * Per-document unigram surprisal: train a unigram LM on the corpus
   * itself (token frequencies), then score every document by total
   * and mean token surprisal −ln p(tok). Low-mean documents are
   * commonplace/repetitive; high-mean ones are rare-token noise —
   * both tails get filtered (the CCNet perplexity-filter shape; a
   * real deployment swaps the frequency JOIN for a KenLM scorer UDF,
   * the plan stays identical).
   *
   * Scale shape: one explode + one groupBy(token) for the model, one
   * hash join back (AQE broadcasts it while the vocab is small), one
   * groupBy(id). The token frame feeds the model AND the scoring
   * pass, so it is persisted for the call and the (per-document)
   * result handed back localCheckpoint'ed — computed, lineage-free,
   * no unpersist obligation on the caller (the minhashDedup
   * contract). The trade: checkpoint blocks are not recomputable
   * under executor loss — long-lived consumers at cluster scale
   * should write the result to storage rather than hold the frame.
   *
   * Parity note: fixing surprisals to integer micro-nats BEFORE the
   * per-document sum makes the aggregate order-free — FP summation
   * order never leaks into the result. The per-token floor itself
   * still evaluates `ln` on each engine's libm; a value landing
   * within 1 ulp of a micro-nat boundary could floor differently
   * (probability ~1e-10 per distinct frequency; both gate scale
   * factors verified clean). A production deployment pins the scorer
   * library (KenLM) anyway.
   */
  def unigramSurprisal(
      df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = graft.util.Tables.spread(df)
      .select(col(idCol).as("id"),
        explode(TextAnalysis.normTokens(col(textCol))).as("tok"))
      .persist()
    val freqs = toks.groupBy(col("tok")).agg(count(lit(1)).as("c"))
      .persist()
    try {
      val total = freqs.agg(sum(col("c")).as("total"))
      val scored = toks
        .join(freqs, Seq("tok"))
        .crossJoin(broadcast(total))
        .select(col("id"),
          floor(-log(col("c").cast("double") / col("total")) * 1000000L)
            .cast("long").as("u"))
      scored.groupBy(col("id")).agg(
        count(lit(1)).as("n_tokens"),
        sum(col("u")).as("surprisal_unats"))
        // exact integer mean (micro-nats/token, truncating) — a
        // rounded double mean can land on .5-ulp boundaries where
        // engines' round-half conventions split (the q_embed_meanpool
        // lesson; mirrors bigramSurprisal's mean_unats)
        .select(col("id"), col("n_tokens"), col("surprisal_unats"),
          expr("surprisal_unats div n_tokens").as("mean_unats"))
        .localCheckpoint()
    } finally { toks.unpersist(); freqs.unpersist() }
  }

  /**
   * Per-document bigram surprisal with add-one smoothing — one rung
   * up the LM ladder from [[unigramSurprisal]] toward the CCNet
   * 5-gram KenLM scorer: each token is scored by
   * −ln p(w_i | w_{i−1}) with p = (c(w_{i−1} w_i) + 1) /
   * (c(w_{i−1}) + V), the first token by its unigram probability.
   * Same exact-arithmetic discipline: integer micro-nats per token
   * BEFORE the per-document sum (order-free aggregate), same plan
   * family — two count groupBys train the model, two hash joins
   * score (AQE broadcasts both model frames while the vocab is
   * small), one groupBy(id) reduces.
   *
   * Parity assumption (load-bearing, same as [[unigramSurprisal]]):
   * `floor(−ln(p)·1e6)` takes each engine's libm `ln` — including on
   * the smoothed `(cb+1)/(cu+V)` ratio here — and a value within
   * 1 ulp of a micro-nat boundary could floor differently
   * (~1e-10/distinct ratio; both gate scale factors verified clean).
   * A production deployment pins the scorer library.
   */
  def bigramSurprisal(
      df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = graft.util.Tables.spread(df)
      .select(col(idCol).as("id"),
        posexplode(TextAnalysis.normTokens(col(textCol))))
      .toDF("id", "pos", "tok")
      .persist()
    try {
      val uni = toks.groupBy(col("tok")).agg(count(lit(1)).as("cu"))
        .persist()
      try {
        val vocabN = uni.count() // V: driver-side scalar metadata
        val total = uni.agg(sum(col("cu")).as("total"))
        val w = Window.partitionBy(col("id")).orderBy(col("pos"))
        val withPrev = toks
          .withColumn("prev", lag(col("tok"), 1).over(w))
        val bi = withPrev.filter(col("prev").isNotNull)
          .groupBy(col("prev").as("b_prev"), col("tok").as("b_tok"))
          .agg(count(lit(1)).as("cb"))
        val scored = withPrev
          .join(uni.withColumnRenamed("tok", "u_tok"),
            // first token scores against the unigram model; the rest
            // condition on their predecessor
            coalesce(col("prev"), col("tok")) === col("u_tok"))
          .join(bi,
            col("prev") === col("b_prev") && col("tok") === col("b_tok"),
            "left")
          .crossJoin(broadcast(total))
          .select(col("id"),
            when(col("prev").isNull,
              floor(-log(col("cu").cast("double") / col("total")) * 1000000L))
              .otherwise(
                floor(-log((coalesce(col("cb"), lit(0L)) + 1L).cast("double") /
                  (col("cu") + lit(vocabN))) * 1000000L))
              .cast("long").as("u"))
        scored.groupBy(col("id")).agg(
            count(lit(1)).as("n_tokens"),
            sum(col("u")).as("surprisal_unats"))
          // exact integer mean (micro-nats/token, truncating): a
          // rounded double mean can land on .5-ulp boundaries where
          // engines' round-half conventions split (the
          // q_embed_meanpool lesson)
          .select(col("id"), col("n_tokens"), col("surprisal_unats"),
            expr("surprisal_unats div n_tokens").as("mean_unats"))
          .localCheckpoint()
      } finally uni.unpersist()
    } finally toks.unpersist()
  }

  /**
   * Interpolated TRIGRAM surprisal — the next rung of the LM ladder
   * (unigram → add-one bigram → Jelinek-Mercer trigram; the CCNet
   * scorer is a 5-gram of exactly this family). Per token at
   * position p:
   *
   *   p = 0:  p(w) = c(w)/N
   *   p = 1:  0.7·c(w₁w₂)/c(w₁) + 0.3·c(w₂)/N
   *   p ≥ 2:  0.6·c(w₁w₂w₃)/c(w₁w₂) + 0.3·c(w₂w₃)/c(w₂) + 0.1·c(w₃)/N
   *
   * The model is trained on the scored corpus itself, so every
   * n-gram in the stream has count ≥ 1 and every interpolated p is
   * strictly positive — no smoothing epsilon needed. Determinism:
   * each term is a double division of EXACT integer counts, the
   * interpolation is a fixed left-associative sum of literal-weighted
   * terms (identical IEEE ops in any engine), and ln truncates ONCE
   * to integer micro-nats; the per-doc totals are integer sums.
   *
   * Scale shape: one posexplode; the n-gram count tables are three
   * groupBys with map-side combine; scoring joins the token stream
   * against them on their own keys (AQE broadcasts while vocabularies
   * fit, shuffles otherwise — both correct). The lag window
   * partitions on the doc id.
   */
  def trigramSurprisal(
      df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = graft.util.Tables.spread(df)
      .select(col(idCol).as("id"),
        posexplode(TextAnalysis.normTokens(col(textCol))))
      .toDF("id", "pos", "tok")
      .persist()
    try {
      val w = Window.partitionBy(col("id")).orderBy(col("pos"))
      val ctx = toks
        .withColumn("p1", lag(col("tok"), 1).over(w))
        .withColumn("p2", lag(col("tok"), 2).over(w))
        .persist()
      try {
        val uni = ctx.groupBy(col("tok")).agg(count(lit(1)).as("c"))
        val bi = ctx.filter(col("p1").isNotNull)
          .groupBy(col("p1").as("ba"), col("tok").as("bb"))
          .agg(count(lit(1)).as("c"))
        val tri = ctx.filter(col("p2").isNotNull)
          .groupBy(col("p2").as("ta"), col("p1").as("tb"),
            col("tok").as("tc"))
          .agg(count(lit(1)).as("c"))
        val total = uni.agg(sum(col("c")).as("n"))
        val scored = ctx
          .join(uni.select(col("tok").as("u3k"), col("c").as("cu3")),
            col("tok") === col("u3k"))
          .join(uni.select(col("tok").as("u2k"), col("c").as("cu2")),
            col("p1") === col("u2k"), "left")
          .join(bi.select(col("ba").as("b23a"), col("bb").as("b23b"),
              col("c").as("cb23")),
            col("p1") === col("b23a") && col("tok") === col("b23b"), "left")
          .join(bi.select(col("ba").as("b12a"), col("bb").as("b12b"),
              col("c").as("cb12")),
            col("p2") === col("b12a") && col("p1") === col("b12b"), "left")
          .join(tri,
            col("p2") === col("ta") && col("p1") === col("tb") &&
              col("tok") === col("tc"), "left")
          .crossJoin(broadcast(total))
          .select(col("id"),
            floor(-log(
              when(col("p1").isNull,
                col("cu3").cast("double") / col("n"))
              .when(col("p2").isNull,
                lit(0.7) * (col("cb23").cast("double") / col("cu2")) +
                lit(0.3) * (col("cu3").cast("double") / col("n")))
              .otherwise(
                lit(0.6) * (col("c").cast("double") / col("cb12")) +
                lit(0.3) * (col("cb23").cast("double") / col("cu2")) +
                lit(0.1) * (col("cu3").cast("double") / col("n"))))
              * 1000000L).cast("long").as("u"))
        scored.groupBy(col("id")).agg(
            count(lit(1)).as("n_tokens"),
            sum(col("u")).as("surprisal_unats"))
          .select(col("id"), col("n_tokens"), col("surprisal_unats"),
            expr("surprisal_unats div n_tokens").as("mean_unats"))
          .localCheckpoint()
      } finally ctx.unpersist()
    } finally toks.unpersist()
  }

  /**
   * STUPID BACKOFF scoring (Brants et al. 2007 — the web-scale
   * MapReduce LM): score HELD-OUT documents against n-gram count
   * tables trained on a separate corpus. Unlike the interpolated
   * ladder ([[trigramSurprisal]], which scores its own training
   * stream and so never meets an unseen n-gram), this is the
   * train/score split a production quality-scorer runs — backoff
   * genuinely fires. Per scored token w₃ with context (w₁, w₂):
   *
   *   trigram seen:        c(w₁w₂w₃)/c(w₁w₂)
   *   else bigram seen:    0.4 · c(w₂w₃)/c(w₂)
   *   else:                0.16 · S₁(w₃)       (0.4 per backed-off level)
   *   p = 1 top level:     c(w₁w₂)/c(w₁), else 0.4 · S₁
   *   p = 0:               S₁
   *
   * with S₁(w) = (c(w)+1)/(N+V) add-one smoothed so OOV tokens score
   * finite (stupid backoff's scores are relative frequencies, not a
   * normalized distribution — the point is cheap mergeable counts).
   * Determinism: every term is a double division of EXACT integer
   * counts with literal weights in fixed order; ln truncates ONCE to
   * integer micro-nats. N and V ride a one-row frame (no driver
   * scalar). Scale shape: the count tables are three map-side-combined
   * groupBys over the TRAIN stream; scoring joins the score stream
   * against them on their own keys (AQE broadcasts while vocabularies
   * fit); per-doc lag windows partition on the doc id.
   */
  def stupidBackoff(
      train: DataFrame, score: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    def ctx(df: DataFrame): DataFrame = {
      val w = Window.partitionBy(col("id")).orderBy(col("pos"))
      graft.util.Tables.spread(df)
        .select(col(idCol).as("id"),
          posexplode(TextAnalysis.normTokens(col(textCol))))
        .toDF("id", "pos", "tok")
        .withColumn("p1", lag(col("tok"), 1).over(w))
        .withColumn("p2", lag(col("tok"), 2).over(w))
    }
    val ctxT = ctx(train).persist()
    try {
      val uni = ctxT.groupBy(col("tok")).agg(count(lit(1)).as("c"))
      val bi = ctxT.filter(col("p1").isNotNull)
        .groupBy(col("p1").as("ba"), col("tok").as("bb"))
        .agg(count(lit(1)).as("c"))
      val tri = ctxT.filter(col("p2").isNotNull)
        .groupBy(col("p2").as("ta"), col("p1").as("tb"), col("tok").as("tc"))
        .agg(count(lit(1)).as("ct"))
      val tot = uni.agg(sum(col("c")).as("n"), count(lit(1)).as("v"))
      val s1 = (coalesce(col("cu3"), lit(0L)) + 1L).cast("double") /
        (col("n") + col("v")).cast("double")
      val u = when(col("p1").isNull, -log(s1))
        .when(col("p2").isNull,
          when(col("cb23").isNotNull,
            -log(col("cb23").cast("double") / col("cu2")))
            .otherwise(-log(lit(0.4) * s1)))
        .otherwise(
          when(col("ct").isNotNull,
            -log(col("ct").cast("double") / col("cb12")))
            .when(col("cb23").isNotNull,
              -log(lit(0.4) * (col("cb23").cast("double") / col("cu2"))))
            .otherwise(-log(lit(0.16) * s1)))
      ctx(score)
        .join(uni.select(col("tok").as("u3k"), col("c").as("cu3")),
          col("tok") === col("u3k"), "left")
        .join(uni.select(col("tok").as("u2k"), col("c").as("cu2")),
          col("p1") === col("u2k"), "left")
        .join(bi.select(col("ba").as("b23a"), col("bb").as("b23b"),
            col("c").as("cb23")),
          col("p1") === col("b23a") && col("tok") === col("b23b"), "left")
        .join(bi.select(col("ba").as("b12a"), col("bb").as("b12b"),
            col("c").as("cb12")),
          col("p2") === col("b12a") && col("p1") === col("b12b"), "left")
        .join(tri,
          col("p2") === col("ta") && col("p1") === col("tb") &&
            col("tok") === col("tc"), "left")
        .crossJoin(broadcast(tot))
        .select(col("id"),
          floor(u * 1000000L).cast("long").as("u"),
          col("cu3"))
        .groupBy(col("id")).agg(
          count(lit(1)).as("n_tokens"),
          sum(col("u")).as("surprisal_unats"),
          sum(when(col("cu3").isNull, 1L).otherwise(0L)).as("n_oov"))
        .select(col("id"), col("n_tokens"), col("surprisal_unats"),
          expr("surprisal_unats div n_tokens").as("mean_unats"),
          col("n_oov"))
        .localCheckpoint()
    } finally ctxT.unpersist()
  }

  /**
   * Interpolated KNESER-NEY bigram scoring (Chen & Goodman 1999 —
   * the smoothing KenLM/SRILM ship as the n-gram standard) on the
   * same held-out train/score split as [[stupidBackoff]]. KN's
   * insight over count backoff: the lower-order distribution should
   * be the CONTINUATION probability — how many distinct contexts a
   * word follows — not its raw frequency ("San Francisco" makes
   * "Francisco" frequent but it only ever follows "San", so it
   * should get almost no unigram mass). Per scored token w with
   * context a, fixed discount D = 0.75:
   *
   *   p_cont(w)      = (N1+(·,w) + 1) / (B + V)       (add-one so OOV
   *                                                     scores finite)
   *   context seen:  p = (max(c(a,w) − D, 0)
   *                       + D · N1+(a,·) · p_cont(w)) / c(a,·)
   *   context unseen or first token:  p = p_cont(w)
   *
   * with N1+(a,·) = distinct types following a, N1+(·,w) = distinct
   * contexts preceding w, B = distinct bigram count, V = vocabulary
   * size. The interpolation weight D·N1+(a,·)/c(a,·) is exactly the
   * mass the discount removed, so p sums to 1 over seen vocabularies.
   *
   * Determinism: every term is double arithmetic over EXACT integer
   * counts with literal constants in fixed order; ln truncates ONCE
   * to integer micro-nats (the [[stupidBackoff]] convention, so both
   * engines replay bit-identically). B and V ride a one-row broadcast
   * frame — no driver scalar.
   *
   * Scale shape: all four model tables (bigram counts, context
   * totals, following-type counts, preceding-type counts) are
   * map-side-combined groupBys over ONE context pass of the TRAIN
   * stream; they are mergeable across shards exactly like the
   * [[stupidBackoff]] tables (Brants 2007's argument applies
   * unchanged — distinct-type counts merge because the bigram table
   * they derive from merges). Scoring joins the score stream on the
   * model keys; AQE broadcasts while vocabularies fit.
   */
  def knSurprisal(
      train: DataFrame, score: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    def ctx(df: DataFrame): DataFrame = {
      val w = Window.partitionBy(col("id")).orderBy(col("pos"))
      graft.util.Tables.spread(df)
        .select(col(idCol).as("id"),
          posexplode(TextAnalysis.normTokens(col(textCol))))
        .toDF("id", "pos", "tok")
        .withColumn("p1", lag(col("tok"), 1).over(w))
    }
    val ctxT = ctx(train).persist()
    try {
      val bi = ctxT.filter(col("p1").isNotNull)
        .groupBy(col("p1").as("ba"), col("tok").as("bb"))
        .agg(count(lit(1)).as("cab"))
      val biP = bi.persist()
      try {
        val cctx = biP.groupBy(col("ba").as("ck"))
          .agg(sum(col("cab")).as("cctx"),
            count(lit(1)).as("n1fol"))
        val npre = biP.groupBy(col("bb").as("pk"))
          .agg(count(lit(1)).as("n1pre"))
        val vocab = ctxT.groupBy(col("tok")).agg(count(lit(1)).as("c"))
        val tot = biP.agg(count(lit(1)).as("b"))
          .crossJoin(vocab.agg(count(lit(1)).as("v")))
        val pcont = (coalesce(col("n1pre"), lit(0L)) + 1L).cast("double") /
          (col("b") + col("v")).cast("double")
        val u = when(col("p1").isNull || col("cctx").isNull, -log(pcont))
          .otherwise(-log(
            (greatest(coalesce(col("cab"), lit(0L)).cast("double") -
              lit(0.75), lit(0.0)) +
              lit(0.75) * col("n1fol") * pcont) /
              col("cctx").cast("double")))
        ctx(score)
          .join(bi.select(col("ba"), col("bb"), col("cab")),
            col("p1") === col("ba") && col("tok") === col("bb"), "left")
          .join(cctx, col("p1") === col("ck"), "left")
          .join(npre, col("tok") === col("pk"), "left")
          .join(vocab.select(col("tok").as("vk"), col("c").as("cu")),
            col("tok") === col("vk"), "left")
          .crossJoin(broadcast(tot))
          .select(col("id"),
            floor(u * 1000000L).cast("long").as("u"),
            col("cu"))
          .groupBy(col("id")).agg(
            count(lit(1)).as("n_tokens"),
            sum(col("u")).as("surprisal_unats"),
            sum(when(col("cu").isNull, 1L).otherwise(0L)).as("n_oov"))
          .select(col("id"), col("n_tokens"), col("surprisal_unats"),
            expr("surprisal_unats div n_tokens").as("mean_unats"),
            col("n_oov"))
          .localCheckpoint()
      } finally biP.unpersist()
    } finally ctxT.unpersist()
  }

  /**
   * CCNet-style perplexity bucketing: score every document with the
   * corpus-trained unigram LM ([[unigramSurprisal]]), then split each
   * language into equal-count head / middle / tail thirds by mean
   * token surprisal (head = most-probable text — the slice CCNet
   * keeps; tail = rare-token noise). The bucket metric is the exact
   * integer `surprisal_unats div n_tokens` and the split is
   * `ntile(3)` over the total order (metric, id) — no floating point
   * anywhere in the decision, so any engine replays the exact same
   * bucket per document (interpolated-percentile cutoffs would risk
   * 1-ulp disagreement at bucket boundaries).
   *
   * Scale shape: [[unigramSurprisal]]'s shuffles, one doc-id join for
   * the language, then ONE window per language over per-DOCUMENT rows
   * (a few orders lighter than the token-level passes). The ntile
   * window funnels each language through one partition; at corpus
   * scales where that bites, swap the ntile for approx_percentile
   * cutoffs broadcast as metadata — the decision becomes approximate,
   * which is why the exact form is the default here.
   */
  def pplBuckets(
      df: DataFrame, idCol: String, textCol: String,
      langCol: String): DataFrame = {
    val withLang = scoredWithLang(df, idCol, textCol, langCol)
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("mu_unats"), col("id"))
    withLang.withColumn("b", ntile(3).over(w))
      .select(col("id"), col("lang"), col("n_tokens"), col("mu_unats"),
        when(col("b") === 1, "head").when(col("b") === 2, "middle")
          .otherwise("tail").as("ppl_bucket"))
  }

  private def scoredWithLang(
      df: DataFrame, idCol: String, textCol: String,
      langCol: String): DataFrame =
    unigramSurprisal(df, idCol, textCol)
      .join(df.select(col(idCol).as("id"), col(langCol).as("lang")),
        Seq("id"))
      .withColumn("mu_unats", expr("surprisal_unats div n_tokens"))

  /**
   * The corpus-scale variant of [[pplBuckets]]: instead of the exact
   * per-language `ntile` (whose window funnels each language through
   * ONE task — fine until a single language holds 10⁹+ documents),
   * split on `approx_percentile` cutoffs at 1/3 and 2/3 — a
   * t-digest-style sketch aggregate with map-side mergeable partials,
   * so no task ever sees more than its partition. The cutoff frame is
   * |languages| rows of metadata, broadcast back; the bucket decision
   * becomes `mu < c33 / mu < c67 / else` on the exact integer metric.
   *
   * The cutoff compares a UNIQUIFIED order key — `mu_unats·2²⁰ +
   * (id mod 2²⁰)` — not the raw metric: integer surprisal means tied
   * at the 1/3 boundary are common, and a value cutoff would dump a
   * whole tie group into one bucket where ntile splits it by (metric,
   * id) rank. The salt makes boundary values distinct, so the sketch
   * cutoff reproduces the rank split up to the sketch's rank error
   * (and, for ids past 2²⁰, up to tie-group-internal order — same
   * bucket COUNTS, possibly different members within one boundary tie
   * group). ExtSpec pins ≥ 99% per-document agreement with the exact
   * form on the gate corpus. `accuracy` is Spark's
   * `approx_percentile` knob (1/accuracy relative rank error).
   */
  def pplBucketsApprox(
      df: DataFrame, idCol: String, textCol: String,
      langCol: String, accuracy: Int = 10000): DataFrame = {
    val salt = 1048576L // 2^20: metric stays the high-order word
    // numeric ids keep their own order inside a tie group (exact
    // ntile tie-break parity while id < 2^20); non-numeric ids fall
    // back to a hash order — same bucket counts, boundary tie-group
    // membership may differ from the exact form
    val idOrd = coalesce(expr("try_cast(id AS long)"),
      xxhash64(col("id").cast("string")))
    val withLang = scoredWithLang(df, idCol, textCol, langCol)
      .withColumn("__ukey", col("mu_unats") * salt + pmod(idOrd, lit(salt)))
    val cuts = withLang.groupBy(col("lang")).agg(
      percentile_approx(col("__ukey"), lit(1.0 / 3), lit(accuracy))
        .as("c33"),
      percentile_approx(col("__ukey"), lit(2.0 / 3), lit(accuracy))
        .as("c67"))
    withLang.join(broadcast(cuts), Seq("lang"))
      .select(col("id"), col("lang"), col("n_tokens"), col("mu_unats"),
        when(col("__ukey") <= col("c33"), "head")
          .when(col("__ukey") <= col("c67"), "middle")
          .otherwise("tail").as("ppl_bucket"))
  }

  /**
   * Deterministic domain-mixture sampling: downsample each domain so
   * the surviving corpus hits the target proportions `weights`
   * (relative integer weights) with maximum retention. Entirely
   * exact-integer: the scaled budget per domain is
   * `w_d * min_d(count_d div w_d)` and the keep-threshold is its
   * bucket share `(budget_d * 1e6) div count_d` — no double ever
   * enters the decision, so every engine selects the identical rows.
   * Domains absent from `weights` are dropped (weight 0).
   *
   * The per-domain counts are ≤ |domains| longs — driver-side
   * metadata, not data (the same contract as IVF centroids). The
   * selection itself is a pure narrow hash filter, zero shuffles.
   */
  def mixture(
      df: DataFrame, idCol: String, domainCol: String,
      weights: Map[String, Long]): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "weights must be positive")
    val counts = df.groupBy(col(domainCol)).agg(count(lit(1)).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val present = weights.filter { case (d, _) => counts.getOrElse(d, 0L) > 0 }
    val budgetUnit = present.map { case (d, w) => counts(d) / w }
      .foldLeft(Long.MaxValue)(math.min)
    // A weighted domain with fewer rows than its weight integer-divides
    // to 0, which would zero EVERY domain's budget — silent total data
    // loss. Fail loudly naming the limiting domain instead.
    if (present.nonEmpty && budgetUnit == 0L) {
      val limiting = present.minBy { case (d, w) => counts(d) / w }._1
      throw new IllegalArgumentException(
        s"mixture: domain '$limiting' has ${counts(limiting)} rows but " +
          s"weight ${present(limiting)} — the weighted budget rounds to " +
          "zero and would drop the entire corpus; lower its weight or " +
          "drop the domain from the mix")
    }
    val thresholds: Map[String, Long] = present.map { case (d, w) =>
      // BigInt: w·budgetUnit is bounded by the domain count, so the
      // ·1e6 product overflows Long once a weighted domain passes
      // ~9e12 rows — driver-side metadata math, so arbitrary
      // precision costs nothing (the quotient is always ≤ 1e6)
      d -> ((BigInt(w) * budgetUnit * Buckets) / counts(d)).toLong
    }
    val thresholdCol = thresholds.foldLeft(lit(0L)) {
      case (acc, (d, thr)) =>
        when(col(domainCol) === d, lit(thr)).otherwise(acc)
    }
    df.filter(
      pmod(TextAnalysis.portableHash60(col(idCol).cast("string")),
        lit(Buckets)) < thresholdCol)
  }

  /**
   * Temperature-flattened domain mixture — the standard multi-domain
   * sampling knob (T > 1 flattens toward uniform, T < 1 sharpens;
   * T = 1 is exactly [[mixture]]): effective integer milli-weights
   * `round(w^(1/T) · 1000)` are computed ONCE on the driver (the
   * only floating point, evaluated in one place and shipped as
   * literals), then the selection path is [[mixture]]'s
   * exact-integer machinery unchanged.
   */
  def mixtureTemperature(
      df: DataFrame, idCol: String, domainCol: String,
      weights: Map[String, Long], temperature: Double,
      scale: Long = 1000L): DataFrame = {
    require(temperature > 0, "temperature must be positive")
    mixture(df, idCol, domainCol,
      temperatureMilliWeights(weights, temperature, scale))
  }

  /** The driver-side weight transform, exposed so an oracle (or any
    * replica) can embed the IDENTICAL integer weights. `scale` sets
    * the integer resolution of the flattened weights; every domain
    * must carry at least `scale`-ish rows (the [[mixture]] budget
    * guard fires loudly otherwise), so small corpora use a coarser
    * scale. */
  def temperatureMilliWeights(
      weights: Map[String, Long], temperature: Double,
      scale: Long = 1000L): Map[String, Long] =
    weights.map { case (d, w) =>
      d -> math.max(1L,
        math.round(math.pow(w.toDouble, 1.0 / temperature) * scale))
    }

  /**
   * Corpus vocabulary with document frequencies — the first step of
   * tokenizer training / BPE corpus preparation: every token with its
   * total count and the number of documents containing it, thresholded
   * by `minCount`. One explode + one groupBy(token) with map-side
   * partials; at 100 TB the vocabulary frame IS the bounded output.
   */
  def vocabulary(
      df: DataFrame, idCol: String, textCol: String,
      minCount: Long = 2L): DataFrame =
    graft.util.Tables.spread(df)
      .select(col(idCol).as("id"),
        explode(TextAnalysis.normTokens(col(textCol))).as("tok"))
      .groupBy(col("tok"))
      .agg(count(lit(1)).as("n_total"),
        countDistinct(col("id")).as("n_docs"))
      .filter(col("n_total") >= minCount)

  /**
   * TF-IDF top-`topK` terms per document — the classic keyword /
   * salient-term extraction over a corpus (document routing, topic
   * tagging, per-domain vocabulary drift monitoring in a training
   * pipeline). Scoring is exact-integer end to end: the only double
   * is `ln(N/df)`, truncated once to integer micro-nats
   * (`idf_micro`), then `score_micro = tf · idf_micro` is pure LONG
   * arithmetic and the per-doc top-k rank is a total order
   * (score desc, token asc) — replayable by any engine.
   *
   * Scale shape: one explode + one groupBy(id, token) with map-side
   * partials for TF; document frequency is ONE more groupBy over the
   * (already unique) TF frame — vocabulary-sized output, joined back
   * on token (AQE broadcasts it while the vocab fits, shuffles
   * otherwise — both correct); the final top-k window partitions on
   * the document id, so there is no global hot key at any corpus
   * size. N is a driver-side scalar (one count job), never data.
   */
  def tfidfTopTerms(
      df: DataFrame, idCol: String, textCol: String,
      topK: Int = 3): DataFrame = {
    require(topK > 0, "topK must be positive")
    val nDocs = df.count()
    val tf = graft.util.Tables.spread(df)
      .select(col(idCol).as("id"),
        explode(TextAnalysis.normTokens(col(textCol))).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy(col("id"), col("tok"))
      .agg(count(lit(1)).as("tf"))
    // TF rows are unique per (id, tok), so document frequency is a
    // plain count per token over the TF frame — no countDistinct.
    // count(nullif(tf, -1)) equals count(*) (tf >= 1, the nullif never
    // fires) but its nullability stops the optimizer from rewriting it
    // to count(1) and pruning the tf column — which would specialize
    // this branch's aggregate, de-canonicalize it from the join's left
    // side, and run the whole scan + regex explode + (id, tok) shuffle
    // TWICE. With tf kept alive the shared shuffle stage is reused and
    // the corpus is tokenized exactly once — the dominant cost at scale.
    val dfreq = tf.groupBy(col("tok"))
      .agg(count(nullif(col("tf"), lit(-1L))).as("n_docs"))
      .withColumn("idf_micro",
        floor(log(lit(nDocs.toDouble) / col("n_docs")) * 1000000L)
          .cast("long"))
    val w = Window.partitionBy(col("id"))
      .orderBy(col("score_micro").desc, col("tok"))
    tf.join(dfreq, Seq("tok"))
      .withColumn("score_micro", col("tf") * col("idf_micro"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("id"), col("tok"), col("tf"), col("idf_micro"),
        col("score_micro"), col("rank"))
  }

  /**
   * Okapi BM25 ranking of documents against a FIXED query-term set —
   * the retrieval scorer quality-filter pipelines use to mine
   * topic-relevant subsets out of a web corpus.
   *
   * Scale shape: unlike TF-IDF (which must shuffle every (doc, token)
   * pair because every token can matter), BM25 against k query terms
   * needs NO token shuffle at all — per-term tf and the document
   * length are narrow array expressions over each row, the only
   * aggregations are one scalar pass for (N, Σdl, per-term df), whose
   * result is a single driver row folded back in as literals, and the
   * final global top-k plans as TakeOrderedAndProject (per-partition
   * heaps, never a full sort). The corpus is scanned exactly twice
   * and nothing wider than k columns ever moves.
   *
   * Determinism: idf is quantized to micro units BEFORE scoring, the
   * per-term contribution is floored to micro units BEFORE the
   * cross-term sum (an integer sum is order-independent; a double sum
   * is not), and the oracle mirrors the exact expression tree —
   * including computing `1 + k1` rather than a pre-added literal, so
   * both engines round the same decimal parses the same way.
   *
   * @return top-k (id, score_micro, rank) among docs matching ≥1 term.
   */
  def bm25TopDocs(
      df: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], topK: Int = 20,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    require(queryTerms.distinct == queryTerms, "queryTerms must be distinct")
    require(topK > 0, "topK must be positive")
    val toks = TextAnalysis.normTokens(col(textCol))
    val tfCols = queryTerms.indices.map { i =>
      size(filter(toks, x => x === lit(queryTerms(i)))).cast("long")
        .as(s"tf$i")
    }
    val base = graft.util.Tables.spread(df).select(
      col(idCol).as("id") +:
        size(filter(toks, x => length(x) > 0)).cast("long").as("dl") +:
        tfCols: _*)
    // one scalar aggregate: N, Σdl, df per term — bounded driver row
    val statCols =
      count(lit(1)).as("n") +: sum(col("dl")).as("sdl") +:
        queryTerms.indices.map(i =>
          sum(when(col(s"tf$i") > 0, 1L).otherwise(0L)).as(s"df$i"))
    val statsRow = base.agg(statCols.head, statCols.tail: _*).collect()(0)
    val nDocs = statsRow.getLong(0)
    // empty corpus: no stats to fold back — return the empty result
    // with the full output schema (Σdl is NULL here, don't touch it)
    if (nDocs == 0L)
      return base.select(col("id"), lit(0L).as("score_micro"),
        lit(0).as("rank")).limit(0)
    val avgdl = statsRow.getLong(1).toDouble / nDocs
    val idfMicro = queryTerms.indices.map { i =>
      val dfi = statsRow.getLong(2 + i).toDouble
      math.floor(math.log((nDocs - dfi + 0.5) / (dfi + 0.5) + 1.0)
        * 1000000L).toLong
    }
    val contribs = queryTerms.indices.map { i =>
      val tf = col(s"tf$i").cast("double")
      val denom = tf +
        lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / lit(avgdl))
      floor(lit(idfMicro(i)) * tf * (lit(1.0) + lit(k1)) / denom)
        .cast("long")
    }
    val scored = base
      .withColumn("score_micro", contribs.reduce(_ + _))
      .filter(col("score_micro") > 0)
      .select(col("id"), col("score_micro"))
      .orderBy(col("score_micro").desc, col("id"))
      .limit(topK)
    // rank over the already-reduced k rows (single tiny partition)
    val w = Window.orderBy(col("score_micro").desc, col("id"))
    scored.withColumn("rank", row_number().over(w))
  }

  /**
   * Inverted index with CAPPED posting lists: (token, df, rank, id,
   * tf) rows for the top-`maxPostings` documents per token (tf desc,
   * id asc — a total order), plus the token's full document
   * frequency. The retrieval-side companion to [[bm25TopDocs]]: at
   * serving time a query term looks up its top postings instead of
   * scanning the corpus.
   *
   * Scale shape: ONE (token, doc) shuffle builds term frequencies
   * with map-side combine; rank and df come from two window
   * functions over the SAME token partitioning (one exchange, one
   * WindowExec). The df column deliberately rides the window rather
   * than a second aggregate + join — token partitions are bounded by
   * document frequency, and hot stopword tokens are exactly the rows
   * the cap discards. Long format (no collect_list) keeps every row
   * bounded and the oracle trivially replayable.
   */
  def invertedIndex(
      df: DataFrame, idCol: String, textCol: String,
      maxPostings: Int): DataFrame = {
    require(maxPostings > 0, "maxPostings must be positive")
    val tf = graft.util.Tables.spread(df)
      .select(col(idCol).as("id"),
        explode(TextAnalysis.normTokens(col(textCol))).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy(col("tok"), col("id"))
      .agg(count(lit(1)).as("tf"))
    val byTok = Window.partitionBy(col("tok"))
    val ranked = byTok.orderBy(col("tf").desc, col("id"))
    tf.withColumn("rank", row_number().over(ranked))
      .withColumn("df", count(lit(1)).over(byTok))
      .filter(col("rank") <= maxPostings)
      .select(col("tok"), col("df"), col("rank"), col("id"), col("tf"))
  }

  /**
   * BOUNDARY-AWARE merge-chain expression shared by [[bpeApply]] and
   * [[bpeEncode]]: the word renders to the canonical "every symbol
   * wrapped in its own spaces" form — `" c "` per character plus a
   * trailing `" </w> "` end-of-word marker (the [[bpeTrain]] symbol
   * alphabet) — so adjacent symbols are separated by a DOUBLE space
   * and each merge is a plain-substring `replace(" a  b ", " ab ")`.
   * Because every symbol owns both of its delimiter spaces, a match
   * can never span a symbol boundary (`"o the r"` + merge (e,r) does
   * NOT fire on the trailing `e` of `the`) and consecutive
   * occurrences never share boundary characters, so
   * leftmost-nonoverlapping `replace` IS Sennrich merge application
   * — greedy left-to-right over whole symbols — with no regex and
   * no fixpoint iteration, byte-exact in any engine.
   */
  private def bpeMergeChain(
      word: Column, merges: Seq[(String, String)]): Column = {
    val spaced = concat(
      regexp_replace(word, "(.)", " $1 "), lit(" </w> "))
    val merged = merges.foldLeft(spaced) { case (acc, (a, b)) =>
      replace(acc, lit(s" $a  $b "), lit(s" ${a + b} "))
    }
    trim(replace(merged, lit("  "), lit(" ")))
  }

  /** Expression-chain depth cap for [[bpeMergeChain]]: the chain nests
    * one `replace` per merge into a single Column, so its analysis /
    * codegen cost is O(#merges) tree depth — fine at fixture scale,
    * fatal at production tokenizer scale (30k–50k merges exceed
    * Catalyst's analysis and janino's method-size limits). Above this
    * cap [[bpePiecesFrame]] switches to the mapPartitions greedy
    * merger, spec-proven byte-equal on training-order merge lists. */
  private[graft] val bpeChainDepthLimit = 64

  /** A word's symbol sequence split per Unicode CODEPOINT (a surrogate
    * pair is one symbol, never two lone surrogates) — the alphabet all
    * three BPE paths share: [[bpeTrain]], [[bpeMergeChain]] (Java
    * regex `(.)` matches per codepoint), and [[bpeGreedyPieces]]. The
    * DuckDB oracle's RE2 `(.)` also splits per codepoint, so parity
    * holds beyond the BMP. */
  private[graft] def codepointSymbols(w: String): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    while (i < w.length) {
      val n = Character.charCount(w.codePointAt(i))
      out += w.substring(i, i + n)
      i += n
    }
    out.result()
  }

  /** Greedy BPE merge application — the PRODUCTION-SCALE path
    * (Sennrich et al., ACL 2016 §3, the `apply_bpe` algorithm):
    * repeatedly merge the leftmost occurrence of the lowest-rank
    * adjacent symbol pair until no pair is in the model. Byte-equal
    * to [[bpeMergeChain]] for TRAINING-ORDER merge lists (each
    * merge's constituents produced only by earlier merges — every
    * [[bpeTrain]] output satisfies this, because a pair can only be
    * counted after its constituent symbols exist): under that order a
    * merge can never re-create a lower-rank pair, so "apply each
    * merge exhaustively in list order" and "always merge the
    * lowest-rank pair present" coincide. Cost is O(|word|²) hash
    * lookups per word type — independent of merge-list size, which
    * only enters through the broadcast rank map. */
  private[graft] def bpeGreedyPieces(
      word: String, rank: collection.Map[(String, String), Int]): String = {
    val syms = scala.collection.mutable.ArrayBuffer.from(codepointSymbols(word))
    syms += "</w>"
    var more = syms.length > 1
    while (more) {
      var bestRank = Int.MaxValue
      var bestI = -1
      var i = 0
      while (i < syms.length - 1) {
        val r = rank.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestI = i }
        i += 1
      }
      if (bestI < 0) more = false
      else {
        syms(bestI) = syms(bestI) + syms(bestI + 1)
        syms.remove(bestI + 1)
        more = syms.length > 1
      }
    }
    syms.mkString(" ")
  }

  /** (w, pieces) mapping for a word-type frame (must expose a `w`
    * string column; other columns pass through). Dispatches on model
    * size: ≤[[bpeChainDepthLimit]] merges run the oracle-replayable
    * [[bpeMergeChain]] expression (whole-stage codegen, zero JVM
    * boundary); larger models — real tokenizers — run
    * [[bpeGreedyPieces]] in mapPartitions with the rank map broadcast
    * once (a few MB for a 50k-merge model; the per-executor cost is
    * one hash map, not an expression tree). */
  private[graft] def bpePiecesFrame(
      types: DataFrame, merges: Seq[(String, String)]): DataFrame =
    if (merges.size <= bpeChainDepthLimit)
      types.withColumn("pieces", bpeMergeChain(col("w"), merges))
    else {
      val s = types.sparkSession
      import s.implicits._
      // keep-FIRST rank on duplicates, mirroring the chain (whose
      // first application of a duplicated pair wins); bpeTrain can
      // never emit duplicates, so this is belt-and-braces
      val rank = new java.util.HashMap[(String, String), Int]()
      merges.zipWithIndex.foreach { case (p, i) =>
        rank.putIfAbsent(p, i)
      }
      val bc = s.sparkContext.broadcast(
        scala.jdk.CollectionConverters.MapHasAsScala(rank).asScala)
      val pieces = types.select(col("w")).as[String]
        .mapPartitions { it =>
          val r = bc.value
          it.map(w => (w, bpeGreedyPieces(w, r)))
        }.toDF("w", "pieces")
      types.join(broadcast(pieces), Seq("w"))
    }

  /**
   * Apply an ORDERED BPE merge list to the corpus word-type table —
   * the tokenizer-APPLY path (the production op that runs over every
   * corpus ingest; training the merges is [[bpeTrain]], certified
   * against the Sennrich hand example). Each word splits to the
   * [[bpeTrain]] symbol alphabet (characters + `</w>` end-of-word
   * marker — the SAME alphabet training emits merges over, so
   * trained merges actually apply) and the merges rewrite it in
   * sequence via the boundary-aware [[bpeMergeChain]]. Output is the
   * top-`topWords` vocabulary (freq desc, word asc — a total order)
   * with each word's piece sequence and count.
   *
   * Scale shape: ONE corpus shuffle builds the word-type table (the
   * [[wordTypeTable]] map-side-combined groupBy); the merge chain is
   * a narrow expression over the bounded vocabulary, and the top-N
   * collapses through TakeOrdered — no global sort materializes.
   */
  def bpeApply(
      df: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)], topWords: Int = 200): DataFrame = {
    require(merges.nonEmpty && topWords > 0,
      "merges must be non-empty and topWords positive")
    val top = wordTypeTable(df, idCol, textCol)
      .orderBy(col("freq").desc, col("w")).limit(topWords)
    bpePiecesFrame(top, merges)
      .select(col("w"), col("freq"), col("pieces"))
      .withColumn("n_pieces",
        size(split(col("pieces"), " ")).cast("long"))
  }

  /**
   * BPE corpus ENCODE — apply a trained merge list to full document
   * text and reassemble per-document token (piece) sequences, the
   * step that turns a tokenizer model into training-ready token
   * streams (Sennrich et al., ACL 2016 §3: encode = per-word greedy
   * merge application). Returns one row per non-empty document:
   * (id, n_words, n_tokens, tokens) where `tokens` is the
   * space-joined piece sequence in document word order (pieces carry
   * the `</w>` marker, so the original word boundaries survive).
   *
   * Scale shape: ONE tokenize pass (posexplode keeps word order),
   * the merge chain runs over the DISTINCT word-type table — not per
   * occurrence — and joins back by word (broadcast: the type table
   * is vocabulary-sized, ~10⁶–10⁷ at 100 TB), then one groupBy(id)
   * reassembles. At real scale the `tokens` string column becomes an
   * array column feeding [[packSequencesByCount]]; the string form
   * keeps the row oracle-replayable.
   */
  def bpeEncode(
      df: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    require(merges.nonEmpty, "merges must be non-empty")
    val toks = graft.util.Tables.spread(df)
      .select(col(idCol).as("id"),
        posexplode(TextAnalysis.normTokens(col(textCol)))
          .as(Seq("pos", "w")))
      .filter(length(col("w")) > 0)
    val types = bpePiecesFrame(toks.select(col("w")).distinct(), merges)
      .withColumn("n_pieces",
        size(split(col("pieces"), " ")).cast("long"))
    toks.join(broadcast(types), Seq("w"))
      .groupBy(col("id"))
      .agg(
        count(lit(1)).as("n_words"),
        sum(col("n_pieces")).as("n_tokens"),
        array_join(
          transform(array_sort(collect_list(struct(col("pos"),
            col("pieces")))), x => x.getField("pieces")),
          " ").as("tokens"))
  }

  /**
   * Tokenizer fertility audit — the standard "is this tokenizer fair
   * to every language" diagnostic (cf. the fertility metric in
   * multilingual-tokenizer studies: pieces emitted per word): per
   * language, documents / words / BPE pieces / word characters, plus
   * truncating-ppm ratios `fertility_ppm` (pieces per word) and
   * `chars_per_piece_ppm` (compression: characters per piece). High
   * fertility on a language means the vocabulary under-serves it —
   * its documents consume more sequence budget per sentence.
   *
   * Built on [[bpeEncode]] (ONE tokenize pass, merge chain over the
   * distinct word-type table, broadcast join back); the character
   * side is a second narrow projection aggregated per document, and
   * the join is two doc-keyed aggregates — nothing wider than per-doc
   * counts shuffles, and the per-language rollup is a handful of
   * rows. Documents with no non-empty word carry no fertility signal
   * and are excluded (they have no pieces to count).
   */
  def tokenizerFertility(
      df: DataFrame, idCol: String, textCol: String, langCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val enc = bpeEncode(df, idCol, textCol, merges)
    val toks = TextAnalysis.normTokens(col(textCol))
    val chars = df.select(col(idCol).as("id"), col(langCol).as("lang"),
      aggregate(filter(toks, w => length(w) > 0), lit(0L),
        (acc, w) => acc + length(w)).as("word_chars"))
    enc.join(chars, Seq("id"))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_words")).as("n_words"),
        sum(col("n_tokens")).as("n_pieces"),
        sum(col("word_chars")).as("n_chars"))
      .withColumn("fertility_ppm", expr("(n_pieces * 1000000) div n_words"))
      .withColumn("chars_per_piece_ppm",
        expr("(n_chars * 1000000) div n_pieces"))
  }

  /**
   * Unigram-LM tokenization (Kudo 2018, arXiv:1804.10959 — the
   * SentencePiece default; the other tokenizer family production
   * stacks ship besides BPE). This is the frequency-seeded
   * vocabulary + Viterbi segmentation: candidate pieces are every
   * codepoint substring of length ≤ `maxPieceLen` of the word-type
   * table scored by corpus frequency (exactly Kudo §3.2's EM seed),
   * the vocabulary keeps ALL single codepoints (so segmentation
   * always totals) plus the top `vocabSize` multi-codepoint pieces
   * by (freq desc, piece asc), and each word type is segmented by
   * the minimum-cost path over piece costs
   * `floor(ln(N/freq)·1e6)` micro-nats (N = total candidate mass).
   *
   * Determinism without path tie-breaking: the DP minimizes the
   * PAIR (cost, n_pieces) lexicographically by packing it into one
   * BIGINT `v = cost·64 + n_pieces` — additive across pieces and
   * carry-free (n_pieces ≤ maxWordLen < 64), so plain integer min
   * IS the pair min and every engine lands on the identical (cost,
   * piece-count) even when distinct segmentations tie on cost.
   * Words beyond `maxWordLen` codepoints bypass segmentation as a
   * single piece of cost 0 (the SentencePiece long-token escape
   * hatch), bounding the DP and the oracle's unrolled depth.
   *
   * Scale shape: ONE tokenize pass; candidate generation and the
   * Viterbi DP run over the DISTINCT word-type table — not per
   * occurrence — in a mapPartitions with the broadcast vocab map
   * (vocabSize + alphabet entries, model-sized); one broadcast join
   * back and one per-doc aggregate. The only driver-side data is
   * the vocabulary itself and the 1-row total — bounded model
   * metadata, the [[bpeTrain]] convention.
   *
   * @return (id, n_words, n_pieces, cost_unats) per document with at
   *         least one non-empty word.
   */
  def unigramEncode(
      df: DataFrame, idCol: String, textCol: String,
      vocabSize: Int = 512, maxPieceLen: Int = 4,
      maxWordLen: Int = 40): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val toks = graft.util.Tables.spread(df)
      .select(col(idCol).as("id"),
        explode(TextAnalysis.normTokens(col(textCol))).as("w"))
      .filter(length(col("w")) > 0)
    val types = toks.groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .persist()
    try {
      val cand = types.as[(String, Long)].flatMap { case (w, cnt) =>
        val cp = w.codePoints().toArray
        for {
          i <- cp.indices
          k <- 1 to math.min(maxPieceLen, cp.length - i)
        } yield (new String(cp, i, k), k, cnt)
      }.toDF("piece", "cplen", "cnt")
        .groupBy(col("piece"), col("cplen"))
        .agg(sum(col("cnt")).as("freq"))
        .persist()
      try {
        // sum over an EMPTY candidate table (no non-empty word in the
        // corpus) is NULL — treat as 0: the vocab collects below are
        // empty too, so the join legs produce the correctly-shaped
        // empty result without running the DP
        val totRow = cand.agg(sum(col("freq"))).collect()(0)
        val nTotal = if (totRow.isNullAt(0)) 0L else totRow.getLong(0)
        val singles = cand.filter(col("cplen") === 1)
          .select(col("piece"), col("freq")).collect()
        // the `piece asc` tie-break collation MATCHES DuckDB's binary
        // (UTF-8 byte = codepoint) collation even for pieces mixing
        // non-BMP codepoints with U+E000–U+FFFF: Spark SQL strings
        // are UTF8String, ordered by unsigned UTF-8 byte comparison —
        // NOT Java UTF-16 code-unit order (pinned by the "vocab
        // tie-break collation" spec, ExtSpec)
        val multis = cand.filter(col("cplen") > 1)
          .orderBy(col("freq").desc, col("piece").asc)
          .limit(vocabSize)
          .select(col("piece"), col("freq")).collect()
        val vocab: Map[String, Long] = (singles ++ multis).map { r =>
          val freq = r.getLong(1)
          val cost = math.floor(
            math.log(nTotal.toDouble / freq) * 1000000L).toLong
          r.getString(0) -> (cost * 64L + 1L)
        }.toMap
        encodeUnderVocab(toks, types, vocab, maxPieceLen, maxWordLen)
      } finally cand.unpersist()
    } finally types.unpersist()
  }

  /** The distributed half of the unigram tokenizer, under an explicit
    * (piece → packed `cost·64 + 1`) vocabulary: broadcast-Viterbi
    * over the DISTINCT word-type table, one broadcast join back, one
    * per-doc aggregate. Shared by the seeded [[unigramEncode]] and
    * the trained-model [[unigramEncodeWithVocab]]. */
  private def encodeUnderVocab(
      toks: DataFrame, types: DataFrame, vocab: Map[String, Long],
      maxPieceLen: Int, maxWordLen: Int): DataFrame = {
    val spark = toks.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(vocab)
    val typeV = types.select(col("w")).as[String].mapPartitions { it =>
      val m = bc.value
      it.map { w =>
        val cp = w.codePoints().toArray
        val n = cp.length
        val v =
          if (n > maxWordLen) 1L // overflow escape: 1 piece, cost 0
          else {
            val best = Array.fill(n + 1)(Long.MaxValue)
            best(0) = 0L
            var j = 1
            while (j <= n) {
              var k = 1
              val kMax = math.min(maxPieceLen, j)
              while (k <= kMax) {
                if (best(j - k) != Long.MaxValue) {
                  m.get(new String(cp, j - k, k)) foreach { pv =>
                    val c = best(j - k) + pv
                    if (c < best(j)) best(j) = c
                  }
                }
                k += 1
              }
              j += 1
            }
            best(n) // total: every single codepoint is in vocab
          }
        (w, v)
      }
    }.toDF("w", "v")
    toks.join(broadcast(typeV), Seq("w"))
      .groupBy(col("id"))
      .agg(
        count(lit(1)).as("n_words"),
        sum(expr("v % 64")).as("n_pieces"),
        sum(expr("v div 64")).as("cost_unats"))
      .localCheckpoint()
  }

  /** [[unigramEncode]]'s Viterbi under a TRAINED piece vocabulary
    * (packed `cost·64 + 1` values, e.g. from [[trainUnigramVocab]]) —
    * the production split: the model trains once on the driver over
    * the bounded type table, the encode is the one distributed pass
    * at any corpus scale. */
  def unigramEncodeWithVocab(
      df: DataFrame, idCol: String, textCol: String,
      vocab: Map[String, Long], maxPieceLen: Int = 4,
      maxWordLen: Int = 40): DataFrame = {
    val toks = graft.util.Tables.spread(df)
      .select(col(idCol).as("id"),
        explode(TextAnalysis.normTokens(col(textCol))).as("w"))
      .filter(length(col("w")) > 0)
    val types = toks.select(col("w")).distinct()
    encodeUnderVocab(toks, types, vocab, maxPieceLen, maxWordLen)
  }

  /** The full Kudo training loop over a word-type table, composed
    * from the certified stages: frequency seed ([[unigramSeedScores]],
    * §3.2) capped to the top `seedMultis` multi-codepoint candidates
    * (SentencePiece's seed-vocabulary cap), `emRounds` of
    * forward–backward EM ([[unigramEmRefine]], §3.1/§4), then
    * likelihood-loss pruning to `keepMultis` ([[unigramPrune]], §4
    * step 3). Returns packed micro-nat piece costs
    * (`floor(−ln p · 1e6)·64 + 1`) ready for the Viterbi encode.
    * All single codepoints survive every stage, so segmentation of
    * the training corpus stays total. Pure driver math over the
    * bounded type table — the [[bpeTrain]] convention: the MODEL is
    * small even when the corpus is not. */
  def trainUnigramVocab(
      types: Seq[(String, Long)],
      seedMultis: Int = 512, keepMultis: Int = 256,
      emRounds: Int = 2, maxPieceLen: Int = 4,
      maxWordLen: Int = 40): Map[String, Long] = {
    def cpLen(s: String) = s.codePointCount(0, s.length)
    val seed = unigramSeedScores(types, maxPieceLen)
    val (singles, multis) = seed.toSeq.partition(p => cpLen(p._1) == 1)
    val capped = singles ++ multis
      .sortBy { case (p, sc) => (-sc, p) }.take(seedMultis)
    val z = capped.iterator.map(_._2).sum
    val cappedNorm = capped.map { case (p, sc) => p -> (sc / z) }.toMap
    val em = unigramEmRefine(types, cappedNorm, emRounds,
      maxPieceLen, maxWordLen)
    val pruned = unigramPrune(types, em, keepMultis,
      maxPieceLen, maxWordLen)
    pruned.map { case (p, prob) =>
      p -> (math.floor(-math.log(prob) * 1000000L).toLong * 64L + 1L)
    }
  }

  /**
   * Interpolated Kneser-Ney TRIGRAM scoring — the full Chen &
   * Goodman recursion KenLM ships by default: the discounted trigram
   * distribution interpolates into a MIDDLE-order model built from
   * CONTINUATION counts (how many distinct left contexts a bigram
   * continues — not raw bigram frequency), which interpolates into
   * the continuation unigram of [[knSurprisal]]. Per scored token w
   * with contexts (u, v), fixed discount D = 0.75:
   *
   *   p_cont(w)   = (N1+(·w) + 1) / (B + V)
   *   p_mid(w|v)  = (max(N1+(·vw) − D, 0)
   *                  + D · |{w': N1+(·vw') > 0}| · p_cont(w))
   *                 / N1+(·v·)            [v unseen as middle ⇒ p_cont]
   *   p(w|u,v)    = (max(c(uvw) − D, 0)
   *                  + D · N1+(uv·) · p_mid(w|v)) / c(uv·)
   *                                        [(u,v) unseen ⇒ p_mid]
   *
   * All five model tables (trigram counts; top-level context totals
   * and following-type counts; middle-level continuation counts and
   * their per-context totals; bottom-level preceding-type counts)
   * derive from the distinct trigram/bigram tables by
   * map-side-combined groupBys, so the model merges across shards
   * exactly like [[stupidBackoff]]'s. Same determinism discipline:
   * fixed-order double arithmetic over exact integers, one micro-nat
   * truncation; B and V ride a 1-row broadcast.
   */
  def kn3Surprisal(
      train: DataFrame, score: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    def ctx(df: DataFrame): DataFrame = {
      val w = Window.partitionBy(col("id")).orderBy(col("pos"))
      graft.util.Tables.spread(df)
        .select(col(idCol).as("id"),
          posexplode(TextAnalysis.normTokens(col(textCol))))
        .toDF("id", "pos", "tok")
        .withColumn("p1", lag(col("tok"), 1).over(w))
        .withColumn("p2", lag(col("tok"), 2).over(w))
    }
    val ctxT = ctx(train).persist()
    try {
      val bi = ctxT.filter(col("p1").isNotNull)
        .groupBy(col("p1").as("ba"), col("tok").as("bb"))
        .agg(count(lit(1)).as("cab"))
      val tri = ctxT.filter(col("p2").isNotNull)
        .groupBy(col("p2").as("ta"), col("p1").as("tb"),
          col("tok").as("tc"))
        .agg(count(lit(1)).as("ct"))
        .persist()
      try {
        val cctx3 = tri.groupBy(col("ta").as("c3a"), col("tb").as("c3b"))
          .agg(sum(col("ct")).as("cctx3"), count(lit(1)).as("n1f3"))
        val npre3 = tri.groupBy(col("tb").as("m3v"), col("tc").as("m3w"))
          .agg(count(lit(1)).as("npre3"))
        val ctot2 = npre3.groupBy(col("m3v").as("c2v"))
          .agg(sum(col("npre3")).as("ctot2"), count(lit(1)).as("n1f2c"))
        val npre2 = bi.groupBy(col("bb").as("pk"))
          .agg(count(lit(1)).as("npre2"))
        val vocab = ctxT.groupBy(col("tok")).agg(count(lit(1)).as("c"))
        val tot = bi.agg(count(lit(1)).as("b"))
          .crossJoin(vocab.agg(count(lit(1)).as("v")))
        val pcont = (coalesce(col("npre2"), lit(0L)) + 1L).cast("double") /
          (col("b") + col("v")).cast("double")
        val pmid = when(col("ctot2").isNull, pcont)
          .otherwise(
            (greatest(coalesce(col("npre3"), lit(0L)).cast("double") -
              lit(0.75), lit(0.0)) +
              lit(0.75) * col("n1f2c") * pcont) /
              col("ctot2").cast("double"))
        val ptop =
          (greatest(coalesce(col("ct"), lit(0L)).cast("double") -
            lit(0.75), lit(0.0)) +
            lit(0.75) * col("n1f3") * pmid) /
            col("cctx3").cast("double")
        val u = when(col("p1").isNull, -log(pcont))
          .when(col("p2").isNull || col("cctx3").isNull, -log(pmid))
          .otherwise(-log(ptop))
        ctx(score)
          .join(tri, col("p2") === col("ta") && col("p1") === col("tb") &&
            col("tok") === col("tc"), "left")
          .join(cctx3, col("p2") === col("c3a") &&
            col("p1") === col("c3b"), "left")
          .join(npre3, col("p1") === col("m3v") &&
            col("tok") === col("m3w"), "left")
          .join(ctot2, col("p1") === col("c2v"), "left")
          .join(npre2, col("tok") === col("pk"), "left")
          .join(vocab.select(col("tok").as("vk"), col("c").as("cu")),
            col("tok") === col("vk"), "left")
          .crossJoin(broadcast(tot))
          .select(col("id"),
            floor(u * 1000000L).cast("long").as("u"),
            col("cu"))
          .groupBy(col("id")).agg(
            count(lit(1)).as("n_tokens"),
            sum(col("u")).as("surprisal_unats"),
            sum(when(col("cu").isNull, 1L).otherwise(0L)).as("n_oov"))
          .select(col("id"), col("n_tokens"), col("surprisal_unats"),
            expr("surprisal_unats div n_tokens").as("mean_unats"),
            col("n_oov"))
          .localCheckpoint()
      } finally tri.unpersist()
    } finally ctxT.unpersist()
  }

  /**
   * Frequency-seeded piece probabilities over a word-type table —
   * Kudo 2018 §3.2's EM initialization, the driver-side counterpart
   * of [[unigramEncode]]'s distributed candidate pass: every
   * codepoint substring of length ≤ `maxPieceLen` weighted by type
   * count, normalized to a probability. Driver math over the bounded
   * type table (the [[bpeTrain]] convention: the MODEL is small even
   * when the corpus is not).
   */
  def unigramSeedScores(
      types: Seq[(String, Long)],
      maxPieceLen: Int = 4): Map[String, Double] = {
    val freq = scala.collection.mutable.Map.empty[String, Long]
    types.foreach { case (w, cnt) =>
      val cp = w.codePoints().toArray
      var i = 0
      while (i < cp.length) {
        var k = 1
        val kMax = math.min(maxPieceLen, cp.length - i)
        while (k <= kMax) {
          val p = new String(cp, i, k)
          freq.update(p, freq.getOrElse(p, 0L) + cnt)
          k += 1
        }
        i += 1
      }
    }
    val n = freq.valuesIterator.sum.toDouble
    freq.iterator.map { case (p, f) => p -> (f / n) }.toMap
  }

  /**
   * One-or-more EM refinement rounds for the unigram LM (Kudo 2018
   * §3.1/§4 — the training loop SentencePiece runs between seeding
   * and pruning). Per round, the E-step computes each piece's
   * EXPECTED count over the full segmentation lattice of every word
   * type by forward–backward (α/β sums over the ≤ `maxPieceLen`
   * predecessor positions — the marginal of every lattice edge, not
   * just the Viterbi path), weighted by type count; the M-step
   * re-normalizes expected counts into the next round's
   * probabilities. Corpus log-likelihood is non-decreasing per the
   * EM guarantee — the spec asserts it round by round.
   *
   * Words longer than `maxWordLen` codepoints are skipped (the
   * [[unigramEncode]] escape hatch); pieces whose expected count
   * hits exactly 0 drop out (they appear in no reachable lattice
   * edge). Driver math over the bounded type table — the corpus
   * never participates, so this trains the same at any data scale;
   * the distributed half of the tokenizer is [[unigramEncode]]'s
   * candidate pass + broadcast Viterbi.
   */
  def unigramEmRefine(
      types: Seq[(String, Long)],
      seed: Map[String, Double],
      rounds: Int,
      maxPieceLen: Int = 4,
      maxWordLen: Int = 40): Map[String, Double] = {
    require(rounds >= 1, "rounds >= 1")
    var scores = seed
    var r = 0
    while (r < rounds) {
      val exp = scala.collection.mutable.Map.empty[String, Double]
      types.foreach { case (w, cnt) =>
        val cp = w.codePoints().toArray
        val n = cp.length
        if (n <= maxWordLen) {
          val alpha = new Array[Double](n + 1); alpha(0) = 1.0
          var j = 1
          while (j <= n) {
            var k = 1
            val kMax = math.min(maxPieceLen, j)
            var s = 0.0
            while (k <= kMax) {
              scores.get(new String(cp, j - k, k))
                .foreach(p => s += alpha(j - k) * p)
              k += 1
            }
            alpha(j) = s; j += 1
          }
          if (alpha(n) > 0) {
            val beta = new Array[Double](n + 1); beta(n) = 1.0
            j = n - 1
            while (j >= 0) {
              var k = 1
              val kMax = math.min(maxPieceLen, n - j)
              var s = 0.0
              while (k <= kMax) {
                scores.get(new String(cp, j, k))
                  .foreach(p => s += p * beta(j + k))
                k += 1
              }
              beta(j) = s; j -= 1
            }
            val z = alpha(n)
            var i = 0
            while (i < n) {
              var k = 1
              val kMax = math.min(maxPieceLen, n - i)
              while (k <= kMax) {
                val piece = new String(cp, i, k)
                scores.get(piece).foreach { p =>
                  val e = cnt * alpha(i) * p * beta(i + k) / z
                  if (e > 0) exp.update(piece, exp.getOrElse(piece, 0.0) + e)
                }
                k += 1
              }
              i += 1
            }
          }
        }
      }
      val tot = exp.valuesIterator.sum
      scores = exp.iterator.map { case (p, e) => p -> (e / tot) }.toMap
      r += 1
    }
    scores
  }

  /** Lattice-sum P(w) under a piece model, optionally with one piece
    * excluded — the forward half of the EM pass, shared by
    * [[unigramLogLikelihood]] and [[unigramPrune]]'s loss scan. */
  private def latticeSum(
      cp: Array[Int], scores: Map[String, Double],
      maxPieceLen: Int, skip: String): Double = {
    val n = cp.length
    val alpha = new Array[Double](n + 1); alpha(0) = 1.0
    var j = 1
    while (j <= n) {
      var k = 1
      val kMax = math.min(maxPieceLen, j)
      var s = 0.0
      while (k <= kMax) {
        val piece = new String(cp, j - k, k)
        if (piece != skip)
          scores.get(piece).foreach(p => s += alpha(j - k) * p)
        k += 1
      }
      alpha(j) = s; j += 1
    }
    alpha(n)
  }

  /**
   * Corpus log-likelihood of a word-type table under a unigram piece
   * model: Σ_w count(w) · ln Σ_(segmentations) Π p(piece) — the
   * quantity [[unigramEmRefine]]'s EM rounds are guaranteed not to
   * decrease. Types longer than `maxWordLen` or with an unreachable
   * lattice contribute 0 (mirroring the EM skip). Spec/diagnostic
   * helper; driver math.
   */
  def unigramLogLikelihood(
      types: Seq[(String, Long)],
      scores: Map[String, Double],
      maxPieceLen: Int = 4,
      maxWordLen: Int = 40): Double = {
    var ll = 0.0
    types.foreach { case (w, cnt) =>
      val cp = w.codePoints().toArray
      if (cp.length <= maxWordLen) {
        val z = latticeSum(cp, scores, maxPieceLen, skip = null)
        if (z > 0) ll += cnt * math.log(z)
      }
    }
    ll
  }

  /**
   * Vocabulary pruning by likelihood loss (Kudo 2018 §4 step 3 —
   * the final stage of the SentencePiece training loop after
   * [[unigramSeedScores]] seeding and [[unigramEmRefine]]): for each
   * MULTI-codepoint piece x, the loss is the corpus log-likelihood
   * drop when x is removed from every lattice (recomputed exactly
   * over just the types containing x — single codepoints are never
   * pruned, so every lattice stays reachable); keep the
   * `keepMultis` highest-loss multis (ties by piece asc), drop the
   * rest, renormalize. Driver math over the bounded model/type
   * tables, like the rest of the training loop.
   */
  def unigramPrune(
      types: Seq[(String, Long)],
      scores: Map[String, Double],
      keepMultis: Int,
      maxPieceLen: Int = 4,
      maxWordLen: Int = 40): Map[String, Double] = {
    def cpLen(s: String) = s.codePointCount(0, s.length)
    val multis = scores.keysIterator.filter(cpLen(_) > 1).toSeq
    if (multis.size <= keepMultis) return scores
    val loss = multis.map { x =>
      var d = 0.0
      types.foreach { case (w, cnt) =>
        if (w.contains(x)) {
          val cp = w.codePoints().toArray
          if (cp.length <= maxWordLen) {
            val zFull = latticeSum(cp, scores, maxPieceLen, skip = null)
            val zWo = latticeSum(cp, scores, maxPieceLen, skip = x)
            if (zFull > 0 && zWo > 0)
              d += cnt * (math.log(zFull) - math.log(zWo))
          }
        }
      }
      x -> d
    }
    val kept = loss.sortBy { case (p, l) => (-l, p) }
      .take(keepMultis).map(_._1).toSet
    val surviving = scores.filter { case (p, _) =>
      cpLen(p) == 1 || kept(p) }
    val tot = surviving.valuesIterator.sum
    surviving.map { case (p, v) => p -> (v / tot) }
  }

  /**
   * Fill-in-the-middle transform (Bavarian et al. 2022,
   * arXiv:2207.14255) — the standard code-training augmentation:
   * for a deterministic `fimRateMilli`/1000 fraction of documents,
   * split the text at two pseudo-random points and re-arrange as
   * PSM (`<|fim_prefix|>P<|fim_suffix|>S<|fim_middle|>M`) or, for a
   * `spmRateMilli`/1000 sub-fraction, SPM (suffix first); the rest
   * pass through untouched. All "randomness" is the engine-portable
   * 60-bit md5 hash over salted id strings, and the splits are
   * substring arithmetic — so another engine replays every byte of
   * the output, and re-running the pipeline is idempotent (the
   * augmentation a training run saw is reconstructible from ids
   * alone). One narrow projection: zero shuffles, linear to 100 TB.
   */
  def fimTransform(
      df: DataFrame, idCol: String, textCol: String,
      fimRateMilli: Long = 500, spmRateMilli: Long = 500): DataFrame = {
    require(fimRateMilli >= 0 && fimRateMilli <= 1000 &&
      spmRateMilli >= 0 && spmRateMilli <= 1000,
      "rates are milli-fractions in [0, 1000]")
    val t = col(textCol)
    val n = length(t)
    val idStr = col(idCol).cast("string")
    def h(salt: String): Column =
      TextAnalysis.portableHash60(concat(idStr, lit(salt)))
    val applied = pmod(h("#fim"), lit(1000L)) < fimRateMilli && n >= 2
    val p1 = pmod(h("#s1"), (n + 1).cast("long"))
    val p2 = pmod(h("#s2"), (n + 1).cast("long"))
    val lo = least(p1, p2).cast("int")
    val hi = greatest(p1, p2).cast("int")
    val prefix = t.substr(lit(1), lo)
    val middle = t.substr(lo + 1, hi - lo)
    val suffix = t.substr(hi + 1, n - hi)
    val spm = pmod(h("#spm"), lit(1000L)) < spmRateMilli
    val psmText = concat(lit("<|fim_prefix|>"), prefix,
      lit("<|fim_suffix|>"), suffix, lit("<|fim_middle|>"), middle)
    val spmText = concat(lit("<|fim_suffix|>"), suffix,
      lit("<|fim_prefix|>"), prefix, lit("<|fim_middle|>"), middle)
    graft.util.Tables.spread(df).select(
      col(idCol).as("id"),
      when(applied, when(spm, lit("spm")).otherwise(lit("psm")))
        .otherwise(lit("none")).as("fim_mode"),
      when(applied, lo.cast("long")).as("split_lo"),
      when(applied, hi.cast("long")).as("split_hi"),
      when(applied, when(spm, spmText).otherwise(psmText))
        .otherwise(t).as("fim_text"),
      n.cast("long").as("n_chars"))
  }

  // ── Incremental RAG-index maintenance ─────────────────────────────

  /**
   * Chunk-level posting rows with document provenance:
   * (doc_id, chunk_id, tok, tf) for every chunk of every document —
   * the UNCAPPED index state that incremental maintenance operates
   * on. `chunk_id = id#chunk_idx` is doc-local, so one document's
   * postings can be dropped and rebuilt without touching any other
   * document — the property that makes the index ChangeSet-
   * maintainable. One (chunk, tok) shuffle with map-side combine.
   */
  def ragPostings(
      df: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int, overlap: Int): DataFrame =
    TextAnalysis.chunkText(graft.util.Tables.spread(df),
      idCol, textCol, chunkTokens, overlap)
      .select(col("id").as("doc_id"),
        concat(col("id"), lit("#"), col("chunk_idx")).as("chunk_id"),
        explode(TextAnalysis.normTokens(col("chunk_text"))).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy(col("doc_id"), col("chunk_id"), col("tok"))
      .agg(count(lit(1)).as("tf"))

  /** Publish the capped serving view over posting state: per token,
    * df and the top-`maxPostings` chunks (tf desc, chunk_id asc — a
    * total order). Same plan shape as [[invertedIndex]]'s serving
    * stage: one token exchange, rank + df from the same window.
    *
    * `dfCap` (> 0 to enable) drops tokens with df above the cap
    * BEFORE the ranking window — the stop-word guard for the window's
    * heap shape: a token in (nearly) every chunk concentrates all its
    * posting rows in ONE window partition (measured: the
    * q_rag_incremental 100×-key-growth OOM at default executor heap,
    * BASELINE.md r16), and such tokens are retrieval-useless anyway
    * (they match everything). With the cap, df comes from a
    * pre-aggregation (map-side partial combine — no giant partition
    * buffer), capped tokens' postings never reach the window, and the
    * surviving rows are IDENTICAL to the uncapped view filtered to
    * `df <= dfCap` (the df a token has is the same in both plans). */
  def publishIndex(
      postings: DataFrame, maxPostings: Int, dfCap: Long = 0L)
      : DataFrame = {
    require(maxPostings > 0, "maxPostings must be positive")
    val byTok = Window.partitionBy(col("tok"))
    val ranked = byTok.orderBy(col("tf").desc, col("chunk_id"))
    if (dfCap <= 0L)
      postings.withColumn("rank", row_number().over(ranked))
        .withColumn("df", count(lit(1)).over(byTok))
        .filter(col("rank") <= maxPostings)
        .select(col("tok"), col("df"), col("rank"), col("chunk_id"),
          col("tf"))
    else {
      val dfs = postings.groupBy(col("tok"))
        .agg(count(lit(1)).as("df"))
        .filter(col("df") <= dfCap)
      postings.join(dfs, Seq("tok"))
        .withColumn("rank", row_number().over(ranked))
        .filter(col("rank") <= maxPostings)
        .select(col("tok"), col("df"), col("rank"), col("chunk_id"),
          col("tf"))
    }
  }

  /**
   * ChangeSet-driven incremental index refresh — the point of the
   * reference's incremental application (ImportService.php:71-88)
   * applied to the retrieval tier: instead of rebuilding the index
   * from the whole corpus each sync, re-chunk/re-tokenize ONLY the
   * added+updated documents, drop postings for removed+updated ones,
   * and re-publish ONLY the tokens those postings touched — every
   * other token's published rows are provably unchanged (their
   * posting sets did not move) and carry over untouched.
   *
   * At 100 TB this is the difference between a daily full corpus
   * scan and work proportional to the delta: the text pass is
   * |changed docs|, the re-publish window is |touched tokens|'
   * postings, and the carried-over rows never leave their storage.
   *
   * @param changedDocs   documents to (re-)index: ChangeSet
   *                      added ∪ updated, with `idCol`/`textCol`
   * @param droppedDocIds one `id` column: removedIds ∪ updated ids
   *                      (an update drops old postings first)
   * @param dfCap         > 0 drops tokens with df above the cap from
   *                      the published view ([[publishIndex]]'s
   *                      stop-word heap guard). Refresh-safe: a
   *                      token's df moves only when one of its
   *                      posting rows is added/dropped, i.e. only for
   *                      TOUCHED tokens — carried-over rows keep
   *                      their cap verdict, and a touched token whose
   *                      new df exceeds the cap simply vanishes from
   *                      the republished slice, exactly as a full
   *                      rebuild with the same cap would have it
   * @return (new posting state, new published index) — published
   *         rows are bit-identical to a full rebuild over the
   *         post-sync corpus (with the same `dfCap`)
   */
  def refreshRagIndex(
      prevPostings: DataFrame, prevPublished: DataFrame,
      changedDocs: DataFrame, droppedDocIds: DataFrame,
      idCol: String, textCol: String,
      chunkTokens: Int, overlap: Int, maxPostings: Int,
      dfCap: Long = 0L)
      : (DataFrame, DataFrame) = {
    val dropIds = droppedDocIds.select(col("id").as("doc_id"))
    val newPostings = ragPostings(changedDocs, idCol, textCol,
      chunkTokens, overlap)
    val dropped = prevPostings.join(dropIds, Seq("doc_id"), "left_semi")
    val kept = prevPostings.join(dropIds, Seq("doc_id"), "left_anti")
    val postings = kept.unionByName(newPostings)
    // a token's published rows can only change if one of its posting
    // rows was added or dropped
    val touched = dropped.select(col("tok"))
      .union(newPostings.select(col("tok"))).distinct()
    val republished = publishIndex(
      postings.join(touched, Seq("tok"), "left_semi"), maxPostings,
      dfCap)
    val carried = prevPublished.join(touched, Seq("tok"), "left_anti")
    (postings, carried.unionByName(republished))
  }

  /**
   * Curriculum phase assignment: globally order the corpus by a
   * difficulty score and split the order into `phases` contiguous
   * equal-width buckets — "train on easy documents first". Built on
   * [[graft.core.Ranking.globalRank]] (range exchange + local rank +
   * broadcast offsets), so no single-task global window at any
   * scale; the bucket is then exact integer arithmetic on the rank:
   * `(rank − 1) · phases div n + 1`. (Equal-WIDTH buckets — the
   * remainder spreads across bucket boundaries rather than SQL
   * NTILE's first-buckets-get-one-extra rule; the formula is the
   * contract, and the oracle replays it.)
   */
  def curriculumPhases(
      df: DataFrame, idCol: String, orderCols: Seq[Column],
      phases: Int): DataFrame = {
    require(phases > 0, "phases must be positive")
    val total = df.count()
    val ranked = graft.core.Ranking.globalRank(
      df, orderCols :+ col(idCol))
    ranked.withColumn("phase",
      expr(s"cast(((rank - 1) * $phases) div $total + 1 as int)"))
  }

  /**
   * Corpus word-type table — (word, freq) — the input representation
   * BPE training actually consumes (Sennrich et al., ACL 2016): the
   * corpus collapses through ONE groupBy(word) shuffle with map-side
   * partials, and everything after runs over vocabulary-sized data.
   */
  def wordTypeTable(
      df: DataFrame, idCol: String, textCol: String): DataFrame =
    graft.util.Tables.spread(df)
      .select(explode(TextAnalysis.normTokens(col(textCol))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))

  /**
   * Weighted adjacent-character-pair counts over the word-type table
   * — the first scoring round of BPE training, exposed as its own
   * operator because it is the part that touches corpus-derived data
   * and the part another engine can replay (the merge LOOP is
   * iterative — see [[bpeTrain]]). Returns (pair, n) for every
   * 2-character window of every word type, weighted by word
   * frequency, thresholded by `minCount`.
   */
  def bpePairCounts(
      df: DataFrame, idCol: String, textCol: String,
      minCount: Long = 2L): DataFrame = {
    val types = wordTypeTable(df, idCol, textCol)
    types.filter(length(col("w")) >= 2)
      .select(col("freq"),
        explode(transform(sequence(lit(1), length(col("w")) - 1),
          i => col("w").substr(i, lit(2)))).as("pair"))
      .groupBy(col("pair")).agg(sum(col("freq")).as("n"))
      .filter(col("n") >= minCount)
  }

  /**
   * BPE tokenizer training (Sennrich et al., ACL 2016): build the
   * distributed word-type table (the ONLY corpus-scale pass), take
   * the top `maxTypes` types by (freq desc, word asc) — bounded,
   * deterministic driver metadata, the standard practice for
   * tokenizer training at corpus scale — and run `nMerges` merge
   * rounds in memory: count adjacent symbol pairs weighted by type
   * frequency, merge the argmax pair (count desc, pair lexicographic
   * asc — a total order, replayable anywhere), stop early when no
   * pair reaches `minPairCount`. Words carry the `</w>` end-of-word
   * marker, so merges distinguish suffixes from mid-word units.
   * Returns the ordered merge list — the tokenizer model.
   */
  def bpeTrain(
      df: DataFrame, idCol: String, textCol: String, nMerges: Int,
      maxTypes: Int = 100000, minPairCount: Long = 2L)
      : Seq[(String, String)] = {
    require(nMerges >= 0 && maxTypes > 0, "nMerges/maxTypes invalid")
    val collected = wordTypeTable(df, idCol, textCol)
      .orderBy(col("freq").desc, col("w")).limit(maxTypes)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // symbols: CODEPOINTS + end-of-word marker — the same alphabet
    // bpeMergeChain's Java-regex `(.)` and bpeGreedyPieces split to
    // (a per-Char split would emit lone surrogates here that the
    // apply paths could never match)
    var types: Array[(Array[String], Long)] = collected.map { case (w, f) =>
      (codepointSymbols(w) :+ "</w>", f)
    }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var round = 0
    var done = false
    while (round < nMerges && !done) {
      val counts = scala.collection.mutable.HashMap
        .empty[(String, String), Long]
      types.foreach { case (syms, f) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          counts.update(p, counts.getOrElse(p, 0L) + f)
          i += 1
        }
      }
      val best = counts.filter(_._2 >= minPairCount)
      if (best.isEmpty) done = true
      else {
        // total order: count desc, then pair lexicographic asc
        val (pair, _) = best.minBy { case ((a, b), n) => (-n, a, b) }
        merges += pair
        val merged = pair._1 + pair._2
        types = types.map { case (syms, f) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 &&
                syms(i) == pair._1 && syms(i + 1) == pair._2) {
              out += merged; i += 2 // greedy left-to-right, no overlap
            } else { out += syms(i); i += 1 }
          }
          (out.toArray, f)
        }
      }
      round += 1
    }
    merges.toSeq
  }

  /**
   * Per-document out-of-vocabulary rate against the corpus's own
   * top-`topN` token vocabulary — the tokenizer-coverage signal
   * (how much of each document a fixed vocab would shatter into
   * unknowns; high-OOV docs are noise or the wrong language for the
   * tokenizer). Vocabulary selection is deterministic: count desc,
   * token asc, row_number ≤ topN — a total order, so every engine
   * picks the identical vocab even across count ties.
   *
   * Scale shape: one groupBy(token) (the model — vocabulary-sized
   * output), a DISTRIBUTED top-N over the vocab
   * (`orderBy(...).limit(topN)` ⇒ TakeOrderedAndProject: every
   * partition keeps its own top `topN`, the driver merges — no
   * single-task global window even at 10⁸+ token types), one
   * broadcast hash join back, one groupBy(id). The token frame feeds
   * both passes — persisted for the call, result localCheckpoint'ed
   * (the [[unigramSurprisal]] contract). The rate is an exact integer
   * (parts-per-million, truncating division) — never a rounded
   * double (the q_embed_meanpool round-half lesson).
   */
  def oovRate(
      df: DataFrame, idCol: String, textCol: String,
      topN: Int = 1000): DataFrame = {
    require(topN > 0, "topN must be positive")
    val toks = graft.util.Tables.spread(df)
      .select(col(idCol).as("id"),
        explode(TextAnalysis.normTokens(col(textCol))).as("tok"))
      .persist()
    try {
      val freqs = toks.groupBy(col("tok")).agg(count(lit(1)).as("c"))
      // total order (count desc, token asc) ⇒ the limit is
      // deterministic across engines and cluster sizes
      val vocab = freqs.orderBy(col("c").desc, col("tok")).limit(topN)
        .select(col("tok"))
      toks.join(broadcast(vocab.withColumn("in_vocab", lit(1L))),
          Seq("tok"), "left")
        .groupBy(col("id")).agg(
          count(lit(1)).as("n_tokens"),
          sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
        .select(col("id"), col("n_tokens"), col("n_oov"),
          expr("(n_oov * 1000000) div n_tokens").as("oov_ppm"))
        .localCheckpoint()
    } finally toks.unpersist()
  }

  /**
   * Int8 embedding quantization — the storage path for a 100 TB
   * vector corpus (4 bytes/dim → 1): per-vector absmax scale,
   * `floor(x·127/scale)` per component (floor, not round — identical
   * in every engine, no round-half convention to disagree about),
   * clamped to [-127, 127]: `fl(fl(x·127)/scale)` can exceed 127 in
   * magnitude by ~2 ulp for the negative absmax element, and floor
   * then yields -128 — the clamp keeps the documented int8-packing
   * invariant. Returns (id, scale, q) with the quantized vector as
   * array<long> in [-127, 127]. Pure narrow projection, zero shuffles.
   */
  def quantizeInt8(
      df: DataFrame, idCol: String,
      vecCol: String = "embedding"): DataFrame = {
    val v = transform(col(vecCol), x => x.cast("double"))
    val scale = greatest(
      array_max(transform(v, x => abs(x))), lit(1e-30))
    graft.util.Tables.spread(df)
      .select(col(idCol), col(vecCol))
      .withColumn("scale", scale)
      .select(col(idCol), col("scale"),
        transform(v, x =>
          greatest(least(floor(x * 127 / col("scale")), lit(127L)),
            lit(-127L)).cast("long"))
          .as("q"))
  }

  /**
   * Sequence packing: assign documents to fixed-token-budget training
   * sequences. Documents shard by id hash (the parallel unit — real
   * packing runs per output shard); within a shard they pack in id
   * order by cumulative token offset, and a document belongs to the
   * sequence its first token falls in (`offset div seqLen` — the
   * greedy concat-and-chop packer used for pretraining).
   *
   * Scale shape: one narrow projection, then per-shard window cumsum
   * — partitions bounded by shard size, shards chosen for the target
   * write layout. Every column is an exact integer.
   */
  def packSequences(
      df: DataFrame, idCol: String, textCol: String,
      seqLen: Int = 2048, shards: Int = 64): DataFrame =
    packSequencesByCount(
      graft.util.Tables.spread(df).select(
        col(idCol).as("id"),
        TextAnalysis.wsTokenCount(col(textCol)).cast("long")
          .as("n_tokens")),
      "id", "n_tokens", seqLen, shards)

  /**
   * [[packSequences]] over a PRECOMPUTED per-document token count —
   * the variant real pipelines use once a tokenizer has run (feed it
   * [[bpeEncode]]'s `n_tokens` and packing is certified over real
   * tokenizer output, not the whitespace proxy). Same contract:
   * shard by id hash, pack in id order by cumulative offset,
   * `seq_id = offset div seqLen`. One narrow projection + one
   * per-shard window cumsum; partitions bounded by shard size.
   */
  def packSequencesByCount(
      df: DataFrame, idCol: String, nTokensCol: String,
      seqLen: Int = 2048, shards: Int = 64): DataFrame = {
    require(seqLen > 0 && shards > 0, "seqLen and shards must be positive")
    val base = df.select(
      col(idCol).as("id"),
      col(nTokensCol).cast("long").as("n_tokens"),
      pmod(TextAnalysis.portableHash60(col(idCol).cast("string")),
        lit(shards.toLong)).as("shard"))
    val w = Window.partitionBy(col("shard")).orderBy(col("id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    base
      .withColumn("tok_offset",
        sum(col("n_tokens")).over(w) - col("n_tokens"))
      .select(col("id"), col("shard"), col("n_tokens"), col("tok_offset"),
        expr(s"tok_offset div ${seqLen.toLong}").as("seq_id"))
  }

  /**
   * Deterministic corpus shuffle-and-shard — the "global shuffle"
   * every training run needs, WITHOUT a global sort: order by a
   * seeded hash of the id and you have a reproducible permutation,
   * but a global `row_number` would funnel the corpus through one
   * window partition. Instead: shard = hash mod `shards` (narrow),
   * position = row_number within the shard ordered by (hash, id) —
   * one bounded-size window partition per shard, `shards` chosen to
   * match the output layout (e.g. training file count). Reading
   * shards in order, positions in order, replays the SAME permutation
   * on any cluster size; changing `seed` reshuffles epochs.
   * Ties on the hash break by id, so the order is total and
   * engine-replayable.
   *
   * Size `shards` so one shard stays well under ~10⁸ rows: each shard
   * is ONE window partition, i.e. one task's sort — that bound is the
   * operational limit long before any numeric one (the position
   * counter is a windowed count, LongType — it cannot overflow the
   * way a 32-bit `row_number` would past 2³¹ rows/shard).
   */
  /**
   * Sharded JSONL export — the training-data delivery format (one
   * JSON object per line, one directory per shard). Each row becomes
   * `to_json(struct(cols))` and lands under `shard=<k>/` via a
   * partitioned text write: the write is fully distributed (tasks
   * write their own shard files, no exchange beyond the caller's
   * shard assignment) and any JSON reader — including another
   * engine — re-ingests it. JSON string escaping is the contract
   * surface (newlines, quotes, unicode must round-trip byte-exactly);
   * `q_export_jsonl` certifies it by hashing the text AFTER a full
   * write→read cycle against the oracle's hash of the parquet
   * original.
   */
  def exportJsonl(df: DataFrame, outDir: String,
      shardCol: String = "shard"): Unit =
    df.select(col(shardCol),
        to_json(struct(df.columns.filter(_ != shardCol).map(col): _*))
          .as("value"))
      .write.mode("overwrite").partitionBy(shardCol).text(outDir)

  def shuffleShards(
      df: DataFrame, idCol: String,
      shards: Int = 64, seed: Long = 0L): DataFrame = {
    require(shards > 0, "shards must be positive")
    val h = TextAnalysis.portableHash60(
      concat(col(idCol).cast("string"), lit(":"), lit(seed.toString)))
    val base = graft.util.Tables.spread(df)
      .select(col(idCol).as("id"), h.as("h"))
      .withColumn("shard", pmod(col("h"), lit(shards.toLong)))
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("h"), col("id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    base.select(col("id"), col("shard"),
      coalesce(count(lit(1)).over(w), lit(0L)).as("pos"))
  }
}
