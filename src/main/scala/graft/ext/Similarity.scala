package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Similarity search over embedding columns (`Array[Float]`) — engine
 * extension per BASELINE.json.
 *
 * Two tiers:
 *  - brute-force cosine top-k: exact baseline. The query set is
 *    broadcast (it is small by construction); the corpus streams —
 *    one pass, no shuffle of the corpus, top-k via window over the
 *    (query, candidate) pairs.
 *  - LSH-bucketed (random hyperplane signs): the scale path. Corpus
 *    and queries hash to sign-pattern buckets; only same-bucket pairs
 *    are scored. At 100 TB the bucket key is the only shuffle, and
 *    multi-probe (flipping one bit) trades recall for fan-out.
 *
 * All arithmetic in double via `zip_with`/`aggregate` expressions —
 * codegen'd, deterministic, no UDFs, no MLlib Vector boxing.
 */
object Similarity {

  /** dot(a, b) over array columns, accumulated in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /**
   * Exact brute-force top-k cosine neighbors for each query vector.
   * `queries` must be small (it is broadcast); corpus can be
   * arbitrarily large — the join is a broadcast-nested-loop producing
   * |corpus| × |queries| scored rows that immediately collapse through
   * the per-query top-k window.
   */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // per-pair scoring via the native codegen'd one-pass expression
    // (graft.functions.CosineSimilarity) — interpreted zip_with/
    // aggregate lambdas cost ~100µs/pair and dominate brute force
    val c = graft.util.Tables.spread(corpus)
      .select(col(idCol).as("n_id"), col(vecCol).as("n_vec"))
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"))
    val scored = c.join(broadcast(q), col("q_id") =!= col("n_id"))
      .withColumn("sim",
        graft.functions.GraftFunctions.cosine_sim(col("q_vec"), col("n_vec")))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("sim").desc, col("n_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("n_id"), round(col("sim"), 6).as("sim"),
        col("rank"))
  }

  /** Threshold variant (no ranking): all pairs with cosine ≥ t.
    * Fully deterministic under rounding — used by the oracle gate. */
  def bruteForcePairs(
      corpus: DataFrame, queries: DataFrame, threshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val c = graft.util.Tables.spread(corpus)
      .select(col(idCol).as("n_id"), col(vecCol).as("n_vec"))
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"))
    c.join(broadcast(q), col("q_id") =!= col("n_id"))
      .withColumn("sim",
        graft.functions.GraftFunctions.cosine_sim(col("q_vec"), col("n_vec")))
      .filter(col("sim") >= threshold)
      .select(col("q_id"), col("n_id"), round(col("sim"), 6).as("sim"))
  }

  /** Deterministic pseudo-random hyperplanes: plane p, dim d component
    * derived from a hash — reproducible across engines and runs.
    * Kept as the REFERENCE formulation: the shipped path is the
    * native cached-matrix kernel (graft.functions.PlaneProjections /
    * PlaneBucket), bit-parity-checked against this column stack by
    * FunctionsSpec. The HOF form re-derived every (plane, dim)
    * component per ROW — ~nPlanes·d interpreted lambdas each with an
    * xxhash64 — which was the entire cost of the ANN bench tier. */
  private[graft] def planeComponent(p: Int, d: Column): Column =
    (pmod(xxhash64(lit(p), d), lit(1000003L)).cast("double") /
      lit(1000003.0)) * 2.0 - 1.0

  /** Reference-formulation projection of `vec` onto plane `p` —
    * parity oracle for the native kernel (tests only). */
  private[graft] def planeProjectionRef(vec: Column, p: Int): Column =
    aggregate(
      zip_with(vec, sequence(lit(0), size(vec) - 1),
        (x, d) => x.cast("double") * planeComponent(p, d)),
      lit(0.0), (acc, v) => acc + v)

  /** Sign-pattern LSH bucket id from `nPlanes` hyperplanes — one
    * fused native pass over the cached plane matrix. */
  def lshBucket(vec: Column, nPlanes: Int = 12): Column =
    graft.functions.GraftFunctions.plane_bucket(vec, nPlanes, 1)

  /**
   * LSH-bucketed ANN: score only same-bucket (query, candidate)
   * pairs. Recall < 1 by design; `nPlanes` tunes bucket granularity
   * and `probeRadius` is the multi-probe knob — each QUERY also
   * probes every bucket within hamming ≤ probeRadius of its own sign
   * pattern (Σ C(nPlanes, i) probes), trading query fan-out for
   * recall while the corpus keeps exactly one bucket per vector.
   * The bucket join shuffles on a long key — at 1000 executors this
   * partitions evenly (hash distribution) with no broadcast needed.
   */
  def lshTopK(
      corpus: DataFrame, queries: DataFrame, k: Int, nPlanes: Int = 12,
      probeRadius: Int = 1,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val masks: Seq[Long] = (0 to probeRadius).flatMap(r =>
      (0 until nPlanes).combinations(r).map(
        _.foldLeft(0L)((m, i) => m | (1L << i))))
    val c = graft.util.Tables.spread(corpus)
      .select(col(idCol).as("n_id"), col(vecCol).as("n_vec"),
        lshBucket(col(vecCol), nPlanes).as("bucket"))
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"),
        lshBucket(col(vecCol), nPlanes).as("b0"))
      .select(col("q_id"), col("q_vec"),
        explode(array(masks.map(m => col("b0").bitwiseXOR(lit(m))): _*))
          .as("bucket"))
    val scored = c.join(q, Seq("bucket"))
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("sim",
        graft.functions.GraftFunctions.cosine_sim(col("q_vec"), col("n_vec")))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("sim").desc, col("n_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("n_id"), round(col("sim"), 6).as("sim"),
        col("rank"))
  }

  /**
   * Aggregator-based grouped top-k: identical results to the window
   * formulation but with a bounded per-group buffer and map-side
   * combining — no full per-partition sort. The scale path for
   * high-cardinality query sets.
   */
  def topKAgg(scored: DataFrame, k: Int): DataFrame =
    scored.groupBy(col("q_id"))
      .agg(graft.functions.TopK.topK(k)(col("sim"), col("n_id").cast("long"))
        .as("top"))
      .select(col("q_id"), posexplode(col("top")))
      .select(col("q_id"), col("col._2").as("n_id"),
        round(col("col._1"), 6).as("sim"), (col("pos") + 1).as("rank"))

  /** Per-cell projection structs (proj, cellId) shared by
    * [[ivfAssign]] (argmax) and [[bucketedPairs]] (top-P probe).
    * The projections come out of the native cached-matrix kernel in
    * one pass (seed stride 7919 = the IVF hash stream, disjoint from
    * the LSH planes); only the tiny nCells-element struct/sort layer
    * stays in column-land. */
  private def cellProjections(vec: Column, nCells: Int): Column =
    transform(
      graft.functions.GraftFunctions.plane_proj(vec, nCells, 7919),
      (s, i) => struct(s.as("s"), i.as("c")))

  /**
   * Scale path for embedding near-dup PAIR generation: multi-probe
   * IVF self-join. Each vector lands in its `nProbe`
   * highest-projection cells of `nCells` deterministic
   * pseudo-centroids; candidates are pairs co-occurring in ≥1 cell,
   * scored in place (the cell join already co-locates both vectors)
   * and kept only if exact cosine ≥ threshold — precision is always
   * exact, recall is tuned by `nProbe` and degrades to exhaustive at
   * `nProbe = nCells` (specs pin exact recall on the test corpora).
   *
   * Plan shape — the 100 TB contract: posexplode to (cell, vec) rows,
   * ONE shuffle on the cell key, sort-merge self-join within cells,
   * distinct on the scored pair. No broadcast of the corpus, no
   * nested-loop join; each cell is a bounded partition-local join at
   * any corpus size (cells scale with `nCells`, and a hot cell splits
   * further under AQE skew handling).
   */
  def bucketedPairs(
      corpus: DataFrame, threshold: Double, nCells: Int = 16,
      nProbe: Int = 6, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(nProbe >= 1 && nProbe <= nCells, "nProbe must be in [1, nCells]")
    val celled = graft.util.Tables.spread(corpus)
      .select(col(idCol).as("id"), col(vecCol).as("vec"),
        explode(ivfProbe(col(vecCol), nCells, nProbe)).as("cell"))
    selfJoinCells(celled, threshold)
  }

  /**
   * Exact-duplicate collapse for the embedding corpus: one
   * representative (min id) per BIT-IDENTICAL vector group, plus the
   * rep→member edges that reconnect collapsed members downstream.
   *
   * Why this exists: real corpora carry large exact-duplicate groups
   * (mirrored pages, re-crawls, boilerplate) — every such group of
   * size g becomes a g-clique in the near-dup pair graph, so pair
   * volume grows QUADRATICALLY in duplicate density while the useful
   * information (the group) is linear. Collapsing first makes the
   * expensive cell self-join run on unique vectors only; dup members
   * rejoin through g−1 rep edges. Grouping is on the vector VALUE
   * (array equality), not a hash of it — no collision can merge two
   * distinct groups. Two linear shuffles (groupBy vec + join back),
   * both on the vector key.
   */
  def collapseExactVectors(
      corpus: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding"): (DataFrame, DataFrame) = {
    val spreadC = graft.util.Tables.spread(corpus)
    val reps = spreadC.groupBy(col(vecCol))
      .agg(min(col(idCol)).as(idCol))
      .select(col(idCol), col(vecCol))
    val dupEdges = spreadC.select(col(idCol).as("__m"), col(vecCol))
      .join(reps.select(col(idCol).as("__r"), col(vecCol)), Seq(vecCol))
      .filter(col("__m") =!= col("__r"))
      .select(col("__r").as("q_id"), col("__m").as("n_id"),
        lit(1.0).as("sim"))
    (reps, dupEdges)
  }

  /**
   * Near-dup pair GRAPH with exact-duplicate pre-collapse: the
   * [[bucketedPairs]] cell join over unique representatives, unioned
   * with the rep→member edges. Connectivity-equivalent to the full
   * pair set — identical vectors probe identical cells with identical
   * sims, so (a) two groups are linked in the rep graph iff any of
   * their members are linked in the full graph, and (b) a rep is some
   * pair's n_id iff any smaller id is τ-similar to it — which makes
   * both downstream contracts EXACTLY reproducible: connected
   * components are unchanged, and the survivor set (ids never
   * appearing as n_id) is unchanged. What it does NOT reproduce is
   * the full quadratic pair LIST itself (member×member edges inside
   * a clique are represented by their rep edges) — that list is the
   * thing that cannot scale.
   */
  def pairGraphCollapsed(
      corpus: DataFrame, threshold: Double, nCells: Int = 16,
      nProbe: Int = 6, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val (reps, dupEdges) = collapseExactVectors(corpus, idCol, vecCol)
    bucketedPairs(reps, threshold, nCells, nProbe, idCol, vecCol)
      .unionByName(dupEdges)
  }

  /** [[pairGraphCollapsed]] with the cell count sized from the
    * UNIQUE-vector count ([[sizedCells]]: constant expected cell
    * occupancy) — the production entry point for every consumer of
    * the pair graph (near-dup filter, clusters, SemDeDup). A pinned
    * cell count makes the within-cell self-join ~quadratic in corpus
    * size (measured at 30× key-growth: q_embed_clusters 4.8× and
    * q_embed_dedup 5.9× the wall of 10× — BASELINE.md r16); sizing
    * on the rep count (one narrow count over the collapse the call
    * does anyway) keeps it linear. Recall trades per the
    * dedup-within-cluster posture; [[cellStats]] is the
    * pre-flight. */
  def pairGraphCollapsedAuto(
      corpus: DataFrame, threshold: Double, targetPerCell: Int = 128,
      nProbe: Int = 6, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val (reps, dupEdges) = collapseExactVectors(corpus, idCol, vecCol)
    val nReps = reps.select(col(idCol)).count()
    bucketedPairs(reps, threshold, sizedCells(nReps, targetPerCell),
      nProbe, idCol, vecCol)
      .unionByName(dupEdges)
  }

  /**
   * IVF-style variant: corpus assigned to the nearest of `nCells`
   * deterministic seed centroids (derived from hashed unit vectors);
   * queries probe their own cell only. Same shuffle shape as LSH but
   * with distance-aware cells.
   */
  def ivfAssign(vec: Column, nCells: Int = 16): Column =
    array_max(cellProjections(vec, nCells)).getField("c")

  /**
   * EXACT-INTEGER semantic cell assignment — the oracle-replayable
   * quantized-projection kernel behind cluster-balanced selection
   * (q_embed_balanced): the embedding is quantized to integers
   * (`floor(e·1000)` — a float×1000 is exact in double, so every
   * engine lands on the same longs), each of `nCells` cells scores it
   * with a deterministic integer weight stream
   * `w(k,i) = (k·31 + i·7) mod 11 − 5`, and the cell is the argmax
   * (ties → max cell id, the same rule as the struct max). No double
   * ever enters the decision, so a SQL oracle replays assignments
   * bit-exactly — unlike the float plane kernel ([[ivfAssign]]),
   * whose rows are gated at total coverage instead. This IS the
   * int8-quantized-projection sharding production stacks run for
   * diversity balancing; at recall-critical settings swap in the
   * native [[ivfAssign]]/trained-centroid kernels.
   *
   * Native + codegen'd ([[graft.functions.IntCellAssign]]) — the
   * composed transform/zip_with/aggregate formulation evaluated
   * nCells·dim interpreted lambdas per row (measured 2.4 ms/row at
   * 16×64, a scale-killer for a selection pass); the fused loop is
   * ~1 µs/row and stays inside whole-stage codegen. A null vector
   * stays null; an empty vector scores 0 everywhere and the tie
   * rule yields nCells−1.
   */
  def intCellAssign(vec: Column, nCells: Int = 16): Column =
    graft.functions.GraftFunctions.int_cell_assign(vec, nCells)

  /**
   * IVF cell-occupancy pre-flight — the embedding-tier counterpart of
   * `Dedup.lshBucketStats`: per probed cell, how many vectors land in
   * it and the exact within-cell pair volume the bucketed self-join
   * would generate (Σ over cells of c·(c-1)/2, with `nProbe`-way
   * multi-probe multiplicity included, because that IS the join's
   * input). A skewed corpus shows up as one cell holding a large
   * share of the vectors — the signal to raise `nCells`, switch to
   * trained centroids (`bucketedPairsTrained`), or both, BEFORE
   * launching the pair join. One (cell) shuffle; AT MOST `nCells`
   * output rows (cells no probe lands in are absent — few returned
   * rows on a skewed corpus is itself the warning sign). Pass the
   * SAME (nCells, nProbe) you will give the join — the defaults here
   * match [[bucketedPairs]]'s defaults for exactly that reason.
   */
  def cellStats(
      corpus: DataFrame, nCells: Int = 16, nProbe: Int = 6,
      vecCol: String = "embedding"): DataFrame =
    graft.util.Tables.spread(corpus)
      .select(explode(ivfProbe(col(vecCol), nCells, nProbe)).as("cell"))
      .groupBy(col("cell")).agg(count(lit(1)).as("n_vectors"))
      .select(col("cell"), col("n_vectors"),
        expr("n_vectors * (n_vectors - 1) div 2").as("n_cand_pairs"))

  /** Top-`nProbe` cells by projection (deterministic tie-break on
    * cell id) — the multi-probe assignment used by [[bucketedPairs]]
    * and the query side of probed IVF search. `ivfProbe(v, n, 1)`
    * equals `array(ivfAssign(v, n))`. */
  def ivfProbe(vec: Column, nCells: Int, nProbe: Int): Column = {
    val projs = cellProjections(vec, nCells)
    val byProj = array_sort(projs, (a, b) =>
      when(a.getField("s") > b.getField("s"), -1)
        .when(a.getField("s") < b.getField("s"), 1)
        .otherwise(a.getField("c") - b.getField("c")))
    transform(slice(byProj, 1, nProbe), c => c.getField("c"))
  }

  // ── trained-centroid IVF ──────────────────────────────────────────
  // The pseudo-centroid projection above is O(nCells·d) per row with
  // data-blind cells; production IVF wants cells that FOLLOW the data
  // distribution and an nCells that grows with the corpus. The
  // trained tier: k-means over a bounded deterministic sample
  // (driver-side — the sample, never the corpus), centroids broadcast
  // as a literal, assignment is argmax-cosine against them.

  /**
   * The shared deterministic training sample both trainers run on:
   * the `sampleN` lowest `xxhash64(id)` values — stable across runs,
   * cluster sizes, and engines; ONE TakeOrdered pass over the corpus,
   * only `sampleN` vectors ever reach the driver (at 100 TB the
   * corpus never collects). Vectors come back L2-normalized (cosine
   * geometry for the centroid trainer; ADC-dot-approximates-cosine
   * for the PQ trainer). Null embeddings (unresolved upstream joins,
   * failed encoders) cannot train — they drop here and
   * null-propagate to a null cell downstream. Collect once and feed
   * [[trainCentroidsOnSample]] + [[trainPqCodebooksOnSample]] when
   * training both models over the same corpus (the persisted-index
   * build does): one corpus scan instead of two.
   */
  def trainSample(
      corpus: DataFrame, sampleN: Int = 2048, idCol: String = "vec_id",
      vecCol: String = "embedding"): Array[Array[Double]] = {
    import org.apache.spark.sql.Row
    corpus
      .filter(col(vecCol).isNotNull)
      .select(col(vecCol), xxhash64(col(idCol).cast("string")).as("__h"))
      .orderBy(col("__h")).limit(sampleN)
      .select(col(vecCol)).collect()
      .map { case Row(v: scala.collection.Seq[_]) =>
        val a = v.map(_.asInstanceOf[Float].toDouble).toArray
        normalize(a); a
      }
  }

  /**
   * Train `nCells` centroids with Lloyd's k-means over a
   * deterministic sample of the corpus ([[trainSample]]).
   * Initialization is farthest-point (k-means++ without the RNG):
   * deterministic, no seed to disagree about. Centroids are
   * re-normalized each round, so argmax-dot = nearest.
   */
  def trainCentroids(
      corpus: DataFrame, nCells: Int, sampleN: Int = 2048,
      iters: Int = 10, idCol: String = "vec_id",
      vecCol: String = "embedding"): Seq[Seq[Float]] =
    trainCentroidsOnSample(
      trainSample(corpus, sampleN, idCol, vecCol), nCells, iters)

  /** Fixed work-chunk width for the driver-side trainers: constant
    * (NOT core-count-derived) so the chunk boundaries — and with them
    * the floating-point merge order — are identical on every machine
    * and at every parallelism. */
  private val TrainChunk = 1024

  /** Run `f` over fixed [start, end) chunks of `0 until n`
    * concurrently, returning results in chunk order. */
  private def mapChunks[T: scala.reflect.ClassTag](n: Int)(
      f: (Int, Int) => T): Array[T] = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    val ranges = (0 until n by TrainChunk)
      .map(s => (s, math.min(s + TrainChunk, n)))
    Await.result(
      Future.sequence(ranges.map { case (s, e) => Future(f(s, e)) }),
      scala.concurrent.duration.Duration.Inf).toArray
  }

  /** [[trainCentroids]] over an already-collected [[trainSample]]
    * (sample is read, never mutated — safe to share across trainers).
    *
    * The assignment scans — O(sample·k·d) per Lloyd round, the whole
    * cost of training at occupancy-sized cell counts (k ≈ 800 took
    * 83 s sequential at 100× key-growth, BASELINE.md r16) — run
    * chunk-parallel on the driver. Determinism is preserved:
    * per-element results are exact regardless of threading, the
    * farthest-point argmin merges chunks in order under the same
    * strict-< first-wins rule as the sequential scan (bit-identical),
    * and the per-cell Lloyd sums accumulate within fixed
    * [[TrainChunk]] chunks then merge in chunk order — a fixed FP
    * association independent of core count (it differs in ulps from
    * the old whole-sample sequential order; exact-re-rank consumers
    * are invariant to centroid ulps by construction). */
  def trainCentroidsOnSample(
      sample: Array[Array[Double]], nCells: Int,
      iters: Int = 10): Seq[Seq[Float]] = {
    // Degenerate corpora cap the cell count instead of failing: an
    // empty or tiny input (a pruned partition, a fresh tenant) must
    // flow through, not abort the pipeline.
    if (sample.isEmpty) return Nil
    val kCells = math.min(nCells, sample.length)
    val d = sample.head.length
    val n = sample.length

    // farthest-point init: start from the first sample (hash-order ⇒
    // arbitrary but fixed), repeatedly add the point least similar to
    // its nearest chosen centroid
    val centers = scala.collection.mutable.ArrayBuffer(sample.head.clone())
    val bestSim = Array.fill(n)(Double.MinValue)
    while (centers.length < kCells) {
      val last = centers.last
      // chunks own disjoint bestSim ranges; Future scheduling/Await
      // give the cross-round happens-before
      val mins = mapChunks(n) { (s, e) =>
        var worst = s; var worstSim = Double.MaxValue
        var i = s
        while (i < e) {
          val sim = dotArr(sample(i), last)
          if (sim > bestSim(i)) bestSim(i) = sim
          if (bestSim(i) < worstSim) { worstSim = bestSim(i); worst = i }
          i += 1
        }
        (worstSim, worst)
      }
      var worst = 0; var worstSim = Double.MaxValue
      mins.foreach { case (ws, w) =>
        if (ws < worstSim) { worstSim = ws; worst = w }
      }
      centers += sample(worst).clone()
    }

    // Lloyd rounds on the sample
    var round = 0
    while (round < iters) {
      val cArr = centers.toArray // stable snapshot for the tasks
      val parts = mapChunks(n) { (s, e) =>
        val sums = Array.fill(kCells)(new Array[Double](d))
        val counts = new Array[Int](kCells)
        var i = s
        while (i < e) {
          var best = 0; var bs = Double.MinValue
          var c = 0
          while (c < kCells) {
            val sim = dotArr(sample(i), cArr(c))
            if (sim > bs) { bs = sim; best = c }
            c += 1
          }
          val t = sums(best); val v = sample(i)
          var j = 0
          while (j < d) { t(j) += v(j); j += 1 }
          counts(best) += 1
          i += 1
        }
        (sums, counts)
      }
      val sums = Array.fill(kCells)(new Array[Double](d))
      val counts = new Array[Int](kCells)
      parts.foreach { case (cs, cc) => // chunk order: fixed FP assoc
        var c = 0
        while (c < kCells) {
          if (cc(c) > 0) {
            val t = sums(c); val f = cs(c)
            var j = 0
            while (j < d) { t(j) += f(j); j += 1 }
            counts(c) += cc(c)
          }
          c += 1
        }
      }
      var c = 0
      while (c < kCells) {
        if (counts(c) > 0) {
          val m = sums(c)
          normalize(m)
          centers(c) = m
        } // empty cell: keep the old centroid (deterministic)
        c += 1
      }
      round += 1
    }
    centers.map(_.map(_.toFloat).toSeq).toSeq
  }

  private def normalize(a: Array[Double]): Unit = {
    var n = 0.0; var i = 0
    while (i < a.length) { n += a(i) * a(i); i += 1 }
    val inv = if (n == 0.0) 0.0 else 1.0 / math.sqrt(n)
    i = 0
    while (i < a.length) { a(i) *= inv; i += 1 }
  }

  private def dotArr(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  /** Top-`nProbe` cells by cosine against EXTERNALLY SUPPLIED
    * centroids (trained here or anywhere else) — the native
    * [[graft.functions.CentroidProbe]] kernel: the centroid matrix
    * rides into the plan as one literal (broadcast with the plan,
    * O(nCells·d) floats — metadata next to any corpus), and each row
    * pays `nCells` fused dot/norm passes plus an insertion top-k
    * INSIDE whole-stage codegen. The transform/array_sort HOF chain
    * this replaces allocated an interpreted struct per centroid per
    * row then fully sorted them — ~9 ms/row at the occupancy-sized
    * nCells=782 of the 100× smoke (it WAS the entire buildAuto wall,
    * BASELINE.md r16); the kernel's ordering (cosine desc, cell asc,
    * CosineSimilarity arithmetic) is bit-identical to that chain. */
  def centroidProbe(
      vec: Column, centroids: Seq[Seq[Float]], nProbe: Int): Column = {
    require(nProbe >= 1 && centroids.nonEmpty,
      "nProbe must be >= 1 and centroids non-empty")
    // a tiny trained model (degenerate corpus) clamps the probe
    // fan-out rather than failing
    val probes = math.min(nProbe, centroids.length)
    graft.functions.GraftFunctions.centroid_probe(vec, centroids, probes)
  }

  /** Nearest trained centroid (argmax cosine) — the corpus-side
    * single-cell assignment. */
  def centroidAssign(vec: Column, centroids: Seq[Seq[Float]]): Column =
    centroidProbe(vec, centroids, 1).getItem(0)

  /**
   * [[bucketedPairs]] with trained centroids: identical plan shape
   * (explode probes → ONE cell-key shuffle → partition-local
   * self-join → exact verify → distinct), but cells follow the data
   * distribution, so candidate volume concentrates where near-dups
   * actually live and nCells can scale with the corpus.
   */
  def bucketedPairsTrained(
      corpus: DataFrame, threshold: Double, centroids: Seq[Seq[Float]],
      nProbe: Int = 4, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    // no centroids ⇔ the training corpus was empty ⇒ no pairs
    // (schema preserved from the corpus id type)
    if (centroids.isEmpty)
      return corpus.select(col(idCol).as("q_id"), col(idCol).as("n_id"),
        lit(0.0).as("sim")).limit(0)
    val celled = graft.util.Tables.spread(corpus)
      .select(col(idCol).as("id"), col(vecCol).as("vec"),
        explode(centroidProbe(col(vecCol), centroids, nProbe)).as("cell"))
    selfJoinCells(celled, threshold)
  }

  /** Shared cell-join body: sort-merge self-join within cells, exact
    * cosine verify, distinct on the pair. */
  private def selfJoinCells(celled: DataFrame, threshold: Double): DataFrame = {
    val l = celled.as("l"); val r = celled.as("r")
    l.join(r, col("l.cell") === col("r.cell") && col("l.id") < col("r.id"))
      .withColumn("sim",
        graft.functions.GraftFunctions.cosine_sim(col("l.vec"), col("r.vec")))
      .filter(col("sim") >= threshold)
      .select(col("l.id").as("q_id"), col("r.id").as("n_id"),
        round(col("sim"), 6).as("sim"))
      .distinct()
  }

  /**
   * Trained-centroid IVF ANN search: corpus in its ONE nearest cell,
   * queries probe their `nProbe` nearest — the classical IVF probe
   * contract. Same single cell-key shuffle as [[lshTopK]].
   */
  def ivfTopKTrained(
      corpus: DataFrame, queries: DataFrame, k: Int,
      centroids: Seq[Seq[Float]], nProbe: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // no centroids ⇔ the training corpus was empty ⇒ no neighbors
    if (centroids.isEmpty)
      return queries.select(col(idCol).as("q_id"), col(idCol).as("n_id"),
        lit(0.0).as("sim"), lit(1).as("rank")).limit(0)
    val c = graft.util.Tables.spread(corpus)
      .select(col(idCol).as("n_id"), col(vecCol).as("n_vec"),
        centroidAssign(col(vecCol), centroids).as("cell"))
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"),
        explode(centroidProbe(col(vecCol), centroids, nProbe)).as("cell"))
    val scored = c.join(q, Seq("cell"))
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("sim",
        graft.functions.GraftFunctions.cosine_sim(col("q_vec"), col("n_vec")))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("sim").desc, col("n_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("n_id"), round(col("sim"), 6).as("sim"),
        col("rank"))
  }

  /**
   * Element-wise mean pooling of embeddings per group — the
   * chunk-embeddings → document-embedding (or per-class prototype)
   * reduction every embedding pipeline runs. Returns one flat
   * (group, dim, n_vecs, sum_micro, mean_micro) row per dimension:
   * scalable (rows are |groups|·d, aggregates combine map-side) and
   * exactly replayable — each component is fixed to integer
   * micro-units BEFORE the sum (the
   * [[graft.ext.Assemble.unigramSurprisal]] parity discipline) and
   * the mean is an exact truncating integer division (a rounded
   * double mean lands on .5-ulp boundaries where engines' round-half
   * conventions disagree — observed at sf0.01). Reassembling an
   * array column is one further groupBy(group) with
   * sort_array(collect_list) if the caller wants vectors back.
   */
  def meanPoolDims(
      df: DataFrame, groupCol: String,
      vecCol: String = "embedding"): DataFrame =
    graft.util.Tables.spread(df)
      .select(col(groupCol).as("g"), posexplode(col(vecCol)))
      .select(col("g"), col("pos").cast("long").as("dim"),
        floor(col("col").cast("double") * 1000000L).cast("long").as("xm"))
      .groupBy(col("g"), col("dim"))
      .agg(count(lit(1)).as("n_vecs"), sum(col("xm")).as("sum_micro"))
      .select(col("g"), col("dim"), col("n_vecs"), col("sum_micro"),
        expr("sum_micro div n_vecs").as("mean_micro"))

  // ── Product quantization (PQ) ─────────────────────────────────────
  // The storage-bound ANN tier (Jégou et al., PAMI 2011): compress
  // each vector to `m` one-byte codes (one codeword index per
  // contiguous subspace) and score queries against the COMPRESSED
  // corpus by asymmetric distance (ADC) — query stays full-precision,
  // candidates are looked up subspace-wise. At 100 TB of float32
  // embeddings, PQ(m=8) is a 16–64× storage cut, which is what lets
  // the candidate side of a similarity join live in executor memory.

  /**
   * Train PQ codebooks: split the dimension into `m` contiguous
   * subspaces and run Euclidean Lloyd's k-means (`k` codewords each)
   * per subspace over the SAME bounded deterministic sample
   * discipline as [[trainCentroids]] (lowest-xxhash64 ids, farthest-
   * point init — no RNG, replayable anywhere). Vectors are
   * L2-normalized first so ADC dot products approximate cosine.
   * Returns m × k × (d/m) floats — plan-literal metadata, like the
   * IVF centroids. Requires d divisible by `m`.
   */
  def trainPqCodebooks(
      corpus: DataFrame, m: Int = 4, k: Int = 16, sampleN: Int = 2048,
      iters: Int = 10, idCol: String = "vec_id",
      vecCol: String = "embedding"): Seq[Seq[Seq[Float]]] =
    trainPqCodebooksOnSample(
      trainSample(corpus, sampleN, idCol, vecCol), m, k, iters)

  /** [[trainPqCodebooks]] over an already-collected [[trainSample]]
    * (subspace slices copy — the shared sample is never mutated). */
  def trainPqCodebooksOnSample(
      sample: Array[Array[Double]], m: Int = 4, k: Int = 16,
      iters: Int = 10): Seq[Seq[Seq[Float]]] = {
    require(m >= 1 && k >= 1, "m and k must be >= 1")
    if (sample.isEmpty) return Nil
    val d = sample.head.length
    require(d % m == 0, s"dim $d not divisible by m=$m")
    val dSub = d / m

    (0 until m).map { j =>
      val sub = sample.map(v => v.slice(j * dSub, (j + 1) * dSub))
      val kEff = math.min(k, sub.length)
      // farthest-point init under L2 (deterministic)
      val centers = scala.collection.mutable.ArrayBuffer(sub.head.clone())
      val bestD = Array.fill(sub.length)(Double.MaxValue)
      while (centers.length < kEff) {
        var worst = 0; var worstD = Double.MinValue
        var i = 0
        while (i < sub.length) {
          val dd = sqDist(sub(i), centers.last)
          if (dd < bestD(i)) bestD(i) = dd
          if (bestD(i) > worstD) { worstD = bestD(i); worst = i }
          i += 1
        }
        centers += sub(worst).clone()
      }
      // Lloyd rounds (argmin L2; empty cell keeps its codeword)
      var round = 0
      while (round < iters) {
        val sums = Array.fill(kEff)(new Array[Double](dSub))
        val counts = new Array[Int](kEff)
        var i = 0
        while (i < sub.length) {
          var best = 0; var bd = Double.MaxValue
          var c = 0
          while (c < kEff) {
            val dd = sqDist(sub(i), centers(c))
            if (dd < bd) { bd = dd; best = c }
            c += 1
          }
          val t = sums(best); val v = sub(i)
          var x = 0
          while (x < dSub) { t(x) += v(x); x += 1 }
          counts(best) += 1
          i += 1
        }
        var c = 0
        while (c < kEff) {
          if (counts(c) > 0) {
            val mean = sums(c)
            var x = 0
            while (x < dSub) { mean(x) /= counts(c); x += 1 }
            centers(c) = mean
          }
          c += 1
        }
        round += 1
      }
      centers.map(_.map(_.toFloat).toSeq).toSeq
    }
  }

  private def sqDist(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  /** L2-normalized copy of an array column (zero vector stays zero). */
  /** L2-normalized copy of a float vector, as array<double> — the
    * native [[graft.functions.VecNormalize]] kernel. The HOF
    * formulation below ([[l2normHof]]) was the r17 bulk-ingest-gate
    * scale-killer: Catalyst inlines the norm subexpression into
    * EVERY element's interpreted lambda, so each row paid d×d boxed
    * evals (~2.75 ms/row at d=64 — 110 CPU-seconds per 40k-row
    * batch, measured via stage metrics). Bit-identical swap,
    * FunctionsSpec-pinned. */
  private[ext] def l2norm(v: Column): Column =
    graft.functions.GraftFunctions.vec_normalize(v)

  /** The replaced HOF formulation — kept ONLY as the equivalence
    * oracle for the kernel spec (the pqCodesCol convention). */
  private[graft] def l2normHof(v: Column): Column = {
    val n = norm(transform(v, x => x.cast("double")))
    transform(v, x =>
      when(n === 0.0, lit(0.0)).otherwise(x.cast("double") / n))
  }

  /**
   * Encode every vector to its `m` PQ codes: per subspace, the index
   * of the nearest (L2) codeword of the L2-normalized vector. Pure
   * narrow projection — the output (id, array<int> of length m) is
   * the compressed corpus a 100 TB vector store actually materializes
   * (m bytes/vector of payload vs 4·d). Degenerate training (empty
   * corpus ⇒ no codebooks) yields an empty frame, schema preserved.
   */
  def pqEncode(
      corpus: DataFrame, codebooks: Seq[Seq[Seq[Float]]],
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    if (codebooks.isEmpty)
      return corpus.select(col(idCol).as("id"),
        array().cast("array<int>").as("codes")).limit(0)
    graft.util.Tables.spread(corpus)
      .select(col(idCol).as("id"),
        pqCodesCol(col(vecCol), codebooks).as("codes"))
  }

  /** The PQ code-assignment expression itself (array<int> of length
    * m), exposed so callers composing wider projections (e.g. the
    * persisted [[VectorIndex]], which encodes cell + codes + vector
    * in one pass) reuse the exact encode semantics of [[pqEncode]]
    * without a join. */
  def pqCodesCol(
      vec: Column, codebooks: Seq[Seq[Seq[Float]]]): Column = {
    require(codebooks.nonEmpty, "codebooks must be non-empty")
    // argmin_c ||x̂_j − cw_c||² over the NORMALIZED vector x̂ ≡
    // argmax_c (x_j·cw_c / ||x|| − ||cw_c||²/2) over the RAW vector,
    // as the native [[graft.functions.PqCodes]] kernel (one codebook
    // reference + one fused loop). Two formulations preceded it, both
    // scale-killers: interpreted transform/aggregate normalization
    // re-inlined into all m·k scores (~20 ms/row), then a composed
    // stack of m·k dot_product-vs-literal kernels whose fused stage
    // passed Janino's 64 KB method limit and silently demoted the
    // WHOLE encode stage to interpreted eval (the "Failed to compile"
    // ERRORs in earlier verify logs). The kernel is bit-identical to
    // both (same accumulation order, norm clamp at 1e-30, ties to the
    // smaller codeword id — FunctionsSpec pins the equivalence).
    // Zero vectors: the clamp makes every dot 0 ⇒ argmax picks the
    // min-norm codeword — deterministic.
    graft.functions.GraftFunctions.pq_codes(vec, codebooks)
  }

  /**
   * ADC top-k search: full-precision queries against the PQ-encoded
   * corpus. Score ≈ cosine = Σ_j dot(q_sub_j, codeword_{j, code_j})
   * (query normalized; codewords live in normalized space). The
   * corpus side ships ONLY (id, codes) — the point of PQ: the
   * broadcast-nested-loop here is the same plan as [[bruteForceTopK]]
   * but streams m-byte rows instead of 4d-byte rows; compose with the
   * IVF cell join ([[ivfTopKTrained]]) to bound candidates at scale.
   * Exact re-ranking of the top candidates against stored vectors is
   * the standard refinement and composes as a join on id.
   */
  def pqTopK(
      codes: DataFrame, queries: DataFrame, codebooks: Seq[Seq[Seq[Float]]],
      k: Int, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    if (codebooks.isEmpty)
      return queries.select(col(idCol).as("q_id"), col(idCol).as("n_id"),
        lit(0.0).as("sim"), lit(1).as("rank")).limit(0)
    // ADC identity: Σ_j dot(q_j, cw_{j,code_j}) = dot(q, concat_j cw),
    // scored per (query, candidate) pair by the native
    // [[graft.functions.PqAdcScore]] kernel — bit-identical to the
    // reconstruct-then-dot formulation it replaces (flatten/transform
    // element_at into the flat codeword literal, then dot_product)
    // WITHOUT materializing a d-float reconstruction per pair, and
    // without the interpreted HOF decode (~10 µs/pair) the transform
    // cost. (The first cut scored pairs with nested interpreted
    // zip_with/aggregate lambdas: 173 s for 250k pairs at sf0.1 —
    // same lesson as brute-force cosine, see the CosineSimilarity
    // note.) Storage still ships codes, not floats; the codebook
    // rides the plan once as a reference object.
    val q = queries.select(col(idCol).as("q_id"),
      l2norm(col(vecCol)).as("q_vec"))
    val scored = codes
      .join(broadcast(q), col("q_id") =!= col("id"))
      .withColumn("sim", graft.functions.GraftFunctions.pq_adc_score(
        col("codes"), col("q_vec"), codebooks))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("sim").desc, col("id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("id").as("n_id"),
        round(col("sim"), 6).as("sim"), col("rank"))
  }

  /**
   * PQ search with exact re-ranking — the production composition:
   * [[pqTopK]] generates a `shortlist`-sized candidate set per query
   * from the COMPRESSED corpus (the only full scan), then exactly
   * `|queries| · shortlist` full vectors are fetched by id and
   * re-ranked with true cosine. ADC alone is a recall-lossy ranker
   * (quantization error reorders close neighbors); as a SHORTLIST
   * generator it is high-recall, and the refine step restores exact
   * order within it — the two-stage contract every PQ deployment
   * (FAISS IVFPQ+refine) runs on.
   */
  def pqTopKRefined(
      codes: DataFrame, corpus: DataFrame, queries: DataFrame,
      codebooks: Seq[Seq[Seq[Float]]], k: Int, shortlist: Int = 50,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(shortlist >= k, "shortlist must be >= k")
    val short = pqTopK(codes, queries, codebooks, shortlist, idCol, vecCol)
      .select(col("q_id"), col("n_id"))
    val c = corpus.select(col(idCol).as("n_id"), col(vecCol).as("n_vec"))
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"))
    val scored = short.join(c, Seq("n_id")).join(broadcast(q), Seq("q_id"))
      .withColumn("sim",
        graft.functions.GraftFunctions.cosine_sim(col("q_vec"), col("n_vec")))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("sim").desc, col("n_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("n_id"), round(col("sim"), 6).as("sim"),
        col("rank"))
  }

  /**
   * SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic dedup
   * over embeddings — near-duplicate GROUPS keep the member FARTHEST
   * from the group centroid (lowest cosine similarity), preserving
   * the most atypical example instead of an arbitrary one; everything
   * closer to the centroid is redundant with it and drops. Groups are
   * the connected components of the thresholded pair graph (the
   * paper's within-k-means-cluster pairing generalized to the exact
   * transitive closure this engine already certifies).
   *
   * Determinism discipline (the survivor pick must replay in any
   * engine): the centroid is derived from EXACT integers — per-dim
   * sums of `floor(x·10⁶)` micro-units divided as
   * `sum / (n · 10⁶)` — and every similarity is a fixed-order
   * sequential fold over the dims (Spark `aggregate`, DuckDB
   * `list_dot_product` — bit-identical, proven by the ANN tier), so
   * the (sim asc, id asc) keeper rank is a total order on identical
   * doubles in both engines. FP enters nothing else.
   *
   * Scale shape: pair graph + CC are the certified bucketed/banded
   * paths; the centroid is ONE groupBy(cluster, dim) with map-side
   * combine (output = clusters × dims rows, tiny); the join-back and
   * keeper window partition on the cluster id — no corpus-global key.
   * Returns every corpus row annotated (cluster_id NULL = singleton,
   * `kept` = survives the dedup).
   */
  /**
   * MMR (maximal marginal relevance, Carbonell & Goldstein 1998)
   * diversified top-k: greedily select `k` of the `kCand` nearest
   * candidates, each step maximizing
   * `λ·rel(c) − (1−λ)·max_{s∈selected} sim(c, s)` — the
   * diversified-retrieval re-rank a RAG stack runs AFTER similarity
   * search so near-duplicate passages don't crowd the context window.
   *
   * Scale shape: the candidate set comes from the certified top-k
   * machinery (swap [[bruteForceTopK]] for [[lshTopK]]/[[ivfTopKTrained]]
   * past broadcastable query counts); everything after is bounded by
   * construction — the pairwise-sim frame is |queries|·kCand² rows
   * regardless of corpus size, and each greedy step is one join +
   * one per-query window over ≤ kCand rows. MMR cost is independent
   * of the corpus.
   *
   * Determinism: relevance and pair sims round to 6 BEFORE the score
   * arithmetic; λ and 1−λ derive from integer milli-weights
   * (`lambdaMilli/1000.0` — bit-equal to the decimal literals an
   * oracle writes); ties break (score desc, id asc). Step 1 reuses
   * the candidate generator's raw-sim rank, not the rounded value.
   */
  def mmrTopK(
      corpus: DataFrame, queries: DataFrame, kCand: Int = 10, k: Int = 3,
      lambdaMilli: Long = 700,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(k >= 1 && kCand >= k, "need kCand >= k >= 1")
    require(lambdaMilli >= 0 && lambdaMilli <= 1000, "lambda in [0,1]")
    val cands = bruteForceTopK(corpus, queries, kCand, idCol, vecCol)
      .select(col("q_id"), col("n_id"), col("sim").as("rel"), col("rank"))
      .persist()
    try {
      val vecs = graft.util.Tables.spread(corpus)
        .select(col(idCol).as("vid"), col(vecCol).as("vv"))
      val av = cands.select(col("q_id"), col("n_id").as("a"))
        .join(vecs, col("a") === col("vid"))
        .select(col("q_id"), col("a"), col("vv").as("va"))
      val bv = cands.select(col("q_id"), col("n_id").as("b"))
        .join(vecs, col("b") === col("vid"))
        .select(col("q_id"), col("b"), col("vv").as("vb"))
      // cosine is symmetric: score each unordered pair ONCE (a < b)
      // and mirror the projection — halves the kCand² evaluations
      val half = av.join(bv, Seq("q_id")).filter(col("a") < col("b"))
        .select(col("q_id"), col("a"), col("b"),
          round(graft.functions.GraftFunctions.cosine_sim(
            col("va"), col("vb")), 6).as("s"))
      val ps = half.union(
          half.select(col("q_id"), col("b").as("a"), col("a").as("b"),
            col("s")))
        .persist()
      try {
        val lam = lambdaMilli.toDouble / 1000.0
        val mu = (1000L - lambdaMilli).toDouble / 1000.0
        var acc = cands.filter(col("rank") === 1)
          .select(col("q_id"), col("n_id"), lit(1).as("mmr_rank"))
        for (step <- 2 to k) {
          val selPairs = ps
            .join(acc.select(col("q_id"), col("n_id").as("b")),
              Seq("q_id", "b"))
            .select(col("q_id"), col("a").as("n_id"), col("s"))
          val pen = cands
            .join(acc.select(col("q_id"), col("n_id")),
              Seq("q_id", "n_id"), "left_anti")
            .join(selPairs, Seq("q_id", "n_id"))
            .groupBy(col("q_id"), col("n_id"), col("rel"))
            .agg(max(col("s")).as("pen"))
          val next = pen
            .withColumn("score",
              lit(lam) * col("rel") - lit(mu) * col("pen"))
            .withColumn("rn", row_number().over(
              Window.partitionBy(col("q_id"))
                .orderBy(col("score").desc, col("n_id"))))
            .filter(col("rn") === 1)
            .select(col("q_id"), col("n_id"), lit(step).as("mmr_rank"))
          acc = acc.union(next)
        }
        acc.join(cands.select(col("q_id"), col("n_id"), col("rel")),
            Seq("q_id", "n_id"))
          .select(col("q_id"), col("n_id"), col("rel"), col("mmr_rank"))
          .localCheckpoint()
      } finally ps.unpersist()
    } finally cands.unpersist()
  }

  /** Corpus-sized cell count — the 100 TB sizing rule for every
    * cell-join operator here: hold EXPECTED CELL OCCUPANCY constant
    * (`n / nCells ≈ targetPerCell`) so the within-cell self-join's
    * candidate volume stays O(n · targetPerCell · nProbe²/nCells…) —
    * linear in n — instead of O(n²/nCells) under a pinned cell count
    * (measured: q_semdedup at 30× key-growth data read 5.2× the wall
    * of 10× under pinned nCells=16; see BASELINE.md r16). More cells
    * trade recall (a τ-similar pair can land in disjoint probe sets)
    * — the SemDeDup production posture, which dedups within clusters
    * by design; [[cellStats]] is the pre-flight that shows when to
    * re-size. */
  def sizedCells(n: Long, targetPerCell: Int = 128, floor: Int = 16): Int =
    math.max(floor.toLong, (n + targetPerCell - 1) / targetPerCell)
      .min(Int.MaxValue.toLong).toInt

  /** [[semDedup]] over [[pairGraphCollapsedAuto]] — the cell count
    * sized from the unique-vector count, so the candidate join stays
    * linear at any scale. The production entry point; the
    * pinned-nCells form below is the oracle-certification shape
    * (its exhaustive-recall oracle needs the generous probe
    * coverage a small fixed cell count provides). */
  def semDedupAuto(
      corpus: DataFrame, threshold: Double, targetPerCell: Int = 128,
      nProbe: Int = 6, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame =
    semDedupFromPairs(corpus,
      pairGraphCollapsedAuto(corpus, threshold, targetPerCell, nProbe,
        idCol, vecCol), idCol, vecCol)

  def semDedup(
      corpus: DataFrame, threshold: Double, nCells: Int = 16,
      nProbe: Int = 6, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame =
    semDedupFromPairs(corpus,
      pairGraphCollapsed(corpus, threshold, nCells, nProbe, idCol,
        vecCol), idCol, vecCol)

  /** SemDeDup survivor selection over an already-built near-dup pair
    * graph: connected components, exact-integer centroid per
    * component, keep the member FARTHEST from the centroid. */
  private def semDedupFromPairs(
      corpus: DataFrame, pairs: DataFrame, idCol: String,
      vecCol: String): DataFrame = {
    val labels = graft.ext.Dedup.connectedComponents(pairs, "q_id", "n_id")
      .withColumnRenamed("id", idCol)
    val mem = graft.util.Tables.spread(corpus)
      .select(col(idCol), col(vecCol).cast("array<double>").as("v"))
      .join(labels, Seq(idCol))
    val cent = mem
      .select(col("cluster_id"), posexplode(col("v")).as(Seq("d", "x")))
      .withColumn("xm", floor(col("x") * 1000000L).cast("long"))
      .groupBy(col("cluster_id"), col("d"))
      .agg(sum(col("xm")).as("s"), count(lit(1)).as("cnt"))
      .withColumn("c", col("s").cast("double") / (col("cnt") * 1000000.0))
      .groupBy(col("cluster_id"))
      .agg(transform(array_sort(collect_list(struct(col("d"), col("c")))),
        e => e.getField("c")).as("cent"))
    def dot(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, y) => acc + y)
    val scored = mem.join(cent, Seq("cluster_id"))
      .withColumn("sim", dot(col("v"), col("cent")) /
        (sqrt(dot(col("v"), col("v"))) * sqrt(dot(col("cent"), col("cent")))))
    val w = Window.partitionBy(col("cluster_id"))
      .orderBy(col("sim"), col(idCol))
    val verdict = scored
      .withColumn("kept", row_number().over(w) === 1)
      .select(col(idCol), col("cluster_id"), col("kept"))
    graft.util.Tables.spread(corpus).select(col(idCol))
      .join(verdict, Seq(idCol), "left")
      .select(col(idCol), col("cluster_id"),
        coalesce(col("kept"), lit(true)).as("kept"))
      .localCheckpoint()
  }
}
