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
    * derived from a hash — reproducible across engines and runs. */
  private def planeComponent(p: Int, d: Column): Column =
    (pmod(xxhash64(lit(p), d), lit(1000003L)).cast("double") /
      lit(1000003.0)) * 2.0 - 1.0

  /** Sign-pattern LSH bucket id from `nPlanes` hyperplanes. */
  def lshBucket(vec: Column, nPlanes: Int = 12): Column =
    (0 until nPlanes).map { p =>
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (x, d) => x.cast("double") * planeComponent(p, d)),
        lit(0.0), (acc, v) => acc + v)
      when(proj >= 0, lit(1L << p)).otherwise(0L)
    }.reduce[Column](_ bitwiseOR _)

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
    * [[ivfAssign]] (argmax) and [[bucketedPairs]] (top-P probe). */
  private def cellProjections(vec: Column, nCells: Int): Seq[Column] =
    (0 until nCells).map { cIdx =>
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (x, d) => x.cast("double") * planeComponent(cIdx * 7919, d)),
        lit(0.0), (acc, v) => acc + v)
      struct(proj.as("s"), lit(cIdx).as("c"))
    }

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
   * IVF-style variant: corpus assigned to the nearest of `nCells`
   * deterministic seed centroids (derived from hashed unit vectors);
   * queries probe their own cell only. Same shuffle shape as LSH but
   * with distance-aware cells.
   */
  def ivfAssign(vec: Column, nCells: Int = 16): Column =
    greatest(cellProjections(vec, nCells): _*).getField("c")

  /** Top-`nProbe` cells by projection (deterministic tie-break on
    * cell id) — the multi-probe assignment used by [[bucketedPairs]]
    * and the query side of probed IVF search. `ivfProbe(v, n, 1)`
    * equals `array(ivfAssign(v, n))`. */
  def ivfProbe(vec: Column, nCells: Int, nProbe: Int): Column = {
    val projs = array(cellProjections(vec, nCells): _*)
    val byProj = array_sort(projs, (a, b) =>
      when(a.getField("s") > b.getField("s"), -1)
        .when(a.getField("s") < b.getField("s"), 1)
        .otherwise(a.getField("c") - b.getField("c")))
    transform(slice(byProj, 1, nProbe), c => c.getField("c"))
  }
}
