package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Deduplication operators for training-data pipelines (engine
 * extension; BASELINE.json north star). Five tiers, cheapest first:
 *
 *  1. exact       — hash-groupBy on a normalized fingerprint;
 *  2. minhash+LSH — shingle → minhash signature → banded bucket join;
 *  3. simhash     — 64-bit weighted-projection fingerprint, hamming;
 *  4. n-gram Jaccard — verification metric for candidate pairs;
 *  5. embedding cosine — semantic near-dup via Similarity.
 *
 * Scale design: every tier is candidate-generation-by-key (shuffle on
 * a short hash key) followed by within-bucket verification — never an
 * all-pairs cross join. At 100 TB the band/bucket shuffle is the only
 * wide dependency, and bucket sizes are bounded by construction
 * (a band collision requires r equal minhashes), so no single task
 * explodes. All hashes are deterministic (xxhash64 with fixed seeds),
 * so results are reproducible across runs and cluster sizes.
 */
object Dedup {

  // ── 1. exact ────────────────────────────────────────────────────

  /** Exact dedup: keep the smallest id per normalized-text
    * fingerprint. One shuffle on the 128-bit key. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val fp = TextAnalysis.fingerprint(col(textCol))
    val w = Window.partitionBy(col("fingerprint")).orderBy(col(idCol))
    df.withColumn("fingerprint", fp)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  // ── shingling (shared by minhash / jaccard) ─────────────────────

  /** Word n-gram shingles of the normalized text (distinct). */
  def shingles(text: Column, n: Int = 3): Column = {
    val tokens = split(regexp_replace(lower(trim(text)), "\\s+", " "), " ")
    val nTok = size(tokens)
    array_distinct(
      when(nTok < n, array(concat_ws(" ", tokens)))
        .otherwise(
          transform(sequence(lit(0), nTok - n),
            i => concat_ws(" ", slice(tokens, i + 1, lit(n))))))
  }

  // ── 2. minhash + LSH ────────────────────────────────────────────

  /**
   * MinHash signature: k independent permutations approximated by
   * seeded xxhash64 of each shingle; signature[i] = min over shingles.
   * Pure expression (transform + array_min over a literal seed array)
   * — no UDF, no MLlib vector conversion overhead.
   */
  def minhashSignature(text: Column, k: Int = 32, n: Int = 3): Column = {
    val sh = shingles(text, n)
    val seeds = (0 until k).map(lit(_))
    array(seeds.map(seed =>
      array_min(transform(sh, s => xxhash64(s, seed)))): _*)
  }

  /**
   * LSH candidate pairs: signatures split into `bands` bands of
   * r = k/bands rows; docs sharing any band bucket become a candidate
   * pair. Implemented as explode(bands) → groupBy(band, bucketHash) →
   * within-bucket self-join. The band hash is the shuffle key; bucket
   * sizes stay small because a collision needs r equal minhashes.
   */
  def minhashCandidates(
      df: DataFrame, idCol: String, textCol: String,
      k: Int = 32, bands: Int = 8, n: Int = 3): DataFrame = {
    val r = k / bands
    val sig = df.select(col(idCol).as("id"),
      minhashSignature(col(textCol), k, n).as("sig"))
    val banded = sig.select(col("id"),
      posexplode(array((0 until bands).map(b =>
        xxhash64(concat_ws(",",
          slice(col("sig"), b * r + 1, r)), lit(b))): _*)))
      .toDF("id", "band", "bucket")
    val l = banded.as("l"); val rgt = banded.as("r")
    l.join(rgt,
        col("l.band") === col("r.band") &&
        col("l.bucket") === col("r.bucket") &&
        col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .distinct()
  }

  /** MinHash near-dedup: candidates verified by true n-gram Jaccard
    * ≥ threshold. */
  def minhashDedup(
      df: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.8, k: Int = 32, bands: Int = 8,
      n: Int = 3): DataFrame = {
    val cands = minhashCandidates(df, idCol, textCol, k, bands, n)
    val docs = df.select(col(idCol).as("id"),
      shingles(col(textCol), n).as("sh"))
    cands
      .join(docs.withColumnRenamed("id", "id_a")
        .withColumnRenamed("sh", "sh_a"), "id_a")
      .join(docs.withColumnRenamed("id", "id_b")
        .withColumnRenamed("sh", "sh_b"), "id_b")
      .withColumn("jaccard", jaccardExpr(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  // ── 3. simhash ──────────────────────────────────────────────────

  /**
   * SimHash: 64-bit fingerprint where bit j is the sign of
   * Σ_tokens (token-hash bit j ? +1 : -1). Near-dups differ in few
   * bits. Expression-only: per-bit vote via transform/aggregate.
   */
  def simhash(text: Column, n: Int = 3): Column = {
    val sh = shingles(text, n)
    (0 until 64).map { j =>
      val vote = aggregate(sh, lit(0L), (acc, s) =>
        acc + when(shiftright(xxhash64(s), j).bitwiseAND(1) === 1, 1L)
          .otherwise(-1L))
      when(vote > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce[Column](_ bitwiseOR _)
  }

  /** Hamming distance between two simhash fingerprints. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs: block on the 4 16-bit quadrants (a pair
    * within hamming ≤ 3 of 64 bits must agree on ≥1 quadrant — the
    * standard pigeonhole blocking), verify by full hamming. */
  def simhashPairs(
      df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3, n: Int = 3): DataFrame = {
    val sigs = df.select(col(idCol).as("id"),
      simhash(col(textCol), n).as("sig"))
    val blocked = sigs.select(col("id"), col("sig"),
      posexplode(array((0 until 4).map(q =>
        shiftright(col("sig"), q * 16).bitwiseAND(65535)): _*)))
      .toDF("id", "sig", "quadrant", "block")
    val l = blocked.as("l"); val r = blocked.as("r")
    l.join(r,
        col("l.quadrant") === col("r.quadrant") &&
        col("l.block") === col("r.block") &&
        col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"),
        hamming(col("l.sig"), col("r.sig")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  // ── 4. n-gram Jaccard ───────────────────────────────────────────

  /** |A∩B| / |A∪B| over shingle arrays, as a pure expression. */
  def jaccardExpr(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      greatest(size(array_union(a, b)), lit(1)).cast("double")

  /** All-pairs n-gram Jaccard within a blocking key (e.g. a length
    * bucket or LSH bucket) — the verification join used by tests and
    * small-scope audits; production paths go through minhashDedup. */
  def ngramJaccardPairs(
      df: DataFrame, idCol: String, textCol: String,
      blockCol: Column, threshold: Double, n: Int = 3): DataFrame = {
    val docs = df.select(col(idCol).as("id"), blockCol.as("block"),
      shingles(col(textCol), n).as("sh"))
    val l = docs.as("l"); val r = docs.as("r")
    l.join(r, col("l.block") === col("r.block") && col("l.id") < col("r.id"))
      .withColumn("jaccard", jaccardExpr(col("l.sh"), col("r.sh")))
      .filter(col("jaccard") >= threshold)
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"),
        round(col("jaccard"), 6).as("jaccard"))
  }
}
