package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/**
 * Perceptual image hashing — near-duplicate detection for image
 * corpora (engine extension; BASELINE.json north star). Exact digest
 * dedup ([[Multimodal.withMeta]]'s sha256) only collapses
 * byte-identical files; re-encoded, brightness-shifted, or slightly
 * edited copies need a PERCEPTUAL key. dHash (difference hash — the
 * classic 9×8 gradient-sign hash) is brightness-shift invariant by
 * construction: each bit is the sign of a horizontal luma gradient,
 * so adding a constant to every pixel changes nothing.
 *
 * All arithmetic is exact integers (luma in ITU-601 per-mille
 * weights, box sums, floor-milli cell means, sign comparisons), so
 * the hash is bit-identical on any engine and an oracle can replay
 * it per-pixel from the synthesis formula.
 *
 * Scale shape: hashing is one mapPartitions pass over the media
 * batches — bytes never shuffle, only (id, dims, 2×32-bit hash) rows
 * leave the scan. Pairing is a BANDED LSH join (the
 * [[Dedup.simhashPairs]] pigeonhole): 4 disjoint 16-bit bands, block
 * key = (width, height, band#, band value) — hamming ≤ 3 implies at
 * least one band is untouched, so the candidate join is COMPLETE for
 * the shipped threshold while never going all-pairs. Verification is
 * an id-keyed join back to the hash frame and a codegen'd
 * `bit_count(xor)` filter.
 */
object ImageHash {

  /** One image's dHash: 64 gradient bits packed as two NON-NEGATIVE
    * 32-bit halves (`hi` = bits 0–31, `lo` = bits 32–63) — two longs
    * sidestep 64-bit sign wrap in every engine's BIGINT. */
  final case class PpmDHash(
      media_id: String, width: Int, height: Int, hi: Long, lo: Long)

  /**
   * Decode P6 PPM bytes and compute the 9×8 dHash. Grid assignment
   * is the integer partition `gx = x·9 div w`, `gy = y·8 div h`
   * (cells can be empty below 9×8 pixels — they contribute 0, same
   * convention both sides); cell value is the floor-milli luma mean;
   * bit `gy·8+gx` is 1 iff cell(gx+1,gy) > cell(gx,gy).
   * Header walk mirrors [[Multimodal.parsePpm]] (strict variant).
   */
  def ppmDHash(media: DataFrame): Dataset[PpmDHash] = {
    implicit val enc = Encoders.product[PpmDHash]
    media.select("media_id", "content").mapPartitions { rows =>
      rows.map { r => dhashOne(r.getString(0), r.getAs[Array[Byte]](1)) }
    }
  }

  /** Strict P6 header walk (magic, `#` comments, w/h/maxval, ONE
    * whitespace byte before payload) → (width, height, payloadPos). */
  private def p6Header(id: String, b: Array[Byte]): (Int, Int, Int) = {
    require(b != null, s"null PPM payload: media_id=$id")
    require(b.length >= 2 && b(0) == 'P' && b(1) == '6',
      s"not a P6 PPM: media_id=$id")
    var pos = 2
    def skipWs(): Unit = {
      var done = false
      while (!done && pos < b.length) {
        val ch = b(pos)
        if (ch == '#') { while (pos < b.length && b(pos) != '\n') pos += 1 }
        else if (ch == ' ' || ch == '\n' || ch == '\r' || ch == '\t') pos += 1
        else done = true
      }
    }
    def readInt(): Int = {
      skipWs()
      require(pos < b.length && b(pos) >= '0' && b(pos) <= '9',
        s"malformed PPM header: media_id=$id at byte $pos")
      var v = 0
      while (pos < b.length && b(pos) >= '0' && b(pos) <= '9') {
        v = v * 10 + (b(pos) - '0'); pos += 1
      }
      v
    }
    val w = readInt(); val h = readInt(); readInt()
    pos += 1 // exactly ONE whitespace byte separates maxval and payload
    require(b.length - pos >= w.toLong * h * 3,
      s"truncated PPM payload: media_id=$id")
    (w, h, pos)
  }

  private[ext] def dhashOne(id: String, b: Array[Byte]): PpmDHash = {
    val (w, h, pos) = p6Header(id, b)
    val (hi, lo) = dhashGrid(w, h, (x, y) => {
      val o = pos + (y * w + x) * 3
      (b(o) & 0xff) * 299L + (b(o + 1) & 0xff) * 587L +
        (b(o + 2) & 0xff) * 114L
    })
    PpmDHash(id, w, h, hi, lo)
  }

  /** The 9×8 gradient-sign core over any single-channel pixel
    * function (milli-luma for images, raw Y for video frames — the
    * sign compares are scale-invariant): integer box partition
    * `gx = x·9 div w`, `gy = y·8 div h`, floor-milli cell means,
    * bit `gy·8+gx` = cell(gx+1,gy) > cell(gx,gy), packed as two
    * non-negative 32-bit halves. */
  private[ext] def dhashGrid(
      w: Int, h: Int, value: (Int, Int) => Long): (Long, Long) = {
    val sums = new Array[Long](72)
    val cnts = new Array[Long](72)
    var y = 0
    while (y < h) {
      val gy = y * 8 / h
      var x = 0
      while (x < w) {
        val c = gy * 9 + x * 9 / w
        sums(c) += value(x, y); cnts(c) += 1
        x += 1
      }
      y += 1
    }
    def cell(gx: Int, gy: Int): Long = {
      val c = gy * 9 + gx
      sums(c) * 1000L / math.max(cnts(c), 1L)
    }
    var hi = 0L; var lo = 0L
    var gy = 0
    while (gy < 8) {
      var gx = 0
      while (gx < 8) {
        if (cell(gx + 1, gy) > cell(gx, gy)) {
          val i = gy * 8 + gx
          if (i < 32) hi |= 1L << i else lo |= 1L << (i - 32)
        }
        gx += 1
      }
      gy += 1
    }
    (hi, lo)
  }

  /**
   * Synthesize PERCEPTUAL near-dup twins: copy each image, overwrite
   * pixel 0 with mid-gray (128,128,128), suffix the id. One pixel
   * only perturbs cell(0,0)'s mean, and cell(0,0) feeds exactly one
   * gradient bit (the left operand of bit gy=0,gx=0), so
   * hamming(original, twin) ≤ 1 by construction — a guaranteed
   * planted pair per input image, deterministic enough for a
   * per-pixel SQL oracle to replay (twin luma at i=0 is exactly
   * 128·(299+587+114) = 128000). Same mapPartitions batch shape as
   * the hasher: bytes never shuffle.
   */
  def vandalizeFirstPixel(media: DataFrame, suffix: String): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "media_type", "content")
      .map { r =>
        val id = r.getString(0)
        val b = r.getAs[Array[Byte]](2).clone()
        val (_, _, pos) = p6Header(id, b)
        b(pos) = 128.toByte; b(pos + 1) = 128.toByte; b(pos + 2) = 128.toByte
        (id + suffix, r.getString(1), b)
      }.toDF("media_id", "media_type", "content")
  }

  /**
   * Near-duplicate image pairs: banded candidate join, hamming ≤
   * `maxHamming` verification. Complete (zero false negatives)
   * whenever `maxHamming` < number of bands (pigeonhole over the 4
   * disjoint 16-bit bands); block key includes the dimensions, so a
   * band value shared across resolutions never widens a bucket.
   *
   * @return (id_a, id_b, hamming), id_a < id_b under the id column's
   *         own ordering.
   */
  def dhashPairs(media: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 4,
      "banded completeness holds for maxHamming < 4")
    pairsOverHashes(ppmDHash(media).toDF(), maxHamming)
  }

  /** Banded pairing over an explicit hash frame
    * (media_id, width, height, hi, lo) — shared by [[dhashPairs]]
    * (all images) and [[dhashClusters]] (distinct hashes only). */
  private def pairsOverHashes(h: DataFrame, maxHamming: Int): DataFrame = {
    val bands = h.select(col("media_id"), col("width"), col("height"),
      posexplode(array(
        col("hi").bitwiseAND(lit(0xffffL)),
        shiftright(col("hi"), 16).bitwiseAND(lit(0xffffL)),
        col("lo").bitwiseAND(lit(0xffffL)),
        shiftright(col("lo"), 16).bitwiseAND(lit(0xffffL))))
        .as(Seq("band", "v")))
    val cand = bands.as("a").join(bands.as("b"),
        col("a.width") === col("b.width") &&
          col("a.height") === col("b.height") &&
          col("a.band") === col("b.band") && col("a.v") === col("b.v") &&
          col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("id_a"), col("b.media_id").as("id_b"))
      .distinct()
    cand
      .join(h.select(col("media_id").as("id_a"),
        col("hi").as("hi_a"), col("lo").as("lo_a")), Seq("id_a"))
      .join(h.select(col("media_id").as("id_b"),
        col("hi").as("hi_b"), col("lo").as("lo_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        (bit_count(col("hi_a").bitwiseXOR(col("hi_b"))) +
          bit_count(col("lo_a").bitwiseXOR(col("lo_b"))))
          .cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /**
   * Incremental near-dup pairing: today's BATCH banded-joined against
   * the accumulated CORPUS without corpus self-comparison — the
   * production ingest shape ([[AudioHash.wavFpPairsAgainst]] /
   * [[graft.ext.Dedup.minhashPairsAgainst]]). Same block key and
   * pigeonhole completeness as [[dhashPairs]].
   *
   * @return (batch_id, corpus_id, hamming) for every cross pair
   *         within `maxHamming`.
   */
  def dhashPairsAgainst(
      batch: DataFrame, corpus: DataFrame,
      maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 4,
      "banded completeness holds for maxHamming < 4")
    pairsAgainstHashes(ppmDHash(batch).toDF(), ppmDHash(corpus).toDF(),
      maxHamming)
  }

  /** The batch-vs-corpus banded join over explicit hash frames —
    * shared by the PPM ([[dhashPairsAgainst]]) and JPEG
    * ([[jpegDHashPairsAgainst]]) input paths. */
  private def pairsAgainstHashes(
      hb: DataFrame, hc: DataFrame, maxHamming: Int): DataFrame = {
    def bands(h: DataFrame) = h.select(col("media_id"), col("width"),
      col("height"),
      posexplode(array(
        col("hi").bitwiseAND(lit(0xffffL)),
        shiftright(col("hi"), 16).bitwiseAND(lit(0xffffL)),
        col("lo").bitwiseAND(lit(0xffffL)),
        shiftright(col("lo"), 16).bitwiseAND(lit(0xffffL))))
        .as(Seq("band", "v")))
    val cand = bands(hb).as("a").join(bands(hc).as("b"),
        col("a.width") === col("b.width") &&
          col("a.height") === col("b.height") &&
          col("a.band") === col("b.band") && col("a.v") === col("b.v"))
      .select(col("a.media_id").as("batch_id"),
        col("b.media_id").as("corpus_id"))
      .distinct()
    cand
      .join(hb.select(col("media_id").as("batch_id"),
        col("hi").as("hi_a"), col("lo").as("lo_a")), Seq("batch_id"))
      .join(hc.select(col("media_id").as("corpus_id"),
        col("hi").as("hi_b"), col("lo").as("lo_b")), Seq("corpus_id"))
      .select(col("batch_id"), col("corpus_id"),
        (bit_count(col("hi_a").bitwiseXOR(col("hi_b"))) +
          bit_count(col("lo_a").bitwiseXOR(col("lo_b"))))
          .cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** dHash over REAL baseline-JPEG bytes: full T.81 decode to RGB
    * ([[Multimodal.parseJpegRgb]] — marker walk, Huffman, dequant,
    * IDCT, BT.601), then the same 9×8 gradient-sign grid over the
    * exact integer milli-luma as the PPM path. One mapPartitions
    * pass; bytes never shuffle. */
  def jpegDHash(media: DataFrame): Dataset[PpmDHash] = {
    implicit val enc = Encoders.product[PpmDHash]
    media.select("media_id", "content").mapPartitions { rows =>
      val cosT = Multimodal.jpegCosTable()
      rows.map { r =>
        val id = r.getString(0)
        val (w, h, rgb) =
          Multimodal.parseJpegRgb(id, r.getAs[Array[Byte]](1), cosT)
        val (hi, lo) = dhashGrid(w, h, (x, y) => {
          val o = (y * w + x) * 3
          (rgb(o) & 0xff) * 299L + (rgb(o + 1) & 0xff) * 587L +
            (rgb(o + 2) & 0xff) * 114L
        })
        PpmDHash(id, w, h, hi, lo)
      }
    }
  }

  /**
   * Synthesize RE-ENCODED near-dup twins: decode each baseline JPEG
   * to pixels and re-encode at a DIFFERENT quantization scale —
   * the realistic near-duplicate (a lossy re-save), not single-pixel
   * vandalism. The twin's BYTES differ (different DQT, different
   * entropy stream — exact sha256 dedup misses it) while for the
   * flat-tile corpus with `quantScale <= 4` the decoded pixels
   * round-trip bit-exactly (the DC error bound in
   * [[Multimodal.jpegEncode]]), so dHash survives the re-encode with
   * hamming 0 by construction — which is what the oracle replays.
   */
  def reencodeJpeg(
      media: DataFrame, suffix: String, quantScale: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "media_type", "content")
      .map { r =>
        val id = r.getString(0)
        val cosT = Multimodal.jpegCosTable()
        val (w, h, rgb) =
          Multimodal.parseJpegRgb(id, r.getAs[Array[Byte]](2), cosT)
        (id + suffix, r.getString(1),
          Multimodal.jpegEncode(w, h, rgb, chroma420 = false,
            quantScale = quantScale))
      }.toDF("media_id", "media_type", "content")
  }

  /** [[dhashPairsAgainst]] over JPEG inputs — the incremental ingest
    * join for a batch of re-encoded uploads against the accumulated
    * JPEG corpus. */
  def jpegDHashPairsAgainst(
      batch: DataFrame, corpus: DataFrame,
      maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 4,
      "banded completeness holds for maxHamming < 4")
    pairsAgainstHashes(jpegDHash(batch).toDF(), jpegDHash(corpus).toDF(),
      maxHamming)
  }

  /**
   * Near-duplicate image CLUSTERS — the production-scale counterpart
   * of [[dhashPairs]]. Pair enumeration is inherently quadratic in
   * duplicate-cluster size (k byte-identical copies alone are k·(k−1)/2
   * hamming-0 rows; the ~sf1 key-growth smoke measured 3,088 → 517,776
   * within-cluster pairs for 10× data), so at corpus scale the usable
   * output is a per-image cluster assignment, O(n) rows.
   *
   * Shape: (1) one hashing scan (bytes never shuffle); (2) exact-hash
   * collapse — identical images are hamming-0 cliques, so banding, the
   * candidate join, and connected components all run over the DISTINCT
   * (dims, hash) table, never re-deriving the clique edges; (3)
   * [[Dedup.connectedComponents]] (large-star/small-star, O(log² n)
   * rounds) over the representative pairs; (4) one hash-keyed join
   * assigns every image its representative's component.
   *
   * Output: (media_id, cluster_id) for every image with at least one
   * near-duplicate (an identical-hash sibling or a hamming ≤ maxHamming
   * neighbor); cluster_id = the component's minimum media_id under the
   * id column's own ordering — the same convention as
   * [[Dedup.connectedComponents]], so singleton images are omitted,
   * matching the minhash cluster rows.
   */
  def dhashClusters(media: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 4,
      "banded completeness holds for maxHamming < 4")
    clustersOverHashes(ppmDHash(media).toDF(), maxHamming)
  }

  /** [[dhashClusters]] over JPEG inputs — the production (O(n)-output)
    * counterpart of [[jpegDHashPairsAgainst]]'s pair enumeration for
    * re-encoded corpora: the ~sf1 key-growth smoke read the re-encode
    * PAIR row at 100× output (re-uploads hitting their 10×-larger
    * near-dup cliques); this collapse-first form assigns each image
    * one cluster id. */
  def jpegDHashClusters(media: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 4,
      "banded completeness holds for maxHamming < 4")
    clustersOverHashes(jpegDHash(media).toDF(), maxHamming)
  }

  /** The collapse-first cluster core over an explicit hash frame —
    * shared by the PPM and JPEG input paths. */
  private def clustersOverHashes(
      hIn: DataFrame, maxHamming: Int): DataFrame = {
    // the hash frame is the codec-decode pass (PPM/JPEG walk) and
    // feeds three consumers (groups, the pair graph, the final join) —
    // persist it so the decode runs once; the result materializes via
    // localCheckpoint before the cache drops
    val h = hIn.persist()
    try {
      val groups = h.groupBy("width", "height", "hi", "lo")
        .agg(min("media_id").as("rep"), count(lit(1)).as("members"))
      val reps = groups.select(col("rep").as("media_id"),
        col("width"), col("height"), col("hi"), col("lo"))
      val cc = Dedup.connectedComponents(
          pairsOverHashes(reps, maxHamming), "id_a", "id_b")
        .withColumnRenamed("id", "rep")
        .withColumnRenamed("cluster_id", "cc_id")
      h.join(groups, Seq("width", "height", "hi", "lo"))
        .join(cc, Seq("rep"), "left")
        // in the output iff SOME near-dup exists: an identical-hash
        // sibling (members > 1) or a cross-hash component edge (cc row)
        .filter(col("members") > 1 || col("cc_id").isNotNull)
        .select(col("media_id"),
          coalesce(col("cc_id"), col("rep")).as("cluster_id"))
        .localCheckpoint()
    } finally { h.unpersist(); () }
  }
}
