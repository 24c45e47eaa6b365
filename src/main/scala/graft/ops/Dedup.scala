package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale text corpora.
  *
  * No counterpart in the reference (delta-rs is a storage client); these are
  * the north-star LLM-pipeline operators, built Spark-first:
  *
  *  - everything is declarative DataFrame ops (codegen'd built-ins, no UDFs);
  *  - candidate generation is always **bucketed** (LSH bands / hash buckets /
  *    band-equality joins) — never an all-pairs product, which is the O(n²)
  *    killer at 100 TB;
  *  - exact verification runs only on the candidate set.
  */
object Dedup {

  /** Default per-bucket cap for every banded candidate join below. A bucket
    * of size n emits ~n²/2 candidate pairs, so one degenerate hash key — a
    * corpus of millions of empty/boilerplate documents collapsing to one
    * simhash, or all-zero embeddings sharing one LSH bucket — turns a
    * banded join into the very all-pairs product banding exists to avoid.
    * AQE skew handling splits *partitions*, not the quadratic pair count,
    * so the guard must act before the join. 10 000 bounds any single
    * bucket to ≤ 5·10⁷ pairs while sitting far above real duplicate-family
    * sizes (the r7 sf1 sweep measured families of ~10). */
  val DefaultMaxBucketSize = 10000L

  /** The buckets a cap of `cap` would drop: one row per oversized bucket,
    * `keyCols :+ bucket_n`. Run this (cheap: map-side-combined aggregate)
    * to audit dropped mass before lowering or raising a cap — every
    * member of a dropped bucket loses THIS band's collision chance, so
    * recall for pairs whose only witness was a dropped bucket is 0. */
  def oversizedBuckets(rows: DataFrame, keyCols: Seq[String], cap: Long): DataFrame =
    rows.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("bucket_n"))
      .filter(col("bucket_n") > cap)

  /** Degenerate-bucket guard (round 11): filter out rows of buckets larger
    * than `cap` BEFORE any quadratic self-join, via a count window OVER THE
    * SAME partitioning the join shuffles on — the window's exchange and
    * per-partition sort are exactly what the downstream sort-merge join
    * needs, so on normal corpora the guard is near-free (no second pass
    * over the banding lineage, no extra shuffle). Dropping (not salting)
    * is deliberate: salt spreads a bucket's rows across partitions but
    * every cross-salt pair must still be emitted, so the pair count stays
    * quadratic — only dropping bounds it. The recall contract is the
    * caller's to document. */
  private def dropOversizedBuckets(rows: DataFrame, keyCols: Seq[String],
                                   cap: Option[Long]): DataFrame = cap match {
    case None => rows
    case Some(c) =>
      require(c > 0, s"maxBucketSize must be positive, got $c")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(keyCols.map(col): _*)
      rows.withColumn("__graft_bucket_n", count(lit(1)).over(w))
        .filter(col("__graft_bucket_n") <= c)
        .drop("__graft_bucket_n")
  }

  /** Exact dedup: one representative row (min of `idCol`) per distinct key.
    * Scale: single hash-shuffle on the key columns with map-side partial
    * aggregation; no data skew beyond the key distribution itself. */
  def exact(df: DataFrame, keyCols: Seq[String], idCol: String): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(min(col(idCol)).as(idCol))

  /** Fingerprint dedup: normalize → hash a stable prefix → group. The md5
    * fingerprint is the shuffle key, so the shuffle carries 32-byte keys
    * instead of document bodies. */
  def byFingerprint(df: DataFrame, textCol: String, idCol: String,
                    prefixLen: Int = 80): DataFrame =
    df.withColumn("fp", md5(lower(substring(col(textCol), 1, prefixLen))))
      .groupBy("fp")
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_dupes"))

  /** Distinct word n-gram shingles per document: (id, shingle) rows.
    * Documents shorter than `n` words produce no shingles. */
  def shingles(df: DataFrame, textCol: String, idCol: String, n: Int = 3): DataFrame =
    df.select(col(idCol), split(lower(col(textCol)), " ").as("w"))
      .filter(size(col("w")) >= n)
      .select(col(idCol), explode(array_distinct(expr(
        s"transform(sequence(0, size(w) - $n), i -> concat_ws(' ', slice(w, i + 1, $n)))")))
        .as("shingle"))

  /** Exact Jaccard-similar pairs via a shingle-equality join — the candidate
    * pairs are generated per shingle bucket (shuffle on the shingle), never
    * all-pairs. `thresholdNum/thresholdDen` is the Jaccard threshold as an
    * exact rational so the comparison is integer-only.
    *
    * Scale note: a shingle shared by k docs contributes k²/2 candidate rows —
    * at 100 TB, stop-shingle removal (drop shingles with document frequency
    * above a cap) bounds the blowup; `maxShingleDf` applies that cap.
    *
    * Recall caveat (measured, round-7 sf1 stress sweep): a duplicate FAMILY
    * of size k multiplies every one of its shingles' df by k, so a cap below
    * k × (typical base df) silently drops the exact shingles that witness
    * the duplicates — on a corpus of 10-member families, cap=40 found 0
    * pairs where cap=250 found 250k. Size the cap above the largest expected
    * family × base df, or prefer [[minhashLshPairs]] (whose candidate volume
    * is banded, not df²) when family sizes are unknown. */
  def jaccardPairs(sh: DataFrame, idCol: String,
                   thresholdNum: Long, thresholdDen: Long,
                   maxShingleDf: Option[Long] = None): DataFrame = {
    val filtered = maxShingleDf match {
      case Some(cap) =>
        val df = sh.groupBy("shingle").agg(count(lit(1)).as("df")).filter(col("df") <= cap)
        sh.join(df.select("shingle"), "shingle")
      case None => sh
    }
    // set sizes from the SAME (capped) universe the intersection joins
    // over: counts from the raw set dilute every pair whose shingles the
    // cap removed — an exact duplicate dominated by stop-shingles scored
    // 10/190 instead of 10/10 and was silently missed (r11 review)
    val counts = filtered.groupBy(idCol).agg(count(lit(1)).as("n"))
    val a = filtered.select(col(idCol).as("id_a"), col("shingle"))
    val b = filtered.select(col(idCol).as("id_b"), col("shingle"))
    val inter = a.join(b, Seq("shingle")).filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("inter"))
    inter
      .join(counts.select(col(idCol).as("id_a"), col("n").as("na")), "id_a")
      .join(counts.select(col(idCol).as("id_b"), col("n").as("nb")), "id_b")
      // inter/union ≥ num/den  ⟺  den·inter ≥ num·union (exact integers)
      .filter(col("inter") * thresholdDen >= (col("na") + col("nb") - col("inter")) * thresholdNum)
      .select(col("id_a"), col("id_b"))
  }

  /** Benchmark-contamination detection: corpus documents whose n-gram
    * shingle sets CONTAIN a large fraction of some benchmark document's
    * shingles (containment = |corpus∩bench| / |bench| ≥ threshold — the
    * published decontamination recipe: a training doc that embeds a test
    * item scores high even when the rest of the doc dilutes Jaccard).
    *
    * Scale shape: the corpus is shingled ONCE and joined to the benchmark's
    * shingle set on the shingle value. The benchmark side (test/eval
    * suites: thousands of docs, not billions) is aggregated to a distinct
    * (bench_id, shingle) table small enough to BROADCAST — the 100 TB
    * corpus is never shuffled, each partition streams against the
    * broadcast hash map, and the only shuffle is the (doc, bench) overlap
    * count over the tiny surviving candidate set.
    *
    * Returns `(doc_id, bench_id, inter, bench_n)` for pairs at or above
    * `thresholdNum/thresholdDen` (exact rational, integer-only compare). */
  def contamination(corpus: DataFrame, corpusTextCol: String, corpusIdCol: String,
                    benchmark: DataFrame, benchTextCol: String, benchIdCol: String,
                    n: Int = 3,
                    thresholdNum: Long = 4, thresholdDen: Long = 5): DataFrame = {
    val corpusSh = shingles(corpus, corpusTextCol, corpusIdCol, n)
      .select(col(corpusIdCol).as("doc_id"), col("shingle"))
    val benchSh = shingles(benchmark, benchTextCol, benchIdCol, n)
      .select(col(benchIdCol).as("bench_id"), col("shingle"))
    val benchCounts = benchSh.groupBy("bench_id").agg(count(lit(1)).as("bench_n"))
    val inter = corpusSh
      .join(broadcast(benchSh), Seq("shingle"))
      .groupBy("doc_id", "bench_id").agg(count(lit(1)).as("inter"))
    inter.join(broadcast(benchCounts), "bench_id")
      .filter(col("inter") * thresholdDen >= col("bench_n") * thresholdNum)
      .select(col("doc_id"), col("bench_id"), col("inter"), col("bench_n"))
  }

  /** MinHash signature per document: `numHashes` independent min-hashes of
    * the shingle set. The shingle string is hashed ONCE to a long; the hash
    * family is then derived by re-hashing that 8-byte long with per-function
    * seeds — ~an order of magnitude cheaper per row than hashing the string
    * `numHashes` times. One shuffle on the id; the signature is a fixed
    * 64×8-byte vector regardless of document size — this is what makes
    * near-dedup feasible at 100 TB. */
  def minhashSignatures(sh: DataFrame, idCol: String, numHashes: Int = 64): DataFrame =
    sh.withColumn("h0", xxhash64(col("shingle")))
      .groupBy(idCol).agg(
        array((0 until numHashes).map(j => min(xxhash64(col("h0"), lit(j)))): _*).as("sig"))

  /** LSH banding: signature → (bandIdx, bandHash) rows; docs sharing any
    * band bucket are candidates. bands×rowsPerBand must equal the signature
    * length. */
  def lshBands(sigs: DataFrame, idCol: String, bands: Int, rowsPerBand: Int): DataFrame = {
    // rowsPerBand = 0 silently hashes an EMPTY slice: one constant bucket
    // for the whole corpus — either an all-pairs product or (capped) zero
    // recall. Fail fast instead (r11 review).
    require(bands >= 1 && rowsPerBand >= 1,
      s"lshBands needs bands >= 1 and rowsPerBand >= 1, got $bands×$rowsPerBand")
    sigs.select(col(idCol), posexplode(expr(
      s"""transform(sequence(0, ${bands - 1}),
         |  b -> xxhash64(concat_ws(',', transform(slice(sig, b * $rowsPerBand + 1, $rowsPerBand),
         |                                         x -> cast(x as string)))))""".stripMargin))
      .as(Seq("band_idx", "band_hash")))
  }

  /** MinHash-LSH near-dup pairs: band-bucket join → distinct candidates →
    * exact Jaccard verification on candidates only.
    *
    * With 16 bands × 4 rows, a pair at J=0.95 is caught with
    * P ≈ 1 − (1 − 0.95⁴)¹⁶ ≈ 1 − 3·10⁻¹²; at the 0.5 threshold the planted
    * near-dup regime (J ≥ 0.9 in practice) loses nothing. Candidate volume
    * is bounded per bucket, never all-pairs.
    *
    * `maxBucketSize` (default [[DefaultMaxBucketSize]]) drops band buckets
    * larger than the cap before the self-join — the degenerate-key guard.
    * RECALL contract: a duplicate FAMILY larger than the cap shares every
    * band bucket, so all its buckets are dropped together and the family's
    * pairs are LOST, not sampled. Size the cap above the largest real
    * family (audit with [[oversizedBuckets]] over [[lshBands]] output), or
    * pass None to disable when the corpus is trusted. */
  def minhashLshPairs(docs: DataFrame, textCol: String, idCol: String,
                      thresholdNum: Long = 1, thresholdDen: Long = 2,
                      numHashes: Int = 64, bands: Int = 16,
                      maxBucketSize: Option[Long] = Some(DefaultMaxBucketSize)): DataFrame = {
    require(bands >= 1 && numHashes % bands == 0 && numHashes / bands >= 1,
      s"bands ($bands) must divide numHashes ($numHashes) with >= 1 row per " +
      "band — a zero-row band hashes every document into one constant bucket")
    // deliberately NOT cached: shingles are cheap to recompute per consumer,
    // and pinning an O(corpus) table in executor memory for the lifetime of
    // the session starves later queries (and is infeasible at 100 TB).
    val sh = shingles(docs, textCol, idCol)
    val sigs = minhashSignatures(sh, idCol, numHashes)
    val bandRows = dropOversizedBuckets(
      lshBands(sigs, idCol, bands, numHashes / bands),
      Seq("band_idx", "band_hash"), maxBucketSize)
    val x = bandRows.select(col("band_idx"), col("band_hash"), col(idCol).as("id_a"))
    val y = bandRows.select(col("band_idx"), col("band_hash"), col(idCol).as("id_b"))
    val candidates = x.join(y, Seq("band_idx", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()

    // Exact verify on candidates only. The candidate set is small relative
    // to the corpus (near-dup pairs + band collisions) but still scales with
    // it, so no hard-coded broadcast — AQE converts these to broadcast joins
    // at runtime when the side is actually small.
    verifyJaccard(sh, idCol, candidates, thresholdNum, thresholdDen)
  }

  /** Exact Jaccard verification of explicit candidate pairs `(id_a, id_b)`
    * over a shingle relation that covers BOTH endpoints of every pair: set
    * sizes and intersections both come from `sh`, so the accepted pairs are
    * exactly what [[jaccardPairs]] would accept — one definition shared by
    * the batch LSH pipeline and [[DedupIndex]]'s incremental refresh (the
    * two must never drift, or incremental ≠ full-recompute). */
  private[ops] def verifyJaccard(sh: DataFrame, idCol: String,
                                 candidates: DataFrame, thresholdNum: Long,
                                 thresholdDen: Long): DataFrame = {
    val a = sh.select(col(idCol).as("id_a"), col("shingle"))
    val b = sh.select(col(idCol).as("id_b"), col("shingle"))
    val counts = sh.groupBy(idCol).agg(count(lit(1)).as("n"))
    a.join(candidates, "id_a")
      .join(b, Seq("id_b", "shingle"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("inter"))
      .join(counts.select(col(idCol).as("id_a"), col("n").as("na")), "id_a")
      .join(counts.select(col(idCol).as("id_b"), col("n").as("nb")), "id_b")
      .filter(col("inter") * thresholdDen >= (col("na") + col("nb") - col("inter")) * thresholdNum)
      .select("id_a", "id_b")
  }

  /** Exact integer-cosine acceptance over columns (dot, na, nb):
    * `dot > 0 ∧ dot²·den² ≥ na·nb·num²`, computed in decimal(38,0) — the
    * Long arithmetic this replaces overflowed at na·nb ≈ 10¹⁹, i.e. vector
    * norms around 10 under the ×1000 quantization, crashing under ANSI or
    * silently wrapping the filter otherwise (r11 review). The decimal
    * envelope covers |dot|,na,nb ≤ ~10¹⁷ with den ≤ 100 (components up to
    * ~10³ at dim 1536); past THAT edge ANSI raises rather than wraps.
    * One definition for all three pair variants — the overflow fix cannot
    * drift between them. */
  private def cosineAccept(thresholdNum: Long, thresholdDen: Long): Column = {
    def dec(c: Column) = c.cast("decimal(20,0)")
    def sq(v: Long) = lit(java.math.BigDecimal.valueOf(v).pow(2))
    col("dot") > 0 &&
      dec(col("dot")) * dec(col("dot")) * sq(thresholdDen) >=
        dec(col("na")) * dec(col("nb")) * sq(thresholdNum)
  }

  /** Embedding-cosine similar pairs, exact: quantize components to integers
    * (×1000 → BIGINT) so dot products and squared norms are exact and
    * order-independent, then compare cos²(a,b) ≥ (num/den)² as pure integer
    * arithmetic: `dot > 0 ∧ dot²·den² ≥ num²·|a|²·|b|²`.
    *
    * This is the all-pairs BASELINE (O(n²) — fine for a bounded slice, and
    * the recall=1 reference for the LSH variant below, which is the 100 TB
    * path). The convenient name attracts misuse at scale (r12 verdict), so
    * it REFUSES above `maxRows` input rows (default 65,536 ≈ 2.1×10⁹
    * candidate pairs — already minutes of dot products): pass
    * `maxRows = None` to run the oracle deliberately at any size, or use
    * [[embeddingSimilarPairsMultiLsh]], which scales. The guard runs one
    * limit-bounded count AT CALL TIME — a Spark job during plan
    * construction (upstream stages execute once for the probe and again
    * for the real query) — the deliberate price of refusing the quadratic
    * join before it is built; pass None where the input size is already
    * known to be bounded. */
  def embeddingSimilarPairs(vectors: DataFrame, idCol: String, vecCol: String,
                            thresholdNum: Long, thresholdDen: Long,
                            maxRows: Option[Long] = Some(65536L)): DataFrame = {
    import graft.functions.functions.dot_q
    maxRows.foreach { cap =>
      // the limit-bounded probe below can only observe up to
      // Int.MaxValue-1 rows, so a larger cap would silently never trip
      // (count <= probe limit <= cap) — refuse it instead (r13 advice);
      // a caller with a genuinely larger bound wants maxRows = None anyway
      require(cap < Int.MaxValue,
        s"embeddingSimilarPairs maxRows cap $cap exceeds the " +
        s"${Int.MaxValue - 1} ceiling the limit-probe can verify; pass " +
        "maxRows = None to skip the guard deliberately")
      // limit-bounded probe: LocalLimit short-circuits after cap+1 rows —
      // a full count() would execute the entire upstream lineage just to
      // refuse, the exact waste this guard exists to prevent
      val over = vectors.limit(cap.toInt + 1).count() > cap
      require(!over,
        s"embeddingSimilarPairs is the O(n²) recall oracle: input exceeds " +
        s"the $cap-row guard. Use embeddingSimilarPairsMultiLsh (bucketed, " +
        "scales) or pass maxRows = None to run the oracle deliberately")
    }
    val q = vectors.select(col(idCol), col(vecCol).as("e"))
      .withColumn("nrm", dot_q(col("e"), col("e")))
    val a = q.select(col(idCol).as("id_a"), col("e").as("ea"), col("nrm").as("na"))
    val b = q.select(col(idCol).as("id_b"), col("e").as("eb"), col("nrm").as("nb"))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("dot", dot_q(col("ea"), col("eb")))
      .filter(cosineAccept(thresholdNum, thresholdDen))
      .select("id_a", "id_b")
  }

  /** Embedding-cosine similar pairs, LSH-bucketed (the scale path): vectors
    * sharing a random-hyperplane sign bucket are candidates; exact integer
    * cosine verification runs within buckets only. Same contract as
    * [[embeddingSimilarPairs]] with recall < 1 for low-similarity pairs —
    * the standard LSH trade: collision probability per plane is
    * 1 − θ/π, so only high-cosine pairs are reliably caught. */
  def embeddingSimilarPairsLsh(vectors: DataFrame, idCol: String, vecCol: String,
                               thresholdNum: Long, thresholdDen: Long,
                               nPlanes: Int = 8, seed: Int = 42,
                               maxBucketSize: Option[Long] = Some(DefaultMaxBucketSize)): DataFrame = {
    import graft.functions.functions.dot_q
    // degenerate-key guard: e.g. all-zero vectors sign-hash identically in
    // every plane and would meet in one quadratic bucket
    val q = dropOversizedBuckets(
        Similarity.lshBuckets(vectors, idCol, vecCol, nPlanes, seed),
        Seq("bucket"), maxBucketSize)
      .select(col(idCol), col("bucket"), col(vecCol).as("e"))
      .withColumn("nrm", dot_q(col("e"), col("e")))
    val a = q.select(col("bucket"), col(idCol).as("id_a"), col("e").as("ea"), col("nrm").as("na"))
    val b = q.select(col("bucket"), col(idCol).as("id_b"), col("e").as("eb"), col("nrm").as("nb"))
    a.join(b, "bucket").filter(col("id_a") < col("id_b"))
      .withColumn("dot", dot_q(col("ea"), col("eb")))
      .filter(cosineAccept(thresholdNum, thresholdDen))
      .select("id_a", "id_b").distinct()
  }

  /** Multi-table LSH similar pairs: candidates collide in ANY of `nTables`
    * independent bucketings ([[Similarity.lshBucketsMulti]]), are deduped
    * BEFORE verification (each pair's exact integer-cosine check runs once,
    * however many tables it collided in), then exact-verified — precision
    * is therefore 1 by construction and recall is 1 − (1 − p^b)^L vs the
    * single-table p^b of [[embeddingSimilarPairsLsh]].
    *
    * Scale shape: per-(table, bucket) self-joins — never all-pairs — then
    * two key-joins to re-attach vectors to the deduped candidate set. The
    * candidate count scales with L·Σ_bucket n_b², tunable via b (bucket
    * granularity) against L (recall). */
  def embeddingSimilarPairsMultiLsh(vectors: DataFrame, idCol: String, vecCol: String,
                                    thresholdNum: Long, thresholdDen: Long,
                                    nTables: Int = 8, nPlanes: Int = 8,
                                    seed: Int = 42,
                                    maxBucketSize: Option[Long] = Some(DefaultMaxBucketSize)): DataFrame = {
    import graft.functions.functions.dot_q
    // per-(table, bucket) degenerate-key guard; a vector family collapsing
    // to one bucket does so in EVERY table, so the cap is the only bound
    val bucketed = dropOversizedBuckets(
      Similarity.lshBucketsMulti(vectors, idCol, vecCol, nTables, nPlanes, seed),
      Seq("tbl", "bucket"), maxBucketSize)
    val ca = bucketed.select(col("tbl"), col("bucket"), col(idCol).as("id_a"))
    val cb = bucketed.select(col("tbl"), col("bucket"), col(idCol).as("id_b"))
    val cand = ca.join(cb, Seq("tbl", "bucket")).filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()

    val v = vectors.select(col(idCol), col(vecCol).as("e"))
      .withColumn("nrm", dot_q(col("e"), col("e")))
    cand
      .join(v.select(col(idCol).as("id_a"), col("e").as("ea"), col("nrm").as("na")), "id_a")
      .join(v.select(col(idCol).as("id_b"), col("e").as("eb"), col("nrm").as("nb")), "id_b")
      .withColumn("dot", dot_q(col("ea"), col("eb")))
      .filter(cosineAccept(thresholdNum, thresholdDen))
      .select("id_a", "id_b")
  }

  /** 64-bit SimHash per document from its distinct 3-gram-shingle set: bit i
    * is the sign of Σ_shingles (±1 by bit i of the shingle's feature hash).
    * Shingle features (not unigrams) keep the hash discriminative when
    * documents share a small vocabulary. Computed by the single-buffer
    * [[graft.functions.SimHashAgg]] typed aggregate (one 64-counter buffer
    * per group instead of 64 separate conditional-sum buffers) — one
    * shuffle on the id with a 256-byte partial-agg payload.
    *
    * The feature hash is the first 15 hex digits of md5 (60 uniform bits;
    * bits 60-63 of the simhash are then always 0) rather than xxhash64:
    * md5 is bit-identical in every engine, which makes the whole operator
    * restatable as the q26 DuckDB oracle — same trade the LSH plane-hash
    * made for q50. */
  def simhash(df: DataFrame, textCol: String, idCol: String): DataFrame =
    shingles(df, textCol, idCol)
      .groupBy(idCol)
      .agg(graft.functions.SimHashAgg.simhash_agg(
        conv(substring(md5(col("shingle")), 1, 15), 16, 10).cast("long")).as("simhash"))

  /** SimHash near-dup pairs: band the 64-bit hash into 4×16-bit keys, join
    * on band equality (bucketed candidate generation), then filter by exact
    * Hamming distance (`bit_count(xor)`).
    *
    * RECALL contract: by pigeonhole, 4 bands GUARANTEE a band match only
    * for Hamming distance ≤ 3 — the default. A larger `maxHamming` still
    * returns only band-matched candidates (pairs whose ≤`maxHamming`
    * differing bits spread across all four bands are MISSED); callers
    * raising it accept candidate-generation recall, not exact recall.
    * `maxBucketSize` is the degenerate-key guard (boilerplate corpora
    * collapse to ONE simhash → one quadratic bucket per band); a family
    * larger than the cap loses all its pairs — see [[minhashLshPairs]]. */
  def simhashPairs(df: DataFrame, textCol: String, idCol: String,
                   maxHamming: Int = 3,
                   maxBucketSize: Option[Long] = Some(DefaultMaxBucketSize)): DataFrame = {
    val hashed = simhash(df, textCol, idCol) // uncached: see minhashLshPairs

    val bands = dropOversizedBuckets(
      hashed.select(col(idCol), col("simhash"),
        posexplode(expr(
          "transform(sequence(0, 3), b -> shiftright(simhash, b * 16) & 65535)"))
          .as(Seq("band_idx", "band_key"))),
      Seq("band_idx", "band_key"), maxBucketSize)
    val x = bands.select(col("band_idx"), col("band_key"),
      col(idCol).as("id_a"), col("simhash").as("h_a"))
    val y = bands.select(col("band_idx"), col("band_key"),
      col(idCol).as("id_b"), col("simhash").as("h_b"))
    x.join(y, Seq("band_idx", "band_key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("h_a").bitwiseXOR(col("h_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
