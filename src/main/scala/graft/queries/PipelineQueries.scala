package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.ops._

/** LLM-data-pipeline queries over the `documents`, `embeddings`, and
  * `events` tables: deduplication (exact / fingerprint / Jaccard /
  * MinHash-LSH / SimHash), similarity search (brute-force + IVF),
  * text analysis, windowed event aggregation, multimodal plumbing.
  *
  * Oracle-checked wherever DuckDB can express the same semantics; the
  * hash-based operators (MinHash bands, SimHash, LSH buckets) get rows-only
  * checks plus ScalaTest coverage, except MinHash-LSH whose *verified*
  * output equals the brute-force Jaccard oracle (the planted near-dup
  * regime sits at J≥0.9, where 16×4 banding has recall ≈ 1 − 3·10⁻¹²).
  */
object PipelineQueries {

  // raw reads; the unsplittable-scan widening (Inputs.parallel) is OPT-IN
  // per query — measured a win only where per-row CPU dominates (MinHash /
  // SimHash / language-ID / exact cosine verify), a small loss elsewhere
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Inputs.raw(s, dir, name)

  /** ONE shared standing-dedup-index lifecycle drives the q81 AND q82
    * gates (r15 verdict #4: the dedup lifecycle gates cost 53% of the
    * driver's bench wall, almost all fixed per-commit floors across ~15
    * refreshes — this halves the builds and refreshes at unchanged oracle
    * coverage). Batching is by doc_id % 10 so every capture point is
    * restatable as static oracle SQL; near-dup family members have
    * effectively random ids (22 of 23 sf0.01 families span >1 mod-10
    * residue), so modulo batching keeps the cross-batch bridge and
    * partial-family delete shapes the percentile cuts had:
    *   1. build over %10 ∈ {0..3};
    *   2. append {4..7}, refresh
    *      ⇒ **S81**: insert-only incremental ≡ recompute over %10 < 8
    *      (multi-increment accumulation is DedupIndexSpec's 3-batch case;
    *      the gate needs one standing-vs-batch fold, and each refresh is
    *      ~10 s of fixed commit floors the driver pays every round);
    *   3. delete %10 = 3, refresh (a delete-ONLY window);
    *   4. append {8,9}, refresh (inserts probing post-delete state);
    *   5. delete %10 = 7, refresh (prunes families formed across
    *      every batch) ⇒ **S82**: ≡ recompute over %10 ∉ {3,7};
    *   6. UPDATE %10 = 5 texts, refresh ⇒ **S84**: the update-pre/post-
    *      image fold ≡ recompute over the post-update corpus (r17).
    * All captures pin their rows (eager localCheckpoint) the moment they
    * exist; the memo keys by testdata dir, so within one JVM (Verify, or
    * a Bench sweep pair) the lifecycle runs ONCE — q81's wall carries the
    * lifecycle, q82's only its capture read (recorded in BASELINE). The
    * cached frames are bound to the session that built them (checkpoint
    * blocks die with its SparkContext), so a hit from a DIFFERENT or
    * stopped session recomputes instead of serving dead blocks (r16
    * review — long-lived JVMs with session churn). */
  private val dedupLifecycleMemo = new java.util.concurrent.ConcurrentHashMap[
    String, (SparkSession, (DataFrame, DataFrame, DataFrame))]

  private def sessionLive(s: SparkSession): Boolean =
    try !s.sparkContext.isStopped catch { case _: Throwable => false }

  private def dedupLifecycle(s: SparkSession, dir: String)
      : (DataFrame, DataFrame, DataFrame) =
    dedupLifecycleMemo.compute(dir, (_, old) =>
      if (old != null && (old._1 eq s) && sessionLive(s)) old
      else (s, runDedupLifecycle(s, dir)))._2

  private def runDedupLifecycle(s: SparkSession, dir: String)
      : (DataFrame, DataFrame, DataFrame) = {
      // raw read (no widening): these frames SEED the source table — a
      // widened frame stages parallelism-many tiny files per batch commit,
      // inflating every later merge/maintain pass (r17: lifecycle 70→108 s);
      // the index widens its own CPU-heavy window folds internally
      val docs = Inputs.raw(s, dir, "documents").select("doc_id", "text")
      val root = graft.queries.DeltaQueries.freshWorkDir("deduplife")
      val src = s"$root/source"
      def part(rs: Int*) =
        docs.filter(pmod(col("doc_id"), lit(10)).isin(rs.map(Int.box): _*))
      def survivors() = DedupIndex.survivors(s, s"$root/idx")
        .select(col("comp"), col("id").as("doc_id"),
          col("len").as("text_len"))
      graft.delta.GraftWriter.write(part(0, 1, 2, 3), src,
        configuration = Some(Map("delta.enableChangeDataFeed" -> "true")))
      DedupIndex.buildFromSource(s, src, "text", "doc_id", s"$root/idx")
      graft.delta.GraftWriter.write(part(4, 5, 6, 7), src,
        org.apache.spark.sql.SaveMode.Append)
      DedupIndex.refreshFromSource(s, s"$root/idx")
      val s81 = survivors().localCheckpoint(true)
      graft.delta.Dml.delete(s, src, pmod(col("doc_id"), lit(10)) === 3)
      DedupIndex.refreshFromSource(s, s"$root/idx")
      graft.delta.GraftWriter.write(part(8, 9), src,
        org.apache.spark.sql.SaveMode.Append)
      DedupIndex.refreshFromSource(s, s"$root/idx")
      graft.delta.Dml.delete(s, src, pmod(col("doc_id"), lit(10)) === 7)
      DedupIndex.refreshFromSource(s, s"$root/idx")
      val s82 = survivors().localCheckpoint(true)
      //   6. UPDATE %10 = 5 texts in place (vowels → digits: length-
      //      preserving but rewrites nearly every shingle, so updated docs
      //      genuinely RE-HOME — they leave mixed families while same-wave
      //      near-dup pairs stay together post-rewrite), refresh (an
      //      update-pre/postimage CDF window) ⇒ **S84**: the index folds
      //      the engine's own Dml.update output ≡ recompute over the
      //      post-update corpus (r16 verdict #1).
      graft.delta.Dml.update(s, src, pmod(col("doc_id"), lit(10)) === 5,
        Map("text" -> translate(col("text"), "aeiou", "01234")))
      DedupIndex.refreshFromSource(s, s"$root/idx")
      (s81, s82, survivors().localCheckpoint(true))
  }

  private val strLifecycleMemo = new java.util.concurrent.ConcurrentHashMap[
    String, (SparkSession, DataFrame)]

  /** The q83 string-keyed lifecycle: build, CDF increment, delete fold,
    * and (r17) an update-wave fold on URL-shaped doc ids over the
    * doc_id % 3 = 1 third of the corpus.
    * Memoized per dir like [[dedupLifecycle]] (fixed commit floors; the
    * driver's bench sweeps twice). */
  private def q83Lifecycle(s: SparkSession, dir: String): DataFrame = {
    // raw read: seeds the source table (see runDedupLifecycle's note)
    val numDocs = Inputs.raw(s, dir, "documents")
      .filter(pmod(col("doc_id"), lit(3)) === 1)
    val docs = numDocs
      .select(format_string("doc://%012d", col("doc_id")).as("doc_id"),
        col("text"))
    val cut = numDocs.selectExpr("percentile_approx(doc_id, 0.7)")
      .first().getLong(0)
    val cutS = f"doc://$cut%012d"
    val root = graft.queries.DeltaQueries.freshWorkDir("dedupstr")
    val src = s"$root/source"
    graft.delta.GraftWriter.write(docs.filter(col("doc_id") < cutS), src,
      configuration = Some(Map("delta.enableChangeDataFeed" -> "true")))
    DedupIndex.buildFromSource(s, src, "text", "doc_id", s"$root/idx")
    graft.delta.GraftWriter.write(docs.filter(col("doc_id") >= cutS), src,
      org.apache.spark.sql.SaveMode.Append)
    DedupIndex.refreshFromSource(s, s"$root/idx")
    // takedown wave: zero-padded decimal ⇒ last char '3' ≡ doc_id%10=3
    graft.delta.Dml.delete(s, src, substring(col("doc_id"), -1, 1) === "3")
    DedupIndex.refreshFromSource(s, s"$root/idx")
    // update wave on STRING keys (r17): %10=7 texts rewritten in place —
    // the update_pre/postimage fold with string band-delete keys, string
    // null literals, and InStringSet pruning end-to-end
    graft.delta.Dml.update(s, src, substring(col("doc_id"), -1, 1) === "7",
      Map("text" -> translate(col("text"), "aeiou", "01234")))
    DedupIndex.refreshFromSource(s, s"$root/idx")
    DedupIndex.survivors(s, s"$root/idx")
      .select(col("comp"), col("id").as("doc_id"),
        col("len").as("text_len"))
      .localCheckpoint(true)
  }

  /** The events table's `ts` physical type has varied across driver-generated
    * testdata vintages: parquet ns (which Spark 4 refuses by default — read as
    * a raw nanos LONG and floor to µs, matching DuckDB's ns→µs conversion)
    * vs parquet µs (read natively as TIMESTAMP_NTZ).
    * Normalize both to a µs-precision timestamp column `ts_us`.
    *
    * The legacy nanosAsLong flag flips ONLY when the plain read refuses
    * (the ns vintage) — unconditionally setting it would silently change
    * parquet read semantics for every later query in the session (r12
    * review). It must then STAY set for the session: the scan consults it
    * at execution, after this function returns. */
  private[queries] def events(s: SparkSession, dir: String): DataFrame = {
    def read() = Inputs.raw(s, dir, "events")
    val raw =
      try read()
      catch {
        case _: Exception => // ns-typed ts: Spark 4 refuses at inference
          s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
          read()
      }
    val tsUs = raw.schema("ts").dataType match {
      // convert_timezone pins the nanos vintage to a UTC-wall-clock NTZ —
      // a bare timestamp_micros is a TZ-AWARE instant whose later
      // date_trunc buckets in SESSION-local time, diverging from both the
      // µs vintage and the oracle's naive timestamps in any non-UTC session.
      // ns→µs is FLOOR division ((ts − pmod) div 1000, exact on longs):
      // `ts div 1000` truncates toward zero, which lands pre-epoch
      // off-boundary nanos 1µs high of the instant's floor (r12 review).
      case org.apache.spark.sql.types.LongType =>
        convert_timezone(lit("UTC"),
          timestamp_micros(expr("(ts - pmod(ts, 1000)) div 1000")))
      case _ => col("ts").cast("timestamp_ntz")
    }
    raw.withColumn("ts_us", tsUs)
  }

  // the oracle-exactness micro-unit machinery is Relational's — ONE copy,
  // so a precision/overflow fix there cannot silently miss this gate
  private def lsum(c: org.apache.spark.sql.Column) = Relational.lsum(c)
  private val DSUM = Relational.DSUM

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // exact dedup: representative row per duplicate key group; single
    // hash-shuffle with map-side combine.
    "q22_dedup_exact" -> { (s, dir) =>
      Dedup.exact(events(s, dir), Seq("user_id", "event_type", "value"), "event_id")
        .select("event_id").orderBy("event_id")
    },

    // fingerprint dedup: md5 of a normalized prefix as the shuffle key.
    "q23_dedup_fingerprint" -> { (s, dir) =>
      Dedup.byFingerprint(t(s, dir, "documents"), "text", "doc_id")
        .select("doc_id", "n_dupes").orderBy("doc_id")
    },

    // exact 3-gram-shingle Jaccard pairs (≥ 0.5) on a bounded slice —
    // candidate pairs come from the shingle-equality join, never all-pairs.
    "q24_dedup_jaccard" -> { (s, dir) =>
      val docs = t(s, dir, "documents").filter(col("doc_id") < 300)
      Dedup.jaccardPairs(Dedup.shingles(docs, "text", "doc_id"), "doc_id", 1, 2)
        .orderBy("id_a", "id_b")
    },

    // benchmark contamination: corpus docs containing ≥ 60% of a benchmark
    // doc's 3-gram shingles (benchmark = every 20th document, as an eval
    // suite stand-in). The benchmark shingle table broadcasts; the corpus
    // is never shuffled before the tiny candidate aggregation.
    "q59_contamination" -> { (s, dir) =>
      val corpus = t(s, dir, "documents").filter(col("doc_id") < 600)
      val bench = t(s, dir, "documents")
        .filter(col("doc_id") % 20 === 0 && col("doc_id") < 600)
        .select(col("doc_id").as("bench_id"), col("text"))
      Dedup.contamination(corpus, "text", "doc_id", bench, "text", "bench_id",
          n = 3, thresholdNum = 3, thresholdDen = 5)
        .orderBy("doc_id", "bench_id")
    },

    // duplicate-family clustering: Jaccard pairs → connected components
    // (min-label propagation, one shuffle-join per hop). Oracle = DuckDB
    // recursive transitive closure over the identical pair set.
    "q53_dedup_cluster" -> { (s, dir) =>
      val docs = t(s, dir, "documents").filter(col("doc_id") < 300)
      val pairs = Dedup.jaccardPairs(Dedup.shingles(docs, "text", "doc_id"), "doc_id", 1, 2)
      Clustering.connectedComponents(pairs).orderBy("id")
    },

    // deterministic stratified sample: 20 docs per language ranked by
    // md5(doc_id) — reproducible curation, identical in any engine.
    "q54_stratified" -> { (s, dir) =>
      Sampling.stratified(t(s, dir, "documents"), Seq("lang"), "doc_id", 20)
        .select("doc_id", "lang").orderBy("doc_id")
    },

    // sequence packing: whitespace token counts → best-fit-decreasing bins
    // of 2048 tokens (per-partition pack, globally unique bin ids). Bin
    // COMPOSITION is partitioning-defined, so the gate checks the
    // SQL-expressible invariants instead: every doc packed exactly once,
    // token conservation, and zero multi-doc bins over budget (the oracle's
    // literal 0 — any budget violation breaks the hash match). Bin-level
    // detail (fill > 0.9, determinism) stays under PackingSpec.
    "q56_packing" -> { (s, dir) =>
      // ONE budget constant for the packer, the over-budget invariant, and
      // nothing else — three independent literals let a budget change
      // silently void the invariant this query exists to pin (r12 review)
      val budget = 2048L
      val docs = t(s, dir, "documents")
        .withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
      // materialized once: the invariant totals and the over-budget audit
      // both read it, and an unmaterialized frame re-runs the whole
      // shuffle+sort+pack per reference (r18 plan audit: 2 executions)
      val packed = Packing.packSequences(docs, "doc_id", "n_tokens",
        budget = budget, numPartitions = 8)
        .localCheckpoint(true)
      val totals = packed.agg(
        count(lit(1)).as("docs_packed"),
        countDistinct("doc_id").as("docs_distinct"),
        sum("n_tokens").as("tokens_packed"))
      val overBudget = packed
        .groupBy("bin_id")
        .agg(sum("n_tokens").as("bin_tokens"), count(lit(1)).as("n_docs"))
        .agg(coalesce(sum(when(col("bin_tokens") > budget && col("n_docs") > 1, 1L)),
          lit(0L)).as("over_budget_bins"))
      totals.crossJoin(overBudget)
    },

    // incremental sequence packing (r16 verdict #7): a %10=3 takedown wave
    // folds through repackDeletes — only the deleted docs' hash partitions
    // repack (PackingSpec proves ≡ full repack row-for-row; the bin CDF is
    // spec territory). The gate pins the q56 invariant shape THROUGH the
    // incremental path over the post-takedown corpus: every surviving doc
    // packed exactly once, token conservation, zero over-budget bins.
    "q86_incremental_packing" -> { (s, dir) =>
      val budget = 2048L
      val docs = t(s, dir, "documents")
        .withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
        .select("doc_id", "n_tokens")
      // materialized once (r18 plan audit): repackDeletes reads the packed
      // state three times (affected-pid probe, kept partitions, repack
      // input) — in deployment that state is a TABLE; an unmaterialized
      // frame re-ran the whole pack per reference (3 executions)
      val packed = Packing.packSequences(docs, "doc_id", "n_tokens",
        budget = budget, numPartitions = 8)
        .localCheckpoint(true)
      val wave = docs.filter(pmod(col("doc_id"), lit(10)) === 3)
        .select("doc_id")
      val (repacked, _) = Packing.repackDeletes(packed, wave, budget)
      val totals = repacked.agg(
        count(lit(1)).as("docs_packed"),
        countDistinct("doc_id").as("docs_distinct"),
        sum("n_tokens").as("tokens_packed"))
      val overBudget = repacked
        .groupBy("bin_id")
        .agg(sum("n_tokens").as("bin_tokens"), count(lit(1)).as("n_docs"))
        .agg(coalesce(sum(when(col("bin_tokens") > budget && col("n_docs") > 1, 1L)),
          lit(0L)).as("over_budget_bins"))
      totals.crossJoin(overBudget)
    },

    // AS-OF join (r17): attribute each click to the latest at-or-before
    // purchase state of the same user — the time-alignment shape every
    // feature pipeline needs and Spark can only express as a
    // nested-loop-joined inequality. graft's operator is the union trick:
    // ONE hash shuffle + in-partition sort, NO join node
    // (AsOfJoinSpec pins the plan). The oracle is DuckDB's NATIVE
    // `ASOF LEFT JOIN` — an independent engine's implementation of the
    // same semantics, row-for-row. The purchase side pre-aggregates to
    // one row per (user, ts): the determinism contract both engines need.
    "q87_asof_join" -> { (s, dir) =>
      val ev = t(s, dir, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts").cast("timestamp")).as("c_us"))
      // doubles ride as micro-unit BIGINTs and timestamps as epoch micros
      // (the repo-wide oracle exactness rules — Relational scaladoc)
      val purchases = ev.filter(col("event_type") === "purchase")
        .groupBy(col("user_id").as("p_user"),
          unix_micros(col("ts").cast("timestamp")).as("pts"))
        .agg(max((col("value").cast("decimal(18,6)") * 1000000)
          .cast("long")).as("p_value_u"),
          max(col("event_id")).as("p_event"))
        .withColumnRenamed("p_user", "user_id")
      AsOfJoin.asOf(clicks, purchases, Seq("user_id"), "c_us", "pts",
          Seq("p_value_u", "p_event"))
        .orderBy(col("event_id")) // total: event_id is unique
    },

    // POINT-IN-INTERVAL range join (r17): every click inside a purchase's
    // 24 h attribution window, same user — the bucketized range join
    // (intervals explode to fixed-width buckets, points equi-join on
    // (user, bucket), exact containment filters). The oracle is DuckDB's
    // plain inequality join over the same epoch-microsecond arithmetic.
    "q88_range_join" -> { (s, dir) =>
      val ev = t(s, dir, "events")
      val dayUs = 86400000000L
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("c_event"), col("user_id"),
          unix_micros(col("ts").cast("timestamp")).as("c_us"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_event"), col("user_id"),
          unix_micros(col("ts").cast("timestamp")).as("s_us"))
        .withColumn("e_us", col("s_us") + lit(dayUs))
      AsOfJoin.rangePointJoin(clicks, purchases, "c_us", "s_us", "e_us",
          bucketWidth = dayUs, keyCols = Seq("user_id"))
        .select(col("p_event"), col("c_event"), col("user_id"),
          (col("c_us") - col("s_us")).as("lag_us"))
        // the (p_event, c_event) pair is unique (a point lands in exactly
        // one bucket, so a pair joins at most once) — the trailing keys
        // never fire and row order is byte-identical; they make totality
        // PROVABLE to the order-audit (inherited r17 mid-build failure:
        // OrderTotalitySpec cannot see uniqueness through the renames)
        .orderBy(col("p_event"), col("c_event"), col("user_id"), col("lag_us"))
    },

    // THE composed LLM-data pipeline as ONE lineage (r12 verdict #1):
    // shingle → MinHash-LSH candidates → exact Jaccard verify → connected
    // components → one survivor per duplicate family (longest text, then
    // lowest id) → sequence packing. The gate pins the SURVIVOR SET row by
    // row (DuckDB replays brute-force Jaccard + recursive closure + the
    // same window preference) and the packing invariants as replicated
    // constants: exactly-once count, token conservation, and the literal-0
    // over-budget bin count. Bin COMPOSITION is partitioning-defined and
    // stays under PackingSpec, as in q56.
    "q77_dedup_pipeline" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
      val pairs = Dedup.minhashLshPairs(docs, "text", "doc_id", 1, 2,
        maxBucketSize = None)
      val surv = Clustering.survivors(docs, "doc_id", pairs,
        Seq(length(col("text")).desc, col("doc_id")))
      val withTok = surv
        .withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
        .select("doc_id", "n_tokens")
        .localCheckpoint(true) // survivors feed BOTH packing and the output
      val budget = 2048L
      // materialized once — totals and the over-budget audit both read it
      // (same rationale as q56, r18 plan audit)
      val packed = Packing.packSequences(withTok, "doc_id", "n_tokens",
        budget = budget, numPartitions = 8)
        .localCheckpoint(true)
      val totals = packed.agg(
        count(lit(1)).as("docs_packed"),
        sum("n_tokens").as("tokens_packed"))
      val overBudget = packed
        .groupBy("bin_id")
        .agg(sum("n_tokens").as("bin_tokens"), count(lit(1)).as("n_docs"))
        .agg(coalesce(sum(when(col("bin_tokens") > budget && col("n_docs") > 1, 1L)),
          lit(0L)).as("over_budget_bins"))
      withTok.crossJoin(totals).crossJoin(overBudget).orderBy("doc_id")
    },

    // MinHash-LSH near-dedup over the FULL document set: banded signatures →
    // bucket join → exact verification. Output provably equals brute force
    // at this data's similarity gap.
    "q25_minhash_lsh" -> { (s, dir) =>
      // maxBucketSize=None: the DuckDB oracle is UNCAPPED brute force, so
      // the gate must compare identical semantics at every sf; the default
      // cap is the production guard, spec-proven in DedupSpec's
      // adversarial-skew cases
      Dedup.minhashLshPairs(
        Inputs.parallel(t(s, dir, "documents"), "doc_id"), // CPU-heavy: signing
        "text", "doc_id", 1, 2,
          maxBucketSize = None)
        .orderBy("id_a", "id_b")
    },

    // SimHash near-dup candidates: 4×16-bit band bucketing + Hamming filter.
    // Oracle-checked since round 6: the md5-prefix feature hash is
    // restatable in DuckDB, so the oracle recomputes the full simhash →
    // band → Hamming pipeline exactly (the q50 restate-the-kernel pattern).
    "q26_simhash" -> { (s, dir) =>
      Dedup.simhashPairs(Inputs.parallel(t(s, dir, "documents"), "doc_id"),
        "text", "doc_id", maxHamming = 16,
          maxBucketSize = None) // uncapped: oracle identity, see q25
        .withColumn("hamming", col("hamming").cast("long"))
        .orderBy("id_a", "id_b")
    },

    // token counting (n_tokens / n_distinct / total_chars / max_token_len).
    "q27_text_stats" -> { (s, dir) =>
      TextAnalysis.tokenStats(t(s, dir, "documents"), "text", "doc_id")
        .orderBy("doc_id")
    },

    // quality scoring in exact micro-units.
    "q28_quality" -> { (s, dir) =>
      TextAnalysis.qualityScore(t(s, dir, "documents"), "text", "doc_id")
        .orderBy("doc_id")
    },

    // brute-force ANN baseline: quantized-dot-product top-10 to vec_id 0.
    "q29_ann_cosine" -> { (s, dir) =>
      Similarity.bruteForceTopK(t(s, dir, "embeddings"), "vec_id", "embedding",
        queryId = 0, k = 10)
    },

    // PII redaction over synthesized pii-bearing text (both engines build
    // the identical string, so redaction compares byte-for-byte).
    "q62_pii_redact" -> { (s, dir) =>
      val synth = t(s, dir, "documents").select(
        col("doc_id"),
        concat(
          lit("reach user"), col("doc_id").cast("string"),
          lit("@example.com or 415-555-"),
          lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"),
          lit(" from 10.0."), pmod(col("doc_id"), lit(256)).cast("string"),
          lit(".7 today")).as("text"))
      TextAnalysis.redactPii(synth, "text", "doc_id").orderBy("doc_id")
    },

    // int8 scalar quantization + quantized brute-force top-10: 4× smaller
    // scan, exact-integer ranking; oracle replicates the max-abs scheme.
    "q60_quantized_ann" -> { (s, dir) =>
      Quantize.quantizedTopK(t(s, dir, "embeddings"), "vec_id", "embedding",
        queryId = 0, k = 10)
    },

    // IVF ANN, full-probe gate: probe ALL label-clusters (nProbe = |labels|),
    // which provably equals brute force — so the whole IVF machinery
    // (centroid build, probe ranking, cluster-restricted exact search) is
    // held to q29's brute-force DuckDB oracle. The sub-linear claim
    // (partial probes search only the probed clusters) stays property-
    // tested in SimilaritySpec, because this testdata's labels are not
    // cosine clusters — no partial probe of them can equal brute force.
    "q30_ann_ivf" -> { (s, dir) =>
      Similarity.ivfTopK(t(s, dir, "embeddings"), "vec_id", "embedding", "label",
        queryId = 0, k = 10, nProbe = Int.MaxValue)
    },

    // IVF index as COMMITTED graft tables (r13): build on ~90% of the
    // vectors, append the rest through the incremental nearest-centroid
    // refresh, then serve an EXHAUSTIVE probe (nProbe = all clusters) —
    // which must equal DuckDB's brute-force ranking over every vector, so
    // the gate pins the whole index lifecycle (kmeans build commits,
    // refresh commit, partition-pruned probe scan, exact quantized
    // ranking). Partial-probe recall is IvfIndexSpec/IvfProbeMain territory.
    "q79_ivf_index" -> { (s, dir) =>
      import s.implicits._
      // raw read: vecs feeds GraftWriter/IvfIndex builds — widening would
      // stage parallelism-many tiny files per commit (see runDedupLifecycle)
      val vecs = Inputs.raw(s, dir, "embeddings")
      val root = graft.queries.DeltaQueries.freshWorkDir("ivfindex")
      val cut = vecs.selectExpr("percentile_approx(vec_id, 0.9)").first().getLong(0)
      IvfIndex.build(s, vecs.filter(col("vec_id") < cut), "vec_id", "embedding",
        root, nClusters = 8)
      IvfIndex.refresh(s, vecs.filter(col("vec_id") >= cut), "vec_id", "embedding", root)
      val qv = vecs.filter(col("vec_id") === 0)
        .select("embedding").as[Array[Float]].head()
      IvfIndex.topK(s, root, qv, k = 10, nProbe = 8)
        .select(col("id").as("vec_id"), col("dot_q"))
        // re-assert the total order ON THE OUTPUT NAMES: topK already
        // ordered by (dot_q, id), but the rename hides the unique key
        // from the row-order-totality audit (10 rows — free)
        .orderBy(col("dot_q").desc, col("vec_id"))
    },

    // int8-QUANTIZED IVF index (r16, verdict #3): build with quantize=true
    // (codes + scale ride every posting row), append ~10% through the
    // incremental refresh (the append-time code derivation), then serve an
    // EXHAUSTIVE quantized probe — rank by the exact integer dot with the
    // scales divided back out, scanning ONLY the code columns. Must equal
    // DuckDB's replica of the max-abs int8 arithmetic over every vector
    // (the q60 contract routed through the committed index lifecycle).
    "q85_ivf_quantized" -> { (s, dir) =>
      import s.implicits._
      val vecs = Inputs.raw(s, dir, "embeddings") // raw: seeds builds (q79 note)
      val root = graft.queries.DeltaQueries.freshWorkDir("ivfquant")
      val cut = vecs.selectExpr("percentile_approx(vec_id, 0.9)").first().getLong(0)
      IvfIndex.build(s, vecs.filter(col("vec_id") < cut), "vec_id", "embedding",
        root, nClusters = 8, quantize = true)
      IvfIndex.refresh(s, vecs.filter(col("vec_id") >= cut), "vec_id", "embedding", root)
      val qv = vecs.filter(col("vec_id") === 0)
        .select("embedding").as[Array[Float]].head()
      IvfIndex.topKQuantized(s, root, qv, k = 10, nProbe = 8)
        .select(col("id").as("vec_id"), col("dot_q8"))
        .orderBy((col("dot_q8")).desc, col("vec_id"))
    },

    // CDF-maintained IVF index (r14, verdict #1): the index binds to a
    // SOURCE graft table with change-data-feed enabled; a DELETE and an
    // APPEND land in the source AFTER the build, and refreshFromSource
    // folds ONLY the change window (O(new commits) — never re-reading the
    // base corpus or the posting ids). The exhaustive probe must then
    // equal DuckDB's brute force over the POST-delete+append corpus — a
    // deleted vector served from a stale posting row, a missed append, or
    // a tombstone mis-fold all break the hash.
    "q80_ivf_cdf" -> { (s, dir) =>
      import s.implicits._
      val vecs = Inputs.raw(s, dir, "embeddings") // raw: seeds builds (q79 note)
      val root = graft.queries.DeltaQueries.freshWorkDir("ivfcdf")
      val src = s"$root/source"
      graft.delta.GraftWriter.write(
        vecs.select(col("vec_id"), col("embedding")), src,
        configuration = Some(Map("delta.enableChangeDataFeed" -> "true")))
      IvfIndex.buildFromTable(s, src, "vec_id", "embedding", s"$root/idx",
        nClusters = 8)
      graft.delta.Dml.delete(s, src, col("vec_id") % 7 === lit(3L))
      // twin ids shift ABOVE the whole id space: make_sf1.py offsets
      // replicas by 1e6 per copy, so a +1e6 shift collided with replica
      // 1's real ids at sf1+ and the "missed append" signal degraded to a
      // duplicate-count difference (r14 third review pass)
      graft.delta.GraftWriter.write(
        vecs.filter(col("vec_id") < 10)
          .select((col("vec_id") + 1000000000L).as("vec_id"), col("embedding")),
        src, org.apache.spark.sql.SaveMode.Append)
      IvfIndex.refreshFromSource(s, s"$root/idx")
      val qv = vecs.filter(col("vec_id") === 0)
        .select("embedding").as[Array[Float]].head()
      IvfIndex.topK(s, s"$root/idx", qv, k = 10, nProbe = 8)
        .select(col("id").as("vec_id"), col("dot_q"))
        .orderBy(col("dot_q").desc, col("vec_id"))
    },

    // Standing dedup index, insert-only equivalence (r14, verdict #2): the
    // S81 capture of the SHARED lifecycle below — the corpus prefix
    // (doc_id % 10 < 8) arrives as a base build plus two CDF-folded append
    // batches, each refresh shingling only its batch against the standing
    // bucket table. The capture point precedes every delete, so the
    // survivor set must hash-match DuckDB's FULL brute-force Jaccard +
    // recursive-closure recompute over that prefix — any drift in the
    // incremental candidate accumulation, the subgraph component merge, or
    // the survivor MERGE breaks the row set.
    "q81_dedup_incremental" -> { (s, dir) =>
      dedupLifecycle(s, dir)._1.orderBy("comp", "doc_id")
    },

    // Dedup-index DELETE folding (r15, verdict #2): the S82 capture of the
    // shared lifecycle — two DML delete waves (doc_id%10 ∈ {3,7}:
    // survivors, non-survivors, and bridges alike) interleaved with a
    // post-delete append, ending with a wave that prunes families formed
    // across every batch. Deleting a doc re-splits its family by
    // re-verifying the remaining members and re-elects survivors; the
    // final survivor set must hash-match DuckDB's full recompute over the
    // POST-DELETE corpus.
    "q82_dedup_deletes" -> { (s, dir) =>
      dedupLifecycle(s, dir)._2.orderBy("comp", "doc_id")
    },

    // Dedup-index UPDATE folding (r16, verdict #1): the S84 capture — a
    // Dml.update wave rewrites %10 = 5 texts in place (vowels → digits)
    // and ONE refresh folds the resulting update_pre/postimage CDF window:
    // pre-images recompute the standing band rows to drop, post-images
    // re-index, affected families re-split AND re-form across the rewrite.
    // The survivor set must hash-match DuckDB's full recompute over the
    // post-update corpus — the index consuming the engine's own UPDATE
    // output (redactPii-then-UPDATE, the pipeline's canonical rewrite).
    "q84_dedup_updates" -> { (s, dir) =>
      dedupLifecycle(s, dir)._3.orderBy("comp", "doc_id")
    },

    // Generic doc keys at the driver gate (r15, verdict #8): the SAME
    // standing-index lifecycle — build, CDF increment, delete fold, and
    // (r17) an UPDATE-wave fold — on a
    // STRING id column (URL-shaped, zero-padded so string order matches
    // the numeric order the oracle labels components with). Exercises the
    // string comp labels, the InStringSet probe pruning, and the
    // string-typed null literals end-to-end; survivors must hash-match
    // DuckDB's recursive-closure recompute keyed by the same strings.
    // Runs on the doc_id % 3 = 1 third of the corpus (r15 verdict #4 —
    // gate-harness cost): every string-keyed fold shape at a third of the
    // build/refresh volume, same oracle-expressible final corpus. Memoized
    // per dir like the shared lifecycle (same commit-floor rationale).
    "q83_dedup_string_ids" -> { (s, dir) =>
      strLifecycleMemo.compute(dir, (_, old) =>
          if (old != null && (old._1 eq s) && sessionLive(s)) old
          else (s, q83Lifecycle(s, dir)))
        ._2.orderBy("comp", "doc_id")
    },

    // tumbling-window event aggregation (batch shape of the streaming agg).
    "q31_events_window" -> { (s, dir) =>
      events(s, dir)
        // to_date alone truncates a timestamp to its day — a date_trunc
        // wrapper would be dead work suggesting sub-day semantics
        .groupBy(to_date(col("ts_us")).as("day"), col("event_type"))
        .agg(count(lit(1)).as("n"), lsum(col("value")).as("sum_value"))
        .orderBy("day", "event_type")
    },

    // multimodal plumbing: text → binary payload → batched stub decode.
    // Oracle-checked since round 6: the stub header/checksum restates in
    // SQL over the (ASCII) payload bytes, so the mapPartitions plumbing —
    // schema, null handling, batch shape — is held to a DuckDB hash-match.
    "q32_multimodal" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), encode(col("text"), "utf-8").as("payload"))
      MultiModal.extractMetadata(docs, "payload").orderBy("doc_id")
    },

    // real container sniffing (r12): deterministic REAL-layout PNG/JPEG/WAV
    // heads (plus truncated-PNG corrupt rows) synthesized from doc_id, then
    // sniffed by the production magic-number parser. The oracle predicts
    // the metadata closed-form from doc_id — any sniffer offset error
    // breaks the hash-match.
    "q74_media_sniff" -> { (s, dir) =>
      val docs = t(s, dir, "documents").select("doc_id")
      MultiModal.sniffMetadata(
        MultiModal.MediaSynth.attach(docs, "doc_id"), "payload")
        .orderBy("doc_id")
    },

    // language-ID heuristic. Oracle-checked since round 6: the marker-hit
    // argmax (ties → lexicographically largest lang, Spark's greatest over
    // (score, lang) structs) restates exactly as DuckDB list_max over the
    // same structs; since r12 a best score of ZERO predicts NULL (the
    // honest "no profile matched" default, r11 verdict #7) — both engines
    // apply the same minScore=1 threshold. (The testdata lang COLUMN stays
    // unusable as truth — the synthetic vocabulary is language-blind — but
    // the operator's own semantics are cross-engine-verified.)
    "q33_langid" -> { (s, dir) =>
      TextAnalysis.languageId(Inputs.parallel(t(s, dir, "documents"), "doc_id"),
        "text", "doc_id")
        .orderBy("doc_id")
    },

    // composed pipeline: quality-filter → fingerprint-dedup → per-language
    // counts — the operators chained as a real corpus-cleaning job, checked
    // end-to-end by one oracle.
    "q43_pipeline" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
      val quality = TextAnalysis.qualityScore(docs, "text", "doc_id")
        .filter(col("repetition_micro") <= 300000)
      val candidates = docs.join(quality.select("doc_id"), "doc_id")
      val kept = Dedup.byFingerprint(candidates, "text", "doc_id")
        .select("doc_id")
      docs.join(kept, "doc_id")
        .groupBy("lang").agg(count(lit(1)).as("n_docs"))
        .orderBy("lang")
    },

    // rolling-hash document fingerprint. Oracle-checked since round 6: the
    // base-31 mod-1e9+7 char fold restates as a DuckDB list_reduce (both
    // engines agree on split(''), ascii, and the fold — verified).
    "q34_fingerprint" -> { (s, dir) =>
      TextAnalysis.fingerprint(Inputs.parallel(t(s, dir, "documents"), "doc_id"),
        "text", "doc_id")
        .orderBy("doc_id")
    },

    // BPE-ish subword token counting (greedy length-4 chunking).
    "q41_subword" -> { (s, dir) =>
      TextAnalysis.subwordCount(t(s, dir, "documents"), "text", "doc_id")
        .orderBy("doc_id")
    },

    // embedding-cosine similar pairs (exact integer cosine threshold) on a
    // bounded slice — the brute-force recall=1 BASELINE for q50 below.
    "q35_embed_similar" -> { (s, dir) =>
      // maxRows=None: the slice is already bounded to 1000 ids — the
      // guard's O(n) count would be a wasted extra pass in the gate
      Dedup.embeddingSimilarPairs(
        Inputs.parallel(t(s, dir, "embeddings"), "vec_id") // CPU: O(n²) verify
          .filter(col("vec_id") < 1000), "vec_id", "embedding",
        thresholdNum = 45, thresholdDen = 100, maxRows = None)
        .orderBy("id_a", "id_b")
    },

    // the SCALE PATH for embedding near-dup, held to the same brute-force
    // oracle as q35: multi-table hyperplane LSH candidates → exact integer
    // cosine verify. Precision is 1 by construction (exact verify); recall
    // is analytic — the worst matched pair at this threshold sits at
    // cos ≈ 0.45 ⇒ per-plane collision p = 1 − acos(0.45)/π ≈ 0.649, so
    // 96 tables × 4 planes give miss = (1 − p⁴)⁹⁶ ≈ 8·10⁻⁹ per pair —
    // and the hash-derived planes are seed-deterministic, so a verified
    // run is reproducible bit-for-bit.
    "q50_embed_lsh" -> { (s, dir) =>
      Dedup.embeddingSimilarPairsMultiLsh(
        Inputs.parallel(t(s, dir, "embeddings"), "vec_id") // CPU: 96-table LSH
          .filter(col("vec_id") < 1000), "vec_id", "embedding",
        thresholdNum = 45, thresholdDen = 100,
        nTables = 96, nPlanes = 4,
        maxBucketSize = None) // uncapped: oracle identity, see q25
        .orderBy("id_a", "id_b")
    },
  )

  private val jaccardOracle =
    """WITH d AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents%s),
      |sh AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
      |       FROM d, UNNEST(generate_series(1, len(w) - 2)) AS t(i) WHERE len(w) >= 3),
      |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
      |pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
      |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2)
      |SELECT id_a, id_b FROM pairs
      |JOIN cnt ca ON ca.doc_id = id_a JOIN cnt cb ON cb.doc_id = id_b
      |WHERE 2 * inter >= (ca.n + cb.n - inter)
      |ORDER BY id_a, id_b""".stripMargin

  /** ONE brute-force quantized-dot ranking — the shared oracle for q29
    * (direct brute force), q30 (full-probe session IVF), and q79 (full-
    * probe committed IVF index): a quantization-arithmetic fix cannot
    * desynchronize the three gates (r13 review). */
  private val bruteForceAnnOracle =
    """WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
      |SELECT vec_id, CAST(list_sum(list_transform(range(1, len(embedding) + 1),
      |  i -> CAST(round(CAST(embedding[i] AS DOUBLE) * 1000) AS BIGINT)
      |     * CAST(round(CAST(qe[i] AS DOUBLE) * 1000) AS BIGINT))) AS BIGINT) AS dot_q
      |FROM embeddings, q
      |ORDER BY dot_q DESC, vec_id LIMIT 10""".stripMargin

  private val embedPairsOracle =
    """WITH v AS (SELECT vec_id,
      |  list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS e
      |  FROM embeddings WHERE vec_id < 1000),
      |n AS (SELECT vec_id, e, CAST(list_sum(list_transform(e, x -> x * x)) AS BIGINT) AS nrm FROM v),
      |p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
      |        CAST(list_sum(list_transform(range(1, len(a.e) + 1), i -> a.e[i] * b.e[i])) AS BIGINT) AS dot,
      |        a.nrm AS na, b.nrm AS nb
      |      FROM n a JOIN n b ON a.vec_id < b.vec_id)
      |SELECT id_a, id_b FROM p
      |WHERE dot > 0 AND dot * dot * 10000 >= na * nb * 2025
      |ORDER BY id_a, id_b""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q22_dedup_exact" ->
      """SELECT min(event_id) AS event_id FROM events
        |GROUP BY user_id, event_type, value ORDER BY event_id""".stripMargin,

    "q23_dedup_fingerprint" ->
      """SELECT min(doc_id) AS doc_id, count(*) AS n_dupes FROM documents
        |GROUP BY md5(lower(substr(text, 1, 80))) ORDER BY doc_id""".stripMargin,

    "q24_dedup_jaccard" -> jaccardOracle.format(" WHERE doc_id < 300"),

    "q25_minhash_lsh" -> jaccardOracle.format(""),

    // the composed pipeline's survivor set: brute-force Jaccard pairs
    // (= the LSH+verify output, q25) → recursive transitive closure →
    // longest-text-then-lowest-id survivor per family → token counts and
    // the packing invariants as constants on every row
    "q77_dedup_pipeline" ->
      """WITH RECURSIVE
        |d AS (SELECT doc_id, text, string_split(lower(text), ' ') AS w FROM documents),
        |sh AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
        |       FROM d, UNNEST(generate_series(1, len(w) - 2)) AS t(i) WHERE len(w) >= 3),
        |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        |p0 AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
        |       FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |p AS (SELECT id_a, id_b FROM p0
        |      JOIN cnt ca ON ca.doc_id = id_a JOIN cnt cb ON cb.doc_id = id_b
        |      WHERE 2 * inter >= (ca.n + cb.n - inter)),
        |e AS (SELECT id_a AS a, id_b AS b FROM p UNION SELECT id_b, id_a FROM p),
        |reach(a, b) AS (SELECT a, b FROM e
        |                UNION
        |                SELECT r.a, e2.b FROM reach r JOIN e e2 ON r.b = e2.a),
        |comp AS (SELECT a AS id, least(a, min(b)) AS comp FROM reach GROUP BY a),
        |fam AS (SELECT d.doc_id, d.text, coalesce(c.comp, d.doc_id) AS comp
        |        FROM d LEFT JOIN comp c ON c.id = d.doc_id),
        |surv AS (SELECT doc_id, text FROM (
        |           SELECT doc_id, text, row_number() OVER (
        |             PARTITION BY comp ORDER BY length(text) DESC, doc_id) AS rn
        |           FROM fam) WHERE rn = 1),
        |st AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens FROM surv),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS docs_packed,
        |               CAST(sum(n_tokens) AS BIGINT) AS tokens_packed FROM st)
        |SELECT doc_id, n_tokens, docs_packed, tokens_packed,
        |       CAST(0 AS BIGINT) AS over_budget_bins
        |FROM st, tot ORDER BY doc_id""".stripMargin,

    // full recompute of the q77 closure over the shared lifecycle's
    // insert-only capture corpus (doc_id % 10 < 8 — every doc inserted
    // before the first delete wave), survivor rows (comp, id, length) —
    // the incremental index must land on exactly this
    "q81_dedup_incremental" ->
      """WITH RECURSIVE
        |d AS (SELECT doc_id, text, string_split(lower(text), ' ') AS w
        |      FROM documents WHERE doc_id % 10 < 8),
        |sh AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
        |       FROM d, UNNEST(generate_series(1, len(w) - 2)) AS t(i) WHERE len(w) >= 3),
        |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        |p0 AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
        |       FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |p AS (SELECT id_a, id_b FROM p0
        |      JOIN cnt ca ON ca.doc_id = id_a JOIN cnt cb ON cb.doc_id = id_b
        |      WHERE 2 * inter >= (ca.n + cb.n - inter)),
        |e AS (SELECT id_a AS a, id_b AS b FROM p UNION SELECT id_b, id_a FROM p),
        |reach(a, b) AS (SELECT a, b FROM e
        |                UNION
        |                SELECT r.a, e2.b FROM reach r JOIN e e2 ON r.b = e2.a),
        |comp AS (SELECT a AS id, least(a, min(b)) AS comp FROM reach GROUP BY a),
        |fam AS (SELECT d.doc_id, d.text, coalesce(c.comp, d.doc_id) AS comp
        |        FROM d LEFT JOIN comp c ON c.id = d.doc_id)
        |SELECT comp, doc_id, CAST(length(text) AS BIGINT) AS text_len FROM (
        |  SELECT comp, doc_id, text, row_number() OVER (
        |    PARTITION BY comp ORDER BY length(text) DESC, doc_id) AS rn
        |  FROM fam) WHERE rn = 1 ORDER BY comp, doc_id""".stripMargin,

    // full recompute of the q81 closure over the POST-DELETE corpus
    // (documents minus both q82 delete waves) — the delete-folding index
    // must land on exactly this
    "q82_dedup_deletes" ->
      """WITH RECURSIVE
        |d AS (SELECT doc_id, text, string_split(lower(text), ' ') AS w
        |      FROM documents WHERE doc_id % 10 NOT IN (3, 7)),
        |sh AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
        |       FROM d, UNNEST(generate_series(1, len(w) - 2)) AS t(i) WHERE len(w) >= 3),
        |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        |p0 AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
        |       FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |p AS (SELECT id_a, id_b FROM p0
        |      JOIN cnt ca ON ca.doc_id = id_a JOIN cnt cb ON cb.doc_id = id_b
        |      WHERE 2 * inter >= (ca.n + cb.n - inter)),
        |e AS (SELECT id_a AS a, id_b AS b FROM p UNION SELECT id_b, id_a FROM p),
        |reach(a, b) AS (SELECT a, b FROM e
        |                UNION
        |                SELECT r.a, e2.b FROM reach r JOIN e e2 ON r.b = e2.a),
        |comp AS (SELECT a AS id, least(a, min(b)) AS comp FROM reach GROUP BY a),
        |fam AS (SELECT d.doc_id, d.text, coalesce(c.comp, d.doc_id) AS comp
        |        FROM d LEFT JOIN comp c ON c.id = d.doc_id)
        |SELECT comp, doc_id, CAST(length(text) AS BIGINT) AS text_len FROM (
        |  SELECT comp, doc_id, text, row_number() OVER (
        |    PARTITION BY comp ORDER BY length(text) DESC, doc_id) AS rn
        |  FROM fam) WHERE rn = 1 ORDER BY comp, doc_id""".stripMargin,

    // the q82 closure over the POST-UPDATE corpus: %10 ∉ {3,7} with %10=5
    // texts rewritten by the same vowel→digit translate the Spark-side
    // Dml.update wave applied — the update-folding index must land on
    // exactly this
    "q84_dedup_updates" ->
      """WITH RECURSIVE
        |d AS (SELECT doc_id,
        |             CASE WHEN doc_id % 10 = 5
        |                  THEN translate(text, 'aeiou', '01234')
        |                  ELSE text END AS text
        |      FROM documents WHERE doc_id % 10 NOT IN (3, 7)),
        |dw AS (SELECT doc_id, text, string_split(lower(text), ' ') AS w FROM d),
        |sh AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
        |       FROM dw, UNNEST(generate_series(1, len(w) - 2)) AS t(i) WHERE len(w) >= 3),
        |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        |p0 AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
        |       FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |p AS (SELECT id_a, id_b FROM p0
        |      JOIN cnt ca ON ca.doc_id = id_a JOIN cnt cb ON cb.doc_id = id_b
        |      WHERE 2 * inter >= (ca.n + cb.n - inter)),
        |e AS (SELECT id_a AS a, id_b AS b FROM p UNION SELECT id_b, id_a FROM p),
        |reach(a, b) AS (SELECT a, b FROM e
        |                UNION
        |                SELECT r.a, e2.b FROM reach r JOIN e e2 ON r.b = e2.a),
        |comp AS (SELECT a AS id, least(a, min(b)) AS comp FROM reach GROUP BY a),
        |fam AS (SELECT dw.doc_id, dw.text, coalesce(c.comp, dw.doc_id) AS comp
        |        FROM dw LEFT JOIN comp c ON c.id = dw.doc_id)
        |SELECT comp, doc_id, CAST(length(text) AS BIGINT) AS text_len FROM (
        |  SELECT comp, doc_id, text, row_number() OVER (
        |    PARTITION BY comp ORDER BY length(text) DESC, doc_id) AS rn
        |  FROM fam) WHERE rn = 1 ORDER BY comp, doc_id""".stripMargin,

    // the q82 closure with STRING doc ids (zero-padded, so the min-id comp
    // labels agree with the numeric labeling) over the post-delete corpus —
    // the doc_id % 3 = 1 third (gate-cost trim, r15 verdict #4)
    "q83_dedup_string_ids" ->
      """WITH RECURSIVE
        |d0 AS (SELECT printf('doc://%012d', doc_id) AS doc_id,
        |              CASE WHEN doc_id % 10 = 7
        |                   THEN translate(text, 'aeiou', '01234')
        |                   ELSE text END AS text
        |       FROM documents WHERE doc_id % 3 = 1 AND doc_id % 10 <> 3),
        |d AS (SELECT doc_id, text, string_split(lower(text), ' ') AS w FROM d0),
        |sh AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
        |       FROM d, UNNEST(generate_series(1, len(w) - 2)) AS t(i) WHERE len(w) >= 3),
        |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        |p0 AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
        |       FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |p AS (SELECT id_a, id_b FROM p0
        |      JOIN cnt ca ON ca.doc_id = id_a JOIN cnt cb ON cb.doc_id = id_b
        |      WHERE 2 * inter >= (ca.n + cb.n - inter)),
        |e AS (SELECT id_a AS a, id_b AS b FROM p UNION SELECT id_b, id_a FROM p),
        |reach(a, b) AS (SELECT a, b FROM e
        |                UNION
        |                SELECT r.a, e2.b FROM reach r JOIN e e2 ON r.b = e2.a),
        |comp AS (SELECT a AS id, least(a, min(b)) AS comp FROM reach GROUP BY a),
        |fam AS (SELECT d.doc_id, d.text, coalesce(c.comp, d.doc_id) AS comp
        |        FROM d LEFT JOIN comp c ON c.id = d.doc_id)
        |SELECT comp, doc_id, CAST(length(text) AS BIGINT) AS text_len FROM (
        |  SELECT comp, doc_id, text, row_number() OVER (
        |    PARTITION BY comp ORDER BY length(text) DESC, doc_id) AS rn
        |  FROM fam) WHERE rn = 1 ORDER BY comp, doc_id""".stripMargin,

    "q59_contamination" ->
      """WITH c AS (SELECT doc_id, string_split(lower(text), ' ') AS w
        |           FROM documents WHERE doc_id < 600),
        |csh AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
        |        FROM c, UNNEST(generate_series(1, len(w) - 2)) AS t(i) WHERE len(w) >= 3),
        |bsh AS (SELECT doc_id AS bench_id, s FROM csh WHERE bench_id % 20 = 0),
        |bn AS (SELECT bench_id, count(*) AS bench_n FROM bsh GROUP BY bench_id),
        |inter AS (SELECT c.doc_id, b.bench_id, count(*) AS inter
        |          FROM csh c JOIN bsh b ON c.s = b.s GROUP BY 1, 2)
        |SELECT i.doc_id, i.bench_id, i.inter, bn.bench_n
        |FROM inter i JOIN bn ON bn.bench_id = i.bench_id
        |WHERE i.inter * 5 >= bn.bench_n * 3
        |ORDER BY i.doc_id, i.bench_id""".stripMargin,

    "q54_stratified" ->
      """SELECT doc_id, lang FROM (
        |  SELECT doc_id, lang, row_number() OVER (
        |    PARTITION BY lang ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        |  FROM documents)
        |WHERE rn <= 20 ORDER BY doc_id""".stripMargin,

    // transitive closure of the q24 pair graph; comp = min reachable id
    "q53_dedup_cluster" ->
      """WITH RECURSIVE
        |d AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents WHERE doc_id < 300),
        |sh AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
        |       FROM d, UNNEST(generate_series(1, len(w) - 2)) AS t(i) WHERE len(w) >= 3),
        |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        |p0 AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
        |       FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |p AS (SELECT id_a, id_b FROM p0
        |      JOIN cnt ca ON ca.doc_id = id_a JOIN cnt cb ON cb.doc_id = id_b
        |      WHERE 2 * inter >= (ca.n + cb.n - inter)),
        |e AS (SELECT id_a AS a, id_b AS b FROM p UNION SELECT id_b, id_a FROM p),
        |reach(a, b) AS (SELECT a, b FROM e
        |                UNION
        |                SELECT r.a, e2.b FROM reach r JOIN e e2 ON r.b = e2.a)
        |SELECT CAST(a AS BIGINT) AS id, CAST(least(a, min(b)) AS BIGINT) AS comp
        |FROM reach GROUP BY a ORDER BY id""".stripMargin,

    "q27_text_stats" ->
      """SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens,
        |CAST(len(list_distinct(w)) AS BIGINT) AS n_distinct,
        |CAST(list_sum(list_transform(w, x -> length(x))) AS BIGINT) AS total_chars,
        |CAST(list_max(list_transform(w, x -> length(x))) AS BIGINT) AS max_token_len
        |FROM (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents)
        |ORDER BY doc_id""".stripMargin,

    "q28_quality" ->
      """SELECT doc_id,
        |CAST((len(w) - len(list_distinct(w))) * 1000000 // len(w) AS BIGINT) AS repetition_micro,
        |CAST(CAST(list_sum(list_transform(w, x -> length(x))) AS BIGINT) * 1000000 // len(w) AS BIGINT) AS mean_token_len_micro
        |FROM (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents)
        |ORDER BY doc_id""".stripMargin,

    "q29_ann_cosine" -> bruteForceAnnOracle,

    "q62_pii_redact" ->
      """WITH synth AS (
        |  SELECT doc_id,
        |    'reach user' || CAST(doc_id AS VARCHAR) || '@example.com or 415-555-' ||
        |    lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ||
        |    ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7 today' AS text
        |  FROM documents)
        |SELECT doc_id,
        |  regexp_replace(regexp_replace(regexp_replace(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '([0-9]{1,3}\.){3}[0-9]{1,3}', '<IP>', 'g'),
        |    '[0-9]{3}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g') AS redacted,
        |  CAST(len(regexp_extract_all(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(
        |    regexp_replace(text,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '([0-9]{1,3}\.){3}[0-9]{1,3}')) AS BIGINT) AS n_ips,
        |  CAST(len(regexp_extract_all(
        |    regexp_replace(regexp_replace(text,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |      '([0-9]{1,3}\.){3}[0-9]{1,3}', '<IP>', 'g'),
        |    '[0-9]{3}-[0-9]{3}-[0-9]{4}')) AS BIGINT) AS n_phones
        |FROM synth ORDER BY doc_id""".stripMargin,

    "q60_quantized_ann" ->
      """WITH s AS (
        |  SELECT vec_id, embedding,
        |    CASE WHEN mx IS NULL OR mx = 0 THEN 1.0 ELSE 127.0 / mx END AS sc
        |  FROM (SELECT vec_id, embedding,
        |          list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS mx
        |        FROM embeddings)),
        |q AS (SELECT vec_id, sc, list_transform(range(1, len(embedding) + 1),
        |        i -> CAST(round(CAST(embedding[i] AS DOUBLE) * sc) AS BIGINT)) AS q8
        |      FROM s),
        |qq AS (SELECT q8 AS query_q8, sc AS qsc FROM q WHERE vec_id = 0)
        |SELECT vec_id, CAST(list_sum(list_transform(range(1, len(q8) + 1),
        |  i -> q8[i] * query_q8[i])) AS BIGINT) AS dot_q8
        |FROM q, qq
        |ORDER BY dot_q8 / (sc * qsc) DESC, vec_id LIMIT 10""".stripMargin,

    "q31_events_window" ->
      s"""SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
         |count(*) AS n, ${DSUM.format("value")} AS sum_value
         |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q41_subword" ->
      """SELECT doc_id,
        |CAST(list_sum(list_transform(string_split(lower(text), ' '),
        |  x -> CAST(ceil(length(x) / 4.0) AS BIGINT))) AS BIGINT) AS n_subwords
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q43_pipeline" ->
      """WITH q AS (
        |  SELECT doc_id, lang, text,
        |    (len(w) - len(list_distinct(w))) * 1000000 // len(w) AS rep
        |  FROM (SELECT doc_id, lang, text, string_split(lower(text), ' ') AS w FROM documents)
        |), kept AS (
        |  SELECT min(doc_id) AS doc_id FROM q WHERE rep <= 300000
        |  GROUP BY md5(lower(substr(text, 1, 80)))
        |)
        |SELECT lang, count(*) AS n_docs FROM q JOIN kept USING (doc_id)
        |GROUP BY lang ORDER BY lang""".stripMargin,

    "q35_embed_similar" -> embedPairsOracle,

    // q50 is LSH-approximate on the Spark side but held to the exact
    // brute-force oracle — the gate proves the scale path loses nothing.
    "q50_embed_lsh" -> embedPairsOracle,

    // full simhash → band → Hamming pipeline restated (md5-prefix feature
    // hash is engine-independent; bit i set when the ±1 counter sum > 0)
    "q26_simhash" ->
      """WITH d AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
        |sh AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
        |       FROM d, UNNEST(generate_series(1, len(w) - 2)) AS t(i) WHERE len(w) >= 3),
        |f AS (SELECT doc_id, CAST(CONCAT('0x', substr(md5(s), 1, 15)) AS BIGINT) AS h FROM sh),
        |bits AS (SELECT doc_id, i,
        |           SUM(CASE WHEN (h >> i) & 1 = 1 THEN 1 ELSE -1 END) AS c
        |         FROM f, UNNEST(generate_series(0, 63)) AS t(i) GROUP BY 1, 2),
        |sim AS (SELECT doc_id,
        |          CAST(SUM(CASE WHEN c > 0 THEN (CAST(1 AS BIGINT) << i) ELSE 0 END) AS BIGINT) AS simhash
        |        FROM bits GROUP BY doc_id),
        |bands AS (SELECT doc_id, simhash, b, (simhash >> (b * 16)) & 65535 AS key
        |          FROM sim, UNNEST(generate_series(0, 3)) AS t(b)),
        |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
        |                a.simhash AS ha, b.simhash AS hb
        |         FROM bands a JOIN bands b ON a.b = b.b AND a.key = b.key
        |                                   AND a.doc_id < b.doc_id)
        |SELECT id_a, id_b, CAST(bit_count(xor(ha, hb)) AS BIGINT) AS hamming
        |FROM cand WHERE bit_count(xor(ha, hb)) <= 16
        |ORDER BY id_a, id_b""".stripMargin,

    // marker-hit argmax, ties to the lexicographically largest lang —
    // DuckDB struct comparison matches Spark greatest() over structs;
    // best score 0 → NULL (the minScore=1 default, in lockstep with
    // TextAnalysis.languageId)
    "q33_langid" ->
      """SELECT doc_id, CASE WHEN best.score >= 1 THEN best.lang END AS pred_lang
        |FROM (SELECT doc_id, list_max([
        |  {'score': len(list_filter(w, x -> x IN ('der','die','das','und','nicht'))), 'lang': 'de'},
        |  {'score': len(list_filter(w, x -> x IN ('the','and','of','to','a'))), 'lang': 'en'},
        |  {'score': len(list_filter(w, x -> x IN ('el','la','los','que','de'))), 'lang': 'es'},
        |  {'score': len(list_filter(w, x -> x IN ('le','les','des','et','une'))), 'lang': 'fr'}
        |]) AS best
        |FROM (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents))
        |ORDER BY doc_id""".stripMargin,

    // base-31 mod-1e9+7 rolling hash over the raw characters
    "q34_fingerprint" ->
      """SELECT doc_id, list_reduce(
        |    list_prepend(CAST(0 AS BIGINT),
        |      list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT))),
        |    (acc, c) -> (acc * 31 + c) % 1000000007) AS fingerprint
        |FROM documents ORDER BY doc_id""".stripMargin,

    // packing invariants: exactly-once, token conservation, and the literal
    // 0 over-budget count (any multi-doc bin past the budget breaks the
    // hash match on the Spark side)
    "q56_packing" ->
      """SELECT CAST(count(*) AS BIGINT) AS docs_packed,
        |  CAST(count(DISTINCT doc_id) AS BIGINT) AS docs_distinct,
        |  CAST(SUM(CAST(len(string_split(text, ' ')) AS BIGINT)) AS BIGINT) AS tokens_packed,
        |  CAST(0 AS BIGINT) AS over_budget_bins
        |FROM documents""".stripMargin,

    // q56's invariants over the post-takedown corpus — what the
    // INCREMENTAL repack must retain exactly once
    "q86_incremental_packing" ->
      """SELECT CAST(count(*) AS BIGINT) AS docs_packed,
        |  CAST(count(DISTINCT doc_id) AS BIGINT) AS docs_distinct,
        |  CAST(SUM(CAST(len(string_split(text, ' ')) AS BIGINT)) AS BIGINT) AS tokens_packed,
        |  CAST(0 AS BIGINT) AS over_budget_bins
        |FROM documents WHERE doc_id % 10 <> 3""".stripMargin,

    // DuckDB's NATIVE ASOF JOIN as the oracle for graft's single-shuffle
    // windowed implementation — two independent engines, same semantics
    "q87_asof_join" ->
      """WITH c AS (SELECT event_id, user_id, epoch_us(ts) AS c_us
        |           FROM events WHERE event_type = 'click'),
        |p AS (SELECT user_id, epoch_us(ts) AS pts,
        |        max(CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT))
        |          AS p_value_u,
        |        max(event_id) AS p_event
        |      FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
        |SELECT c.event_id, c.user_id, c.c_us, p.p_value_u, p.p_event
        |FROM c ASOF LEFT JOIN p
        |  ON c.user_id = p.user_id AND c.c_us >= p.pts
        |ORDER BY c.event_id""".stripMargin,

    // the bucketized range join vs DuckDB's plain inequality join
    "q88_range_join" ->
      """WITH c AS (SELECT event_id AS c_event, user_id,
        |        epoch_us(ts) AS c_us
        |      FROM events WHERE event_type = 'click'),
        |p AS (SELECT event_id AS p_event, user_id, epoch_us(ts) AS s_us
        |      FROM events WHERE event_type = 'purchase')
        |SELECT p.p_event, c.c_event, c.user_id, c.c_us - p.s_us AS lag_us
        |FROM c JOIN p ON c.user_id = p.user_id
        |  AND c.c_us >= p.s_us AND c.c_us <= p.s_us + 86400000000
        |ORDER BY p.p_event, c.c_event""".stripMargin,

    // stub decoder restated over the ASCII payload: width/height from the
    // first two bytes (+1), byte length, and the mod-1e9+7 checksum fold
    "q32_multimodal" ->
      """SELECT doc_id,
        |  CAST(CASE WHEN length(text) > 0 THEN ascii(substr(text, 1, 1)) + 1 ELSE 0 END AS INTEGER) AS width,
        |  CAST(CASE WHEN length(text) > 1 THEN ascii(substr(text, 2, 1)) + 1 ELSE 0 END AS INTEGER) AS height,
        |  CAST(length(text) AS BIGINT) AS n_bytes,
        |  list_reduce(
        |    list_prepend(CAST(0 AS BIGINT),
        |      list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT))),
        |    (acc, c) -> (acc * 131 + c) % 1000000007) AS checksum
        |FROM documents ORDER BY doc_id""".stripMargin,

    // MediaSynth.forId formulas restated closed-form: the Spark side built
    // REAL container bytes from doc_id and sniffed them back; the oracle
    // never touches binary. Sizes are the fixed header-only container
    // sizes (png 33 / jpeg 41 / wav 44; corrupt rows truncate to
    // doc_id % 20 bytes — ≥8 keeps the PNG signature, <8 is unknown).
    "q74_media_sniff" ->
      """SELECT doc_id,
        |  CASE doc_id % 4 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' WHEN 2 THEN 'wav'
        |       ELSE CASE WHEN doc_id % 20 >= 8 THEN 'png' ELSE 'unknown' END END AS format,
        |  CAST(CASE doc_id % 4 WHEN 0 THEN doc_id % 500 + 1 WHEN 1 THEN doc_id % 300 + 1 END AS INTEGER) AS width,
        |  CAST(CASE doc_id % 4 WHEN 0 THEN (doc_id // 7) % 500 + 1 WHEN 1 THEN (doc_id // 3) % 300 + 1 END AS INTEGER) AS height,
        |  CAST(CASE WHEN doc_id % 4 = 2 THEN 8000 + (doc_id % 8) * 4000 END AS INTEGER) AS sample_rate,
        |  CAST(CASE WHEN doc_id % 4 = 2 THEN doc_id % 2 + 1 END AS INTEGER) AS channels,
        |  CAST(CASE WHEN doc_id % 4 = 2 THEN 16 END AS INTEGER) AS bits_per_sample,
        |  CAST(CASE doc_id % 4 WHEN 0 THEN 33 WHEN 1 THEN 41 WHEN 2 THEN 44 ELSE doc_id % 20 END AS BIGINT) AS n_bytes,
        |  CAST(CASE WHEN doc_id % 4 = 3 THEN 0 ELSE 1 END AS INTEGER) AS valid
        |FROM documents ORDER BY doc_id""".stripMargin,

    // q30: the full-probe IVF gate equals brute force by construction, so
    // it reuses q29's oracle verbatim. (Partial probes CANNOT be oracled on
    // this testdata — the labels are not cosine clusters: the true top-10
    // spans 6 of 10 labels, one ranking 8th by centroid dot — so the
    // sub-linear invariants live in SimilaritySpec instead.)
    "q30_ann_ivf" -> bruteForceAnnOracle,

    // exhaustive probe over the committed index ≡ brute force over every
    // vector — same oracle as q29/q30
    "q79_ivf_index" -> bruteForceAnnOracle,

    // q60's max-abs int8 arithmetic, selected by the descaled quantized
    // rank (the index's probe order), output rows re-ordered on the
    // output columns (dot_q8, vec_id) for the totality audit — exactly
    // the Spark gate's shape
    "q85_ivf_quantized" ->
      """WITH s AS (
        |  SELECT vec_id, embedding,
        |    CASE WHEN mx IS NULL OR mx = 0 THEN 1.0 ELSE 127.0 / mx END AS sc
        |  FROM (SELECT vec_id, embedding,
        |          list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS mx
        |        FROM embeddings)),
        |q AS (SELECT vec_id, sc, list_transform(range(1, len(embedding) + 1),
        |        i -> CAST(round(CAST(embedding[i] AS DOUBLE) * sc) AS BIGINT)) AS q8
        |      FROM s),
        |qq AS (SELECT q8 AS query_q8, sc AS qsc FROM q WHERE vec_id = 0),
        |top AS (SELECT vec_id, CAST(list_sum(list_transform(range(1, len(q8) + 1),
        |          i -> q8[i] * query_q8[i])) AS BIGINT) AS dot_q8
        |        FROM q, qq
        |        ORDER BY dot_q8 / (sc * qsc) DESC, vec_id LIMIT 10)
        |SELECT vec_id, dot_q8 FROM top ORDER BY dot_q8 DESC, vec_id""".stripMargin,

    // the q80 corpus is the source table AFTER its post-build lifecycle:
    // the %7 slice deleted, ten twin vectors appended — brute force over
    // exactly that, in the shared quantized-dot arithmetic
    "q80_ivf_cdf" ->
      """WITH corpus AS (
        |  SELECT vec_id, embedding FROM embeddings WHERE vec_id % 7 <> 3
        |  UNION ALL
        |  SELECT vec_id + 1000000000, embedding FROM embeddings WHERE vec_id < 10),
        |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
        |SELECT vec_id, CAST(list_sum(list_transform(range(1, len(embedding) + 1),
        |  i -> CAST(round(CAST(embedding[i] AS DOUBLE) * 1000) AS BIGINT)
        |     * CAST(round(CAST(qe[i] AS DOUBLE) * 1000) AS BIGINT))) AS BIGINT) AS dot_q
        |FROM corpus, q
        |ORDER BY dot_q DESC, vec_id LIMIT 10""".stripMargin
  )
}
