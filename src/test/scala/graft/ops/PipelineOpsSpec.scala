package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DedupSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def docs(rows: (Long, String)*): DataFrame =
    rows.toDF("doc_id", "text")

  private val corpus = docs(
    1L -> "the quick brown fox jumps over the lazy dog near the river bank",
    2L -> "the quick brown fox jumps over the lazy dog near the river delta", // near-dup of 1
    3L -> "completely different words about spark catalyst optimizer plans here today",
    4L -> "the quick brown fox jumps over the lazy dog near the river bank") // exact dup of 1

  test("exact dedup keeps one representative per key") {
    val out = Dedup.exact(corpus, Seq("text"), "doc_id").orderBy("doc_id").collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSeq == Seq(1L, 2L, 3L))
  }

  test("fingerprint dedup groups shared prefixes") {
    val out = Dedup.byFingerprint(corpus, "text", "doc_id", prefixLen = 40)
    // docs 1, 2, 4 share the first 40 chars
    val kept = out.orderBy("doc_id").collect()
    assert(kept.length == 2)
    assert(kept.head.getAs[Long]("n_dupes") == 3)
  }

  test("shingles are distinct per doc and require >= n words") {
    val sh = Dedup.shingles(docs(1L -> "a b c d", 2L -> "x y"), "text", "doc_id")
    val got = sh.as[(Long, String)].collect().toSet
    assert(got == Set((1L, "a b c"), (1L, "b c d"))) // doc 2 too short
  }

  test("jaccardPairs finds exactly the similar pairs at the threshold") {
    val sh = Dedup.shingles(corpus, "text", "doc_id")
    val pairs = Dedup.jaccardPairs(sh, "doc_id", 1, 2)
      .as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L), (1L, 4L), (2L, 4L)))
    // higher threshold keeps only the exact dup (jaccard 1.0)
    val strict = Dedup.jaccardPairs(sh, "doc_id", 99, 100).as[(Long, Long)].collect().toSet
    assert(strict == Set((1L, 4L)))
  }

  test("stop-shingle DF cap drops ubiquitous shingles from candidate generation") {
    // "x y z" appears in every doc → DF 4; with cap 3 it generates no candidates
    val d = docs(
      1L -> "x y z a b c",
      2L -> "x y z d e f",
      3L -> "x y z g h i",
      4L -> "x y z j k l")
    val sh = Dedup.shingles(d, "text", "doc_id")
    val uncapped = Dedup.jaccardPairs(sh, "doc_id", 1, 100)
    assert(uncapped.count() > 0) // the shared "x y z" shingle joins everything
    val capped = Dedup.jaccardPairs(sh, "doc_id", 1, 100, maxShingleDf = Some(3))
    assert(capped.count() == 0)
  }

  test("contamination flags corpus docs containing a benchmark doc's shingles") {
    // corpus doc 10 EMBEDS the benchmark item verbatim inside extra text
    // (high containment, low Jaccard — the case plain near-dup dedup misses);
    // doc 11 shares nothing; doc 12 is the benchmark item itself
    val bench = Seq((100L, "what is the capital of france paris is the capital"))
      .toDF("bench_id", "text")
    val corpus = docs(
      10L -> ("intro text before the quiz section " +
        "what is the capital of france paris is the capital " +
        "and then a very long discussion follows with many extra words"),
      11L -> "unrelated training text about completely different topics entirely",
      12L -> "what is the capital of france paris is the capital")
    val hits = Dedup.contamination(corpus, "text", "doc_id",
        bench, "text", "bench_id", n = 3, thresholdNum = 4, thresholdDen = 5)
      .select("doc_id", "bench_id").as[(Long, Long)].collect().toSet
    assert(hits == Set((10L, 100L), (12L, 100L)))
    // Jaccard at the same bar would MISS the embedded case: doc 10's extra
    // text dilutes the union
    val jac = Dedup.jaccardPairs(
      Dedup.shingles(corpus.union(bench.toDF("doc_id", "text")), "text", "doc_id"),
      "doc_id", 4, 5).as[(Long, Long)].collect().toSet
    assert(!jac.contains((10L, 100L)) && !jac.contains((100L, 10L)))
  }

  test("minhash LSH pairs match brute-force jaccard on planted dups") {
    val lsh = Dedup.minhashLshPairs(corpus, "text", "doc_id", 1, 2)
      .as[(Long, Long)].collect().toSet
    assert(lsh == Set((1L, 2L), (1L, 4L), (2L, 4L)))
  }

  test("minhash signatures are identical for identical text") {
    val sh = Dedup.shingles(corpus, "text", "doc_id")
    val sigs = Dedup.minhashSignatures(sh, "doc_id")
      .as[(Long, Seq[Long])].collect().toMap
    assert(sigs(1L) == sigs(4L))
    assert(sigs(1L) != sigs(3L))
    assert(sigs(1L).length == 64)
  }

  test("simhash: identical docs at distance 0, distances order by similarity") {
    val h = Dedup.simhash(corpus, "text", "doc_id")
      .as[(Long, Long)].collect().toMap
    def dist(a: Long, b: Long): Int = java.lang.Long.bitCount(h(a) ^ h(b))
    assert(dist(1L, 4L) == 0) // exact dup → identical simhash
    assert(dist(1L, 2L) < dist(1L, 3L)) // near-dup closer than unrelated
    // band-bucketed pair generation finds the exact dup, skips unrelated
    val pairs = Dedup.simhashPairs(corpus, "text", "doc_id", maxHamming = 16)
      .select("id_a", "id_b", "hamming").as[(Long, Long, Int)].collect()
      .map(p => (p._1, p._2) -> p._3).toMap
    assert(pairs((1L, 4L)) == 0)
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)))
  }

  test("degenerate-bucket cap bounds adversarial boilerplate corpora (round 11)") {
    // 60 byte-identical boilerplate docs: ONE shingle set → one minhash
    // signature → every band bucket holds all 60 → 60·59/2 = 1770 pairs
    // per the uncapped join. The cap drops those buckets wholesale while
    // pairs witnessed by small buckets survive.
    val boiler = (100L until 160L).map(i =>
      i -> "lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod")
    val adv = docs(boiler ++ Seq(
      1L -> "the quick brown fox jumps over the lazy dog near the river bank",
      2L -> "the quick brown fox jumps over the lazy dog near the river delta",
      4L -> "the quick brown fox jumps over the lazy dog near the river bank"): _*)

    val unMinhash = Dedup.minhashLshPairs(adv, "text", "doc_id", 1, 2,
      maxBucketSize = None).count()
    assert(unMinhash >= 1770L + 3, s"uncapped must see the flood, got $unMinhash")
    val capMinhash = Dedup.minhashLshPairs(adv, "text", "doc_id", 1, 2,
      maxBucketSize = Some(50L)).as[(Long, Long)].collect().toSet
    assert(capMinhash == Set((1L, 2L), (1L, 4L), (2L, 4L)),
      s"capped pairs must be exactly the small-bucket dups, got $capMinhash")

    val unSim = Dedup.simhashPairs(adv, "text", "doc_id",
      maxBucketSize = None).count()
    assert(unSim >= 1770L)
    val capSim = Dedup.simhashPairs(adv, "text", "doc_id",
      maxBucketSize = Some(50L))
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(capSim.contains((1L, 4L)) && capSim.forall(p => p._1 < 100L && p._2 < 100L),
      s"flood pairs must be dropped, small-bucket exact dup kept: $capSim")

    // the audit surface: exactly the flooded band buckets, each of size 60
    val sh = Dedup.shingles(adv, "text", "doc_id")
    val bandRows = Dedup.lshBands(Dedup.minhashSignatures(sh, "doc_id"), "doc_id", 16, 4)
    val over = Dedup.oversizedBuckets(bandRows, Seq("band_idx", "band_hash"), 50L)
      .collect()
    assert(over.length == 16 && over.forall(_.getLong(2) == 60L),
      s"expected the 16 flooded band buckets, got ${over.length}")
  }

  test("jaccard set sizes come from the capped universe (r11 review)") {
    // two byte-identical docs sharing 30 corpus-wide stop-shingles and 3
    // private shingles: with the cap dropping the stop-shingles, the pair's
    // similarity over the CAPPED universe is 3/3 = 1.0 — counts from the
    // raw set scored it 3/33 and silently missed the exact duplicate
    val boiler = (0 until 32).map(i => s"w$i").mkString(" ")
    val adv = docs(
      (100L until 120L).map(i => i -> s"$boiler unique${i}a unique${i}b"): _*)
    val dup = docs(
      1L -> s"$boiler private one two",
      2L -> s"$boiler private one two")
    val all = adv.union(dup)
    val sh = Dedup.shingles(all, "text", "doc_id")
    val capped = Dedup.jaccardPairs(sh, "doc_id", 1, 2, maxShingleDf = Some(5L))
      .as[(Long, Long)].collect().toSet
    assert(capped.contains((1L, 2L)),
      s"exact dup must survive the stop-shingle cap, got $capped")
  }

  test("degenerate band geometry fails fast (r11 review)") {
    // numHashes < bands ⇒ rowsPerBand = 0 ⇒ one constant bucket: refuse
    intercept[IllegalArgumentException](
      Dedup.minhashLshPairs(corpus, "text", "doc_id", 1, 2,
        numHashes = 8, bands = 16).count())
    intercept[IllegalArgumentException](
      Dedup.lshBands(
        Dedup.minhashSignatures(Dedup.shingles(corpus, "text", "doc_id"), "doc_id"),
        "doc_id", bands = 16, rowsPerBand = 0).count())
  }
}

class EmbeddingDedupSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.2f)),
    (1L, Array(0.99f, 0.01f, 0.2f)), // near-dup of 0
    (2L, Array(0.0f, 1.0f, 0.0f)),
    (3L, Array(-1.0f, 0.0f, -0.2f)), // antipodal of 0 (dot < 0 → excluded)
    (4L, Array(1.0f, 0.0f, 0.2f))) // exact dup of 0
    .toDF("vec_id", "embedding")

  test("embeddingSimilarPairs finds exactly the high-cosine pairs") {
    val pairs = Dedup.embeddingSimilarPairs(vecs, "vec_id", "embedding", 95, 100)
      .as[(Long, Long)].collect().toSet
    assert(pairs == Set((0L, 1L), (0L, 4L), (1L, 4L)))
  }

  test("antipodal vectors are never similar (dot <= 0 guard)") {
    val pairs = Dedup.embeddingSimilarPairs(vecs, "vec_id", "embedding", 1, 100)
      .as[(Long, Long)].collect().toSet
    assert(!pairs.exists(p => p == ((0L, 3L)) || p == ((3L, 4L))))
  }

  test("LSH-bucketed variant finds exact dups and stays a subset of brute force") {
    val brute = Dedup.embeddingSimilarPairs(vecs, "vec_id", "embedding", 95, 100)
      .as[(Long, Long)].collect().toSet
    val lsh = Dedup.embeddingSimilarPairsLsh(vecs, "vec_id", "embedding", 95, 100)
      .as[(Long, Long)].collect().toSet
    assert(lsh.subsetOf(brute))
    assert(lsh.contains((0L, 4L))) // identical vectors always share every bucket
  }

  test("multi-table LSH lifts recall over single-table at precision 1") {
    // deterministic planted corpus: 60 random unit vectors + 30 high-cosine
    // pairs (unit vector + small perturbation, cos ≈ 0.97-0.99)
    val rnd = new scala.util.Random(7)
    def unit(dim: Int): Array[Float] = {
      val v = Array.fill(dim)(rnd.nextGaussian().toFloat)
      val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
      v.map(_ / n)
    }
    val dim = 16
    val noise = (0 until 60).map(i => (i.toLong, unit(dim)))
    val planted = (0 until 30).flatMap { i =>
      val a = unit(dim)
      val e = unit(dim)
      val b = a.zip(e).map { case (x, p) => x + 0.15f * p }
      Seq((1000L + 2 * i, a), (1001L + 2 * i, b))
    }
    val vecs = (noise ++ planted).toDF("vec_id", "embedding")

    val brute = Dedup.embeddingSimilarPairs(vecs, "vec_id", "embedding", 90, 100)
      .as[(Long, Long)].collect().toSet
    val single = Dedup.embeddingSimilarPairsLsh(vecs, "vec_id", "embedding", 90, 100,
      nPlanes = 8).as[(Long, Long)].collect().toSet
    val multi = Dedup.embeddingSimilarPairsMultiLsh(vecs, "vec_id", "embedding", 90, 100,
      nTables = 8, nPlanes = 8).as[(Long, Long)].collect().toSet

    assert(brute.size >= 20) // the plant worked
    assert(multi.subsetOf(brute)) // precision 1: exact verify after candidates
    // multi's table 0 uses the same plane range as the single bucketing,
    // so single candidates are a strict floor for multi
    assert(single.subsetOf(multi))
    assert(multi.size > single.size, s"multi=${multi.size} single=${single.size}")
    assert(multi.size.toDouble / brute.size >= 0.9,
      s"recall ${multi.size.toDouble / brute.size}")
  }

  test("LSH bucket cap bounds identical-vector floods (round 11)") {
    // 60 identical vectors collapse to ONE sign bucket in every plane set
    // (and every table of the multi variant): 60·59/2 = 1770 quadratic
    // pairs the cap must bound, while the small-bucket exact dup survives
    val flood = (100L until 160L).map(i => (i, Array(0.5f, 0.5f, 0.5f)))
    val adv = (flood ++ Seq(
      (0L, Array(1.0f, 0.0f, 0.2f)), (4L, Array(1.0f, 0.0f, 0.2f))))
      .toDF("vec_id", "embedding")

    val un = Dedup.embeddingSimilarPairsLsh(adv, "vec_id", "embedding", 95, 100,
      maxBucketSize = None).count()
    assert(un >= 1770L, s"uncapped must see the flood, got $un")
    val capped = Dedup.embeddingSimilarPairsLsh(adv, "vec_id", "embedding", 95, 100,
      maxBucketSize = Some(50L)).as[(Long, Long)].collect().toSet
    assert(capped == Set((0L, 4L)), s"got $capped")
    val cappedMulti = Dedup.embeddingSimilarPairsMultiLsh(adv, "vec_id", "embedding",
      95, 100, maxBucketSize = Some(50L)).as[(Long, Long)].collect().toSet
    assert(cappedMulti == Set((0L, 4L)), s"got $cappedMulti")

    // audit surface: the flooded bucket is visible with its size
    val over = Dedup.oversizedBuckets(
      Similarity.lshBuckets(adv, "vec_id", "embedding", 8, 42),
      Seq("bucket"), 50L).collect()
    assert(over.nonEmpty && over.forall(_.getLong(1) == 60L))
  }

  test("cosine filter survives non-unit norms past the Long envelope (r11 review)") {
    // norm ≈ 17 vectors: quantized nrm ≈ 3·10⁸, so na·nb·num² ≈ 9·10²⁰
    // overflowed Long (ANSI crash / silent wrap) before the decimal filter
    val big = Array.fill(3)(10.0f)
    val bigDup = Array.fill(3)(10.0f)
    val other = Array(-10.0f, 10.0f, 0.0f)
    val vecs = Seq((0L, big), (1L, bigDup), (2L, other)).toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingSimilarPairs(vecs, "vec_id", "embedding", 99, 100)
      .as[(Long, Long)].collect().toSet
    assert(pairs == Set((0L, 1L)), s"got $pairs")
    val lsh = Dedup.embeddingSimilarPairsMultiLsh(vecs, "vec_id", "embedding", 99, 100)
      .as[(Long, Long)].collect().toSet
    assert(lsh == Set((0L, 1L)), s"got $lsh")
  }
}

class SimilaritySpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f), 0),
    (1L, Array(0.9f, 0.1f, 0.0f), 0),
    (2L, Array(0.0f, 1.0f, 0.0f), 1),
    (3L, Array(0.0f, 0.9f, 0.1f), 1),
    (4L, Array(-1.0f, 0.0f, 0.0f), 2)).toDF("vec_id", "embedding", "label")

  test("brute-force top-k ranks by quantized dot product, query first") {
    val top = Similarity.bruteForceTopK(vecs, "vec_id", "embedding", queryId = 0, k = 3)
      .as[(Long, Long)].collect()
    assert(top.map(_._1).toSeq == Seq(0L, 1L, 2L))
    assert(top.head._2 == 1000L * 1000L) // <q,q> at ×1000 quantization
  }

  test("IVF probes the nearest clusters and finds the true neighbors") {
    val top = Similarity.ivfTopK(vecs, "vec_id", "embedding", "label",
      queryId = 0, k = 2, nProbe = 1)
      .as[(Long, Long)].collect()
    assert(top.map(_._1).toSeq == Seq(0L, 1L)) // cluster 0 only
  }

  test("full-probe IVF equals brute force exactly on real embeddings (q30 invariant)") {
    // the testdata labels are NOT cosine clusters (q30's documented reason
    // for staying rows-only), but probing EVERY cluster must reduce IVF to
    // exact search — same results, same order, same dot values
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val full = Similarity.ivfTopK(emb, "vec_id", "embedding", "label",
      queryId = 0, k = 10, nProbe = 10).as[(Long, Long)].collect().toSeq
    val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
      queryId = 0, k = 10).as[(Long, Long)].collect().toSeq
    assert(full == brute)
    // a partial probe returns rows only from the probed clusters
    val labelOf = emb.select(col("vec_id"), col("label"))
      .as[(Long, Int)].collect().toMap
    val partial = Similarity.ivfTopK(emb, "vec_id", "embedding", "label",
      queryId = 0, k = 10, nProbe = 2).as[(Long, Long)].collect().toSeq
    assert(partial.size == 10)
    assert(partial.map(p => labelOf(p._1)).toSet.size <= 2)
  }

  test("ivfTopK with persisted centroids equals the inline-computed path") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    // "persist" the centroid table once (round-trips through parquet as a
    // real serving path would), then query against it
    val centDir = java.nio.file.Files.createTempDirectory("graft-ivf-cent-").toString
    Similarity.centroids(emb, "embedding", "label")
      .write.mode("overwrite").parquet(centDir)
    val cents = spark.read.parquet(centDir)
    val served = Similarity.ivfTopK(emb, "vec_id", "embedding", "label",
      cents, queryId = 0, k = 10, nProbe = 10).as[(Long, Long)].collect().toSeq
    val inline = Similarity.ivfTopK(emb, "vec_id", "embedding", "label",
      queryId = 0, k = 10, nProbe = 10).as[(Long, Long)].collect().toSeq
    assert(served == inline)
  }

  test("kmeans quantizer recovers separated clusters; auto-IVF matches brute force") {
    import spark.implicits._
    // two tight, well-separated clusters
    val pts = (0 until 10).map(i => (i.toLong, Array(1.0f + i * 0.01f, 0.0f, 0.0f))) ++
      (10 until 20).map(i => (i.toLong, Array(0.0f, 1.0f + (i - 10) * 0.01f, 0.0f)))
    val df = pts.toDF("vec_id", "embedding")
    val assign = Similarity.kmeansAssign(df, "vec_id", "embedding", k = 2, iters = 4)
      .as[(Long, Int)].collect().toMap
    val c0 = (0L until 10L).map(assign)
    val c1 = (10L until 20L).map(assign)
    assert(c0.toSet.size == 1 && c1.toSet.size == 1 && c0.head != c1.head)

    val auto = Similarity.ivfTopKAuto(df, "vec_id", "embedding",
      queryId = 0, k = 5, nClusters = 2, nProbe = 1)
      .as[(Long, Long)].collect().map(_._1).toSeq
    val brute = Similarity.bruteForceTopK(df, "vec_id", "embedding", 0, 5)
      .as[(Long, Long)].collect().map(_._1).toSeq
    assert(auto == brute) // probed cluster contains all true neighbors here
  }

  test("kmeansAssign plan size stays flat as iters grows (lineage truncated per round)") {
    // Regression (r6 verdict #4): without per-iteration localCheckpoint the
    // returned plan nested every Lloyd round's full plan — iters=25 blew up
    // analysis time/plan size. Truncated, the assignment reads one
    // materialized k-row relation regardless of iters.
    import spark.implicits._
    val pts = (0 until 30).map(i =>
      (i.toLong, Array((i % 3).toFloat, (i % 5).toFloat, 1.0f)))
    val df = pts.toDF("vec_id", "embedding")
    def planNodes(d: org.apache.spark.sql.DataFrame): Int =
      d.queryExecution.analyzed.collect { case n => n }.size
    val a2 = Similarity.kmeansAssign(df, "vec_id", "embedding", k = 3, iters = 2)
    val a25 = Similarity.kmeansAssign(df, "vec_id", "embedding", k = 3, iters = 25)
    assert(planNodes(a25) == planNodes(a2),
      s"plan grew with iters: ${planNodes(a2)} -> ${planNodes(a25)}")
    // and it still assigns every vector exactly once
    assert(a25.count() == 30)
    assert(a25.select("vec_id").distinct().count() == 30)
  }

  test("LSH buckets are deterministic and collide for near-identical vectors") {
    val b = Similarity.lshBuckets(vecs, "vec_id", "embedding", nPlanes = 8)
      .select("vec_id", "bucket").as[(Long, Long)].collect().toMap
    assert(b(0L) == b(1L)) // nearly colinear → same sign pattern
    assert(b(0L) != b(4L)) // antipodal → all signs flip
  }
}

class TextAnalysisSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the cat and the hat"),
    (2L, "unique words only here")).toDF("doc_id", "text")

  test("redactPii replaces emails, ips, phones with typed placeholders + counts") {
    val rows = Seq(
      (1L, "write to alice.smith+x@sub.example.co.uk or 192.168.1.200 now"),
      (2L, "call 415-555-1234 and 650-555-0000 twice"),
      (3L, "clean text with no pii at all")).toDF("doc_id", "text")
    val out = TextAnalysis.redactPii(rows, "text", "doc_id")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out(1L) == (("write to <EMAIL> or <IP> now", 1L, 1L, 0L)))
    assert(out(2L) == (("call <PHONE> and <PHONE> twice", 0L, 0L, 2L)))
    assert(out(3L) == (("clean text with no pii at all", 0L, 0L, 0L)))
  }

  test("tokenStats counts tokens, distincts, chars") {
    val m = TextAnalysis.tokenStats(docs, "text", "doc_id")
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
    assert(m(1L) == ((5L, 4L, 15L, 3L))) // the cat and the hat
    assert(m(2L) == ((4L, 4L, 19L, 6L)))
  }

  test("qualityScore micro-units are exact integer division") {
    val m = TextAnalysis.qualityScore(docs, "text", "doc_id")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(m(1L)._1 == 200000L) // 1 repeated of 5 tokens = 0.2
    assert(m(1L)._2 == 3000000L) // mean token len 3.0
  }

  test("languageId picks the language with most marker hits") {
    val d = Seq(
      (1L, "el perro y la casa de los amigos"),
      (2L, "the dog and a house of friends"),
      (3L, "der hund und die katze nicht hier")).toDF("doc_id", "text")
    val m = TextAnalysis.languageId(d, "text", "doc_id")
      .as[(Long, String)].collect().toMap
    assert(m(1L) == "es" && m(2L) == "en" && m(3L) == "de")
  }

  test("languageId: single-profile maps work; zero scores → NULL by default, last-language tiebreak at minScore=0 (r12)") {
    val d = Seq((1L, "the dog"), (2L, "zzz qqq")).toDF("doc_id", "text")
    // one profile: greatest() needs 2+ args — must be a plain projection
    val single = TextAnalysis.languageId(d, "text", "doc_id",
      profiles = Map("en" -> Seq("the"))).as[(Long, Option[String])].collect().toMap
    assert(single(1L).contains("en") && single(2L).isEmpty)
    // default minScore=1: text matching no profile honestly predicts NULL
    val m = TextAnalysis.languageId(d, "text", "doc_id")
      .as[(Long, Option[String])].collect().toMap
    assert(m(1L).contains("en") && m(2L).isEmpty)
    // minScore=0 forces a prediction; all-zero ties resolve to the
    // lexicographically LAST language (the documented struct-max tiebreak)
    val forced = TextAnalysis.languageId(d, "text", "doc_id", minScore = 0)
      .as[(Long, String)].collect().toMap
    assert(forced(2L) == "fr")
    intercept[IllegalArgumentException](
      TextAnalysis.languageId(d, "text", "doc_id", profiles = Map.empty))
  }

  test("fingerprint is deterministic and content-sensitive") {
    val f1 = TextAnalysis.fingerprint(docs, "text", "doc_id").as[(Long, Long)].collect().toMap
    val f2 = TextAnalysis.fingerprint(docs, "text", "doc_id").as[(Long, Long)].collect().toMap
    assert(f1 == f2)
    assert(f1(1L) != f1(2L))
    assert(f1.values.forall(v => v >= 0 && v < 1000000007L))
  }
}

class MultiModalSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("extractMetadata decodes batched binary payloads with typed schema") {
    val df = Seq((1L, Array[Byte](10, 20, 30, 40, 50)), (2L, Array[Byte](0)))
      .toDF("id", "payload")
    val out = MultiModal.extractMetadata(df, "payload").orderBy("id").collect()
    assert(out.map(_.schema.fieldNames.toSeq).head == Seq("id", "width", "height", "n_bytes", "checksum"))
    val r1 = out.head
    assert(r1.getAs[Int]("width") == 11 && r1.getAs[Int]("height") == 21)
    assert(r1.getAs[Long]("n_bytes") == 5)
    val r2 = out(1)
    assert(r2.getAs[Int]("width") == 1 && r2.getAs[Int]("height") == 0) // 1-byte payload: no height byte
  }

  test("null payloads decode to empty metadata instead of crashing") {
    val df = Seq((1L, Option.empty[Array[Byte]])).toDF("id", "payload")
    val out = MultiModal.extractMetadata(df, "payload").collect()
    assert(out.head.getAs[Long]("n_bytes") == 0)
  }

  test("sampleSlices explodes each payload into n bounded slices") {
    val df = Seq((1L, "abcdefgh".getBytes)).toDF("id", "payload")
    val out = MultiModal.sampleSlices(df, "payload", "id", n = 4)
      .orderBy("slice_idx").collect()
    assert(out.length == 4)
    assert(out.map(r => new String(r.getAs[Array[Byte]]("payload"))).toSeq ==
      Seq("ab", "cd", "ef", "gh"))
  }

  import MultiModal.{MediaSniffer, MediaSynth}

  test("MediaSniffer reads PNG IHDR / JPEG SOF / WAV fmt from real layouts") {
    val p = MediaSniffer.sniff(MediaSynth.png(640, 480))
    assert(p == MediaSniffer.Meta("png", Some(640), Some(480), None, None, None,
      MediaSynth.PngBytes.toLong, valid = true))
    val j = MediaSniffer.sniff(MediaSynth.jpeg(1920, 1080))
    assert(j == MediaSniffer.Meta("jpeg", Some(1920), Some(1080), None, None, None,
      MediaSynth.JpegBytes.toLong, valid = true))
    val w = MediaSniffer.sniff(MediaSynth.wav(44100, 2, 16))
    assert(w == MediaSniffer.Meta("wav", None, None, Some(44100), Some(2), Some(16),
      MediaSynth.WavBytes.toLong, valid = true))
  }

  test("MediaSniffer survives corrupt and truncated payloads honestly") {
    // truncated PNG: signature intact, IHDR gone → png but invalid
    val t12 = MediaSniffer.sniff(java.util.Arrays.copyOf(MediaSynth.png(9, 9), 12))
    assert(t12.format == "png" && !t12.valid && t12.width.isEmpty && t12.nBytes == 12)
    // under 8 bytes the signature itself is gone → unknown
    assert(MediaSniffer.sniff(java.util.Arrays.copyOf(MediaSynth.png(9, 9), 5))
      .format == "unknown")
    // JPEG with SOI+EOI but no frame header → jpeg, invalid
    val noSof = MediaSniffer.sniff(Array(0xff, 0xd8, 0xff, 0xd9).map(_.toByte))
    assert(noSof.format == "jpeg" && !noSof.valid)
    // JPEG truncated mid-SOF-segment → invalid, no crash
    val jt = MediaSniffer.sniff(java.util.Arrays.copyOf(MediaSynth.jpeg(5, 5), 26))
    assert(jt.format == "jpeg" && !jt.valid)
    // WAV with a junk chunk before fmt still finds it (word-aligned walk)
    val pre = "RIFF".getBytes ++ Array[Byte](0, 0, 0, 0) ++ "WAVE".getBytes ++
      "junk".getBytes ++ Array[Byte](3, 0, 0, 0) ++ Array[Byte](1, 2, 3, 0) ++
      MediaSynth.wav(8000, 1, 8).drop(12)
    val wv = MediaSniffer.sniff(pre)
    assert(wv.format == "wav" && wv.valid && wv.sampleRate.contains(8000) &&
      wv.channels.contains(1) && wv.bitsPerSample.contains(8))
    // WAV whose fmt chunk never appears → wav, invalid
    val noFmt = MediaSniffer.sniff("RIFF".getBytes ++ Array[Byte](0, 0, 0, 0) ++
      "WAVE".getBytes ++ "data".getBytes ++ Array[Byte](0, 0, 0, 0))
    assert(noFmt.format == "wav" && !noFmt.valid)
    // zero-dim PNG header parses but is flagged corrupt
    assert(!MediaSniffer.sniff(MediaSynth.png(0, 7)).valid)
    // garbage / empty / null
    assert(MediaSniffer.sniff("hello world".getBytes).format == "unknown")
    assert(MediaSniffer.sniff(Array.emptyByteArray).format == "unknown")
    assert(MediaSniffer.sniff(null).format == "unknown")
  }

  test("MediaSniffer only examines the head — metadata past the window is not required") {
    // a big payload with a valid PNG head sniffs fine (window is a parse
    // bound, not a copy)
    val big = MediaSynth.png(33, 44) ++ Array.fill[Byte](100000)(0x5a)
    val m = MediaSniffer.sniff(big)
    assert(m.valid && m.width.contains(33) && m.nBytes == big.length.toLong)
  }

  test("JPEG with an EXIF-sized APP1 before SOF sniffs valid (r12: 1 KB window)") {
    // real photos carry 10-64 KB EXIF APP1 segments before the frame
    // header; the old 1 KB window declared every such JPEG invalid
    val base = MediaSynth.jpeg(800, 600)
    val exifLen = 12000
    val app1 = Array[Byte](0xff.toByte, 0xe1.toByte,
      ((exifLen + 2) >> 8).toByte, ((exifLen + 2) & 0xff).toByte) ++
      Array.fill[Byte](exifLen)(0x11)
    // splice APP1 right after SOI (ff d8)
    val withExif = base.take(2) ++ app1 ++ base.drop(2)
    val m = MediaSniffer.sniff(withExif)
    assert(m.valid && m.width.contains(800) && m.height.contains(600),
      s"EXIF-bearing JPEG must sniff its SOF dims, got $m")
    // a SOF beyond the 64 KiB window still degrades honestly
    val hugeLen = 65000
    val appHuge = Array[Byte](0xff.toByte, 0xe1.toByte,
      ((hugeLen + 2) >> 8).toByte, ((hugeLen + 2) & 0xff).toByte) ++
      Array.fill[Byte](hugeLen)(0x11)
    val beyond = base.take(2) ++ appHuge ++ appHuge ++ base.drop(2)
    val mb = MediaSniffer.sniff(beyond)
    assert(mb.format == "jpeg" && !mb.valid,
      s"SOF past the window must degrade to valid=false, got $mb")
  }

  test("sniffMetadata attaches typed columns and drops the payload; synth attach is deterministic") {
    val ids = Seq(0L, 1L, 2L, 3L, 7L, 11L).toDF("doc_id")
    val out = MultiModal.sniffMetadata(MediaSynth.attach(ids, "doc_id"), "payload")
      .orderBy("doc_id").collect()
    assert(out.head.schema.fieldNames.toSeq == Seq("doc_id", "format", "width",
      "height", "sample_rate", "channels", "bits_per_sample", "n_bytes", "valid"))
    val byId = out.map(r => r.getLong(0) -> r).toMap
    assert(byId(0L).getString(1) == "png" && byId(0L).getInt(2) == 1 &&
      byId(0L).getInt(8) == 1)
    assert(byId(1L).getString(1) == "jpeg" && byId(1L).getInt(2) == 2)
    assert(byId(2L).getString(1) == "wav" && byId(2L).getInt(4) == 16000 &&
      byId(2L).getInt(5) == 1)
    // corrupt rows: 3 % 20 = 3 < 8 → unknown; 7 → unknown; 11 ≥ 8 → png invalid
    assert(byId(3L).getString(1) == "unknown" && byId(3L).getInt(8) == 0)
    assert(byId(11L).getString(1) == "png" && byId(11L).getInt(8) == 0 &&
      byId(11L).isNullAt(2))
  }
}
