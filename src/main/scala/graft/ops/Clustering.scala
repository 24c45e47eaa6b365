package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Graph clustering for dedup pipelines: near-dup pair lists (from
  * [[Dedup]]'s MinHash/SimHash/Jaccard/embedding generators) are edges; the
  * unit of deduplication is the *connected component* (A~B, B~C ⇒ A,B,C are
  * one document family even when A~C was never emitted), and the curation
  * step keeps one survivor per family.
  *
  * Scale shape: min-label propagation, one hop per round — each round is a
  * shuffle-join of the (symmetrized) edge list against the current labels
  * plus a map-side-combined min-aggregate; rounds = component diameter.
  * Near-dup families are dense (LSH emits most intra-family pairs), so
  * diameters are small single digits in practice; `maxIterations` bounds the
  * pathological chain. Lineage is truncated every round (eager
  * `localCheckpoint`), or iterative plans would grow exponentially.
  * Convergence is detected by the monotone label sum (labels only ever
  * decrease), costing one aggregate instead of a self-join per round.
  */
object Clustering {

  private def isIntegral(t: org.apache.spark.sql.types.DataType): Boolean = t match {
    case org.apache.spark.sql.types.ByteType | org.apache.spark.sql.types.ShortType |
         org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType => true
    case _ => false
  }

  /** Connected components of the undirected graph given by `pairs`.
    * Returns `(id, comp)` for every node appearing in `pairs`, where `comp`
    * is the component's minimum node id under the id type's ordering.
    * Integral ids widen to long and converge on the monotone label sum (one
    * aggregate per round); any other id type (string doc ids, …) keeps its
    * native type and converges on an any-label-changed probe (one
    * label-table join per round) — never a lossy cast. */
  def connectedComponents(pairs: DataFrame,
                          aCol: String = "id_a", bCol: String = "id_b",
                          maxIterations: Int = 50): DataFrame = {
    val aType = pairs.schema(aCol).dataType
    val bType = pairs.schema(bCol).dataType
    val integral = isIntegral(aType) && isIntegral(bType)
    require(integral || aType == bType,
      s"connectedComponents: edge id columns must share a type, got $aType / $bType")
    val edges =
      if (integral)
        pairs.select(col(aCol).cast("long").as("src"), col(bCol).cast("long").as("dst"))
      else pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
    // r17 optimization: near-dup pair sets from a bounded batch (an index
    // refresh window, a gate slice) are routinely a few hundred edges, and
    // the distributed loop's fixed cost — symmetrize + per-round join +
    // convergence probe, each a multi-stage Spark job — dominated the
    // standing-index refresh wall (profiled ~1.3 s per invocation at ~50
    // edges). Under a cap the edge list is collected and labeled by a
    // driver union-find that computes the IDENTICAL per-component min-id
    // labels; past the cap (full-corpus builds at scale) the distributed
    // loop below runs unchanged. The cap-guarded collect mirrors the
    // probeInMax idiom (bounded by construction, never data-sized).
    // The under-cap probe stays a bare limit+collect (CollectLimitExec is
    // incremental — no extra materialization action on the common path);
    // when the probe overflows, the edge frame is checkpointed ONCE so the
    // symmetrize below reads it twice from blocks instead of re-running
    // the (possibly expensive) pair generation per read — the over-cap
    // path now pays probe + one materialization instead of the old probe
    // + two recomputes (r17 advice).
    driverComponents(edges, integral) match {
      case Some(labeled) => return labeled
      case None => ()
    }
    val edgesCk = edges.localCheckpoint(true)
    val sym = edgesCk
      .union(edgesCk.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .localCheckpoint(true)
    dropCheckpoint(edgesCk) // sym's checkpoint is self-contained now

    var labels = sym.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("comp"))
      .localCheckpoint(true)
    def labelSum(df: DataFrame): java.math.BigDecimal = {
      // sum over an EMPTY frame is null — a pair set with no edges (no
      // duplicates found, a perfectly normal pipeline outcome) must
      // converge immediately, not NPE
      val s = df.agg(sum(col("comp").cast("decimal(38,0)"))).head.getDecimal(0)
      if (s == null) java.math.BigDecimal.ZERO else s
    }
    var prevSum = if (integral) labelSum(labels) else null

    var iter = 0
    var converged = false
    while (!converged && iter < maxIterations) {
      iter += 1
      val nbrLabels = sym
        .join(labels.select(col("id").as("dst"), col("comp")), "dst")
        .select(col("src").as("id"), col("comp"))
      val next = labels.union(nbrLabels)
        .groupBy("id").agg(min("comp").as("comp"))
        .localCheckpoint(true)
      if (integral) {
        val s = labelSum(next)
        converged = s.compareTo(prevSum) == 0 // labels only decrease
        prevSum = s
      } else {
        converged = next
          .join(labels.select(col("id"), col("comp").as("__graft_prev")), "id")
          .where(col("comp") =!= col("__graft_prev"))
          .isEmpty
      }
      val superseded = labels
      labels = next
      dropCheckpoint(superseded) // probe above was the last read of it
    }
    dropCheckpoint(sym) // labels' checkpoint is self-contained now
    // truncated propagation = WRONG labels (one duplicate family split
    // into several components, each keeping its own "survivor") — fail
    // loudly instead of silently leaking duplicates through dedup
    if (!converged) throw new IllegalStateException(
      s"connectedComponents did not converge in $maxIterations iterations " +
      "(component diameter exceeds the budget) — raise maxIterations")
    labels
  }

  /** Conf key bounding the driver fast-path: edge sets at or under this
    * many rows are labeled by an in-memory union-find; 0 disables (every
    * call takes the distributed loop). Default 100k edges — ~3 MB of ids
    * on the driver, far under any collect-audit concern. */
  val DriverMaxEdgesKey = "spark.graft.cc.driverMaxEdges"

  /** Driver union-find over a LIMIT-bounded edge collect: returns the same
    * (id, comp = min node id of the component) labeling as the distributed
    * min-label loop, or None when the edge set exceeds the cap, carries
    * nulls, or the id type is neither integral nor string (those keep the
    * loop's generality). String minima use UTF-8 byte order
    * ([[graft.delta.StatsPredicate.utf8Compare]]) — the order Spark's
    * `min` aggregate and the oracle's DuckDB `min` both use; a UTF-16
    * comparison would pick a different representative for components whose
    * ids differ in supplementary characters. */
  private def driverComponents(edges: DataFrame,
                               integral: Boolean): Option[DataFrame] = {
    val spark = edges.sparkSession
    val cap = math.min(
      spark.conf.getOption(DriverMaxEdgesKey).map(_.toLong).getOrElse(100000L),
      (Int.MaxValue - 2).toLong)
    if (cap <= 0) return None
    val isString =
      edges.schema("src").dataType == org.apache.spark.sql.types.StringType
    if (!integral && !isString) return None
    val rows = edges.limit(cap.toInt + 1).collect()
    if (rows.length > cap) return None
    if (rows.exists(r => r.isNullAt(0) || r.isNullAt(1))) return None

    // union-find with path compression; representative = min id, computed
    // after all unions so the choice is order-independent
    val index = new java.util.HashMap[Any, Integer]()
    val ids = scala.collection.mutable.ArrayBuffer[Any]()
    def idx(v: Any): Int = {
      val cur = index.get(v)
      if (cur == null) { val i = ids.length; index.put(v, Int.box(i)); ids += v; i }
      else cur.intValue
    }
    val parent = scala.collection.mutable.ArrayBuffer[Int]()
    def find(i: Int): Int = {
      var r = i
      while (parent(r) != r) r = parent(r)
      var c = i
      while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    rows.foreach { r =>
      val a = idx(r.get(0)); val b = idx(r.get(1))
      while (parent.length < ids.length) parent += parent.length
      val ra = find(a); val rb = find(b)
      if (ra != rb) parent(rb) = ra
    }
    val lt: (Any, Any) => Boolean =
      if (integral) (x, y) => x.asInstanceOf[Long] < y.asInstanceOf[Long]
      else (x, y) => graft.delta.StatsPredicate.utf8Compare(
        x.asInstanceOf[String], y.asInstanceOf[String]) < 0
    val minOf = new java.util.HashMap[Int, Any]()
    ids.indices.foreach { i =>
      val r = find(i)
      val cur = minOf.get(r)
      if (cur == null || lt(ids(i), cur)) minOf.put(r, ids(i))
    }
    val t = if (integral) org.apache.spark.sql.types.LongType
            else org.apache.spark.sql.types.StringType
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", t),
      org.apache.spark.sql.types.StructField("comp", t)))
    val out = new java.util.ArrayList[org.apache.spark.sql.Row](ids.length)
    ids.indices.foreach { i =>
      out.add(org.apache.spark.sql.Row(ids(i), minOf.get(find(i))))
    }
    Some(spark.createDataFrame(out, schema))
  }

  /** Free a superseded eager-localCheckpoint's pinned blocks NOW instead of
    * waiting for RDD finalization + ContextCleaner (GC-driven — on a large
    * driver heap that can be never): a long-lived session running many
    * clustering jobs would otherwise accumulate every iteration's blocks in
    * the BlockManager. Best-effort: no-ops on non-checkpointed plans. */
  private def dropCheckpoint(df: DataFrame): Unit = CheckpointUtil.drop(df)

  /** One survivor per duplicate family: every document keeps its component
    * (its own id when it appears in no pair), and the first row per
    * component under `preference` — a TOTAL order, e.g.
    * `Seq(length(col("text")).desc, col("doc_id"))` — survives. Returns the
    * surviving rows with the original schema. */
  def survivors(docs: DataFrame, idCol: String, pairs: DataFrame,
                preference: Seq[Column],
                aCol: String = "id_a", bCol: String = "id_b"): DataFrame = {
    // Components key on the DOC id type: a string doc id must never take the
    // old `cast(id as long)` path, where every non-numeric id became null and
    // collapsed into one component (one survivor for the whole corpus).
    val idType = docs.schema(idCol).dataType
    val comps = connectedComponents(pairs, aCol, bCol)
      .select(col("id").cast(idType).as("__graft_cid"),
        col("comp").cast(idType).as("__graft_pcomp"))
    val joined = docs.join(comps, docs(idCol) === col("__graft_cid"), "left")
      .withColumn("__graft_comp", coalesce(col("__graft_pcomp"), docs(idCol)))
      .drop("__graft_cid", "__graft_pcomp")
    val w = Window.partitionBy(col("__graft_comp")).orderBy(preference: _*)
    joined.withColumn("__graft_rn", row_number().over(w))
      .filter(col("__graft_rn") === 1)
      .drop("__graft_comp", "__graft_rn")
  }
}
