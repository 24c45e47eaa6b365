package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The standing dedup index's r16/r17 fold shapes: survivors comp-probes,
  * raced twins, over-cap fallbacks, overwrite-shaped commits, dead-row
  * compaction, UPDATE-window folds and the maintain autopilot. Split out
  * of [[DedupIndexSpec]] in r18 so the two halves run as parallel forked
  * test groups; every test preserved verbatim. */
class DedupIndexFoldSpec extends AnyFunSuite with DedupIndexFixtures {
  import spark.implicits._

  test("r15 second review: create→delete→re-create in ONE window folds; live divergence still refuses") {
    val r = root("cdr")
    val src = s"$r/source"
    graft.delta.GraftWriter.write(slice(corpus, 0, 100), src,
      configuration = Some(Map("delta.enableChangeDataFeed" -> "true")))
    DedupIndex.buildFromSource(spark, src, "text", "doc_id", s"$r/idx",
      numHashes = 64, bands = 64)
    // ONE window: doc 900 created with one text, deleted, re-created with
    // a DIFFERENT text (a near-dup of family {1,101}) — the sanctioned
    // replacement shape; the old unsegmented divergent-text count refused
    // it and permanently wedged the index
    graft.delta.GraftWriter.write(
      Seq((900L, words(55, 0, 12))).toDF("doc_id", "text"), src, SaveMode.Append)
    graft.delta.Dml.delete(spark, src, col("doc_id") === 900L)
    graft.delta.GraftWriter.write(
      Seq((900L, words(7, 0, 24) + " tailnine")).toDF("doc_id", "text"),
      src, SaveMode.Append)
    val (n, _) = DedupIndex.refreshFromSource(spark, s"$r/idx")
    assert(n == 1, s"the re-created doc must index, got $n")
    val m = DedupIndex.members(spark, s"$r/idx")
      .filter(col("id") === 900L).select("comp", "len")
      .as[(Long, Long)].collect().toSeq
    assert(m == Seq((1L, (words(7, 0, 24) + " tailnine").length.toLong)),
      s"900 must join family 1 under its FINAL text, got $m")
    // two divergent LIVE inserts (no delete between) still refuse
    graft.delta.GraftWriter.write(
      Seq((901L, words(61, 0, 10))).toDF("doc_id", "text"), src, SaveMode.Append)
    graft.delta.GraftWriter.write(
      Seq((901L, words(62, 0, 10))).toDF("doc_id", "text"), src, SaveMode.Append)
    val e = intercept[IllegalArgumentException] {
      DedupIndex.refreshFromSource(spark, s"$r/idx")
    }
    assert(e.getMessage.contains("divergent"))
  }

  test("r15 second review: takedown then re-add with DIFFERENT text re-indexes (resurrection)") {
    val r = root("resurrect")
    val src = s"$r/source"
    graft.delta.GraftWriter.write(slice(corpus, 0, 200), src,
      configuration = Some(Map("delta.enableChangeDataFeed" -> "true")))
    DedupIndex.buildFromSource(spark, src, "text", "doc_id", s"$r/idx",
      numHashes = 64, bands = 64)
    // takedown in one window…
    graft.delta.Dml.delete(spark, src, col("doc_id") === 5L)
    DedupIndex.refreshFromSource(spark, s"$r/idx")
    assert(DedupIndex.members(spark, s"$r/idx")
      .filter(col("id") === 5L).count() == 0, "taken-down doc must not serve")
    // …then a LATER window re-adds the id with entirely different text —
    // the cross-window reuse fence must not fire on a dead id, and the
    // dead row must resurrect with the new length and a fresh family
    val newText = words(7, 0, 24) + " tailfive"
    graft.delta.GraftWriter.write(
      Seq((5L, newText)).toDF("doc_id", "text"), src, SaveMode.Append)
    DedupIndex.refreshFromSource(spark, s"$r/idx")
    val row = DedupIndex.members(spark, s"$r/idx")
      .filter(col("id") === 5L).select("comp", "len")
      .as[(Long, Long)].collect().toSeq
    assert(row == Seq((1L, newText.length.toLong)),
      s"resurrected doc must carry the NEW text's family and len, got $row")
    // and the whole state ≡ a full rebuild over the final corpus
    val rf = root("resfull")
    DedupIndex.buildFromSource(spark, src, "text", "doc_id", s"$rf/idx",
      numHashes = 64, bands = 64)
    assert(dump(DedupIndex.survivors(spark, s"$r/idx")) ==
      dump(DedupIndex.survivors(spark, s"$rf/idx")), "≡ full recompute")
  }

  test("r15 second review: rows newer than a stale fold's clock are immune to its merges") {
    val r = root("stale")
    val src = s"$r/source"
    graft.delta.GraftWriter.write(slice(corpus, 0, 200), src,
      configuration = Some(Map("delta.enableChangeDataFeed" -> "true")))
    DedupIndex.buildFromSource(spark, src, "text", "doc_id", s"$r/idx",
      numHashes = 64, bands = 64)
    graft.delta.GraftWriter.write(slice(corpus, 200, 400), src, SaveMode.Append)
    DedupIndex.refreshFromSource(spark, s"$r/idx")
    val membersPath = s"$r/idx/members"
    val before = DedupIndex.members(spark, s"$r/idx")
      .select("id", "comp", "len").as[(Long, Long, Long)].collect().toSet
    val curAsof = graft.delta.DeltaTable.forPath(spark, membersPath).toDF
      .filter(col("id") === 210L).select("asof").as[Long].head()
    // a STALE laggard's members merge: the exact clause shape
    // refreshFromSource commits, with a window-end clock OLDER than the
    // standing rows — every row it would touch carries a newer asof, so
    // the guarded clauses must no-op per row
    val staleNow = curAsof - 1
    import org.apache.spark.sql.functions.{coalesce => cl}
    graft.delta.Merge.into(spark, membersPath,
        Seq((210L, 9999L, 1L)).toDF("id", "comp", "len"),
        col("t.id") === col("s.id"))
      .whenMatchedUpdate(col("t.asof") <= lit(staleNow),
        Map("comp" -> col("s.comp"),
          "len" -> cl(col("s.len"), col("t.len")),
          "asof" -> lit(staleNow), "dead" -> lit(false)))
      .execute()
    val after = DedupIndex.members(spark, s"$r/idx")
      .select("id", "comp", "len").as[(Long, Long, Long)].collect().toSet
    assert(after == before, "a stale-clocked merge must change nothing")
    // the same merge with the CURRENT clock applies — the guard is the
    // only thing that stopped it
    graft.delta.Merge.into(spark, membersPath,
        Seq((210L, 9999L, 1L)).toDF("id", "comp", "len"),
        col("t.id") === col("s.id"))
      .whenMatchedUpdate(col("t.asof") <= lit(curAsof),
        Map("comp" -> col("s.comp"),
          "len" -> cl(col("s.len"), col("t.len")),
          "asof" -> lit(curAsof), "dead" -> lit(false)))
      .execute()
    assert(DedupIndex.members(spark, s"$r/idx")
      .filter(col("id") === 210L).select("comp").as[Long].head() == 9999L)
  }

  test("r16: a fixed survivors comp-probe reads a bounded file subset while the corpus grows") {
    // the r15 verdict's last standing scan: survivors now clusters by comp
    // at build and rides maintain(), so the refresh's survivors MERGEs
    // prune their detect-scans to O(batch) files like the members merges
    val r = root("survbounded")
    val src = s"$r/source"
    spark.conf.set("spark.graft.dedup.maintainTargetBytes", "2048")
    try {
      def docs(from: Int, until: Int) =
        spark.range(from, until).selectExpr("id AS doc_id",
          "concat_ws(' ', transform(sequence(0, 14), " +
          "i -> concat('u', id, 'x', i))) AS text")
      graft.delta.GraftWriter.write(docs(0, 400), src,
        configuration = Some(Map("delta.enableChangeDataFeed" -> "true")))
      DedupIndex.buildFromSource(spark, src, "text", "doc_id", s"$r/idx",
        numHashes = 16, bands = 4)
      Seq((400, 800), (800, 1200)).foreach { case (a, b) =>
        graft.delta.GraftWriter.write(docs(a, b), src, SaveMode.Append)
        DedupIndex.refreshFromSource(spark, s"$r/idx")
      }
      val survivorsPath = s"$r/idx/survivors"
      val total = graft.delta.DeltaLog.forPath(spark, survivorsPath)
        .update().files.size
      assert(total >= 6, s"layout must produce many files, got $total")
      // the exact probe shape the survivors MERGEs push: a small comp set
      val probe = DedupIndex.prunedScan(spark, survivorsPath, "comp",
        Some(Array[Any](7L, 700L)))
      val read = probe.inputFiles.length
      assert(read < total / 2,
        s"bounded survivors probe must skip most files: read $read of $total")
      // file-level pruning only — the kept files serve every matching row
      assert(probe.filter(col("comp").isin(7L, 700L)).count() == 2)
    } finally spark.conf.unset("spark.graft.dedup.maintainTargetBytes")
  }

  test("r16: a raced twin's destructive buckets fold aborts on the advanced mark") {
    // the equal-clock hole (r16 advice): a twin refresh of the SAME window
    // resumes after the winner's complete fold. For an id deleted and
    // re-created in that window, the twin's buckets MERGE-delete matches
    // the winner's freshly appended band rows with asof == its own `now` —
    // the monotone guard passes, and without the mark precondition the
    // rows would be destroyed with no restore path.
    val r = root("twin")
    val src = s"$r/source"
    graft.delta.GraftWriter.write(slice(corpus, 0, 100), src,
      configuration = Some(Map("delta.enableChangeDataFeed" -> "true")))
    DedupIndex.buildFromSource(spark, src, "text", "doc_id", s"$r/idx",
      numHashes = 64, bands = 64)
    val bucketsPath = s"$r/idx/buckets"
    val last = graft.delta.DeltaLog.forPath(spark, bucketsPath).update()
      .appTransactionVersion(DedupIndex.SourceVersionApp)
    // the window: replace doc 5 (delete + re-insert) — the twin-destroyable shape
    graft.delta.Dml.delete(spark, src, col("doc_id") === 5L)
    graft.delta.GraftWriter.write(Seq((5L, words(95, 0, 20)))
      .toDF("doc_id", "text"), src, SaveMode.Append)
    DedupIndex.refreshFromSource(spark, s"$r/idx") // the WINNER
    val standing = graft.delta.DeltaTable.forPath(spark, bucketsPath).toDF
      .filter(col("id") === 5L)
    val nStanding = standing.count()
    assert(nStanding > 0, "the winner re-created doc 5's band rows")
    // the twin's destructive merge: same source shape (the re-created
    // doc's band rows), same equal-clock guard, STALE mark — must abort
    // BEFORE deleting, not after
    val twinNow = graft.delta.DeltaLog.forPath(spark, src).update().version
    intercept[graft.delta.StaleAppVersionException] {
      graft.delta.Merge.into(spark, bucketsPath,
          standing.select("band_idx", "band_hash", "id"),
          col("t.band_idx") === col("s.band_idx") &&
            col("t.band_hash") === col("s.band_hash") &&
            col("t.id") === col("s.id"))
        .requireAppVersion(DedupIndex.SourceVersionApp, last)
        .whenMatchedDelete(col("t.asof") <= lit(twinNow))
        .execute()
    }
    assert(graft.delta.DeltaTable.forPath(spark, bucketsPath).toDF
      .filter(col("id") === 5L).count() == nStanding,
      "the winner's band rows must survive the twin's abort")
    // a crash REPLAY (mark genuinely still at `last`) keeps working: the
    // delreplay test covers it end-to-end; here just assert the mark shape
    assert(graft.delta.DeltaLog.forPath(spark, bucketsPath).update()
      .appTransactionVersion(DedupIndex.SourceVersionApp) > last)
  }

  test("r16: past probeInMax the window-sized broadcast hints drop (AQE fallback), state still ≡") {
    import org.apache.spark.sql.catalyst.plans.logical.{BROADCAST, Join, LocalRelation, LogicalPlan}
    import org.apache.spark.sql.execution.QueryExecution
    import org.apache.spark.sql.util.QueryExecutionListener
    val offenders = new java.util.concurrent.CopyOnWriteArrayList[String]
    // a hinted-broadcast join whose hinted side derives from a SCAN is a
    // window-sized broadcast; hinted LocalRelations (e.g. the CDF version
    // map) are driver-bounded by construction and exempt
    val l = new QueryExecutionListener {
      private def scanDerived(p: LogicalPlan): Boolean =
        p.collectLeaves().exists(!_.isInstanceOf[LocalRelation])
      private def record(qe: QueryExecution): Unit =
        try qe.optimizedPlan.foreach {
          case j: Join =>
            val lb = j.hint.leftHint.exists(_.strategy.contains(BROADCAST)) &&
              scanDerived(j.left)
            val rb = j.hint.rightHint.exists(_.strategy.contains(BROADCAST)) &&
              scanDerived(j.right)
            if (lb || rb) offenders.add(j.nodeName)
          case _ => ()
        } catch { case _: Throwable => () }
      override def onSuccess(f: String, qe: QueryExecution, d: Long): Unit =
        record(qe)
      override def onFailure(f: String, qe: QueryExecution, e: Exception): Unit =
        record(qe)
    }
    def awaitOffenders(n: Int, what: String): Unit = {
      val deadline = System.currentTimeMillis() + 60000
      while (offenders.size < n && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      assert(offenders.size >= n, s"$what: expected ≥$n hinted joins")
    }
    val r = root("overcap")
    val src = s"$r/source"
    graft.delta.GraftWriter.write(corpus, src,
      configuration = Some(Map("delta.enableChangeDataFeed" -> "true")))
    DedupIndex.buildFromSource(spark, src, "text", "doc_id", s"$r/idx",
      numHashes = 64, bands = 64)
    // over-cap window (insert + delete): cap 0 makes every nonempty
    // probe-key set overflow, so every probe falls back to an unpruned
    // scan AND drops its broadcast hint — a 10M-doc window's key set is
    // GBs, force-feeding it to the driver exactly when the fallback
    // engages is the r15 verdict's second weak finding
    spark.conf.set("spark.graft.dedup.probeInMax", "0")
    spark.listenerManager.register(l)
    try {
      // two deletes from different families keep every derived set ≥ 1 row
      graft.delta.Dml.delete(spark, src, col("doc_id").isin(210L, 301L))
      graft.delta.GraftWriter.write(
        Seq((900L, words(7, 0, 24) + " tailnine"), (905L, words(905, 0, 15)))
          .toDF("doc_id", "text"), src, SaveMode.Append)
      DedupIndex.refreshFromSource(spark, s"$r/idx")
      // flush the async listener bus with a deliberately hinted sentinel
      // (FIFO bus: once the sentinel lands, everything before it has)
      val m = graft.delta.DeltaTable.forPath(spark, s"$r/idx/members").toDF
      m.join(broadcast(m.select(col("id"))), Seq("id")).count()
      awaitOffenders(1, "sentinel")
      assert(offenders.size == 1,
        s"over-cap refresh must hint NO scan-derived broadcast, saw " +
        s"${offenders.size - 1} before the sentinel")
    } finally {
      spark.listenerManager.unregister(l)
      spark.conf.unset("spark.graft.dedup.probeInMax")
    }
    // fallback-path state ≡ a full recompute over the final corpus
    val rf = root("overcapfull")
    DedupIndex.buildFromSource(spark, src, "text", "doc_id", s"$rf/idx",
      numHashes = 64, bands = 64)
    assert(dump(DedupIndex.survivors(spark, s"$r/idx")) ==
      dump(DedupIndex.survivors(spark, s"$rf/idx")), "≡ full recompute")
    // positive control: the SAME window shape under the default cap DOES
    // hint its probes (proving the listener would have seen offenders)
    offenders.clear()
    spark.listenerManager.register(l)
    try {
      graft.delta.GraftWriter.write(
        Seq((910L, words(910, 0, 15))).toDF("doc_id", "text"),
        src, SaveMode.Append)
      DedupIndex.refreshFromSource(spark, s"$r/idx")
      awaitOffenders(1, "under-cap refresh must hint its probes")
    } finally spark.listenerManager.unregister(l)
  }

  test("r16 advice: an overwrite-shaped commit (delete + insert at one version) folds; divergent texts refuse") {
    val r = root("samecommit")
    val src = s"$r/source"
    graft.delta.GraftWriter.write(slice(corpus, 0, 100), src,
      configuration = Some(Map("delta.enableChangeDataFeed" -> "true")))
    DedupIndex.buildFromSource(spark, src, "text", "doc_id", s"$r/idx",
      numHashes = 64, bands = 64)
    // ONE commit carrying DELETE(5) + INSERT(5, new text): a MERGE keyed
    // off a side column lands both change rows at one commit version —
    // the overwrite shape. A single re-insert text folds deterministically
    // as a replacement (insert > delete in the struct-max at equal cver).
    val newText = words(7, 0, 24) + " tailfive"
    graft.delta.Merge.into(spark, src,
        Seq((5L, Option.empty[Long], Option.empty[String]),
          (-1L, Some(5L), Some(newText))).toDF("del_id", "new_id", "new_text"),
        col("t.doc_id") === col("s.del_id"))
      .whenMatchedDelete()
      .whenNotMatchedInsert(col("s.new_id").isNotNull,
        Map("doc_id" -> col("s.new_id"), "text" -> col("s.new_text")))
      .execute()
    DedupIndex.refreshFromSource(spark, s"$r/idx")
    val m = DedupIndex.members(spark, s"$r/idx")
      .filter(col("id") === 5L).select("comp", "len")
      .as[(Long, Long)].collect().toSeq
    assert(m == Seq((1L, newText.length.toLong)),
      s"the replacement must fold under the NEW text, got $m")
    val rf = root("samecommitfull")
    DedupIndex.buildFromSource(spark, src, "text", "doc_id", s"$rf/idx",
      numHashes = 64, bands = 64)
    assert(dump(DedupIndex.survivors(spark, s"$r/idx")) ==
      dump(DedupIndex.survivors(spark, s"$rf/idx")), "≡ full recompute")
    // TWO divergent insert texts sharing the delete's commit: the final
    // event is ambiguous (struct-max would pick one lexically) — the old
    // live-segmentation classified both as superseded and folded silently
    // (r16 advice); must refuse loudly instead
    graft.delta.Merge.into(spark, src,
        Seq((6L, Option.empty[Long], Option.empty[String]),
          (-1L, Some(6L), Some(words(71, 0, 10))),
          (-2L, Some(6L), Some(words(72, 0, 10))))
          .toDF("del_id", "new_id", "new_text"),
        col("t.doc_id") === col("s.del_id"))
      .whenMatchedDelete()
      .whenNotMatchedInsert(col("s.new_id").isNotNull,
        Map("doc_id" -> col("s.new_id"), "text" -> col("s.new_text")))
      .execute()
    val e = intercept[IllegalArgumentException] {
      DedupIndex.refreshFromSource(spark, s"$r/idx")
    }
    assert(e.getMessage.contains("delete plus more than one distinct insert"))
  }

  test("r16: compactDead reclaims takedown guard rows; a post-compaction laggard still aborts on the mark") {
    val r = root("compact")
    val src = s"$r/source"
    graft.delta.GraftWriter.write(corpus, src,
      configuration = Some(Map("delta.enableChangeDataFeed" -> "true")))
    DedupIndex.buildFromSource(spark, src, "text", "doc_id", s"$r/idx",
      numHashes = 64, bands = 64)
    val membersPath = s"$r/idx/members"
    def deadRows() = graft.delta.DeltaTable.forPath(spark, membersPath)
      .toDF.filter(col("dead")).count() +
      graft.delta.DeltaTable.forPath(spark, s"$r/idx/survivors")
        .toDF.filter(col("dead")).count()
    // sustained takedowns: three waves, each its own window — dead rows
    // accumulate (the r15 behavior kept them forever)
    val memberMarkBefore = graft.delta.DeltaLog.forPath(spark, membersPath)
      .update().appTransactionVersion(DedupIndex.SourceVersionApp)
    Seq(Seq(5L, 6L), Seq(105L, 106L), Seq(205L, 206L)).foreach { ids =>
      graft.delta.Dml.delete(spark, src,
        col("doc_id").isin(ids.map(Long.box): _*))
      DedupIndex.refreshFromSource(spark, s"$r/idx")
    }
    assert(deadRows() >= 6, s"takedowns must accumulate dead rows, got ${deadRows()}")
    // the fold merges advanced the per-table CAS mark — the laggard guard
    // compaction relies on
    val memberMark = graft.delta.DeltaLog.forPath(spark, membersPath)
      .update().appTransactionVersion(DedupIndex.SourceVersionApp)
    assert(memberMark > memberMarkBefore, "fold merges must advance the mark")
    val reclaimed = DedupIndex.compactDead(spark, s"$r/idx")
    assert(reclaimed >= 6, s"compaction must reclaim the dead rows, got $reclaimed")
    assert(deadRows() == 0, "no dead row may survive a horizon-0 compaction")
    // live state is untouched: ≡ a full recompute over the final corpus
    val rf = root("compactfull")
    DedupIndex.buildFromSource(spark, src, "text", "doc_id", s"$rf/idx",
      numHashes = 64, bands = 64)
    assert(dump(DedupIndex.survivors(spark, s"$r/idx")) ==
      dump(DedupIndex.survivors(spark, s"$rf/idx")), "≡ full recompute")
    // the resurrection hole is CLOSED by the mark, not the dead rows: a
    // stale laggard's members merge (the exact insert-fold shape, carrying
    // a pre-takedown mark) aborts BEFORE its not-matched-insert re-creates
    // a taken-down doc
    intercept[graft.delta.StaleAppVersionException] {
      graft.delta.Merge.into(spark, membersPath,
          Seq((5L, 5L, 100L)).toDF("id", "comp", "len"),
          col("t.id") === col("s.id"))
        .requireAppVersion(DedupIndex.SourceVersionApp, memberMarkBefore,
          memberMarkBefore + 1)
        .whenMatchedUpdate(col("t.asof") <= lit(memberMarkBefore),
          Map("comp" -> col("s.comp"), "asof" -> lit(memberMarkBefore),
            "dead" -> lit(false)))
        .whenNotMatchedInsert(Map("id" -> col("s.id"),
          "comp" -> col("s.comp"), "len" -> col("s.len"),
          "asof" -> lit(memberMarkBefore), "dead" -> lit(false)))
        .execute()
    }
    assert(DedupIndex.members(spark, s"$r/idx")
      .filter(col("id") === 5L).count() == 0,
      "the taken-down doc must stay gone after the laggard's abort")
    // a LEGITIMATE later re-add of a compacted id folds as a fresh insert
    graft.delta.GraftWriter.write(Seq((5L, words(95, 0, 20)))
      .toDF("doc_id", "text"), src, SaveMode.Append)
    DedupIndex.refreshFromSource(spark, s"$r/idx")
    assert(DedupIndex.members(spark, s"$r/idx")
      .filter(col("id") === 5L).count() == 1)
  }

  test("r16 review: a commit-free delete fold still advances the CAS marks (no laggard resurrection)") {
    // the hole: a window whose deleted ids were never indexed commits
    // NOTHING to members/survivors, so without a bare mark advance a
    // stale laggard's CAS would pass and its not-matched INSERT would
    // land a source-deleted doc as a live survivor with no band rows —
    // permanently (no later window re-deletes it)
    val r = root("cfree")
    val src = s"$r/source"
    graft.delta.GraftWriter.write(slice(corpus, 0, 100), src,
      configuration = Some(Map("delta.enableChangeDataFeed" -> "true")))
    DedupIndex.buildFromSource(spark, src, "text", "doc_id", s"$r/idx",
      numHashes = 64, bands = 64)
    val membersPath = s"$r/idx/members"
    def mark = graft.delta.DeltaLog.forPath(spark, membersPath).update()
      .appTransactionVersion(DedupIndex.SourceVersionApp)
    val m0 = mark
    // the laggard's window: INSERT 900 lands on the source, its refresh
    // stalls (simulated below); a NEWER source commit deletes 900
    graft.delta.GraftWriter.write(Seq((900L, words(90, 0, 15)))
      .toDF("doc_id", "text"), src, SaveMode.Append)
    graft.delta.Dml.delete(spark, src, col("doc_id") === 900L)
    // the winner folds both commits as one window: 900 nets to
    // delete-of-never-indexed — zero merge commits on members/survivors
    val (n, _) = DedupIndex.refreshFromSource(spark, s"$r/idx")
    assert(n == 0, "the netted window must index nothing")
    assert(mark > m0, "a commit-free fold must still advance the CAS mark")
    // the stale laggard resumes: its members merge carries the
    // pre-window mark — must abort BEFORE its not-matched insert lands
    intercept[graft.delta.StaleAppVersionException] {
      graft.delta.Merge.into(spark, membersPath,
          Seq((900L, 900L, 100L)).toDF("id", "comp", "len"),
          col("t.id") === col("s.id"))
        .requireAppVersion(DedupIndex.SourceVersionApp, m0, m0 + 1)
        .whenMatchedUpdate(col("t.asof") <= lit(m0),
          Map("comp" -> col("s.comp"), "asof" -> lit(m0),
            "dead" -> lit(false)))
        .whenNotMatchedInsert(Map("id" -> col("s.id"),
          "comp" -> col("s.comp"), "len" -> col("s.len"),
          "asof" -> lit(m0), "dead" -> lit(false)))
        .execute()
    }
    assert(DedupIndex.members(spark, s"$r/idx")
      .filter(col("id") === 900L).count() == 0,
      "the deleted doc must never appear in members")
  }

  test("r16 review: DV-carrying files bypass the maintain floor (purge never deferred)") {
    val r = root("dvfloor")
    val src = s"$r/source"
    graft.delta.GraftWriter.write(slice(corpus, 0, 100), src,
      configuration = Some(Map("delta.enableChangeDataFeed" -> "true")))
    DedupIndex.buildFromSource(spark, src, "text", "doc_id", s"$r/idx")
    val membersPath = s"$r/idx/members"
    // an out-of-band DV delete on the standing table (an operator's
    // layout-level intervention, not an index op): the DV bytes sit far
    // under the floor on a quiescent table — maintain must still run the
    // cluster pass, because that rewrite is the only DV purge
    graft.delta.DeltaTable.forPath(spark, membersPath)
      .setProperties(Map(graft.delta.TableConfig.EnableDeletionVectors -> "true"))
    graft.delta.Dml.deleteWithDv(spark, membersPath, col("id") === 5L)
    def dvFiles = graft.delta.DeltaLog.forPath(spark, membersPath).update()
      .files.count(graft.delta.DeletionVectors.hasDv)
    assert(dvFiles == 1, "the DV delete must have marked a file")
    DedupIndex.maintain(spark, s"$r/idx")
    assert(dvFiles == 0, "maintain must purge DV files despite the floor")
  }

  test("r17: UPDATE windows fold — re-home, bridge-update split, ≡ full recompute, replay idempotent") {
    val r = root("upd")
    val src = s"$r/source"
    graft.delta.GraftWriter.write(corpus, src,
      configuration = Some(Map("delta.enableChangeDataFeed" -> "true")))
    val v0 = DedupIndex.buildFromSource(spark, src, "text", "doc_id",
      s"$r/idx", numHashes = 64, bands = 64)
    def comps(ids: Long*): Set[Long] =
      DedupIndex.members(spark, s"$r/idx")
        .filter(col("id").isin(ids.map(Long.box): _*))
        .select("comp").as[Long].collect().toSet
    // ONE window, two update commits: the BRIDGE 210 rewrites to an
    // unrelated text — {10,110} must SPLIT (J(10,110) < 1/2 without the
    // bridge) — and singleton 5 rewrites INTO family {1,101,301}
    graft.delta.Dml.update(spark, src, col("doc_id") === 210L,
      Map("text" -> lit(words(97, 0, 30))))
    graft.delta.Dml.update(spark, src, col("doc_id") === 5L,
      Map("text" -> lit(words(7, 0, 24) + " tailfive")))
    DedupIndex.refreshFromSource(spark, s"$r/idx")
    assert(comps(10L) == Set(10L) && comps(110L) == Set(110L) &&
      comps(210L) == Set(210L), "bridge update-away must split the family")
    assert(comps(1L, 5L, 101L, 301L) == Set(1L),
      "update-into must join the standing family")
    // the old texts' band rows are physically replaced, not accumulated:
    // exactly `bands` rows per updated doc
    val perDoc = graft.delta.DeltaTable.forPath(spark, s"$r/idx/buckets")
      .toDF.filter(col("id").isin(5L, 210L))
      .groupBy("id").count().select("count").as[Long].collect()
    assert(perDoc.length == 2 && perDoc.forall(_ == 64L),
      s"band rows per updated doc must be exactly bands, got ${perDoc.toSeq}")
    // ≡ a full rebuild over the post-update corpus
    val rf = root("updfull")
    DedupIndex.buildFromSource(spark, src, "text", "doc_id", s"$rf/idx",
      numHashes = 64, bands = 64)
    assert(dump(DedupIndex.survivors(spark, s"$r/idx")) ==
      dump(DedupIndex.survivors(spark, s"$rf/idx")), "≡ full recompute")
    assert(dump(DedupIndex.members(spark, s"$r/idx")
        .select(col("comp"), col("id"), col("len"))) ==
      dump(DedupIndex.members(spark, s"$rf/idx")
        .select(col("comp"), col("id"), col("len"))), "members ≡")
    // REPLAY the same update window (mark rewound): state must not move
    val before = dump(DedupIndex.survivors(spark, s"$r/idx"))
    val bucketsBefore = graft.delta.DeltaTable
      .forPath(spark, s"$r/idx/buckets").toDF.count()
    val log = graft.delta.DeltaLog.forPath(spark, s"$r/idx/buckets")
    log.update()
    val txn = log.startTransaction()
    txn.addAction(graft.delta.TxnAction(DedupIndex.SourceVersionApp, v0))
    txn.commit()
    DedupIndex.refreshFromSource(spark, s"$r/idx")
    assert(dump(DedupIndex.survivors(spark, s"$r/idx")) == before,
      "replayed update window must fold idempotently")
    assert(graft.delta.DeltaTable.forPath(spark, s"$r/idx/buckets")
      .toDF.count() == bucketsBefore, "no band-row accumulation on replay")
    assert(DedupIndex.refreshFromSource(spark, s"$r/idx") == ((0L, 0L)))
  }

  test("r17: update + delete and insert + update inside ONE window net correctly") {
    val r = root("updnet")
    val src = s"$r/source"
    graft.delta.GraftWriter.write(corpus, src,
      configuration = Some(Map("delta.enableChangeDataFeed" -> "true")))
    DedupIndex.buildFromSource(spark, src, "text", "doc_id", s"$r/idx",
      numHashes = 64, bands = 64)
    // 301 updated THEN deleted: a net takedown — the update's post-image
    // must not survive, and family {1,101} relabels + re-elects
    graft.delta.Dml.update(spark, src, col("doc_id") === 301L,
      Map("text" -> lit(words(96, 0, 25))))
    graft.delta.Dml.delete(spark, src, col("doc_id") === 301L)
    // 950 inserted THEN updated: a net insert of the POST-image text,
    // which is a near-dup of family {1,101}
    graft.delta.GraftWriter.write(
      Seq((950L, words(95, 0, 20))).toDF("doc_id", "text"),
      src, SaveMode.Append)
    graft.delta.Dml.update(spark, src, col("doc_id") === 950L,
      Map("text" -> lit(words(7, 0, 24) + " tailninefifty")))
    DedupIndex.refreshFromSource(spark, s"$r/idx")
    assert(DedupIndex.members(spark, s"$r/idx")
      .filter(col("id") === 301L).count() == 0, "update+delete nets to gone")
    val m = DedupIndex.members(spark, s"$r/idx")
      .filter(col("id").isin(1L, 101L, 950L))
      .select("comp").as[Long].collect().toSet
    assert(m == Set(1L), s"insert+update must land the POST text, got $m")
    val rf = root("updnetfull")
    DedupIndex.buildFromSource(spark, src, "text", "doc_id", s"$rf/idx",
      numHashes = 64, bands = 64)
    assert(dump(DedupIndex.survivors(spark, s"$r/idx")) ==
      dump(DedupIndex.survivors(spark, s"$rf/idx")), "≡ full recompute")
  }

  test("r17: text-identical updates net out — no fold work, no members/survivors commits") {
    val r = root("updnoop")
    val src = s"$r/source"
    graft.delta.GraftWriter.write(corpus, src,
      configuration = Some(Map("delta.enableChangeDataFeed" -> "true")))
    DedupIndex.buildFromSource(spark, src, "text", "doc_id", s"$r/idx",
      numHashes = 64, bands = 64)
    def v(p: String) = graft.delta.DeltaLog.forPath(spark, p).update().version
    val mv = v(s"$r/idx/members")
    val sv = v(s"$r/idx/survivors")
    val surv = dump(DedupIndex.survivors(spark, s"$r/idx"))
    // a rewrite that keeps every text byte-identical (the metadata-update
    // shape): the window carries update_pre/postimage rows that must net
    // out BEFORE any fold work
    graft.delta.Dml.update(spark, src, col("doc_id") < 200L,
      Map("text" -> col("text")))
    assert(DedupIndex.refreshFromSource(spark, s"$r/idx") == ((0L, 0L)),
      "a text-identical update window is a data-free window")
    assert(v(s"$r/idx/members") == mv && v(s"$r/idx/survivors") == sv,
      "no members/survivors commits on a netted-out window")
    assert(dump(DedupIndex.survivors(spark, s"$r/idx")) == surv)
    // and the mark advanced: the window is never re-read
    assert(DedupIndex.refreshFromSource(spark, s"$r/idx") == ((0L, 0L)))
  }

  test("r17 review: a metadata-only update of a NULL-text doc nets out too") {
    // countDistinct ignores nulls, so a null→null image pair read nt=0 and
    // was folded as a real change — members/survivors merge commits and
    // family churn for zero state change, on every such wave. The netting
    // is null-safe now (pre <=> post); a null↔non-null pair still folds.
    val r = root("updnoopnull")
    val src = s"$r/source"
    graft.delta.GraftWriter.write(
      corpus.unionByName(Seq((990L, null.asInstanceOf[String]))
        .toDF("doc_id", "text")),
      src, configuration = Some(Map("delta.enableChangeDataFeed" -> "true")))
    DedupIndex.buildFromSource(spark, src, "text", "doc_id", s"$r/idx",
      numHashes = 64, bands = 64)
    def v(p: String) = graft.delta.DeltaLog.forPath(spark, p).update().version
    // the null-text doc has a null `len` — dump() null-tolerantly here
    def dumpN(df: org.apache.spark.sql.DataFrame) =
      df.select("comp", "id", "len").as[(Long, Long, Option[Long])]
        .collect().toSeq.sorted
    val mv = v(s"$r/idx/members")
    val sv = v(s"$r/idx/survivors")
    val surv = dumpN(DedupIndex.survivors(spark, s"$r/idx"))
    graft.delta.Dml.update(spark, src, col("doc_id") === 990L,
      Map("text" -> col("text"))) // null→null: byte-identical
    assert(DedupIndex.refreshFromSource(spark, s"$r/idx") == ((0L, 0L)),
      "a null→null text update is a data-free window")
    assert(v(s"$r/idx/members") == mv && v(s"$r/idx/survivors") == sv,
      "no members/survivors commits on a netted-out null-text window")
    assert(dumpN(DedupIndex.survivors(spark, s"$r/idx")) == surv)
    // the asymmetric pair still folds: null → real text re-indexes 990
    graft.delta.Dml.update(spark, src, col("doc_id") === 990L,
      Map("text" -> lit(words(97, 0, 26))))
    DedupIndex.refreshFromSource(spark, s"$r/idx")
    assert(DedupIndex.members(spark, s"$r/idx")
      .filter(col("id") === 990L && col("len").isNotNull).count() == 1,
      "null→non-null update must fold as a re-index")
  }

  test("r17: maintain autopilot — cadence-fenced compactDead keeps dead rows bounded; laggard aborts") {
    val r = root("autopilot")
    val src = s"$r/source"
    graft.delta.GraftWriter.write(corpus, src,
      configuration = Some(Map("delta.enableChangeDataFeed" -> "true")))
    DedupIndex.buildFromSource(spark, src, "text", "doc_id", s"$r/idx",
      numHashes = 64, bands = 64)
    val membersPath = s"$r/idx/members"
    def deadRows() = graft.delta.DeltaTable.forPath(spark, membersPath)
      .toDF.filter(col("dead")).count() +
      graft.delta.DeltaTable.forPath(spark, s"$r/idx/survivors")
        .toDF.filter(col("dead")).count()
    def bucketsApp(app: String) = graft.delta.DeltaLog
      .forPath(spark, s"$r/idx/buckets").update()
      .appTransactionVersion.get(app)
    val memberMark0 = graft.delta.DeltaLog.forPath(spark, membersPath)
      .update().appTransactionVersion(DedupIndex.SourceVersionApp)
    // wave 1: the refresh-embedded maintain STAMPS the cadence start
    // (default horizon 16 — no compaction yet, dead rows accumulate)
    graft.delta.Dml.delete(spark, src, col("doc_id").isin(5L, 6L))
    DedupIndex.refreshFromSource(spark, s"$r/idx")
    assert(bucketsApp(DedupIndex.CompactedAtApp).isDefined,
      "first maintain must stamp the cadence start")
    graft.delta.Dml.delete(spark, src, col("doc_id").isin(105L, 106L))
    DedupIndex.refreshFromSource(spark, s"$r/idx")
    assert(deadRows() >= 4, "under-horizon waves accumulate dead rows")
    // operator cadence call with a tight horizon: ONE call reclaims
    val reclaimed = DedupIndex.maintain(spark, s"$r/idx",
      reclaimEvery = 1, retainVersions = 0)
    assert(reclaimed >= 4 && deadRows() == 0,
      s"cadence maintain must reclaim, got $reclaimed / ${deadRows()}")
    // within the same mark the fence makes the next call free
    assert(DedupIndex.maintain(spark, s"$r/idx",
      reclaimEvery = 1, retainVersions = 0) == 0L)
    // sustained waves + cadence maintain: dead rows stay bounded
    graft.delta.Dml.delete(spark, src, col("doc_id").isin(205L, 206L))
    DedupIndex.refreshFromSource(spark, s"$r/idx")
    DedupIndex.maintain(spark, s"$r/idx", reclaimEvery = 1, retainVersions = 0)
    assert(deadRows() == 0, "cadence-called maintain keeps dead rows bounded")
    // post-compaction stale laggard still aborts on the per-table mark
    intercept[graft.delta.StaleAppVersionException] {
      graft.delta.Merge.into(spark, membersPath,
          Seq((5L, 5L, 100L)).toDF("id", "comp", "len"),
          col("t.id") === col("s.id"))
        .requireAppVersion(DedupIndex.SourceVersionApp, memberMark0,
          memberMark0 + 1)
        .whenMatchedUpdate(col("t.asof") <= lit(memberMark0),
          Map("comp" -> col("s.comp"), "asof" -> lit(memberMark0),
            "dead" -> lit(false)))
        .whenNotMatchedInsert(Map("id" -> col("s.id"),
          "comp" -> col("s.comp"), "len" -> col("s.len"),
          "asof" -> lit(memberMark0), "dead" -> lit(false)))
        .execute()
    }
    assert(DedupIndex.members(spark, s"$r/idx")
      .filter(col("id") === 5L).count() == 0,
      "the taken-down doc must stay gone after the laggard's abort")
    // live state untouched throughout: ≡ full recompute
    val rf = root("autopilotfull")
    DedupIndex.buildFromSource(spark, src, "text", "doc_id", s"$rf/idx",
      numHashes = 64, bands = 64)
    assert(dump(DedupIndex.survivors(spark, s"$r/idx")) ==
      dump(DedupIndex.survivors(spark, s"$rf/idx")), "≡ full recompute")
  }
}
