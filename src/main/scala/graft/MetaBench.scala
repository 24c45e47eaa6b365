package graft

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.SparkSession

import graft.delta.DeltaLog

/** Metadata-path microbenchmark: how the SNAPSHOT machinery scales in the
  * number of commits, independent of data volume — the axis a 100 TB table
  * with years of history stresses (r7 verdict #6). Synthesizes an
  * N-commit table (default 10⁴: one tiny real parquet file + commitInfo
  * per commit, checkpoint near the tip), then times
  *  - cold `forPath` (checkpoint restore + tail replay),
  *  - warm `update()` (no new commits — must be a listing, not a replay),
  *  - `graft_history` over all N commits (executor-built rows above the
  *    distributed threshold),
  *  - `graft_changes` over the full version range (single batched scan,
  *    O(#shapes) plan).
  * Prints one JSON line; numbers recorded in BASELINE.md lock the r7
  * scale fixes (O(1) snapshot commitInfos, batched feed, distributed
  * history) against regression. */
object MetaBench {

  private def timed[A](f: => A): (Double, A) = {
    val t0 = System.nanoTime()
    val a = f
    ((System.nanoTime() - t0) / 1e9, a)
  }

  /** Coordinated-commits scale probe: N staged-only commits (interval >
    * N, nothing backfills), then the costs that must stay O(tail):
    * cold coordinator-aware load (classic replay + staged merge), warm
    * update, and the post-state-loss adoption walk (one claim per staged
    * version) triggered by the next commit. */
  private def coordProbe(spark: SparkSession, n: Int): Unit = {
    import graft.delta._
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-coordbench-")
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      LocalPaths.deleteRecursively(dir.toFile)))
    val t = dir.toString
    GraftWriter.write(Seq((1L, "x")).toDF("id", "v").coalesce(1), t) // v0
    val name = "metabench-coord"
    CommitCoordinatorProvider.register(name,
      new InMemoryCommitCoordinator(backfillInterval = n + 10))
    DeltaTable.forPath(spark, t).enableCoordinatedCommits(name)      // v1
    val log = DeltaLog.forPathUncached(spark, t)
    log.update()
    val add0 = log.snapshot.files.head
    // N coordinated commits, each staging one (zero-byte-placeholder) add
    val (commitLoopSec, _) = timed {
      (0 until n).foreach { i =>
        val f = s"coord-$i.parquet"
        Files.createFile(dir.resolve(f))
        log.startTransaction()
          .addAction(add0.copy(path = f, stats = None))
          .commit(): Unit
      }
    }
    require(!log.store.exists(log.commitFile(2)),
      "probe precondition: the tail must be staged-only")
    val (coldSec, cold) = timed(DeltaLog.forPathUncached(spark, t).update())
    require(cold.version == n + 1 && cold.files.size == n + 1,
      s"cold coordinated snapshot wrong: v=${cold.version} files=${cold.files.size}")
    val warmLog = DeltaLog.forPathUncached(spark, t)
    warmLog.update()
    val (warmSec, _) = timed(warmLog.update())
    // coordinator loses all state; the next commit adopts the acked tail
    CommitCoordinatorProvider.register(name,
      new InMemoryCommitCoordinator(backfillInterval = n + 10))
    Files.createFile(dir.resolve("post-loss.parquet"))
    val (adoptSec, _) = timed {
      DeltaLog.forPathUncached(spark, t).startTransaction()
        .addAction(add0.copy(path = "post-loss.parquet", stats = None))
        .commit(): Unit
    }
    (2L to (n + 1L)).foreach(v => require(log.store.exists(log.commitFile(v)),
      s"adoption must have claimed v$v"))
    val (postSec, post) = timed(DeltaLog.forPathUncached(spark, t).update())
    require(post.version == n + 2 && post.files.size == n + 2,
      s"post-recovery snapshot wrong: v=${post.version} files=${post.files.size}")
    def fmt(v: Double) = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    println(s"""{"metric":"coordinated_path","staged_commits":$n,"commit_loop_sec":${fmt(commitLoopSec)},"commit_sec_each":${fmt(commitLoopSec / n)},"cold_merge_sec":${fmt(coldSec)},"warm_update_sec":${fmt(warmSec)},"state_loss_adoption_commit_sec":${fmt(adoptSec)},"post_recovery_cold_sec":${fmt(postSec)}}""")
  }

  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_META_COMMITS", "10000").toInt
    // >1 switches to the INVENTORY probe (r11 verdict #6): n commits ×
    // addsPer files each — a million-Add table at 1000×1000 — measuring
    // cold load, checkpoint write, vacuum walk, and retained driver heap.
    // Data files are zero-byte placeholders there (the metadata axis is
    // under test, footers are not read), so history/feed rows are skipped.
    val addsPer = sys.env.getOrElse("SPARK_GRAFT_META_ADDS_PER_COMMIT", "1").toInt
    // Log-only mode for the 10⁷-Add decade (r12 verdict #5): no placeholder
    // data files are materialized (10⁷ inodes would exhaust the shared
    // VM's /tmp), so the vacuum-walk rows are skipped (-1) — the walk's
    // distributed linearity is pinned by a separate multi-million-file
    // point; the metadata axis (distributed replay, checkpoint, heap) is
    // what the decade run measures.
    val skipFiles = sys.env.get("SPARK_GRAFT_META_SKIP_FILES").contains("1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.delta.GraftSparkExtensions")
      .config("spark.sql.catalog.spark_catalog", "graft.delta.catalog.GraftCatalog")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // SPARK_GRAFT_META_COORD=N switches to the COORDINATED-COMMITS probe
    // (r12): N staged-only commits through a coordinator (interval > N),
    // measuring real commit throughput, the staged-tail merge a cold
    // coordinator-aware reader pays, and the adoption walk after a
    // coordinator state loss — the three coordinated paths whose cost
    // must stay O(tail), not O(history).
    val coordN = sys.env.getOrElse("SPARK_GRAFT_META_COORD", "0").toInt
    if (coordN > 0) {
      coordProbe(spark, coordN)
      spark.stop()
      return
    }

    val dir = Files.createTempDirectory("graft-metabench-")
    // the probe can synthesize ~10⁶ placeholder files; a few undeleted runs
    // would exhaust tmpfs inodes on the shared VM (r12 review) — reclaim on
    // ANY exit (normal or thrown)
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      LocalPaths.deleteRecursively(dir.toFile)))
    val logDir = dir.resolve("_delta_log")
    Files.createDirectories(logDir)
    // one real (tiny) parquet data file, hard-copied per commit so the
    // full-range feed scan reads real footers, not fakes
    import spark.implicits._
    Seq((1L, "x")).toDF("id", "v").coalesce(1).write.parquet(dir.resolve("seed").toString)
    val seed = {
      val s = Files.list(dir.resolve("seed"))
      try s.filter(_.toString.endsWith(".parquet")).findFirst().get()
      finally s.close()
    }
    val schemaJson =
      """{\"type\":\"struct\",\"fields\":[{\"name\":\"id\",\"type\":\"long\",\"nullable\":true,\"metadata\":{}},{\"name\":\"v\",\"type\":\"string\",\"nullable\":true,\"metadata\":{}}]}"""
    def commitLines(v: Int): String = {
      val head =
        if (v == 0)
          s"""{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}
{"metaData":{"id":"00000000-0000-0000-0000-000000000000","format":{"provider":"parquet","options":{}},"schemaString":"$schemaJson","partitionColumns":[],"configuration":{},"createdTime":1600000000000}}
"""
        else ""
      // files spread across 16 subdirectories (not hive `k=v` — no
      // partition columns declared) so the vacuum-walk rows below compare
      // a REAL per-directory fan-out, not an empty-dirs short circuit
      head +
        (0 until addsPer).map { j =>
          s"""{"add":{"path":"bucket-${(v * addsPer + j) % 16}/part-$v-$j.parquet","partitionValues":{},"size":${Files.size(seed)},"modificationTime":${1600000000000L + v},"dataChange":true}}
"""
        }.mkString +
        s"""{"commitInfo":{"operation":"WRITE","operationParameters":{"mode":"Append"},"engineInfo":"graft-metabench","clusterId":"local","readVersion":${v - 1}}}
"""
    }
    (0 until 16).foreach(b => Files.createDirectories(dir.resolve(s"bucket-$b")))
    (0 until n).foreach { v =>
      if (!skipFiles) (0 until addsPer).foreach { j =>
        val f = dir.resolve(s"bucket-${(v * addsPer + j) % 16}")
          .resolve(s"part-$v-$j.parquet")
        if (addsPer == 1)
          Files.copy(seed, f, StandardCopyOption.REPLACE_EXISTING)
        else if (!Files.exists(f)) Files.createFile(f) // metadata-axis probe
      }
      Files.write(logDir.resolve(DeltaLog.pad20(v) + ".json"),
        commitLines(v).getBytes(UTF_8))
    }
    def usedHeapMb: Long = {
      System.gc(); Thread.sleep(50); System.gc()
      val rt = Runtime.getRuntime
      (rt.totalMemory - rt.freeMemory) / (1 << 20)
    }
    val heapBefore = usedHeapMb

    // checkpoint near the tip: cold load = restore + 10-commit tail replay.
    // In its OWN method frame so the checkpointing log and its ~n·addsPer
    // Add snapshot are unreachable before the heap measurement below —
    // measured in-line they doubled heap_with_snapshot (r11 review find).
    def writeCheckpoint(): Double = {
      val cpLog = DeltaLog.forPathUncached(spark, dir.toString)
      // clamp: a quick SPARK_GRAFT_META_COMMITS<12 sanity run would
      // otherwise request a negative version and die here (r12 review)
      val cpSnap = cpLog.snapshotForVersion(math.max(0L, n - 11L))
      timed(cpLog.checkpoint(cpSnap))._1
    }
    val ckptSec = writeCheckpoint()

    val (coldSec, cold) = timed {
      val log = DeltaLog.forPathUncached(spark, dir.toString)
      log.update()
    }
    require(cold.version == n - 1 && cold.files.size == n * addsPer,
      s"cold snapshot wrong: v=${cold.version} files=${cold.files.size}")
    // retained driver heap with the live snapshot pinned — the number that
    // bounds how many Adds a single driver can HOLD, which is what the
    // distributed-replay/checkpoint thresholds exist to protect
    val heapWithSnapshot = usedHeapMb
    val warmLog = DeltaLog.forPathUncached(spark, dir.toString)
    warmLog.update()
    val (warmSec, _) = timed(warmLog.update())
    val (histSec, feedSec) =
      // placeholder files have no footers; log-only mode has no files at all
      if (addsPer > 1 || skipFiles) (-1.0, -1.0)
      else {
        val (hs, histRows) = timed(
          spark.sql(s"SELECT * FROM graft_history('${dir.toString}')").count())
        require(histRows == n, s"history rows $histRows != $n")
        val (fs, feedRows) = timed(
          spark.sql(s"SELECT * FROM graft_changes('${dir.toString}', 0, ${n - 1})").count())
        require(feedRows == n - 1, s"feed rows $feedRows != ${n - 1}")
        (hs, fs)
      }
    // vacuum candidate WALK over the n-file table: driver iterator vs the
    // executor fan-out (r10: the listing, not the deletes, is the
    // object-store bottleneck). Warm handle — the row isolates the walk,
    // not a cold snapshot restore.
    val (vacDriverSec, vacDistSec) =
      if (skipFiles) (-1.0, -1.0) // no data files on disk to walk
      else {
        val vacDt = graft.delta.DeltaTable.forPath(spark, dir.toString)
        val (dSec, _) = timed(vacDt.vacuum(dryRun = true))
        spark.conf.set(graft.delta.DeltaTable.DistributedVacuumListKey, "0")
        val dw0 = graft.delta.DeltaTable.driverVacuumWalks.get()
        val (xSec, _) = timed(vacDt.vacuum(dryRun = true))
        require(graft.delta.DeltaTable.driverVacuumWalks.get() == dw0,
          "distributed vacuum row must not have walked on the driver")
        spark.conf.unset(graft.delta.DeltaTable.DistributedVacuumListKey)
        (dSec, xSec)
      }

    def fmt(v: Double) = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    println(s"""{"metric":"metadata_path","commits":$n,"adds_per_commit":$addsPer,"files":${n.toLong * addsPer},"cold_forPath_sec":${fmt(coldSec)},"warm_update_sec":${fmt(warmSec)},"checkpoint_write_sec":${fmt(ckptSec)},"history_sec":${fmt(histSec)},"changes_full_range_sec":${fmt(feedSec)},"vacuum_walk_driver_sec":${fmt(vacDriverSec)},"vacuum_walk_dist_sec":${fmt(vacDistSec)},"heap_before_mb":$heapBefore,"heap_with_snapshot_mb":$heapWithSnapshot}""")
    spark.stop()
  }
}
