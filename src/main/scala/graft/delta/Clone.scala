package graft.delta

import java.util.UUID

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** SHALLOW CLONE: a new table whose version 0 references the source
  * snapshot's data files by absolute URI — zero bytes copied, O(#files)
  * metadata. The clone then lives its own life: appends, DML, OPTIMIZE and
  * time travel land in the clone's log as local files, never touching the
  * source (copy-on-write at table granularity). The experimentation pattern
  * at 100 TB — fork the table, try the migration/cleanup, throw the fork
  * away.
  *
  * Rides the Delta protocol's two `add.path` forms (relative to the table
  * root OR absolute URI — the reference parses both through the same field,
  * `rust/src/action.rs:244-261`); every reader path here resolves
  * `new Path(tableRoot, add.path)`, which Hadoop defines as the absolute
  * URI when the child carries one. Safety: vacuum candidates come from
  * listing the clone's own directory, so a clone can never reclaim source
  * bytes; cloned Adds keep their stats, so skipping works from version 0.
  */
object Clone {

  /** Clone `sourcePath` (optionally a pinned historical `version`) into
    * empty `targetPath`. Returns the clone's version 0. */
  def shallow(spark: SparkSession, sourcePath: String, targetPath: String,
              version: Option[Long] = None): Long = {
    val srcLog = DeltaLog.forPath(spark, sourcePath)
    val srcSnap = version match {
      case Some(v) => srcLog.snapshotForVersion(v)
      case None =>
        val s = srcLog.update()
        if (s.version < 0) throw new NotATableException(sourcePath)
        s
    }
    // a clone MATERIALIZES the source's file inventory: fencing on
    // readability keeps the refuse-don't-misread contract — an unsupported
    // reader capability could change which files are live, and a fork
    // derived from a mis-read log would be trusted by engines that DO
    // support the feature
    ProtocolSupport.assertReadable(srcSnap)
    val tgtLog = DeltaLog.forPath(spark, targetPath)
    val tgtSnap = tgtLog.update() // pinned below: a racing CREATE must conflict
    if (tgtSnap.version >= 0)
      throw new IllegalStateException(s"clone target $targetPath is already a Delta table")

    val conf = spark.sessionState.newHadoopConf()
    val srcBase = srcLog.tablePath.getFileSystem(conf).makeQualified(srcLog.tablePath)
    val now = System.currentTimeMillis()

    val txn = tgtLog.startTransaction(tgtSnap)
    // the clone inherits the source's protocol verbatim — its metadata may
    // demand capabilities (column mapping, timestampNtz, domain metadata)
    // that a bare (1,2) protocol would under-declare
    txn.addAction(
      if (srcSnap.minReaderVersion <= 0) ProtocolAction()
      else ProtocolAction(srcSnap.minReaderVersion, srcSnap.minWriterVersion,
        srcSnap.readerFeatures, srcSnap.writerFeatures))
    val md = srcSnap.metadata.getOrElse(
      throw new IllegalStateException(s"source $sourcePath has no metadata"))
    txn.addAction(md.copy(id = UUID.randomUUID().toString, createdTime = Some(now)))
    // domain metadata is part of the snapshot state being forked (e.g. the
    // `delta.clustering` domain of a liquid-clustered source)
    srcSnap.domainMetadata.toSeq.sortBy(_._1).foreach { case (d, c) =>
      txn.addAction(DomainMetadataAction(d, c))
    }
    // DV pointers are table-relative and would dangle from the clone's root;
    // cloning a DV-carrying snapshot requires compacting first (OPTIMIZE
    // folds the vectors into rewritten files)
    if (DeletionVectors.anyDv(srcSnap.files))
      throw new IllegalStateException(
        s"cannot shallow-clone $sourcePath: snapshot carries deletion " +
        "vectors; run OPTIMIZE (compaction purges them) and retry")
    // a PINNED historical snapshot replays fine from the LOG even after
    // its data files were vacuumed — a clone of such a version would be
    // born unreadable. Probe existence up front (same contract as
    // RESTORE's RestoreException), in parallel on the driver pool. The
    // LATEST snapshot's live files cannot have been legitimately vacuumed,
    // so un-pinned clones skip the probe — 10⁶ HEAD round trips for a
    // hazard that cannot apply (r11 review).
    if (version.isDefined) {
      val srcFs = srcBase.getFileSystem(conf)
      val missing = GraftWriter.inDriverPool(srcSnap.files.map(_.path))(p =>
        if (srcFs.exists(new Path(srcBase, p))) None else Some(p)).flatten
      if (missing.nonEmpty)
        throw new IllegalStateException(
          s"cannot shallow-clone $sourcePath at version ${srcSnap.version}: " +
          s"${missing.size} data file(s) were vacuumed, e.g. " +
          missing.take(3).mkString(", "))
    }
    srcSnap.files.foreach { a =>
      // absolute sources stay absolute; relative ones qualify against the
      // source root
      txn.addAction(a.copy(
        path = new Path(srcBase, a.path).toString,
        dataChange = true))
    }
    val info = ActionCodec.mapper.createObjectNode()
    info.put("timestamp", now)
    info.put("operation", "CLONE")
    val params = info.putObject("operationParameters")
    params.put("source", srcBase.toString)
    params.put("sourceVersion", srcSnap.version)
    txn.commit(Some(CommitInfoAction(info)))
  }
}
