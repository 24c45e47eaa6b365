package graft.delta

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed log replay — the spill path for tables whose file count
  * outgrows driver memory (SURVEY §7 risk: the reference's `Vec<Add>` state,
  * like our default [[Snapshot]], is O(#files) on one machine).
  *
  * The commit log is itself data: every commit JSON (plus the newest
  * checkpoint parquet) is read as a DataFrame with its version, and
  * last-writer-wins resolution per path runs as a `max_by` aggregation on
  * executors. File pruning (partition + stats predicates) is applied as
  * DataFrame filters BEFORE anything is collected, so the driver only ever
  * holds the pruned survivors of a query — at 1M files and a selective
  * partition filter that is thousands of rows, not the inventory.
  *
  * Within one commit a path may legally appear as remove AND re-add (the
  * DV pointer commits of merge-on-read DML do exactly this); the driver's
  * sequential replay applies them in order, so the add wins — the tie-break
  * below mirrors that (add outranks remove at equal version).
  */
object DistributedReplay {

  /** Standard DV descriptor shape — shared by commit JSON (object) and
    * checkpoint parquet (struct); one schema reads both. */
  private val dvSchema = StructType(Seq(
    StructField("storageType", StringType),
    StructField("pathOrInlineDv", StringType),
    StructField("offset", IntegerType),
    StructField("sizeInBytes", IntegerType),
    StructField("cardinality", LongType)))

  private val addSchema = StructType(Seq(
    StructField("path", StringType),
    StructField("partitionValues", MapType(StringType, StringType)),
    StructField("size", LongType),
    StructField("modificationTime", LongType),
    StructField("dataChange", BooleanType),
    StructField("stats", StringType),
    StructField("tags", MapType(StringType, StringType)),
    StructField("deletionVector", dvSchema),
    StructField("baseRowId", LongType),
    StructField("defaultRowCommitVersion", LongType)))

  private val lineSchema = StructType(Seq(
    StructField("add", addSchema),
    StructField("remove", StructType(Seq(
      StructField("path", StringType),
      StructField("deletionTimestamp", LongType),
      StructField("dataChange", BooleanType))))))

  /** Active files at the latest (or a pinned) version as a DataFrame with
    * columns (path, partitionValues, size, modificationTime, dataChange,
    * stats). */
  def activeFiles(log: DeltaLog, version: Option[Long] = None,
                  resolved: Option[CheckPoint] = None): DataFrame = {
    val spark = log.spark
    val maxV = version.getOrElse(Long.MaxValue)
    val versions = log.listCommitVersions().filter(_ <= maxV)
    // `resolved`: the caller already picked the checkpoint (restoreCheckpoint
    // routes here with one in hand) — re-deriving it re-reads the pointer
    // and re-lists the log for nothing on the cold path (r11 review)
    val cp = resolved.orElse(log.lastCheckpoint()
      .filter(c => c.version <= maxV && log.checkpointPaths(c).forall(log.store.exists))
      .orElse(log.findLatestCheckpointForVersion(maxV)))

    // commits newer than the checkpoint, each tagged with its version.
    // Contiguity guard (r11 review, mirrors DeltaLog.snapshotForVersion):
    // a gap between the checkpoint base and the surviving tail — cleaned
    // early commits with no covering checkpoint, or a missing mid-range
    // commit — must refuse, not union past the hole into a silently wrong
    // active-file set.
    val tail = versions.filter(v => cp.forall(_.version < v))
    val base = cp.map(_.version).getOrElse(-1L)
    tail.lastOption.foreach { last =>
      val expected = (base + 1) to last
      if (tail.size != expected.size || !tail.sameElements(expected))
        throw new IllegalStateException(
          s"cannot replay ${log.tablePath}: commit(s) " +
          s"${(expected.toSet -- tail.toSet).toSeq.sorted.take(5).mkString(", ")} " +
          "missing from the log (cleaned past retention?) and the newest " +
          "usable checkpoint does not cover them")
    }
    val commitDf: Option[DataFrame] = if (tail.isEmpty) None else Some {
      spark.read.schema(lineSchema)
        .json(tail.map(v => log.commitFile(v).toString): _*)
        .withColumn("version",
          regexp_extract(input_file_name(), "(\\d{20})\\.json", 1).cast("long"))
        .select(
          col("version"),
          // protocol space → decoded in-memory space (ActionPath invariant),
          // on executors via the codegen'd kernel
          graft.functions.UriPathDecode(
            coalesce(col("add.path"), col("remove.path"))).as("path"),
          col("add.partitionValues").as("partitionValues"),
          col("add.size").as("size"),
          col("add.modificationTime").as("modificationTime"),
          col("add.dataChange").as("dataChange"),
          col("add.stats").as("stats"),
          col("add.tags").as("tags"),
          col("add.deletionVector").as("deletionVector"),
          col("add.baseRowId").as("baseRowId"),
          col("add.defaultRowCommitVersion").as("defaultRowCommitVersion"),
          col("add.path").isNotNull.as("isAdd"))
        .filter(col("path").isNotNull)
    }

    val cpDf: Option[DataFrame] = cp.flatMap { c =>
      // v2 checkpoints scatter their file actions across sidecar parquet
      // parts; classic/multipart checkpoints ARE the data paths. The
      // explicit read schema keeps this tolerant of both layouts (a v2
      // manifest need not carry an `add` column at all — absent columns
      // read as null under a supplied schema). A JSON v2 manifest cannot
      // join the parquet scan, but spec-legal inline add actions in it
      // (foreign writers) must not be dropped — read the ndjson manifest
      // with the same add schema and union it in.
      val (dataPaths, jsonManifest) = c.v2FileName match {
        case Some(name) if name.endsWith(".json") =>
          (Checkpoints.v2DataPaths(log, name),
           Some(new org.apache.hadoop.fs.Path(log.logPath, name)))
        case Some(name) => (Checkpoints.v2DataPaths(log, name), None)
        case None => (log.checkpointPaths(c), None)
      }
      val jsonDf = jsonManifest.map { p =>
        spark.read.schema(StructType(Seq(StructField("add", addSchema))))
          .json(p.toString)
          .filter(col("add").isNotNull)
      }
      val parquetDf = if (dataPaths.isEmpty) None else Some(
        spark.read.schema(StructType(Seq(StructField("add", addSchema))))
          .parquet(dataPaths.map(_.toString): _*)
          .filter(col("add").isNotNull))
      (parquetDf.toSeq ++ jsonDf.toSeq).reduceOption(_ unionByName _).map(
        _.select(
          lit(c.version).as("version"),
          graft.functions.UriPathDecode(col("add.path")).as("path"),
          col("add.partitionValues").as("partitionValues"),
          col("add.size").as("size"),
          col("add.modificationTime").as("modificationTime"),
          col("add.dataChange").as("dataChange"),
          col("add.stats").as("stats"),
          col("add.tags").as("tags"),
          col("add.deletionVector").as("deletionVector"),
          col("add.baseRowId").as("baseRowId"),
          col("add.defaultRowCommitVersion").as("defaultRowCommitVersion"),
          lit(true).as("isAdd")))
    }

    val all = (cpDf.toSeq ++ commitDf.toSeq) match {
      case Nil => return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(addSchema.fields))
      case dfs => dfs.reduce(_ unionByName _)
    }

    // last-writer-wins per path: order by (version, add-beats-remove on tie
    // — same-commit DV re-adds leave the re-added file active)
    all
      .withColumn("ord", struct(col("version"), when(col("isAdd"), 1).otherwise(0)))
      .groupBy("path")
      .agg(max_by(
        struct(col("isAdd"), col("partitionValues"), col("size"),
          col("modificationTime"), col("dataChange"), col("stats"),
          col("tags"), col("deletionVector"),
          col("baseRowId"), col("defaultRowCommitVersion")),
        col("ord")).as("last"))
      .filter(col("last.isAdd"))
      .select(col("path"), col("last.partitionValues").as("partitionValues"),
        col("last.size").as("size"),
        col("last.modificationTime").as("modificationTime"),
        col("last.dataChange").as("dataChange"), col("last.stats").as("stats"),
        col("last.tags").as("tags"),
        col("last.deletionVector").as("deletionVector"),
        col("last.baseRowId").as("baseRowId"),
        col("last.defaultRowCommitVersion").as("defaultRowCommitVersion"))
  }

  private def partitionPredicate(f: PartitionFilter): Column = f match {
    case PartitionFilter.Eq(k, v) => col("partitionValues").getItem(k) === v
    case PartitionFilter.Ne(k, v) => col("partitionValues").getItem(k) =!= v
    case PartitionFilter.In(k, vs) => col("partitionValues").getItem(k).isin(vs.toSeq: _*)
    case PartitionFilter.NotIn(k, vs) =>
      col("partitionValues").getItem(k).isNotNull &&
        !col("partitionValues").getItem(k).isin(vs.toSeq: _*)
  }

  /** Numeric stats predicate → skip-on-doubt Column over the stats JSON
    * (missing/unparsable stats keep the file, same as [[StatsPredicate]]).
    *
    * Integral predicate values compare as decimal(38,18): a cast to double
    * collapses int64 stats past 2⁵³ and silently prunes a file whose only
    * matching row sits past that edge (r11 review — the executor twin of
    * StatsPredicate.cmp's fix). 18 fractional digits keep fractional
    * stats of double columns exact under an integral predicate; values
    * beyond the 38-digit envelope cast to null and the coalesce keeps the
    * file — skip-on-doubt as ever. Double predicate values stay on the
    * double path (the predicate itself carries double precision). */
  private def statsPredicate(p: StatsPredicate): Option[Column] = {
    def stat(field: String, c: String, asDouble: Boolean): Column = {
      val raw = get_json_object(col("stats"), s"$$.$field['$c']")
      if (asDouble) raw.cast("double") else raw.cast("decimal(38,18)")
    }
    def num(v: Any): Option[(Column, Boolean)] = v match {
      case d: Double => Some((lit(d), true))
      case l: Long   => Some((lit(java.math.BigDecimal.valueOf(l)), false))
      case i: Int    => Some((lit(java.math.BigDecimal.valueOf(i.toLong)), false))
      case _ => None
    }
    p match {
      case StatsPredicate.Gt(c, v) => num(v).map { case (x, fd) =>
        coalesce(stat("maxValues", c, fd) > x, lit(true)) }
      case StatsPredicate.Ge(c, v) => num(v).map { case (x, fd) =>
        coalesce(stat("maxValues", c, fd) >= x, lit(true)) }
      case StatsPredicate.Lt(c, v) => num(v).map { case (x, fd) =>
        coalesce(stat("minValues", c, fd) < x, lit(true)) }
      case StatsPredicate.Le(c, v) => num(v).map { case (x, fd) =>
        coalesce(stat("minValues", c, fd) <= x, lit(true)) }
      case StatsPredicate.EqTo(c, v) => num(v).map { case (x, fd) =>
        coalesce(stat("minValues", c, fd) <= x, lit(true)) &&
          coalesce(stat("maxValues", c, fd) >= x, lit(true)) }
      case StatsPredicate.NotNull(_) => None // needs numRecords comparison; keep file
      // IN-set shapes stay driver-side (StatsPredicate.prune): expressing a
      // binary search as a Column buys nothing, and an unhandled case here
      // was a latent MatchError, not a conservative keep (r15)
      case _: StatsPredicate.InLongSet | _: StatsPredicate.InStringSet => None
    }
  }

  /** Replay + prune distributedly, collect only the surviving AddActions.
    * This is what a 10⁶-file table calls instead of materializing
    * `snapshot.files`. */
  def prunedAddActions(log: DeltaLog,
                       partitionFilters: Seq[PartitionFilter] = Nil,
                       statsPredicates: Seq[StatsPredicate] = Nil,
                       version: Option[Long] = None,
                       resolved: Option[CheckPoint] = None): Seq[AddAction] = {
    val filtered = (partitionFilters.map(partitionPredicate) ++
      statsPredicates.flatMap(statsPredicate))
      .foldLeft(activeFiles(log, version, resolved))(_ filter _)
    filtered.collect().toSeq.map { r =>
      AddAction(
        path = r.getAs[String]("path"),
        size = Option(r.getAs[java.lang.Long]("size")).map(_.longValue).getOrElse(0L),
        partitionValues = Option(r.getAs[scala.collection.Map[String, String]]("partitionValues"))
          .map(_.toMap).getOrElse(Map.empty),
        modificationTime = Option(r.getAs[java.lang.Long]("modificationTime"))
          .map(_.longValue).getOrElse(0L),
        dataChange = Option(r.getAs[java.lang.Boolean]("dataChange"))
          .forall(_.booleanValue),
        stats = Option(r.getAs[String]("stats")),
        tags = Option(r.getAs[scala.collection.Map[String, String]]("tags"))
          .map(_.toMap).filter(_.nonEmpty),
        // standard DV descriptor (struct → the JSON the scan path parses)
        // — dropping it here would RESURRECT deleted rows on snapshots
        // restored through the distributed path
        deletionVector = Option(r.getAs[org.apache.spark.sql.Row]("deletionVector"))
          .map { d =>
            StandardDv.Descriptor(
              storageType = d.getAs[String]("storageType"),
              pathOrInlineDv = d.getAs[String]("pathOrInlineDv"),
              offset = Option(d.getAs[java.lang.Integer]("offset")).map(_.intValue),
              sizeInBytes = d.getAs[Number]("sizeInBytes").intValue(),
              cardinality = d.getAs[Number]("cardinality").longValue()).json
          },
        baseRowId = Option(r.getAs[java.lang.Long]("baseRowId")).map(_.longValue),
        defaultRowCommitVersion = Option(
          r.getAs[java.lang.Long]("defaultRowCommitVersion")).map(_.longValue))
    }
  }
}
