package graft.delta

/** Table-level configuration: the `delta.*` keys of
  * `metaData.configuration`.
  *
  * The reference carries the map verbatim (`DeltaTableMetaData.configuration`,
  * `rust/src/delta.rs:308-330`) and its checkpoint Lambda reads the cadence
  * from table config rather than code (`aws/delta-checkpoint/src/main.rs:46`);
  * the keys and interval grammar here are the Delta protocol's published
  * table properties, so tables written by other Delta clients keep their
  * declared behavior when operated on by this engine.
  *
  * Durations use the protocol's calendar-interval strings
  * (`"interval <n> <unit>"`, unit ∈ millisecond/second/minute/hour/day/week,
  * singular or plural).
  */
object TableConfig {

  /** `true` ⇒ the table only accepts appends: any commit carrying a
    * `dataChange` remove (DELETE/UPDATE/MERGE/overwrite) is rejected.
    * Compaction (`dataChange=false`) still commutes. */
  val AppendOnly = "delta.appendOnly"

  /** Auto-checkpoint every N commits (default 10). */
  val CheckpointInterval = "delta.checkpointInterval"

  /** How long superseded log entries survive after a checkpoint
    * (default 30 days). Bounds time travel. */
  val LogRetention = "delta.logRetentionDuration"

  /** Vacuum retention floor and no-arg default (default 1 week). */
  val DeletedFileRetention = "delta.deletedFileRetentionDuration"

  /** Whether checkpoints trigger expired-log cleanup (default true). */
  val EnableExpiredLogCleanup = "delta.enableExpiredLogCleanup"

  /** `true` ⇒ DELETE/UPDATE take the merge-on-read deletion-vector path
    * instead of copy-on-write (see [[DeletionVectors]]). */
  val EnableDeletionVectors = "delta.enableDeletionVectors"

  /** `true` ⇒ DML commits capture row-level changes under `_change_data/`
    * (see [[ChangeDataFeed]]). */
  val EnableChangeDataFeed = "delta.enableChangeDataFeed"

  /** `classic` (default) writes `N.checkpoint.parquet` / multipart;
    * `v2` writes UUID-named v2 checkpoints with sidecar files
    * (`v2Checkpoint` table feature — see [[Checkpoints.writeV2]]). */
  val CheckpointPolicy = "delta.checkpointPolicy"

  /** `true` ⇒ data files carry row ids (`rowTracking` writer feature; see
    * [[RowTracking]] for the maintained subset). */
  val EnableRowTracking = "delta.enableRowTracking"

  /** Checkpoint stats shape (delta-spark's knobs): whether checkpoint add
    * rows carry the JSON `stats` string (default true) and the typed
    * `stats_parsed` struct (default true — delta-spark writes it when
    * enabled; graft has always written both). Disabling either shrinks
    * million-file checkpoints at the cost of skipping/stat answers for
    * snapshots restored from them. */
  val CheckpointWriteStatsAsJson = "delta.checkpoint.writeStatsAsJson"
  val CheckpointWriteStatsAsStruct = "delta.checkpoint.writeStatsAsStruct"

  /** Collect per-file min/max/nullCount stats for only the FIRST n
    * top-level columns (delta-spark's knob; default 32, -1 = all). At
    * 100 TB a 500-column table's full stats dominate the log — every
    * snapshot load pays for JSON nobody prunes on. `numRecords` is always
    * recorded. */
  val DataSkippingNumIndexedCols = "delta.dataSkippingNumIndexedCols"

  /** `true` ⇒ every commit records a monotonic `inCommitTimestamp` in a
    * leading `commitInfo`, and time travel / history read THAT clock
    * instead of file modification times (`inCommitTimestamp` writer
    * feature) — mtimes do not survive log copies/migrations; ICT does. */
  val EnableInCommitTimestamps = "delta.enableInCommitTimestamps"

  /** Version at which ICT was enabled (absent ⇒ enabled from version 0);
    * versions below it time-travel by mtime as before. Stamped by the
    * enablement commit itself. */
  val IctEnablementVersion = "delta.inCommitTimestampEnablementVersion"

  /** The enablement commit's own inCommitTimestamp. */
  val IctEnablementTimestamp = "delta.inCommitTimestampEnablementTimestamp"

  private val Known: Map[String, String => Unit] = Map(
    ColumnMapping.ModeKey -> { v: String =>
      val t = v.trim.toLowerCase(java.util.Locale.ROOT)
      require(t == "none" || t == "name" || t == "id",
        s"${ColumnMapping.ModeKey} must be none|name|id, got '$v'")
    },
    ColumnMappingDdl.MaxColumnIdKey -> { v: String =>
      val n = try v.trim.toLong catch { case _: NumberFormatException =>
        throw new IllegalArgumentException(
          s"${ColumnMappingDdl.MaxColumnIdKey} must be a long, got '$v'") }
      require(n >= 0, s"${ColumnMappingDdl.MaxColumnIdKey} must be >= 0, got $n")
    },
    AppendOnly -> parseBoolean(AppendOnly) _,
    EnableDeletionVectors -> parseBoolean(EnableDeletionVectors) _,
    EnableChangeDataFeed -> parseBoolean(EnableChangeDataFeed) _,
    CheckpointInterval -> { v: String =>
      val n = try v.toInt catch { case _: NumberFormatException =>
        throw new IllegalArgumentException(s"$CheckpointInterval must be an int, got '$v'") }
      require(n >= 1, s"$CheckpointInterval must be >= 1, got $n")
    },
    LogRetention -> { v: String => parseIntervalMillis(v, LogRetention); () },
    DeletedFileRetention -> { v: String => parseIntervalMillis(v, DeletedFileRetention); () },
    EnableExpiredLogCleanup -> parseBoolean(EnableExpiredLogCleanup) _,
    CheckpointPolicy -> { v: String =>
      val t = v.trim.toLowerCase(java.util.Locale.ROOT)
      require(t == "classic" || t == "v2",
        s"$CheckpointPolicy must be classic|v2, got '$v'")
    },
    EnableRowTracking -> parseBoolean(EnableRowTracking) _,
    CheckpointWriteStatsAsJson -> parseBoolean(CheckpointWriteStatsAsJson) _,
    CheckpointWriteStatsAsStruct -> parseBoolean(CheckpointWriteStatsAsStruct) _,
    DataSkippingNumIndexedCols -> { v: String =>
      val n = try v.trim.toInt catch { case _: NumberFormatException =>
        throw new IllegalArgumentException(
          s"$DataSkippingNumIndexedCols must be an int, got '$v'") }
      require(n >= -1, s"$DataSkippingNumIndexedCols must be >= -1, got $n")
    },
    EnableInCommitTimestamps -> parseBoolean(EnableInCommitTimestamps) _,
    IctEnablementVersion -> { v: String =>
      require(v.trim.forall(_.isDigit) && v.trim.nonEmpty,
        s"$IctEnablementVersion must be a version number, got '$v'")
    },
    IctEnablementTimestamp -> { v: String =>
      require(v.trim.forall(_.isDigit) && v.trim.nonEmpty,
        s"$IctEnablementTimestamp must be epoch millis, got '$v'")
    },
    // coordinated commits ([[CoordinatedCommits]]): the name must be
    // non-empty; the two conf payloads are coordinator-opaque JSON
    CoordinatedCommits.CoordinatorNameKey -> { v: String =>
      require(v.trim.nonEmpty,
        s"${CoordinatedCommits.CoordinatorNameKey} must name a coordinator")
    },
    CoordinatedCommits.CoordinatorConfKey -> { _: String => () },
    CoordinatedCommits.TableConfKey -> { _: String => () })

  /** Effective configuration of a snapshot (empty before the first
    * `metaData`). */
  def of(snap: Snapshot): Map[String, String] =
    snap.metadata.map(_.configuration).getOrElse(Map.empty)

  def appendOnly(config: Map[String, String]): Boolean =
    config.get(AppendOnly).exists(_.trim.equalsIgnoreCase("true"))

  /** Tolerant of FOREIGN-written configuration: validate() only guards
    * graft's own setProperties path, and a zero/garbage interval from
    * another writer would otherwise crash maybeCheckpoint (÷0) AFTER the
    * commit already landed — every successful write surfacing as a failure
    * (r11 review). Unparsable or non-positive values fall back to the
    * protocol default. */
  def checkpointInterval(config: Map[String, String]): Int =
    config.get(CheckpointInterval)
      .flatMap(v => scala.util.Try(v.trim.toInt).toOption)
      .filter(_ > 0).getOrElse(10)

  def logRetentionMillis(config: Map[String, String]): Long =
    config.get(LogRetention).map(parseIntervalMillis(_, LogRetention))
      .getOrElse(30L * 24 * 3600 * 1000)

  def deletedFileRetentionMillis(config: Map[String, String]): Long =
    config.get(DeletedFileRetention).map(parseIntervalMillis(_, DeletedFileRetention))
      .getOrElse(7L * 24 * 3600 * 1000)

  def deletionVectorsEnabled(config: Map[String, String]): Boolean =
    config.get(EnableDeletionVectors).exists(_.trim.equalsIgnoreCase("true"))

  def changeDataFeedEnabled(config: Map[String, String]): Boolean =
    config.get(EnableChangeDataFeed).exists(_.trim.equalsIgnoreCase("true"))

  def checkpointPolicy(config: Map[String, String]): String =
    config.get(CheckpointPolicy).map(_.trim.toLowerCase(java.util.Locale.ROOT))
      .getOrElse("classic")

  def rowTrackingEnabled(config: Map[String, String]): Boolean =
    config.get(EnableRowTracking).exists(_.trim.equalsIgnoreCase("true"))

  def checkpointStatsAsJson(config: Map[String, String]): Boolean =
    !config.get(CheckpointWriteStatsAsJson).exists(_.trim.equalsIgnoreCase("false"))

  def checkpointStatsAsStruct(config: Map[String, String]): Boolean =
    !config.get(CheckpointWriteStatsAsStruct).exists(_.trim.equalsIgnoreCase("false"))

  /** Stats-indexed column budget (-1 = unbounded; default 32). */
  def dataSkippingNumIndexedCols(config: Map[String, String]): Int =
    config.get(DataSkippingNumIndexedCols).map(_.trim.toInt).getOrElse(32)

  def inCommitTimestampsEnabled(config: Map[String, String]): Boolean =
    config.get(EnableInCommitTimestamps).exists(_.trim.equalsIgnoreCase("true"))

  /** First version governed by ICT (0 when enabled from birth). */
  def ictEnablementVersion(config: Map[String, String]): Long =
    config.get(IctEnablementVersion).map(_.trim.toLong).getOrElse(0L)

  def expiredLogCleanupEnabled(config: Map[String, String]): Boolean =
    !config.get(EnableExpiredLogCleanup).exists(_.trim.equalsIgnoreCase("false"))

  /** Fail fast on properties this engine would silently ignore or
    * mis-parse later: unknown `delta.`-prefixed keys and malformed values.
    * Non-`delta.` keys pass through untouched (user metadata). */
  def validate(props: Map[String, String]): Unit = props.foreach { case (k, v) =>
    Known.get(k) match {
      case Some(check) => check(v)
      case None if k.startsWith(Constraints.Prefix) =>
        require(v.trim.nonEmpty, s"$k: empty CHECK expression")
      case None if k.startsWith("delta.") =>
        throw new IllegalArgumentException(
          s"unknown delta table property '$k' (supported: " +
          s"${Known.keys.toSeq.sorted.mkString(", ")}, ${Constraints.Prefix}<name>)")
      case None => ()
    }
  }

  private def parseBoolean(key: String)(v: String): Unit = {
    val t = v.trim.toLowerCase(java.util.Locale.ROOT)
    require(t == "true" || t == "false", s"$key must be true|false, got '$v'")
  }

  private val IntervalRe =
    """(?i)^\s*(?:interval\s+)?(\d+)\s*(millisecond|second|minute|hour|day|week)s?\s*$""".r

  /** `"interval 30 days"` → milliseconds. */
  private[delta] def parseIntervalMillis(s: String, key: String): Long = s match {
    case IntervalRe(n, unit) =>
      // Locale.ROOT: the (?i) regex admits "MINUTES", whose default-locale
      // lowercase under tr is "mınutes" — a MatchError, not a parse
      val factor = unit.toLowerCase(java.util.Locale.ROOT) match {
        case "millisecond" => 1L
        case "second"      => 1000L
        case "minute"      => 60L * 1000
        case "hour"        => 3600L * 1000
        case "day"         => 24L * 3600 * 1000
        case "week"        => 7L * 24 * 3600 * 1000
      }
      n.toLong * factor
    case _ => throw new IllegalArgumentException(
      s"$key: cannot parse interval '$s' (expected e.g. \"interval 30 days\")")
  }
}
