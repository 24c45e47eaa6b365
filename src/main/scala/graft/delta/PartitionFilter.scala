package graft.delta

/** Partition-pruning predicates over Hive-style string partition values.
  *
  * Mirrors the reference's `PartitionFilter` (`rust/src/partitions.rs:9-52`):
  * ops `=`, `!=`, `in`, `not in` on **string** values, one filter per
  * partition key; a list of filters is a conjunction (DNF inner list — same
  * semantics PyArrow documents, `python/deltalake/table.py:96-111`).
  */
sealed trait PartitionFilter {
  def key: String

  /** True when a file with the given partitionValues survives this filter —
    * `match_partition` (`rust/src/partitions.rs:30-52`). A file lacking the
    * key does not match (reference behavior: filters on absent keys match
    * nothing). */
  def matches(partitionValues: Map[String, String]): Boolean
}

object PartitionFilter {
  final case class Eq(key: String, value: String) extends PartitionFilter {
    def matches(pv: Map[String, String]): Boolean = pv.get(key).contains(value)
  }
  final case class Ne(key: String, value: String) extends PartitionFilter {
    def matches(pv: Map[String, String]): Boolean = pv.get(key).exists(_ != value)
  }
  final case class In(key: String, values: Set[String]) extends PartitionFilter {
    def matches(pv: Map[String, String]): Boolean = pv.get(key).exists(values.contains)
  }
  final case class NotIn(key: String, values: Set[String]) extends PartitionFilter {
    def matches(pv: Map[String, String]): Boolean = pv.get(key).exists(v => !values.contains(v))
  }

  /** Parse `(key, op, value)` / `(key, op, values)` tuples — the reference's
    * `TryFrom<(&str, &str, &str)>` impls (`rust/src/partitions.rs:55-98`).
    * Invalid op ⇒ IllegalArgumentException (InvalidPartitionFilter). */
  def from(key: String, op: String, value: String): PartitionFilter = op match {
    case "="  => Eq(key, value)
    case "!=" => Ne(key, value)
    case other => throw new IllegalArgumentException(
      s"invalid partition filter op '$other' for single value (expected = or !=)")
  }

  def from(key: String, op: String, values: Seq[String]): PartitionFilter = op match {
    case "in"     => In(key, values.toSet)
    case "not in" => NotIn(key, values.toSet)
    case other => throw new IllegalArgumentException(
      s"invalid partition filter op '$other' for value list (expected in or not in)")
  }

  /** Keep files where ALL filters match — `get_files_by_partitions`' pruning
    * fold (`rust/src/delta.rs:733-766`), evaluated against
    * `Add.partitionValues` (authoritative; the reference re-derives from the
    * path, the log map is equivalent and cheaper). */
  def prune(files: Seq[AddAction], filters: Seq[PartitionFilter]): Seq[AddAction] =
    if (filters.isEmpty) files
    else files.filter(f => filters.forall(_.matches(f.partitionValues)))
}
