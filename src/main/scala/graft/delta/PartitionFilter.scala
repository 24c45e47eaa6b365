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

  /** Rebuild a filter with its partition key renamed — the logical→physical
    * translation point for column-mapped tables, whose `partitionValues`
    * are keyed by at-rest physical names. */
  def mapKey(f: PartitionFilter, rename: String => String): PartitionFilter =
    f match {
      case Eq(k, v)     => Eq(rename(k), v)
      case Ne(k, v)     => Ne(rename(k), v)
      case In(k, vs)    => In(rename(k), vs)
      case NotIn(k, vs) => NotIn(rename(k), vs)
    }

  /** Keep files where ALL filters match — `get_files_by_partitions`' pruning
    * fold (`rust/src/delta.rs:733-766`), evaluated against
    * `Add.partitionValues` (authoritative; the reference re-derives from the
    * path, the log map is equivalent and cheaper). */
  def prune(files: Seq[AddAction], filters: Seq[PartitionFilter]): Seq[AddAction] =
    if (filters.isEmpty) files
    else files.filter(f => filters.forall(_.matches(f.partitionValues)))

  /** Partition-column constraints IMPLIED by a Catalyst predicate: every
    * top-level conjunct of the form `partCol = lit` / `partCol IN (lits)` /
    * `partCol != lit` becomes a filter. The result is a NECESSARY condition
    * of the predicate — rows (and therefore files) matching the predicate
    * always lie inside the returned domain — which is what conflict
    * detection needs: it may only be used to prove a concurrent add
    * DISJOINT from the predicate's read set. Unrecognized shapes (OR,
    * non-literal comparands, expressions over the column) contribute
    * nothing, degrading toward the conservative whole-table domain.
    *
    * `qualifier`: when set, qualified references must carry that qualifier
    * (the MERGE target alias); unqualified references always bind. Literal
    * rendering matches the writer's Hive-style partition strings (long 5 →
    * "5", string as-is). */
  def fromCatalyst(pred: org.apache.spark.sql.catalyst.expressions.Expression,
                   partCols: Seq[String],
                   qualifier: Option[String] = None): Seq[PartitionFilter] = {
    import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction}
    import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, EqualTo, Literal, Not, Expression, In => CIn}

    // Column-API predicates convert to UnresolvedFunction('=' / 'in' / 'and'
    // / '!') before analysis; SQL-path predicates may arrive as the typed
    // nodes. Normalize both shapes.
    object UF {
      def unapply(e: Expression): Option[(String, Seq[Expression])] = e match {
        case f: UnresolvedFunction if f.nameParts.lengthCompare(1) == 0 =>
          Some((f.nameParts.head.toLowerCase(java.util.Locale.ROOT), f.arguments))
        case _ => None
      }
    }
    // Locale.ROOT case-fold throughout: a default-locale fold breaks
    // I-containing names under tr ("ID" -> "ıd" vs "id" -> "id")
    def fold(s: String) = s.toLowerCase(java.util.Locale.ROOT)
    // resolve to the CANONICAL partition-column spelling, never the user's:
    // a filter keyed "ID" matches no add's partitionValues (keyed "id"), so
    // the read domain would be EMPTY and conflict detection would wrongly
    // prove disjointness against every concurrent append (r11 review —
    // lost-update, the opposite of the necessary over-approximation this
    // function's contract demands)
    val canonical = partCols.map(c => fold(c) -> c).toMap
    def attrName(e: Expression): Option[String] = e match {
      case a: AttributeReference => canonical.get(fold(a.name))
      case u: UnresolvedAttribute =>
        u.nameParts match {
          case Seq(c) => canonical.get(fold(c))
          case Seq(q, c) if qualifier.exists(_.equalsIgnoreCase(q)) =>
            canonical.get(fold(c))
          case _ => None
        }
      case _ => None
    }
    // Only literal types whose `toString` coincides with the writer's
    // Hive-style partition rendering may produce a filter value. Typed
    // date/timestamp/decimal literals carry INTERNAL representations
    // (days-since-epoch Int, micros Long, Decimal) whose string form never
    // equals the partition string, so an Eq/In built from them would
    // under-approximate the read domain and let conflict detection wrongly
    // prove disjointness. For those we return None: the conjunct is dropped
    // and the domain degrades to the conservative whole-table read set.
    def litStr(e: Expression): Option[String] = e match {
      case l: Literal =>
        l.dataType match {
          case org.apache.spark.sql.types.StringType =>
            Option(l.value).map(_.toString)
          case org.apache.spark.sql.types.ByteType | org.apache.spark.sql.types.ShortType |
               org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType |
               org.apache.spark.sql.types.BooleanType =>
            Option(l.value).map(_.toString)
          case _ => None
        }
      case _ => None
    }
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case UF("and", Seq(l, r)) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    def asEq(e: Expression): Option[(Expression, Expression)] = e match {
      case EqualTo(a, b) => Some((a, b))
      case UF("=", Seq(a, b)) => Some((a, b))
      case _ => None
    }
    def asNot(e: Expression): Option[Expression] = e match {
      case Not(x) => Some(x)
      case UF("!", Seq(x)) => Some(x)
      case UF("not", Seq(x)) => Some(x)
      case _ => None
    }
    def asIn(e: Expression): Option[(Expression, Seq[Expression])] = e match {
      case CIn(a, vs) => Some((a, vs))
      case UF("in", a +: vs) if vs.nonEmpty => Some((a, vs))
      case _ => None
    }
    def eqFilter(a: Expression, b: Expression, mk: (String, String) => PartitionFilter) =
      attrName(a).flatMap(n => litStr(b).map(mk(n, _)))
        .orElse(attrName(b).flatMap(n => litStr(a).map(mk(n, _))))

    conjuncts(pred).flatMap { c =>
      asEq(c).flatMap { case (a, b) => eqFilter(a, b, Eq.apply) }
        .orElse(asNot(c).flatMap(asEq).flatMap { case (a, b) => eqFilter(a, b, Ne.apply) })
        .orElse(asIn(c).flatMap { case (a, vs) =>
          val strs = vs.map(litStr)
          if (strs.forall(_.isDefined)) attrName(a).map(n => In(n, strs.flatten.toSet))
          else None
        })
    }
  }
}
