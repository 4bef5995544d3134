package graft.sources

import org.apache.spark.sql.types._

/** Typed identity-partition columns: the DECLARED types a table's hive
  * layout columns read back as, and the canonical directory-encoding
  * proof that makes typed predicates consumable EXACTLY.
  *
  * The manifest stores every partition value as the directory STRING
  * (the round-trip invariant `normalizePartitionCols` enforces at every
  * write boundary — rewrites must re-spell values identically). A table
  * whose CREATE declared a layout column as INT/BIGINT/SMALLINT/TINYINT
  * /DATE records that declaration in [[ManifestTable.PartitionTypesTag]]
  * and reads the column back CAST to the declared type, so
  * `WHERE day = DATE '2026-08-01'` pushes as a plain typed filter on
  * `day` — no cast wraps the attribute, which is what lets the scan
  * consume the predicate exactly and keep aggregates pushable under it.
  *
  * The safe set is exactly the types whose canonical rendering is
  * PROVABLE per value: integral types render as plain decimal digits
  * (`Int.toString` round-trips), DATE as ISO `yyyy-MM-dd`
  * (`LocalDate.toString` round-trips — the same rendering Spark's hive
  * partition writer produces from a date value). TIMESTAMP is refused
  * (directory encodings escape `:` and vary by session zone — the
  * round-trip can't be proven; partition on `days(ts)`/`hours(ts)`
  * instead), as are float/decimal/boolean (non-unique renderings, e.g.
  * `7.0` vs `7.00`). Non-safe declared types keep the engine's
  * string-pinned read-back and advisory-prune-plus-re-filter exactly as
  * before — a PINNED refusal, not a silent wrong answer. */
object PartitionTypes {

  /** Declared types a layout column may read back as. */
  val SafeTypes: Set[DataType] =
    Set(ByteType, ShortType, IntegerType, LongType, DateType)

  /** The Catalyst-internal value of `s` under `dt` — defined iff `s`
    * is the CANONICAL rendering of that value (parse, re-render,
    * compare): `"7"` parses for INT, `"07"`/`" 7"`/`"7.0"` do not;
    * `"2026-01-02"` parses for DATE, `"2026-1-2"` does not. A consumed
    * partition predicate has no re-filter above the scan, so the
    * per-file decision may only claim exactness on values this proof
    * covers; anything else declines to the advisory prune. Agrees with
    * Spark's `cast(string AS dt)` on every accepted value by
    * construction (canonical renderings are a subset of what the cast
    * accepts). */
  def canonical(s: String, dt: DataType): Option[Any] = {
    if (s == null) return None
    dt match {
      case ByteType =>
        s.toByteOption.filter(_.toString == s).map(Byte.box)
      case ShortType =>
        s.toShortOption.filter(_.toString == s).map(Short.box)
      case IntegerType =>
        s.toIntOption.filter(_.toString == s).map(Int.box)
      case LongType =>
        s.toLongOption.filter(_.toString == s).map(Long.box)
      case DateType =>
        // toIntExact stays inside the Try: a canonically-rendered
        // far-future date (epoch day past Int range) must DECLINE to
        // the advisory path, never throw from scan planning
        scala.util.Try(Int.box(Math.toIntExact(
            java.time.LocalDate.parse(s).toEpochDay))).toOption
          .filter(d => java.time.LocalDate.ofEpochDay(d.toLong).toString == s)
      case _ => None
    }
  }

  /** Decode the [[ManifestTable.PartitionTypesTag]] value (a
    * StructType json of the typed layout fields) to name → type;
    * empty when absent or unreadable (unreadable degrades to the
    * string-pinned read — never an error on a read path). */
  def fromTag(tag: Option[String]): Map[String, DataType] =
    tag.flatMap(json => scala.util.Try(
      DataType.fromJson(json).asInstanceOf[StructType]).toOption)
      .map(_.fields.map(f => f.name -> f.dataType)
        .filter { case (_, t) => SafeTypes.contains(t) }.toMap)
      .getOrElse(Map.empty)

  /** Encode typed layout fields for the tag. */
  def toTag(fields: Seq[StructField]): String = StructType(fields).json
}
