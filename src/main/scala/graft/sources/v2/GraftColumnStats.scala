package graft.sources.v2

import java.util
import java.util.{Optional, OptionalLong}

import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.read.colstats.ColumnStatistics
import org.apache.spark.sql.types._

import graft.sources.ManifestTable

/** Per-COLUMN statistics for the Catalyst optimizer, folded from the
  * manifest's per-file footer stats — min/max, null counts and exact
  * row counts the write path already records. With CBO enabled this is
  * what lets the optimizer decide a join strategy AT PLAN TIME from
  * always-fresh metadata (the classic CBO failure mode — stale ANALYZE
  * tables — cannot happen here: the stats travel with every commit),
  * instead of waiting for AQE to observe runtime sizes mid-query.
  *
  * Emission is honest-or-silent: a column reports bounds only when
  * EVERY live file carries same-kind stats for it (so the fold covers
  * the whole table; a DV'd file's superset bounds stay valid as
  * ESTIMATES), null counts only when every file recorded them. File
  * stats are keyed by PHYSICAL column names; the rename map translates
  * each logical schema field to its in-file key and the statistic is
  * reported under the LOGICAL name the optimizer sees — a renamed
  * column keeps its CBO stats (the mapping is pure metadata; dropped
  * physical columns are absent from the logical schema and never
  * looked up). */
object GraftColumnStats {

  def forFiles(files: Seq[ManifestTable.FileEntry],
               tags: Map[String, String],
               schema: StructType): util.Map[NamedReference, ColumnStatistics] = {
    val m = new util.HashMap[NamedReference, ColumnStatistics]()
    if (files.isEmpty) return m
    val inv: Map[String, String] = ManifestTable.renameInfo(tags)._1.map(_.swap)
    // footer stats count PRE-deletion-vector rows: min/max stay valid
    // as superset ESTIMATES, but a null count over deleted rows can
    // EXCEED the DV-exact live row count and hand FilterEstimation an
    // out-of-range null fraction — omit it when any file carries a DV
    val anyDv = files.exists(_.dv.nonEmpty)
    schema.fields.foreach { f =>
      val physName = inv.getOrElse(f.name, f.name)
      val per = files.map(_.stats.get(physName))
      if (per.forall(_.isDefined)) {
        val ss = per.map(_.get)
        val kinds = ss.map(_.kind).distinct
        if (kinds.size == 1) {
          val kind = kinds.head
          val nulls =
            if (!anyDv && ss.forall(_.nulls >= 0))
              OptionalLong.of(ss.map(_.nulls).sum)
            else OptionalLong.empty()
          // only the ordered-numeric kinds carry parseable bounds —
          // 's' (string) bounds are unused by the estimator, and '_'
          // (all-null / unsupported type / NaN) records EMPTY bounds
          // that must never reach BigDecimal
          val (mn, mx) =
            if (kind != 'n' && kind != 'd' && kind != 't')
              (Optional.empty[Object](), Optional.empty[Object]())
            else {
              // numeric kinds canonicalize as decimal strings ('d' epoch
              // days, 't' epoch micros, 'n' plain) — fold exactly
              val mins = ss.map(s => BigDecimal(s.min))
              val maxs = ss.map(s => BigDecimal(s.max))
              (toCatalyst(kind, f.dataType, mins.min),
                toCatalyst(kind, f.dataType, maxs.max))
            }
          // the estimator requires an NDV to use min/max at all; the
          // manifest records value counts, not distinct counts. The
          // honest bound is two-sided: at most the NON-null value
          // count, and for integral/date kinds at most the value-range
          // width (max - min + 1) — the latter is what keeps a
          // low-cardinality coded column from reporting a huge ndv and
          // collapsing equality selectivity toward zero (the
          // wrongly-broadcast-a-big-side failure mode).
          val nonNull =
            if (ss.forall(s => s.count >= 0 && s.nulls >= 0))
              Some(math.max(0L, ss.map(_.count).sum - ss.map(_.nulls).sum))
            else None
          val rangeWidth = (kind, f.dataType) match {
            case ('n', LongType | IntegerType | ShortType | ByteType) |
                 ('d', DateType) =>
              // BigDecimal.toLong TRUNCATES mod 2^64 (never throws), so
              // a near-full-Long range (hash-valued ids) must be
              // detected explicitly — a wrapped width would clamp ndv
              // to garbage and collapse join selectivity estimates
              val w = ss.map(s => BigDecimal(s.max)).max -
                ss.map(s => BigDecimal(s.min)).min + 1
              if (w.isValidLong) Some(w.toLong) else None
            case _ => None
          }
          // a table opted into per-file HLL sketches ([[ManifestTable
          // .NdvColsProp]]) gets HONEST ndv: sketches merge across files
          // (per-file distinct COUNTS cannot — |A ∪ B| ≠ |A| + |B|), so
          // string/high-cardinality join keys stop falling back to the
          // non-null count and equality/join selectivity estimates stop
          // collapsing. COVERAGE-weighted, not all-or-nothing: the union
          // of the sketched files is reported while the sketch-less
          // files hold ≤ 5% of live rows — a sub-floor micro-commit
          // ([[ManifestTable.AutoNdvMinRowsKey]]) or one failed pass
          // must not erase table ndv. The error direction is SAFE by
          // construction: uncovered files can only add distincts, so
          // the union UNDERSTATES ndv, which inflates row estimates —
          // the opposite of the wrongly-broadcast-a-big-side failure
          // (overstated ndv → collapsed selectivity) the sketches fix.
          // Beyond 5% (a table actually built of micro-commits, or
          // mixed legacy files) the fold declines to the hard bounds
          // below until OPTIMIZE's above-floor rewrite restores
          // coverage. DV'd files overcount slightly — ndv is an
          // estimate by contract.
          val sketchNdv: Option[Long] = {
            val paired = files.zip(ss)
            val (sk, unsk) = paired.partition(_._2.ndv.isDefined)
            val covered = sk.nonEmpty && (unsk.isEmpty ||
              (paired.forall(_._1.rows >= 0) && {
                val total = paired.map(_._1.rows).sum
                total > 0 && unsk.map(_._1.rows).sum * 20L <= total
              }))
            if (covered) {
              try {
                val u = new org.apache.datasketches.hll.Union(12)
                sk.foreach { case (_, s) =>
                  u.update(org.apache.datasketches.hll.HllSketch
                    .heapify(java.util.Base64.getDecoder.decode(s.ndv.get)))
                }
                Some(math.max(1L, math.round(u.getEstimate)))
              } catch { case scala.util.control.NonFatal(_) => None }
            } else None
          }
          val ndv = (sketchNdv, nonNull, rangeWidth) match {
            case (Some(e), nn, w) =>
              // the sketch estimate, clamped by the hard bounds
              val cap = Seq(nn, w).flatten.reduceOption(math.min(_, _))
              OptionalLong.of(math.max(1L, cap.fold(e)(math.min(e, _))))
            case (None, Some(c), Some(w)) => OptionalLong.of(math.max(1L, math.min(c, w)))
            case (None, Some(c), None)    => OptionalLong.of(math.max(1L, c))
            case _                        => OptionalLong.empty()
          }
          if (mn.isPresent || mx.isPresent || nulls.isPresent || sketchNdv.isDefined)
            m.put(Expressions.column(f.name), new ColumnStatistics {
              override def min(): Optional[Object] = mn
              override def max(): Optional[Object] = mx
              override def nullCount(): OptionalLong = nulls
              override def distinctCount(): OptionalLong = ndv
            })
        }
      }
    }
    m
  }

  /** A folded bound in the CATALYST-internal representation the
    * estimator expects for the column's type — or absent on any
    * kind/type disagreement (never guess). */
  private def toCatalyst(kind: Char, dt: DataType,
                         v: BigDecimal): Optional[Object] = (kind, dt) match {
    case ('n', LongType)      => Optional.of(Long.box(v.toLong))
    case ('n', IntegerType)   => Optional.of(Int.box(v.toInt))
    case ('n', ShortType)     => Optional.of(Short.box(v.toShort))
    case ('n', ByteType)      => Optional.of(Byte.box(v.toByte))
    case ('n', DoubleType)    => Optional.of(Double.box(v.toDouble))
    case ('n', FloatType)     => Optional.of(Float.box(v.toFloat))
    case ('n', d: DecimalType) =>
      Optional.of(Decimal(v, d.precision, d.scale))
    case ('d', DateType)      => Optional.of(Int.box(v.toInt))
    case ('t', TimestampType) => Optional.of(Long.box(v.toLong))
    case _                    => Optional.empty()
  }
}
