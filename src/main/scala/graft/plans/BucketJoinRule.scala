package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, AttributeReference, EqualTo, Expression, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

import graft.sources.ManifestTable
import graft.sources.v2.GraftTable

/** Makes storage-partitioned joins fire on the NATURAL join shape: a
  * user joining two co-bucketed graft_lake tables writes
  * `ON a.k = b.k` — this rule injects the implied
  * `a.k_bucket = b.k_bucket` conjunct (both columns are
  * `pmod(hash(key), n)` of their side's key with the same n, so equal
  * keys provably imply equal buckets; the write boundary verifies every
  * stored value equals its definition). With the conjunct present the
  * scans' KeyGroupedPartitioning satisfies the join's distribution and
  * the Exchange on both sides disappears — without it the user would
  * have to know the generated column's name and spell the equality by
  * hand.
  *
  * Division of labor with the TRANSFORM-shaped reporting: single-column
  * layouts report `bucket(n, src)` from the scan (a `ReducibleFunction`
  * resolved through the catalog — [[graft.sources.v2.GraftBucketFunction]]),
  * which co-partitions the natural shape on its own AND reduces
  * DIVISIBLE cross-count pairs (a 32-bucket fact joins a 16-bucket dim
  * zero-Exchange: `pmod(h,32) mod 16 = pmod(h,16)`). This rule remains
  * the co-partitioning vehicle for MULTI-COLUMN layouts — their tuple
  * transform would resolve through Spark's generic named-function
  * surface without a bucket count, forfeiting reduction, so they report
  * identity values and need the stored-column equality injected; for
  * single-column layouts the injected conjunct is redundant defense in
  * depth (harmless: an implied-true equality). EQUAL counts only, by
  * contract, for the identity shape: "17" (mod 32) never equals "1"
  * (mod 16) as a VALUE compare. NON-divisible count pairs keep the
  * shuffled plan in every shape (correct, just not co-partitioned) —
  * BucketedJoinSpec pins both the 2:1 reduction and that refusal.
  *
  * Conservative by construction: only fires on equi-conjuncts between
  * two attribute references whose legs are Project/Filter chains over
  * graft_lake relations with matching bucket(n, src) layouts; legs that
  * pruned the bucket column get it re-added through their Projects and
  * the ORIGINAL join output is restored by a wrapping Project, so the
  * plan above never sees a new column. Adding an implied-true conjunct
  * never changes join semantics (inner or outer: the extra equality
  * holds exactly on the rows the original keys matched; NULL keys never
  * matched before and still don't). Idempotent: a pair whose bucket
  * equality is already present is skipped. */
class GraftBucketJoinConjunct(spark: SparkSession) extends Rule[LogicalPlan]
    with PredicateHelper {

  private val EnabledKey = "spark.graft.autoBucketJoin.enabled"

  /** The leg's underlying graft table, when the leg is a transparent
    * Project/Filter chain over one. */
  private def legTable(plan: LogicalPlan): Option[GraftTable] = plan match {
    case r: DataSourceV2Relation => r.table match {
      case t: GraftTable => Some(t)
      case _ => None
    }
    case p: Project => legTable(p.child)
    case f: Filter => legTable(f.child)
    case _ => None
  }

  /** (bucket column name, source column names, bucket count) of the
    * table's layout — cached ON the table instance
    * ([[GraftTable.bucketLayoutInfo]]), so a multi-join query costs
    * zero extra manifest reads per fixed-point iteration and the
    * layout snapshot is the one the table itself was loaded with. */
  private def bucketOf(t: GraftTable): Option[(String, Seq[String], Int)] =
    t.bucketLayoutInfo

  /** The leg rebuilt so `attr` (a column of its underlying relation) is
    * visible at the top: Filters are transparent, Projects re-add it. */
  private def expose(plan: LogicalPlan, attr: Attribute): LogicalPlan = plan match {
    case p: Project =>
      if (p.outputSet.contains(attr)) p
      else p.copy(projectList = p.projectList :+ attr,
        child = expose(p.child, attr))
    case f: Filter => f.copy(child = expose(f.child, attr))
    case other => other // the relation itself: attr already in output
  }

  private def relationAttr(plan: LogicalPlan, name: String): Option[Attribute] =
    plan.collectFirst {
      case r: DataSourceV2Relation if r.table.isInstanceOf[GraftTable] =>
        r.output.find(_.name.equalsIgnoreCase(name))
    }.flatten

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!spark.conf.get(EnabledKey, "true").toBoolean) return plan
    plan.transformUp {
      case j @ Join(left, right, _, Some(cond), _)
          if legTable(left).isDefined && legTable(right).isDefined =>
        val (lt, rt) = (legTable(left).get, legTable(right).get)
        (bucketOf(lt), bucketOf(rt)) match {
          case (Some((lbName, lSrcs, ln)), Some((rbName, rSrcs, rn)))
              if ln == rn && lSrcs.length == rSrcs.length =>
            val conjuncts = splitConjunctivePredicates(cond)
            // the key equalities this rule keys on: EVERY positional
            // source-column pair equated (either orientation) — a
            // multi-column bucket hashes the source TUPLE, so equal
            // buckets follow only from ALL members being equal, in the
            // layouts' shared order. Matching is by ATTRIBUTE IDENTITY
            // (exprId) against the relation's OWN source-column
            // attribute, never by name: a leg like
            // `SELECT other_col AS k FROM bucketed_t` exposes an
            // attribute NAMED like the source key whose values the
            // stored bucket column did not hash — injecting the bucket
            // equality there would silently drop matching rows. A
            // pass-through Project keeps the relation attribute's
            // exprId, so the legitimate shapes still match; an Alias
            // mints a fresh exprId and is rejected by construction.
            // Same-type is implied (both sides ARE the stored source
            // columns, same layout (srcs, n)); the analyzer would wrap a
            // cross-type comparison in Casts that break the
            // AttributeReference pattern anyway.
            val keyed = lSrcs.zip(rSrcs).forall { case (lSrc, rSrc) =>
              (relationAttr(left, lSrc), relationAttr(right, rSrc)) match {
                case (Some(lk), Some(rk)) => conjuncts.exists {
                  case EqualTo(a: AttributeReference, b: AttributeReference) =>
                    (a.semanticEquals(lk) && b.semanticEquals(rk)) ||
                    (a.semanticEquals(rk) && b.semanticEquals(lk))
                  case _ => false
                }
                case _ => false
              }
            }
            val already = conjuncts.exists {
              case EqualTo(a: AttributeReference, b: AttributeReference) =>
                Set(a.name.toLowerCase, b.name.toLowerCase) ==
                  Set(lbName.toLowerCase, rbName.toLowerCase)
              case _ => false
            }
            (keyed && !already,
              relationAttr(left, lbName), relationAttr(right, rbName)) match {
              case (true, Some(lb), Some(rb)) =>
                val originalOutput: Seq[Attribute] = j.output
                val newJoin = j.copy(
                  left = expose(left, lb), right = expose(right, rb),
                  condition = Some(And(cond, EqualTo(lb, rb))))
                if (newJoin.output == originalOutput) newJoin
                else Project(originalOutput, newJoin)
              case _ => j
            }
          case _ => j
        }
    }
  }
}
