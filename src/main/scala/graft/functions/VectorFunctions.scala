package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<float>`/`array<double>` columns, built on
  * Spark's higher-order array functions (`zip_with`/`aggregate`) so the
  * arithmetic is codegen'd and fully distributed — no UDF, no MLlib
  * dependency in the hot path.
  *
  * Accumulation is sequential in index order (aggregate folds left), so
  * results are bit-deterministic for a given input — safe to hash-compare.
  */
object VectorFunctions {

  /** Cast any numeric array to array<double> for stable arithmetic. */
  def asDouble(v: Column): Column = transform(v, x => x.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(asDouble(a), asDouble(b), (x, y) => x * y),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity with zero-norm guard. */
  def cosine(a: Column, b: Column): Column = {
    val d  = dot(a, b)
    val nn = norm(a) * norm(b)
    when(nn > 0, d / nn).otherwise(lit(0.0))
  }

  /** Squared euclidean distance (no sqrt — the PQ/ADC accumulant). */
  def sqL2(a: Column, b: Column): Column =
    aggregate(zip_with(asDouble(a), asDouble(b), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, v) => acc + v)

  def l2Distance(a: Column, b: Column): Column = sqrt(sqL2(a, b))

  /** Unit-normalized copy of the vector (zero vector passes through). */
  def normalized(a: Column): Column = {
    val n = norm(a)
    when(n > 0, transform(asDouble(a), x => x / n)).otherwise(asDouble(a))
  }
}
