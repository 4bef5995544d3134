package graft.core

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.StructType

/** Per-session bounded memo of parquet read schemas over IMMUTABLE
  * artifacts — write-once generation/dataset dirs (ManifestTable) and
  * the static bench input files (Tables). One shared implementation so
  * the bound and the keying rules cannot drift between the two users
  * (r20 review finding: the writer-seed path bypassed the read-side
  * bound, an unbounded driver leak on a micro-committing stream sink).
  *
  * Keyed per SparkSession: schema inference depends on session confs
  * (e.g. nanosAsLong), and two differently-configured sessions in one
  * JVM must not share entries. Sessions are held weakly. Entries are
  * tiny (a path string + StructType); the cap is generous and
  * clear-on-overflow keeps the structure trivial — a long-lived
  * session touching millions of artifacts must not hold them all.
  */
object SchemaMemo {
  val MaxEntries = 8192

  private val sessions =
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[String, StructType]]()

  private def forSession(spark: SparkSession)
      : java.util.concurrent.ConcurrentHashMap[String, StructType] =
    sessions.synchronized {
      var m = sessions.get(spark)
      if (m == null) {
        m = new java.util.concurrent.ConcurrentHashMap[String, StructType]()
        sessions.put(spark, m)
      }
      m
    }

  /** The memoized schema for `key`, or null. */
  def get(spark: SparkSession, key: String): StructType =
    forSession(spark).get(key)

  /** Memoize `schema` under `key`, clearing the session's memo first if
    * it has reached [[MaxEntries]]. */
  def put(spark: SparkSession, key: String, schema: StructType): Unit = {
    val m = forSession(spark)
    if (m.size >= MaxEntries) m.clear()
    m.put(key, schema)
    ()
  }
}
