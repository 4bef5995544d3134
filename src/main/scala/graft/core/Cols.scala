package graft.core

/** Helper-column naming shared by operators that stage intermediate
  * columns on a caller's frame: `withColumn` silently REPLACES a
  * same-named input column, so fixed helper names corrupt frames that
  * happen to carry them. One nonce per operator call keeps the names
  * collision-free. */
object Cols {
  /** Fresh 8-hex-char nonce for suffixing helper-column names. */
  def nonce: String =
    java.util.UUID.randomUUID().toString.replace("-", "").take(8)
}
