package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-portable 60-bit hash: the first 15 hex chars of md5, read as a
  * non-negative BIGINT. Both engines in the correctness gate state it
  * identically:
  *
  *  - Spark:  `conv(substring(md5(s), 1, 15), 16, 10)::long`
  *  - DuckDB: `('0x' || substr(md5(s), 1, 15))::BIGINT`
  *
  * This replaces `xxhash64` as the hashing primitive behind MinHash,
  * SimHash and the ANN LSH hyperplanes (round-1 verdict: xxhash64 has no
  * DuckDB twin, which left those operators without an oracle). md5 is
  * slower than xxhash64 per call but the hash sits in a scan-parallel
  * map stage — at 100TB it stays embarrassingly parallel and is never the
  * shuffle bottleneck.
  *
  * Multi-part keys are joined with the 0x01 separator (same `concat_ws`
  * in both engines) so (i, "ab") never collides with (i+10, "b").
  */
object PortableHash {

  /** 60-bit portable hash of the concatenated parts (ints/strings only —
    * float-to-string rendering is NOT engine-portable).
    */
  def phash(parts: Column*): Column = {
    val key = if (parts.size == 1) parts.head.cast("string")
              else concat_ws("\u0001", parts: _*)
    conv(substring(md5(key), 1, 15), 16, 10).cast("long")
  }

  /** The DuckDB statement of [[phash]] over pre-rendered SQL expressions. */
  def phashSql(parts: String*): String = {
    val key = if (parts.size == 1) s"(${parts.head})::VARCHAR"
              else parts.mkString("concat_ws(chr(1), ", ", ", ")")
    s"('0x' || substr(md5($key), 1, 15))::BIGINT"
  }
}

/** Driver-side (plain JVM) evaluation of the same hash — used to bake
  * pure-function-of-constants derivations (e.g. LSH hyperplane components)
  * into literal arrays instead of re-hashing per row.
  */
object PortableHashJvm {
  def phash(parts: Any*): Long = {
    val key = parts.map(_.toString).mkString("\u0001")
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(key.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }
}
