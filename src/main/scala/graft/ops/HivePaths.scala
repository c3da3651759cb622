package graft.ops

/** Hive-style partition-path helpers shared by [[ParquetTable]] and
  * [[SnapshotTable]]. */
private[ops] object HivePaths {

  /** Undo Hive/Spark partition-path escaping (`ExternalCatalogUtils
    * .escapePathName` semantics): `%xx` hex sequences ONLY. NOT URL
    * decoding — Hive leaves `+` literal, URLDecoder would turn it into a
    * space and a partition value containing '+' could dodge (or wrongly
    * match) a retention predicate. */
  def unescape(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length) {
        val hex = try Integer.parseInt(s.substring(i + 1, i + 3), 16) catch {
          case _: NumberFormatException => -1
        }
        if (hex >= 0) { sb.append(hex.toChar); i += 3 }
        else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Decoded first-level partition value of a (possibly multi-level)
    * relative partition path `col=v[/col2=v2...]`; None is the null slot
    * (`__HIVE_DEFAULT_PARTITION__`). */
  def decodeFirstValue(partPath: String, firstCol: String): Option[String] = {
    val raw = partPath.split('/').head.stripPrefix(firstCol + "=")
    val decoded = unescape(raw)
    if (decoded == "__HIVE_DEFAULT_PARTITION__") None else Some(decoded)
  }

  /** Raw (still-escaped) first-level partition value of a relative
    * partition path. */
  def rawFirstValue(partPath: String, firstCol: String): String =
    partPath.split('/').head.stripPrefix(firstCol + "=")
}

/** The partition-retention surface shared by the non-transactional
  * [[ParquetTable]] and the manifest-committed [[SnapshotTable]]: one
  * retention sweep ([[graft.batch.Maintenance.retentionPurge]]) drives
  * either backing store. */
trait PartitionedTableOps {
  def exists: Boolean

  /** Count-then-drop of whole first-level partitions whose *decoded
    * string value* satisfies `drop` (null partitions are passed as None).
    * Returns (rowsDeleted, dropped raw first-level partition values). */
  def purgePartitions(drop: Option[String] => Boolean): (Long, Seq[String])
}
