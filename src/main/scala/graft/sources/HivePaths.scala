package graft.sources

/** Shared hive partition-path helpers — ONE decoder for both table
  * formats, so a fix to `%xx` handling reaches DeltaLite and
  * IcebergLite alike instead of drifting per format.
  */
private[graft] object HivePaths {

  /** The spec's null-partition directory value. */
  val NullMarker = "__HIVE_DEFAULT_PARTITION__"

  /** Reverse of Spark's partition-path escaping (`%xx` sequences; only
    * valid hex pairs decode — a literal '%' without one passes through);
    * the hive null marker decodes to null.
    */
  def unescape(raw: String): String =
    if (raw == NullMarker) null
    else {
      val sb = new StringBuilder
      var i = 0
      while (i < raw.length) {
        val c = raw.charAt(i)
        if (c == '%' && i + 2 < raw.length &&
            raw.substring(i + 1, i + 3).forall(ch =>
              Character.digit(ch, 16) >= 0)) {
          sb.append(Integer.parseInt(raw.substring(i + 1, i + 3), 16).toChar)
          i += 3
        } else { sb.append(c); i += 1 }
      }
      sb.toString
    }
}
