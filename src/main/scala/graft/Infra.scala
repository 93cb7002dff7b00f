package graft

/** Tiny shared infrastructure for the driver-facing entry points —
  * ONE copy of the JSON emit helpers and the temp-tree delete that
  * Bench, Verify, SparkEntry and Tables each hand-rolled (r20 review
  * finding: three rm-trees and two byte-identical escape loops had to
  * be fixed in lockstep). */
private[graft] object Json {

  /** JSON string escape: quote, backslash, and ALL control chars —
    * Spark exception messages are multi-line and builder-authored SQL
    * carries tabs; an unescaped one makes the driver's json.load fail
    * and silently zero a round's artifact. */
  def str(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => "\\u%04x".format(c.toInt)
    case c => c.toString
  } + "\""

  /** Fixed 4-decimal number, LOCALE-PINNED: Scala's bare f"$d%.4f"
    * formats with the JVM default locale, and a comma-decimal locale
    * (de, fr, ...) would emit 0,1234 — invalid JSON that fails the
    * driver's parse AND corrupts the next round's prior-minutes fold
    * (r20 review finding; Kernels.scala pins Locale.ROOT for exactly
    * this bug class). */
  def num(d: Double): String =
    String.format(java.util.Locale.ROOT, "%.4f", java.lang.Double.valueOf(d))
}

private[graft] object FsUtil {

  /** Recursive delete, tolerant of concurrent removal and of entries
    * that refuse to die (best-effort temp hygiene, never a crash).
    * Directory SYMLINKS are deleted as links, never followed — the
    * Files.walk-based predecessor didn't follow links, and recursing
    * through one would wipe the TARGET's contents (r20 advisor
    * finding). */
  def rmTree(f: java.io.File): Unit = {
    if (!java.nio.file.Files.isSymbolicLink(f.toPath))
      Option(f.listFiles()).foreach(_.foreach(rmTree))
    f.delete(): Unit
  }
}
