package graft

/** JSON-number/string formatting shared by the measurement mains
  * (Bench, ScaleLadder, StreamLadder) — one definition of the two
  * bugs this guards against instead of three copies:
  *  - Locale.ROOT pins the decimal separator to '.': the
  *    default-locale f-interpolator emits "1,234" under comma-decimal
  *    locales (de_DE, fr_FR), which is invalid JSON.
  *  - error strings embed in one-line JSON records, so quotes,
  *    newlines, backslashes AND other control characters must go (a
  *    StreamingQueryException's toString carries an "=== Streaming
  *    Query ===" block on its own lines — committed raw records once
  *    split across lines and broke every line-oriented reader; an
  *    exception message quoting a regex or Windows path would embed a
  *    bare '\' and produce invalid JSON the same way).
  */
object JsonFmt {
  def ms(v: Double): String =
    String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

  def err(e: Throwable, max: Int = 300): String =
    e.toString
      .replace("\\", "/")          // backslash first: '\' never survives
      .replace("\"", "'")
      .replaceAll("[\\p{Cntrl}]+", " ") // tabs, newlines, NULs, ...
      .take(max)
}
