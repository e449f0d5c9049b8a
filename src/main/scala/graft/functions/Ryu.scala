package graft.functions

/** Shortest round-trip decimal rendering of doubles, matching the text the
  * reference emits through the Rust `ryu` crate (JSON floats via serde_json,
  * `/root/reference/pq2json/src/converter.rs:291-295`; CSV floats via
  * `ryu::Buffer` at `converter.rs:196-197`).
  *
  * Java 17's `Double.toString` is NOT shortest-round-trip (that landed in
  * JDK 19) and formats differently anyway ("1.0E300" vs ryu's "1e300"), so
  * we derive the shortest digit string ourselves: try 1..17 significant
  * digits through `%e` formatting until the text parses back to the exact
  * same double — the classic trial loop, guaranteed shortest and correct.
  * Formatting then follows ryu's pretty printer: positional notation while
  * the decimal exponent is in [-5, 15], scientific (`d.ddde±x`, lowercase
  * `e`, no `+`) outside it; integral positional values keep a trailing
  * ".0".
  */
object Ryu {

  /** serde_json-style float text; caller must ensure `d` is finite
    * (NaN/Inf render as JSON null upstream, `converter.rs:291-295`). */
  def shortest(d: Double): String = {
    if (d == 0.0) return if (1.0 / d < 0) "-0.0" else "0.0"
    val neg = d < 0
    val ad = math.abs(d)
    // Seed the shortest-digit search from the JDK's repr: Double.toString
    // round-trips by contract and is at most a digit or two longer than
    // shortest, so instead of trying 1..17 significant digits upward
    // (~8-15 String.format calls per value) we start at the JDK's digit
    // count and walk DOWN while the text still round-trips (~2-3 calls).
    val jdk = java.lang.Double.toString(ad)
    var jdkSig = 0
    var seenNonZero = false
    var zeroRun = 0
    var i = 0
    while (i < jdk.length && jdk.charAt(i) != 'E') {
      val c = jdk.charAt(i)
      if (c >= '1' && c <= '9') { seenNonZero = true; jdkSig += zeroRun + 1; zeroRun = 0 }
      else if (c == '0' && seenNonZero) zeroRun += 1
      i += 1
    }
    if (jdkSig == 0) jdkSig = 1
    // Locale.ROOT: default-locale %e would emit "1,5e+00" under comma-
    // decimal locales (de_DE, ...) and the parse-back would throw.
    def fmt(p: Int): String =
      java.lang.String.format(java.util.Locale.ROOT, "%." + (p - 1) + "e",
        java.lang.Double.valueOf(ad))
    var p = jdkSig
    var s = fmt(p)
    while (java.lang.Double.parseDouble(s) != ad && p < 17) { p += 1; s = fmt(p) } // safety
    var shrunk = true
    while (p > 1 && shrunk) {
      val s2 = fmt(p - 1)
      if (java.lang.Double.parseDouble(s2) == ad) { p -= 1; s = s2 } else shrunk = false
    }
    val ei = s.indexOf('e')
    var digits = {
      val mant = s.substring(0, ei).replace(".", "")
      var end = mant.length
      while (end > 1 && mant.charAt(end - 1) == '0') end -= 1
      mant.substring(0, end)
    }
    val exp10 = java.lang.Integer.parseInt(s.substring(ei + 1))
    val sb = new java.lang.StringBuilder(24)
    if (neg) sb.append('-')
    if (exp10 >= -5 && exp10 < 16) {
      if (exp10 >= 0) {
        if (digits.length > exp10 + 1) {
          sb.append(digits, 0, exp10 + 1).append('.').append(digits, exp10 + 1, digits.length)
        } else {
          sb.append(digits)
          var i = digits.length
          while (i < exp10 + 1) { sb.append('0'); i += 1 }
          sb.append(".0")
        }
      } else {
        sb.append("0.")
        var i = -exp10 - 1
        while (i > 0) { sb.append('0'); i -= 1 }
        sb.append(digits)
      }
    } else {
      sb.append(digits.charAt(0))
      if (digits.length > 1) sb.append('.').append(digits, 1, digits.length)
      sb.append('e').append(exp10)
    }
    sb.toString
  }

  /** CSV float text: ryu text with trailing '0's then '.' stripped
    * (`truncate_trailing_zeros`, `converter.rs:210-212`). Faithfully
    * reproduces the reference's quirk that scientific-notation output is
    * corrupted ("1e300" -> "1e3") because the zero-strip is applied
    * unconditionally to the ryu text. */
  def shortestCsv(d: Double): String = {
    var s = shortest(d)
    var end = s.length
    while (end > 0 && s.charAt(end - 1) == '0') end -= 1
    while (end > 0 && s.charAt(end - 1) == '.') end -= 1
    s.substring(0, end)
  }
}
