package graft

/** Scoped logging adjustments shared by the driver mains — one
  * definition so Bench and Verify can never diverge on what is
  * suppressed (r14 review: the block was duplicated verbatim).
  */
object LogScopes {

  /** WindowExec's "No Partition Defined" warning is a false alarm for
    * this suite — every unpartitioned-window site is reviewed and
    * construction-bounded (WindowAuditSpec's allowlist is the guard
    * that keeps this suppression safe) — and the flood saturated the
    * harness's ~2000-char stderr tail, hiding any REAL diagnostic
    * (r13 verdict item 2). Scoped to the window package only; WARN
    * stays on everywhere else. */
  def quietWindowExec(): Unit =
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window",
      org.apache.logging.log4j.Level.ERROR)
}
