package graft

/** Fixture-scale quality-witness columns (q118 `exact_tokens`/`err_pct`,
  * q129 `ndv_exact`) double their queries' aggregate work purely to
  * hash-gate sketch accuracy against the oracle — a production 100 TB
  * run never computes the exact side (that's the whole point of the
  * sketch). Verify runs keep them (they ARE the correctness gate);
  * [[graft.Bench]] switches them off so the timed plan is the
  * production plan. `SPARK_GRAFT_WITNESS=on` keeps them in a bench run
  * (the A/B escape hatch used for the BASELINE.md measurement).
  */
object Witness {
  /** Default true: every verify/test path gates on the witness columns. */
  @volatile var enabled: Boolean = true
}
