package graft.ext

/** The committed serving configuration (VERDICT r17 task 3) — the
  * tuned retrieval knobs, promoted from measurements to an artifact the
  * store-served paths consume, so serving no longer takes hand-passed
  * parameters the tuning queries exist to pick:
  *
  *   - [[kRrf]]/[[legWeights]] from the q176 fusion-quality grid
  *     (committed grid: kRrf 10/60/240 at equal weights + the weight
  *     axis at 60). RE-VALIDATED in r19 on the grown 20-query
  *     leg-balanced pool (21 judged queries): equal weights win
  *     decisively — nDCG@5 0.900 vs 0.602–0.620 for every tested skew
  *     — and q196's permutation test prices the win at p=0.00098
  *     (1024 draws), so the committed weights are a measurement, not
  *     a default. Quality stays INSENSITIVE to kRrf across 10→240 at
  *     equal weights, so the standard 60 stays.
  *   - [[mmrLambda]] from the q182 λ sweep judged against the q178
  *     qrels. RE-VALIDATED in r19 on the grown 23-judged-probe pool
  *     (VERDICT r18 task 3 — the r18 sweep rested on 5 probes its own
  *     significance test called underpowered): mean nDCG@4 climbs
  *     monotonically 0.783 (λ=.25) → 0.799 (λ=.5) → 0.901 (λ=.75),
  *     and q185 now shows with real power (p=0.00098 at 1024 draws)
  *     that diversity genuinely costs relevance — so the most
  *     relevance-weighted sweep point serves. Exact-binary, so every
  *     engine carries the identical literal.
  *
  * Consumed by q166 (store-served hybrid fusion) and q167 (store-served
  * MMR); ServingConfigSpec pins config-driven ≡ explicit-param. The
  * grid/sweep queries remain the measurement surface — re-run them
  * after a corpus shift, then update THIS object (the q138→q143
  * monitor→remediate discipline, applied to serving parameters).
  */
object ServingConfig {
  /** RRF rank-discount constant — q176 grid: quality flat in kRrf at
    * equal weights; keep the standard 60.
    */
  val kRrf: Int = 60

  /** Per-leg fusion weights (lexical, vector) — q176 grid winner:
    * equal; every tested skew lost up to 0.15 nDCG@5.
    */
  val legWeights: Seq[Double] = Seq(1.0, 1.0)

  /** MMR relevance/diversity trade — q182 sweep winner at k=4 over the
    * q178 qrels (exact-binary literal).
    */
  val mmrLambda: Double = 0.75

  /** IVF-PQ serving shortlist knobs — q139's recall grid (nprobe
    * {3,10} × refine {2,8,32}, k=5, sf0.01): this is the LATENCY point
    * (recall 0.66), chosen deliberately — at nprobe 3, raising refine
    * past 8 buys almost nothing (0.68 at 32: cell coverage, not
    * refinement, binds), so the measured upgrade path is nprobe
    * (10/8 → 0.82, 10/32 → 1.00), priced by q139 whenever recall
    * matters more than probe cost.
    */
  val annNprobe: Int = 3
  val annRefineFactor: Int = 8
}
