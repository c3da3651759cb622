package graft.queries

import org.apache.spark.sql.Column

/** The registry of fixed probe/audit/eval panels the declared queries
  * are allowed to use.
  *
  * Round-12 design lesson (SCALING.md): a panel defined by a RATE
  * (`every Nth id`) silently couples workload size to corpus size — 8
  * operators measured superlinear at x20 because their audit/recall
  * probe sets grew with the corpus, turning per-probe scans quadratic.
  * The class was invisible at every SF where correctness runs and at
  * three rounds of plan-shape review, because the quadratic term sat in
  * the WORKLOAD definition, not the join shape.
  *
  * The codified rule: every panel is `id % stride = 0 AND id < bound` —
  * a FIXED member set (`bound / stride` ids) regardless of corpus size.
  * The bounds are chosen ≥ the sf0.1 id domains, so they are non-binding
  * at the driver fixtures (gate results unchanged) and bind exactly
  * where they must: on scale_gen replicas and in production.
  *
  * PanelGuardSpec enforces both halves:
  *  - every registry entry selects exactly [[Panel.cap]] members from an
  *    id domain far past the bound (corpus-independence, run live);
  *  - no declared-query file introduces a `% N === 0` filter outside
  *    this registry (source tripwire; intentional corpus-FRACTION
  *    selections — batch splits, synthesis dirt — carry an explicit
  *    `corpus-fraction` marker instead, because a fraction of the corpus
  *    is their semantics, not an audit workload).
  */
object Panels {

  /** A fixed panel: stride + bound, with the member count it guarantees. */
  final case class Panel(stride: Long, bound: Long) {
    def apply(c: Column): Column = c % stride === 0 && c < bound
    /** Exact member count over any id domain ⊇ [0, bound). */
    def cap: Long = (bound + stride - 1) / stride
    def sql(idCol: String): String = s"$idCol % $stride = 0 AND $idCol < $bound"
  }

  /** ANN recall/latency audit probes (embeddings lane): 40 probes.
    * Bound = the sf0.1 vec_id domain (2000). */
  val annProbe = Panel(50, 2000)

  /** Media exact-scan audit probes (`media_ann` truth tier): 125 probes.
    * Bound = the sf0.1 media-doc domain (5000). */
  val mediaAudit = Panel(40, 5000)

  /** Decontamination eval suite (`contamination_ngram`, the contamination
    * leg of `corpus_curate`): 125 eval docs. A real decontamination run
    * screens the corpus against a FIXED benchmark suite; an eval set
    * defined as a corpus fraction is the round-12 bug class. */
  val contamEval = Panel(40, 5000)

  /** Bloom-prefiltered decontamination eval suite: 200 eval docs. */
  val bloomEval = Panel(25, 5000)

  /** Retrieval query panel (`search_hybrid_rrf`, both legs): shares
    * [[annProbe]] so every fused query id has a lexical AND a semantic
    * ranking (ADVICE r12: asymmetric panels degrade the tail to
    * lexical-only fusion). */
  val retrievalQueries: Panel = annProbe

  /** Every panel a declared query may reference, by name — the
    * PanelGuardSpec iteration surface. New panels MUST be added here. */
  val registry: Map[String, Panel] = Map(
    "annProbe" -> annProbe,
    "mediaAudit" -> mediaAudit,
    "contamEval" -> contamEval,
    "bloomEval" -> bloomEval,
  )
}
