package graft

import org.apache.spark.sql.functions._

import graft.queries.MediaQueries

/** The bounded media-ANN audit vs the full exact tier (VERDICT r14 #6):
  * `media_ann_audit` re-ranks over a stratified candidate superset (aHash
  * band mates ∪ a fixed 512-item hash stratum) instead of scanning the
  * corpus per probe. This spec pins its contract against the truth op on
  * the driver fixture: identical output shape, and recall@3 against the
  * full exact tier high enough that the audit remains a meaningful
  * production check (the exact floor is fixture-deterministic). */
class MediaAnnAuditSpec extends SparkSpec {

  test("bounded audit recalls the exact tier's neighbors on the fixture") {
    // sf0.1, not sf0.001: the corpus must EXCEED the 512-item fixed
    // stratum (500 docs at the smaller SFs, 5000 here) or the stratum
    // covers everything and the band-mate path's contribution (asserted
    // below) is unobservable
    val fixture = sf("sf0.1")
    val truth = MediaQueries.queries("media_ann")(spark, fixture)
      .select("query_id", "neighbor_id")
    val audit = MediaQueries.queries("media_ann_audit")(spark, fixture)
    assert(audit.columns.toSeq ==
      Seq("query_id", "rank", "neighbor_id", "cosine"),
      "audit emits the exact tier's shape — drop-in comparable")

    val truthN = truth.count()
    assert(truthN > 0)
    val hits = truth.join(audit.select("query_id", "neighbor_id"),
      Seq("query_id", "neighbor_id"), "left_semi").count()
    val recall = hits.toDouble / truthN
    // fixture-deterministic; measured ≈0.9 — a 0.8 floor (ADVICE r15)
    // fails if EITHER candidate stratum silently dies (band-scheme
    // change killing all band mates, or a stratum-size regression),
    // not just if both do
    info(s"audit recall@3 vs exact tier: $recall")
    assert(recall >= 0.8, s"audit recall@3 vs exact tier: $recall")

    // the band-mate stratum contributes on its own: some audit neighbor
    // must fall OUTSIDE the fixed 512-item hash stratum (only the band
    // path can produce it) — a band-scheme regression that left only the
    // stratum would zero this even while aggregate recall looked alive
    val stratum = graft.docs.MediaOps
      .mediaFromDocuments(graft.docs.DocPipeline.documents(spark, fixture))
      .select(col("media_id"))
      .orderBy(sha2(col("media_id").cast("string"), 256), col("media_id"))
      .limit(512)
      .select(col("media_id").as("neighbor_id"))
    val bandOnlyHits = audit.select("neighbor_id")
      .join(stratum, Seq("neighbor_id"), "left_anti").count()
    assert(bandOnlyHits > 0,
      "the banded strata contribute neighbors beyond the fixed stratum")

    // EACH banded stratum is alive as a candidate generator, separately:
    // beyond-sample hits alone can't distinguish a dead aHash scheme
    // hiding behind a healthy feature-LSH one (or vice versa), so pin
    // that both produce candidate pairs beyond the fixed stratum for the
    // audit's own probe panel
    val m2 = graft.docs.MediaOps
      .mediaFromDocuments(graft.docs.DocPipeline.documents(spark, fixture))
    val probeIds = graft.docs.MediaOps.featureVector(m2)
      .select(col("media_id"))
      .filter(graft.queries.Panels.mediaAudit(col("media_id")))
    val bands = graft.docs.MediaOps.phashBands(m2)
    val probeBands = bands.join(probeIds, "media_id")
      .select(col("band"), col("bval"))
    val aHashMates = bands.join(probeBands, Seq("band", "bval"))
      .select(col("media_id").as("neighbor_id")).distinct()
      .join(stratum, Seq("neighbor_id"), "left_anti").count()
    assert(aHashMates > 0,
      "the aHash band scheme yields beyond-stratum candidates on its own")
    val feats2 = graft.docs.MediaOps.featureVector(m2)
      .select(col("media_id"), col("features").as("embedding"))
    val emean = (1 to 16).map(j =>
      element_at(col("embedding"), j).cast("double")).reduce(_ + _) / 16.0
    val fsig = (0 until 8).map(j =>
      when(element_at(col("embedding"), j + 1).cast("double") > emean,
        lit(1 << j)).otherwise(lit(0))).reduce(_ + _)
    val featBands = feats2.select(col("media_id"), fsig.as("fbval"))
    val probeFeat = featBands.join(probeIds, "media_id").select(col("fbval"))
    val featMates = featBands.join(probeFeat, Seq("fbval"))
      .select(col("media_id").as("neighbor_id")).distinct()
      .join(stratum, Seq("neighbor_id"), "left_anti").count()
    assert(featMates > 0,
      "the feature-LSH scheme yields beyond-stratum candidates on its own")

    // the audit ranks at most k=3 per probe and covers every probe the
    // exact tier covers (the fixed stratum guarantees non-empty
    // candidates even for a probe with no band mates)
    assert(audit.groupBy("query_id").count()
      .filter(col("count") > 3).count() == 0)
    assert(truth.select("query_id").distinct().count() ==
      audit.select("query_id").distinct().count())
  }

  test("scale gate: recall@3 and candidates/probe at x20 — 100k docs, " +
      "the fixed sample is 0.5% of the corpus (VERDICT r16 #3)") {
    // gated on the x20 fixture dir (tools/scale_gen.py 20 /tmp/sfscale/x20)
    // so the per-round suite stays cheap; run it whenever the recall/cost
    // dial is touched, and record the numbers in SCALING.md
    val dir = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR", "/tmp/sfscale/x20")
    assume(new java.io.File(s"$dir/documents.parquet").exists(),
      s"x20 fixtures absent at $dir")
    val truth = MediaQueries.queries("media_ann")(spark, dir)
      .select("query_id", "neighbor_id").cache()
    val audit = MediaQueries.queries("media_ann_audit")(spark, dir)
    val truthN = truth.count()
    assert(truthN > 0)
    val hits = truth.join(audit.select("query_id", "neighbor_id"),
      Seq("query_id", "neighbor_id"), "left_semi").count()
    val recall = hits.toDouble / truthN
    val (probes, feats, pairs) = MediaQueries.auditCandidates(spark, dir)
    val nProbes = probes.count()
    val corpus = feats.count()
    val cpp = pairs.count().toDouble / nProbes
    info(f"x20: recall@3=$recall%.3f candidates/probe=$cpp%.1f " +
      f"(${cpp / corpus * 100}%.2f%% of $corpus-item corpus, $nProbes probes)")
    assert(recall >= 0.8,
      f"recall@3 at x20 ($recall%.3f) under the 0.8 floor — raise the " +
        "centered-sign bit count (the LSH recall/cost dial)")

    // ---- DE-SIBLINGED recall (VERDICT r17 #3) ----
    // x20 fixtures are key-shifted replicas: copy c's doc k sits at
    // id k + c*span, and cross-copy SIBLINGS (same k, different c) are
    // feature-near by construction — they dominate the exact top-3 and
    // band-match trivially, flattering the aggregate recall. The honest
    // number excludes sibling truth pairs: the remaining pairs are the
    // GENUINE in-copy neighbors a real (replica-free) corpus would pose.
    val span = (feats.agg(max(col("vec_id"))).first().getLong(0) + 1) / 20L
    assert(span > 0)
    val nonSib = truth.filter(
      pmod(col("query_id"), lit(span)) =!= pmod(col("neighbor_id"), lit(span)))
    val nsN = nonSib.count()
    assert(nsN > 0, "some exact-tier neighbors are non-siblings")
    val nsHits = nonSib.join(audit.select("query_id", "neighbor_id"),
      Seq("query_id", "neighbor_id"), "left_semi").count()
    val recallNS = nsHits.toDouble / nsN
    info(f"x20 de-siblinged: recall@3=$recallNS%.3f over $nsN non-sibling " +
      f"truth pairs (${nsN * 100.0 / truthN}%.1f%% of the truth set)")
    assert(recallNS >= 0.8,
      f"de-siblinged recall@3 at x20 ($recallNS%.3f) under the 0.8 floor — " +
        "exercise the fbands/chunks dial (measured below)")

    // the LSH recall/cost dial, exercised at 3x8 bits over a 24-dim
    // feature vector: candidate GENERATION widens, the re-rank stays on
    // the production 16-dim features so recall is measured against the
    // same exact tier. Recorded in SCALING.md §S3 (r18).
    val (_, _, pairs3) = MediaQueries.auditCandidates(spark, dir,
      fbands = 3, chunks = 24)
    val audit3 = graft.docs.EmbeddingOps.candidateTopK(probes, feats, pairs3, 3)
    val nsHits3 = nonSib.join(audit3.select("query_id", "neighbor_id"),
      Seq("query_id", "neighbor_id"), "left_semi").count()
    val recallNS3 = nsHits3.toDouble / nsN
    val cpp3 = pairs3.count().toDouble / nProbes
    info(f"x20 de-siblinged at the 3x8/24-dim dial: recall@3=$recallNS3%.3f " +
      f"candidates/probe=$cpp3%.1f (${cpp3 / corpus * 100}%.2f%% of corpus)")
    // no superset assertion: the 24-dim build re-centers every band's
    // sign bits on a different per-vector mean, so the two candidate
    // sets are not nested — the dial's EFFECT is the recorded delta
    assert(recallNS3 > 0.0, "the dialed candidate set still recalls")
    truth.unpersist(): Unit
  }

  test("planted-panel recall at x20: O(hundreds) LABELED genuine near-dup " +
      "pairs — perturbed copies, not key-shifted replicas (VERDICT r18 #5)") {
    // gated on the planted fixture dir:
    //   python3 tools/scale_gen.py 20 /tmp/sfscale/x20p /root/testdata/sf0.1 \
    //     documents --plant-media-pairs=3
    // 375 labeled pairs: per probe, two tail-perturbed copies (identical
    // feature head, cosine exactly 1 — they pin the exact tier's top-2,
    // so the panel can't be starved by near-1 Caesar siblings) and one
    // head-perturbed copy (one feature chunk moved, cosine ~0.999 — the
    // harder class, in the top-3 only when genuinely nearer than the
    // best sibling) — the genuine-near-dup panel the 23-pair
    // de-siblinged truth set was too small to be (r18's caveat)
    val dir = sys.env.getOrElse("SPARK_GRAFT_PLANT_DIR", "/tmp/sfscale/x20p")
    assume(new java.io.File(s"$dir/planted_pairs.parquet").exists(),
      s"planted x20 fixtures absent at $dir")
    val planted = spark.read.parquet(s"$dir/planted_pairs.parquet")
      .select(col("probe_id").as("query_id"),
        col("planted_id").as("neighbor_id"))
    val plantedN = planted.count()
    assert(plantedN >= 300, s"an O(hundreds) panel was planted: $plantedN")
    val truth = MediaQueries.queries("media_ann")(spark, dir)
      .select("query_id", "neighbor_id")
    // sanity of the plant itself: the perturbed copies really are the
    // probes' nearest media — they make the exact tier's top-3
    val inTruth = truth.join(planted, Seq("query_id", "neighbor_id"),
      "left_semi").cache()
    val n = inTruth.count()
    assert(n >= 200,
      s"planted pairs land in the exact tier's top-3: $n of $plantedN")
    val audit = MediaQueries.queries("media_ann_audit")(spark, dir)
    val hits = inTruth.join(audit.select("query_id", "neighbor_id"),
      Seq("query_id", "neighbor_id"), "left_semi").count()
    val recall = hits.toDouble / n
    info(f"planted-panel recall@3: $recall%.3f over $n exact-tier planted " +
      f"pairs ($plantedN planted)")
    assert(recall >= 0.8,
      f"audit recall on the labeled genuine panel ($recall%.3f) under the " +
        "0.8 floor — a candidate stratum regressed")
    inTruth.unpersist(): Unit
  }
}
