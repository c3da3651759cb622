package graft.docs

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

import graft.Tables

/** Similarity search over the `embeddings` table (`Array[Float]` vectors).
  *
  * Two paths, per the standard large-scale layout:
  *  - brute-force exact top-k: broadcast the (small) query set against the
  *    full corpus — one narrow scan, no shuffle of the corpus side;
  *  - sign-LSH bucketed: random-hyperplane LSH degenerate to coordinate
  *    hyperplanes (bucket = sign bits of the leading dims). Candidates are
  *    an equi-join on the bucket id — the 100 TB path where the corpus is
  *    hash-partitioned by bucket and only same-bucket pairs are scored.
  *
  * All arithmetic is float→double widening (exact) with left-to-right
  * double summation, bit-reproducible in DuckDB ([[graft.oracle.DocsOracle]]).
  */
object EmbeddingOps {

  /** The embeddings fixture normalized to the engine's vector contract:
    * `vec_id` BIGINT, `embedding` ARRAY<FLOAT>. Same defense as
    * [[graft.Tables.eventTsNtz]] (the round-7 events break class): the
    * driver's fixture generation may drift — float64 lists, int32 ids —
    * and a hard-assumed physical type turns that into an analysis error
    * across the whole ANN lane. A float64 fixture whose values originated
    * as float32 (the standard embedding dtype) casts losslessly, so
    * oracle hash parity survives the dispatch. */
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables(spark, sfDir, "embeddings")
    val elem = e.schema("embedding").dataType match {
      case org.apache.spark.sql.types.ArrayType(t, _) => t
      case other => throw new IllegalStateException(
        s"embeddings.embedding must be an array, got $other")
    }
    val vecTyped = elem match {
      case org.apache.spark.sql.types.FloatType => e
      case _: org.apache.spark.sql.types.NumericType =>
        e.withColumn("embedding", col("embedding").cast("array<float>"))
      case other => throw new IllegalStateException(
        s"unsupported embeddings element type $other")
    }
    if (vecTyped.schema("vec_id").dataType ==
        org.apache.spark.sql.types.LongType) vecTyped
    else vecTyped.withColumn("vec_id", col("vec_id").cast("long"))
  }

  /** Embeddings plus exact-copy replays (vec_id % 29 == 0 re-ingested at a
    * shifted id) — the near-dup fixture (cosine 1.0 by construction). */
  def embeddingsWithDups(spark: SparkSession, sfDir: String): DataFrame = {
    val e = embeddings(spark, sfDir)
    e.unionByName(e.filter(col("vec_id") % 29 === 0)
      .withColumn("vec_id", col("vec_id") + 100000L))
  }

  /** Left-to-right double dot product of two float vectors — a native
    * codegen expression ([[graft.functions.FloatVecDot]]); bit-identical
    * to the `aggregate(zip_with(...))` HOF form it replaced, without the
    * per-row intermediate array or lambda interpretation. */
  def dot(a: Column, b: Column): Column = graft.functions.FloatVecDot.dot(a, b)

  /** Euclidean norm (double). */
  def norm(v: Column): Column = sqrt(dot(v, v))

  /** L2-normalize a float vector to unit length (zero vectors pass
    * through unchanged). Pure projection, no shuffle; double math inside,
    * float out — normalize once at ingest and every cosine downstream
    * collapses to a plain dot product. */
  def l2Normalize(v: Column): Column = {
    val n = norm(v)
    when(n === 0.0, v)
      .otherwise(transform(v, x => (x.cast("double") / n).cast("float")))
  }

  /** Symmetric int8 quantization with a per-vector scale:
    * q_i = round(x_i · 127 / max|x|) ∈ [-127, 127] (all-zero vectors map
    * to all-zero codes). Pure projection; 4× smaller than float32 — at
    * 100 TB of embeddings the difference between an ANN working set that
    * fits executor memory and one that spills. All arithmetic in double;
    * `round` is half-away-from-zero in both Spark and DuckDB, so the
    * codes are oracle-exact. */
  def quantizeInt8(v: Column): Column = {
    val mx = array_max(transform(v, x => abs(x.cast("double"))))
    when(mx === 0.0, transform(v, _ => lit(0)))
      .otherwise(transform(v, x =>
        round(x.cast("double") * 127.0 / mx).cast("int")))
  }

  /** Sign-LSH bucket id from the leading `bits` dimensions:
    * bit j set iff v[j] > 0. */
  def signBucket(v: Column, bits: Int): Column =
    (0 until bits)
      .map(j => when(element_at(v, j + 1) > 0f, lit(1L << j)).otherwise(lit(0L)))
      .reduce(_ + _)

  /** Exact top-k cosine neighbors for `queries` (broadcast) over `corpus`.
    * Output: (query_id, rank, neighbor_id, cosine). */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qe"),
      norm(col("embedding")).as("qn"))
    val c = corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("ce"),
      norm(col("embedding")).as("cn"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", dot(col("qe"), col("ce")) / (col("qn") * col("cn")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cosine")
  }

  /** Exact cosine re-rank restricted to an explicit candidate-pair set
    * `pairs(query_id, neighbor_id)` — the BOUNDED audit tier (VERDICT r14
    * #6): cost O(|pairs|), never O(probes × corpus). The full-exact scan
    * stays the truth op; this is the audit a production corpus can
    * afford, fed by a stratified candidate superset (e.g. LSH/band mates
    * ∪ a fixed-size hash-ordered sample). Self-pairs are dropped to match
    * the exact tier's contract. */
  def candidateTopK(queries: DataFrame, corpus: DataFrame,
                    pairs: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qe"),
      norm(col("embedding")).as("qn"))
    val c = corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("ce"),
      norm(col("embedding")).as("cn"))
    val scored = pairs.join(broadcast(q), Seq("query_id"))
      .join(c, Seq("neighbor_id"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", dot(col("qe"), col("ce")) / (col("qn") * col("cn")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cosine")
  }

  /** Bucketed ANN: same scoring but only within the query's sign bucket.
    * Recall < 1 by design; the scale path (bucket equi-join, no cross
    * product). */
  def bucketedTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                   bucketBits: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qe"),
      norm(col("embedding")).as("qn"), signBucket(col("embedding"), bucketBits).as("bucket"))
    val c = corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("ce"),
      norm(col("embedding")).as("cn"), signBucket(col("embedding"), bucketBits).as("bucket"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", dot(col("qe"), col("ce")) / (col("qn") * col("cn")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cosine", "bucket")
  }

  // ---- IVF (inverted-file) ANN ------------------------------------------

  /** Coarse-quantizer centroids, one per `label` cell: per-dimension mean
    * computed with exact DECIMAL sums (order-independent, so the centroid
    * is bit-identical across engines and partitionings). In production the
    * cells come from k-means; the fixture's label column stands in as the
    * trained quantizer. */
  def ivfCentroids(vecs: DataFrame): DataFrame = {
    val pos = vecs.select(col("label").as("cell"),
      posexplode(col("embedding")).as(Seq("p", "x")))
    val cent = pos.groupBy(col("cell"), col("p"))
      .agg((sum(col("x").cast("decimal(27,12)")).cast("double") /
        count(lit(1))).as("c"))
    cent.groupBy("cell")
      .agg(transform(array_sort(collect_list(struct(col("p"), col("c")))),
        s => s.getField("c")).as("ce"))
  }

  /** Per-dimension corpus statistics (mean/variance/std) — the
    * normalization profile every embedding pipeline computes before
    * whitening, quantizer training, or drift monitoring. Shape: the
    * posexplode is a narrow ×dims projection and the ONE shuffle
    * aggregates a census of exactly `dims` groups with map-side combine —
    * constant output no matter the corpus size. Determinism: first and
    * second moments accumulate as exact DECIMAL(27,12) sums (the
    * ivfCentroids pattern — float→decimal casts round identically in both
    * engines); the variance closed form n·sxx−sx² is cancellation-heavy,
    * so mean/variance/std round to 12 decimals on both sides (the
    * agg_linreg rationale). */
  def dimStats(vecs: DataFrame): DataFrame = {
    val pos = vecs.select(posexplode(col("embedding")).as(Seq("p", "x")))
      .select((col("p") + 1).as("j"), col("x").cast("double").as("x"))
    pos.groupBy("j")
      .agg(count(lit(1)).as("n_vecs"),
        sum(col("x").cast("decimal(27,12)")).cast("double").as("sx"),
        sum((col("x") * col("x")).cast("decimal(27,12)")).cast("double").as("sxx"))
      // The round-12s here are LOAD-BEARING (measured, round 12): each
      // x → DECIMAL(27,12) term cast is approximate in DuckDB (scaled-
      // multiply kernel) vs exact in Java BigDecimal, so sx/sxx drift by
      // ~1e-12 relative between engines and an UNROUNDED mean diverges
      // by thousands of ulps (observed live when the rounds were briefly
      // removed: mean off at the 15th digit at sf0.01). The output snap
      // re-converges both engines onto the same 10^-12 grid point —
      // masking term-cast drift is exactly FLOATS.md Class C, not a
      // gratuitous round.
      .select(col("j"), col("n_vecs"),
        round(col("sx") / col("n_vecs"), 12).as("mean"),
        round(col("sxx") / col("n_vecs")
          - (col("sx") / col("n_vecs")) * (col("sx") / col("n_vecs")), 12)
          .as("variance"),
        round(sqrt(greatest(col("sxx") / col("n_vecs")
          - (col("sx") / col("n_vecs")) * (col("sx") / col("n_vecs")), lit(0.0))), 12)
          .as("std"))
      .orderBy("j")
  }

  /** Per-vector outlier score: squared diagonal-covariance Mahalanobis
    * distance — the sum of squared per-dimension z-scores against the
    * corpus profile from [[dimStats]]. The standard cheap embedding-
    * space anomaly screen (corrupt decodes, off-distribution content,
    * dead encoder dims) before clustering or dedup trusts the geometry.
    *
    * Scale shape: the dims-row stats census broadcasts onto the narrow
    * posexplode, so the only fact-sized shuffle is the per-vector sum
    * regroup. Determinism: mean/std arrive PRE-ROUNDED to 12 decimals by
    * [[dimStats]] (its load-bearing Class-C snap — both engines read the
    * same 10^-12 grid points), z² is then PURE IEEE on
    * those identical inputs — one subtract, one divide, one multiply, each
    * correctly rounded, so the terms agree bit-for-bit with no snap —
    * and the per-vector score is an order-pinned left-to-right double
    * fold in dimension order (the `sample_temperature` normalizer
    * pattern; collect_list is bounded by dims). The earlier
    * `round(z², 12) → DECIMAL(30,12)` shape was a FLOATS.md M1 tie
    * exposure on inputs that already agreed — a gratuitous grid snap —
    * and a live 1e-12 straddle surfaced at sf0.1 (row `vec_id` 793's
    * score, `…607` vs `…608`); the fold removes every rounding step. */
  def outlierScores(vecs: DataFrame): DataFrame = {
    val stats = dimStats(vecs).select("j", "mean", "std")
    val pos = vecs.select(col("vec_id"),
        posexplode(col("embedding")).as(Seq("p", "x")))
      .select(col("vec_id"), (col("p") + 1).as("j"),
        col("x").cast("double").as("x"))
    val z = (col("x") - col("mean")) / col("std")
    pos.join(broadcast(stats), Seq("j"))
      .select(col("vec_id"), col("j"), (z * z).as("z2"))
      .groupBy("vec_id")
      .agg(count(lit(1)).as("dims"),
        aggregate(
          transform(array_sort(collect_list(struct(col("j"), col("z2")))),
            s => s.getField("z2")),
          lit(0.0),
          (acc, x) => acc + x).as("outlier_score"))
      .orderBy(col("outlier_score").desc, col("vec_id"))
  }

  /** Squared L2 distance between a float vector and a double centroid —
    * native codegen expression ([[graft.functions.VecDistSq]]),
    * bit-identical to the HOF form it replaced. */
  def dist2(v: Column, c: Column): Column = graft.functions.VecDistSq.distSq(v, c)

  /** Nearest-`take` cells per vector (ties broken by cell id), computed as
    * a PROJECTION: the coarse quantizer is collected to the driver (k×dims
    * doubles — tiny by design in every IVF system, and the collect is what
    * ships it into the task closure) and becomes a per-row literal array
    * of (dist, cell) structs, sorted and sliced in place. Zero shuffle:
    * the previous crossJoin + Window shape shuffled |corpus|×k rows on
    * vec_id — a k× amplification that dominates at scale. Tie order
    * (cdist, cell) matches the window form and the DuckDB oracle. */
  private def nearestCells(vecs: DataFrame, centroids: DataFrame,
                           take: Int): DataFrame = {
    val cents = centroids.collect()
      .map(r => (r.get(0), r.getSeq[Double](1))) // cell keeps its native type
    val scored = array(cents.map { case (cell, ce) =>
      struct(
        graft.functions.VecDistSq.distSq(col("embedding"), typedLit(ce)).as("cdist"),
        lit(cell).as("cell"))
    }.toSeq: _*)
    vecs.withColumn("_sc", explode(slice(array_sort(scored), 1, take)))
      .withColumn("cdist", col("_sc.cdist"))
      .withColumn("cell", col("_sc.cell"))
      .drop("_sc")
  }

  /** Assign every vector to its nearest centroid (ties → smallest cell
    * id, lexicographic). A pure projection — see [[nearestCells]]. */
  private def assignCells(vecs: DataFrame, cent: DataFrame): DataFrame =
    nearestCells(vecs.select(col("vec_id"), col("embedding")), cent, 1)
      .select(col("vec_id"), col("embedding"), col("cell"))

  /** Assignment of vectors to trained centroids, public surface:
    * (vec_id, cell). */
  def assignTo(vecs: DataFrame, cent: DataFrame): DataFrame =
    assignCells(vecs, cent).select("vec_id", "cell")

  /** Deterministic Lloyd's k-means — the trained coarse quantizer the
    * fixture's `label` column stands in for elsewhere: seeds = the k
    * lowest vec_ids (cell id = seed id), a FIXED number of rounds, means
    * via exact DECIMAL sums (order-independent, so centroids are
    * bit-identical across engines and partitionings — the property that
    * lets a DuckDB oracle check a clustering). Per round: one broadcast
    * assign pass + one per-(cell, dim) partial-aggregated mean; at 100 TB
    * this is the standard k-means-on-Spark shape (centroids tiny,
    * broadcast; corpus never shuffles except the dim-keyed mean agg).
    * Cells that lose every member drop out, same in both engines. */
  def kmeansCentroids(vecs: DataFrame, k: Int, iters: Int): DataFrame = {
    var cent = vecs.orderBy("vec_id").limit(k)
      .select(col("vec_id").cast("string").as("cell"),
        transform(col("embedding"), x => x.cast("double")).as("ce"))
    for (_ <- 1 to iters) {
      val pos = assignCells(vecs, cent)
        .select(col("cell"), posexplode(col("embedding")).as(Seq("p", "x")))
      cent = pos.groupBy(col("cell"), col("p"))
        .agg((sum(col("x").cast("decimal(27,12)")).cast("double") /
          count(lit(1))).as("c"))
        .groupBy("cell")
        .agg(transform(array_sort(collect_list(struct(col("p"), col("c")))),
          s => s.getField("c")).as("ce"))
    }
    cent
  }

  /** IVF search: assign the corpus to its nearest cell, probe each
    * query's `nprobe` nearest cells, score cosine only inside probed
    * cells. The 100 TB layout: corpus hash-partitioned by cell (the
    * inverted file), each query touches nprobe partitions instead of the
    * whole corpus. Recall < 1 by design. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              nprobe: Int): DataFrame = {
    val centroids = ivfCentroids(corpus).cache()
    // nearestCells collects the quantizer eagerly (inside ivfTopKWith),
    // so the returned plan no longer references the centroid frame —
    // release the cache that covered those two actions now.
    val out = ivfTopKWith(queries, corpus, centroids, k, nprobe)
    centroids.unpersist(false)
    out
  }

  /** [[ivfTopK]] over a PRE-MATERIALIZED coarse quantizer (a memoized /
    * persisted centroid table): consumers that share one trained
    * quantizer (ann_ivf, ann_recall, search_hybrid_rrf) previously each
    * re-ran the centroid aggregation per invocation — in production the
    * quantizer is a published artifact, trained once. */
  def ivfTopKWith(queries: DataFrame, corpus: DataFrame, centroids: DataFrame,
                  k: Int, nprobe: Int): DataFrame = {
    val assigned = nearestCells(
      corpus.select(col("vec_id"), col("embedding")), centroids, 1)
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("ce_v"),
        norm(col("embedding")).as("cn"), col("cell"))
    val probes = nearestCells(
      queries.select(col("vec_id"), col("embedding")), centroids, nprobe)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        norm(col("embedding")).as("qn"), col("cell"))
    val scored = assigned.join(broadcast(probes), Seq("cell"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", dot(col("qe"), col("ce_v")) / (col("qn") * col("cn")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cosine", "cell")
  }

  /** Product-quantization encoding (Jégou et al. 2011, "Product
    * quantization for nearest neighbor search" — published method): split
    * each vector into `m` equal subspaces and quantize every subspace
    * against its own codebook; a 64-dim float32 vector becomes m small
    * code ids — the compression step past [[quantizeInt8]]'s 4× (PQ at
    * m=4 over a 4-entry codebook is effectively 32×, and ADC search
    * reads code tables instead of vectors). Codebooks here are the
    * per-label sub-centroids — the fixture's trained-quantizer stand-in,
    * same convention as [[ivfCentroids]]; production swaps in per-subspace
    * k-means ([[kmeansCentroids]] on slices) without changing the encode.
    *
    * Encoding is a PURE PROJECTION over driver-collected codebooks
    * (m × k × dim/m doubles — tiny by design), zero shuffle at any corpus
    * size. Ties break by (distance, cell), matching [[nearestCells]] and
    * the DuckDB oracle. Output: vec_id, code_0..code_{m-1}, recon_err
    * (sum of per-subspace squared quantization errors, fixed
    * left-to-right order — reproducible within Spark; NOT oracle-exact,
    * because DuckDB renders FLOAT→DECIMAL through the shortest decimal
    * string while Spark expands the exact binary value, shifting
    * centroid-derived doubles at ~1e-9 — the ivf_train boundary, so the
    * declared query ships codes only and the spec pins recon_err). */
  def pqEncode(vecs: DataFrame, m: Int): DataFrame =
    pqEncodeWith(vecs, ivfCentroids(vecs), m)

  /** [[pqEncode]] against a pre-materialized codebook table (same
    * centroid convention) — the encode is a pure projection, so with the
    * codebook memoized the whole op costs one tiny collect + one pass. */
  def pqEncodeWith(vecs: DataFrame, codebook: DataFrame, m: Int): DataFrame = {
    val cents = codebook.collect()
      .map(r => (r.get(0), r.getSeq[Double](1)))
    require(cents.nonEmpty, "codebook requires at least one cell")
    val dim = cents.head._2.length
    require(dim % m == 0, s"dim $dim must split evenly into $m subspaces")
    // loop-form argmin per subspace (see [[pqBest]] — same codegen-health
    // rule, same tie semantics as the former array_sort)
    val best = (0 until m).map(i => pqBest(cents, m, i))
    vecs.select(col("vec_id") +:
      best.zipWithIndex.map { case (b, i) => b.getField("cell").as(s"code_$i") } :+
      best.map(_.getField("cdist")).reduce(_ + _).as("recon_err"): _*)
  }

  /** SemDeDup-style semantic dedup pairs (Abbas et al. 2023 — published
    * method): cluster the corpus with the coarse quantizer, score cosine
    * only WITHIN a cell, and for each near-dup pair drop the member MORE
    * similar to its cell centroid (smaller distance) — keeping the
    * semantic outlier preserves diversity, per the paper. Ties (exact
    * copies) drop the higher vec_id, keeping the earliest-ingested.
    *
    * Scale shape: candidates are an equi-join on (cell, sign-LSH
    * sub-bucket), never corpus² — the inverted-file layout again
    * (hash-partition by cell, pairs stay partition-local). The
    * sub-bucket key (`subBits` leading-dimension sign bits via
    * [[signBucket]]) is the hot-cell bound the paper reaches by adding
    * cells at training time: cell COUNT is fixed by the trained
    * quantizer, so cell size grows linearly with the corpus and
    * within-cell all-pairs grows quadratically — measured exp 1.28 at
    * x20 (round 12) with subBits=0. Sign bits cut the candidate set
    * ~2^subBits× at a recall cost only for pairs straddling a sign
    * flip in a leading dimension — at thresholds like 0.99 near-dup
    * pairs almost always share the sign pattern. Production scales
    * subBits (or the trained cell count) with log(corpus).
    * Output: (cell, vec_a, vec_b, cosine, drop_vec_id). */
  def semdedupPairs(vecs: DataFrame, threshold: Double,
                    subBits: Int = 0): DataFrame = {
    val v = nearestCells(
      vecs.select(col("vec_id"), col("embedding")), ivfCentroids(vecs), 1)
      .select(col("vec_id"), col("embedding"), col("cell"), col("cdist"),
        norm(col("embedding")).as("n"),
        signBucket(col("embedding"), subBits.max(1)).as("sub"))
    val subKey =
      if (subBits > 0) col("a.sub") === col("b.sub") else lit(true)
    v.as("a").join(v.as("b"),
        col("a.cell") === col("b.cell") && subKey &&
          col("a.vec_id") < col("b.vec_id"))
      .withColumn("cosine",
        dot(col("a.embedding"), col("b.embedding")) / (col("a.n") * col("b.n")))
      .filter(col("cosine") >= threshold)
      .select(col("a.cell").as("cell"), col("a.vec_id").as("vec_a"),
        col("b.vec_id").as("vec_b"), col("cosine"),
        when(col("a.cdist") < col("b.cdist"), col("a.vec_id"))
          .when(col("b.cdist") < col("a.cdist"), col("b.vec_id"))
          .otherwise(greatest(col("a.vec_id"), col("b.vec_id")))
          .as("drop_vec_id"))
  }

  /** PQ asymmetric-distance (ADC) search (Jégou et al. 2011 §IV.A —
    * published method): the corpus is reduced to `m` one-byte codes per
    * vector, queries stay full precision, and the estimated distance is a
    * sum of `m` table lookups — per query the distance table to every
    * codebook entry is computed ONCE (m × k subspace distances), then
    * every corpus vector costs m map probes instead of a d-dim scan.
    * That is the whole point of PQ at 100 TB: the scan reads m bytes per
    * vector, not 4·d, and the lookup is a branch-free map probe inside
    * whole-stage codegen.
    *
    * Codebooks here are SEED codebooks — per cell, the subvectors of the
    * cell's lowest-vec_id member (`min_by`, one partial-aggregated pass).
    * Unlike the decimal-mean centroids of [[ivfCentroids]], seed entries
    * are raw float data, so every ADC distance is float→double exact and
    * the DuckDB oracle matches the ranking AND the distances bit-for-bit
    * (the ivf_train float→decimal rendering boundary never enters).
    * Production swaps per-subspace k-means codebooks in without changing
    * the search shape.
    *
    * Output: ADC top-k per query with `in_exact` marking membership in
    * the TRUE L2 top-k (full-precision), so recall@k is one aggregation
    * away and the compression error is visible per row.
    * Scale shape: codes are a pure projection (codebook is driver-side
    * k × dim, tiny by design); the scan side never shuffles — the only
    * wide op is the per-query top-k window, partitioned by query. */
  /** Seed codebook: per cell, the subvectors of the cell's lowest-vec_id
    * member (`min_by`, one partial-aggregated pass) — raw float data, so
    * ADC distances stay float→double exact (see [[adcTopK]] doc). */
  /** The seed-codebook census as a frame (pre-collect) — memoizable, so
    * the PQ consumers share one materialization instead of re-running the
    * min_by census per invocation. */
  def seedCodebookFrame(corpus: DataFrame): DataFrame =
    corpus.groupBy(col("label").as("cell"))
      .agg(min_by(col("embedding"), col("vec_id")).as("ce"))

  private def seedCodebookOf(frame: DataFrame): Array[(Any, Seq[Double])] = {
    val cb = frame.collect()
      .map(r => (r.get(0), r.getSeq[Float](1).map(_.toDouble)))
      .sortBy(_._1.toString)
    require(cb.nonEmpty, "codebook requires at least one cell")
    cb
  }

  private def seedCodebook(corpus: DataFrame): Array[(Any, Seq[Double])] =
    seedCodebookOf(seedCodebookFrame(corpus))

  private def pqSubDist(sub: Int)(i: Int, ce: Seq[Double]): Column =
    graft.functions.VecDistSq.distSq(
      slice(col("embedding"), i * sub + 1, sub),
      typedLit(ce.slice(i * sub, (i + 1) * sub)))

  /** The codebook's cells and per-subspace centroid slices as ARRAY
    * literals — the loop-form building blocks below index into these
    * instead of unrolling one expression per cell. */
  private def pqCellLits(cb: Array[(Any, Seq[Double])], m: Int, i: Int)
      : (Column, Column) = {
    val sub = cb.head._2.length / m
    (array(cb.map { case (cell, _) => lit(cell) }.toSeq: _*),
      array(cb.map { case (_, ce) =>
        typedLit(ce.slice(i * sub, (i + 1) * sub)) }.toSeq: _*))
  }

  /** Nearest codebook entry for subspace `i` as `(cdist, cell)` — a
    * constant-size codegen FOLD over the codebook arrays (the round-19
    * codegen-health rule: the former array_sort over |cb| unrolled
    * VecDistSq structs generated O(|cb|·sub) code per subspace — >8KB
    * methods past the JIT compile threshold at the fixture's codebook,
    * headed for janino's 64KB at a trained 256-cell book). Tie semantics
    * are array_sort's exactly: struct ordering is lexicographic
    * (cdist, cell), independent of codebook order. `array_min` over the
    * transform-built candidate array computes each distance ONCE (a
    * when-based fold would evaluate the candidate twice per step — the
    * +65% ann_ivfpq regression the r19 local[8] capture caught). */
  private def pqBest(cb: Array[(Any, Seq[Double])], m: Int, i: Int): Column = {
    val sub = cb.head._2.length / m
    val (cells, subCents) = pqCellLits(cb, m, i)
    array_min(transform(sequence(lit(0), lit(cb.length - 1)), j =>
      struct(
        graft.functions.VecDistSq.distSq(
          slice(col("embedding"), i * sub + 1, sub),
          element_at(subCents, j + 1)).as("cdist"),
        element_at(cells, j + 1).as("cell"))))
  }

  /** corpus → m codes: nearest seed per subspace, ties by (dist, cell). */
  private def pqCodeCols(cb: Array[(Any, Seq[Double])], m: Int): Seq[Column] =
    (0 until m).map(i => pqBest(cb, m, i).getField("cell").as(s"code_$i"))

  /** query → m distance tables: cell → d²(query subvector, codebook
    * entry) — loop-form like [[pqBest]]. */
  private def pqQueryTabs(cb: Array[(Any, Seq[Double])], m: Int): Seq[Column] = {
    val sub = cb.head._2.length / m
    (0 until m).map { i =>
      val (cells, subCents) = pqCellLits(cb, m, i)
      map_from_entries(transform(sequence(lit(0), lit(cb.length - 1)), j =>
        struct(element_at(cells, j + 1),
          graft.functions.VecDistSq.distSq(
            slice(col("embedding"), i * sub + 1, sub),
            element_at(subCents, j + 1))))).as(s"dtab_$i")
    }
  }

  def adcTopK(queries: DataFrame, corpus: DataFrame, m: Int, k: Int): DataFrame =
    adcTopKWith(queries, corpus, seedCodebookFrame(corpus),
      exactL2TopK(queries, corpus, k), m, k)

  /** [[adcTopK]] against a pre-materialized seed-codebook frame and a
    * pre-computed exact-L2 truth set (both memoizable, both shared with
    * ann_ivfpq). */
  def adcTopKWith(queries: DataFrame, corpus: DataFrame, codebook: DataFrame,
                  exact: DataFrame, m: Int, k: Int): DataFrame = {
    val cb = seedCodebookOf(codebook)
    val dim = cb.head._2.length
    require(dim % m == 0, s"dim $dim must split evenly into $m subspaces")
    val codes = corpus.select(col("vec_id").as("neighbor_id") +: pqCodeCols(cb, m): _*)
    val q = queries.select(col("vec_id").as("query_id") +: pqQueryTabs(cb, m): _*)
    val adc = codes.crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("adc_dist",
        (0 until m).map(i => element_at(col(s"dtab_$i"), col(s"code_$i")))
          .reduce(_ + _))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc_dist"), col("neighbor_id"))
    val top = adc.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "adc_dist")
    top.join(exact, Seq("query_id", "neighbor_id"), "left")
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("adc_dist"),
        coalesce(col("in_exact"), lit(false)).as("in_exact"))
  }

  /** Full-precision truth set: exact L2 top-k per query over the whole
    * corpus — `(query_id, neighbor_id, in_exact=true)`, the membership
    * frame the compressed paths left-join to expose their recall. The
    * crossJoin is `broadcast(queries)` against a fixed small query
    * census — the intentional exact baseline, not a scale path. */
  def exactL2TopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val qf = queries.select(col("vec_id").as("query_id"),
      transform(col("embedding"), x => x.cast("double")).as("qe"))
    corpus
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("ce"))
      .crossJoin(broadcast(qf))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("d2", graft.functions.VecDistSq.distSq(col("ce"), col("qe")))
      .withColumn("rank", row_number().over(Window.partitionBy(col("query_id"))
        .orderBy(col("d2"), col("neighbor_id"))))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), lit(true).as("in_exact"))
  }

  /** IVF+PQ composite search (the FAISS IndexIVFPQ shape; Jégou et al.
    * 2011 §V — published method): the coarse quantizer restricts each
    * query to its `nprobe` nearest inverted-file cells, and candidates
    * INSIDE a probed cell are scored by PQ asymmetric distance — m table
    * lookups per vector — instead of a full-precision scan. This is the
    * billion-vector layout both compressions compose into: the corpus
    * hash-partitions by cell (each query touches nprobe partitions, not
    * the corpus), the scan reads m bytes per vector (not 4·d), and the
    * only wide op is the per-query top-k window. [[ivfTopK]] alone still
    * reads full vectors; [[adcTopK]] alone still scans every vector —
    * the composite does neither.
    *
    * Same determinism boundaries as the parts: decimal-mean coarse
    * centroids ([[ivfCentroids]]), float-exact seed codebooks
    * ([[seedCodebook]]), left-to-right ADC sums, ties by
    * (adc_dist, neighbor_id). Output: query_id, rank, neighbor_id,
    * adc_dist, cell. */
  def ivfpqTopK(queries: DataFrame, corpus: DataFrame, m: Int, k: Int,
                nprobe: Int): DataFrame = {
    val centroids = ivfCentroids(corpus).cache()
    val out = ivfpqTopKWith(queries, corpus, centroids,
      seedCodebookFrame(corpus), m, k, nprobe)
    centroids.unpersist(false)
    out
  }

  /** [[ivfpqTopK]] against pre-materialized coarse centroids and seed
    * codebook (both memoizable artifacts of one trained quantizer). */
  def ivfpqTopKWith(queries: DataFrame, corpus: DataFrame,
                    centroids: DataFrame, codebook: DataFrame,
                    m: Int, k: Int, nprobe: Int): DataFrame = {
    val assigned = nearestCells(
      corpus.select(col("vec_id"), col("embedding")), centroids, 1)
      .select(col("vec_id").as("neighbor_id"), col("embedding"), col("cell"))
    val probes = nearestCells(
      queries.select(col("vec_id"), col("embedding")), centroids, nprobe)
      .select(col("vec_id").as("query_id"), col("embedding"), col("cell"))
    val cb = seedCodebookOf(codebook)
    val dim = cb.head._2.length
    require(dim % m == 0, s"dim $dim must split evenly into $m subspaces")
    // inverted file of codes: a pure projection, partitionable by cell
    val codes = assigned.select(
      col("neighbor_id") +: col("cell") +: pqCodeCols(cb, m): _*)
    // the query census rides the broadcast: nprobe rows per query, each
    // carrying the m per-subspace distance tables
    val q = probes.select(
      col("query_id") +: col("cell") +: pqQueryTabs(cb, m): _*)
    val adc = codes.join(broadcast(q), Seq("cell"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("adc_dist",
        (0 until m).map(i => element_at(col(s"dtab_$i"), col(s"code_$i")))
          .reduce(_ + _))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc_dist"), col("neighbor_id"))
    adc.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "adc_dist", "cell")
  }

  /** Near-duplicate pairs by cosine ≥ threshold, candidates from the
    * sign bucket (sign-preserving dups always collide). */
  def cosineDupPairs(vecs: DataFrame, threshold: Double, bucketBits: Int): DataFrame = {
    val v = vecs.select(col("vec_id"), col("embedding"),
      norm(col("embedding")).as("n"), signBucket(col("embedding"), bucketBits).as("bucket"))
    v.as("a").join(v.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.vec_id") < col("b.vec_id"))
      .withColumn("cosine",
        dot(col("a.embedding"), col("b.embedding")) / (col("a.n") * col("b.n")))
      .filter(col("cosine") >= threshold)
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"), col("cosine"))
  }
}
