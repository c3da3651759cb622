package graft.oracle

import graft.docs.DocPipeline._

/** DuckDB-dialect mirror of [[graft.docs.DocPipeline]] /
  * [[graft.docs.EmbeddingOps]]. Built programmatically from the same
  * constants (P, K, bands, fingerprint base, stopword lists) so the two
  * engines cannot drift. */
object DocsOracle {

  /** Signed-BIGINT reinterpretation of a UBIGINT column `u` + ABS — the
    * DuckDB spelling of [[graft.functions.Sha256Prefix64]]. */
  private val signedAbs =
    """abs(CASE WHEN u >= 9223372036854775808::UBIGINT
      |     THEN CAST(u::HUGEINT - 18446744073709551616::HUGEINT AS BIGINT)
      |     ELSE CAST(u AS BIGINT) END)""".stripMargin

  val docsDup: String =
    """docs_dup AS (
      |  SELECT * FROM documents
      |  UNION ALL
      |  SELECT doc_id + 100000, text, lang, source, n_chars
      |  FROM documents WHERE doc_id % 17 = 0
      |)""".stripMargin

  val toks: String =
    """toks AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents
      |)""".stripMargin

  val shingleHashes: String =
    s"""sh AS (
       |  SELECT DISTINCT doc_id, s FROM (
       |    SELECT doc_id, unnest(CASE WHEN len(t) >= 3
       |      THEN list_transform(generate_series(1, len(t) - 2),
       |             i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
       |      ELSE [array_to_string(t, ' ')] END) AS s
       |    FROM toks) x
       |), shh AS (
       |  SELECT doc_id, $signedAbs % $P AS h
       |  FROM (SELECT doc_id, ('0x' || substr(sha256(s),1,16))::UBIGINT AS u FROM sh) y
       |)""".stripMargin

  val tokenHashes: String =
    s"""tokh AS (
       |  SELECT doc_id, $signedAbs AS h
       |  FROM (SELECT doc_id, ('0x' || substr(sha256(w),1,16))::UBIGINT AS u
       |        FROM (SELECT doc_id, unnest(t) AS w FROM toks) z) y
       |)""".stripMargin

  val minhash: String = {
    val mins = (0 until MinhashK)
      .map(i => s"min((h * ${2 * i + 1} + ${7919L * i}) % $P) AS m$i").mkString(", ")
    val bandKeys = (0 until Bands).map { b =>
      val comps = (0 until MinhashK / Bands)
        .map(r => s"CAST(m${b * (MinhashK / Bands) + r} AS VARCHAR)")
      s"'b$b' || '-' || ${comps.mkString(" || '-' || ")}"
    }.mkString(", ")
    s"""mh AS (SELECT doc_id, $mins FROM shh GROUP BY doc_id),
       |mhb AS (
       |  SELECT doc_id, unnest([$bandKeys]) AS bk FROM mh
       |), mcand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM mhb a JOIN mhb b ON a.bk = b.bk AND a.doc_id < b.doc_id
       |)""".stripMargin
  }

  val simhash: String = {
    val sums = (0 until SimhashBits)
      .map(j => s"sum(CASE WHEN (h >> $j) & 1 = 1 THEN 1 ELSE -1 END) AS s$j")
      .mkString(", ")
    val simVal = (0 until SimhashBits)
      .map(j => s"CASE WHEN s$j > 0 THEN ${1L << j} ELSE 0 END").mkString(" + ")
    val bandKeys = (0 until SimhashBits / SimhashBandBits)
      .map(b => s"'b$b' || ':' || CAST((simhash >> ${b * SimhashBandBits}) & $SimhashBandMask AS VARCHAR)")
      .mkString(", ")
    s"""simsums AS (SELECT doc_id, $sums FROM tokh GROUP BY doc_id),
       |sim AS (SELECT doc_id, $simVal AS simhash FROM simsums),
       |simb AS (SELECT doc_id, unnest([$bandKeys]) AS bk FROM sim),
       |scand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM simb a JOIN simb b ON a.bk = b.bk AND a.doc_id < b.doc_id
       |)""".stripMargin
  }

  /** Left-to-right double dot product of two list columns. */
  def dotSql(a: String, b: String): String =
    s"list_reduce(list_transform(generate_series(1, len($a)), " +
      s"i -> $a[i]::DOUBLE * $b[i]::DOUBLE), (x, y) -> x + y)"

  /** Left-to-right squared L2 distance between a float-list column and a
    * double-list centroid column (mirror of `EmbeddingOps.dist2`). */
  def dist2Sql(v: String, c: String): String =
    s"list_reduce(list_transform(generate_series(1, len($v)), " +
      s"i -> ($v[i]::DOUBLE - $c[i]) * ($v[i]::DOUBLE - $c[i])), (x, y) -> x + y)"

  def bucketSql(v: String, bits: Int): String =
    (0 until bits)
      .map(j => s"CASE WHEN $v[${j + 1}] > 0 THEN ${1L << j} ELSE 0 END")
      .mkString(" + ")

  def embDup: String =
    """emb_dup AS (
      |  SELECT * FROM embeddings
      |  UNION ALL
      |  SELECT vec_id + 100000, embedding, label FROM embeddings WHERE vec_id % 29 = 0
      |)""".stripMargin

  def embNorm(src: String, bits: Int): String =
    s"""embn AS (
       |  SELECT vec_id, embedding,
       |    sqrt(${dotSql("embedding", "embedding")}) AS n,
       |    ${bucketSql("embedding", bits)} AS bucket
       |  FROM $src
       |)""".stripMargin

  def stopList(ws: Seq[String]): String = ws.map(w => s"'$w'").mkString("[", ",", "]")

  /** BM25 oracle, mirroring [[graft.docs.DocPipeline.bm25Search]]. The
    * floating-point constants (k1+1, 1−b) are computed in SCALA and
    * interpolated via `Double.toString` (shortest round-trip repr) —
    * `1.2 + 1` in IEEE doubles is NOT the double the SQL literal `2.2`
    * parses to (they differ in the last ulp), so embedding the literal
    * would shift scores. Everything else follows the round(ln,12) +
    * DECIMAL-sum pattern of the bigram LM. */
  def bm25Sql(queries: Seq[(Int, Seq[String])], topK: Int,
              k1: Double, b: Double): String = {
    val vals = queries.flatMap { case (qid, ts) =>
      ts.map(t => s"($qid::BIGINT, '$t')")
    }.mkString(", ")
    val k1p1 = (k1 + 1).toString
    val oneMinusB = (1 - b).toString
    docsWith(
      s"""qt AS (SELECT * FROM (VALUES $vals) AS v(query_id, w)),
         |dl AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS dl FROM toks),
         |st AS (SELECT count(*) AS n, sum(dl) AS total FROM dl),
         |wd AS (SELECT doc_id, unnest(t) AS w FROM toks),
         |tf AS (
         |  SELECT qt.query_id, wd.doc_id, qt.w, count(*) AS tf
         |  FROM wd JOIN qt ON wd.w = qt.w GROUP BY 1, 2, 3),
         |dft AS (
         |  SELECT query_id, w, count(DISTINCT doc_id) AS df
         |  FROM tf GROUP BY 1, 2),
         |sc AS (
         |  SELECT tf.query_id, tf.doc_id,
         |    CAST(round(round(ln(1.0 + (st.n - dft.df + 0.5) / (dft.df + 0.5)), 12)
         |      * (tf.tf * $k1p1)
         |      / (tf.tf + $k1 * ($oneMinusB + $b * dl.dl
         |          / (st.total::DOUBLE / st.n))), 12) AS DECIMAL(27,12)) AS s
         |  FROM tf JOIN dft USING (query_id, w) JOIN dl USING (doc_id)
         |  CROSS JOIN st),
         |ag AS (
         |  SELECT query_id, doc_id, CAST(sum(s) AS DOUBLE) AS score
         |  FROM sc GROUP BY 1, 2),
         |rk AS (
         |  SELECT query_id, doc_id, score,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY score DESC, doc_id) AS rank
         |  FROM ag)""".stripMargin,
      s"""SELECT query_id, CAST(rank AS BIGINT) AS rank, doc_id, score
         |FROM rk WHERE rank <= $topK ORDER BY query_id, rank""".stripMargin)
  }

  /** TF-IDF top-terms oracle, mirroring
    * [[graft.docs.DocPipeline.tfidfTopTerms]]. No float aggregation — the
    * only libm op (ln) is rounded to 12 decimals before the single IEEE
    * multiply. */
  def tfidfSql(topK: Int): String = docsWith(
    s"""wd AS (SELECT doc_id, unnest(t) AS term FROM toks),
       |tfq AS (SELECT doc_id, term, count(*) AS tf FROM wd GROUP BY 1, 2),
       |dfq AS (SELECT term, count(*) AS df FROM tfq GROUP BY 1),
       |nq AS (SELECT count(*) AS n FROM documents),
       |ti AS (
       |  SELECT doc_id, term, tf,
       |    tf * round(ln((n + 1.0) / (df + 1.0)), 12) AS tfidf
       |  FROM tfq JOIN dfq USING (term) CROSS JOIN nq),
       |rk AS (
       |  SELECT doc_id, term, tf, tfidf,
       |    row_number() OVER (PARTITION BY doc_id
       |      ORDER BY tfidf DESC, term) AS rank
       |  FROM ti)""".stripMargin,
    s"""SELECT doc_id, CAST(rank AS BIGINT) AS rank, term, tf, tfidf
       |FROM rk WHERE rank <= $topK ORDER BY doc_id, rank""".stripMargin)

  /** Count-min heavy-hitters oracle, mirroring
    * [[graft.docs.DocPipeline.cmsHeavyHitters]]. Integer-only — counters
    * are sums, estimates are mins, nothing floats. */
  def cmsSql(depth: Int, width: Int, topK: Int): String = docsWith(
    s"""wd AS (SELECT unnest(t) AS w FROM toks),
       |ex AS (SELECT w, count(*) AS exact_cnt FROM wd GROUP BY w),
       |hx AS (
       |  SELECT j, w, exact_cnt, $signedAbs % $width AS bucket
       |  FROM (SELECT j, w, exact_cnt,
       |          ('0x' || substr(sha256('cms' || CAST(j AS VARCHAR) || ':' || w),
       |            1, 16))::UBIGINT AS u
       |        FROM ex, unnest(generate_series(0, ${depth - 1})) AS g(j)) y),
       |ct AS (
       |  SELECT j, bucket, CAST(sum(exact_cnt) AS BIGINT) AS counter
       |  FROM hx GROUP BY 1, 2),
       |topw AS (
       |  SELECT w, exact_cnt,
       |    row_number() OVER (ORDER BY exact_cnt DESC, w) AS rank
       |  FROM ex),
       |est AS (
       |  SELECT t.w, t.exact_cnt, t.rank, min(ct.counter) AS cms_est
       |  FROM topw t JOIN hx ON hx.w = t.w
       |  JOIN ct ON ct.j = hx.j AND ct.bucket = hx.bucket
       |  WHERE t.rank <= $topK GROUP BY 1, 2, 3)""".stripMargin,
    s"""SELECT CAST(rank AS BIGINT) AS rank, w AS word, exact_cnt, cms_est,
       |  cms_est - exact_cnt AS overestimate
       |FROM est ORDER BY rank""".stripMargin)

  /** Containment-dedup oracle, mirroring
    * [[graft.docs.DocPipeline.containmentPairs]] over documents plus the
    * derived quote docs (12-token prefixes at id+200000). Standalone CTE
    * chain — the shared `toks`/`shh` CTEs are pinned to `documents` and
    * this op shingles an augmented corpus. */
  def containmentSql(threshold: Double, dfCap: Int): String =
    s"""WITH toks0 AS (
       |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
       |), quotes AS (
       |  SELECT doc_id + 200000 AS doc_id, array_to_string(t[1:12], ' ') AS text
       |  FROM toks0 WHERE len(t) >= 15 AND doc_id % 23 = 0
       |), allv AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL SELECT doc_id, text FROM quotes
       |), tk AS (
       |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM allv
       |), sg AS (
       |  SELECT DISTINCT doc_id, s FROM (
       |    SELECT doc_id, unnest(CASE WHEN len(t) >= 3
       |      THEN list_transform(generate_series(1, len(t) - 2),
       |             i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
       |      ELSE [array_to_string(t, ' ')] END) AS s
       |    FROM tk) x
       |), sgh AS (
       |  SELECT doc_id, $signedAbs % $P AS h
       |  FROM (SELECT doc_id, ('0x' || substr(sha256(s),1,16))::UBIGINT AS u
       |        FROM sg) y
       |), shc AS (
       |  SELECT s.doc_id, s.h FROM sgh s
       |  JOIN (SELECT h FROM sgh GROUP BY h HAVING count(*) <= $dfCap) r USING (h)
       |), sizes AS (SELECT doc_id, count(*) AS n FROM shc GROUP BY 1),
       |shared AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
       |  FROM shc a JOIN shc b ON a.h = b.h AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |sc AS (
       |  SELECT doc_a, doc_b, shared, sa.n AS na, sb.n AS nb,
       |    shared::DOUBLE / least(sa.n, sb.n) AS containment
       |  FROM shared JOIN sizes sa ON doc_a = sa.doc_id
       |  JOIN sizes sb ON doc_b = sb.doc_id)
       |SELECT doc_a, doc_b, shared, na, nb, containment,
       |  CASE WHEN na < nb THEN doc_a WHEN nb < na THEN doc_b
       |       ELSE greatest(doc_a, doc_b) END AS contained_doc
       |FROM sc WHERE containment >= $threshold
       |ORDER BY doc_a, doc_b""".stripMargin

  /** IVF ANN CTE chain (coarse quantizer from the label seed, 1-NN cell
    * assignment, nprobe=2 probes for the fixed audit panel
    * (`vec_id % 50 = 0 AND vec_id < 2000` — caps the panel at 40 probes
    * so corpus growth cannot grow the audit; see DocQueries.probePanel),
    * cell-scoped cosine scoring) ending in `ranked(query_id, rank,
    * neighbor_id, cosine, cell)`. Interpolated by BOTH consumers — the
    * `ann_ivf` oracle and the `search_hybrid_rrf` oracle's semantic leg
    * (DocQueries.oracles) — so the two rank against one definition and
    * cannot drift. */
  val ivfRankedCtes: String =
    s"""pos AS (
       |  SELECT label, vec_id, j, embedding[j] AS x FROM embeddings,
       |    unnest(generate_series(1, len(embedding))) AS g(j)
       |), cent AS (
       |  SELECT label AS cell, j,
       |    CAST(sum(CAST(x AS DECIMAL(27,12))) AS DOUBLE) / count(*) AS c
       |  FROM pos GROUP BY label, j
       |), centarr AS (
       |  SELECT cell, list(c ORDER BY j) AS ce FROM cent GROUP BY cell
       |), en AS (
       |  SELECT vec_id, embedding,
       |    sqrt(${dotSql("embedding", "embedding")}) AS n
       |  FROM embeddings
       |), celldist AS (
       |  SELECT en.vec_id, en.embedding, en.n, centarr.cell,
       |    list_reduce(list_transform(generate_series(1, len(en.embedding)),
       |      i -> (en.embedding[i]::DOUBLE - centarr.ce[i])
       |           * (en.embedding[i]::DOUBLE - centarr.ce[i])),
       |      (x, y) -> x + y) AS cdist
       |  FROM en CROSS JOIN centarr
       |), ranked_cells AS (
       |  SELECT *, row_number() OVER (PARTITION BY vec_id
       |    ORDER BY cdist, cell) AS crank
       |  FROM celldist
       |), assigned AS (
       |  SELECT vec_id AS neighbor_id, embedding AS ce_v, n AS cn, cell
       |  FROM ranked_cells WHERE crank = 1
       |), probes AS (
       |  SELECT vec_id AS query_id, embedding AS qe, n AS qn, cell
       |  FROM ranked_cells WHERE crank <= 2 AND vec_id % 50 = 0 AND vec_id < 2000
       |), scored AS (
       |  SELECT p.query_id, a.neighbor_id, a.cell,
       |    ${dotSql("p.qe", "a.ce_v")} / (p.qn * a.cn) AS cosine
       |  FROM assigned a JOIN probes p ON a.cell = p.cell
       |  WHERE a.neighbor_id <> p.query_id
       |), ranked AS (
       |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
       |    ORDER BY cosine DESC, neighbor_id) AS INT) AS rank FROM scored)""".stripMargin

  /** Wrap a SELECT with the doc CTE chain. */
  def docs(select: String): String =
    s"WITH $docsDup, $toks, $shingleHashes, $tokenHashes,\n$minhash,\n$simhash\n$select"

  def docsWith(extraCtes: String, select: String): String =
    s"WITH $docsDup, $toks, $shingleHashes, $tokenHashes,\n$minhash,\n$simhash,\n$extraCtes\n$select"

  def emb(extraCtes: String, select: String): String =
    s"WITH $extraCtes\n$select"
}
