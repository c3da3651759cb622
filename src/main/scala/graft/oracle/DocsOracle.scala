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

  /** Wrap a SELECT with the doc CTE chain. */
  def docs(select: String): String =
    s"WITH $docsDup, $toks, $shingleHashes, $tokenHashes,\n$minhash,\n$simhash\n$select"

  def docsWith(extraCtes: String, select: String): String =
    s"WITH $docsDup, $toks, $shingleHashes, $tokenHashes,\n$minhash,\n$simhash,\n$extraCtes\n$select"

  def emb(extraCtes: String, select: String): String =
    s"WITH $extraCtes\n$select"
}
