package graft.queries

import org.apache.spark.sql.functions._

import graft.QFn
import graft.docs.{DocPipeline, MediaOps}
import graft.oracle.DocsOracle.docs

/** Multimodal-column queries: the binary payload plumbing of
  * [[graft.docs.MediaOps]], oracle-checked via the text-level equivalents
  * (payloads are UTF-8 bytes of ASCII fixtures, so byte and char
  * arithmetic coincide — the oracle computes on the string, Spark on the
  * real binary column). */
object MediaQueries {

  private def media(s: org.apache.spark.sql.SparkSession, d: String) =
    MediaOps.mediaFromDocuments(DocPipeline.documents(s, d))

  /** The media feature-vector table, memoized per (corpus, dims) — the
    * encoder output a production pipeline materializes once; media_ann's
    * exact tier and media_ann_audit's candidate build both read it
    * instead of re-decoding every payload per invocation. */
  private def mediaFeats(s: org.apache.spark.sql.SparkSession, d: String,
                         chunks: Int = 16) =
    Memo.of(s, s"$d/media_feats_$chunks") {
      MediaOps.featureVector(media(s, d), chunks)
        .select(col("media_id").as("vec_id"), col("features").as("embedding"))
    }

  /** `media_ann_audit`'s stratified candidate build — (probes, feature
    * vectors, candidate pairs) — extracted so the recall/cost scale gate
    * (MediaAnnAuditSpec) measures the EXACT candidate set the query
    * re-ranks, not a re-derivation that could drift. Strata: aHash band
    * mates ∪ feature-LSH band mates (`fbands` bands × 8 centered-sign
    * bits over a `chunks`-dim feature vector; the query's production
    * setting is the 2 × 8 / 16-dim default) ∪ the fixed 512-item
    * hash-ordered sample (see the query's doc). `fbands`/`chunks` are
    * the standard LSH recall/cost dial, parameterized so the scale gate
    * can MEASURE a dial step (e.g. 3×8 over 24 dims) without touching
    * the gated query. */
  private[graft] def auditCandidates(s: org.apache.spark.sql.SparkSession,
      d: String, fbands: Int = 2, chunks: Int = 16)
      : (org.apache.spark.sql.DataFrame,
         org.apache.spark.sql.DataFrame,
         org.apache.spark.sql.DataFrame) = {
    require(fbands * 8 <= chunks,
      s"$fbands bands x 8 bits need >= ${fbands * 8} feature dims, got $chunks")
    val m = media(s, d)
    val feats = mediaFeats(s, d, chunks)
    val probes = feats.filter(graft.queries.Panels.mediaAudit(col("vec_id")))
    val bands = MediaOps.phashBands(m)
    val probeBands = bands
      .join(probes.select(col("vec_id").as("media_id")), "media_id")
      .select(col("media_id").as("query_id"), col("band"), col("bval"))
    val bandMates = bands.join(probeBands, Seq("band", "bval"))
      .select(col("query_id"), col("media_id").as("neighbor_id"))
    // Loop-form band bits (VERDICT r18 #1): the former unrolled build —
    // 8 `when`s per band, EACH embedding the full chunks-term mean sum —
    // generated O(fbands·8·chunks) expression nodes inside one
    // generate_doConsume; at the 3×8/24-dim dial that blew janino's 64KB
    // method limit and silently degraded the x20 audit to interpreted
    // mode. `aggregate` HOFs emit a constant-size codegen loop, so the
    // generated code no longer grows with the dial. Semantics are
    // bit-identical: both are the same left-fold over array order on
    // exact binary-fraction values.
    val emean = aggregate(col("embedding"), lit(0.0d),
      (acc, x) => acc + x.cast("double")) / chunks.toDouble
    val fbandStructs = array((0 until fbands).map { b =>
      struct(lit(b).as("fband"),
        aggregate(sequence(lit(0), lit(7)), lit(0), (acc, j) =>
          acc + when(
            element_at(col("embedding"), lit(b * 8 + 1) + j).cast("double")
              > col("_emean"), call_function("shiftleft", lit(1), j))
            .otherwise(lit(0)))
          .as("fbval"))
    }: _*)
    val featBands = feats.withColumn("_emean", emean)
      .select(col("vec_id"), explode(fbandStructs).as("fb"))
      .select(col("vec_id"), col("fb.fband").as("fband"),
        col("fb.fbval").as("fbval"))
    val probeFeatBands = featBands
      .join(probes.select(col("vec_id").as("pid")), col("vec_id") === col("pid"))
      .select(col("pid").as("query_id"), col("fband"), col("fbval"))
    val featMates = featBands.join(probeFeatBands, Seq("fband", "fbval"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"))
    val sample = m.select(col("media_id").as("neighbor_id"))
      .orderBy(sha2(col("media_id").cast("string"), 256), col("media_id"))
      .limit(512)
    val samplePairs = probes.select(col("vec_id").as("query_id"))
      .crossJoin(sample)
    val pairs = bandMates.unionByName(featMates).unionByName(samplePairs)
      .distinct()
    (probes, feats, pairs)
  }

  val queries: Map[String, QFn] = Map(
    "media_meta_extract" -> ((s, d) => MediaOps.metaExtract(media(s, d))
      .orderBy("media_id")),

    "media_frame_sample" -> ((s, d) =>
      MediaOps.frameSample(media(s, d), stride = 64, frameLen = 32, maxFrames = 4)
        .orderBy("media_id", "frame_idx")),

    "media_decode_stub" -> ((s, d) => MediaOps.decodeStub(media(s, d)).toDF()
      .orderBy("media_id")),

    "media_resize_stub" -> ((s, d) => MediaOps.resizeStride(media(s, d), 4)
      .orderBy("media_id")),

    "media_feature_extract" -> ((s, d) => MediaOps.extractFeatures(media(s, d), 64)
      .orderBy("media_id")),

    // content-addressed exact dedup over the dup-replay fixture: byte-
    // identical payloads collapse to the lowest id; only the 32-byte
    // hash shuffles
    "media_dedup" -> ((s, d) =>
      MediaOps.dedupByContent(
          MediaOps.mediaFromDocuments(DocPipeline.documentsWithDups(s, d)))
        .orderBy("media_id")),

    // perceptual-hash near-dup tier over the dup-replay fixture: aHash
    // (64-point payload resample), 16-bit banded candidates, hamming <= 2
    // confirm — the layer between exact byte dedup and embedding cosine.
    // Kind does NOT fence candidates (re-uploads change metadata, not
    // perception); replays land under a different kind here and are
    // exactly the pairs the op must still catch
    "media_phash" -> ((s, d) =>
      MediaOps.phashPairs(
          MediaOps.mediaFromDocuments(DocPipeline.documentsWithDups(s, d)))
        .orderBy("media_a", "media_b")),

    // multimodal retrieval end-to-end: opaque binary payload → fixed-dim
    // feature vector (the encoder stand-in) → exact cosine top-3 over the
    // media corpus — the decode→embed→search pipeline with a real binary
    // column and the ANN operator unchanged from the embedding path
    "media_ann" -> ((s, d) => {
      val feats = mediaFeats(s, d)
      graft.docs.EmbeddingOps.bruteForceTopK(
          // fixed 125-probe audit panel (non-binding at the driver
          // fixtures, ≤5000 media): a rate-only panel grows with the
          // corpus and makes the exact scan quadratic — measured exp
          // 2.09 at x20 before the cap (SCALING.md round 12)
          feats.filter(graft.queries.Panels.mediaAudit(col("vec_id"))), feats, 3)
        .orderBy("query_id", "rank")
    }),

    // BOUNDED audit tier for the exact media scan (VERDICT r14 #6):
    // media_ann's full exact tier is the truth op but is linear in the
    // corpus per audit (x50 exp 0.93 — the one exponent tail). This is
    // the audit a 100 TB corpus can afford: exact cosine re-rank over a
    // STRATIFIED CANDIDATE SUPERSET — (a) the probe's aHash 16-bit band
    // mates (the perceptual candidate generator: catches near-DUPLICATE
    // payloads), (b) FEATURE-space LSH band mates (2 bands × 8
    // centered-sign bits over the 16-dim feature vector, bit = dim >
    // per-vector mean: catches cosine-SHAPE neighbors — round 16, after
    // measuring that the aHash+sample strata alone recall only ~0.10 of
    // the exact tier's top-3 once the corpus exceeds the fixed sample;
    // the r15 ≈0.9 reading was the 512-sample covering the whole
    // ≤500-item fixture), ∪ (c) a FIXED-SIZE hash-ordered global stratum
    // (512 items at any corpus size). Cost: band equi-joins, no
    // probes × corpus product — measured 300 candidates/probe (6% of a
    // 5000-item corpus) at feature-stratum recall 0.89 alone; the
    // centered-sign bit count is the standard LSH recall/cost dial
    // (swept 4×4 = 47%/1.0, 8×8 = 13%/0.96, 2×8 = 6%/0.89 — a larger
    // corpus raises bits, not the audit's structure). Bit arithmetic is
    // exact in both engines: features are quarter-integer byte means,
    // the vector mean is their /16 — all binary fractions.
    // MediaAnnAuditSpec pins recall ≥ 0.8 vs the exact tier AT THE SF
    // WHERE THE SAMPLE DOES NOT COVER THE CORPUS, and that the banded
    // strata contribute beyond the fixed sample.
    "media_ann_audit" -> ((s, d) => {
      val (probes, feats, pairs) = auditCandidates(s, d)
      graft.docs.EmbeddingOps.candidateTopK(probes, feats, pairs, 3)
        .orderBy("query_id", "rank")
    }),

    // REAL-codec decode inside the driver-gated surface (round 14): a
    // fixed 256-image PNG panel is synthesized IN EXECUTORS (dims a
    // pure function of the id), decoded through ImageIoDecode behind
    // the production MediaDecoder seam, and the decoded dims are
    // emitted. The oracle recomputes the dims in closed form, so a
    // codec that misreported dimensions, dropped ids, or threw on a
    // valid PNG fails the HASH gate, not just a unit test. byte_len is
    // deliberately NOT emitted: PNG byte size is an encoder property,
    // decoded geometry is the codec contract. Fixed panel => corpus-
    // independent by construction (the Panels lesson, strongest form);
    // at scale this is an embarrassingly parallel mapPartitions with
    // zero shuffle before the 256-row sort.
    "media_decode_real" -> ((s, d) => {
      import s.implicits._
      val panel = s.range(256).as[Long].mapPartitions(_.map { id =>
        val w = 4 + (id % 16).toInt
        val h = 4 + ((id * 7) % 16).toInt
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var x = 0
        while (x < w) {
          var y = 0
          while (y < h) { img.setRGB(x, y, ((x * 31 + y * 7) % 255) << 8); y += 1 }
          x += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        MediaOps.imageIoMemoryOnly // no per-image temp file under /tmp
        javax.imageio.ImageIO.write(img, "png", bos)
        MediaOps.MediaRow(id, "image", bos.toByteArray)
      })
      MediaOps.decodeStub(panel.toDF(), MediaOps.ImageIoDecode).toDF()
        .select(col("media_id"), col("kind"), col("width"), col("height"),
          col("channels"))
        .orderBy("media_id")
    }),

    // The audio sibling of media_decode_real: a fixed 256-clip WAV
    // panel (rate/frames/channels pure functions of the id), decoded
    // through WavDecode's O(1) header parse; the pinned audio mapping
    // (width=rate, height=frames, channels=channels) is what the
    // closed-form oracle recomputes. Same contract: real-codec
    // round-trip proven by the hash gate, corpus-independent panel,
    // zero shuffle before the 256-row sort.
    "media_decode_audio" -> ((s, d) => {
      import s.implicits._
      val panel = s.range(256).as[Long].mapPartitions(_.map { id =>
        val rate = 8000 * (1 + (id % 3).toInt) // 8/16/24 kHz
        val ch = 1 + (id % 2).toInt
        val frames = 40 + (id * 3 % 100).toInt
        val fmt = new javax.sound.sampled.AudioFormat(
          rate.toFloat, 16, ch, true, false)
        val pcm = Array.tabulate(frames * ch * 2)(i => (i * 17 + 3).toByte)
        val ais = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
        val bos = new java.io.ByteArrayOutputStream()
        javax.sound.sampled.AudioSystem.write(ais,
          javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
        MediaOps.MediaRow(id, "audio", bos.toByteArray)
      })
      MediaOps.decodeStub(panel.toDF(), MediaOps.WavDecode).toDF()
        .select(col("media_id"), col("kind"), col("width"), col("height"),
          col("channels"))
        .orderBy("media_id")
    }))

  val oracles: Map[String, String] = Map(
    // closed-form dims: the panel generator and this formula are the
    // SAME function of the id; the engine side additionally round-trips
    // the image through a real PNG encode+decode
    "media_decode_real" ->
      """SELECT CAST(k AS BIGINT) AS media_id, 'image' AS kind,
        |  CAST(4 + k % 16 AS INT) AS width,
        |  CAST(4 + (k * 7) % 16 AS INT) AS height,
        |  CAST(3 AS INT) AS channels
        |FROM unnest(generate_series(0, 255)) AS g(k)
        |ORDER BY media_id""".stripMargin,

    "media_decode_audio" ->
      """SELECT CAST(k AS BIGINT) AS media_id, 'audio' AS kind,
        |  CAST(8000 * (1 + k % 3) AS INT) AS width,
        |  CAST(40 + (k * 3) % 100 AS INT) AS height,
        |  CAST(1 + k % 2 AS INT) AS channels
        |FROM unnest(generate_series(0, 255)) AS g(k)
        |ORDER BY media_id""".stripMargin,

    "media_meta_extract" -> docs(
      """SELECT doc_id AS media_id,
        |  CASE WHEN doc_id % 3 = 0 THEN 'image'
        |       WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
        |  CAST(length(text) AS BIGINT) AS byte_len,
        |  sha256(text) AS payload_sha,
        |  ascii(substr(text, 1, 1)) AS header_byte0
        |FROM documents ORDER BY media_id""".stripMargin),

    "media_frame_sample" -> docs(
      """SELECT doc_id AS media_id, CAST(k AS INTEGER) AS frame_idx,
        |  sha256(substr(text, k * 64 + 1, 32)) AS frame_sha
        |FROM documents, unnest(generate_series(0, 3)) AS g(k)
        |WHERE k * 64 + 32 <= length(text)
        |ORDER BY media_id, frame_idx""".stripMargin),

    "media_resize_stub" -> docs(
      """SELECT doc_id AS media_id,
        |  CAST(length(text) AS BIGINT) AS orig_len,
        |  CAST(length(text) // 4 AS BIGINT) AS resized_len,
        |  sha256(array_to_string(
        |    list_transform(generate_series(1, length(text) // 4),
        |      i -> substr(text, (i - 1) * 4 + 1, 1)), '')) AS resized_sha
        |FROM documents ORDER BY media_id""".stripMargin),

    "media_feature_extract" -> docs(
      """SELECT doc_id AS media_id,
        |  CASE WHEN doc_id % 3 = 0 THEN 'image'
        |       WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
        |  CAST(list_reduce(list_transform(
        |         generate_series(1, least(64, length(text))),
        |         i -> ascii(substr(text, i, 1))), (a, b) -> a + b) AS DOUBLE)
        |    / least(64, length(text)) AS mean_byte,
        |  list_max(list_transform(generate_series(1, least(64, length(text))),
        |    i -> ascii(substr(text, i, 1)))) AS max_byte
        |FROM documents ORDER BY media_id""".stripMargin),

    "media_decode_stub" -> docs(
      """SELECT doc_id AS media_id,
        |  CASE WHEN doc_id % 3 = 0 THEN 'image'
        |       WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
        |  CAST(length(text) AS BIGINT) AS byte_len,
        |  CAST(64 + length(text) % 512 AS INT) AS width,
        |  CAST(48 + (length(text) * 7) % 512 AS INT) AS height,
        |  CAST(CASE WHEN doc_id % 3 = 1 THEN 2 ELSE 3 END AS INT) AS channels
        |FROM documents ORDER BY media_id""".stripMargin),

    "media_dedup" -> docs(
      """SELECT media_id, kind, payload_sha,
        |  min(media_id) OVER (PARTITION BY payload_sha) AS keeper_id,
        |  media_id <> min(media_id) OVER (PARTITION BY payload_sha) AS is_dup
        |FROM (
        |  SELECT doc_id AS media_id,
        |    CASE WHEN doc_id % 3 = 0 THEN 'image'
        |         WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
        |    sha256(text) AS payload_sha
        |  FROM docs_dup) m
        |ORDER BY media_id""".stripMargin),

    "media_phash" -> {
      // 64-bit aHash mirror. Bit 63's mask: 1L << 63 is BIGINT min — the
      // positive literal would parse as HUGEINT (and 1::BIGINT << 63
      // raises an overflow error), so it is spelled (-BIGINT max - 1);
      // assembly is bitwise OR (no carries, no ANSI overflow on either
      // engine)
      val bits = (0 until 64)
        .map { c =>
          val mask =
            if (c == 63) "(-9223372036854775807 - 1)" else s"(1::BIGINT << $c)"
          s"CASE WHEN e[${c + 1}] > m THEN $mask ELSE 0::BIGINT END"
        }
        .mkString("(", " | ", ")")
      // 64-point even resampling of the payload (sample c = byte at
      // 1 + floor(c*len/64)) — mirrors MediaOps.phashPairs exactly; the
      // floor-division positions are exact integers on both engines
      graft.oracle.DocsOracle.docsWith(
        s"""mp AS (
           |  SELECT doc_id AS media_id,
           |    CASE WHEN doc_id % 3 = 0 THEN 'image'
           |         WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
           |    e,
           |    list_reduce(list_transform(e, x -> x::DOUBLE), (a, b) -> a + b)
           |      / 64.0 AS m
           |  FROM (
           |    SELECT doc_id, list_transform(generate_series(0, 63),
           |      c -> CASE WHEN length(text) = 0 THEN 0
           |             ELSE ascii(substr(text,
           |               CAST((c * length(text)) // 64 AS INT) + 1, 1)) END) AS e
           |    FROM docs_dup) xe),
           |phh AS (SELECT media_id, kind, $bits AS phash FROM mp),
           |phb AS (
           |  SELECT media_id, kind, phash, bb AS band,
           |    (phash >> (bb * 16)) & 65535 AS bval
           |  FROM phh, unnest(generate_series(0, 3)) AS g(bb)),
           |phc AS (
           |  SELECT DISTINCT a.media_id AS media_a, b.media_id AS media_b,
           |    a.kind AS kind_a, b.kind AS kind_b,
           |    a.phash AS ph_a, b.phash AS ph_b
           |  FROM phb a JOIN phb b ON a.band = b.band
           |    AND a.bval = b.bval AND a.media_id < b.media_id)""".stripMargin,
        """SELECT media_a, media_b, kind_a, kind_b, ph_a, ph_b,
          |  CAST(bit_count(xor(ph_a, ph_b)) AS INT) AS hamming
          |FROM phc WHERE bit_count(xor(ph_a, ph_b)) <= 2
          |ORDER BY media_a, media_b""".stripMargin)
    },

    "media_ann_audit" -> {
      val dot = graft.oracle.DocsOracle.dotSql("q.e", "c.e")
      val bits = (0 until 64)
        .map { c =>
          val mask =
            if (c == 63) "(-9223372036854775807 - 1)" else s"(1::BIGINT << $c)"
          s"CASE WHEN e[${c + 1}] > m THEN $mask ELSE 0::BIGINT END"
        }
        .mkString("(", " | ", ")")
      graft.oracle.DocsOracle.docsWith(
        s"""fva AS MATERIALIZED (
           |  SELECT vec_id, e, sqrt(${graft.oracle.DocsOracle.dotSql("e", "e")}) AS n
           |  FROM (
           |    SELECT doc_id AS vec_id, list_transform(generate_series(0, 15),
           |      c -> CAST((b[c*4+1] + b[c*4+2] + b[c*4+3] + b[c*4+4]) / 4.0 AS FLOAT)) AS e
           |    FROM (
           |      SELECT doc_id, list_transform(generate_series(1, 64),
           |        i -> CASE WHEN i <= length(text)
           |             THEN ascii(substr(text, i, 1)) ELSE 0 END) AS b
           |      FROM documents) fb) fv0),
           |mpa AS (
           |  SELECT doc_id AS media_id, e,
           |    list_reduce(list_transform(e, x -> x::DOUBLE), (a, b) -> a + b)
           |      / 64.0 AS m
           |  FROM (
           |    SELECT doc_id, list_transform(generate_series(0, 63),
           |      c -> CASE WHEN length(text) = 0 THEN 0
           |             ELSE ascii(substr(text,
           |               CAST((c * length(text)) // 64 AS INT) + 1, 1)) END) AS e
           |    FROM documents) xe),
           |phba AS MATERIALIZED (
           |  SELECT media_id, bb AS band, (phash >> (bb * 16)) & 65535 AS bval
           |  FROM (SELECT media_id, $bits AS phash FROM mpa) pha,
           |    unnest(generate_series(0, 3)) AS g(bb)),
           |bm AS (
           |  SELECT DISTINCT p.media_id AS query_id, a.media_id AS neighbor_id
           |  FROM phba a JOIN phba p ON a.band = p.band AND a.bval = p.bval
           |  WHERE p.media_id % 40 = 0 AND p.media_id < 5000),
           |ffm AS (
           |  SELECT vec_id,
           |    list_reduce(list_transform(e, x -> x::DOUBLE), (a, b) -> a + b)
           |      / 16.0 AS m, e
           |  FROM fva),
           |ffb AS MATERIALIZED (
           |  SELECT vec_id, bb AS fband,
           |    (CASE WHEN e[bb*8+1]::DOUBLE > m THEN 1 ELSE 0 END
           |     + CASE WHEN e[bb*8+2]::DOUBLE > m THEN 2 ELSE 0 END
           |     + CASE WHEN e[bb*8+3]::DOUBLE > m THEN 4 ELSE 0 END
           |     + CASE WHEN e[bb*8+4]::DOUBLE > m THEN 8 ELSE 0 END
           |     + CASE WHEN e[bb*8+5]::DOUBLE > m THEN 16 ELSE 0 END
           |     + CASE WHEN e[bb*8+6]::DOUBLE > m THEN 32 ELSE 0 END
           |     + CASE WHEN e[bb*8+7]::DOUBLE > m THEN 64 ELSE 0 END
           |     + CASE WHEN e[bb*8+8]::DOUBLE > m THEN 128 ELSE 0 END) AS fbval
           |  FROM ffm, unnest(generate_series(0, 1)) AS g(bb)),
           |fm AS (
           |  SELECT DISTINCT p.vec_id AS query_id, a.vec_id AS neighbor_id
           |  FROM ffb a JOIN ffb p ON a.fband = p.fband AND a.fbval = p.fbval
           |  WHERE p.vec_id % 40 = 0 AND p.vec_id < 5000),
           |samp AS (
           |  SELECT doc_id AS neighbor_id FROM documents
           |  ORDER BY sha256(CAST(doc_id AS VARCHAR)), doc_id LIMIT 512),
           |sp AS (
           |  SELECT d.doc_id AS query_id, s.neighbor_id FROM documents d, samp s
           |  WHERE d.doc_id % 40 = 0 AND d.doc_id < 5000),
           |prs AS (SELECT DISTINCT query_id, neighbor_id FROM (
           |  SELECT * FROM bm UNION ALL SELECT * FROM fm
           |  UNION ALL SELECT * FROM sp) u)""".stripMargin,
        s"""SELECT query_id, rank, neighbor_id, cosine FROM (
           |  SELECT p.query_id, p.neighbor_id, $dot / (q.n * c.n) AS cosine,
           |    CAST(row_number() OVER (PARTITION BY p.query_id
           |      ORDER BY $dot / (q.n * c.n) DESC, p.neighbor_id) AS INTEGER) AS rank
           |  FROM prs p JOIN fva q ON q.vec_id = p.query_id
           |    JOIN fva c ON c.vec_id = p.neighbor_id
           |  WHERE p.neighbor_id <> p.query_id) x
           |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin)
    },

    "media_ann" -> {
      val dot = graft.oracle.DocsOracle.dotSql("q.e", "c.e")
      docs(
        s"""SELECT query_id, rank, neighbor_id, cosine FROM (
           |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           |    $dot / (q.n * c.n) AS cosine,
           |    CAST(row_number() OVER (PARTITION BY q.vec_id
           |      ORDER BY $dot / (q.n * c.n) DESC, c.vec_id) AS INTEGER) AS rank
           |  FROM (
           |    SELECT vec_id, e, sqrt(${graft.oracle.DocsOracle.dotSql("e", "e")}) AS n
           |    FROM (
           |      SELECT doc_id AS vec_id, list_transform(generate_series(0, 15),
           |        c -> CAST((b[c*4+1] + b[c*4+2] + b[c*4+3] + b[c*4+4]) / 4.0 AS FLOAT)) AS e
           |      FROM (
           |        SELECT doc_id, list_transform(generate_series(1, 64),
           |          i -> CASE WHEN i <= length(text)
           |               THEN ascii(substr(text, i, 1)) ELSE 0 END) AS b
           |        FROM documents) fb) fv) c
           |  CROSS JOIN (
           |    SELECT vec_id, e, sqrt(${graft.oracle.DocsOracle.dotSql("e", "e")}) AS n
           |    FROM (
           |      SELECT doc_id AS vec_id, list_transform(generate_series(0, 15),
           |        c -> CAST((b[c*4+1] + b[c*4+2] + b[c*4+3] + b[c*4+4]) / 4.0 AS FLOAT)) AS e
           |      FROM (
           |        SELECT doc_id, list_transform(generate_series(1, 64),
           |          i -> CASE WHEN i <= length(text)
           |               THEN ascii(substr(text, i, 1)) ELSE 0 END) AS b
           |        FROM documents) fb2) fv2
           |    WHERE vec_id % 40 = 0 AND vec_id < 5000) q
           |  WHERE c.vec_id <> q.vec_id) x
           |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin)
    })
}
