package graft

import org.apache.spark.sql.functions._

import graft.docs.{DocPipeline, EmbeddingOps, MediaOps}

/** Unit-level evidence for the training-data ops on tiny literal corpora
  * with known answers (the oracle gate covers the fixture corpus; these
  * pin the semantics on hand-checkable inputs). */
class DocOpsSpec extends SparkSpec {

  import spark.implicits._

  private val corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2L, "the quick brown fox jumps over the lazy dog near the river bank tonight"), // near-dup of 1
    (3L, "completely different content about spark query engines and shuffles here"),
    (4L, "the quick brown fox jumps over the lazy dog near the river bank today")) // exact dup of 1
    .toDF("doc_id", "text")

  test("exact dedup groups exact copies, keeper is lowest id") {
    val groups = DocPipeline.exactDupGroups(corpus).collect()
    assert(groups.length == 3)
    val dup = groups.filter(_.getLong(2) == 2L)
    assert(dup.length == 1 && dup(0).getLong(1) == 1L, "1 and 4 grouped, keeper=1")
  }

  test("n-gram Jaccard finds the near-dup pair and not the unrelated doc") {
    val pairs = DocPipeline.jaccardPairs(corpus, 0.5)
      .select("doc_a", "doc_b", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val keys = pairs.map(p => (p._1, p._2)).toSet
    assert(keys.contains((1L, 2L)) && keys.contains((1L, 4L)) && keys.contains((2L, 4L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
    assert(pairs.find(p => (p._1, p._2) == (1L, 4L)).get._3 == 1.0, "exact dup => jaccard 1")
  }

  test("Jaccard df-cap kills the hot-shingle quadratic bucket, keeps true near-dups") {
    // every doc opens with the same boilerplate 3-gram; docs 1/2 are also
    // genuine near-dups of each other, docs 3-5 share ONLY the boilerplate
    val boiler = "terms of service"
    val hot = Seq(
      (1L, s"$boiler alpha beta gamma delta epsilon zeta"),
      (2L, s"$boiler alpha beta gamma delta epsilon eta"),
      (3L, s"$boiler uno dos tres cuatro cinco seis"),
      (4L, s"$boiler eins zwei drei vier funf sechs"),
      (5L, s"$boiler one two three four five six")).toDF("doc_id", "text")
    // dfCap below the corpus size drops the shared shingle before the
    // self-join: no candidate pairs among 3/4/5 (their only link is gone)
    val capped = DocPipeline.jaccardPairs(hot, 0.3, dfCap = 4)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == Set((1L, 2L)), s"only the true near-dup survives: $capped")
    // uncapped, the boilerplate shingle links every doc pair (10 buckets
    // of candidates from one hot key — the quadratic shape the cap kills)
    val uncapped = DocPipeline.jaccardPairs(hot, 0.0, dfCap = Int.MaxValue)
      .select("doc_a", "doc_b").collect()
    assert(uncapped.length == 10, "hot shingle creates all 5*4/2 candidate pairs")
  }

  test("SimHash 16-bit bands exceed the 256-key capacity of 8-bit banding") {
    // 300 docs of distinct content: an 8-bit band has only 256 possible
    // keys corpus-wide (pigeonhole => guaranteed collisions and N/256
    // buckets at scale); the implemented 16-bit band must spread wider
    val many = (1 to 300).map(i =>
      (i.toLong, (0 until 8).map(j => s"tok${i}x$j").mkString(" ")))
      .toDF("doc_id", "text")
    val distinctBand0 = DocPipeline.simhashes(many)
      .select((col("simhash").bitwiseAND(DocPipeline.SimhashBandMask)).as("b0"))
      .distinct().count()
    assert(distinctBand0 > 256,
      s"16-bit band-0 keys ($distinctBand0) exceed 8-bit capacity")
    assert(DocPipeline.SimhashBits == 64 && DocPipeline.SimhashBandBits == 16)
  }

  test("MinHash-LSH surfaces the same near-dup candidates") {
    val pairs = DocPipeline.minhashLshPairs(corpus, 0.5)
      .select("doc_a", "doc_b", "est_jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.exists(p => (p._1, p._2) == (1L, 4L) && p._3 == 1.0))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("SimHash: exact dups at hamming 0, near-dups close, unrelated far") {
    val sims = DocPipeline.simhashes(corpus).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sims(1L) == sims(4L), "identical text, identical simhash")
    val hamNear = java.lang.Long.bitCount(sims(1L) ^ sims(2L))
    val hamFar = java.lang.Long.bitCount(sims(1L) ^ sims(3L))
    assert(hamNear < hamFar, s"near ($hamNear) < far ($hamFar)")
  }

  test("connected components: a chain collapses to one cluster with the min-id keeper") {
    // edges 1-2, 2-3 (a chain: 1 and 3 never share an edge) + isolated pair 7-9
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 9L)).toDF("doc_a", "doc_b")
    val comps = DocPipeline.nearDupComponents(pairs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(comps(1L) == (1L, true) && comps(2L) == (1L, false) && comps(3L) == (1L, false),
      "transitive closure reaches across the chain")
    assert(comps(7L) == (7L, true) && comps(9L) == (7L, false))
    assert(comps.size == 5)
  }

  test("pagerank: hand-computed path graph, mass conserved, hub ranks highest") {
    // path 1—2—3: deg 1/2/1. r0=1 →
    // r1 = (.575, 1.85, .575), r2 = (.93625, 1.1275, .93625)
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("doc_a", "doc_b")
    val got = DocPipeline.pageRank(pairs, 2).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got(1L)._1 == 1 && got(2L)._1 == 2 && got(3L)._1 == 1, "degrees")
    assert(math.abs(got(1L)._2 - 0.93625) < 1e-9, s"${got(1L)}")
    assert(math.abs(got(2L)._2 - 1.1275) < 1e-9, s"${got(2L)}")
    assert(math.abs(got(3L)._2 - 0.93625) < 1e-9)
    assert(got(2L)._2 > got(1L)._2, "the hub outranks the leaves")
    // undirected + damping conserves total mass: 0.15·n + 0.85·n = n
    assert(math.abs(got.values.map(_._2).sum - 3.0) < 1e-9)
  }

  test("PII scrub redacts emails, phones, IPs and leaves prose alone") {
    val doc = Seq((1L, "reach me at jane.doe+x@corp.example.org or 555-867-5309, host 192.168.1.10 thanks"))
      .toDF("doc_id", "text")
    val got = doc.select(DocPipeline.piiScrub(col("text"))).collect()(0).getString(0)
    assert(got == "reach me at <EMAIL> or <PHONE>, host <IP> thanks")
  }

  test("stratified sample is deterministic and respects per-language rates") {
    val docs = (1 to 600).map(i =>
      (i.toLong, s"text $i", Seq("en", "es", "de")(i % 3))).toDF("doc_id", "text", "lang")
    val s1 = DocPipeline.stratifiedSample(docs, Map("en" -> 50, "es" -> 20, "de" -> 0))
    val s2 = DocPipeline.stratifiedSample(docs, Map("en" -> 50, "es" -> 20, "de" -> 0))
    assert(s1.collect().map(_.getLong(0)).toSet == s2.collect().map(_.getLong(0)).toSet,
      "hash-based sample is reproducible")
    val byLang = s1.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!byLang.contains("de"), "0% stratum drops entirely")
    // 200 docs per stratum; hash buckets are near-uniform
    assert(byLang("en") > 70 && byLang("en") < 130)
    assert(byLang("es") > 15 && byLang("es") < 70)
  }

  test("contamination flags docs overlapping the eval set, never self-matches") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta"),
      (2L, "alpha beta gamma delta nothing else here"), // overlaps eval doc 1
      (3L, "totally unrelated content words only here")).toDF("doc_id", "text")
    val eval = corpus.filter(col("doc_id") === 1L)
    val hits = DocPipeline.contamination(corpus, eval, minShared = 2).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(hits.keySet == Set(2L), s"doc 1 is the eval doc itself (no self-match): $hits")
    assert(hits(2L) == 2L, "shares 'alpha beta gamma' and 'beta gamma delta'")
  }

  test("repetition stats: boilerplate scores high bigram fraction, prose low") {
    val docs = Seq(
      (1L, "buy now buy now buy now buy now"),         // 'buy now' dominates
      (2L, "each word here appears exactly once only"),
      (3L, "solo")).toDF("doc_id", "text")              // 1 token → NULL bigram frac
    val got = DocPipeline.repetitionStats(docs).collect()
      .map(r => r.getLong(0) ->
        (r.getDouble(1), Option(r.get(2)).map(_.asInstanceOf[Double]))).toMap
    // doc 1: 8 tokens, 2 distinct → ttr 0.25; 7 bigrams, 'buy now' ×4 → 4/7
    assert(got(1L)._1 == 0.25 && math.abs(got(1L)._2.get - 4.0 / 7) < 1e-12)
    // doc 2: all distinct → ttr 1.0; every bigram unique → 1/6
    assert(got(2L)._1 == 1.0 && math.abs(got(2L)._2.get - 1.0 / 6) < 1e-12)
    assert(got(3L)._1 == 1.0 && got(3L)._2.isEmpty)
  }

  test("language id picks the stopword-dominant language") {
    val docs = Seq(
      (1L, "the cat is on the mat with a hat"),
      (2L, "el gato es un animal y la casa es grande"),
      (3L, "der hund und die katze mit der maus")).toDF("doc_id", "text")
    val got = DocPipeline.langId(docs).select("doc_id", "lang_pred").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "en", 2L -> "es", 3L -> "de"))
  }

  test("k-means: two well-separated clusters converge to their exact means") {
    val vecs = Seq(
      (1L, Array(0.0f, 0.0f)), (2L, Array(0.0f, 2.0f)),    // cluster at (0,1)
      (3L, Array(10.0f, 10.0f)), (4L, Array(10.0f, 12.0f)) // cluster at (10,11)
      ).toDF("vec_id", "embedding")
    // seeds = vec_ids 1 and 2 (both in the left cluster); one Lloyd round
    // pulls 3 and 4 toward seed 2's cell, the second separates cleanly
    val cent = EmbeddingOps.kmeansCentroids(vecs, 2, 2).collect()
      .map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    val assign = EmbeddingOps.assignTo(vecs, EmbeddingOps.kmeansCentroids(vecs, 2, 2))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(assign(1L) == assign(2L) && assign(3L) == assign(4L)
      && assign(1L) != assign(3L), s"clusters separate: $assign")
    // exact means (small integers → decimal sums exact)
    val cells = assign(1L) :: assign(3L) :: Nil
    assert(cent(cells.head) == Seq(0.0, 1.0))
    assert(cent(cells(1)) == Seq(10.0, 11.0))
  }

  test("brute-force ANN ranks an identical vector first") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(1.0f, 0.0f, 0.0f)),   // identical to 0
      (2L, Array(0.9f, 0.1f, 0.0f)),   // close
      (3L, Array(0.0f, 0.0f, 1.0f)))   // orthogonal
      .toDF("vec_id", "embedding")
    val top = EmbeddingOps.bruteForceTopK(vecs.filter(col("vec_id") === 0), vecs, 3)
      .orderBy("rank").collect()
    assert(top.map(_.getLong(2)).toSeq == Seq(1L, 2L, 3L))
    assert(math.abs(top(0).getDouble(3) - 1.0) < 1e-12)
  }

  test("media feature vector: 4-byte chunk means, zero-padded past EOF") {
    import org.apache.spark.sql.functions.lit
    val media = Seq((1L, "ABCDEFGH".getBytes("UTF-8")))  // 8 bytes < 64
      .toDF("media_id", "payload").withColumn("kind", lit("image"))
    val v = graft.docs.MediaOps.featureVector(media)
      .select("features").collect().head.getSeq[Float](0)
    assert(v.length == 16)
    assert(v(0) == (65 + 66 + 67 + 68) / 4.0f, "chunk 0 = mean of ABCD")
    assert(v(1) == (69 + 70 + 71 + 72) / 4.0f, "chunk 1 = mean of EFGH")
    assert(v.drop(2).forall(_ == 0.0f), "chunks past EOF are zero")
  }

  test("media content dedup: byte-identical payloads collapse across kinds, bytes decide") {
    val media = Seq(
      (1L, "image", "same bytes".getBytes("UTF-8")),
      (2L, "video", "same bytes".getBytes("UTF-8")), // re-upload, other kind
      (3L, "image", "same bytes ".getBytes("UTF-8")), // trailing space → distinct
      (4L, "audio", "other".getBytes("UTF-8")))
      .toDF("media_id", "kind", "payload")
    val got = MediaOps.dedupByContent(media).collect()
      .map(r => r.getLong(0) -> ((r.getLong(3), r.getBoolean(4)))).toMap
    assert(got(1L) == ((1L, false)) && got(2L) == ((1L, true)),
      s"identical bytes collapse regardless of kind: $got")
    assert(got(3L) == ((3L, false)) && got(4L) == ((4L, false)))
  }

  test("binary frame sampling hashes the expected byte ranges") {
    val media = Seq((1L, "image", ("abcd" * 40).getBytes("UTF-8")))
      .toDF("media_id", "kind", "payload")
    val frames = MediaOps.frameSample(media, stride = 64, frameLen = 32, maxFrames = 4)
      .orderBy("frame_idx").collect()
    assert(frames.length == 3, "160 bytes: offsets 0,64,128 fit a 32-byte frame")
    val expected0 = java.security.MessageDigest.getInstance("SHA-256")
      .digest(("abcd" * 8).getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(frames(0).getString(2) == expected0)
  }

  test("media decoder seam: custom MediaDecoder swaps in via constructor arg") {
    import graft.docs.MediaOps.{DecodedMeta, MediaDecoder, MediaRow}
    val media = Seq(
      (1L, "image", "abc".getBytes("UTF-8")),
      (2L, "audio", "defghi".getBytes("UTF-8")))
      .toDF("media_id", "kind", "payload")
    // a stand-in "real codec": fixed 2x2 mono output, byte_len from bytes
    object FixedDecode extends MediaDecoder {
      def decode(r: MediaRow): DecodedMeta =
        DecodedMeta(r.media_id, r.kind, r.payload.length.toLong, 2, 2, 1)
    }
    val got = MediaOps.decodeStub(media, FixedDecode)
      .collect().map(m => m.media_id -> m).toMap
    assert(got(1L) == DecodedMeta(1L, "image", 3L, 2, 2, 1))
    assert(got(2L) == DecodedMeta(2L, "audio", 6L, 2, 2, 1))
    // default decoder (the deterministic stub) still runs through the seam
    val dflt = MediaOps.decodeStub(media).collect().map(m => m.media_id -> m).toMap
    assert(dflt(1L).byte_len == 3L && dflt(1L).channels == 3)
    assert(dflt(2L).channels == 2, "audio kind decodes to 2 channels in the stub")
  }

  test("URL canonicalization: host case, tracking params, fragments, slashes") {
    val urls = Seq(
      (1L, "HTTPS://WWW.Example.COM/Page/3?utm_source=x#frag"),
      (2L, "https://www.example.com/Page/3/"),
      (3L, "https://www.example.com/Page/3"),
      (4L, "https://www.example.com/page/3"))   // path case is significant
      .toDF("doc_id", "url")
    val canon = urls.select(col("doc_id"),
      DocPipeline.canonicalUrl(col("url")).as("c")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(canon(1L) == "https://www.example.com/Page/3")
    assert(canon(2L) == canon(1L) && canon(3L) == canon(1L),
      "case/params/fragment/trailing-slash variants collapse")
    assert(canon(4L) != canon(1L), "path case preserved (RFC 3986)")
  }

  test("hash split is stable under corpus growth and respects bucket bounds") {
    val small = (1L to 200L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val grown = (1L to 400L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    def assignments(df: org.apache.spark.sql.DataFrame) =
      DocPipeline.hashSplit(df, "doc_id", 80, 10)
        .select("doc_id", "split").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
    val a = assignments(small)
    val b = assignments(grown)
    assert(a.forall { case (id, s) => b(id) == s },
      "adding docs never reassigns an existing one")
    val counts = b.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(counts("train") > counts("test") && counts("test") > 0 && counts("val") > 0,
      s"all three splits populated, train largest: $counts")
  }

  test("paragraph dedup keeps a duplicated paragraph only at its first occurrence") {
    // 10-token paragraphs; doc 2 repeats doc 1's first paragraph verbatim
    val p1 = "a b c d e f g h i j"
    val p2 = "k l m n o p q r s t"
    val p3 = "u v w x y z aa bb cc dd"
    val docs = Seq(
      (1L, s"$p1 $p2"),
      (2L, s"$p1 $p3")).toDF("doc_id", "text")
    val out = DocPipeline.paragraphDedup(docs, 10).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(out(1L) == ((2L, 2L, s"$p1\n$p2")), "doc 1 keeps both paragraphs")
    assert(out(2L) == ((2L, 1L, p3)), "doc 2 loses the repeated paragraph, keeps its own")
  }

  test("C4 rules: each heuristic rejects its defect, clean text passes") {
    val docs = Seq(
      (1L, "this text is long enough and it ends properly."),
      (2L, "too short."),                                         // min_words (2 tokens)
      (3L, "plenty of words here but no terminal punctuation at all"),
      (4L, "this document mentions Lorem Ipsum boilerplate somewhere inside."),
      (5L, "function main() { return 0; } plus some words after."),
      (6L, s"one ${"x" * 60} word is pathologically long in here."))
      .toDF("doc_id", "text")
    val got = DocPipeline.c4Rules(docs).collect()
      .map(r => r.getLong(0) -> (r.getBoolean(7), Option(r.getString(8)))).toMap
    assert(got(1L) == ((true, None)))
    assert(got(2L) == ((false, Some("min_words"))))
    assert(got(3L) == ((false, Some("terminal_punct"))))
    assert(got(4L) == ((false, Some("lorem_ipsum"))))
    assert(got(5L) == ((false, Some("code_brace"))))
    assert(got(6L) == ((false, Some("word_len"))))
  }

  test("bloom decontamination returns exactly the exact-join result") {
    val eval = corpus.filter(col("doc_id") === 1L)
    val exact = DocPipeline.contamination(corpus, eval, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val bloom = DocPipeline.bloomContamination(corpus, eval, 2,
      expectedItems = 1000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(bloom == exact, "the bloom only prunes; it never changes the result")
    assert(exact.map(_._1).intersect(Set(2L, 4L)) == Set(2L, 4L),
      "near-dup and exact-dup of the eval doc are both flagged")
  }

  test("incremental LSH equals the full-corpus pairs restricted to new x existing") {
    val existing = corpus.filter(col("doc_id") =!= 2L)
    val newBatch = corpus.filter(col("doc_id") === 2L)
    val inc = DocPipeline.incrementalLshPairs(
      DocPipeline.minhashSignatures(existing), newBatch, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = DocPipeline.minhashLshPairs(corpus, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .filter { case (n, e) => n == 2L && e != 2L }.toSet
    assert(inc == full, s"incremental $inc vs full-restricted $full")
    assert(inc.nonEmpty, "doc 2 is a near-dup of existing docs 1/4")
  }

  test("incremental LSH never self-pairs a replayed doc") {
    // doc 1 is in the persisted signatures AND the (retried) new batch —
    // its identical signature must not pair with itself at est 1.0
    val replayBatch = corpus.filter(col("doc_id").isin(1L, 2L))
    val pairs = DocPipeline.incrementalLshPairs(
      DocPipeline.minhashSignatures(corpus), replayBatch, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.forall { case (n, e) => n != e }, s"no self-pairs in $pairs")
    assert(pairs.contains((1L, 4L)), "true cross-doc near-dups still surface")
  }

  test("l2 normalize yields unit vectors; int8 quantization bounds the error") {
    val vecs = Seq(
      (1L, Array(3.0f, 4.0f)),
      (2L, Array(0.0f, 0.0f)),                  // zero vector passes through
      (3L, Array(-1.5f, 0.25f, 127.0f)))
      .toDF("vec_id", "embedding")
    val norms = vecs.select(col("vec_id"),
      EmbeddingOps.norm(EmbeddingOps.l2Normalize(col("embedding"))).as("n"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(norms(1L) - 1.0) < 1e-6 && math.abs(norms(3L) - 1.0) < 1e-6)
    assert(norms(2L) == 0.0, "zero vector stays zero")
    val q = vecs.select(col("vec_id"),
      EmbeddingOps.quantizeInt8(col("embedding")).as("q"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(q(1L) == Seq(95, 127), "round(3*127/4)=95, max maps to 127")
    assert(q(2L) == Seq(0, 0))
    assert(q(3L).max == 127 && q(3L).forall(c => c >= -127 && c <= 127))
    // dequantized error bound: half a quantization step per component
    val scale = 127.0 / 127.0 // mx / 127
    assert(q(3L).zip(Seq(-1.5, 0.25, 127.0)).forall { case (c, x) =>
      math.abs(c * scale - x) <= scale / 2 + 1e-9 })
  }

  test("gopher rules: each rule trips on its own defect, prose passes") {
    val docs = Seq(
      (1L, ("the data pipeline reads and writes rows with care " * 4).trim), // 40 words, passes
      (2L, "too short to have enough words in it at all"),                   // words
      (3L, ("a b c d e f g h i j " * 4 + "the and of to be with x y z w ").trim), // mean len < 3
      (4L, ("spark engine shuffle partition broadcast exchange codegen " * 6).trim), // no stopwords
      (5L, ("the ### rows ### and ### more ### of ### them ### all ### day " * 4).trim)) // symbols
      .toDF("doc_id", "text")
    val got = DocPipeline.gopherRules(docs, minWords = 20, maxWords = 90)
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(r.fieldIndex("pass")), r.getString(r.fieldIndex("fail_reason")))).toMap
    assert(got(1L) == (true, null), s"clean prose passes: ${got(1L)}")
    assert(got(2L)._2 == "words")
    assert(got(3L)._2 == "mean_word_len")
    assert(got(4L)._2 == "stops")
    assert(got(5L)._2 == "symbols")
  }

  test("weighted mix: copy counts follow the weights, membership is growth-stable") {
    val docs = (1L to 400L).map(i => (i, s"src${i % 4}", s"text $i"))
      .toDF("doc_id", "source", "text")
    val w = Map("src0" -> 2.0, "src1" -> 0.5, "src2" -> 0.0) // src3 defaults to 1.0
    val mix = DocPipeline.weightedMix(docs, w).cache()
    val bySrc = mix.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc("src0") == 200L, "integer weight 2.0 = exactly 2 copies each")
    assert(bySrc.get("src2").isEmpty, "zero weight drops the source entirely")
    assert(bySrc("src3") == 100L, "default weight keeps every doc once")
    // fractional: ~50% of 100 docs, deterministic — exact count is pinned
    // by the hash, not a distribution; just require it's strictly between
    assert(bySrc("src1") > 20L && bySrc("src1") < 80L, s"src1=${bySrc("src1")}")
    // growth stability: mixing HALF the corpus yields exactly the mix rows
    // of those docs — membership of a doc never depends on the others
    val half = DocPipeline.weightedMix(docs.filter(col("doc_id") <= 200), w)
      .select("doc_id", "copy_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val fullHalf = mix.filter(col("doc_id") <= 200)
      .select("doc_id", "copy_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(half == fullHalf)
    mix.unpersist()
  }

  test("token chunks cover every token; consecutive chunks overlap by size-stride") {
    val docs = Seq((1L, (1 to 99).map(i => s"w$i").mkString(" ")),
      (2L, "a b c")).toDF("doc_id", "text")
    val got = DocPipeline.chunkTokens(docs, 32, 24)
      .orderBy("doc_id", "chunk_id").collect()
    val d1 = got.filter(_.getLong(0) == 1L).map(_.getString(3).split(" ").toSeq)
    assert(d1.length == 4, "1 + ceil((99-32)/24) = 4 chunks")
    assert(d1.head.length == 32 && d1.last.length == 99 - 3 * 24)
    // stride-24 overlap: the last 8 tokens of chunk i = first 8 of chunk i+1
    d1.toSeq.sliding(2).foreach {
      case Seq(a, b) => assert(a.drop(24) == b.take(32 - 24), "8-token overlap")
      case _ => ()
    }
    // full coverage in order
    assert(d1.head ++ d1.tail.flatMap(_.drop(8)) == (1 to 99).map(i => s"w$i"))
    val d2 = got.filter(_.getLong(0) == 2L)
    assert(d2.length == 1 && d2.head.getString(3) == "a b c", "short doc = one chunk")
  }

  test("pq encode: cluster members code to their own sub-centroids, centroid vecs hit zero error") {
    // two well-separated clusters in 4 dims, m=2 subspaces of 2 dims
    val vecs = Seq(
      (1L, 0L, Array(1.0f, 1.0f, 5.0f, 5.0f)),
      (2L, 0L, Array(1.0f, 1.0f, 5.0f, 5.0f)),   // = label-0 mean exactly
      (3L, 1L, Array(-4.0f, -4.0f, -9.0f, -9.0f)),
      (4L, 1L, Array(-4.0f, -4.0f, -9.0f, -9.0f)))
      .toDF("vec_id", "label", "embedding")
    val got = EmbeddingOps.pqEncode(vecs, 2).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got(1L) == ((0L, 0L, 0.0)), s"label-0 member codes (0,0) exactly: ${got(1L)}")
    assert(got(3L) == ((1L, 1L, 0.0)))
    // a vector between the clusters but nearer label 0 in the first
    // subspace and label 1 in the second codes MIXED — the PQ property
    val mixed = Seq((5L, 0L, Array(0.0f, 0.0f, -8.0f, -8.0f)))
      .toDF("vec_id", "label", "embedding")
    val m = EmbeddingOps.pqEncode(vecs.unionByName(mixed), 2)
      .filter(col("vec_id") === 5L).collect()(0)
    assert(m.getLong(1) == 0L && m.getLong(2) == 1L,
      s"subspaces quantize independently: $m")
  }

  test("substring spans: replays score 1.0, partial overlap counts exact windows") {
    val ws = (1 to 12).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, ws),                                                 // 3 windows at k=10
      (2L, ws),                                                 // exact replay of 1
      (3L, (1 to 12).map(i => s"x$i").mkString(" ")),           // disjoint
      (4L, "short doc"),                                        // < k → 1 window
      (5L, (1 to 10).map(i => s"w$i").mkString(" ") + " z1 z2")) // shares window 1 only
      .toDF("doc_id", "text")
    val got = DocPipeline.substringSpans(docs, 10).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(4)))).toMap
    assert(got(1L) == ((3L, 3L, true)), s"full replay: ${got(1L)}")
    assert(got(2L) == ((3L, 3L, true)))
    assert(got(3L) == ((3L, 0L, false)), "disjoint text shares nothing")
    assert(got(4L) == ((1L, 0L, false)), "sub-k doc = one whole-text window")
    assert(got(5L) == ((3L, 1L, false)), "only the first window is shared")
  }

  test("editdist pairs: small in-place edits confirm, the length prefilter is a true lower bound") {
    // heavy token redundancy keeps the simhash bit-sums far from zero, so
    // a single in-place edit cannot flip a band — the pair stays a
    // candidate (the regime banded LSH is built for)
    val base = ("the quick brown fox jumps over the lazy dog " * 20).trim
    val docs = Seq(
      (1L, base),
      (2L, base),                                   // replay → dist 0
      (3L, base.replaceFirst("brown", "braun")),    // 2 substitutions
      (4L, base + (" pad" * 10)),                   // 40 insertions
      (5L, ("nothing shared here at all with that text " * 20).trim))
      .toDF("doc_id", "text")
    val got = DocPipeline.editDistPairs(docs, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(got((1L, 2L)) == 0 && got((1L, 3L)) == 2 && got((2L, 3L)) == 2,
      s"replay + single-edit pairs confirm: $got")
    assert(!got.keySet.exists(p => p._1 == 4L || p._2 == 4L),
      "a 40-char insertion fails maxDist 3 (len prefilter alone rejects it)")
    assert(!got.keySet.exists(p => p._1 == 5L || p._2 == 5L))
  }

  test("logreg quality: keep flips exactly at logit 0, prob is the sigmoid") {
    // stopword-rich prose vs digit noise — opposite sides of the boundary
    val docs = Seq(
      (1L, ("the data moves to the lake and that is fine with " * 10).trim),
      (2L, "9 8 7 123 456 789 0 1 2 3 4 5 6 7 8 9 00 11 22 33"))
      .toDF("doc_id", "text")
    val got = DocPipeline.logregQuality(docs).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2), r.getBoolean(3))))
      .toMap
    val (z1, p1, k1) = got(1L)
    val (z2, p2, k2) = got(2L)
    assert(k1 && z1 >= 0 && p1 > 0.5, s"prose keeps: $z1 $p1")
    assert(!k2 && z2 < 0 && p2 < 0.5, s"digit noise drops: $z2 $p2")
    assert(math.abs(p1 - 1.0 / (1.0 + math.exp(-z1))) < 1e-9, "prob = sigmoid(logit)")
  }

  test("bigram logprob: add-one LM math on a countable corpus, sub-2-token docs go NULL") {
    val docs = Seq((1L, "a b a b"), (2L, "a b"), (3L, "z"))
      .toDF("doc_id", "text")
    // unigrams a:3 b:3 z:1 → V=3; bigrams (a,b):3 (b,a):1
    val lab = math.log(4.0 / 6.0) // ln((3+1)/(3+3))
    val lba = math.log(2.0 / 6.0)
    val got = DocPipeline.bigramLogprob(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), Option(r.get(2))))).toMap
    assert(got(1L)._1 == 3L && got(2L)._1 == 1L)
    assert(math.abs(got(1L)._2.get.asInstanceOf[Double] - (2 * lab + lba) / 3) < 1e-9)
    assert(math.abs(got(2L)._2.get.asInstanceOf[Double] - lab) < 1e-9)
    assert(got(3L) == ((0L, None)), "a 1-token doc has no bigrams → NULL score")
    // the repetitive doc (templated) outscores the rarer transition mix
    assert(got(2L)._2.get.asInstanceOf[Double] > got(1L)._2.get.asInstanceOf[Double])
  }

  test("adc top-k: lookup distance equals the code-reconstruction distance, exact recall on seeds") {
    // two clusters; seeds (lowest vec_id per label) BECOME the codebook
    val vecs = Seq(
      (1L, 0L, Array(1.0f, 1.0f, 5.0f, 5.0f)),    // seed of cell 0
      (2L, 0L, Array(1.0f, 1.0f, 5.0f, 5.0f)),    // = seed → adc_dist 0 to q1
      (3L, 1L, Array(-4.0f, -4.0f, -9.0f, -9.0f)), // seed of cell 1
      (4L, 1L, Array(-4.1f, -4.1f, -9.1f, -9.1f)))
      .toDF("vec_id", "label", "embedding")
    val got = EmbeddingOps.adcTopK(vecs.filter(col("vec_id") === 1L), vecs, 2, 3)
      .collect().map(r => (r.getLong(2), (r.getInt(1), r.getDouble(3), r.getBoolean(4))))
      .toMap
    // vec 2 codes to (0,0): its reconstruction IS the query's cell seed →
    // adc distance exactly 0, rank 1, and it is the true nearest
    assert(got(2L) == ((1, 0.0, true)), s"replay of the seed: ${got(2L)}")
    // vecs 3 and 4 both code to cell 1 → identical codes → identical ADC
    // distance (the PQ collapse), tie broken by id; both in the true top-3
    assert(got(3L)._2 == got(4L)._2, s"same codes → same adc dist: $got")
    assert(got(3L)._1 == 2 && got(4L)._1 == 3 && got(3L)._3 && got(4L)._3)
    // the ADC estimate for cell-1 members = d²(q1, seed3) exactly
    val expect = (1 to 2).map(_ => math.pow(1.0 + 4.0, 2)).sum +
      (1 to 2).map(_ => math.pow(5.0 + 9.0, 2)).sum
    assert(math.abs(got(3L)._2 - expect) < 1e-12, s"${got(3L)._2} vs $expect")
  }

  test("semdedup drops the member nearer its cell centroid; exact dups drop the replay") {
    val base = Seq(
      (1L, 0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, 0L, Array(0.98f, 0.02f, 0.0f, 0.0f)), // near 1, same cell
      (3L, 1L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
      (4L, 1L, Array(0.0f, 0.0f, 1.0f, 0.0f)))
      .toDF("vec_id", "label", "embedding")
    val dup = base.unionByName( // replay of vec 1 at a shifted id
      base.filter(col("vec_id") === 1L).withColumn("vec_id", lit(100001L)))
    val pairs = EmbeddingOps.semdedupPairs(dup, 0.99)
      .collect().map(r => ((r.getLong(1), r.getLong(2)), r.getLong(4))).toMap
    // exact dup pair: same cdist → drop the higher id (the replay)
    assert(pairs((1L, 100001L)) == 100001L, s"replay dropped: $pairs")
    // the near pair (1, 2): cosine ≈ 0.9998 ≥ 0.99 — drop whichever sits
    // nearer the cell centroid; with the replay pulling the centroid
    // toward vec 1's direction, that is vec 1
    assert(pairs.contains((1L, 2L)) || pairs.contains((2L, 100001L)),
      s"near-dup pair found within the cell: $pairs")
    // nothing pairs across cells
    assert(!pairs.keySet.exists { case (x, y) => Set(x, y).intersect(Set(3L, 4L)).nonEmpty })
    // sign-LSH sub-bucketing: identical vectors share the sign pattern,
    // so exact dups always survive the subBits key; the (1,2)-style
    // near pair is the documented recall caveat made concrete — vec 1
    // has exactly 0.0 in dim 2 where vec 2 has 0.02, a sign flip
    // (`> 0` puts exact zero on the negative side), so the sub-bucket
    // key filters that pair
    val sub = EmbeddingOps.semdedupPairs(dup, 0.99, subBits = 8)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(sub == Set((1L, 100001L)),
      s"exact dup survives sub-bucketing, zero-straddling near pair filtered: $sub")
  }

  test("containment catches a quote that Jaccard misses; contained doc is the smaller set") {
    val c = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"),
      (2L, "alpha beta gamma delta epsilon"), // 12-token doc's opening quote
      (3L, "totally unrelated words about nothing shared here at all now"))
      .toDF("doc_id", "text")
    val sh = DocPipeline.shingleHashes(c)
    val cont = DocPipeline.containmentPairs(sh, 0.9)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), (r.getDouble(5), r.getLong(6))))
      .toMap
    // doc 2's three 3-gram shingles are all inside doc 1 → containment 1.0
    assert(cont.keySet == Set((1L, 2L)), s"only the quote pair: $cont")
    assert(cont((1L, 2L)) == ((1.0, 2L)), "full containment; smaller set is contained")
    // symmetric Jaccard on the same pair: 3 shared of 10 ∪ 3 → 0.3, missed at 0.9
    val jac = DocPipeline.jaccardPairsFromShingles(sh, 0.9).count()
    assert(jac == 0, "Jaccard at the same threshold misses the quote")
  }

  test("BM25 ranks by term density; docs without any query term are absent") {
    val c = Seq(
      (1L, "fox fox fox den"),               // highest tf, short doc
      (2L, "fox and the hound walk the long road home tonight again slowly"), // 1 hit, long doc
      (3L, "no relevant animal words here at all"),
      (4L, "fox fox den den")).toDF("doc_id", "text")
    val got = DocPipeline.bm25Search(c, Seq(7 -> Seq("fox")), topK = 10)
      .collect().map(r => (r.getLong(2), r.getLong(1), r.getDouble(3)))
    assert(!got.exists(_._1 == 3L), "doc without the term never scores")
    val byDoc = got.map(g => g._1 -> g._3).toMap
    assert(byDoc(1L) > byDoc(4L) && byDoc(4L) > byDoc(2L),
      s"tf density ordering (3 hits > 2 hits > 1 hit in a longer doc): $got")
    assert(got.find(_._2 == 1L).get._1 == 1L, "rank 1 = densest doc")
    assert(got.forall(_._3 > 0), "the +1 idf floor keeps scores positive")
  }

  test("TF-IDF surfaces the doc-specific term above corpus-wide boilerplate") {
    val c = Seq(
      (1L, "the the the zebra the the"),
      (2L, "the the the the the giraffe"),
      (3L, "the the the the the the")).toDF("doc_id", "text")
    val top1 = DocPipeline.tfidfTopTerms(c, topK = 1)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(top1(1L) == "zebra" && top1(2L) == "giraffe",
      s"rare term beats 'the' despite 5x the tf: $top1")
    // 'the' appears in every doc: idf = ln(4/4) = 0 → tfidf exactly 0
    val theW = DocPipeline.tfidfTopTerms(c, topK = 10)
      .filter(col("term") === "the").select("tfidf").collect()
    assert(theW.forall(_.getDouble(0) == 0.0), "ubiquitous term weighs 0")
  }

  test("count-min estimates never undercount and find the true heavy hitter") {
    val c = Seq(
      (1L, "apple apple apple apple banana"),
      (2L, "apple apple apple cherry banana"),
      (3L, "apple cherry date elder fig")).toDF("doc_id", "text")
    val got = DocPipeline.cmsHeavyHitters(c, depth = 4, width = 64, topK = 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1) // rank order — checkpointed partitions don't promise it
    assert(got.head._2 == "apple" && got.head._3 == 8L, s"true top word: $got")
    assert(got.forall(g => g._4 >= g._3), s"CMS never underestimates: $got")
    // depth*width = 256 counters over 7 words: no collisions → exact
    assert(got.forall(g => g._4 == g._3),
      s"sketch wide enough for the vocab → estimates exact: $got")
  }

  test("k-anonymity suppresses quasi-identifier groups below k, keeps the rest") {
    val rows = (1 to 6).map(i => (i.toLong, "en", "srcA", 150)) :+ // group of 6
      (7L, "de", "srcB", 150) :+                                   // singleton
      (8L, "en", "srcA", 950)                                      // singleton
    val c = rows.toDF("doc_id", "lang", "source", "n_chars")
      .withColumn("text", lit("x"))
    val got = DocPipeline.kAnonymize(c, k = 5)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getString(2), r.getLong(3), r.getBoolean(5))).toMap
    assert(got(1L) == (("en", "srcA", 1L, false)), s"big group survives: $got")
    assert(got(7L) == (("*", "*", -1L, true)), "singleton fully generalized")
    assert(got(8L) == (("*", "*", -1L, true)),
      "same (lang, source) but a different length bucket is its own group")
  }

  test("zipfFit recovers the exact slope of a synthetic power-law corpus") {
    // counts 8/4/2/1 over ranks 1..4 → ln-ln is EXACTLY linear with
    // slope −3·ln2/ln4 = −1.5·ln2/ln2 ... fit on (ln r, ln c) points
    // (0,3ln2),(ln2,2ln2),(ln3,ln2),(ln4,0): not exactly collinear, but
    // slope must be negative and r² high; a flat corpus fits ~0 slope.
    val words = Seq.fill(8)("alpha") ++ Seq.fill(4)("beta") ++
      Seq.fill(2)("gamma") ++ Seq.fill(1)("delta")
    val docs = Seq((1L, words.mkString(" "), "en"))
      .toDF("doc_id", "text", "lang")
    val r = DocPipeline.zipfFit(docs).collect()
    assert(r.length == 1 && r(0).getLong(1) == 4L, "4 vocab entries")
    val slope = r(0).getDouble(2)
    assert(slope < -1.0 && slope > -2.0, s"power-law slope ≈ −1.5: $slope")
    assert(r(0).getDouble(4) > 0.95, s"near-collinear fit: ${r(0).getDouble(4)}")
  }

  test("outlierScores ranks the planted off-distribution vector first") {
    val base = (1 to 20).map(i =>
      (i.toLong, Array(1.0f + (i % 3) * 0.1f, -1.0f + (i % 5) * 0.05f)))
    val vecs = (base :+ (99L, Array(50.0f, 50.0f)))
      .toDF("vec_id", "embedding")
    val top = EmbeddingOps.outlierScores(vecs).collect()
    assert(top(0).getLong(0) == 99L, "the planted outlier scores highest")
    assert(top(0).getDouble(2) > 10 * top(1).getDouble(2),
      "score separation is decisive")
    assert(top.forall(_.getLong(1) == 2L), "all vectors scored over 2 dims")
  }

  test("triangleCounts: 4-clique plus a pendant chain — corners counted, chain silent") {
    // K4 on {1,2,3,4} has C(4,3)=4 triangles, every clique node in 3;
    // the pendant path 4-5-6 closes nothing and must not appear.
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (5L, 6L)).toDF("doc_a", "doc_b")
    val got = DocPipeline.triangleCounts(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L), s"got: $got")
  }

  test("weightedSample: deterministic, capped at k, zero-weight rows excluded") {
    val docs = (1 to 30).map(i => (i.toLong, s"doc $i", "en",
      if (i % 7 == 0) 0 else i * 100)).toDF("doc_id", "text", "lang", "n_chars")
    val a = DocPipeline.weightedSample(docs, "n_chars", 10).collect()
    val b = DocPipeline.weightedSample(docs, "n_chars", 10).collect()
    assert(a.map(_.getLong(0)).toSeq == b.map(_.getLong(0)).toSeq,
      "same sample on re-execution")
    assert(a.length == 10, "exactly k rows")
    assert(a.forall(_.getLong(0) % 7 != 0), "zero-weight docs never sampled")
    assert(a.map(_.getDouble(3)).toSeq ==
      a.map(_.getDouble(3)).toSeq.sorted(Ordering[Double].reverse),
      "rows arrive in descending key order")
  }

  test("bpeTrain learns the classic low/lower/lowest merges in order") {
    // word census: low ×3, lower ×1, lowest ×1. Weighted pair counts:
    // l·o=5, o·w=5 (tie → 'l' sorts first), then lo·w=5, low·e=2, and
    // finally the cnt-1 ties lowe·r < lowe·s (binary order on the left
    // symbol's first differing char decides s·t last).
    val docs = Seq((0L, "low low low lower lowest")).toDF("doc_id", "text")
    val got = graft.docs.DocPipeline.bpeTrain(docs, 5).orderBy("rank")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, "l+o", 5L), (2L, "lo+w", 5L), (3L, "low+e", 2L),
      (4L, "lowe+r", 1L), (5L, "lowe+s", 1L)), s"got: $got")
  }
}
