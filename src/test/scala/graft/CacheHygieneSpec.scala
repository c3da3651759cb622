package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.docs.{DocPipeline, EmbeddingOps}
import graft.ops.{GlobalPrefixSum, GlobalRowNumber}

/** VERDICT r4 "cache hygiene": every op that persists an intermediate for
  * multi-pass determinism or plan reuse must release it before returning —
  * a long-lived session (a notebook, a streaming driver, a service) calls
  * these thousands of times, and each leaked persist pins another copy of
  * its input in executor memory.
  *
  * Each test runs an op end-to-end (the ops are eager now — they
  * localCheckpoint their output so the cache window can close inside the
  * call) and asserts the session's CacheManager is empty afterwards.
  * Results still have to be right, so every assertion also checks the
  * op's output — hygiene must not change semantics. */
class CacheHygieneSpec extends SparkSpec {

  import spark.implicits._

  private def docs: DataFrame = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2L, "the quick brown fox jumps over the lazy dog near the river bank tonight"),
    (3L, "completely different content about spark query engines and shuffles here"),
    (4L, "the quick brown fox jumps over the lazy dog near the river bank today"))
    .toDF("doc_id", "text")

  /** Clear leftovers from other suites (Memo caches intentionally live for
    * the session), run the body, assert nothing NEW stayed cached. */
  private def assertNoResidue(body: => Unit): Unit = {
    spark.sharedState.cacheManager.clearCache()
    body
    assert(spark.sharedState.cacheManager.isEmpty,
      "op left a persisted frame in the CacheManager")
  }

  test("GlobalRowNumber releases its ranged cache and still numbers totally") {
    assertNoResidue {
      val df = (1 to 1000).map(i => (i % 7, i)).toDF("k", "v")
      val rn = GlobalRowNumber.withRowNumber(df, "rn", Seq("k", "v"), 4)
      val rows = rn.orderBy("rn").select("rn").as[Long].collect()
      assert(rows.toSeq == (1L to 1000L))
    }
  }

  test("GlobalPrefixSum releases its ranged cache and still sums in order") {
    assertNoResidue {
      val df = (1 to 100).map(i => (i, 2L)).toDF("k", "w")
      val ps = GlobalPrefixSum.withRunningTotal(df, "w", "total", Seq("k"), 4)
      val got = ps.orderBy("k").select("total").as[Long].collect()
      assert(got.toSeq == (1 to 100).map(_ * 2L))
    }
  }

  test("minhashLshPairs releases the signature cache, keeps the near-dup pair") {
    assertNoResidue {
      val pairs = DocPipeline.minhashLshPairs(docs, 0.5)
        .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs.contains((1L, 4L)), s"exact dup must survive: $pairs")
    }
  }

  test("simhashPairs releases the simhash cache, keeps the near-dup pair") {
    assertNoResidue {
      val pairs = DocPipeline.simhashPairs(docs, 3)
        .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs.contains((1L, 4L)), s"exact dup must survive: $pairs")
    }
  }

  test("editDistPairs releases the simhash cache, keeps the confirmed pair") {
    assertNoResidue {
      val pairs = DocPipeline.editDistPairs(docs, 3)
        .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs.contains((1L, 4L)), s"exact dup must survive: $pairs")
    }
  }

  test("jaccardPairs releases the capped-shingle cache") {
    assertNoResidue {
      val pairs = DocPipeline.jaccardPairs(docs, 0.5)
        .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs.contains((1L, 4L)))
    }
  }

  test("bloomContamination releases the eval-shingle cache") {
    assertNoResidue {
      val eval = Seq((100L, "the quick brown fox jumps over the lazy dog near the river bank today"))
        .toDF("doc_id", "text")
      val hit = DocPipeline.bloomContamination(docs, eval, 1)
        .select("doc_id").as[Long].collect().toSet
      assert(Set(1L, 2L, 4L).subsetOf(hit), s"contaminated docs found: $hit")
    }
  }

  test("incrementalLshPairs releases the new-batch signature cache") {
    assertNoResidue {
      val existing = DocPipeline.minhashSignatures(docs.filter(col("doc_id") <= 2))
      val pairs = DocPipeline.incrementalLshPairs(existing, docs.filter(col("doc_id") === 4), 0.5)
        .select("new_doc_id", "existing_doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs.contains((4L, 1L)), s"new doc 4 pairs with existing 1: $pairs")
    }
  }

  test("ivfTopK releases the centroid cache") {
    assertNoResidue {
      val vecs = (0 until 40).map { i =>
        (i.toLong, (i % 4).toLong, Array.tabulate(8)(d => (i % 4) * 1.0f + d * 0.01f))
      }.toDF("vec_id", "label", "embedding")
      val got = EmbeddingOps.ivfTopK(vecs.limit(2), vecs, 3, 2)
      assert(got.count() > 0)
    }
  }

  test("containmentPairs releases the capped shingle cache") {
    assertNoResidue {
      val pairs = DocPipeline.containmentPairs(DocPipeline.shingleHashes(docs), 0.9)
        .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs.contains((1L, 4L)), s"exact dup pair fully contained: $pairs")
    }
  }
}
