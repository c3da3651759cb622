package graft.queries

import java.nio.file.Paths

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

import graft.QFn
import graft.model.EventsModel
import graft.oracle.StreamOracle.stream
import graft.oracle.OracleCte.taxi

/** Scan / source / sink operators (SURVEY.md §2.1) as *round-trip* queries:
  * each writes real files (CSV/JSONL/partitioned parquet) to a scratch dir,
  * reads them back through the production read path, and returns values the
  * DuckDB oracle computes straight from the fixtures — so a match proves
  * the sink+scan pair is value-preserving, not just that the scan ran. */
object ScanQueries {

  private def scratch(name: String): String =
    Paths.get(sys.props("java.io.tmpdir"), "graft_scan", name).toString

  private val setupDone =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** The memoized routed-events chain — SAME memo key as
    * StreamQueries' private `routed`, so both files share one scratch
    * materialization. The sink ops' measured side is their WRITE; before
    * this they also re-ran the whole wire chain (envelope build →
    * from_json parse → route) upstream of the write on every invocation,
    * which is exactly the shared-intermediate rebuild the Memo layer
    * exists to avoid (the reference writes curated once and every sink
    * reads the table). */
  private def routedMemo(s: SparkSession, d: String): DataFrame =
    Memo(s"$d/ev_routed")(EventsModel.routed(s, d))

  /** The JSON wire envelopes, memoized: scan_jsonl / scan_json_corrupt /
    * scan_json_variant each re-built the to_json envelope stream per
    * invocation; the wire fixture is one materialization per session. */
  private def envelopesMemo(s: SparkSession, d: String): DataFrame =
    Memo(s"$d/ev_envelopes")(EventsModel.envelopes(s, d))

  /** Write-once-per-session scratch table, keyed by fixture dir: used by
    * ops whose MEASURED side is the read (DPP join over an existing fact,
    * dir listing of an existing sink — the reference's GetFileList /
    * partition-pruned joins run against tables some earlier load built).
    * The setup write pays once per session like the Memo chains; sink_*
    * ops, whose measured side IS the write, do not use this. */
  private def setupOnce(d: String, name: String)(write: String => Unit): String =
    setupDone.computeIfAbsent(s"$d/$name", { _ =>
      val out = Paths.get(sys.props("java.io.tmpdir"), "graft_scan",
        s"${name}_${Integer.toHexString(d.hashCode)}").toString
      write(out)
      out
    })

  val queries: Map[String, QFn] = Map(
    // deterministic salted join (perf/Skew): the explicit skew fallback
    // when AQE can't save a hot key and the dim is too big to broadcast;
    // result must equal — and here is oracle-checked against — the plain
    // equi-join
    "join_skew_salted" -> ((s, d) => {
      val li = graft.Tables(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber").cast("int").as("line_no"),
          col("l_partkey"))
      val p = graft.Tables(s, d, "part")
        .select(col("p_partkey").as("l_partkey"), col("p_name"))
      graft.perf.Skew.saltedJoinDeterministic(li, p, "l_partkey", "l_orderkey", 8)
        // full output order: (l_orderkey, line_no) is NOT unique in the
        // fixture (duplicate lineitem natural keys), and p_name is a
        // function of l_partkey — so any remaining tie is an identical row
        .orderBy("l_orderkey", "line_no", "l_partkey")
    }),

    // Explicit-schema projected read with the reference's copy-time type
    // map (pl_raw_to_stg_nyctaxi.json translator): Int32→Int16,
    // Double→Decimal, ts→Date.
    "scan_parquet" -> ((s, d) => graft.Tables(s, d, "lineitem")
      .select(
        col("l_orderkey"),
        col("l_linenumber").cast("smallint").as("line_no"),
        // decimals rendered to string: the driver's pandas compare can't
        // equate python Decimal with DuckDB's float64 rendering
        col("l_quantity").cast("decimal(9,3)").cast("string").as("qty_dec"),
        col("l_extendedprice").cast("decimal(10,2)").cast("string").as("price_dec"),
        col("l_shipdate").cast("date").cast("string").as("ship_date"),
        col("l_returnflag").as("flag1"))
      // order by every output column: duplicate (l_orderkey, l_linenumber)
      // pairs exist in the fixture, so ties must be identical rows
      .orderBy("l_orderkey", "line_no", "qty_dec", "price_dec",
        "ship_date", "flag1")),

    // Headerless positional CSV round trip (curated-CSV shape,
    // ds_curated_csv.json): write 4 rendered cols, read by position with a
    // typed schema, return the re-typed values.
    "scan_csv_positional" -> ((s, d) => {
      val out = scratch("csv_positional")
      EventsModel.rawEvents(s, d).select(
        col("event_id"),
        col("vendor_id"),
        format_string("%.6f", col("fare_amount")).as("fare_str"),
        date_format(col("pickup_ts"), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS").as("pickup_iso"))
        .coalesce(4)
        .write.mode(SaveMode.Overwrite).option("header", "false")
        .option("quote", "\"").option("escape", "\\").csv(out)
      s.read.option("header", "false")
        .schema(StructType.fromDDL(
          "c0 BIGINT, c1 STRING, c2 STRING, c3 STRING"))
        .csv(out)
        .select(col("c0").as("event_id"), col("c1").as("vendor_id"),
          col("c2").cast("double").as("fare_amount"),
          col("c3").cast("timestamp_ntz").as("pickup_ts"))
        .orderBy("event_id")
    }),

    // Line-separated JSON round trip (asa-wire.sh:92-95 LineSeparated):
    // write the envelopes as raw JSONL text, read them back through the
    // JSON scan + dual-key parse, count per sink.
    "scan_jsonl" -> ((s, d) => {
      val out = scratch("jsonl")
      envelopesMemo(s, d).select("json")
        .coalesce(4).write.mode(SaveMode.Overwrite).text(out)
      val back = s.read.text(out)
        .withColumnRenamed("value", "json")
        // arrival is lineage the wire doesn't carry; re-derive from payload
        .withColumn("arrival_ts", lit(null).cast("timestamp_ntz"))
      val parsed = graft.stream.StreamTransforms.parse(back)
        .withColumn("arrival_ts", col("producer_ts"))
      graft.stream.StreamTransforms.route(
        graft.stream.StreamTransforms.enrich(parsed))
        .groupBy("sink").agg(count(lit(1)).as("events"))
        .orderBy("sink")
    }),

    // Copy-time lineage injection (ADF additionalColumns):
    // input_file_name() + literal run id + per-file counts.
    "lineage_inject" -> ((s, d) => graft.Tables(s, d, "lineitem")
      .select(element_at(split(input_file_name(), "/"), -1).as("source_file_name"))
      .withColumn("run_id", lit("run-2024-06-01"))
      .groupBy("source_file_name", "run_id").agg(count(lit(1)).as("rows"))
      .orderBy("source_file_name")),

    // Hourly-partitioned sink (asa-wire.sh:86-88 pathPattern): write
    // parquet partitioned by derived (date, hour), read back, count per
    // partition — proves partition columns survive the round trip.
    "sink_partitioned_hourly" -> ((s, d) => {
      val out = scratch("hourly_sink")
      routedMemo(s, d)
        .filter(to_date(col("arrival_ts")) < "2024-01-04") // 3-day fixture slice
        .withColumn("p_date", date_format(col("arrival_ts"), "yyyy-MM-dd"))
        .withColumn("p_hour", date_format(col("arrival_ts"), "HH"))
        .select("event_id", "sink", "p_date", "p_hour") // prune: the sink
        // carries only what downstream reads — never the raw wire string
        .repartition(col("p_date"), col("p_hour")) // 1 file per hour dir
        .write.mode(SaveMode.Overwrite).partitionBy("p_date", "p_hour").parquet(out)
      // partition-column type inference reads p_hour "07" back as int 7 —
      // re-pad so the key matches the written '%H' form
      s.read.parquet(out)
        .groupBy(col("p_date").cast("string").as("p_date"),
          lpad(col("p_hour").cast("string"), 2, "0").as("p_hour"))
        .agg(count(lit(1)).as("events"))
        .orderBy("p_date", "p_hour")
    }),

    // Folder enumeration + name filter (GetFileList + FilterParquet /
    // CheckHourFolder): Hadoop FS listing of the hourly sink's partition
    // dirs, keeping morning hours only.
    "list_files" -> ((s, d) => {
      import s.implicits._
      val out = setupOnce(d, "hourly_sink_ls") { out =>
        routedMemo(s, d)
          .filter(to_date(col("arrival_ts")) < "2024-01-04") // 3-day fixture slice
          .withColumn("p_date", date_format(col("arrival_ts"), "yyyy-MM-dd"))
          .withColumn("p_hour", date_format(col("arrival_ts"), "HH"))
          .select("event_id", "p_date", "p_hour")
          .repartition(col("p_date"), col("p_hour")) // 1 file per hour dir
          .write.mode(SaveMode.Overwrite).partitionBy("p_date", "p_hour").parquet(out)
      }
      val fs = new Path(out).getFileSystem(s.sparkContext.hadoopConfiguration)
      val dirs = fs.listStatus(new Path(out)).filter(_.isDirectory).flatMap { day =>
        fs.listStatus(day.getPath).filter(_.isDirectory)
          .map(h => day.getPath.getName + "/" + h.getPath.getName)
      }.toSeq.sorted
      dirs.toDF("partition_dir")
        .filter(substring(element_at(split(col("partition_dir"), "="), -1), 1, 2) < "12")
        .orderBy("partition_dir")
    }),

    // Seeded reference data (ref/01_payment_type_map.sql:17-32 +
    // err/seed_unknowns.sql): active payment map + the UNKNOWN(-1) member
    // every dim carries for COALESCE FK fallback.
    "seed_reference_data" -> ((s, d) => {
      val dim = graft.batch.StarModel.dim(
        graft.model.TaxiModel.paymentTypeMap(s).filter(col("is_active")),
        "payment_type_src", "payment_nk", "payment_sk")
      graft.batch.Maintenance.withUnknownMember(dim, "payment_nk", "payment_sk")
        .orderBy("payment_sk")
    }),

    // Schema-drift-tolerant staging read (stg_trip.sql:38-111: one
    // ALTER TABLE ADD IF NOT EXISTS per column = additive evolution; the
    // staging table absorbs new upstream columns, old rows read NULL).
    // Spark-first: a two-generation parquet dir read with mergeSchema —
    // footer merge is a distributed job, so the union schema costs one
    // metadata pass even at 100k files — then an explicit cast projection
    // pins the canonical staging types no matter which file a row came
    // from. Old-generation rows surface NULL for the late columns.
    "scan_parquet_evolve" -> ((s, d) => {
      val out = scratch("evolve")
      val li = graft.Tables(s, d, "lineitem")
      // generation 1: the original staging schema
      li.filter(col("l_orderkey") % 4 =!= 0)
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .write.mode(SaveMode.Overwrite).parquet(out)
      // generation 2: upstream starts shipping two extra columns
      // corpus-fraction: the evolved-schema generation is a data split
      li.filter(col("l_orderkey") % 4 === 0)
        .select("l_orderkey", "l_linenumber", "l_quantity",
          "l_discount", "l_returnflag")
        .write.mode(SaveMode.Append).parquet(out)
      s.read.option("mergeSchema", "true").parquet(out)
        .select(col("l_orderkey").cast("bigint").as("l_orderkey"),
          col("l_linenumber").cast("int").as("line_no"),
          col("l_quantity").cast("double").as("qty"),
          col("l_discount").cast("double").as("disc"),
          col("l_returnflag").cast("string").as("flag"))
        // disc/flag are NULL on generation-1 rows: Spark's default asc is
        // NULLS FIRST, so the oracle must say NULLS FIRST explicitly
        // (DuckDB defaults to NULLS LAST)
        .orderBy("l_orderkey", "line_no", "qty", "disc", "flag")
    }),

    // PERMISSIVE corrupt-record quarantine: the malformed-line half of
    // ingestion DQ — a deterministic subset of the JSON envelope stream
    // is truncated before landing, and the scan must park those lines in
    // `_corrupt_record` instead of failing the job or silently dropping
    // them. The declared result proves the partition: quarantined count,
    // parsed count, and the parsed-id checksum all match the oracle's
    // arithmetic over the uncorrupted fixture. Scale note: the agg
    // references event_id alongside the corrupt column (Spark disallows
    // plans that read ONLY the internal corrupt column from a raw scan),
    // so this shape needs no cache() even at 100 TB.
    "scan_json_corrupt" -> ((s, d) => {
      val out = scratch("json_corrupt")
      envelopesMemo(s, d)
        .withColumn("eid", get_json_object(col("json"), "$.event_id").cast("long"))
        .select(when(col("eid") % 97 === 0,
            concat(lit("{bad "), substring(col("json"), 1, 18)))
          .otherwise(col("json")).as("value"))
        .write.mode(SaveMode.Overwrite).text(out)
      s.read
        .schema("event_id BIGINT, fare_amount DOUBLE, _corrupt_record STRING")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(out)
        .agg(count(lit(1)).as("total_rows"),
          sum(when(col("_corrupt_record").isNotNull, 1L).otherwise(0L))
            .cast("long").as("quarantined"),
          sum(when(col("_corrupt_record").isNull, 1L).otherwise(0L))
            .cast("long").as("parsed"),
          sum(when(col("_corrupt_record").isNull, col("event_id")))
            .cast("long").as("sum_parsed_ids"))
    }),

    // VARIANT ingest (Spark 4's semi-structured type): parse the wire
    // envelopes ONCE into the binary variant encoding, then extract
    // typed fields by path — schema-on-read without committing to a
    // struct schema up front, the modern replacement for chains of
    // get_json_object (which re-parse the string per path). The fixture's
    // dual camelCase/snake_case keys make the point: try_variant_get
    // returns NULL for an absent path (no schema error), so one coalesce
    // absorbs producer drift. Narrow projection, single parse per row,
    // fully codegen'd — the oracle computes the same values from the
    // typed table, proving the variant path round-trips the wire format.
    "scan_json_variant" -> ((s, d) => {
      envelopesMemo(s, d)
        .select(parse_json(col("json")).as("v"))
        .select(
          variant_get(col("v"), "$.event_id", "bigint").as("event_id"),
          coalesce(
            try_variant_get(col("v"), "$.vendorId", "string"),
            try_variant_get(col("v"), "$.vendor_id", "string")).as("vendor_id"),
          coalesce(
            try_variant_get(col("v"), "$.paymentType", "string"),
            try_variant_get(col("v"), "$.payment_type", "string")).as("payment_type"),
          variant_get(col("v"), "$.fare_amount", "double").as("fare_amount"),
          variant_get(col("v"), "$.producer_ts", "string").as("producer_ts"))
        .orderBy("event_id")
    }),

    // Nested-document normalize: the ingest shape for order-with-items
    // JSON docs (one document per order, array of item structs) —
    // flatten to child rows carrying the parent key plus the element's
    // array position. Round trip: build the nested docs from the fixture
    // (sort_array pins element order — collect_list alone is
    // partition-order-dependent), serialize with to_json, then normalize
    // through the production path: from_json with an explicit DDL schema
    // → posexplode. Everything after the one groupBy shuffle is a narrow
    // codegen'd projection (Generate), so the shape is scale-free; the
    // oracle computes the same child rows straight from lineitem, so a
    // match proves the JSON round trip is value-preserving including the
    // double rendering.
    "scan_json_normalize" -> ((s, d) => {
      // the nested-docs frame is fixture SYNTHESIS (what an upstream
      // system would deliver) — memoized like the wire envelopes; the
      // measured side is the production parse+normalize below
      val docs = Memo(s"$d/json_nested_docs") {
        graft.Tables(s, d, "lineitem")
          .groupBy(col("l_orderkey").cast("long").as("order_id"))
          .agg(sort_array(collect_list(struct(
              col("l_linenumber").cast("int").as("line_no"),
              col("l_partkey").cast("long").as("partkey"),
              col("l_quantity").cast("double").as("qty")))).as("items"))
          .select(to_json(struct(col("order_id"), col("items"))).as("doc"))
      }
      docs
        .select(from_json(col("doc"), StructType.fromDDL(
          "order_id BIGINT, items ARRAY<STRUCT<line_no: INT, partkey: BIGINT, qty: DOUBLE>>")).as("o"))
        .select(col("o.order_id").as("order_id"),
          posexplode(col("o.items")).as(Seq("pos", "item")))
        .select(col("order_id"), col("pos"),
          col("item.line_no").as("line_no"),
          col("item.partkey").as("partkey"), col("item.qty").as("qty"))
        .orderBy("order_id", "pos")
    }),

    // ORC round trip: the second columnar lake format (built into Spark's
    // datasource layer — same pushdown/pruning machinery as parquet), for
    // estates whose upstream writers emit ORC. Write typed columns, read
    // back through the ORC scan, return the values — the oracle computes
    // them straight from the parquet fixtures, so a match proves the
    // format conversion is value-preserving.
    "scan_orc" -> ((s, d) => {
      val out = scratch("orc_roundtrip")
      // deterministic hash repartition AFTER the projection (shuffle the 5
      // output columns, never the full 16-column row): the single-row-group
      // fixture scan is one task, which made the whole ORC encode+write
      // single-threaded (guide §2.5 input-skew fix; production inputs
      // split at the source)
      graft.Tables(s, d, "lineitem")
        .select(col("l_orderkey"),
          col("l_linenumber").cast("int").as("line_no"),
          col("l_quantity").cast("double").as("qty"),
          col("l_shipdate").cast("date").cast("string").as("ship_date"),
          col("l_returnflag").as("flag"))
        .repartition(s.sessionState.conf.numShufflePartitions, col("l_orderkey"))
        .write.mode(SaveMode.Overwrite).orc(out)
      s.read.orc(out).orderBy("l_orderkey", "line_no", "qty", "ship_date", "flag")
    }),

    // Bucketed co-located join (the lake analog of the reference DW's
    // hash-DISTRIBUTION; CREATE TABLE ... DISTRIBUTION = HASH(key)):
    // both sides written bucketBy(8, join-key) → the join reads bucket i
    // against bucket i and needs NO shuffle on either side
    // (PerfTechniquesSpec asserts the plan has no Exchange under the
    // join). At 100 TB this converts the nightly fact⋈orders shuffle —
    // the single widest stage — into a zip of pre-hashed files.
    "sink_bucketed" -> ((s, d) => {
      val wh = scratch("bucketed_wh")
      s.sql("DROP TABLE IF EXISTS graft_bkt_lineitem")
      s.sql("DROP TABLE IF EXISTS graft_bkt_orders")
      // repartition on the bucket key first: bucketBy hashes with the
      // same Murmur3 HashPartitioning, so after the shuffle each task
      // holds exactly its bucket → ONE file per bucket written in
      // parallel. Without it the single-row-group fixture scan is one
      // task that encodes all 8 buckets' files sequentially (and at
      // scale, N input tasks × 8 buckets small files).
      graft.Tables(s, d, "lineitem").select("l_orderkey", "l_quantity")
        .repartition(8, col("l_orderkey"))
        .write.mode(SaveMode.Overwrite).format("parquet")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", s"$wh/lineitem").saveAsTable("graft_bkt_lineitem")
      graft.Tables(s, d, "orders").select("o_orderkey", "o_custkey")
        .repartition(8, col("o_orderkey"))
        .write.mode(SaveMode.Overwrite).format("parquet")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", s"$wh/orders").saveAsTable("graft_bkt_orders")
      s.table("graft_bkt_lineitem")
        .join(s.table("graft_bkt_orders"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("lines"),
          // decimal sum: exact + order-independent, rendered to string
          // for the driver's pandas compare (same rationale as scan_parquet)
          sum(col("l_quantity").cast("decimal(18,3)")).cast("string").as("qty_sum"))
        .orderBy("o_custkey")
    }),

    // Z-order (Morton) clustering for two-dimensional data skipping: rows
    // sorted by the bit-interleaved z-value stay close in BOTH dims, so
    // every chunk (= file at scale) has tight min/max on each axis and
    // scans filtered on EITHER prune. The declared result is the per-chunk
    // stats report (min/max/area per 16-quantile chunk) — exactly what a
    // layout job would write to the table's file-skipping index. The
    // chunk assignment is ops/GlobalRowNumber (range-repartition on the
    // z-value — the same shuffle a real layout rewrite pays) + the
    // arithmetic ntile, so the plan carries NO partition-less window even
    // though the oracle keeps SQL ntile(16) semantics.
    "cluster_zorder" -> ((s, d) => {
      val z = graft.Tables(s, d, "lineitem")
        .select(col("l_orderkey"),
          col("l_linenumber").cast("int").as("line_no"),
          pmod(col("l_partkey"), lit(256)).cast("int").as("x"),
          pmod(col("l_suppkey"), lit(256)).cast("int").as("y"))
        .withColumn("zval", graft.perf.ZOrder.zValue(col("x"), col("y")))
      val (ranked, n) = graft.ops.GlobalRowNumber.withRowNumberExprCounted(
        z, "i", Seq(col("zval"), col("l_orderkey"), col("line_no")))
      ranked
        .withColumn("chunk", // n rides as a constant-folded literal — the
          // stats report stays join-free (PerfTechniquesSpec pins this)
          graft.ops.GlobalRowNumber.ntileFromRank(col("i"), lit(n), 16))
        .groupBy("chunk")
        .agg(count(lit(1)).as("rows_in_chunk"),
          min(col("x")).as("min_x"), max(col("x")).as("max_x"),
          min(col("y")).as("min_y"), max(col("y")).as("max_y"))
        .withColumn("xy_area",
          ((col("max_x") - col("min_x") + 1) *
            (col("max_y") - col("min_y") + 1)).cast("long"))
        .select(col("chunk").cast("long").as("chunk"), col("rows_in_chunk"),
          col("min_x"), col("max_x"), col("min_y"), col("max_y"), col("xy_area"))
        .orderBy("chunk")
    }),

    // Dynamic-partition-pruned join: fact written partitioned by month,
    // dim side filtered at runtime — Spark inserts a dynamicpruning
    // subquery so the fact scan reads ONLY the dim's surviving months
    // (PerfTechniquesSpec asserts the pruning expression is in the plan).
    // At 100 TB this is the difference between scanning 3 months and 84.
    "join_dpp_prune" -> ((s, d) => {
      val out = setupOnce(d, "dpp_fact") { out =>
        graft.Tables(s, d, "lineitem")
          .select(col("l_orderkey"),
            col("l_linenumber").cast("int").as("line_no"),
            col("l_quantity"),
            col("l_shipdate").cast("date").cast("string").as("ship_date"))
          .withColumn("ship_month", substring(col("ship_date"), 1, 7))
          .write.mode(SaveMode.Overwrite).partitionBy("ship_month").parquet(out)
      }
      val fact = s.read.parquet(out)
      val dim = fact.select("ship_month").distinct()
        .filter(col("ship_month") < "1995-07")
      fact.join(broadcast(dim), "ship_month")
        .groupBy("ship_month")
        .agg(count(lit(1)).as("rows_in_month"),
          sum(col("l_quantity").cast("decimal(18,3)")).cast("string").as("qty_sum"))
        .orderBy("ship_month")
    }),

    // Table-format time travel: two committed snapshot versions diffed by
    // version-addressed reads — the corpus_snapshot_diff audit executed
    // through the transactional layer itself (ops/SnapshotTable manifest
    // commits), so the versions compared are real immutable commits, not
    // conventionally-named dirs. The diff joins two narrow (id, n_chars)
    // snapshots full-outer on the id — text bytes never enter the table.
    "snapshot_time_travel" -> ((s, d) => {
      val docs = graft.Tables(s, d, "documents")
        .select(col("doc_id"), col("n_chars"))
      val dir = scratch("snap_tt")
      val fs = new Path(dir).getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new Path(dir), true) // clean 2-version history per run
      val t = graft.ops.SnapshotTable(s, dir, docs.schema)
      // corpus-fraction (x2): the two snapshot versions are data splits
      t.overwrite(docs.filter(col("doc_id") % 2 === 0))
      // corpus-fraction: second snapshot version, a data split
      t.overwrite(docs.filter(col("doc_id") % 3 === 0)
        .withColumn("n_chars",
          when(col("doc_id") % 12 === 0, col("n_chars") + 1)
            .otherwise(col("n_chars"))))
      val v1 = t.readVersion(1)
        .select(col("doc_id").as("id1"), col("n_chars").as("nc1"))
      val v2 = t.readVersion(2)
        .select(col("doc_id").as("id2"), col("n_chars").as("nc2"))
      v1.join(v2, col("id1") === col("id2"), "full_outer")
        .withColumn("status",
          when(col("id1").isNull, "added")
            .when(col("id2").isNull, "removed")
            .when(col("nc1") =!= col("nc2"), "changed")
            .otherwise("unchanged"))
        .groupBy("status").agg(count(lit(1)).as("n"))
        .orderBy("status")
    }),

    // Compaction as a first-class table op: three appends leave every
    // ship-month partition owned by three commit dirs, so a read plans
    // three parquet relations; compact() folds each partition back to one
    // dir while committing a logically identical snapshot (CAS-validated
    // against concurrent writers — ops/SnapshotTable.compact). The result
    // aggregates the COMPACTED read and carries the live-commit-dir count
    // as a column, so the oracle (same aggregate straight from lineitem,
    // live_dirs = 1) hash-fails if either the rewrite changed content or
    // the fold didn't actually happen.
    "snapshot_compact" -> ((s, d) => {
      // one ship-year of the fact is plenty to prove the fold — the
      // rewrite cost is the op under test, not the corpus size
      val li = graft.Tables(s, d, "lineitem")
        .filter(col("l_shipdate").cast("date") < lit("1996-01-01").cast("date"))
        .select(col("l_orderkey").cast("long").as("okey"),
          col("l_quantity").cast("decimal(18,3)").as("qty"),
          substring(col("l_shipdate").cast("date").cast("string"), 1, 7)
            .as("ship_month"))
      val dir = scratch("snap_compact")
      val fs = new Path(dir).getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new Path(dir), true) // clean history per run
      val t = graft.ops.SnapshotTable(s, dir, li.schema, Seq("ship_month"))
      (0 to 2).foreach(i => t.append(li.filter(col("okey") % 3 === i)))
      t.compact()
      t.read.groupBy("ship_month")
        .agg(count(lit(1)).as("n"),
          sum(col("qty")).cast("string").as("qty_sum"))
        .withColumn("live_dirs", lit(t.liveCommitDirs))
        .orderBy("ship_month")
    }),

    // Additive schema evolution through the transactional layer (VERDICT
    // r17 #1; the reference staging DDL's per-column ADD IF NOT EXISTS —
    // sql/batchELT/staging/stg_trip.sql:38-111): the first commit is the
    // narrow shape, the second load carries a NEW nullable column and
    // auto-evolves the table in the same manifest commit — a metadata-only
    // ALTER, no data rewrite. The aggregate groups by the added column, so
    // a hash match proves old rows surface NULL and new rows carry values
    // THROUGH the shared read path; v1_cols pins time travel across the
    // boundary (version 1 still reads its own narrower shape).
    "snapshot_schema_evolve" -> ((s, d) => {
      val docs = graft.Tables(s, d, "documents")
        .select(col("doc_id"), col("n_chars"))
      val dir = scratch("snap_evolve")
      val fs = new Path(dir).getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new Path(dir), true) // clean evolution history per run
      val t = graft.ops.SnapshotTable(s, dir, docs.schema)
      // corpus-fraction (x2): the two loads are data splits
      t.append(docs.filter(col("doc_id") % 2 === 0))
      // corpus-fraction: the drifted load, a data split + derived column
      t.append(docs.filter(col("doc_id") % 2 =!= 0)
        .withColumn("lang_hint",
          when(col("n_chars") % 3 === 0, "en").otherwise("xx")))
      val v1cols = t.readVersion(1).columns.length
      t.read
        .groupBy(coalesce(col("lang_hint"), lit("<none>")).as("lang_hint"))
        .agg(count(lit(1)).as("n"),
          sum(col("n_chars")).cast("long").as("chars_sum"))
        .withColumn("v1_cols", lit(v1cols))
        .orderBy("lang_hint")
    }),

    // SCD1 dim attribute refresh through the shared-star discipline
    // (VERDICT r17 #8; the dim UPDATE the reference's insert-missing-NK
    // upsert procs can't express, run under the same whole-table CAS):
    // a deterministic nation dim is seeded (SKs = dense numbering over
    // sorted NKs, the IDENTITY analog), then two refreshes land display
    // names — the first ADDS the attribute column (additive evolution),
    // the second names a different member set. The oracle recomputes the
    // SK space and both refresh waves from the raw table, so a hash match
    // proves attributes updated in place while every (nk, sk) pair stayed
    // immovable.
    "dim_refresh_scd1" -> ((s, d) => {
      val nat = graft.Tables(s, d, "nation")
        .select(col("n_name").cast("string").as("n_name"),
          col("n_regionkey").cast("int").as("n_regionkey"))
      val dir = scratch("dim_scd1")
      val fs = new Path(dir).getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new Path(dir), true) // clean refresh history per run
      val t = graft.ops.SnapshotTable(s, dir,
        StructType.fromDDL("nation_nk STRING, nation_sk INT"))
      t.overwrite(graft.batch.StarModel.upsertDim(
        t.read, nat, "n_name", "nation_nk", "nation_sk")): Unit
      graft.lambda.Lambda.refreshDimScd1(t,
        nat.filter(col("n_regionkey") === 0)
          .select(col("n_name").as("nation_nk"),
            concat(lit("Nation of "), col("n_name")).as("display_name")),
        "nation_nk"): Unit
      graft.lambda.Lambda.refreshDimScd1(t,
        nat.filter(col("n_regionkey") === 1)
          .select(col("n_name").as("nation_nk"),
            lower(col("n_name")).as("display_name")),
        "nation_nk"): Unit
      t.read.select(col("nation_nk"), col("nation_sk"),
          coalesce(col("display_name"), lit("<none>")).as("display_name"))
        .orderBy("nation_nk")
    }),

    // Fast-load append table (HEAP semantics, stg_trip.sql:36): two
    // appended batches into one parquet table, per-batch counts on re-read.
    "sink_table_append" -> ((s, d) => {
      val out = scratch("append_table")
      val routed = routedMemo(s, d)
        .withColumn("batch_id",
          when(dayofmonth(col("arrival_ts")) <= 15, "b1").otherwise("b2"))
      val narrow = routed.select("event_id", "batch_id")
      narrow.filter(col("batch_id") === "b1")
        .write.mode(SaveMode.Overwrite).parquet(out)
      narrow.filter(col("batch_id") === "b2")
        .write.mode(SaveMode.Append).parquet(out)
      s.read.parquet(out)
        .groupBy("batch_id").agg(count(lit(1)).as("events"))
        .orderBy("batch_id")
    }))

  val oracles: Map[String, String] = Map(
    // the salted join's contract IS the plain join
    "join_skew_salted" ->
      """SELECT l.l_orderkey, CAST(l.l_linenumber AS INT) AS line_no,
        |  l.l_partkey, p.p_name
        |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |ORDER BY l.l_orderkey, line_no, l.l_partkey""".stripMargin,

    "scan_parquet" -> taxi(
      """SELECT l_orderkey,
        |  CAST(l_linenumber AS SMALLINT) AS line_no,
        |  CAST(CAST(l_quantity AS DECIMAL(9,3)) AS VARCHAR) AS qty_dec,
        |  CAST(CAST(l_extendedprice AS DECIMAL(10,2)) AS VARCHAR) AS price_dec,
        |  CAST(CAST(l_shipdate AS DATE) AS VARCHAR) AS ship_date,
        |  l_returnflag AS flag1
        |FROM lineitem
        |ORDER BY l_orderkey, line_no, qty_dec, price_dec, ship_date,
        |  flag1""".stripMargin),

    "scan_csv_positional" -> stream(
      """SELECT event_id, vendor_id,
        |  printf('%.6f', fare_amount)::DOUBLE AS fare_amount, pickup_ts
        |FROM ev_typed ORDER BY event_id""".stripMargin),

    "scan_jsonl" -> stream(
      """SELECT sink, count(*) AS events FROM ev_routed
        |GROUP BY 1 ORDER BY sink""".stripMargin),

    "lineage_inject" -> taxi(
      """SELECT 'lineitem.parquet' AS source_file_name,
        |  'run-2024-06-01' AS run_id, count(*) AS rows
        |FROM lineitem GROUP BY 1, 2 ORDER BY source_file_name""".stripMargin),

    "sink_partitioned_hourly" -> stream(
      """SELECT strftime(arrival_ts, '%Y-%m-%d') AS p_date,
        |  strftime(arrival_ts, '%H') AS p_hour, count(*) AS events
        |FROM ev_routed WHERE CAST(arrival_ts AS DATE) < DATE '2024-01-04'
        |GROUP BY 1, 2 ORDER BY p_date, p_hour""".stripMargin),

    "snapshot_time_travel" ->
      """WITH v1 AS (
        |  -- corpus-fraction: snapshot version 1 is a data split
        |  SELECT doc_id, n_chars FROM documents WHERE doc_id % 2 = 0
        |), v2 AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 12 = 0 THEN n_chars + 1 ELSE n_chars END AS n_chars
        |  -- corpus-fraction: snapshot version 2, a data split
        |  FROM documents WHERE doc_id % 3 = 0
        |), j AS (
        |  SELECT CASE WHEN v1.doc_id IS NULL THEN 'added'
        |              WHEN v2.doc_id IS NULL THEN 'removed'
        |              WHEN v1.n_chars <> v2.n_chars THEN 'changed'
        |              ELSE 'unchanged' END AS status
        |  FROM v1 FULL JOIN v2 ON v1.doc_id = v2.doc_id)
        |SELECT status, count(*) AS n FROM j GROUP BY status ORDER BY status""".stripMargin,

    "dim_refresh_scd1" ->
      """SELECT n_name AS nation_nk,
        |  CAST(row_number() OVER (ORDER BY n_name) AS INT) AS nation_sk,
        |  CASE WHEN n_regionkey = 0 THEN 'Nation of ' || n_name
        |       WHEN n_regionkey = 1 THEN lower(n_name)
        |       ELSE '<none>' END AS display_name
        |FROM nation ORDER BY nation_nk""".stripMargin,

    "snapshot_schema_evolve" ->
      """WITH olds AS (
        |  -- corpus-fraction: load 1, a data split (pre-evolution shape)
        |  SELECT doc_id, n_chars, NULL AS lang_hint
        |  FROM documents WHERE doc_id % 2 = 0
        |), news AS (
        |  -- corpus-fraction: load 2, the drifted data split
        |  SELECT doc_id, n_chars,
        |    CASE WHEN n_chars % 3 = 0 THEN 'en' ELSE 'xx' END AS lang_hint
        |  FROM documents WHERE doc_id % 2 <> 0
        |), u AS (SELECT * FROM olds UNION ALL SELECT * FROM news)
        |SELECT coalesce(lang_hint, '<none>') AS lang_hint, count(*) AS n,
        |  CAST(sum(n_chars) AS BIGINT) AS chars_sum, 2 AS v1_cols
        |FROM u GROUP BY 1 ORDER BY lang_hint""".stripMargin,

    "snapshot_compact" -> taxi(
      """SELECT substr(CAST(CAST(l_shipdate AS DATE) AS VARCHAR), 1, 7) AS ship_month,
        |  count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,3))) AS VARCHAR) AS qty_sum,
        |  1 AS live_dirs
        |FROM lineitem WHERE CAST(l_shipdate AS DATE) < DATE '1996-01-01'
        |GROUP BY 1 ORDER BY ship_month""".stripMargin),

    "list_files" -> stream(
      """SELECT DISTINCT 'p_date=' || strftime(arrival_ts, '%Y-%m-%d')
        |  || '/p_hour=' || strftime(arrival_ts, '%H') AS partition_dir
        |FROM ev_routed WHERE strftime(arrival_ts, '%H') < '12'
        |  AND CAST(arrival_ts AS DATE) < DATE '2024-01-04'
        |ORDER BY partition_dir""".stripMargin),

    "seed_reference_data" -> (
      """SELECT payment_nk, payment_sk FROM (
        |  SELECT 'UNKNOWN' AS payment_nk, -1 AS payment_sk
        |  UNION ALL
        |  SELECT payment_type_src,
        |    CAST(row_number() OVER (ORDER BY payment_type_src) AS INT)
        |  FROM (VALUES ('1'),('2'),('3'),('4'),('CRD'),('CSH'))
        |    AS pm(payment_type_src)) u
        |ORDER BY payment_sk""".stripMargin),

    "scan_parquet_evolve" -> taxi(
      """SELECT l_orderkey, l_linenumber AS line_no, l_quantity AS qty,
        |  CASE WHEN l_orderkey % 4 = 0 THEN l_discount END AS disc,
        |  CASE WHEN l_orderkey % 4 = 0 THEN l_returnflag END AS flag
        |FROM lineitem
        |ORDER BY l_orderkey, line_no, qty,
        |  disc NULLS FIRST, flag NULLS FIRST""".stripMargin),

    "sink_table_append" -> stream(
      """SELECT CASE WHEN day(arrival_ts) <= 15 THEN 'b1' ELSE 'b2' END AS batch_id,
        |  count(*) AS events
        |FROM ev_routed GROUP BY 1 ORDER BY batch_id""".stripMargin),

    "join_dpp_prune" -> graft.oracle.OracleCte.taxiWith(
      """dppf AS (
        |  SELECT l_orderkey, l_quantity,
        |    substr(CAST(CAST(l_shipdate AS DATE) AS VARCHAR), 1, 7) AS ship_month
        |  FROM lineitem
        |), dppm AS (
        |  SELECT DISTINCT ship_month FROM dppf WHERE ship_month < '1995-07')""".stripMargin,
      """SELECT dppf.ship_month, count(*) AS rows_in_month,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,3))) AS VARCHAR) AS qty_sum
        |FROM dppf JOIN dppm USING (ship_month)
        |GROUP BY 1 ORDER BY 1""".stripMargin),

    "scan_json_corrupt" ->
      """SELECT count(*) AS total_rows,
        |  CAST(sum(CASE WHEN event_id % 97 = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS quarantined,
        |  CAST(sum(CASE WHEN event_id % 97 <> 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS parsed,
        |  CAST(sum(CASE WHEN event_id % 97 <> 0 THEN event_id END) AS BIGINT)
        |    AS sum_parsed_ids
        |FROM events""".stripMargin,

    // the variant extraction must reproduce the typed values that built
    // the envelopes, including the 6-digit-micros ISO render
    "scan_json_variant" -> stream(
      """SELECT event_id, vendor_id, payment_type, fare_amount,
        |  strftime(arrival_ts, '%Y-%m-%dT%H:%M:%S.%f') AS producer_ts
        |FROM ev_typed ORDER BY event_id""".stripMargin),

    // the normalize contract: child rows = lineitem, pos = 0-based rank
    // within its order under sort_array's FULL struct order (line_no,
    // partkey, qty) — the fixture has duplicate line numbers within an
    // order, so ranking by line_no alone is not a total order
    "scan_json_normalize" ->
      """SELECT CAST(l_orderkey AS BIGINT) AS order_id,
        |  CAST(row_number() OVER (PARTITION BY l_orderkey
        |       ORDER BY l_linenumber, l_partkey, l_quantity) - 1 AS INT) AS pos,
        |  CAST(l_linenumber AS INT) AS line_no,
        |  CAST(l_partkey AS BIGINT) AS partkey,
        |  CAST(l_quantity AS DOUBLE) AS qty
        |FROM lineitem ORDER BY order_id, pos""".stripMargin,

    "scan_orc" -> taxi(
      """SELECT l_orderkey, CAST(l_linenumber AS INT) AS line_no,
        |  CAST(l_quantity AS DOUBLE) AS qty,
        |  CAST(CAST(l_shipdate AS DATE) AS VARCHAR) AS ship_date,
        |  l_returnflag AS flag
        |FROM lineitem
        |ORDER BY l_orderkey, line_no, qty, ship_date, flag""".stripMargin),

    // the bucketed layout's contract IS the plain join + agg
    "sink_bucketed" -> taxi(
      """SELECT o_custkey, count(*) AS lines,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,3))) AS VARCHAR) AS qty_sum
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY o_custkey""".stripMargin),

    "cluster_zorder" -> graft.oracle.OracleCte.taxiWith({
      val zv = graft.perf.ZOrder.zValueSql("l_partkey % 256", "l_suppkey % 256")
      s"""zo AS (
         |  SELECT l_orderkey, CAST(l_linenumber AS INT) AS line_no,
         |    CAST(l_partkey % 256 AS INT) AS x,
         |    CAST(l_suppkey % 256 AS INT) AS y,
         |    $zv AS zval
         |  FROM lineitem
         |), zc AS (
         |  SELECT *, ntile(16) OVER (ORDER BY zval, l_orderkey, line_no) AS chunk
         |  FROM zo)""".stripMargin
    },
      """SELECT CAST(chunk AS BIGINT) AS chunk, count(*) AS rows_in_chunk,
        |  min(x) AS min_x, max(x) AS max_x, min(y) AS min_y, max(y) AS max_y,
        |  CAST((max(x) - min(x) + 1) * (max(y) - min(y) + 1) AS BIGINT) AS xy_area
        |FROM zc GROUP BY chunk ORDER BY chunk""".stripMargin))
}
