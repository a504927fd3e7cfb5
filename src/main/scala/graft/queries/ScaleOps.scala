package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Exprs
import graft.Tables._
import graft.functions.{Fnv64, SketchAggs}

/** Operators whose whole point is the 100 TB execution SHAPE — each one is
  * the standard large-cluster trick for a cost that only bites at scale,
  * implemented with codegen'd built-ins and value-gated by a DuckDB oracle
  * (every output here is a deterministic integer function of the data, so
  * nothing is "rows-only").
  *
  * - `join_bloom_prefilter`: runtime Bloom pruning of a shuffle join's
  *   probe side (what Spark's AQE `runtime.bloomFilter` does internally,
  *   made explicit and deterministic).
  * - `distinct_kmv`: bottom-k (KMV) approximate COUNT(DISTINCT) — fixed
  *   k longs of state per group instead of shuffling every key.
  * - `layout_zorder`: Z-order (Morton) clustering + the file-level min/max
  *   pruning statistics that justify it — the data-layout story behind
  *   multi-dimensional predicate pushdown on parquet.
  */
object ScaleOps {
  type Q = (SparkSession, String) => DataFrame

  private def fnv(c: Column): Column = Exprs.toColumn(Fnv64(Exprs.toExpr(c)))

  // ---------------------------------------------------------------- bloom

  /** Bloom geometry: 2^14 bits (2 KB) / 3 probes for ~20 keys here; at
    * scale m is sized to the build-side key count (~10 bits/key for 1% FP)
    * and the bitset stays broadcast-sized (Spark's own runtime filter caps
    * it at 8 MB). */
  private[queries] val BLOOM_BITS = 1 << 14
  private[queries] val BLOOM_K = 3

  /** Double-hash base pair; build and probe sides MUST share these exact
    * column expressions (xxhash64 seeds differ per column list). */
  private[queries] def h12(key: Column): (Column, Column) =
    (xxhash64(key), xxhash64(key, lit(1)))

  /** Membership test as pure codegen'd built-ins over the literal bitset:
    * bit i of word w via element_at + precomputed single-bit masks (no
    * dynamic shift needed — shiftleft/shiftright take static amounts).
    * The modulus is DERIVED from the bitset (bits.length * 64), so probe
    * and build agree for any geometry — dedup_substring_spans sizes its
    * bitset to the measured dup-hash count rather than BLOOM_BITS. */
  private[queries] def bloomContains(key: Column, bits: Array[Long]): Column = {
    val mBits = bits.length * 64L
    val bitsLit = typedlit(bits)
    val masks = typedlit((0 until 64).map(i => 1L << i).toArray)
    val (h1r, h2r) = h12(key)
    // reduce mod m BEFORE combining: i * (h2 mod m) stays tiny, so the sum
    // can't overflow (ANSI mode makes wrapping arithmetic an error); since
    // m is a power of two this equals floorMod(h1 + i*h2, m) exactly
    val h1 = pmod(h1r, lit(mBits))
    val h2 = pmod(h2r, lit(mBits))
    (0 until BLOOM_K).map { i =>
      val idx = pmod(h1 + lit(i.toLong) * h2, lit(mBits))
      element_at(bitsLit, shiftright(idx, 6).cast("int") + 1)
        .bitwiseAND(element_at(masks, pmod(idx, lit(64L)).cast("int") + 1)) =!= 0
    }.reduce(_ && _)
  }

  // --------------------------------------------------------------- zorder

  /** Spread the low 16 bits of `c` to even positions (Morton magic masks);
    * identical BIGINT arithmetic exists in DuckDB for the oracle. */
  private def spread16(c: Column): Column = {
    val a = (c.bitwiseOR(shiftleft(c, 8))).bitwiseAND(lit(0x00FF00FFL))
    val b = (a.bitwiseOR(shiftleft(a, 4))).bitwiseAND(lit(0x0F0F0F0FL))
    val e = (b.bitwiseOR(shiftleft(b, 2))).bitwiseAND(lit(0x33333333L))
    (e.bitwiseOR(shiftleft(e, 1))).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton code of two 16-bit keys. */
  private def zval(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))

  /** Write-once events-as-Hive-partitioned-parquet fixture: (event_type,
    * day) directories, stamped on the source table's (mtime, size) with
    * atomic-rename publish — the same discipline as the jsonl/csv/BV
    * fixtures. Shared by `layout_partitioned_prune` (static pruning) and
    * `join_dpp` (dynamic pruning). */
  private[graft] def partitionedEventsFixture(s: SparkSession, d: String): String = {
    val src = java.nio.file.Paths.get(d, "events.parquet")
    val stamp = s"${java.nio.file.Files.getLastModifiedTime(src).toMillis}" +
      s"_${java.nio.file.Files.size(src)}"
    val key = s"${d}_$stamp".replaceAll("[^A-Za-z0-9._-]", "_")
    val dir = s"${sys.props("java.io.tmpdir")}/graft_part_$key"
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(dir, "_SUCCESS"))) {
      val staging = java.nio.file.Paths.get(
        s"$dir.staging-${java.util.UUID.randomUUID().toString.take(8)}")
      events(s, d)
        .select(col("event_id"), col("user_id"), col("value"),
          col("event_type"), date_format(col("ts"), "yyyy-MM-dd").as("day"))
        .write.mode("overwrite").partitionBy("event_type", "day")
        .parquet(staging.toString)
      try java.nio.file.Files.move(staging, java.nio.file.Paths.get(dir),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      catch { case _: java.nio.file.FileSystemException =>
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(staging).iterator().asScala.toSeq
          .reverse.foreach(java.nio.file.Files.deleteIfExists)
      }
    }
    dir
  }

  /** Write-once bucketed-table fixture for `join_bucketed_colocated`:
    * both fact projections written `bucketBy(8, key).sortBy(key)` into a
    * per-JVM managed database, stamped on the source table's (mtime,
    * size) via the table names — the same write-once discipline as
    * [[partitionedEventsFixture]], catalog-resident instead of
    * dir-resident because bucket metadata lives in the catalog. The
    * layout cost is paid once per corpus per JVM; every subsequent build
    * (bench runs 2..n, verify) measures the ZERO-EXCHANGE join the
    * bucketing buys, which is also the honest 100 TB accounting: a
    * bucketed fact table is written once and joined daily. */
  private[graft] def bucketedTablesFixture(s: SparkSession,
      d: String): (String, String) = {
    val src = java.nio.file.Paths.get(d, "lineitem.parquet")
    val stamp = (s"${java.nio.file.Files.getLastModifiedTime(src).toMillis}" +
      s"_${java.nio.file.Files.size(src)}_$d").replaceAll("[^A-Za-z0-9_]", "_")
    val db = "graft_bucketed"
    // location is per-JVM: a fresh session's in-memory catalog cannot
    // overwrite a managed-table dir orphaned by a previous JVM
    // (LOCATION_ALREADY_EXISTS), so never share one across processes
    s.sql(s"CREATE DATABASE IF NOT EXISTS $db LOCATION " +
      s"'/tmp/graft_bucketed_${s.sparkContext.applicationId}'")
    val lt = s"$db.lineitem_b_$stamp"
    val ot = s"$db.orders_b_$stamp"
    if (!s.catalog.tableExists(lt)) {
      lineitem(s, d)
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
        .write.mode("overwrite").format("parquet")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable(lt)
    }
    if (!s.catalog.tableExists(ot)) {
      orders(s, d).select(col("o_orderkey"), col("o_orderpriority"))
        .write.mode("overwrite").format("parquet")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable(ot)
    }
    (ot, lt)
  }

  val queries: Map[String, Q] = Map(
    // -- runtime Bloom prefilter on a semi join: build side aggregates to a
    //    2 KB bitset (map-side partial ORs), one driver scalar collect
    //    (same shape as AQE's runtime filter / a broadcast build), probe
    //    side filters IN THE SCAN STAGE before any exchange, then the
    //    exact semi join removes the false positives — output provably
    //    equals the plain semi join, which is the oracle.
    "join_bloom_prefilter" -> ((s, d) => {
      import s.implicits._
      val segKeys = supplier(s, d).filter(col("s_nationkey") < 5)
        .select(col("s_suppkey").cast("long").as("sk"))
      val (bh1, bh2) = h12(col("sk"))
      val bits = segKeys.select(bh1.as("h1"), bh2.as("h2")).as[(Long, Long)]
        .select(new SketchAggs.BloomBits(BLOOM_BITS, BLOOM_K).toColumn).head()
      lineitem(s, d)
        .select(col("l_suppkey").cast("long").as("sk"),
          floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 10000)
            .as("net_c4"))
        .filter(bloomContains(col("sk"), bits))
        .join(segKeys, Seq("sk"), "left_semi")
        .groupBy(col("sk"))
        .agg(count(lit(1)).as("n_items"), sum(col("net_c4")).as("revenue_c4"))
        .orderBy("sk")
    }),

    // -- KMV approximate distinct per group: the aggregator state is at
    //    most k=64 longs however many rows a group has; estimate and the
    //    x1e4 error column are exact integer arithmetic the oracle
    //    recomputes from the same fnv64 hashes.
    "distinct_kmv" -> ((s, d) => {
      val k = 64
      val kmv = udaf(new SketchAggs.KmvDistinct(k))
      val keyed = events(s, d).select(col("event_type"),
        concat(col("user_id").cast("string"), lit(":"),
          date_format(col("ts"), "yyyy-MM-dd")).as("key"))
      keyed.select(col("event_type"), col("key"), fnv(col("key")).as("h"))
        .groupBy(col("event_type"))
        .agg(countDistinct(col("key")).as("n_exact"), kmv(col("h")).as("est_kmv"))
        .select(col("event_type"), col("n_exact"), col("est_kmv"),
          floor(abs(col("est_kmv") - col("n_exact")) * 10000 / col("n_exact"))
            .as("err_x1e4"))
        .orderBy("event_type")
    }),

    // -- KMV sketch SET ALGEBRA (the theta-sketch workload): per-type
    //    bottom-64 sketches of the (user, day) key sets, then for every
    //    type pair the UNION estimate (bottom-k of two bottom-k merges —
    //    lossless), the theta-INTERSECTION estimate (common hashes below
    //    the union's kth value, scaled by est_union/k) and the sketch
    //    Jaccard — set overlap between two 100 TB-sized sets answered
    //    from 2×64 longs, never by re-joining the raw keys. Hashes live
    //    in a 40-bit domain so every estimate is exact BIGINT division in
    //    both engines (fnv64 is unsigned-64 — 63·2⁶⁴/θ needs the 128-bit
    //    arithmetic Spark lacks; the truncation costs nothing at these
    //    cardinalities and is applied identically in the oracle). The
    //    exact pairwise intersection (one key self-join) rides along as
    //    the calibration baseline, same as distinct_kmv's n_exact.
    "distinct_kmv_pairs" -> ((s, d) => {
      val k = 64
      val M = (1L << 40) - 1
      val kmv = udaf(new SketchAggs.KmvUnion(k))
      val keyed = events(s, d).select(col("event_type"),
        concat(col("user_id").cast("string"), lit(":"),
          date_format(col("ts"), "yyyy-MM-dd")).as("key"))
      val hashed = keyed.select(col("event_type"), col("key"),
        fnv(col("key")).bitwiseAND(lit(M)).as("h"))
      val sk = hashed.groupBy(col("event_type"))
        .agg(kmv(array(col("h"))).as("sk"))
      val dk = hashed.select(col("event_type"), col("key")).distinct()
      val exact = dk.as("a").join(dk.as("b"),
          col("a.key") === col("b.key") &&
            col("a.event_type") < col("b.event_type"))
        .groupBy(col("a.event_type").as("type_a"),
          col("b.event_type").as("type_b"))
        .agg(count(lit(1)).as("n_inter_exact"))
      sk.as("x").join(sk.as("y"), col("x.event_type") < col("y.event_type"))
        .select(col("x.event_type").as("type_a"),
          col("y.event_type").as("type_b"),
          col("x.sk").as("sa"), col("y.sk").as("sb"))
        .withColumn("mu", expr(s"slice(array_sort(array_union(sa, sb)), 1, $k)"))
        .withColumn("theta", expr("element_at(mu, size(mu))"))
        .withColumn("est_union", expr(s"CASE WHEN size(mu) < $k " +
          s"THEN CAST(size(mu) AS BIGINT) " +
          s"ELSE ${(k - 1).toLong * (1L << 40)} DIV theta END"))
        .withColumn("c", expr(
          "CAST(size(filter(array_intersect(sa, sb), v -> v <= theta)) AS BIGINT)"))
        .withColumn("est_inter", expr(s"CASE WHEN size(mu) < $k THEN c " +
          s"ELSE (c * est_union) DIV $k END"))
        .withColumn("jac_x1e4", expr("c * 10000 DIV size(mu)"))
        .join(exact, Seq("type_a", "type_b"), "left")
        .select(col("type_a"), col("type_b"), col("est_union"),
          col("est_inter"),
          coalesce(col("n_inter_exact"), lit(0L)).as("n_inter_exact"),
          col("jac_x1e4"))
        .orderBy("type_a", "type_b")
    }),

    // -- bucketed co-located join: BOTH fact tables are written ONCE
    //    `bucketBy(8, key).sortBy(key)` into a managed parquet table
    //    ([[bucketedTablesFixture]] — stamped write-once, so the bench
    //    measures the JOIN, not the layout write), then joined back on the
    //    bucket key with a forced sort-merge join. The scan's bucketing IS
    //    the join partitioning, so the join runs with ZERO exchanges on
    //    the key (gated in ScaleOpsSpec: no
    //    `hashpartitioning(o_orderkey/l_orderkey)` exchange in the final
    //    plan) — the one-time layout cost is amortized over every
    //    subsequent key join, the standard warehouse trick for a fact
    //    table joined on the same key daily. At 100 TB the bucket count
    //    scales with data (e.g. 4096) and writers emit one file per
    //    bucket; the join itself never reshuffles. Values are gated by the
    //    plain-join oracle — bucketing must not change a single row.
    "join_bucketed_colocated" -> ((s, d) => {
      val (ordersB, lineitemB) = bucketedTablesFixture(s, d)
      s.table(ordersB).hint("merge")
        .join(s.table(lineitemB).hint("merge"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_items"),
          sum(floor(col("l_extendedprice") * (lit(1) - col("l_discount"))
            * 10000)).as("revenue_c4"))
        .orderBy("o_orderpriority")
    }),

    // -- Hive-partitioned layout + partition pruning: events are written
    //    ONCE as parquet partitioned by (event_type, day) — 150 directories
    //    at every SF — with the same stamped-dir + atomic-rename fixture
    //    discipline as the jsonl/csv roundtrips. The read-back applies a
    //    predicate on BOTH partition columns, which Catalyst resolves
    //    against the directory listing alone: 3 of 150 partitions are ever
    //    opened (gated in ScaleOpsSpec via the scan's selected-partition
    //    count), no file footer of a pruned partition is touched. This is
    //    THE first-order 100 TB lever — a date-partitioned corpus makes a
    //    one-day query read 1/1000th of the bytes before any filter
    //    pushdown even runs; at scale the write side is exactly this
    //    `partitionBy` with per-partition file sizing. Values are gated by
    //    the unpartitioned oracle: layout must not change a single row.
    "layout_partitioned_prune" -> ((s, d) => {
      s.read.parquet(partitionedEventsFixture(s, d))
        .filter(col("event_type") === "purchase" &&
          col("day").cast("string").between("2024-01-10", "2024-01-12"))
        .groupBy(col("day").cast("string").as("day"))
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"),
          sum(floor(col("value") * 100).cast("long")).as("value_cents"))
        .orderBy("day")
    }),

    // -- DYNAMIC partition pruning (DPP): the star-schema runtime twin of
    //    layout_partitioned_prune. The fact side is the (event_type, day)-
    //    partitioned fixture; the dim side is a filtered distinct-types
    //    relation whose surviving keys are only known at RUN time — so
    //    Catalyst injects a dynamic pruning subquery into the fact scan's
    //    PartitionFilters (gated in PlanQualitySpec), executes the dim
    //    first, and the fact scan lists only the 3 surviving types' 90
    //    directories. At 100 TB this is the difference between scanning a
    //    fact table and scanning the 3 partitions a dimension filter
    //    selects — no manual predicate copying onto the fact side. The
    //    oracle replays the join as a plain filter.
    "join_dpp" -> ((s, d) => {
      val fact = s.read.parquet(partitionedEventsFixture(s, d))
      val dim = events(s, d).select(col("event_type")).distinct()
        .filter(length(col("event_type")) <= 5)
      fact.join(dim, Seq("event_type"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("day")).as("n_days"),
          sum(floor(col("value") * 100).cast("long")).as("value_cents"))
        .orderBy("event_type")
    }),

    // -- small-file compaction planning (the table-maintenance half of the
    //    layout story next to layout_partitioned_prune): the 150
    //    (event_type, day) partitions stand in for a manifest of small
    //    files; each is bin-packed — in (event_type, day) manifest order,
    //    WITHOUT splitting — into compacted output files of ≥2000 rows via
    //    a global row-offset cumsum, out_file = floor(start_off / target).
    //    The cumsum is the TWO-PHASE bucketed shape (per-type sums →
    //    metadata-sized type window → per-type day window), so no window
    //    ever sees more than one type's manifest rows — and the manifest
    //    itself is metadata-sized at any corpus scale (a 100 TB table is
    //    ~1e6 files), which is what makes compaction PLANNING cheap even
    //    when the rewrite it drives is not. Every value is exact integer
    //    arithmetic; the oracle replays the plan with one window.
    "layout_compaction" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val T = 2000L
      val parts = events(s, d)
        .groupBy(col("event_type"), date_format(col("ts"), "yyyy-MM-dd").as("day"))
        .agg(count(lit(1)).as("n_rows"))
      val wB = Window.orderBy("event_type")
        .rowsBetween(Window.unboundedPreceding, -1)
      val base = parts.groupBy("event_type").agg(sum(col("n_rows")).as("bt"))
        .withColumn("base", coalesce(sum(col("bt")).over(wB), lit(0L)))
        .select("event_type", "base")
      val wIn = Window.partitionBy("event_type").orderBy("day")
        .rowsBetween(Window.unboundedPreceding, -1)
      parts.join(broadcast(base), "event_type")
        .withColumn("start_off",
          col("base") + coalesce(sum(col("n_rows")).over(wIn), lit(0L)))
        .withColumn("out_file", floor(col("start_off") / T).cast("long"))
        .select("event_type", "day", "n_rows", "start_off", "out_file")
        .orderBy("event_type", "day")
    }),

    // -- Z-order layout: assign each row a Morton code over
    //    (l_partkey, l_suppkey), lay rows out in 1000-row "files" in
    //    z order, and report per-file bounding boxes + whether the file
    //    survives min/max pruning for a 2-D query box. The global sort is
    //    the layout operation itself (at scale: repartitionByRange(zval) +
    //    sortWithinPartitions before the parquet write); the point the
    //    numbers make is that z-clustered files have TIGHT boxes in BOTH
    //    dimensions, so a 2-D predicate prunes most files — a single-key
    //    sort gives tight boxes in one dimension only (asserted in the
    //    spec by comparing overlap counts).
    "layout_zorder" -> ((s, d) => {
      import s.implicits._
      val rows = lineitem(s, d).select(
        col("l_orderkey"), col("l_linenumber"),
        col("l_partkey").cast("long").as("p"), col("l_suppkey").cast("long").as("sk"))
        .withColumn("z", zval(col("p"), col("sk")))
      // dense global rank via sort + zipWithIndex (range shuffle + local
      // sort — same pattern as bv_subgraph's renumbering); a row_number
      // window with no partition key would single-partition the sort.
      // Tie-break columns make the layout a deterministic total order.
      rows.orderBy(col("z"), col("l_orderkey"), col("l_linenumber"))
        .select(col("p"), col("sk")).rdd.map(r => (r.getLong(0), r.getLong(1)))
        .zipWithIndex()
        .map { case ((p, sk), rank) => (p, sk, rank / 1000) }
        .toDF("p", "sk", "file_id")
        .groupBy(col("file_id"))
        .agg(count(lit(1)).as("n_rows"),
          min(col("p")).as("min_p"), max(col("p")).as("max_p"),
          min(col("sk")).as("min_s"), max(col("sk")).as("max_s"))
        .withColumn("overlaps_box",
          (col("min_p") <= 511 && col("max_p") >= 256 &&
            col("min_s") <= 47 && col("max_s") >= 32).cast("int"))
        .orderBy("file_id")
    }),

    // -- HILBERT-curve layout: the locality-tighter sibling of
    //    layout_zorder (the Hilbert curve never takes the long diagonal
    //    jumps a Morton curve does, so file bounding boxes are tighter
    //    for the same file size — the reason Delta/Iceberg offer it as
    //    the premium clustering option). Coordinates are the 8-bit
    //    (l_partkey mod 256, l_suppkey mod 256) grid; the order-8 xy→d
    //    walk is the classic 8-step reflect/rotate loop UNROLLED into
    //    pure integer when-chains (bit tests, reflections, swaps — zero
    //    UDFs, all codegen'd in the scan projection); the oracle runs
    //    the identical 8 steps as chained CTEs. Layout + reporting shape
    //    is exactly layout_zorder's: global sort by (h, tie-breaks) =
    //    the layout operation (repartitionByRange + local sort at
    //    scale), then per-1000-row-file bounding boxes + 2-D box
    //    pruning survival.
    "layout_hilbert" -> ((s, d) => {
      import s.implicits._
      def step(sv: Long, x: Column, y: Column, dd: Column)
          : (Column, Column, Column) = {
        val rx1 = x.bitwiseAND(lit(sv)) > 0
        val ry = when(y.bitwiseAND(lit(sv)) > 0, lit(1L)).otherwise(lit(0L))
        val d2 = dd + lit(sv * sv) * when(rx1, lit(3L) - ry).otherwise(ry)
        val x2 = when(ry === 0L, when(rx1, lit(255L) - y).otherwise(y))
          .otherwise(x)
        val y2 = when(ry === 0L, when(rx1, lit(255L) - x).otherwise(x))
          .otherwise(y)
        (x2, y2, d2)
      }
      val base = lineitem(s, d).select(
        col("l_orderkey"), col("l_linenumber"),
        (col("l_partkey").cast("long") % 256).as("x"),
        (col("l_suppkey").cast("long") % 256).as("y"))
      // materialize each step as named columns: the per-step expressions
      // reference the previous step's x/y twice, so inlining all 8 steps
      // would double the tree per step (2^8 leaves) — projection
      // boundaries keep the generated code linear in the step count
      val walked = Seq(128L, 64L, 32L, 16L, 8L, 4L, 2L, 1L).zipWithIndex
        .foldLeft(base.withColumn("x0", col("x")).withColumn("y0", col("y"))
          .withColumn("d0", lit(0L))) { case (df, (sv, i)) =>
          val (x2, y2, d2) =
            step(sv, col(s"x$i"), col(s"y$i"), col(s"d$i"))
          df.withColumn(s"x${i + 1}", x2).withColumn(s"y${i + 1}", y2)
            .withColumn(s"d${i + 1}", d2)
        }
        .select(col("l_orderkey"), col("l_linenumber"),
          col("x"), col("y"), col("d8").as("h"))
      walked.orderBy(col("h"), col("l_orderkey"), col("l_linenumber"))
        .select(col("x"), col("y")).rdd.map(r => (r.getLong(0), r.getLong(1)))
        .zipWithIndex()
        .map { case ((x, y), rank) => (x, y, rank / 1000) }
        .toDF("x", "y", "file_id")
        .groupBy(col("file_id"))
        .agg(count(lit(1)).as("n_rows"),
          min(col("x")).as("min_x"), max(col("x")).as("max_x"),
          min(col("y")).as("min_y"), max(col("y")).as("max_y"))
        .withColumn("overlaps_box",
          (col("min_x") <= 127 && col("max_x") >= 64 &&
            col("min_y") <= 63 && col("max_y") >= 32).cast("int"))
        .orderBy("file_id")
    }))

  /** The 8 unrolled Hilbert xy→d steps as chained DuckDB CTEs — generated
    * from the same per-step reflect/rotate formulas the Spark side runs,
    * so the two engines walk the identical curve. */
  private def hilbertSqlSteps: String =
    Seq(128L, 64L, 32L, 16L, 8L, 4L, 2L, 1L).zipWithIndex.map { case (sv, i) =>
      val x = s"x$i"; val y = s"y$i"; val d = s"d$i"
      s"""h${i + 1} AS (SELECT l_orderkey, l_linenumber, x, y,
         $d + ${sv * sv} * (CASE WHEN ($x & $sv) > 0
             THEN 3 - (CASE WHEN ($y & $sv) > 0 THEN 1 ELSE 0 END)
             ELSE (CASE WHEN ($y & $sv) > 0 THEN 1 ELSE 0 END) END)
           AS d${i + 1},
         CASE WHEN ($y & $sv) = 0 THEN
           CASE WHEN ($x & $sv) > 0 THEN 255 - $y ELSE $y END
           ELSE $x END AS x${i + 1},
         CASE WHEN ($y & $sv) = 0 THEN
           CASE WHEN ($x & $sv) > 0 THEN 255 - $x ELSE $x END
           ELSE $y END AS y${i + 1}
       FROM h$i)"""
    }.mkString(",\n         ")

  private val FNV_SQL_KEY =
    """list_reduce(
         list_prepend(CAST(14695981039346656037 AS HUGEINT),
           list_transform(range(1, len(key)+1),
             i -> CAST(ord(substr(key, i, 1)) AS HUGEINT))),
         (h, b) -> (xor(h, b) * 1099511628211) % 18446744073709551616)"""

  val oracleSql: Map[String, String] = Map(
    "layout_hilbert" ->
      s"""WITH h0 AS (SELECT l_orderkey, l_linenumber,
             CAST(l_partkey AS BIGINT) % 256 AS x,
             CAST(l_suppkey AS BIGINT) % 256 AS y,
             CAST(l_partkey AS BIGINT) % 256 AS x0,
             CAST(l_suppkey AS BIGINT) % 256 AS y0,
             CAST(0 AS BIGINT) AS d0
           FROM lineitem),
         $hilbertSqlSteps,
         f AS (SELECT x, y,
             CAST(FLOOR((row_number() OVER (ORDER BY d8, l_orderkey,
               l_linenumber) - 1) / 1000) AS BIGINT) AS file_id
           FROM h8)
         SELECT file_id, COUNT(*) AS n_rows,
           MIN(x) AS min_x, MAX(x) AS max_x,
           MIN(y) AS min_y, MAX(y) AS max_y,
           CAST(MIN(x) <= 127 AND MAX(x) >= 64
             AND MIN(y) <= 63 AND MAX(y) >= 32 AS INTEGER) AS overlaps_box
         FROM f GROUP BY 1 ORDER BY 1""",
    "layout_compaction" ->
      """WITH p AS (SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
             COUNT(*) AS n_rows
           FROM events GROUP BY 1, 2),
         o AS (SELECT event_type, day, n_rows,
             COALESCE(SUM(n_rows) OVER (ORDER BY event_type, day
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_off
           FROM p)
         SELECT event_type, day, CAST(n_rows AS BIGINT) AS n_rows,
           CAST(start_off AS BIGINT) AS start_off,
           CAST(start_off // 2000 AS BIGINT) AS out_file
         FROM o ORDER BY event_type, day""",

    "layout_partitioned_prune" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS day,
         COUNT(*) AS n_events,
         COUNT(DISTINCT user_id) AS n_users,
         CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
         FROM events
         WHERE event_type = 'purchase'
           AND strftime(ts, '%Y-%m-%d') BETWEEN '2024-01-10' AND '2024-01-12'
         GROUP BY 1 ORDER BY 1""",

    "join_dpp" ->
      """SELECT event_type, COUNT(*) AS n_events,
         COUNT(DISTINCT strftime(ts, '%Y-%m-%d')) AS n_days,
         CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
         FROM events
         WHERE length(event_type) <= 5
         GROUP BY 1 ORDER BY 1""",

    "join_bucketed_colocated" ->
      """SELECT o_orderpriority, COUNT(*) AS n_items,
         CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS BIGINT) AS revenue_c4
         FROM orders JOIN lineitem ON o_orderkey = l_orderkey
         GROUP BY 1 ORDER BY 1""",

    "join_bloom_prefilter" ->
      """SELECT CAST(l_suppkey AS BIGINT) AS sk, COUNT(*) AS n_items,
         CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS BIGINT) AS revenue_c4
         FROM lineitem
         WHERE l_suppkey IN (SELECT s_suppkey FROM supplier WHERE s_nationkey < 5)
         GROUP BY 1 ORDER BY 1""",

    "distinct_kmv" ->
      s"""WITH keys AS (
            SELECT event_type,
                   CAST(user_id AS VARCHAR) || ':' || strftime(ts, '%Y-%m-%d') AS key
            FROM events),
          h AS (SELECT DISTINCT event_type, $FNV_SQL_KEY AS u FROM keys),
          r AS (SELECT event_type, u,
                       row_number() OVER (PARTITION BY event_type ORDER BY u) AS rn
                FROM h),
          sk AS (SELECT event_type, count(*) AS cnt,
                        max(CASE WHEN rn = 64 THEN u END) AS uk
                 FROM r GROUP BY 1),
          ex AS (SELECT event_type, count(DISTINCT key) AS n_exact FROM keys GROUP BY 1)
          SELECT ex.event_type, ex.n_exact,
            CAST(CASE WHEN sk.cnt < 64 THEN sk.cnt
                      WHEN sk.uk = 0 THEN 63
                      ELSE (CAST(63 AS HUGEINT) * 18446744073709551616) // sk.uk
                 END AS BIGINT) AS est_kmv,
            CAST((abs(CAST(CASE WHEN sk.cnt < 64 THEN sk.cnt
                      WHEN sk.uk = 0 THEN 63
                      ELSE (CAST(63 AS HUGEINT) * 18446744073709551616) // sk.uk
                 END AS BIGINT) - ex.n_exact) * 10000) // ex.n_exact AS BIGINT) AS err_x1e4
          FROM ex JOIN sk USING (event_type) ORDER BY event_type""",

    "distinct_kmv_pairs" ->
      s"""WITH keys AS (
            SELECT event_type,
                   CAST(user_id AS VARCHAR) || ':' || strftime(ts, '%Y-%m-%d') AS key
            FROM events),
          h AS (SELECT DISTINCT event_type,
              CAST(($FNV_SQL_KEY) % 1099511627776 AS BIGINT) AS u FROM keys),
          r AS (SELECT event_type, u,
              row_number() OVER (PARTITION BY event_type ORDER BY u) AS rn FROM h),
          sk AS (SELECT event_type, u FROM r WHERE rn <= 64),
          t AS (SELECT DISTINCT event_type FROM keys),
          p AS (SELECT a.event_type AS type_a, b.event_type AS type_b
            FROM t a JOIN t b ON a.event_type < b.event_type),
          mu0 AS (SELECT DISTINCT p.type_a, p.type_b, s.u
            FROM p JOIN sk s
              ON s.event_type = p.type_a OR s.event_type = p.type_b),
          mr AS (SELECT type_a, type_b, u, row_number() OVER (
              PARTITION BY type_a, type_b ORDER BY u) AS rn FROM mu0),
          th AS (SELECT type_a, type_b, COUNT(*) AS msz, MAX(u) AS theta
            FROM mr WHERE rn <= 64 GROUP BY 1, 2),
          cc AS (SELECT t2.type_a, t2.type_b, COUNT(*) AS c
            FROM th t2
            JOIN sk s1 ON s1.event_type = t2.type_a
            JOIN sk s2 ON s2.event_type = t2.type_b AND s2.u = s1.u
            WHERE s1.u <= t2.theta GROUP BY 1, 2),
          ex AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
              COUNT(*) AS n_inter_exact
            FROM (SELECT DISTINCT event_type, key FROM keys) a
            JOIN (SELECT DISTINCT event_type, key FROM keys) b
              ON a.key = b.key AND a.event_type < b.event_type
            GROUP BY 1, 2),
          est AS (SELECT th.type_a, th.type_b, th.msz, COALESCE(cc.c, 0) AS c,
              CASE WHEN th.msz < 64 THEN th.msz
                ELSE ${63L * (1L << 40)} // th.theta END AS est_union
            FROM th LEFT JOIN cc USING (type_a, type_b))
          SELECT est.type_a, est.type_b,
            CAST(est_union AS BIGINT) AS est_union,
            CAST(CASE WHEN msz < 64 THEN c
              ELSE (c * est_union) // 64 END AS BIGINT) AS est_inter,
            CAST(COALESCE(ex.n_inter_exact, 0) AS BIGINT) AS n_inter_exact,
            CAST(c * 10000 // msz AS BIGINT) AS jac_x1e4
          FROM est LEFT JOIN ex USING (type_a, type_b)
          ORDER BY type_a, type_b""",

    "layout_zorder" ->
      """WITH b AS (
           SELECT l_orderkey, l_linenumber,
                  CAST(l_partkey AS BIGINT) AS p, CAST(l_suppkey AS BIGINT) AS sk
           FROM lineitem),
         s1 AS (SELECT *, (p | (p << 8)) & 16711935 AS pa, (sk | (sk << 8)) & 16711935 AS sa FROM b),
         s2 AS (SELECT *, (pa | (pa << 4)) & 252645135 AS pb, (sa | (sa << 4)) & 252645135 AS sb FROM s1),
         s3 AS (SELECT *, (pb | (pb << 2)) & 858993459 AS pc, (sb | (sb << 2)) & 858993459 AS sc FROM s2),
         s4 AS (SELECT *, (pc | (pc << 1)) & 1431655765 AS pd, (sc | (sc << 1)) & 1431655765 AS sd FROM s3),
         z AS (SELECT l_orderkey, l_linenumber, p, sk, pd | (sd << 1) AS z FROM s4),
         f AS (SELECT p, sk,
                      CAST(FLOOR((row_number() OVER (ORDER BY z, l_orderkey, l_linenumber) - 1) / 1000) AS BIGINT) AS file_id
               FROM z)
         SELECT file_id, COUNT(*) AS n_rows,
                MIN(p) AS min_p, MAX(p) AS max_p,
                MIN(sk) AS min_s, MAX(sk) AS max_s,
                CAST(MIN(p) <= 511 AND MAX(p) >= 256 AND MIN(sk) <= 47 AND MAX(sk) >= 32 AS INTEGER) AS overlaps_box
         FROM f GROUP BY 1 ORDER BY 1""")
}
