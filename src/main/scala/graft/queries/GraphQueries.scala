package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** The reference's query surface (SURVEY.md §2.1 Q1–Q4) re-expressed
  * Spark-first over an edge list derived from the parquet testdata, so the
  * DuckDB oracle can recompute every result.
  *
  * Edge model mirrors the reference's `(id, successors)` rows
  * (`/root/reference/src/main/java/de/l3s/mapreduce/webgraph/io/WebGraphInputFormat.java:16`):
  * edges := orders(o_custkey -> o_orderkey), i.e. each customer node points
  * at its order nodes. Successor lists are strictly ascending and
  * duplicate-free, matching the BV format invariant
  * (`patched/HdfsBVGraph.java:172-195`).
  *
  * Scale notes: adjacency building is one hash-shuffle on src (unavoidable
  * — it IS the grouping); explosion back to edges is a narrow Generate, no
  * shuffle; degree distribution re-aggregates the already-shuffled
  * adjacency. GraphX handoff (README.md:37-48 of the reference) is covered
  * in tests; here everything stays DataFrame-native for oracle parity.
  */
object GraphQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Edge list `(src, dst)` derived from orders. */
  def edges(s: SparkSession, d: String): DataFrame =
    orders(s, d).select(col("o_custkey").as("src"), col("o_orderkey").as("dst"))

  /** Compress the orders-derived adjacency to a sharded BVGraph under the
    * JVM temp dir (write-once per SF dir) via the fully distributed DSv2
    * sink — range shuffle on id, one stream-encoded shard per task, no
    * data ever passes through the driver — and return the basename. */
  def bvFixture(s: SparkSession, d: String): String = {
    // key the /tmp basename on the sanitized SF-dir path, not a hashCode
    // (hashCodes collide across dirs, and math.abs(Int.MinValue) < 0) —
    // PLUS the source table's (mtime, size), like the jsonl/csv fixtures:
    // the driver regenerates /root/testdata between rounds, and a
    // path-only key would serve a stale graph against a fresh oracle.
    // Derived fixtures (_T/_S/_G transpose/symmetrize/subgraph) append
    // suffixes to this base, so they inherit the stamp.
    val src = java.nio.file.Paths.get(d, "orders.parquet")
    val stamp = s"${java.nio.file.Files.getLastModifiedTime(src).toMillis}" +
      s"_${java.nio.file.Files.size(src)}"
    val key = s"${d}_$stamp".replaceAll("[^A-Za-z0-9._-]", "_")
    val base = s"${sys.props("java.io.tmpdir")}/graft_bv_$key"
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(base + ".shards"))) {
      val e = edges(s, d).select(col("src").cast("int").as("src"),
        col("dst").cast("int").as("dst"))
      val n = e.agg(greatest(max(col("src")), max(col("dst")))).head().getInt(0) + 1
      // only ids WITH successors are written; the `nodes` option densifies
      // to [0, n) at commit via metadata-only empty shards — no dense
      // range join (at 100 TB that join would shuffle n rows just to
      // materialize degree-0 sinks the sink can pad for free)
      val adjacency = e.groupBy(col("src"))
        .agg(sort_array(collect_list(col("dst"))).as("successors"))
        .select(col("src").as("id"), col("successors"))
        .withColumn("outdegree", size(col("successors")))
      adjacency.write.format("bvgraph").option("basename", base)
        .option("shards", 8).option("nodes", n).mode("overwrite").save()
    }
    base
  }

  val queries: Map[String, Q] = Map(
    // -- Q1-equivalent: adjacency rows (id, successors). Successors surface
    //    as a comma-joined ascending string so the hash compare is
    //    engine-neutral (array<->list representations differ across engines).
    "adjacency_list" -> ((s, d) => {
      edges(s, d)
        .groupBy(col("src"))
        .agg(
          array_join(transform(array_sort(collect_list(col("dst"))),
            x => x.cast("string")), ",").as("successors"),
          count(lit(1)).as("outdegree"))
        .orderBy("src")
    }),

    // -- Q2+Q3-equivalent: adjacency -> explode -> count == edge count;
    //    also node counts (the README's numVertices/numEdges pair).
    "edge_count" -> ((s, d) => {
      val adj = edges(s, d)
        .groupBy(col("src")).agg(collect_list(col("dst")).as("successors"))
      adj.select(explode(col("successors")).as("dst"), col("src"))
        .agg(
          count(lit(1)).as("m_edges"),
          countDistinct(col("src")).as("n_src"),
          countDistinct(col("dst")).as("n_dst"))
    }),

    // -- degree distribution: histogram of outdegrees
    "outdegree_dist" -> ((s, d) => {
      edges(s, d)
        .groupBy(col("src")).agg(count(lit(1)).as("deg"))
        .groupBy(col("deg")).agg(count(lit(1)).as("n_nodes"))
        .orderBy("deg")
    }),

    // -- BV sink + DSv2 source end-to-end: derive adjacency from orders,
    //    compress it through the distributed sharded sink, scan it back
    //    with spark.read.format("bvgraph"), explode to edges. The oracle
    //    is the original orders table — so the distributed encoder AND the
    //    splittable decoder are both value-gated by DuckDB.
    "bv_roundtrip" -> ((s, d) => {
      val base = bvFixture(s, d)
      s.read.format("bvgraph").option("basename", base).option("splits", 8).load()
        .select(col("id").cast("long").as("src"),
          explode(col("successors")).as("d"))
        .select(col("src"), col("d").cast("long").as("dst"))
        .orderBy("src", "dst")
    }),

    // -- degree-only BV scan: projects (id, outdegree), which prunes to
    //    the random-access outdegree fast path — one γ decode per node,
    //    successor data never touched (the reference's D3,
    //    HdfsBVGraph.java:69-91). All nodes appear, including degree-0
    //    sinks.
    "bv_degrees" -> ((s, d) => {
      val base = bvFixture(s, d)
      s.read.format("bvgraph").option("basename", base).option("splits", 8).load()
        .select(col("id").cast("long").as("id"),
          col("outdegree").cast("long").as("outdeg"))
        .orderBy("id")
    }),

    // -- id-range predicate pushdown THROUGH the DSv2 scan: the filter on
    //    `id` reaches the source (pushedFilters -> clamped node ranges),
    //    so skipped nodes cost ZERO decode I/O — the offsets index makes
    //    any id range directly addressable. At 100 TB this is the
    //    difference between decoding the whole graph and seeking straight
    //    to the queried slice. Plan shape gated in BvSourceSpec
    //    ("id in [lo,hi)" in the scan description).
    "bv_id_slice" -> ((s, d) => {
      val base = bvFixture(s, d)
      s.read.format("bvgraph").option("basename", base).option("splits", 8).load()
        .filter(col("id") >= 100 && col("id") < 600)
        .select(col("id").cast("long").as("src"),
          explode(col("successors")).as("dd"))
        .select(col("src"), col("dd").cast("long").as("dst"))
        .orderBy("src", "dst")
    }),

    // -- BV source composed with the relational surface: the degree-only
    //    fast path (one γ decode per node, successors never touched)
    //    feeds a broadcast dimension join — per-nation order counts
    //    computed from the COMPRESSED graph plus the customer dim. This
    //    is the integration shape a webgraph warehouse runs daily:
    //    graph-side metadata scan (no adjacency I/O), dim broadcast, one
    //    partial-aggregated rollup. The oracle recomputes from the raw
    //    orders table, so the whole encode→decode→join→agg chain is
    //    value-gated.
    "bv_enrich_join" -> ((s, d) => {
      val base = bvFixture(s, d)
      s.read.format("bvgraph").option("basename", base).option("splits", 8).load()
        .filter(col("outdegree") > 0) // custkey nodes; orderkey ids are sinks
        .select(col("id").cast("long").as("custkey"),
          col("outdegree").cast("long").as("n_orders"))
        .join(broadcast(customer(s, d).select(
          col("c_custkey").as("custkey"), col("c_nationkey"))), "custkey")
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n_customers"), sum(col("n_orders")).as("n_orders"))
        .orderBy("c_nationkey")
    }),

    // -- graph transposition THROUGH the engine's own sink: scan the BV
    //    fixture, swap edge endpoints, re-compress the reversed adjacency
    //    as a new sharded BVGraph (range shuffle + stream-encode), scan
    //    it back. The WebGraph ecosystem's standard `transpose` job,
    //    expressed as read -> explode -> swap -> sink -> read; the oracle
    //    is the swapped edge list, so BOTH directions of the engine's
    //    codec and the distributed sink are value-gated in one query.
    //    At 100 TB this is exactly one range shuffle on the new source
    //    id (the sort the BV format needs anyway) — same cost shape as
    //    the original compression job.
    "bv_transpose" -> ((s, d) => {
      val base = bvFixture(s, d)
      val tbase = base + "_T"
      if (!java.nio.file.Files.exists(java.nio.file.Paths.get(tbase + ".shards"))) {
        val g = s.read.format("bvgraph").option("basename", base).load()
        val n = g.agg(max(col("id"))).head().getInt(0) + 1
        g.select(col("id"), explode(col("successors")).as("dst"))
          .groupBy(col("dst"))
          .agg(sort_array(collect_list(col("id"))).as("successors"))
          .select(col("dst").as("id"), col("successors"))
          .withColumn("outdegree", size(col("successors")))
          .write.format("bvgraph").option("basename", tbase)
          .option("shards", 8).option("nodes", n).mode("overwrite").save()
      }
      s.read.format("bvgraph").option("basename", tbase).option("splits", 8).load()
        .select(col("id").cast("long").as("src"),
          explode(col("successors")).as("d"))
        .select(col("src"), col("d").cast("long").as("dst"))
        .orderBy("src", "dst")
    }),

    // -- induced subgraph + dense renumbering (WebGraph's Transform.map
    //    job): keep nodes with id % 3 == 0, relabel them densely by rank,
    //    keep edges whose BOTH endpoints survive, re-compress through the
    //    sink. The relabel is sort + zipWithIndex — the scalable dense
    //    rank (a global row_number window would single-partition the
    //    sort); edges then equi-join the rank table on each endpoint
    //    (two hash shuffles). The oracle exploits that the fixture's node
    //    space is dense, so rank(id) == id / 3 exactly.
    "bv_subgraph" -> ((s, d) => {
      val base = bvFixture(s, d)
      val gbase = base + "_G"
      if (!java.nio.file.Files.exists(java.nio.file.Paths.get(gbase + ".shards"))) {
        val g = s.read.format("bvgraph").option("basename", base).load()
        val kept = g.select(col("id")).filter(col("id") % 3 === 0)
        import s.implicits._
        val ranks = kept.orderBy("id").rdd.map(_.getInt(0))
          .zipWithIndex().toDF("old_id", "new_id")
        val nNew = ranks.count().toInt
        val e = g.select(col("id").as("src"), explode(col("successors")).as("dst"))
          .filter(col("src") % 3 === 0 && col("dst") % 3 === 0)
        e.join(ranks.select(col("old_id").as("src"), col("new_id").as("nsrc")), "src")
          .join(ranks.select(col("old_id").as("dst"), col("new_id").as("ndst")), "dst")
          .groupBy(col("nsrc"))
          .agg(sort_array(collect_list(col("ndst").cast("int"))).as("successors"))
          .select(col("nsrc").cast("int").as("id"), col("successors"))
          .withColumn("outdegree", size(col("successors")))
          .write.format("bvgraph").option("basename", gbase)
          .option("shards", 4).option("nodes", nNew).mode("overwrite").save()
      }
      s.read.format("bvgraph").option("basename", gbase).load()
        .select(col("id").cast("long").as("src"),
          explode(col("successors")).as("d"))
        .select(col("src"), col("d").cast("long").as("dst"))
        .orderBy("src", "dst")
    }),

    // -- symmetrization (the WebGraph-standard undirected closure: every
    //    published graph ships a `-sym` variant): edges ∪ swapped edges,
    //    dedup, re-compress through the sink, scan back. Self-loops from
    //    ids that are both endpoints survive dedup; the oracle is the
    //    UNION (set semantics) of both edge directions. Cost shape at
    //    100 TB: one distinct-shuffle + the sink's range shuffle.
    "bv_symmetrize" -> ((s, d) => {
      val base = bvFixture(s, d)
      val sbase = base + "_S"
      if (!java.nio.file.Files.exists(java.nio.file.Paths.get(sbase + ".shards"))) {
        val g = s.read.format("bvgraph").option("basename", base).load()
        val n = g.agg(max(col("id"))).head().getInt(0) + 1
        val e = g.select(col("id").as("src"), explode(col("successors")).as("dst"))
        e.unionByName(e.select(col("dst").as("src"), col("src").as("dst")))
          .distinct()
          .groupBy(col("src"))
          .agg(sort_array(collect_list(col("dst"))).as("successors"))
          .select(col("src").as("id"), col("successors"))
          .withColumn("outdegree", size(col("successors")))
          .write.format("bvgraph").option("basename", sbase)
          .option("shards", 8).option("nodes", n).mode("overwrite").save()
      }
      s.read.format("bvgraph").option("basename", sbase).option("splits", 8).load()
        .select(col("id").cast("long").as("src"),
          explode(col("successors")).as("d"))
        .select(col("src"), col("d").cast("long").as("dst"))
        .orderBy("src", "dst")
    }),

    // -- connected components via GraphX (the reference README's GraphX
    //    handoff, /root/reference/README.md:37-48, driving a real graph
    //    algorithm end-to-end). Node space: customers as-is, orders
    //    shifted past 1e6 so the two id ranges are provably disjoint —
    //    every component is then a customer star whose min-id label is
    //    the customer key, which is what makes the result exactly
    //    SQL-expressible for the oracle (GraphX still has to DISCOVER
    //    that structure; arbitrary-topology correctness is union-find
    //    cross-checked in GraphXInteropSpec). Pregel iterations are
    //    join-shuffles on the vertex partitioning; iteration count is
    //    graph diameter (2 here, ~log n in practice at 100 TB).
    "graph_cc" -> ((s, d) => {
      import org.apache.spark.graphx._
      import s.implicits._
      val off = 1000000L
      val edgeRdd = orders(s, d)
        .select(col("o_custkey").cast("long"), col("o_orderkey").cast("long"))
        .rdd.map(r => Edge(r.getLong(0), r.getLong(1) + off, ()))
        // fat partitions: superstep task overhead >> message work here
        .coalesce(math.max(2, s.sparkContext.defaultParallelism / 4))
      val g0 = Graph.fromEdges(edgeRdd, ())
      val res = g0.connectedComponents()
      // release the GraphX-internal caches with this query's pins (the
      // bfs query does the same; without it every cc run leaks its
      // input+result graph into storage until the next hard sweep)
      graft.Caches.defer(s) {
        res.unpersistVertices(blocking = false)
        res.edges.unpersist(blocking = false)
        g0.unpersistVertices(blocking = false)
        g0.edges.unpersist(blocking = false)
      }
      res.vertices.map { case (id, comp) => (id, comp) }
        .toDF("id", "component")
        .orderBy("id")
    }),

    // -- host-graph contraction (the WebGraph-ecosystem standard job: a
    //    page-level web graph collapsed to its host/domain level, cf. the
    //    reference's host-graph workloads): scan the BV fixture through
    //    the DSv2 source, contract both endpoints id -> id DIV 64 (the
    //    fixture's synthetic "host" bucketing — on a real crawl this is
    //    the node->host map), and aggregate parallel edges into weights.
    //    Scale shape: the contraction is a narrow projection inside the
    //    scan stage (no pre-shuffle), then ONE hash shuffle on the
    //    (src_host, dst_host) pair with partial map-side counting — the
    //    contracted graph is orders of magnitude smaller than the input,
    //    so the exchange carries host pairs, never page edges.
    "host_graph" -> ((s, d) => {
      val base = bvFixture(s, d)
      s.read.format("bvgraph").option("basename", base).option("splits", 8).load()
        .select(expr("CAST(id AS BIGINT) div 64").as("src_host"),
          explode(col("successors")).as("dd"))
        .select(col("src_host"), expr("CAST(dd AS BIGINT) div 64").as("dst_host"))
        .groupBy(col("src_host"), col("dst_host"))
        .agg(count(lit(1)).as("weight"))
        .orderBy("src_host", "dst_host")
    }),

    // -- top-k by indegree (TakeOrderedAndProject — scales to 100 TB where
    //    a global sort would not)
    "top_indegree" -> ((s, d) => {
      val e1 = orders(s, d).select(col("o_custkey").as("src"), col("o_orderkey").as("mid"))
      val e2 = lineitem(s, d).select(col("l_orderkey").as("mid"), col("l_partkey").as("dst"))
      e1.join(e2, "mid")
        .groupBy(col("dst"))
        .agg(count(lit(1)).as("indeg"))
        .orderBy(col("indeg").desc, col("dst"))
        .limit(10)
    }))

  val oracleSql: Map[String, String] = Map(
    "bv_enrich_join" ->
      """WITH a AS (SELECT o_custkey, COUNT(*) AS n FROM orders GROUP BY 1)
         SELECT c_nationkey, COUNT(*) AS n_customers,
           CAST(SUM(n) AS BIGINT) AS n_orders
         FROM a JOIN customer ON c_custkey = o_custkey
         GROUP BY 1 ORDER BY 1""",
    "bv_roundtrip" ->
      """SELECT o_custkey AS src, o_orderkey AS dst
         FROM orders ORDER BY src, dst""",
    "bv_degrees" ->
      """WITH ids AS (SELECT unnest(generate_series(0,
             (SELECT greatest(max(o_custkey), max(o_orderkey)) FROM orders))) AS i)
         SELECT ids.i AS id, COALESCE(c.cnt, 0) AS outdeg
         FROM ids
         LEFT JOIN (SELECT o_custkey, COUNT(*) AS cnt
                    FROM orders GROUP BY o_custkey) c ON ids.i = c.o_custkey
         ORDER BY id""",
    "bv_id_slice" ->
      """SELECT o_custkey AS src, o_orderkey AS dst FROM orders
         WHERE o_custkey >= 100 AND o_custkey < 600
         ORDER BY src, dst""",
    "adjacency_list" ->
      """SELECT o_custkey AS src,
         STRING_AGG(CAST(o_orderkey AS VARCHAR), ',' ORDER BY o_orderkey) AS successors,
         COUNT(*) AS outdegree
         FROM orders GROUP BY o_custkey ORDER BY src""",
    "edge_count" ->
      """SELECT COUNT(*) AS m_edges, COUNT(DISTINCT o_custkey) AS n_src,
         COUNT(DISTINCT o_orderkey) AS n_dst FROM orders""",
    "outdegree_dist" ->
      """SELECT deg, COUNT(*) AS n_nodes FROM
         (SELECT o_custkey, COUNT(*) AS deg FROM orders GROUP BY o_custkey) t
         GROUP BY deg ORDER BY deg""",
    "host_graph" ->
      """SELECT o_custkey // 64 AS src_host, o_orderkey // 64 AS dst_host,
         COUNT(*) AS weight
         FROM orders GROUP BY 1, 2 ORDER BY 1, 2""",
    "top_indegree" ->
      """SELECT l_partkey AS dst, COUNT(*) AS indeg
         FROM orders JOIN lineitem ON o_orderkey = l_orderkey
         GROUP BY l_partkey ORDER BY indeg DESC, dst LIMIT 10""",
    "graph_cc" ->
      """SELECT o_custkey AS id, o_custkey AS component
         FROM orders GROUP BY o_custkey
         UNION ALL
         SELECT o_orderkey + 1000000 AS id, o_custkey AS component FROM orders
         ORDER BY id""",
    "bv_transpose" ->
      """SELECT o_orderkey AS src, o_custkey AS dst
         FROM orders ORDER BY src, dst""",
    "bv_symmetrize" ->
      """SELECT src, dst FROM (
           SELECT o_custkey AS src, o_orderkey AS dst FROM orders
           UNION
           SELECT o_orderkey AS src, o_custkey AS dst FROM orders)
         ORDER BY src, dst""",
    "bv_subgraph" ->
      """SELECT o_custkey // 3 AS src, o_orderkey // 3 AS dst
         FROM orders
         WHERE o_custkey % 3 = 0 AND o_orderkey % 3 = 0
         ORDER BY src, dst""")
}
