"""Connected components over dup-pair edges — iterative min-label
propagation in DataFrame ops (no GraphFrames dependency).

[EXT] the "iterative algorithm" representative of the build brief: turning
pairwise near-dup evidence (MinHash-LSH / exact digests) into dedup
CLUSTERS requires transitive closure, which no single SQL query expresses
— so this registers with the driver's rows-only check and is verified in
tests against a union-find oracle on the collected edges.

Algorithm (standard large-graph CC, e.g. Kiveris et al. "Connected
Components in MapReduce and Beyond"):
  label(v) ← v
  repeat: label(v) ← min(label(v), min over neighbors' labels)
  until no label changes.
Each round is one shuffle (edges ⨝ labels, then min-groupBy); rounds ≤
graph diameter (dedup clusters are shallow — a handful of rounds). Lineage
is cut per round with localCheckpoint so the plan doesn't grow
exponentially; a cluster deployment would use checkpoint/persist.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame, max_iter: int = 20
) -> DataFrame:
    """edges(src, dst) → (id, component) where component = min id reachable.

    Vertices appearing in no edge are absent — union the full vertex set
    afterwards if isolated vertices need rows (the dedup query does)."""
    src, dst = edges.columns[:2]
    both = edges.select(
        F.col(src).alias("a"), F.col(dst).alias("b")
    ).unionByName(
        edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
    )
    both = both.distinct().localCheckpoint()
    labels = (
        both.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        neighbor_min = (
            both.join(labels, both.b == labels.id)
            .groupBy("a")
            .agg(F.min("component").alias("nmin"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.id == neighbor_min.a, "left")
            .select(
                "id",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("nmin"), F.col("component")),
                ).alias("component"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def dedup_clusters(corpus: DataFrame, pairs: DataFrame) -> DataFrame:
    """(doc_id, component, cluster_size): near-dup clusters from pairwise
    evidence; singleton docs are their own component."""
    cc = connected_components(pairs.select("doc_a", "doc_b"))
    out = (
        corpus.select("doc_id")
        .join(cc, corpus.doc_id == cc.id, "left")
        .select(
            "doc_id",
            F.coalesce("component", "doc_id").alias("component"),
        )
    )
    sizes = out.groupBy("component").agg(
        F.count("*").alias("cluster_size")
    )
    return out.join(sizes, "component").select(
        "doc_id", "component", "cluster_size"
    )


def keep_best_per_cluster(
    clusters: DataFrame, quality: DataFrame
) -> DataFrame:
    """(component, kept_doc_id, kept_quality, cluster_size, n_dropped):
    the canonical-document selection a production pipeline runs AFTER
    clustering — keep the highest-quality member of each near-dup cluster
    (ties broken by lowest doc_id for determinism), drop the rest.

    Scale shape: quality is a per-doc column expression (no shuffle), the
    clusters frame is already keyed by doc_id, and the argmax is one
    window over `component` — clusters are shallow (bounded by dup
    multiplicity), so no partition is large and the single extra shuffle
    is on the component key."""
    from pyspark.sql.window import Window

    scored = clusters.join(quality.select("doc_id", "quality"), "doc_id")
    w = Window.partitionBy("component").orderBy(
        F.col("quality").desc(), F.col("doc_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "component",
            F.col("doc_id").alias("kept_doc_id"),
            F.col("quality").alias("kept_quality"),
            "cluster_size",
            (F.col("cluster_size") - 1).alias("n_dropped"),
        )
    )


def sql_keep_best_per_cluster(clusters_sql: str, quality_sql: str) -> str:
    return f"""
    WITH clusters AS ({clusters_sql}),
    quality AS ({quality_sql}),
    ranked AS (
      SELECT c.component, c.doc_id, q.quality, c.cluster_size,
             row_number() OVER (PARTITION BY c.component
                                ORDER BY q.quality DESC, c.doc_id) AS rn
      FROM clusters c JOIN quality q USING (doc_id)
    )
    SELECT component, doc_id AS kept_doc_id, quality AS kept_quality,
           cluster_size, cluster_size - 1 AS n_dropped
    FROM ranked WHERE rn = 1
    """


def sql_dedup_clusters(corpus_sql: str, pairs_sql: str) -> str:
    """DuckDB oracle twin: min-label transitive closure via WITH RECURSIVE.

    ``walk(id, reached)`` enumerates every vertex reachable from ``id``
    over the bidirected edge list; UNION (set) semantics make the
    recursion terminate, and ``min(reached)`` is exactly the min-label
    fixpoint the iterative Spark implementation converges to. O(cluster²)
    per cluster — fine as a small-SF oracle; the Spark path is the scale
    implementation."""
    return f"""
    WITH RECURSIVE
    corpus AS ({corpus_sql}),
    pairs AS ({pairs_sql}),
    bidir AS (
      SELECT doc_a AS a, doc_b AS b FROM pairs
      UNION
      SELECT doc_b AS a, doc_a AS b FROM pairs
    ),
    walk(id, reached) AS (
      SELECT a, a FROM (SELECT DISTINCT a FROM bidir)
      UNION
      SELECT w.id, e.b FROM walk w JOIN bidir e ON w.reached = e.a
    ),
    cc AS (SELECT id, min(reached) AS component FROM walk GROUP BY id),
    labeled AS (
      SELECT c.doc_id, coalesce(cc.component, c.doc_id) AS component
      FROM corpus c LEFT JOIN cc ON c.doc_id = cc.id
    )
    SELECT doc_id, component,
           count(*) OVER (PARTITION BY component) AS cluster_size
    FROM labeled
    """


# --------------------------------------------------------------------------
# PageRank (fixed-iteration, unrolled) — importance propagation over the
# near-dup graph; the canonical-doc selector's weighted cousin (a doc
# duplicated by many others accumulates rank). Two Lloyd-style unrolled
# iterations keep the whole dataflow expressible as ONE SQL statement, so
# the oracle hash-gates it exactly (the same trick as sim_kmeans_refine;
# dedup_components stays the open-ended-iteration representative).
#
# Per iteration: contributions = edges ⨝ ranks (join key = src), then a
# groupBy(dst) sum — one shuffle each, both keyed uniformly on doc ids;
# ranks and degrees are O(nodes) frames, never edge-payload-wide. The
# damping base needs N (node count): carried as a broadcast one-row
# frame, NOT a driver collect. Dangling-node mass is NOT redistributed
# (the standard simplification; both engines compute the same quantity).
# Cross-engine determinism: in-neighbor sums are rounded to 9 decimals
# each iteration (in-degrees are small; rounding absorbs any
# accumulation-order noise), outputs to 6.
# --------------------------------------------------------------------------

PAGERANK_DAMPING = 0.85
PAGERANK_ITERATIONS = 2


def pagerank(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """nodes(id), edges(src, dst) directed → (id, pagerank) after
    PAGERANK_ITERATIONS unrolled rounds from a uniform start."""
    d = PAGERANK_DAMPING
    n1 = nodes.agg(F.count("*").alias("_n"))
    outdeg = edges.groupBy("src").agg(F.count("*").alias("_deg"))
    ranks = nodes.crossJoin(F.broadcast(n1)).select(
        "id", (F.lit(1.0) / F.col("_n")).alias("pr"), "_n"
    )
    for _ in range(PAGERANK_ITERATIONS):
        contrib = (
            edges.join(outdeg, on="src")
            .join(ranks.select(F.col("id").alias("src"), "pr"), on="src")
            .groupBy("dst")
            .agg(F.round(F.sum(F.col("pr") / F.col("_deg")), 9).alias("_c"))
        )
        ranks = (
            ranks.join(contrib, on=ranks["id"] == contrib["dst"], how="left")
            .select(
                "id",
                (
                    (F.lit(1.0) - d) / F.col("_n")
                    + d * F.coalesce(F.col("_c"), F.lit(0.0))
                ).alias("pr"),
                "_n",
            )
            # barrier between rounds: without it the iteration-2 plan
            # re-executes iteration 1 (the r02/r03 bench showed 2× wall
            # variance from exactly that); same pattern as
            # connected_components and dedup_minhash_lsh
            .localCheckpoint()
        )
    return ranks.select("id", F.round("pr", 6).alias("pagerank"))


def sql_pagerank(nodes_sql: str, edges_sql: str) -> str:
    """The same two unrolled iterations as one DuckDB statement."""
    d = PAGERANK_DAMPING
    it = """
    r{next} AS (
      SELECT n.id,
             {base} / nn.n + {d} * coalesce(c.contrib, 0) AS pr
      FROM nodes n CROSS JOIN nn
      LEFT JOIN (
        SELECT e.dst AS id, round(sum(r{cur}.pr / deg.deg), 9) AS contrib
        FROM edges e
        JOIN deg ON e.src = deg.src
        JOIN r{cur} ON e.src = r{cur}.id
        GROUP BY e.dst
      ) c USING (id)
    )"""
    its = ",".join(
        it.format(cur=i, next=i + 1, d=d, base=repr(1.0 - d))
        for i in range(PAGERANK_ITERATIONS)
    )
    return f"""
    WITH nodes AS ({nodes_sql}),
    edges AS ({edges_sql}),
    nn AS (SELECT count(*) AS n FROM nodes),
    deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
    r0 AS (SELECT id, 1.0 / nn.n AS pr FROM nodes CROSS JOIN nn),
    {its}
    SELECT id, round(pr, 6) AS pagerank
    FROM r{PAGERANK_ITERATIONS}
    """


# --------------------------------------------------------------------------
# Triangle counting — per-node triangle participation over an undirected
# graph. The classic distributed formulation (node-ordered edge
# orientation, e.g. Suri & Vassilvitskii WWW'11 "Counting Triangles and
# the Curse of the Last Reducer"): orient every edge small-id → large-id,
# join wedges on the shared middle vertex, close them against the edge
# set — each triangle (a<b<c) is produced exactly once, so no /3 or /6
# correction and no duplicate pressure. Both joins are equi-joins (wedge
# join keyed on the mid vertex, closing join on the (a,c) pair); at 100 TB
# scale the production refinement is DEGREE-ordered orientation (the
# paper's fix for the "last reducer" hot vertex) — id-ordering is kept
# here because the oracle must replay the exact same orientation and the
# LSH dup graph this feeds has bounded degree by construction.
# --------------------------------------------------------------------------


def triangle_counts(edges: DataFrame) -> DataFrame:
    """edges(src, dst) undirected (either orientation, self-loops
    ignored) → (id, n_triangles) for every node in ≥1 triangle."""
    src, dst = edges.columns[:2]
    # canonical orientation a<b, deduped (an undirected input may carry
    # both directions of the same edge)
    e = (
        edges.filter(F.col(src) != F.col(dst))
        .select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .distinct()
        # consumed three times (both wedge legs + the closing probe):
        # materialize once
        .localCheckpoint(eager=False)
    )
    wedges = (
        e.alias("x")
        .join(e.alias("y"), F.col("x.b") == F.col("y.a"))
        .select(
            F.col("x.a").alias("a"),
            F.col("x.b").alias("b"),
            F.col("y.b").alias("c"),
        )
        .alias("w")
    )
    triangles = wedges.join(
        e.alias("z"),
        (F.col("w.a") == F.col("z.a")) & (F.col("w.c") == F.col("z.b")),
        "leftsemi",
    )
    return (
        triangles.select(F.explode(F.array("a", "b", "c")).alias("id"))
        .groupBy("id")
        .agg(F.count("*").alias("n_triangles"))
    )


def sql_triangle_counts(edges_sql: str) -> str:
    """DuckDB twin: identical orientation, wedge join and closure."""
    return f"""
    WITH raw AS ({edges_sql}),
    e AS (
      SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
      FROM raw WHERE src <> dst
    ),
    tri AS (
      SELECT x.a, x.b, y.b AS c
      FROM e x
      JOIN e y ON x.b = y.a
      WHERE EXISTS (SELECT 1 FROM e z WHERE z.a = x.a AND z.b = y.b)
    )
    SELECT id, CAST(count(*) AS BIGINT) AS n_triangles
    FROM (
      SELECT a AS id FROM tri
      UNION ALL SELECT b FROM tri
      UNION ALL SELECT c FROM tri
    )
    GROUP BY id
    """


# --------------------------------------------------------------------------
# k-core decomposition (fixed-round peeling) — the degeneracy filter
# used on dup/citation graphs to isolate densely-duplicated cores from
# incidental LSH chains. Classic iterative peeling: repeatedly delete
# every node whose current degree is below K, until no deletion happens
# (here: a FIXED number of unrolled rounds, so the oracle replays the
# identical computation; the dup graphs this feeds converge in 2-3
# rounds because chain tails are short).
#
# Scale shape per round: one degree aggregation (map-side combine on the
# node key) + two semi-joins filtering the edge list against the
# survivor set — all key-partitioned equi-joins, no broadcast of
# anything fact-sized, with a localCheckpoint barrier per round exactly
# like pagerank/connected_components (without it round r re-executes
# rounds 1..r-1).
# --------------------------------------------------------------------------

KCORE_K = 2
KCORE_ROUNDS = 3


def kcore(edges: DataFrame, k: int = KCORE_K, rounds: int = KCORE_ROUNDS) -> DataFrame:
    """edges(src, dst) undirected (either orientation, self-loops
    ignored) → (id, degree): nodes surviving ``rounds`` of < k peeling,
    with their degree in the surviving subgraph."""
    src, dst = edges.columns[:2]
    e = (
        edges.filter(F.col(src) != F.col(dst))
        .select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    sym = e.select(F.col("a").alias("id"), F.col("b").alias("nb")).unionByName(
        e.select(F.col("b").alias("id"), F.col("a").alias("nb"))
    )
    for _ in range(rounds):
        deg = sym.groupBy("id").agg(F.count("*").alias("degree"))
        keep = deg.filter(F.col("degree") >= k).select("id")
        sym = (
            sym.join(keep, "id", "leftsemi")
            .join(keep.select(F.col("id").alias("nb")), "nb", "leftsemi")
            .localCheckpoint(eager=False)
        )
    return sym.groupBy("id").agg(F.count("*").alias("degree"))


def sql_kcore(
    edges_sql: str, k: int = KCORE_K, rounds: int = KCORE_ROUNDS
) -> str:
    """DuckDB twin: the same fixed-round peeling as chained CTEs."""
    ctes = [
        f"""raw AS ({edges_sql}),
    e AS (
      SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
      FROM raw WHERE src <> dst
    ),
    sym0 AS (
      SELECT a AS id, b AS nb FROM e
      UNION ALL
      SELECT b AS id, a AS nb FROM e
    )"""
    ]
    for r in range(rounds):
        ctes.append(
            f"""keep{r} AS (
      SELECT id FROM sym{r} GROUP BY id HAVING count(*) >= {k}
    ),
    sym{r + 1} AS (
      SELECT s.id, s.nb FROM sym{r} s
      WHERE s.id IN (SELECT id FROM keep{r})
        AND s.nb IN (SELECT id FROM keep{r})
    )"""
        )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"""
    SELECT id, count(*) AS degree FROM sym{rounds} GROUP BY id
    """
    )


# --------------------------------------------------------------------------
# Multi-source BFS depth (unrolled) — "how far is every document from a
# seed set" over the dup graph: distance-to-nearest-seed labels, the
# primitive behind influence/contamination radius queries (e.g. every
# doc within 2 hops of a known-bad cluster). Classic synchronous
# frontier relaxation, unrolled BFS_ROUNDS times so the oracle replays
# it exactly: dist_{r+1}(v) = min(dist_r(v), min over neighbors u of
# dist_r(u) + 1).
#
# Scale shape per round: one join of the CURRENT distance frame against
# the symmetric edge list (keyed on the node — equi-join, unskewed by
# LSH-bucket construction), one min-aggregation with map-side combine,
# and a localCheckpoint barrier (the components/pagerank lesson). Nodes
# never reached in BFS_ROUNDS hops are omitted (unbounded distance).
# --------------------------------------------------------------------------

BFS_ROUNDS = 2


def bfs_depth(
    edges: DataFrame, seeds: DataFrame, rounds: int = BFS_ROUNDS
) -> DataFrame:
    """edges(src, dst) undirected, seeds(id) → (id, depth): min hops
    from any seed, for every node within ``rounds`` hops."""
    src, dst = edges.columns[:2]
    e = (
        edges.filter(F.col(src) != F.col(dst))
        .select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .distinct()
    )
    sym = e.select(F.col("a").alias("id"), F.col("b").alias("nb")).unionByName(
        e.select(F.col("b").alias("id"), F.col("a").alias("nb"))
    ).localCheckpoint(eager=False)
    dist = seeds.select("id", F.lit(0).alias("depth"))
    for _ in range(rounds):
        relaxed = (
            sym.join(
                dist.select(F.col("id").alias("nb"), "depth"), "nb"
            )
            .select("id", (F.col("depth") + 1).alias("depth"))
        )
        dist = (
            dist.unionByName(relaxed)
            .groupBy("id")
            .agg(F.min("depth").alias("depth"))
            .localCheckpoint(eager=False)
        )
    return dist


def sql_bfs_depth(
    edges_sql: str, seeds_sql: str, rounds: int = BFS_ROUNDS
) -> str:
    """DuckDB twin: identical unrolled relaxation as chained CTEs."""
    ctes = [
        f"""raw AS ({edges_sql}),
    e AS (
      SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
      FROM raw WHERE src <> dst
    ),
    sym AS (
      SELECT a AS id, b AS nb FROM e
      UNION ALL
      SELECT b AS id, a AS nb FROM e
    ),
    dist0 AS (SELECT id, 0 AS depth FROM ({seeds_sql}))"""
    ]
    for r in range(rounds):
        ctes.append(
            f"""dist{r + 1} AS (
      SELECT id, min(depth) AS depth FROM (
        SELECT id, depth FROM dist{r}
        UNION ALL
        SELECT s.id, d.depth + 1 AS depth
        FROM sym s JOIN dist{r} d ON s.nb = d.id
      ) GROUP BY id
    )"""
        )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"""
    SELECT id, CAST(depth AS INTEGER) AS depth FROM dist{rounds}
    """
    )


# --------------------------------------------------------------------------
# Degree-distribution profile — the first diagnostic anyone runs on a
# candidate-pair graph: n_nodes per degree, plus each degree's share.
# A near-dup graph whose distribution has a heavy tail (a few nodes
# with hundreds of edges) signals boilerplate hubs that will blow up
# clustering; the profile is how you catch that BEFORE running the
# iterative ops. One degree rollup + one histogram rollup, both
# map-side combining; totals broadcast.
# --------------------------------------------------------------------------


def degree_distribution(edges: DataFrame) -> DataFrame:
    """(degree, n_nodes, node_share): histogram of undirected node
    degrees over an (src, dst) edge list."""
    und = edges.select(F.col("src").alias("node")).unionAll(
        edges.select(F.col("dst").alias("node"))
    )
    degs = und.groupBy("node").agg(F.count("*").alias("degree"))
    hist = degs.groupBy("degree").agg(F.count("*").alias("n_nodes"))
    tot = hist.agg(F.sum("n_nodes").alias("_t"))
    return (
        hist.crossJoin(F.broadcast(tot))
        .select(
            "degree",
            "n_nodes",
            F.round(F.col("n_nodes") / F.col("_t"), 6).alias(
                "node_share"
            ),
        )
    )


def sql_degree_distribution(edges_sql: str) -> str:
    return f"""
    WITH und AS (
      SELECT src AS node FROM ({edges_sql})
      UNION ALL SELECT dst AS node FROM ({edges_sql})
    ),
    degs AS (SELECT node, count(*) AS degree FROM und GROUP BY 1),
    hist AS (SELECT degree, count(*) AS n_nodes FROM degs GROUP BY 1),
    tot AS (SELECT sum(n_nodes) AS t FROM hist)
    SELECT degree, n_nodes,
           round(CAST(n_nodes AS DOUBLE) / t, 6) AS node_share
    FROM hist CROSS JOIN tot
    """


# --------------------------------------------------------------------------
# Degree assortativity — Pearson correlation of endpoint degrees over
# the edge list (Newman 2002): positive = hubs attach to hubs (social-
# graph shape), negative = hubs attach to leaves (star/boilerplate
# shape — for a near-dup graph, one template matched by many one-off
# docs). Completes the graph-profile family (degree histogram →
# assortativity → modularity). Every sum in the closed form is a sum
# of INTEGER degree products over edges — exact, order-independent,
# no decimal scaffolding needed; only the final correlation divides
# doubles.
# --------------------------------------------------------------------------


def degree_assortativity(edges: DataFrame) -> DataFrame:
    """(n_edges, assortativity): Newman's degree correlation over the
    undirected edge list, NULL when degenerate (all degrees equal)."""
    und = edges.select("src", "dst").unionAll(
        edges.select(
            F.col("dst").alias("src"), F.col("src").alias("dst")
        )
    )
    degs = und.groupBy("src").agg(F.count("*").alias("deg"))
    # each undirected edge contributes BOTH orientations — the standard
    # symmetrized form of the coefficient
    pairs = (
        und.join(degs, on="src")
        .withColumnRenamed("deg", "da")
        .join(
            degs.select(
                F.col("src").alias("dst"), F.col("deg").alias("db")
            ),
            on="dst",
        )
    )
    sums = pairs.agg(
        F.count("*").alias("m2"),
        F.sum(F.col("da") * F.col("db")).alias("sab"),
        F.sum(F.col("da")).alias("sa"),
        F.sum(F.col("db")).alias("sb"),
        F.sum(F.col("da") * F.col("da")).alias("saa"),
        F.sum(F.col("db") * F.col("db")).alias("sbb"),
    )
    m2, sab, sa, sb, saa, sbb = (
        F.col(c).cast("double")
        for c in ("m2", "sab", "sa", "sb", "saa", "sbb")
    )
    num = m2 * sab - sa * sb
    den = F.sqrt(m2 * saa - sa * sa) * F.sqrt(m2 * sbb - sb * sb)
    return sums.select(
        (F.col("m2") / 2).cast("bigint").alias("n_edges"),
        F.round(F.try_divide(num, den), 6).alias("assortativity"),
    )


def sql_degree_assortativity(edges_sql: str) -> str:
    return f"""
    WITH und AS (
      SELECT src, dst FROM ({edges_sql})
      UNION ALL SELECT dst AS src, src AS dst FROM ({edges_sql})
    ),
    degs AS (SELECT src AS node, count(*) AS deg FROM und GROUP BY 1),
    pairs AS (
      SELECT a.deg AS da, b.deg AS db
      FROM und
      JOIN degs a ON und.src = a.node
      JOIN degs b ON und.dst = b.node
    ),
    sums AS (
      SELECT count(*) AS m2,
             sum(da * db) AS sab, sum(da) AS sa, sum(db) AS sb,
             sum(da * da) AS saa, sum(db * db) AS sbb
      FROM pairs
    )
    SELECT CAST(m2 / 2 AS BIGINT) AS n_edges,
           round((m2 * CAST(sab AS DOUBLE)
                  - CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE))
                 / nullif(sqrt(m2 * CAST(saa AS DOUBLE)
                               - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE))
                          * sqrt(m2 * CAST(sbb AS DOUBLE)
                                 - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE)),
                          0), 6) AS assortativity
    FROM sums
    """


# --------------------------------------------------------------------------
# Local clustering coefficient — C_v = 2·T_v / (d_v·(d_v−1)) over the
# canonical undirected edge set: how close each node's neighborhood is
# to a clique. For a near-dup graph, C ≈ 1 neighborhoods are true
# multi-way duplicate groups (every copy matches every copy); low C
# with high degree is the transitive-chain / hub signature that hard
# dedup would over-merge — the per-node refinement of what
# graph_kcore and graph_assortativity say globally. Triangle counts
# and degrees are integer-exact; one division at the end.
# --------------------------------------------------------------------------


def clustering_coefficients(edges: DataFrame) -> DataFrame:
    """(id, degree, n_triangles, clustering_coeff) for every node of
    degree ≥ 2 (the coefficient is undefined below that)."""
    src, dst = edges.columns[:2]
    e = (
        edges.filter(F.col(src) != F.col(dst))
        .select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .distinct()
    )
    degs = (
        e.select(F.col("a").alias("id"))
        .unionAll(e.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("degree"))
    )
    tri = triangle_counts(edges)
    return (
        degs.filter(F.col("degree") >= 2)
        .join(tri, on="id", how="left")
        .select(
            "id",
            "degree",
            F.coalesce("n_triangles", F.lit(0))
            .cast("bigint")
            .alias("n_triangles"),
            F.round(
                F.lit(2) * F.coalesce("n_triangles", F.lit(0))
                / (F.col("degree") * (F.col("degree") - 1)),
                6,
            ).alias("clustering_coeff"),
        )
    )


def sql_clustering_coefficients(edges_sql: str) -> str:
    tri = sql_triangle_counts(edges_sql)
    return f"""
    WITH raw AS ({edges_sql}),
    e AS (
      SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
      FROM raw WHERE src <> dst
    ),
    degs AS (
      SELECT id, count(*) AS degree FROM (
        SELECT a AS id FROM e UNION ALL SELECT b AS id FROM e
      ) GROUP BY 1
    ),
    tri AS ({tri})
    SELECT d.id, d.degree,
           CAST(coalesce(t.n_triangles, 0) AS BIGINT) AS n_triangles,
           round(2.0 * coalesce(t.n_triangles, 0)
                 / (d.degree * (d.degree - 1)), 6) AS clustering_coeff
    FROM degs d LEFT JOIN tri t USING (id)
    WHERE d.degree >= 2
    """


# --------------------------------------------------------------------------
# Two-hop candidate expansion — friend-of-friend pairs over the near-dup
# graph: pairs at distance EXACTLY 2 (share >= 1 common neighbor, no
# direct edge), with the common-neighbor count as evidence weight. The
# standard candidate-recovery pass after LSH: true near-dups that missed
# every band often share a neighbor that caught both.
#
# 100 TB shape: the symmetrized edge frame self-joins keyed on the MID
# vertex — one hash shuffle on a vertex id; per-vertex fan-out is
# degree², so a hub vertex of degree d contributes d² pairs. The
# ``degree_cap`` guard (VERDICT r6 item 4) excludes mid vertices above
# the cap from path counting BEFORE the self-join — the standard
# common-neighbor practice (a vertex adjacent to everything carries no
# similarity evidence anyway), and the reason this operator can be
# pointed at a raw web graph without a quadratic blowup. The default
# cap (64) sits far above the LSH-bounded near-dup testbed's observed
# max degree (3 at sf0.01 and sf0.1), so results there are unchanged.
# The direct-edge exclusion is a broadcast-or-shuffle ANTI join on the
# canonical pair key, never a cartesian.
# --------------------------------------------------------------------------

TWO_HOP_DEGREE_CAP = 64


def _symmetrized(edges: DataFrame) -> DataFrame:
    """Bidirected distinct edge frame (a, b), checkpointed: the shared
    input of the 2-hop self-join, the degree screen, and the neighbor-
    Jaccard scorer — built (and its upstream edge pipeline evaluated)
    exactly once per operator invocation."""
    return (
        edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        .unionByName(
            edges.select(F.col("dst").alias("a"), F.col("src").alias("b"))
        )
        .distinct()
        .localCheckpoint()
    )


def two_hop_candidates(
    edges: DataFrame, degree_cap: int = TWO_HOP_DEGREE_CAP
) -> DataFrame:
    """edges(src, dst) → (doc_a, doc_b, n_paths): canonical pairs at
    distance exactly 2 and their common-neighbor count, skipping paths
    through mid vertices of degree > ``degree_cap``."""
    return _two_hop_from_sym(_symmetrized(edges), degree_cap)


def _capped_sym(sym: DataFrame, degree_cap: int) -> DataFrame:
    """Edges (a, b) of the bidirected frame whose *b* endpoint has
    degree <= ``degree_cap`` — i.e. for each vertex a, its low-degree
    (non-hub) neighbors. The mid-vertex degree screen of the 2-hop
    self-join AND the degree frame of the neighbor-Jaccard scorer are
    both computed from this one frame so numerator and denominator
    count the same neighbor sets."""
    # |V|-row rollup semi-joined back on the vertex id (hash-keyed —
    # deliberately NOT broadcast: the degree frame is linear in |V|);
    # the self-join then never sees a hub's d² fan-out
    low_deg = (
        sym.groupBy("a")
        .agg(F.count("*").alias("_deg"))
        .filter(F.col("_deg") <= degree_cap)
        .select(F.col("a").alias("_mid"))
    )
    return sym.join(low_deg, sym.b == F.col("_mid"), "left_semi")


def _two_hop_from_sym(
    sym: DataFrame, degree_cap: int = TWO_HOP_DEGREE_CAP
) -> DataFrame:
    # The cap must constrain the MID vertex only. mid = l.b = r.a, so
    # filtering the l side alone enforces it; the r side stays the full
    # symmetrized frame (filtering r on its b endpoint would instead
    # drop pairs whose larger-id ENDPOINT is a hub — the round-7 bug).
    capped = _capped_sym(sym, degree_cap)
    two = (
        capped.alias("l")
        .join(sym.alias("r"), F.col("l.b") == F.col("r.a"))
        .select(F.col("l.a").alias("x"), F.col("r.b").alias("y"))
        .filter(F.col("x") < F.col("y"))
        .groupBy("x", "y")
        .agg(F.count("*").alias("n_paths"))
    )
    direct = sym.filter(F.col("a") < F.col("b"))
    return (
        two.join(
            direct,
            (two.x == direct.a) & (two.y == direct.b),
            "left_anti",
        )
        .select(
            F.col("x").alias("doc_a"),
            F.col("y").alias("doc_b"),
            F.col("n_paths").cast("bigint").alias("n_paths"),
        )
    )


def sql_two_hop_candidates(
    edges_sql: str, degree_cap: int = TWO_HOP_DEGREE_CAP
) -> str:
    # Mirrors the Spark plan's mid-vertex degree cap exactly (l side
    # screened to low-degree b endpoints, r side unfiltered) so oracle
    # and engine compute the same quantity on hub-bearing graphs too.
    return f"""
    WITH sym AS (
      SELECT src AS a, dst AS b FROM ({edges_sql})
      UNION
      SELECT dst AS a, src AS b FROM ({edges_sql})
    ),
    low_deg AS (
      SELECT a AS mid FROM sym GROUP BY 1 HAVING count(*) <= {degree_cap}
    ),
    capped AS (
      SELECT s.a, s.b FROM sym s
      WHERE s.b IN (SELECT mid FROM low_deg)
    ),
    two AS (
      SELECT l.a AS x, r.b AS y, count(*) AS n_paths
      FROM capped l JOIN sym r ON l.b = r.a
      WHERE l.a < r.b
      GROUP BY 1, 2
    )
    SELECT x AS doc_a, y AS doc_b, CAST(n_paths AS BIGINT) AS n_paths
    FROM two
    WHERE NOT EXISTS (
      SELECT 1 FROM sym s WHERE s.a = two.x AND s.b = two.y
    )
    """


# --------------------------------------------------------------------------
# Neighbor-Jaccard link prediction — the scoring pass on top of the
# 2-hop candidates: for each distance-2 pair, |N(a) ∩ N(b)| is exactly
# the 2-hop path count, so jaccard = common / (deg(a)+deg(b)-common)
# (Liben-Nowell & Kleinberg 2003). High-Jaccard non-edges are the
# "should be duplicates" recall candidates LSH banding missed.
#
# 100 TB shape: reuses two_hop_candidates' mid-vertex equi-join (with
# its degree cap); the |V|-row degree frame attaches via two hash
# equi-joins on the endpoint ids — deliberately NOT broadcast (linear
# in |V|). Nothing here is quadratic beyond the capped 2-hop frame.
# --------------------------------------------------------------------------


def jaccard_neighbors(
    edges: DataFrame, degree_cap: int = TWO_HOP_DEGREE_CAP
) -> DataFrame:
    """(doc_a, doc_b, n_common, jaccard): Jaccard of the *low-degree*
    (<= ``degree_cap``) neighbor sets for every distance-2 pair. Both
    n_common (paths through low-degree mids) and the degrees are
    computed over the same capped edge frame, so the ratio is a
    self-consistent "Jaccard over non-hub neighbors" — on a graph with
    no vertex above the cap it equals the classic neighbor Jaccard."""
    sym = _symmetrized(edges)  # one checkpoint feeds 2-hop AND degrees
    capped = _capped_sym(sym, degree_cap)
    two = _two_hop_from_sym(sym, degree_cap)
    deg = capped.groupBy("a").agg(F.count("*").alias("_deg"))
    return (
        two.join(
            deg.select(F.col("a").alias("doc_a"), F.col("_deg").alias("_da")),
            "doc_a",
        )
        .join(
            deg.select(F.col("a").alias("doc_b"), F.col("_deg").alias("_db")),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            F.col("n_paths").alias("n_common"),
            F.round(
                F.col("n_paths")
                / (F.col("_da") + F.col("_db") - F.col("n_paths")),
                6,
            ).alias("jaccard"),
        )
    )


def sql_jaccard_neighbors(
    edges_sql: str, degree_cap: int = TWO_HOP_DEGREE_CAP
) -> str:
    two = sql_two_hop_candidates(edges_sql, degree_cap)
    # degrees over the SAME capped frame the path count uses (see
    # jaccard_neighbors): count only neighbors of degree <= cap
    return f"""
    WITH two AS ({two}),
    sym AS (
      SELECT src AS a, dst AS b FROM ({edges_sql})
      UNION
      SELECT dst AS a, src AS b FROM ({edges_sql})
    ),
    low_deg AS (
      SELECT a AS mid FROM sym GROUP BY 1 HAVING count(*) <= {degree_cap}
    ),
    deg AS (
      SELECT a, count(*) AS d FROM sym
      WHERE b IN (SELECT mid FROM low_deg)
      GROUP BY 1
    )
    SELECT t.doc_a, t.doc_b, t.n_paths AS n_common,
           round(CAST(t.n_paths AS DOUBLE)
                 / (da.d + db.d - t.n_paths), 6) AS jaccard
    FROM two t
    JOIN deg da ON da.a = t.doc_a
    JOIN deg db ON db.a = t.doc_b
    """
