"""Graph analytics over similarity graphs: PageRank centrality.

In an LLM-data pipeline, a similarity graph (docs linked by near-dup /
semantic-similarity edges) ranks documents by how "central" they are to
a content cluster — high-PageRank nodes are canonical versions worth
keeping, low-rank satellites are candidates for down-sampling. Same
iterative shape as connected components (operators/dedup.dup_clusters):
per round one join on the edge set + one aggregation, lineage truncated
with ``localCheckpoint``, O(iterations) rounds with only a scalar (the
iteration counter) on the driver.

Scale: state per round is one (node, rank) row per node and the
pairs-sized edge list, both hash-partitioned on node id — no full-corpus
shuffle beyond those keyed exchanges, no driver-side data. Rank values
are float-iterative and engine-specific, so the registered query is
rows-only; exactness is covered by a numpy fixed-point cross-check in
tests/test_analytics.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.quantize import q as _q
from ..registry import load, register


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    n_iters: int = 15,
    undirected: bool = True,
) -> DataFrame:
    """PageRank over an edge list → (node, pr), Σpr = 1.

    ``undirected=True`` mirrors every edge. Dangling nodes (no out-edges)
    redistribute uniformly — handled by accumulating their mass as a
    scalar per round (an aggregate, not a data collect).
    """
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
    if undirected:
        e = e.unionByName(
            edges.select(F.col(dst).alias("s"), F.col(src).alias("d"))
        )
    # materialize the edge list once: it feeds every iteration, and its
    # lineage (often an expensive similarity self-join) must not re-run
    # per round
    e = e.distinct().localCheckpoint()
    nodes = (
        e.select(F.col("s").alias("node"))
        .unionByName(e.select(F.col("d").alias("node")))
        .distinct()
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("pr", F.lit(0.0))
    deg = (
        e.groupBy("s").agg(F.count(F.lit(1)).alias("deg"))
        .withColumnRenamed("s", "node")
    )
    # dangling nodes can only exist in a DIRECTED graph; detect once so
    # the common undirected case pays no per-round driver action
    has_dangling = (
        not undirected and nodes.join(deg, "node", "left_anti").count() > 0
    )
    ranks = nodes.withColumn("pr", F.lit(1.0 / n)).localCheckpoint()
    for _ in range(n_iters):
        rd = ranks.join(deg, "node")
        contribs = (
            e.join(rd, e["s"] == rd["node"])
            .select(F.col("d").alias("node"), (F.col("pr") / F.col("deg")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("c"))
        )
        if has_dangling:
            dangling = (
                ranks.join(deg, "node", "left_anti")
                .agg(F.coalesce(F.sum("pr"), F.lit(0.0)))
                .first()[0]
            )
        else:
            dangling = 0.0
        base = (1.0 - damping) / n + damping * dangling / n
        ranks = (
            nodes.join(contribs, "node", "left")
            .select(
                "node",
                (F.lit(base) + F.lit(damping) * F.coalesce(F.col("c"), F.lit(0.0))).alias("pr"),
            )
            .localCheckpoint()
        )
    return ranks


@register(
    "q_pagerank",
    None,  # float fixed-point iteration is engine-specific -> rows-only
    doc="PageRank centrality over the embedding-similarity graph "
    "(same-label pairs with cosine >= 0.4, the blocked self-join from "
    "operators/dedup.embedding_near_dup_pairs). 15 rounds of "
    "join-on-edges + per-node aggregation, localCheckpoint lineage "
    "truncation; numpy power-iteration cross-check in tests. Ranks "
    "canonical documents inside content clusters for keep/downsample "
    "decisions",
)
def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup import embedding_near_dup_pairs

    emb = load(spark, sf_dir, "embeddings")
    pairs = embedding_near_dup_pairs(emb).select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    )
    pr = pagerank(pairs)
    return pr.select("node", _q(F.col("pr"), 1_000_000).alias("pr")).orderBy(
        F.desc("pr"), F.asc("node")
    )


@register(
    "q_topic_clusters",
    None,  # k-means cell assignment is engine/seed-specific -> rows-only
    doc="Corpus topic clustering summary: spherical k-means over the "
    "embedding table (the IVF index's sample-fit + one-pass JVM "
    "assignment path reused as an analytics op), reporting per-cluster "
    "size and mean vector norm. The coarse structure pass before "
    "per-topic curation decisions (mixture weights, per-topic dedup "
    "thresholds). Deterministic seed; stability asserted in tests",
)
def q_topic_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.vector import l2_norm
    from .similarity import build_ivf_index

    idx = build_ivf_index(load(spark, sf_dir, "embeddings"), n_cells=8)
    assigned = idx.assigned  # (vec_id, embedding, __cell)
    return (
        assigned.select(
            F.col("__cell").alias("cluster"),
            l2_norm(F.col("embedding").cast("array<double>")).alias("_n"),
        )
        .groupBy("cluster")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            _q(F.avg("_n"), 10000).alias("mean_norm"),
        )
        .orderBy("cluster")
    )


# ------------------------------------------------------------ triangle count

TRIANGLE_COS = 0.2  # similarity-edge threshold for the triangle graph

# Build-once / traverse-many: the cosine edge list for a given corpus and
# threshold is derived once per process and reused by every graph query
# (triangles, BFS) — the same rule the IVF index follows (an index rebuild
# per query was the round-3 scale anti-pattern). Keyed by (application id,
# sf_dir, threshold): a checkpointed DataFrame must not outlive its
# SparkSession. CONTRACT (same as _IVF_CACHE): sf_dir identifies an
# immutable corpus — rewriting data under a cached path mid-application
# requires clear_edge_cache() first, exactly as a table format would
# require a new snapshot id. Entries are few (one per corpus×threshold)
# and die with the application.
_EDGE_CACHE: dict[tuple[str, str, float], DataFrame] = {}


def clear_edge_cache() -> None:
    """Invalidate cached edge lists (call after rewriting a corpus under
    a previously-cached sf_dir within the same Spark application)."""
    _EDGE_CACHE.clear()


def similarity_edges_for(
    spark: SparkSession, sf_dir: str, threshold: float = TRIANGLE_COS
) -> DataFrame:
    """Session-cached similarity edge list for the graph family.

    SCALE NOTE (round-9 100x audit): the edge DERIVATION inherits
    embedding_near_dup_pairs' exact all-pairs-within-label semantics, so
    its cost is sum(|label block|^2) — quadratic in the corpus (labels
    are fixed-cardinality). Every graph op downstream (pagerank,
    triangles, k-core, label propagation, degree/assortativity) is
    EDGE-LINEAR; at corpus scale derive edges with a sub-quadratic
    candidate generator instead (banded MinHash pairs or IVF-cell
    blocking produce the same (id_a, id_b) edge shape) and feed them to
    the same functions.
    """
    from .dedup import embedding_near_dup_pairs

    key = (spark.sparkContext.applicationId, sf_dir, threshold)
    edges = _EDGE_CACHE.get(key)
    if edges is None:
        edges = embedding_near_dup_pairs(
            load(spark, sf_dir, "embeddings"), threshold=threshold
        ).localCheckpoint(eager=True)
        _EDGE_CACHE[key] = edges
    return edges


def triangle_counts(edges: DataFrame) -> DataFrame:
    """Per-node triangle participation over an (id_a < id_b) edge list.

    The a<b<c orientation enumerates each triangle exactly once: wedge
    (a,b)-(b,c) joined on the middle node, closed by an (a,c) edge
    lookup. Both joins are edge-list-sized hash joins — work is
    Σ deg(v)² for the wedge step (the standard distributed bound), never
    node-count-quadratic. Per-node counts come from exploding each
    triangle's three corners.
    """
    e = edges.select(F.col("id_a").alias("a"), F.col("id_b").alias("b"))
    wedges = e.join(
        e.select(F.col("a").alias("b"), F.col("b").alias("c")), "b"
    )
    tri = wedges.join(
        e.select(F.col("a"), F.col("b").alias("c")), ["a", "c"]
    )
    return (
        tri.select(F.explode(F.array("a", "b", "c")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )


@register(
    "q_triangle_count",
    f"""
    WITH e AS (
      SELECT a.vec_id AS ea, b.vec_id AS eb
      FROM embeddings a JOIN embeddings b
        ON a.label = b.label AND a.vec_id < b.vec_id
      WHERE round(list_cosine_similarity(a.embedding::DOUBLE[],
                                         b.embedding::DOUBLE[]), 4)
            >= {TRIANGLE_COS}
    ), t AS (
      SELECT e1.ea AS a, e1.eb AS b, e2.eb AS c
      FROM e e1
      JOIN e e2 ON e1.eb = e2.ea
      JOIN e e3 ON e3.ea = e1.ea AND e3.eb = e2.eb
    )
    SELECT node, count(*) AS n_triangles
    FROM (SELECT unnest([a, b, c]) AS node FROM t)
    GROUP BY node
    """,
    doc="Per-node triangle counts in the cosine>=0.2 similarity graph "
    "(label-blocked edges, the q_dedup_embed derivation): a<b<c wedge "
    "join closed by an edge lookup — edge-list-sized joins only, each "
    "triangle counted once; clustering-coefficient numerator for "
    "community detection over near-dup graphs",
)
def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    # build-once edge list (shared with q_bfs_levels), three join legs
    return triangle_counts(similarity_edges_for(spark, sf_dir))


# ------------------------------------------------------------- BFS levels

BFS_MAX_DEPTH = 6
BFS_SOURCE_MOD = 100  # vec_id % 100 == 0 rows seed the traversal


def bfs_levels(
    edges: DataFrame, sources: DataFrame, max_depth: int = BFS_MAX_DEPTH
) -> DataFrame:
    """Shortest hop distance (BFS level) from a source set over an
    undirected (id_a < id_b) edge list, capped at ``max_depth``.

    Same iterative discipline as :func:`pagerank` / ``dup_clusters``:
    per round ONE join of the frontier against the edge list plus an
    anti-join against the visited set, lineage truncated with
    ``localCheckpoint``, O(max_depth) rounds, and the only driver-side
    value per round is the frontier's emptiness probe. BFS discovers
    each node first at its minimum level, so the result is exactly
    min-hop-distance — deterministic, which is what lets the oracle be
    a recursive CTE. Output: (node, level) for every reachable node.
    """
    und = edges.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    ).unionByName(
        edges.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
    )
    levels = sources.select(
        F.col("node"), F.lit(0).alias("level")
    ).localCheckpoint(eager=True)
    frontier = levels
    for depth in range(1, max_depth + 1):
        nxt = (
            frontier.join(und, frontier["node"] == und["src"])
            .select(F.col("dst").alias("node"), F.lit(depth).alias("level"))
            .join(levels.select("node"), "node", "left_anti")
            .distinct()
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        levels = levels.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    return levels


@register(
    "q_bfs_levels",
    f"""
    WITH RECURSIVE ed AS (
      SELECT a.vec_id AS src, b.vec_id AS dst
      FROM embeddings a JOIN embeddings b
        ON a.label = b.label AND a.vec_id < b.vec_id
      WHERE round(list_cosine_similarity(a.embedding::DOUBLE[],
                                         b.embedding::DOUBLE[]), 4)
            >= {TRIANGLE_COS}
    ), e AS (
      SELECT src, dst FROM ed
      UNION ALL
      SELECT dst AS src, src AS dst FROM ed
    ), walk(node, level) AS (
      SELECT vec_id, 0 FROM embeddings WHERE vec_id % {BFS_SOURCE_MOD} = 0
      UNION
      SELECT e.dst, w.level + 1
      FROM walk w JOIN e ON w.node = e.src
      WHERE w.level < {BFS_MAX_DEPTH}
    )
    SELECT node, min(level) AS level FROM walk GROUP BY node
    """,
    doc="BFS shortest-hop levels from seed vectors over the cosine>=0.2 "
    "similarity graph (the q_triangle_count edge derivation): frontier "
    "join + visited anti-join per round, O(max_depth) rounds, "
    "localCheckpoint-truncated lineage. The oracle is a recursive CTE — "
    "BFS first-discovery level equals min hop distance, so the "
    "iterative plan is value-checkable, not just rows-only",
)
def q_bfs_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = similarity_edges_for(spark, sf_dir)
    sources = (
        load(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") % BFS_SOURCE_MOD == 0)
        .select(F.col("vec_id").alias("node"))
    )
    return bfs_levels(edges, sources)


# --------------------------------------------------------------- k-core

KCORE_K = 2
KCORE_MAX_ROUNDS = 200  # safety cap; peeling depth, not graph size


def kcore(edges: DataFrame, k: int = KCORE_K) -> DataFrame:
    """Maximal subgraph in which every node has degree >= k (the k-core),
    by distributed peeling: drop all nodes below degree k, recompute
    degrees, repeat to fixpoint. The result is order-independent (the
    k-core is unique), so the peel schedule can be fully parallel.

    Same iterative discipline as :func:`pagerank` / :func:`bfs_levels`:
    per round one degree aggregate + two anti-joins against the (tiny)
    below-threshold node set, lineage truncated with ``localCheckpoint``;
    the driver sees only each round's emptiness probe. Rounds are
    bounded by the peeling DEPTH (how many onion layers the graph has),
    not its size — shallow for similarity graphs; the cap is a runaway
    guard, and hitting it raises rather than returning a non-core.

    Output: (node, core_degree) for members of the k-core, where
    core_degree is the node's degree WITHIN the core.
    """
    e = edges.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    und = (
        e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    for _ in range(KCORE_MAX_ROUNDS):
        deg = und.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
        bad = deg.filter(F.col("deg") < k).select("src").localCheckpoint(eager=True)
        if bad.isEmpty():
            return (
                deg.select(F.col("src").alias("node"), F.col("deg").alias("core_degree"))
                .orderBy("node")
            )
        und = (
            und.join(bad, "src", "left_anti")
            .join(bad.withColumnRenamed("src", "dst"), "dst", "left_anti")
            .select("src", "dst")
            .localCheckpoint(eager=True)
        )
    raise RuntimeError(f"k-core peeling did not converge in {KCORE_MAX_ROUNDS} rounds")


@register(
    "q_kcore",
    None,  # iterative peel-to-fixpoint is not single-SQL-expressible ->
    # rows-only; exactness vs a driver-side reference peel asserted in
    # tests/test_graph_corpus.py
    doc="2-core of the cosine>=0.2 similarity graph (the shared "
    "q_triangle_count edge cache): distributed peeling — degree "
    "aggregate + anti-join per round, localCheckpoint-truncated, rounds "
    "bounded by peel depth. Separates clustered near-dup mass (core "
    "members, dedup/downsample candidates) from tree-like periphery "
    "that mere pair counts cannot distinguish",
)
def q_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    return kcore(similarity_edges_for(spark, sf_dir))


# ------------------------------------------------- neighbour-set Jaccard


def node_jaccard(edges: DataFrame) -> DataFrame:
    """Structural similarity between connected-or-cowedged node pairs:
    Jaccard of their neighbour sets, |N(a)∩N(b)| / |N(a)∪N(b)|.

    Shape: symmetrize the (id_a < id_b) edge list, self-join the
    adjacency on the SHARED NEIGHBOUR (the wedge join — Σ deg(v)² work,
    the same bound as triangle counting, never node-quadratic), count
    common neighbours per (a, b), then join per-node degrees twice.
    Only pairs with ≥1 common neighbour appear (the Jaccard of any other
    pair is 0 by definition). Integer counts end-to-end; the one ratio
    is quantized."""
    adj = edges.select(
        F.col("id_a").alias("n"), F.col("id_b").alias("nb")
    ).unionByName(
        edges.select(F.col("id_b").alias("n"), F.col("id_a").alias("nb"))
    )
    deg = adj.groupBy("n").agg(F.count(F.lit(1)).alias("deg"))
    common = (
        adj.select(F.col("n").alias("a"), "nb")
        .join(adj.select(F.col("n").alias("b"), "nb"), "nb")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    da = deg.select(F.col("n").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("n").alias("b"), F.col("deg").alias("deg_b"))
    return (
        common.join(da, "a")
        .join(db, "b")
        .select(
            F.col("a").alias("node_a"),
            F.col("b").alias("node_b"),
            "common",
            "deg_a",
            "deg_b",
            _q(
                F.col("common")
                / (F.col("deg_a") + F.col("deg_b") - F.col("common")),
                1_000_000,
            ).alias("jaccard"),
        )
    )


@register(
    "q_node_jaccard",
    f"""
    WITH e AS (
      SELECT a.vec_id AS ea, b.vec_id AS eb
      FROM embeddings a JOIN embeddings b
        ON a.label = b.label AND a.vec_id < b.vec_id
      WHERE round(list_cosine_similarity(a.embedding::DOUBLE[],
                                         b.embedding::DOUBLE[]), 4)
            >= {TRIANGLE_COS}
    ), adj AS (
      SELECT ea AS n, eb AS nb FROM e
      UNION ALL
      SELECT eb AS n, ea AS nb FROM e
    ), deg AS (
      SELECT n, count(*) AS deg FROM adj GROUP BY n
    ), common AS (
      SELECT x.n AS a, y.n AS b, count(*) AS common
      FROM adj x JOIN adj y ON x.nb = y.nb AND x.n < y.n
      GROUP BY 1, 2
    )
    SELECT c.a AS node_a, c.b AS node_b, c.common,
           da.deg AS deg_a, db.deg AS deg_b,
           floor(c.common * 1.0 / (da.deg + db.deg - c.common)
                 * 1000000 + 0.5) / 1000000 AS jaccard
    FROM common c
    JOIN deg da ON da.n = c.a
    JOIN deg db ON db.n = c.b
    """,
    doc="Neighbour-set Jaccard over the cosine similarity graph (same "
    "label-blocked edge derivation as q_triangle_count): structural "
    "node similarity via the wedge self-join (Σ deg² work, the "
    "triangle-counting bound), per-node degrees joined back, exact "
    "integer counts with one quantized ratio — the link-prediction / "
    "role-equivalence primitive",
)
def q_node_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return node_jaccard(similarity_edges_for(spark, sf_dir))


# ----------------------------------------------------- label propagation

LPA_ROUNDS = 5


def label_propagation(edges: DataFrame, rounds: int = LPA_ROUNDS) -> DataFrame:
    """Synchronous label propagation (community detection): every node
    starts as its own community; each round every node adopts the most
    frequent label among its neighbours, ties broken on the SMALLEST
    label — fully deterministic, unlike classic randomized LPA.

    Iterative like :func:`pagerank`: one adjacency⋈labels join + one
    count + one rank window per round, lineage truncated per round, so
    the plan depth is O(rounds), not O(rounds·|V|). A fixed round budget
    (not convergence polling) keeps the driver loop job-count
    deterministic; synchronous updates can oscillate on bipartite-ish
    structures, which a bounded budget simply truncates — the standard
    distributed LPA trade-off."""
    adj = edges.select(
        F.col("id_a").alias("n"), F.col("id_b").alias("nb")
    ).unionByName(
        edges.select(F.col("id_b").alias("n"), F.col("id_a").alias("nb"))
    )
    labels = adj.select("n").distinct().select("n", F.col("n").alias("lbl"))
    from pyspark.sql import Window

    w = Window.partitionBy("n").orderBy(F.desc("_cnt"), F.asc("lbl"))
    for _ in range(rounds):
        votes = (
            adj.join(
                labels.select(F.col("n").alias("nb"), "lbl"), "nb"
            )
            .groupBy("n", "lbl")
            .agg(F.count(F.lit(1)).alias("_cnt"))
        )
        labels = (
            votes.withColumn("_r", F.row_number().over(w))
            .filter(F.col("_r") == 1)
            .select("n", "lbl")
            .localCheckpoint(eager=False)
        )
    return labels.select(F.col("n").alias("node"), F.col("lbl").alias("community"))


@register(
    "q_label_propagation",
    None,  # iterative fixpoint-style algorithm → rows-only; exactness vs a
    # driver-side reference propagation in tests/test_round6_ops.py
    doc=f"Deterministic synchronous label propagation ({LPA_ROUNDS} "
    "rounds) over the similarity graph: most-frequent neighbour label, "
    "ties to the smallest — community detection complementing "
    "q_dedup_clusters' pure connectivity. One join + count + rank "
    "window per round, lineage truncated per round",
)
def q_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    return label_propagation(similarity_edges_for(spark, sf_dir))


# --------------------------------------------------- degree distribution


def degree_histogram(edges: DataFrame) -> DataFrame:
    """Degree distribution of the similarity graph: per degree value, the
    node count and share — the first sanity read on any graph (a hub-heavy
    distribution predicts hot keys in every downstream wedge join)."""
    adj = edges.select(F.col("id_a").alias("n")).unionByName(
        edges.select(F.col("id_b").alias("n"))
    )
    deg = adj.groupBy("n").agg(F.count(F.lit(1)).alias("deg"))
    hist = deg.groupBy("deg").agg(F.count(F.lit(1)).alias("n_nodes"))
    tot = deg.agg(F.count(F.lit(1)).alias("_t"))
    return hist.join(tot, F.lit(True)).select(
        "deg",
        "n_nodes",
        _q(F.col("n_nodes") / F.col("_t"), 10000).alias("share"),
    )


@register(
    "q_degree_hist",
    f"""
    WITH e AS (
      SELECT a.vec_id AS ea, b.vec_id AS eb
      FROM embeddings a JOIN embeddings b
        ON a.label = b.label AND a.vec_id < b.vec_id
      WHERE round(list_cosine_similarity(a.embedding::DOUBLE[],
                                         b.embedding::DOUBLE[]), 4)
            >= {TRIANGLE_COS}
    ), adj AS (
      SELECT ea AS n FROM e UNION ALL SELECT eb AS n FROM e
    ), deg AS (
      SELECT n, count(*) AS deg FROM adj GROUP BY n
    ), t AS (SELECT count(*) AS tot FROM deg)
    SELECT deg.deg, count(*) AS n_nodes,
           floor(count(*) * 1.0 / min(t.tot) * 10000 + 0.5) / 10000 AS share
    FROM deg CROSS JOIN t
    GROUP BY deg.deg
    """,
    doc="Degree distribution of the cosine similarity graph (same edge "
    "derivation as q_triangle_count): per-degree node counts and shares "
    "— the hub-heaviness read that predicts hot keys in wedge joins. "
    "Two counting aggregates + one 1-row broadcast",
)
def q_degree_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    return degree_histogram(similarity_edges_for(spark, sf_dir))
