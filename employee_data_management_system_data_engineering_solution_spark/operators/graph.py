"""Connected components over an edge list — the clustering stage of
near-duplicate deduplication.

Pairwise dedup (LSH → verified pairs) leaves TRANSITIVE duplicates in
separate rows: A≈B and B≈C must collapse into one cluster {A,B,C} so a
single representative survives. That closure is a connected-components
problem; the reference engine has nothing like it (north-star
extension, SURVEY §2.11.1).

Algorithm: iterative min-label propagation. Every node starts labeled
with itself; each round every node takes the min of its own label and
its neighbors' labels; converged when no label changes. Rounds needed =
graph diameter, which for near-dup clusters is tiny (dup groups are
near-cliques, diameter ≤ 2–3). Lineage is truncated with
``localCheckpoint`` so the plan doesn't grow per iteration (on a real
cluster, use ``spark.sparkContext.setCheckpointDir`` + ``checkpoint``
for fault-tolerant truncation). For web-scale graphs with long chains,
use :func:`connected_components_star` (alternating large-star/
small-star) — diameter-independent round count, same output contract.

Per-round cost engineering (iterative graph jobs die by fixed costs):

* the adjacency carries SELF-LOOPS, so "min of self and neighbors" is
  a single join + groupBy — no separate left-join with the previous
  labels (3 shuffles/round → 2);
* the adjacency is hash-partitioned on the join side ONCE before its
  checkpoint, and ``localCheckpoint`` preserves the partitioning, so
  each round only exchanges the (small) label frame;
* convergence is detected by the label SUM, not a join-and-count:
  min-propagation is monotone non-increasing per node, so the total is
  strictly decreasing until the fixed point — an O(1)-output agg over
  a checkpointed frame replaces a shuffle join per check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    *,
    max_iter: int = 15,
) -> DataFrame:
    """(node, component) for every node in ``edges``; ``component`` is
    the minimum node id reachable from the node. Undirected: each edge
    is used in both directions. Raises if not converged in
    ``max_iter`` propagation rounds (near-dup graphs converge in
    ≤ 3–4). Node ids must be non-null numerics (label sum is the
    convergence witness)."""
    # pin the (possibly expensive) upstream edge plan FIRST: everything
    # below references it several times (symmetrize + node set), and an
    # un-pinned plan would re-execute per reference
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).localCheckpoint(
        eager=True
    )
    # size the per-round parallelism by edge volume (the count is free:
    # ``e`` is pinned): an iterative job on a sparse dup graph must not
    # pay 2 × rounds × default-partitions empty-task overhead, and at
    # 100 TB the same formula scales the rounds back out
    default_parts = int(e.sparkSession.conf.get("spark.sql.shuffle.partitions", "200"))
    n_parts = max(1, min(default_parts, e.count() // 25_000 + 1))
    # symmetrize + SELF-LOOPS (so the neighborhood min includes the
    # node's own label) in one job over the pinned edges
    nodes = e.select(F.explode(F.array("src", "dst")).alias("node")).distinct()
    adj = (
        e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .unionByName(nodes.select(F.col("node").alias("src"), F.col("node").alias("dst")))
        .distinct()
        .repartition(n_parts, F.col("dst"))
        .localCheckpoint(eager=True)
    )
    # the self-loop rows ARE the node set — initial labels need no
    # extra shuffle over a pinned frame
    labels = adj.filter(F.col("src") == F.col("dst")).select(
        F.col("src").alias("node"), F.col("src").alias("component")
    )
    prev_sum = labels.agg(F.sum("component")).first()[0]

    def propagate(cur: DataFrame) -> DataFrame:
        return (
            adj.join(cur, adj["dst"] == cur["node"])
            .groupBy(adj["src"].alias("node"))
            .agg(F.min("component").alias("component"))
        )

    for _ in range(max_iter):
        # two propagation rounds per convergence probe: near-dup
        # graphs converge in 2-3 rounds, so halving the driver
        # actions beats probing after every round
        labels = propagate(propagate(labels)).localCheckpoint(eager=True)
        new_sum = labels.agg(F.sum("component")).first()[0]
        if new_sum == prev_sum:
            return labels
        prev_sum = new_sum
    raise RuntimeError(f"connected_components: no convergence in {2 * max_iter} rounds")


def connected_components_star(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    *,
    max_iter: int = 30,
) -> DataFrame:
    """Alternating large-star/small-star connected components — the
    web-scale path for graphs whose diameter is NOT small.

    Same contract as :func:`connected_components` ((node, component),
    component = min reachable id), different round complexity:
    min-label propagation needs diameter rounds (a 1M-hop chain never
    finishes), while star contraction converges in O(log² n) rounds
    regardless of diameter (Kiveris et al., "Connected Components in
    MapReduce and Beyond", ACM SoCC 2014 — public algorithm, described
    from the paper, no code derived).

    Each round is two half-steps over a canonical larger→smaller edge
    list (one join + groupBy each — the same 2-shuffle shape as a
    propagation round):

    * large-star: every node links its LARGER neighbors to the min of
      its closed neighborhood — long chains fold in half;
    * small-star: every node links its smaller-or-equal neighbors and
      itself to that min — stars flatten to depth 1.

    Convergence: the canonical edge multiset is a fixed point exactly
    when every tree is a depth-1 star; witnessed by
    (count, Σsrc, Σdst, Σ xxhash64(src, dst)) of the pinned frame —
    four O(1)-output aggs in one job, no join-and-count. Use this over min-label when clusters can chain
    (transcript/session dedup, citation graphs); near-clique dup
    groups converge in 1-2 rounds under either algorithm.
    """
    # canonical orientation: src strictly larger than dst
    e = (
        edges.select(
            F.greatest(F.col(src), F.col(dst)).alias("u"),
            F.least(F.col(src), F.col(dst)).alias("v"),
        )
        .filter(F.col("u") > F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    singletons = (
        edges.filter(F.col(src) == F.col(dst))
        .select(F.col(src).alias("node"))
        .distinct()
        .localCheckpoint(eager=True)
    )

    def _sig(df: DataFrame) -> tuple:
        row = df.agg(
            F.count(F.lit(1)),
            F.sum("u"),
            F.sum("v"),
            # pmod-bounded so the ANSI-mode sum can't overflow long
            F.sum(F.pmod(F.xxhash64("u", "v"), F.lit(1_000_000_007))),
        ).first()
        return tuple(row)

    def _large_star(cur: DataFrame) -> DataFrame:
        # symmetric neighborhoods; m = min(Γ(x) ∪ {x}); for every
        # neighbor y > x emit (y, m). m ≤ x < y keeps orientation.
        sym = cur.select("u", "v").unionByName(
            cur.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        m = (
            sym.groupBy("u")
            .agg(F.min("v").alias("__mn"))
            .select("u", F.least(F.col("__mn"), F.col("u")).alias("m"))
        )
        return (
            sym.join(m, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .distinct()
        )

    def _small_star(cur: DataFrame) -> DataFrame:
        # per larger-endpoint x over its smaller neighbors N⁻(x):
        # m = min(N⁻(x)); link every y ∈ N⁻(x) ∪ {x}, y ≠ m, to m
        m = cur.groupBy("u").agg(F.min("v").alias("m"))
        linked = cur.join(m, "u").select(
            F.col("v").alias("y"), F.col("m")
        ).unionByName(m.select(F.col("u").alias("y"), F.col("m")))
        return (
            linked.filter(F.col("y") != F.col("m"))
            .select(F.col("y").alias("u"), F.col("m").alias("v"))
            .distinct()
        )

    prev = _sig(e)
    for _ in range(max_iter):
        e = _small_star(_large_star(e)).localCheckpoint(eager=True)
        cur_sig = _sig(e)
        if cur_sig == prev:
            break
        prev = cur_sig
    else:
        raise RuntimeError(f"connected_components_star: no convergence in {max_iter} rounds")

    # fixed point = depth-1 stars: (u, v) reads "node u in component v";
    # centers and self-loop singletons label themselves
    centers = e.select(F.col("v").alias("node")).distinct()
    members = e.select(F.col("u").alias("node"), F.col("v").alias("component"))
    return members.unionByName(
        centers.join(members, "node", "left_anti").select(
            "node", F.col("node").alias("component")
        )
    ).unionByName(
        singletons.join(
            members.select("node").unionByName(centers), "node", "left_anti"
        ).select("node", F.col("node").alias("component"))
    )


def pagerank_fixed_point(
    edges: DataFrame,
    iters: int = 3,
    damping_pct: int = 85,
    scale: int = 10**12,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """PageRank over a directed edge list in FIXED-POINT integer
    arithmetic: ranks live on a ``scale``-denominator grid and every
    operation is integer (floor) division, so the result is bit-exact
    across engines, partitionings, and summation orders — float
    PageRank sums contributions in nondeterministic shuffle order, and
    iterating amplifies ulp drift into rank flips; integer arithmetic
    removes the hazard class entirely instead of rounding it down.
    (The mass lost to floor division — < in-degree units of 1/scale per
    node per round — is the explicit price of determinism.)

    Per iteration: contribution = rank DIV out_degree shipped along
    edges (one equi-join against the once-partitioned, pinned edge
    frame), one groupBy(dst) integer sum (map-side combined), then
    rank' = (100-damping)·scale/100 DIV n + damping·Σ DIV 100 — taken
    over EVERY node (both edge endpoints): a node with no inbound
    edges this round keeps the teleport term, it does not vanish.
    Isolated vertices (in no edge at all) never enter. DANGLING nodes
    (inbound but no outbound edges — possible in general directed
    input) hold rank but contribute no outbound mass, the standard
    mass-leaking simplification; a symmetric edge list has none.

    Output: (node, rank_fp) — rank_fp is the BIGINT numerator over
    ``scale``. Lineage is truncated per round (``localCheckpoint``)
    exactly as in :func:`connected_components`.
    """
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .distinct()
        .repartition(F.col("src"))
        .localCheckpoint(eager=True)
    )
    deg = e.groupBy("src").agg(F.count("*").alias("__deg"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n_nodes = nodes.count()  # bounded driver scalar, like the Lloyd's barrier
    if n_nodes == 0:
        raise ValueError("pagerank_fixed_point: empty edge list (no nodes to rank)")
    base = (100 - damping_pct) * scale // 100 // n_nodes
    pr = nodes.select("node", F.lit(scale // n_nodes).cast("long").alias("rank_fp"))
    for _ in range(iters):
        contrib = (
            pr.join(deg, pr.node == deg.src, "inner")
            .select(
                F.col("node").alias("__cs"),
                F.expr("rank_fp div __deg").alias("__c"),
            )
            .join(e, F.col("__cs") == e.src)
            .select(F.col("dst").alias("node"), F.col("__c"))
        )
        summed = contrib.groupBy("node").agg(F.sum("__c").alias("__in"))
        # lazy checkpoint: truncates lineage (plan size stays O(1) per
        # round) but defers computation, so the whole fixed-iteration
        # loop runs as ONE job at the final action instead of one
        # scheduled job per round — fixed rounds need no driver reads,
        # unlike connected_components' convergence checks. The left
        # join from the full node set keeps zero-in-degree nodes at
        # the teleport term instead of silently dropping them.
        pr = (
            nodes.join(summed, "node", "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.expr(f"({damping_pct} * coalesce(__in, 0L)) div 100")
                ).cast("long").alias("rank_fp"),
            )
            .localCheckpoint(eager=False)
        )
    return pr


def triangle_counts(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Per-node triangle counts via degree-ordered edge orientation —
    the classic distributed scheme (each undirected edge is stored once,
    pointing from its lower-(degree, id) endpoint to the higher one;
    every wedge is generated at its LOWEST-ranked vertex). The
    orientation bounds out-degrees by O(sqrt(m)) on any graph, so the
    wedge self-join — the only superlinear step — emits
    sum(out_deg²) = O(m^1.5) candidates instead of the
    sum(deg²) a naive neighbor pairing costs on skewed graphs; each
    triangle is found exactly once (u→v, u→w, v→w with rank
    u < v < w).

    Plan shape: dedup + degree agg + orientation are single-shuffle
    hash steps on vertex keys; the wedge join and the closing-edge join
    both hash-partition on small keys; the final count explodes 3 rows
    per triangle into a map-side-combined groupBy. The (degree, id)
    rank is packed into one BIGINT (d·2³² + id) so the oracle compares
    the identical scalar — ids must fit in 32 bits and degrees in 31
    (guarded).

    Output: (node, n_triangles) for every vertex in ≥1 triangle.
    """
    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("v"))
        .unionAll(und.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count("*").alias("d"))
    )
    guard = F.when(
        (F.col("v") < 0) | (F.col("v") >= F.lit(2**32)) | (F.col("d") >= F.lit(2**31)),
        F.raise_error(
            F.lit("triangle_counts: id outside [0, 2^32) or degree >= 2^31 breaks the rank packing")
        ),
    ).otherwise(F.col("d") * F.lit(2**32) + F.col("v"))
    key = deg.select("v", guard.alias("k"))
    keyed = (
        und.join(key.select(F.col("v").alias("a"), F.col("k").alias("ka")), "a")
        .join(key.select(F.col("v").alias("b"), F.col("k").alias("kb")), "b")
    )
    lo = F.col("ka") < F.col("kb")
    o = keyed.select(
        F.when(lo, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(lo, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(lo, F.col("kb")).otherwise(F.col("ka")).alias("kv"),
    )
    x, y = o.alias("x"), o.alias("y")
    wedge = x.join(y, (F.col("x.u") == F.col("y.u")) & (F.col("x.kv") < F.col("y.kv"))).select(
        F.col("x.u").alias("u"), F.col("x.v").alias("v"), F.col("y.v").alias("w")
    )
    closing = o.select(F.col("u").alias("v"), F.col("v").alias("w"))
    tri = wedge.join(closing, ["v", "w"])
    nodes = (
        tri.select(F.col("u").alias("node"))
        .unionAll(tri.select(F.col("v").alias("node")))
        .unionAll(tri.select(F.col("w").alias("node")))
    )
    return nodes.groupBy("node").agg(F.count("*").alias("n_triangles"))


def label_propagation(
    edges: DataFrame, src: str = "src", dst: str = "dst", rounds: int = 3
) -> DataFrame:
    """Community labels via SYNCHRONOUS label propagation, run for a
    FIXED number of rounds: every node starts as its own label; each
    round it adopts the most frequent label among its neighbors' plus
    ONE self-vote (its own previous label), ties broken toward the
    smallest label. Classic LPA (Raghavan et al. 2007, described from
    the paper) is run-to-convergence with random tie-breaks — useless
    for a cross-engine hash; the fixed-round synchronous variant with a
    total-order tie-break is fully deterministic and the per-round
    update is identical, so the labels after k rounds are a
    well-defined community signal (k bounds the label diffusion
    radius). The self-vote also damps the 2-cycle label oscillation
    synchronous LPA exhibits on bipartite-ish regions.

    Output: (node, label). Scale per round: one join of the edge list
    against the |V|-row label table (shuffle on vertex key) + one
    (node, label) groupBy with map-side combine — O(rounds) passes over
    E, the same per-round shape as min-label CC, with the same
    ``localCheckpoint`` lineage truncation so the loop stays one job.
    """
    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    both = und.select(F.col("a").alias("s"), F.col("b").alias("d")).unionByName(
        und.select(F.col("b").alias("s"), F.col("a").alias("d"))
    )
    labels = (
        both.select(F.col("s").alias("node")).distinct().withColumn("label", F.col("node"))
    )
    for _ in range(rounds):
        nbr_votes = both.join(
            labels.withColumnRenamed("node", "s"), "s"
        ).select(F.col("d").alias("node"), "label")
        votes = nbr_votes.unionByName(labels)  # one self-vote
        counts = votes.groupBy("node", "label").agg(F.count("*").alias("c"))
        # argmax by (count desc, label asc) via struct-MIN on
        # (-count, label): negating the COUNT (always numeric) instead
        # of the label keeps the tie-break valid for any orderable
        # label type — string vertex ids included, where a negated
        # label would silently cast to NULL
        labels = (
            counts.groupBy("node")
            .agg(F.min(F.struct((-F.col("c")).alias("nc"), F.col("label"))).alias("m"))
            .select("node", F.col("m.label").alias("label"))
            .localCheckpoint(eager=False)
        )
    return labels
