"""River-network generalization: chain contraction + downstream width
propagation.

Reference: /root/reference/src/gen/gen-rivers.cpp —
- builds a graph of waterway segments keyed by endpoints, counts
  node_order (degree) per point (:122-169)
- merges degree-2 chains into single edges (:242-332)
- propagates max width downstream (DFS along flow direction with
  seen-list loop detection, :83-120)

Spark-first, scale-adaptive: both steps are iterative fixpoints whose
per-round cost is dominated by per-stage FIXED overhead on small
graphs and by data volume on big ones, so each picks its execution
strategy from the measured edge count:

- Below _SMALL_GRAPH_EDGES the whole graph fits in one task (2M edges
  x ~56 B ~ 112 MB), so the fixpoint is solved LOCALLY in a single
  mapInPandas kernel (guide-SS4 vectorized native code): union-find
  for the chain components (exact, always terminates), a K-bounded
  numpy relaxation for widths.  One shuffle in, one kernel pass, zero
  per-round driver barriers — versus ~20+ sequential exchange stages
  for the distributed fixpoint on the same data.  The width kernel's
  hop bound keeps the pathological case (a >_LOCAL_MAX_HOPS-diameter
  graph that still has <2M edges) safe: it emits the partially
  relaxed state with done=false and the caller escalates to the
  chain-decomposition path — exact, because for monotone
  max-propagation the fixpoint from any state between the input and
  the fixpoint is the same fixpoint.
- At or above _SMALL_GRAPH_EDGES the distributed fixpoints run with
  the session's AQE/codegen settings: hash-min label propagation with
  pointer jumping for contraction (O(log diameter) rounds), and a
  window-form relaxation for widths (see _window_hop) whose lazy
  per-round plan grows LINEARLY in hops_per_round — the previous
  join-form hop referenced the running frame twice, so a 4-hop round
  analyzed and executed O(h^2) sort-merge-join subtrees (10 SMJs /
  26 exchanges per round, measured r15).

Each distributed iteration is one shuffle on the endpoint key; at
planet scale the waterway graph is sparse (~10^7 edges) so log-round
convergence holds.  Inputs use exact endpoint coordinates as join
keys, like the reference's point-based equal_range probing (:297-300).
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from osm2pgsql_spark.operators.iterate import checkpoint as _ckpt

# Below this edge count the whole graph fits comfortably in one task
# (~112 MB of endpoint rows) and the fixpoint's wall-clock is dominated
# by per-stage fixed costs, not data volume: solve locally in a single
# kernel.  Above it, the distributed fixpoints run under the default
# session confs (whole-stage codegen, AQE) — they win there.
_SMALL_GRAPH_EDGES = 2_000_000

# Hop bound for the local width kernel.  Real river networks below the
# small-graph edge bound converge orders of magnitude sooner (sf0.1:
# last change at hop 18); a graph that is still relaxing after this
# many hops has chains the chain-decomposition path handles in
# O(log L) rounds, so the kernel hands over instead of looping
# O(diameter) times.
_LOCAL_MAX_HOPS = 512


@contextmanager
def _small_graph_mode(spark, n_rows: int):
    """Per-round frames in an iterative fixpoint are tiny compared to
    the input, so each round's cost is per-stage FIXED overhead:
    whole-stage-codegen compiles a fresh Janino class per generated
    plan (new attribute ids every round => no codegen cache hits) and
    AQE re-plans + schedules every shuffle stage separately.  Measured
    at sf0.1 (135k edges): codegen+AQE off + 8 shuffle partitions
    takes contract_chains 13.7s->4.3s and propagate_width 20s->11.6s
    with identical results.  r13 re-measure (3 runs per setting):
    4 partitions beats 8 on BOTH median and spread for the width
    fixpoint — 6.86-7.07s (3% spread) vs 6.39-8.67s (36%) — because
    each of the ~50 sequential micro-stages schedules half the tasks;
    2 partitions loses parallelism (9.4-10.0s), 16 pays task overhead
    (7.4-8.2s).  On a big graph (>= _SMALL_GRAPH_EDGES) the session
    confs are left untouched — codegen/AQE win there.  Always
    restores the caller's confs.  (Since r15 the small-graph regime
    normally runs the single-kernel local path and only enters this
    conf mode when a distributed loop must continue a non-converged
    local solve.)"""
    if n_rows >= _SMALL_GRAPH_EDGES:
        yield
        return
    conf = spark.conf
    keys = (
        "spark.sql.codegen.wholeStage",
        "spark.sql.adaptive.enabled",
        "spark.sql.shuffle.partitions",
    )
    saved = {k: conf.get(k) for k in keys}
    try:
        conf.set("spark.sql.codegen.wholeStage", "false")
        conf.set("spark.sql.adaptive.enabled", "false")
        conf.set("spark.sql.shuffle.partitions", "4")
        yield
    finally:
        for k, v in saved.items():
            conf.set(k, v)


def endpoint_degrees(edges: DataFrame) -> DataFrame:
    """(px, py, degree) over both endpoints of every edge.

    edges: (edge_id, x1, y1, x2, y2, ...)."""
    pts = edges.select(F.col("x1").alias("px"), F.col("y1").alias("py")).unionByName(
        edges.select(F.col("x2").alias("px"), F.col("y2").alias("py"))
    )
    return pts.groupBy("px", "py").agg(F.count(F.lit(1)).alias("degree"))


def _endpoint_indices(pdf):
    """Map the tail/head coordinate pairs of a local edge frame to
    dense point indices.  Complex128 packs (x, y) losslessly; adding
    0.0 normalizes -0.0 to +0.0 the way Spark's float join-key
    normalization does."""
    import numpy as np

    tails = (pdf["x1"].to_numpy() + 0.0) + 1j * (pdf["y1"].to_numpy() + 0.0)
    heads = (pdf["x2"].to_numpy() + 0.0) + 1j * (pdf["y2"].to_numpy() + 0.0)
    uniq, inv = np.unique(np.concatenate([tails, heads]), return_inverse=True)
    n = len(pdf)
    return len(uniq), inv[:n], inv[n:]


def _chain_labels_kernel(batches):
    """Single-task chain labeling: degree count + union-find across
    degree-2 endpoints, emitting the same labels the distributed
    hash-min fixpoint converges to (min edge_id per component)."""
    import numpy as np
    import pandas as pd

    dfs = list(batches)
    if not dfs:
        return
    pdf = pd.concat(dfs, ignore_index=True)
    n = len(pdf)
    n_pts, tail_idx, head_idx = _endpoint_indices(pdf)
    slots = np.concatenate([tail_idx, head_idx])
    degree = np.bincount(slots, minlength=n_pts)

    # incident edge rows per point, grouped by sorting the slot list
    order = np.argsort(slots, kind="stable")
    rows_of_slot = np.concatenate([np.arange(n), np.arange(n)])[order]
    pts_sorted = slots[order]

    parent = np.arange(n)

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    # degree-2 points have exactly two consecutive slots after the
    # sort; union their incident edges (a self-looping edge unions
    # with itself — a no-op, matching the distributed adjacency's
    # edge_id != nbr filter)
    deg2 = np.flatnonzero(degree == 2)
    starts = np.searchsorted(pts_sorted, deg2, side="left")
    for s in starts:
        a, b = find(rows_of_slot[s]), find(rows_of_slot[s + 1])
        if a != b:
            parent[a] = b

    # resolve every row to its root by pointer doubling
    while True:
        nxt = parent[parent]
        if np.array_equal(nxt, parent):
            break
        parent = nxt

    eid = pdf["edge_id"].to_numpy()
    out = pd.DataFrame({"edge_id": eid, "root": parent})
    out["chain_id"] = out.groupby("root")["edge_id"].transform("min")
    yield out[["edge_id", "chain_id"]]


def contract_chains(edges: DataFrame, max_iter: int = 25) -> DataFrame:
    """Assign a chain_id to every edge; edges sharing a degree-2
    endpoint get the same chain_id (gen-rivers.cpp:242-332 merge).

    Returns edges + chain_id.  Small graphs (< _SMALL_GRAPH_EDGES) are
    labeled in one local union-find kernel; big graphs run hash-min
    label propagation with pointer jumping, which converges when no
    label changes."""
    # Materializing the slim endpoint frame runs the (possibly heavy)
    # edge input once at the caller's session confs; the count on the
    # checkpointed RDD is then cheap and picks the strategy.
    slim = _ckpt(edges.select("edge_id", "x1", "y1", "x2", "y2"))
    n_edges = slim.count()
    if n_edges < _SMALL_GRAPH_EDGES:
        labels = _ckpt(
            slim.repartition(1).mapInPandas(
                _chain_labels_kernel, "edge_id bigint, chain_id bigint"
            )
        )
        return edges.join(labels, "edge_id")
    labels = _ckpt(edges.select("edge_id", F.col("edge_id").alias("chain_id")))
    with _small_graph_mode(edges.sparkSession, n_edges):
        return _contract_chains_loop(edges, labels, max_iter)


def _contract_chains_loop(
    edges: DataFrame, labels: DataFrame, max_iter: int
) -> DataFrame:
    deg = endpoint_degrees(edges)
    deg2 = deg.where(F.col("degree") == 2).select("px", "py")

    # adjacency via degree-2 endpoints: (edge_id, other_edge_id)
    e1 = edges.select("edge_id", F.col("x1").alias("px"), F.col("y1").alias("py"))
    e2 = edges.select("edge_id", F.col("x2").alias("px"), F.col("y2").alias("py"))
    incid = e1.unionByName(e2).join(deg2, ["px", "py"], "inner")
    a = incid.alias("a")
    b = incid.alias("b")
    adj = (
        a.join(b, ["px", "py"])
        .where(F.col("a.edge_id") != F.col("b.edge_id"))
        .select(F.col("a.edge_id").alias("edge_id"), F.col("b.edge_id").alias("nbr"))
        .distinct()
    )

    # Iterative fixpoint.  Every round MUST eagerly checkpoint: the
    # step joins labels against a projection of themselves, so without
    # lineage truncation the plan doubles per round (2^rounds paths —
    # analysis alone goes exponential).  localCheckpoint materializes
    # the round and resets lineage to a constant-size scan.
    adj = _ckpt(adj)

    for _ in range(max_iter):
        # two hash-min+jump steps per checkpoint/probe round: halves
        # the fixed per-round job costs; the lazy plan between
        # checkpoints stays a bounded two-step chain.  The convergence
        # probe compares against the label AFTER the first step (`c0`
        # rides through the second step's lazy chain), so it detects
        # "one full step changed nothing" — for a monotone min step
        # that IS the fixpoint, and it saves the otherwise-needed
        # confirm round whenever convergence lands on an odd step.
        step = _label_step(adj, labels)
        step = step.withColumn("c0", F.col("chain_id"))
        step = _label_step(adj, step)
        nxt = _ckpt(step)
        changed = nxt.where(F.col("chain_id") != F.col("c0")).limit(1).count()
        labels = nxt.drop("c0")
        if changed == 0:
            break
    return edges.join(labels, "edge_id")


def _label_step(adj: DataFrame, lbl: DataFrame) -> DataFrame:
    """One hash-min + pointer-jump label-propagation step; passthrough
    columns beyond (edge_id, chain_id) — e.g. the fused convergence
    probe's `c0` — ride along untouched."""
    extra = [c for c in lbl.columns if c not in ("edge_id", "chain_id")]
    # hash-min step: take the min label across chain neighbors
    nbr_min = (
        adj.join(lbl.select("edge_id", "chain_id").withColumnRenamed("edge_id", "nbr"), "nbr")
        .groupBy("edge_id")
        .agg(F.min("chain_id").alias("nbr_chain"))
    )
    hashed = lbl.join(nbr_min, "edge_id", "left").select(
        "edge_id",
        F.least(
            F.col("chain_id"), F.coalesce(F.col("nbr_chain"), F.col("chain_id"))
        ).alias("chain_id"),
        *extra,
    )
    # pointer-jump step: chain_id <- label(chain_id).  Labels are
    # edge ids, so the label map doubles as a pointer table; the
    # combination converges in O(log diameter) rounds instead of
    # O(diameter) — the difference between ~20 and ~5 shuffles on
    # a long river chain, and what keeps this viable at planet
    # scale where chains between confluences run 10^3+ segments.
    jump = lbl.select(
        F.col("edge_id").alias("chain_id"), F.col("chain_id").alias("jumped")
    )
    return hashed.join(jump, "chain_id", "left").select(
        "edge_id",
        F.least(
            F.col("chain_id"), F.coalesce(F.col("jumped"), F.col("chain_id"))
        ).alias("chain_id"),
        *extra,
    )


def merge_chains(edges_with_chains: DataFrame) -> DataFrame:
    """Collapse each chain into one edge row: total length, max width,
    representative name (first non-null), member edge list."""
    return edges_with_chains.groupBy("chain_id").agg(
        F.sum("length").alias("length"),
        F.max("width").alias("width"),
        F.min("edge_id").alias("edge_id"),
        F.collect_list("edge_id").alias("member_edges"),
        F.first("name", ignorenulls=True).alias("name"),
    )


def _width_kernel(batches):
    """Single-task width fixpoint: vectorized one-hop relaxation until
    no width changes or _LOCAL_MAX_HOPS is hit.  Emits done=false with
    the partially relaxed (exactly resumable) state in the bounded
    case; max() over float64 is exact, so the converged result is
    bit-identical to the distributed relaxation's."""
    import numpy as np
    import pandas as pd

    dfs = list(batches)
    if not dfs:
        return
    pdf = pd.concat(dfs, ignore_index=True)
    n_pts, tail_idx, head_idx = _endpoint_indices(pdf)
    w = pdf["width"].to_numpy(dtype="float64", copy=True)
    msg = np.empty(n_pts, dtype="float64")
    done = False
    for _ in range(_LOCAL_MAX_HOPS):
        msg.fill(-np.inf)
        np.maximum.at(msg, head_idx, w)
        nw = np.maximum(w, msg[tail_idx])
        if np.array_equal(nw, w):
            done = True
            break
        w = nw
    out = pdf[["edge_id", "x1", "y1", "x2", "y2"]].copy()
    out["width"] = w
    out["done"] = done
    yield out


_WIDTH_KERNEL_SCHEMA = (
    "edge_id bigint, x1 double, y1 double, x2 double, y2 double, "
    "width double, done boolean"
)


def _window_hop(step: DataFrame) -> DataFrame:
    """One relaxation hop in window form: each edge emits a receiver
    row keyed by its tail and a message row keyed by its head (one
    explode — a SINGLE reference to `step`, so a chain of hops grows
    the logical plan linearly), and a partition-wide window max over
    the message rows delivers the upstream width.  One exchange per
    hop, zero joins — the join-form hop referenced `step` twice, so a
    4-hop round re-executed the prior hops under every message
    aggregation: 10 SortMergeJoins / 26 exchanges per round (measured,
    plans/r15/river_width_round_before.txt)."""
    tall = step.withColumn(
        "t",
        F.explode(
            F.array(
                F.struct(
                    F.col("x1").alias("kx"), F.col("y1").alias("ky"),
                    F.lit(True).alias("recv"),
                ),
                F.struct(
                    F.col("x2").alias("kx"), F.col("y2").alias("ky"),
                    F.lit(False).alias("recv"),
                ),
            )
        ),
    )
    win = Window.partitionBy(F.col("t.kx"), F.col("t.ky"))
    up = F.max(F.when(~F.col("t.recv"), F.col("width"))).over(win)
    return (
        tall.withColumn("up_width", up)
        .where(F.col("t.recv"))
        .withColumn(
            "width",
            F.greatest(F.col("width"), F.coalesce(F.col("up_width"), F.col("width"))),
        )
        .drop("t", "up_width")
    )


def propagate_width(
    edges: DataFrame,
    max_iter: int = 30,
    hops_per_round: int = 4,
    escalate_after_hops: int | None = 24,
) -> DataFrame:
    """Downstream max-width fixpoint (gen-rivers.cpp:83-120).

    edges: (edge_id, x1, y1 [tail], x2, y2 [head], width).  Flow is
    tail->head; each edge's width becomes the max of its own width
    and every upstream edge's (transitively).  Monotone + bounded =>
    terminates, cycles included.

    Strategy by measured size:
    - < _SMALL_GRAPH_EDGES: one local kernel pass (_width_kernel).
      If the kernel's hop bound trips (done=false), the partially
      relaxed state — exact to resume from, see module docstring —
      escalates to the chain-decomposition path, or, when escalation
      is disabled (the chained path's own junction solve), continues
      with distributed rounds.
    - >= _SMALL_GRAPH_EDGES: distributed window-form relaxation
      (_relax_rounds below).

    The loop frame is slimmed to (edge_id, tail, head, width) — the
    geometry/name columns would otherwise ride through every shuffle
    and checkpoint of every round; they are re-attached once at the
    end."""
    slim = edges.select("edge_id", "x1", "y1", "x2", "y2", "width")
    cur = _ckpt(slim)
    n_edges = cur.count()
    spark = edges.sparkSession
    if n_edges < _SMALL_GRAPH_EDGES:
        solved = _ckpt(
            cur.repartition(1).mapInPandas(_width_kernel, _WIDTH_KERNEL_SCHEMA)
        )
        pending = solved.where(~F.col("done")).limit(1).count()
        cur = solved.drop("done")
        if pending:
            if escalate_after_hops is not None:
                cur = _ckpt(propagate_width_chained(cur, max_iter=max_iter))
            else:
                with _small_graph_mode(spark, n_edges):
                    cur = _relax_rounds(cur, max_iter, hops_per_round, None)
    else:
        cur = _relax_rounds(cur, max_iter, hops_per_round, escalate_after_hops)
    return edges.drop("width").join(cur.select("edge_id", "width"), "edge_id")


def _relax_rounds(
    cur: DataFrame,
    max_iter: int,
    hops_per_round: int,
    escalate_after_hops: int | None,
) -> DataFrame:
    """Distributed relaxation: hops_per_round window-form hops chained
    lazily between checkpoints.  With the hop's linear plan growth the
    per-round cost is hops_per_round exchanges + one checkpoint + one
    probe job; hops_per_round=4 re-measured best at sf0.1 among
    {4, 8, 12, 24} (6.8 / 8.5 / 8.3 / 10.2 s interleaved medians) —
    bigger rounds waste hops past convergence (last change: hop 18
    there) because the probe only fires at round ends.

    The convergence probe compares against the width BEFORE the
    round's last hop (`w_pre` rides through the final lazy hop): a
    monotone hop that changes nothing IS the fixpoint, so convergence
    is detected in the round that reaches it instead of one confirm
    round later.

    escalate_after_hops: if still changing after this many hops, the
    graph has chains longer than one-hop relaxation can cheaply cover;
    hand the current (partially relaxed, exactly resumable) widths to
    propagate_width_chained.  None disables escalation (used by the
    chained path itself on the contracted junction graph)."""
    hops_done = 0
    for _ in range(max_iter):
        step = cur
        for _h in range(hops_per_round):
            if _h == hops_per_round - 1:
                step = step.withColumn("w_pre", F.col("width"))
            step = _window_hop(step)
        nxt = _ckpt(step)
        changed = nxt.where(F.col("width") != F.col("w_pre")).limit(1).count()
        cur = nxt.drop("w_pre")
        hops_done += hops_per_round
        if changed == 0:
            break
        if escalate_after_hops is not None and hops_done >= escalate_after_hops:
            cur = _ckpt(propagate_width_chained(cur, max_iter=max_iter))
            break
    return cur


def propagate_width_chained(
    edges: DataFrame, max_iter: int = 30
) -> DataFrame:
    """Downstream max-width via chain decomposition — the long-chain
    scale path, result-identical to propagate_width (tested).

    propagate_width's relaxation needs O(network diameter) one-hop
    joins; real river networks have chains of 10^3+ segments between
    confluences, so at planet scale that is thousands of shuffles.
    This path is O(log chain length + junction-graph diameter):

    1. contract degree-1-in/1-out runs into chains (label propagation
       with pointer jumping, O(log L) rounds);
    2. one applyInPandas pass per chain orders its edges by following
       tail->head links and computes the within-chain prefix max
       (closed interior cycles get the cycle max);
    3. the contracted junction graph (one edge per chain — orders of
       magnitude smaller) runs the plain relaxation fixpoint;
    4. edge width = max(within-chain prefix, inflow at the chain's
       entry junction).

    Interior endpoints have exactly one in- and one out-edge GLOBALLY,
    so no side branch can feed the middle of a chain — which is what
    makes the prefix/entry split exact.

    Cycle classification uses the GLOBAL interior flags, not the
    chain's own head set: a chain that leaves and re-enters the same
    junction (J->a->b->J with other edges at J) is NOT a closed
    interior cycle — its start is the unique edge whose tail is the
    non-interior junction, and it stays in the contracted graph as a
    self-loop so junction inflow reaches it.  Only a chain all of
    whose endpoint nodes are 1-in/1-out globally (no edge with a
    non-interior tail) is a closed interior cycle.

    Crossover point: the direct path's local kernel now covers every
    small graph in one pass; the chained path wins when chain length
    outgrows _LOCAL_MAX_HOPS or the graph outgrows one task, i.e.
    real river networks at scale.  The two are result-identical
    (tested)."""
    import pandas as pd

    base = _ckpt(edges.select("edge_id", "x1", "y1", "x2", "y2", "width"))
    n_edges = base.count()
    with _small_graph_mode(edges.sparkSession, n_edges):
        out = _propagate_width_chained_body(base, max_iter, pd)
    return edges.drop("width").join(out, "edge_id")


def _propagate_width_chained_body(edges: DataFrame, max_iter: int, pd) -> DataFrame:
    # ---- 1. chain labels over the directed interior adjacency
    heads = edges.select(F.col("x2").alias("px"), F.col("y2").alias("py"))
    tails = edges.select(F.col("x1").alias("px"), F.col("y1").alias("py"))
    indeg = heads.groupBy("px", "py").agg(F.count(F.lit(1)).alias("ind"))
    outdeg = tails.groupBy("px", "py").agg(F.count(F.lit(1)).alias("outd"))
    interior = (
        indeg.join(outdeg, ["px", "py"])
        .where((F.col("ind") == 1) & (F.col("outd") == 1))
        .select("px", "py")
    )
    up = edges.select(
        F.col("edge_id").alias("ue"), F.col("x2").alias("px"), F.col("y2").alias("py")
    )
    dn = edges.select(
        F.col("edge_id").alias("de"), F.col("x1").alias("px"), F.col("y1").alias("py")
    )
    link = up.join(interior, ["px", "py"]).join(dn, ["px", "py"]).select("ue", "de")
    adj = (
        link.select(F.col("ue").alias("edge_id"), F.col("de").alias("nbr"))
        .unionByName(link.select(F.col("de").alias("edge_id"), F.col("ue").alias("nbr")))
    )
    adj = _ckpt(adj)
    labels = _ckpt(edges.select("edge_id", F.col("edge_id").alias("chain_id")))
    for _ in range(max_iter):
        # same step-boundary probe as _contract_chains_loop
        step = _label_step(adj, labels)
        step = step.withColumn("c0", F.col("chain_id"))
        step = _label_step(adj, step)
        nxt = _ckpt(step)
        changed = nxt.where(F.col("chain_id") != F.col("c0")).limit(1).count()
        labels = nxt.drop("c0")
        if changed == 0:
            break

    # ---- 2. per-chain prefix max + chain summary (one kernel pass).
    # tail_int marks edges whose tail node is interior GLOBALLY: the
    # chain's start edge is the unique one with a non-interior tail
    # (every non-first edge's tail is an interior link point).
    tail_flag = (
        edges.select("edge_id", F.col("x1").alias("px"), F.col("y1").alias("py"))
        .join(interior.withColumn("ti", F.lit(True)), ["px", "py"], "left")
        .select("edge_id", F.coalesce("ti", F.lit(False)).alias("tail_int"))
    )
    chained = (
        edges.select("edge_id", "x1", "y1", "x2", "y2", "width")
        .join(tail_flag, "edge_id")
        .join(labels, "edge_id")
    )

    def scan(pdf: pd.DataFrame) -> pd.DataFrame:
        by_tail = {}
        for i, r in pdf.iterrows():
            by_tail[(r.x1, r.y1)] = i
        start = None
        for i, r in pdf.iterrows():
            if not r.tail_int:
                start = i
                break
        rows = []
        if start is None:
            # closed interior cycle (every endpoint node is 1-in/1-out
            # globally, so nothing outside can feed it): every edge
            # sees the whole cycle
            cmax = float(pdf.width.max())
            for _, r in pdf.iterrows():
                rows.append((int(r.edge_id), cmax, None, None, None, None, cmax))
            return pd.DataFrame(
                rows,
                columns=["edge_id", "pm", "ex1", "ey1", "ex2", "ey2", "chain_max"],
            )
        order = []
        i = start
        seen = set()
        while i is not None and i not in seen:
            seen.add(i)
            order.append(i)
            i = by_tail.get((pdf.at[i, "x2"], pdf.at[i, "y2"]))
        pm = float("-inf")
        first, last = order[0], order[-1]
        for i in order:
            pm = max(pm, float(pdf.at[i, "width"]))
            rows.append(
                (
                    int(pdf.at[i, "edge_id"]),
                    pm,
                    float(pdf.at[first, "x1"]),
                    float(pdf.at[first, "y1"]),
                    float(pdf.at[last, "x2"]),
                    float(pdf.at[last, "y2"]),
                    0.0,  # patched below with the full chain max
                )
            )
        cmax = rows[-1][1]
        rows = [r[:6] + (cmax,) for r in rows]
        return pd.DataFrame(
            rows, columns=["edge_id", "pm", "ex1", "ey1", "ex2", "ey2", "chain_max"]
        )

    scanned = (
        chained.groupBy("chain_id")
        .applyInPandas(
            scan,
            "edge_id bigint, pm double, ex1 double, ey1 double, "
            "ex2 double, ey2 double, chain_max double",
        )
        .join(labels, "edge_id")
    )
    scanned = _ckpt(scanned)

    # ---- 3. relaxation on the contracted junction graph (tiny)
    contracted = (
        scanned.where(F.col("ex1").isNotNull())
        .groupBy("chain_id")
        .agg(
            F.first("ex1").alias("x1"), F.first("ey1").alias("y1"),
            F.first("ex2").alias("x2"), F.first("ey2").alias("y2"),
            F.first("chain_max").alias("width"),
        )
        .withColumnRenamed("chain_id", "edge_id")
    )
    # escalation off: on a junction-only graph the chained path would
    # contract to itself and recurse forever
    solved = propagate_width(contracted, max_iter=max_iter, escalate_after_hops=None)

    # ---- 4. inflow at each chain entry = max solved width over the
    # chains whose exit feeds it; edge width = max(prefix, inflow)
    inflow = (
        solved.alias("u")
        .join(
            contracted.alias("d"),
            (F.col("u.x2") == F.col("d.x1")) & (F.col("u.y2") == F.col("d.y1")),
        )
        .groupBy(F.col("d.edge_id").alias("chain_id"))
        .agg(F.max(F.col("u.width")).alias("in_max"))
    )
    return (
        scanned.join(inflow, "chain_id", "left")
        .select(
            "edge_id",
            F.greatest(
                F.col("pm"), F.coalesce(F.col("in_max"), F.col("pm"))
            ).alias("width"),
        )
    )
