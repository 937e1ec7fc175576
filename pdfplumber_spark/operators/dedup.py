"""Corpus deduplication operators: exact, MinHash-LSH, SimHash, n-gram
Jaccard — the training-data-pipeline layer over the extraction engine.

Scale design notes (100 TB):

- exact: one shuffle on the content hash; map-side partial agg first.
- MinHash-LSH: signatures via Arrow kernel (no per-row Python), band
  explode -> groupBy band bucket -> pair generation *within* buckets only
  (never a corpus cross-join). Bucket skew (boilerplate-identical docs) is
  capped with a per-bucket limit + AQE skew splitting.
- SimHash: 4x16-bit band index -> candidate pairs -> exact hamming filter.
- n-gram Jaccard: token explode -> inverted index join on token -> pair
  co-count -> |A∩B| / (|A|+|B|-|A∩B|); document-frequency cap drops
  stop-tokens before the join (the classic posting-list explosion guard).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F, types as T


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Keep the min-id row per exact text duplicate group (md5 content key)."""
    w = Window.partitionBy(F.md5(F.col(text_col))).orderBy(F.col(id_col))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def duplicate_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact-dup group stats: (content_md5, n_docs, keeper_id)."""
    return df.groupBy(F.md5(F.col(text_col)).alias("content_md5")).agg(
        F.count("*").alias("n_docs"),
        F.min(id_col).alias("keeper_id"),
    )


# --- MinHash LSH -------------------------------------------------------------

def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, num_perm: int = 64, k: int = 5
) -> DataFrame:
    """(id, signature array<long>) via the Arrow-batched kernel (round-8:
    whole-batch vectorized shingle hashing, minhash_signatures_batch —
    signatures identical to the per-doc scalar kernel)."""
    from ..kernel.textstats import minhash_signatures_batch

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("signature", T.ArrayType(T.LongType()), False),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            sigs = minhash_signatures_batch(
                list(b[text_col]), num_perm=num_perm, k=k
            )
            yield pd.DataFrame(
                {"doc_id": b[id_col], "signature": list(sigs.tolist())}
            )

    # NOTE on parallelism: no repartition here — the sliced board inputs
    # (doc_id < 300) are constant-size at any SF and an exchange costs more
    # than the kernel; full-corpus callers spread BEFORE calling (see
    # q_minhash_pairs_scale) or read multi-split tables where the scan
    # parallelizes naturally.
    return df.select(id_col, text_col).mapInPandas(run, schema=schema)


def minhash_lsh_candidates(
    sigs: DataFrame,
    bands: int = 16,
    max_bucket: int = 50,
) -> DataFrame:
    """Banding LSH: same-band-hash docs become candidate pairs.

    Returns (doc_a, doc_b, est_jaccard). ``max_bucket`` caps pathological
    buckets (every-doc-identical boilerplate) — dropped buckets are exact-dup
    territory handled by ``exact_dedup`` anyway.
    """
    # the banded table feeds both sides of the self-join; materialize so
    # the signature kernel (full text scan upstream) runs once, not twice
    # (same reasoning as simhash_near_pairs; spillable at corpus scale).
    # Registered for pdfplumber_spark.unpersist_all() — the lazy result
    # still needs the cache, so eviction is the caller's post-action call.
    from ._cache import persist_tracked

    sigs = persist_tracked(sigs)
    rows_per_band = F.floor(F.size("signature") / bands).cast("int")
    banded = sigs.select(
        "doc_id",
        "signature",
        F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias("band"),
    ).select(
        "doc_id",
        "signature",
        "band",
        F.xxhash64(
            F.slice(
                "signature",
                (F.col("band") * rows_per_band + 1).cast("int"),
                rows_per_band,
            ),
            "band",
        ).alias("bucket"),
    )
    w = Window.partitionBy("bucket")
    banded = banded.withColumn("_bn", F.count("*").over(w)).where(
        F.col("_bn") <= max_bucket
    )
    a = banded.alias("a")
    b = banded.alias("b")
    # est_jaccard computed map-side BEFORE dropDuplicates: the dedup shuffle
    # then moves (long, long, double) per candidate instead of two
    # num_perm-long signature arrays (est is deterministic per pair, so any
    # surviving duplicate row carries the same value)
    est = F.size(
        F.filter(
            F.zip_with("a.signature", "b.signature", lambda x, y: x == y),
            lambda m: m,
        )
    ) / F.size("a.signature")
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            est.alias("est_jaccard"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )


def minhash_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.8,
    num_perm: int = 64,
    bands: int = 16,
) -> DataFrame:
    """Near-dup removal, greedy pair-drop: drop the higher id of every pair
    above threshold.

    Semantics note: greedy pair-drop keeps every doc that is never a
    ``doc_b``; on a chain A~B~C it drops both B and C even though C's only
    near-dup (B) was itself dropped. ``minhash_dedup_cc`` is the
    cluster-aware upgrade (component_min keeps exactly one doc per
    connected component; independent_set keeps C in that chain)."""
    sigs = minhash_signatures(df, id_col, text_col, num_perm=num_perm)
    pairs = minhash_lsh_candidates(sigs, bands=bands)
    losers = (
        pairs.where(F.col("est_jaccard") >= threshold)
        .select(F.col("doc_b").alias(id_col))
        .distinct()
    )
    return df.join(losers, id_col, "left_anti")


def _ckpt_rdd(df: DataFrame):
    """The persisted JVM RDD backing a localCheckpoint'ed DataFrame (its
    analyzed plan is a LogicalRDD whose ``rdd`` field IS the checkpoint).
    Explicit handles let superseded per-round checkpoints be released
    deterministically — GC-driven ContextCleaner reclamation proved
    unreliable inside long sessions (round-7 soak-test finding: 5
    localCheckpoint RDDs survived blocking unpersist + 10 s of forced
    GC in 1-of-2 full-suite runs)."""
    try:
        return df._jdf.queryExecution().analyzed().rdd()
    except Exception:  # noqa: BLE001 — non-LogicalRDD plan shape
        return None


def _release_ckpt(df: DataFrame, blocking: bool = False) -> None:
    """Unpersist a SUPERSEDED checkpoint's blocks. Only call once every
    consumer of the DataFrame has materialized — the lineage is
    truncated, so the data cannot be recomputed afterwards."""
    r = _ckpt_rdd(df)
    if r is not None:
        try:
            r.unpersist(blocking)
        except Exception:  # noqa: BLE001 — context may be stopping
            pass


class _CheckpointHandle:
    """Registry shim: lets ``unpersist_all()`` release the FINAL
    checkpoint backing an operator's returned DataFrame (same contract
    as cached intermediates: evict after the caller's terminal
    action).

    SHARPENED CONTRACT (round-7 advice): unlike a cached intermediate,
    an unpersisted localCheckpoint CANNOT be recomputed — after
    ``unpersist_all()`` (or a registry overflow eviction) any further
    action on a retained ``connected_components`` /
    ``minhash_dedup_cc`` result fails hard instead of recomputing
    slowly. Callers must treat those results as consumed once they call
    ``unpersist_all()``."""

    __slots__ = ("_jrdd",)

    def __init__(self, jrdd):
        self._jrdd = jrdd

    def unpersist(self, blocking: bool = False):
        if self._jrdd is not None:
            self._jrdd.unpersist(blocking)


def _track_final_ckpt(df: DataFrame) -> DataFrame:
    from ._cache import track

    r = _ckpt_rdd(df)
    if r is not None:
        track(_CheckpointHandle(r))
    return df


def connected_components(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iters: int = 20,
    algorithm: str = "label_prop",
) -> DataFrame:
    """(node, component) for the undirected pair graph; ``component`` is the
    smallest node id in each connected component.

    ``algorithm="label_prop"`` (default) converges in diameter rounds —
    right for near-dup graphs (dense clusters, diameter ~2 at any scale).
    ``algorithm="star"`` is the large-star/small-star alternation
    (Kiveris et al., 2014): O(log n) rounds on ANY graph shape, the
    swap-in when components can be long and thin; cross-validated against
    label_prop on randomized graphs in tests/test_cc_dedup.py.

    Min-label propagation to a fixed point: every round each node takes the
    min of its own label and its neighbours' labels — one equi-join + one
    partial-aggregated groupBy per round, all shuffles on the node key.
    Rounds needed = graph diameter; near-dup graphs are dense clusters with
    tiny diameter (a boilerplate cluster is diameter ~2 at any scale), so
    this converges in a handful of rounds where generic graphs would want
    the O(log n) large-star/small-star variant (Kiveris et al., 2014) —
    documented as the swap-in if components ever get long and thin.

    Each round's labels table is ``localCheckpoint``-ed (eager): the round
    references the previous labels TWICE (join + union), so without lineage
    truncation the logical plan doubles per round — exponential analysis
    cost by round ~8 (measured). Checkpointing also makes the returned
    DataFrame a plan-stable LogicalRDD with no dependency on ``edges``, so
    the edge cache is evicted in-function (try/finally). Superseded
    per-round checkpoint blocks are released EXPLICITLY as soon as the
    next round materializes (round-7 fix: GC-driven ContextCleaner
    reclamation leaked across long sessions), and the final checkpoint
    registers with the eviction registry so ``unpersist_all()`` frees it
    after the caller's terminal action. On a real cluster prefer
    ``spark.sparkContext.setCheckpointDir`` + ``.checkpoint()`` for
    executor-loss resilience (SCALE.md §4)."""
    if algorithm == "star":
        canon = (
            pairs.select(
                F.least(a_col, b_col).alias("a"),
                F.greatest(a_col, b_col).alias("b"),
            )
            .where(F.col("a") != F.col("b"))
            .distinct()
        )
        return _cc_star(canon, max_iters)
    if algorithm != "label_prop":
        raise ValueError(f"unknown algorithm {algorithm!r}")
    edges = (
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .union(
            pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst"))
        )
        .distinct()
        .persist()
    )
    try:
        labels = (
            edges.select(F.col("src").alias("node"))
            .distinct()
            .select("node", F.col("node").alias("label"))
            .localCheckpoint()
        )
        ck_handle = labels  # the df whose analyzed plan IS the checkpoint
        converged = False
        for _ in range(max_iters):
            prop = edges.join(
                labels.select(F.col("node").alias("src"), "label"), "src"
            ).select(
                F.col("dst").alias("node"), "label",
                F.lit(None).cast("long").alias("_own"),
            )
            # carry each node's PREVIOUS label through the min-aggregation
            # (round-8): the convergence check becomes a cheap scan of the
            # freshly checkpointed table instead of a join back to the old
            # labels — one shuffle-join per round removed, rounds unchanged
            new = (
                prop.union(
                    labels.select("node", "label", F.col("label").alias("_own"))
                )
                .groupBy("node")
                .agg(
                    F.min("label").alias("label"),
                    F.min("_own").alias("_old"),
                )
                .localCheckpoint()
            )
            changed = new.where(F.col("label") < F.col("_old")).count()
            # `new` is materialized (eager checkpoint) and `changed`
            # consumed the old labels — release the superseded round now
            _release_ckpt(ck_handle)
            ck_handle = new
            labels = new.select("node", "label")
            if changed == 0:
                converged = True
                break
        if not converged:
            # Silent wrong components are worse than a loud failure: a
            # diameter > max_iters graph would keep several labels per
            # component. algorithm="star" needs only O(log n) rounds.
            _release_ckpt(ck_handle)
            raise RuntimeError(
                f"connected_components(label_prop) did not converge in "
                f"{max_iters} rounds (graph diameter exceeds max_iters); "
                f"raise max_iters or use algorithm='star' (O(log n) rounds)"
            )
    finally:
        edges.unpersist()
    _track_final_ckpt(ck_handle)
    return labels.select("node", F.col("label").alias("component"))


def _cc_star(canon: DataFrame, max_iters: int) -> DataFrame:
    """Large-star/small-star alternation (Kiveris et al., MR'14 §3).

    Each phase is expressed WITHOUT per-node adjacency lists: the per-node
    minimum ``m(u) = min(Γ(u) ∪ {u})`` is a groupBy-min (partial-agg
    shuffle on the node key), joined back to the symmetric edge view —
    hub nodes never materialize their neighbor list on one row, which is
    exactly why this shape survives power-law degree graphs at corpus
    scale. large-star hangs every neighbor v > u onto m(u); small-star
    re-hangs the v <= u side; O(log n) alternations flatten every
    component into a star around its minimum. Convergence = canonical
    edge set unchanged over one large+small cycle (exceptAll both ways);
    per-phase localCheckpoint truncates lineage as in label_prop."""
    cur = canon.localCheckpoint()
    cur_count = cur.count()
    stable = False
    for _ in range(max_iters):
        prev = cur
        prev_count = cur_count
        superseded = []
        for phase in ("large", "small"):
            sym = cur.select(
                F.col("a").alias("u"), F.col("b").alias("v")
            ).union(cur.select(F.col("b").alias("u"), F.col("a").alias("v")))
            m = (
                sym.groupBy("u")
                .agg(F.min("v").alias("_mn"))
                .select("u", F.least("u", "_mn").alias("m"))
            )
            j = sym.join(m, "u")
            if phase == "large":
                out = j.where(F.col("v") > F.col("u")).select(
                    F.col("v").alias("x"), F.col("m").alias("y")
                )
            else:
                out = j.where(F.col("v") <= F.col("u")).select(
                    F.col("v").alias("x"), F.col("m").alias("y")
                ).union(
                    m.select(F.col("u").alias("x"), F.col("m").alias("y"))
                )
            superseded.append(cur)
            cur = (
                out.select(
                    F.least("x", "y").alias("a"),
                    F.greatest("x", "y").alias("b"),
                )
                .where(F.col("a") != F.col("b"))
                .distinct()
                .localCheckpoint()
            )
        # convergence = canonical DISTINCT edge sets equal. Equal sizes +
        # one-sided emptiness imply set equality, so the second exceptAll
        # join of the pre-round-8 check is redundant (and the count short-
        # circuits it entirely when sizes differ); prev's count is carried
        # from the previous cycle, costing one cheap scan per cycle total.
        cur_count = cur.count()
        stable = (
            cur_count == prev_count and cur.exceptAll(prev).count() == 0
        )
        # both exceptAll counts consumed prev (= superseded[0]) and the
        # intra-cycle intermediate — release their checkpoint blocks
        # explicitly (round-7 leak fix; see _ckpt_rdd)
        for s in superseded:
            _release_ckpt(s)
        if stable:
            break
    if not stable:
        _release_ckpt(cur)
        raise RuntimeError(
            f"connected_components(star) did not converge in {max_iters} "
            f"large/small-star cycles; raise max_iters"
        )
    _track_final_ckpt(cur)
    # at convergence every edge is (component_min, member)
    sym = cur.select(F.col("a").alias("node"), F.col("b").alias("other")).union(
        cur.select(F.col("b").alias("node"), F.col("a").alias("other"))
    )
    return (
        sym.groupBy("node")
        .agg(F.min("other").alias("_mn"))
        .select("node", F.least("node", "_mn").alias("component"))
    )


def _mis_with_fallback(
    pairs: DataFrame, cc: DataFrame, id_col: str, mis_max_component: int
) -> DataFrame:
    """Losers under the per-component maximal-independent-set rule, with a
    ``component_min`` fallback for components above ``mis_max_component``
    nodes (those are never fed to the single-task ``applyInPandas``)."""
    # size gate: one groupBy-count over the labels (shuffle on the
    # component key, partial-agg combined map-side)
    sizes = cc.groupBy("component").agg(F.count("*").alias("_csize"))
    labeled = cc.join(sizes, "component")
    # mega-components: never materialized in one task — component_min
    big_losers = labeled.where(
        (F.col("_csize") > mis_max_component)
        & (F.col("node") != F.col("component"))
    ).select(F.col("node").alias(id_col))
    small = labeled.where(F.col("_csize") <= mis_max_component).select(
        F.col("node").alias("doc_a"), "component"
    )
    with_comp = pairs.join(small, "doc_a").select(
        "component", "doc_a", "doc_b"
    )

    def _mis_losers(pdf: pd.DataFrame) -> pd.DataFrame:
        adj: dict = {}
        for a, b in zip(pdf["doc_a"], pdf["doc_b"]):
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        retained: set = set()
        dropped = []
        for node in sorted(adj):
            if adj[node] & retained:
                dropped.append(node)
            else:
                retained.add(node)
        return pd.DataFrame({"loser": dropped})

    return (
        with_comp.groupBy("component")
        .applyInPandas(_mis_losers, schema="loser long")
        .select(F.col("loser").alias(id_col))
        .unionByName(big_losers)
    )


def minhash_threshold_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.8,
    num_perm: int = 64,
    bands: int = 16,
) -> DataFrame:
    """The >=threshold near-dup pair graph (signatures -> banding LSH ->
    est_jaccard filter) — the shared front half of ``minhash_dedup_cc``,
    exposed so callers running SEVERAL component algorithms over the SAME
    graph (e.g. the board's labelprop+star row) compute signatures and
    banding once and persist the pairs, instead of once per algorithm."""
    sigs = minhash_signatures(df, id_col, text_col, num_perm=num_perm)
    return minhash_lsh_candidates(sigs, bands=bands).where(
        F.col("est_jaccard") >= threshold
    )


def minhash_dedup_cc(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.8,
    num_perm: int = 64,
    bands: int = 16,
    keeper: str = "component_min",
    mis_max_component: int = 100_000,
    cc_algorithm: str = "label_prop",
    pairs: DataFrame | None = None,
) -> DataFrame:
    """Cluster-aware near-dup removal over the MinHash pair graph.

    ``keeper="component_min"``: keep exactly the smallest id of every
    connected component (the standard web-dedup rule — one representative
    per duplicate cluster). SQL-oracle-checkable: the driver board's
    ``minhash_dedup_cc`` row recomputes components with a recursive CTE
    over the materialized pairs parquet.

    ``keeper="independent_set"``: datasketch-style sequential semantics —
    scan ids ascending, drop a doc only if it is near a RETAINED doc. On a
    chain A~B~C (A≁C) this keeps A and C, dropping only B, where both
    greedy pair-drop and component_min would also drop C. Computed as a
    per-component maximal independent set inside ``applyInPandas`` — the
    component id is the shuffle key and near-dup components are small by
    construction (the per-bucket cap bounds them), so no single group can
    blow up an executor. As a hard backstop, components larger than
    ``mis_max_component`` nodes (boilerplate mega-clusters can reach 10^6
    docs at corpus scale) skip the single-task MIS and fall back to the
    ``component_min`` rule — for a giant cluster of mutual near-dups the
    two policies agree except at chain edges, and an OOM-shaped plan is
    never built.

    ``cc_algorithm`` selects the component solver: ``label_prop``
    (default — diameter rounds, right for dense near-dup clusters) or
    ``star`` (Kiveris large/small-star, O(log n) rounds on any shape).
    Survivor sets are identical; only the round structure differs.

    ``pairs`` may carry a precomputed (ideally persisted)
    ``minhash_threshold_pairs`` graph so multiple calls share one
    signature+banding pass (round-8)."""
    if pairs is None:
        pairs = minhash_threshold_pairs(
            df, id_col, text_col, threshold, num_perm, bands
        )
    cc = connected_components(pairs, algorithm=cc_algorithm)
    if keeper == "component_min":
        losers = cc.where(F.col("node") != F.col("component")).select(
            F.col("node").alias(id_col)
        )
    elif keeper == "independent_set":
        losers = _mis_with_fallback(pairs, cc, id_col, mis_max_component)
    else:
        raise ValueError(f"unknown keeper {keeper!r}")
    return df.join(losers, id_col, "left_anti")


# deterministic boilerplate-skew fixture shared by the entry query and the
# single-process oracle builder (sources/expected.py): replicate one doc's
# text under fresh ids so every band bucket of that text exceeds max_bucket
SKEW_N_REPLICAS = 120
SKEW_ID_START = 100_000


def with_boilerplate_skew(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    base_id: int = 0,
    n_replicas: int = SKEW_N_REPLICAS,
    id_start: int = SKEW_ID_START,
) -> DataFrame:
    """Append ``n_replicas`` copies of ``base_id``'s text under fresh ids —
    the boilerplate mega-bucket family. With the default minhash settings
    the replica group lands 121 deep in every one of its 16 band buckets,
    far past ``max_bucket=50``, so the per-bucket cap MUST drop all of its
    pairs (identical text is exact-dup territory) while ordinary near-pairs
    still surface. The board row checks this drop behaviour distributed
    (window count over the bucket key) vs single-process (dict counting)."""
    base = df.where(F.col(id_col) == base_id).select(
        F.col(text_col).alias("_t")
    )
    reps = base.crossJoin(df.sparkSession.range(n_replicas)).select(
        (F.col("id") + F.lit(id_start)).cast("long").alias(id_col),
        F.col("_t").alias(text_col),
    )
    return df.select(id_col, text_col).unionByName(reps)


# --- SimHash -----------------------------------------------------------------

def simhash_table(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    from ..kernel.textstats import simhash64_batch

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("simhash", T.LongType(), False),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            yield pd.DataFrame(
                {
                    "doc_id": b[id_col],
                    "simhash": simhash64_batch(list(b[text_col])),
                }
            )

    return df.select(id_col, text_col).mapInPandas(run, schema=schema)


def simhash_band_bounds(max_hamming: int, n_bands: int = 4) -> list[tuple[int, int]]:
    """(shift, width) per band for multi-index hashing. Generalized
    pigeonhole: a pair differing in <= max_hamming bits has per-band distance
    <= floor(max_hamming / n_bands) in at least one of the n_bands disjoint
    bands (else total >= n_bands * (floor+1) > max_hamming)."""
    if not 0 <= max_hamming <= 63:
        raise ValueError(f"max_hamming must be in [0, 63], got {max_hamming}")
    if not 1 <= n_bands <= 64:
        raise ValueError(f"n_bands must be in [1, 64], got {n_bands}")
    bounds = [i * 64 // n_bands for i in range(n_bands + 1)]
    return [(lo, hi - lo) for lo, hi in zip(bounds, bounds[1:])]


def _hamming_ball_masks(width: int, radius: int) -> list[int]:
    """All XOR masks of popcount <= radius over `width` bits (the hamming
    ball around 0); C(width,0..radius) masks."""
    import itertools

    out = [0]
    for r in range(1, radius + 1):
        for bits in itertools.combinations(range(width), r):
            m = 0
            for bit in bits:
                m |= 1 << bit
            out.append(m)
    return out


def simhash_near_pairs(
    hashes: DataFrame, max_hamming: int = 3, n_bands: int = 4
) -> DataFrame:
    """Exact near-pairs within hamming distance via multi-index hashing
    (Norouzi/Punjani/Fleet, CVPR'12): block on n_bands wide disjoint bands,
    expanding the PROBE side's band key to its hamming ball of radius
    floor(max_hamming / n_bands). Recall is total for the requested radius
    (generalized pigeonhole), while bucket keys stay wide (16-bit for the
    default 4 bands -> 65k buckets/band), so per-bucket fan-out stays tiny at
    web scale — unlike max_hamming+1 narrow exact bands, whose ~9-bit keys
    collapse to 512 buckets and go quadratic. Probe-side blow-up is
    sum(C(width, 0..t)) keys per band (17 for width=16, t=1)."""
    per_band_radius = max_hamming // n_bands
    bands = simhash_band_bounds(max_hamming, n_bands)
    # both self-join branches consume `hashes`; without materialization the
    # signature stage (a full text scan upstream) runs TWICE — the probe
    # branch's explode makes the subplans non-identical, so ReusedExchange
    # never applies and the broadcast side rebuilds from source. 16 B/doc
    # cached vs re-scanning the corpus. Evict via unpersist_all().
    from ._cache import persist_tracked

    hashes = persist_tracked(hashes)
    exact = hashes.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftrightunsigned("simhash", shift)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("key"),
                    )
                    for i, (shift, width) in enumerate(bands)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "simhash", "bk.band", "bk.key")
    if per_band_radius == 0:
        probe = exact
    else:
        masks_by_band = {
            i: _hamming_ball_masks(width, per_band_radius)
            for i, (_, width) in enumerate(bands)
        }
        probe = exact.select(
            "doc_id",
            "simhash",
            "band",
            F.explode(_chained_band_masks(masks_by_band)).alias("key"),
        )
    a, b = probe.alias("a"), exact.alias("b")
    hamming = F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b"))).cast("long")
    # hamming filter BEFORE dropDuplicates: bit_count is a cheap map-side
    # expression, so the dedup shuffle carries only true near-pairs instead
    # of every band-collision candidate (orders of magnitude at scale)
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("h_a"),
            F.col("b.simhash").alias("h_b"),
        )
        .withColumn("hamming", hamming)
        .where(F.col("hamming") <= max_hamming)
        .dropDuplicates(["doc_a", "doc_b"])
        .select("doc_a", "doc_b", "hamming")
    )


def _chained_band_masks(masks_by_band: dict[int, list[int]]):
    """CASE band WHEN i THEN array(key ^ m...) — one array literal per band
    (band widths can differ when n_bands doesn't divide 64)."""
    expr = None
    for i, masks in masks_by_band.items():
        arr = F.array(*[F.col("key").bitwiseXOR(F.lit(m)) for m in masks])
        expr = F.when(F.col("band") == i, arr) if expr is None else expr.when(
            F.col("band") == i, arr
        )
    return expr


# --- n-gram Jaccard ----------------------------------------------------------

def token_sets(df: DataFrame, id_col: str, text_col: str, n: int = 1) -> DataFrame:
    """(doc_id, token) distinct pairs; word n-grams via sliding zip."""
    words = df.select(
        F.col(id_col).alias("doc_id"),
        F.split(F.lower(F.col(text_col)), r"\s+").alias("ws"),
    )
    if n == 1:
        tok = F.explode("ws").alias("token")
        return words.select("doc_id", tok).where(F.col("token") != "").distinct()
    # n-gram: join consecutive slices
    grams = F.transform(
        F.sequence(F.lit(0), F.size("ws") - n),
        lambda i: F.concat_ws(" ", F.slice("ws", i + 1, n)),
    )
    return (
        words.select("doc_id", F.explode(grams).alias("token"))
        .where(F.col("token") != "")
        .distinct()
    )


def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 1,
    threshold: float = 0.5,
    max_doc_freq: int = 1000,
) -> DataFrame:
    """All pairs with token-set Jaccard >= threshold.

    Inverted-index join; ``max_doc_freq`` drops stop-tokens whose posting
    lists would explode the join (at corpus scale this cap is essential).
    """
    # Round-8 shape: both per-key statistics are WINDOW counts — set_size
    # over the doc key, then doc-frequency over the token key — so the
    # token-window exchange leaves the table hash-partitioned by token and
    # the self-join below reuses that partitioning (no per-side re-shuffle,
    # no groupBy+join-back per statistic). set_size rides the posting rows
    # into the pair aggregation (min() of a per-doc-constant), which
    # removes the two post-aggregation size joins entirely; the division is
    # the same int/int arithmetic as before (identical doubles).
    toks = token_sets(df, id_col, text_col, n=n)
    wd = Window.partitionBy("doc_id")
    wt = Window.partitionBy("token")
    filtered = (
        toks.withColumn("set_size", F.count("*").over(wd))
        .withColumn("_df", F.count("*").over(wt))
        .where(F.col("_df") <= max_doc_freq)
        .drop("_df")
    )
    a, b = filtered.alias("a"), filtered.alias("b")
    # size-ratio prefilter (lossless): jaccard(A,B) <= min|.|/max|.|, so a
    # pair whose size ratio is already below threshold can never pass — this
    # prunes the O(sum df^2) pair blowup before the expensive co-count
    size_ok = (
        F.least(F.col("a.set_size"), F.col("b.set_size"))
        >= F.lit(threshold) * F.greatest(F.col("a.set_size"), F.col("b.set_size"))
    )
    inter = (
        a.join(
            b,
            (F.col("a.token") == F.col("b.token"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & size_ok,
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(
            F.count("*").alias("inter"),
            F.min(F.col("a.set_size")).alias("size_a"),
            F.min(F.col("b.set_size")).alias("size_b"),
        )
    )
    out = (
        inter.select(
            "doc_a",
            "doc_b",
            (
                F.col("inter")
                / (F.col("size_a") + F.col("size_b") - F.col("inter"))
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )
    return out
