"""Integer-exact k-means (Lloyd) over the embeddings table.

The classic corpus-organization step (topic bucketing, IVF-style coarse
partitioning, stratified corpus audits) as a batch operator whose result is
BIT-IDENTICAL across Spark, DuckDB, and a pure-Python reference — which no
float k-means can promise (group sums are order-dependent doubles). The
trick is the repo's integerization discipline (the embedding_quantize /
drift / bootstrap lineage):

  * vectors integerize ONCE per dim with a shared double expression
    ``floor(CAST(x AS DOUBLE) * 1000.0 + 0.5)`` (float→double is exact, the
    multiply/add are single IEEE ops both engines evaluate identically,
    floor sidesteps the round() half-even-vs-half-away tie split), clamped
    to ±SHIFT then SHIFTED to non-negative — Spark's ``div`` truncates
    toward zero while DuckDB's ``//`` floors, so every quantity that meets
    an integer division must be non-negative (the CLAUDE.md drift rule);
  * distances are exact BIGINT sums of squared differences (the shift
    cancels); the argmin tie-break is (dist2, cid) — a total order;
  * centroid update is the truncating integer mean ``sum div n`` (exact in
    both engines on the non-negative sums); an EMPTY cluster keeps its
    previous centroid;
  * init is deterministic: the K vectors with the smallest
    (md5-60(vec_id), vec_id) — the engine-neutral hash family
    (functions/hashing.py), no RNG, stable under any partitioning.

Scale shape (100 TB): each Lloyd round is ONE narrow scan (column-pruned to
vec_id + embedding) + a two-phase hash aggregate onto K groups — map-side
partial rows are K per task, the Exchange carries K × partitions rows, and
the K×(D+1) sums collect to the driver (bounded by the k/dim ARGUMENTS, the
similarity ≤64-query precedent — never data-sized). Assignment is a pure
codegen integer expression over centroid LITERALS: no join, no broadcast,
no Python, no HOF anywhere. n_iter rounds = n_iter+1 scans, the honest
Lloyd cost; nothing is cached because at target scale the input does not
fit memory and the scan is the cheap part.

Overflow audit: coordinates are in [0, 2·SHIFT] after clamp+shift, so
dist2 ≤ D·(2·SHIFT)² ≈ 2.7e8; per-cluster BIGINT sums of dist2/coords stay
below 2^63 up to ~3.4e10 member rows per cluster — beyond that, shard the
inertia aggregate (documented boundary, same class as geo_velocity's bound).

Oracle: the iteration UNROLLED into a c0..cK CTE chain (the pagerank /
k_core discipline), every CTE AS MATERIALIZED (DuckDB's default CTE
inlining is exponential in unroll depth — the k_core finding). The oracle
is exact at ANY cardinality: every intermediate is integer.
"""

from __future__ import annotations

from functools import reduce

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window, functions as F
from pyspark.sql import types as T

from logstash_filter_geoip_spark.functions.hashing import (md5_hash60,
                                                           md5_hash60_sql)

K_CLUSTERS = 8
N_ITER = 3
DIM = 64
SCALE = 1000.0   # quantization step: floor(x * SCALE + 0.5)
SHIFT = 1024     # clamp bound; shifted coords live in [0, 2*SHIFT]


# ---------------------------------------------------------------------------
# the ONE integerization rule (both engines read these two functions)
# ---------------------------------------------------------------------------


def _int_dim_col(emb_col: str, i: int):
    """Spark: clamped-shifted integer coordinate i (BIGINT, non-negative)."""
    q = F.floor(F.get(F.col(emb_col), i).cast("double")
                * F.lit(SCALE) + F.lit(0.5))
    return (F.least(F.greatest(q, F.lit(-SHIFT)), F.lit(SHIFT))
            + F.lit(SHIFT))


def _int_dim_sql(emb_expr: str, i: int) -> str:
    """DuckDB: the identical expression (1-based array index)."""
    return (f"least(greatest(CAST(floor(CAST({emb_expr}[{i + 1}] AS DOUBLE)"
            f" * {SCALE} + 0.5) AS BIGINT), {-SHIFT}), {SHIFT}) + {SHIFT}")


def int_vectors(emb: DataFrame, emb_col: str = "embedding",
                dim: int = DIM,
                keep: tuple[str, ...] = ()) -> DataFrame:
    """(vec_id, h, x0..x{dim-1} [, keep...]) — the integerized working
    relation.

    Per-dim columns (not an array) keep every downstream expression inside
    whole-stage codegen: array element math would need HOFs
    (CodegenFallback) or repeated F.get trees. ``h`` is the deterministic
    init rank key."""
    cols = [F.col("vec_id"),
            md5_hash60(F.col("vec_id").cast("string")).alias("h")]
    cols += [_int_dim_col(emb_col, i).alias(f"x{i}") for i in range(dim)]
    cols += [F.col(c) for c in keep]
    return emb.select(*cols)


# ---------------------------------------------------------------------------
# Lloyd iterations
# ---------------------------------------------------------------------------


def _assign_cols(centroids: list[list[int]], dim: int):
    """(cid Column, dist2 Column) from centroid LITERALS — pure codegen."""
    dists = [
        reduce(lambda a, b: a + b,
               [(F.col(f"x{i}") - F.lit(c[i])) * (F.col(f"x{i}")
                                                  - F.lit(c[i]))
                for i in range(dim)])
        for c in centroids]
    m = F.least(*dists) if len(dists) > 1 else dists[0]
    # first-match CASE == lowest cid on ties (the oracle's ORDER BY
    # dist2, cid row_number spells the same total order)
    cid = F.when(dists[0] == m, F.lit(0))
    for j in range(1, len(dists)):
        cid = cid.when(dists[j] == m, F.lit(j))
    return cid.cast("int").alias("cid"), m.alias("dist2")


def kmeans_assign(emb: DataFrame, k: int = K_CLUSTERS, n_iter: int = N_ITER,
                  dim: int = DIM, emb_col: str = "embedding",
                  impl: str = "arrow") -> DataFrame:
    """(vec_id, cid, dist2) after ``n_iter`` Lloyd rounds.

    Deterministic end-to-end: hash-ranked init, integer distances, total
    tie order, truncating-mean updates, empty clusters frozen. Each round
    collects exactly k×(dim+1) BIGINTs (argument-bounded). ``impl``
    selects the assignment evaluation (see :func:`assign_fixed`) — both
    are value-identical; "arrow" is the default (compile-cost lesson)."""
    cents = train_centroids(emb, k=k, n_iter=n_iter, dim=dim,
                            emb_col=emb_col, impl=impl)
    return assign_fixed(emb, cents, dim=dim, emb_col=emb_col, impl=impl)


_ASSIGN_T = T.StructType([
    T.StructField("cid", T.IntegerType()),
    T.StructField("dist2", T.LongType()),
    T.StructField("second2", T.LongType()),
])


def _assign_udf(centroids: list[list[int]]):
    """pandas UDF Column: (cid, dist2, second2) struct under fixed
    centroids (second2 = the second-smallest distance, NULL at k=1).

    The numpy mirror of the Column/SQL rule, value-identical by
    construction: integerization is the same ``floor(x·SCALE + 0.5)``
    double expression (np.floor == SQL floor on IEEE doubles) with the
    same clamp+shift; distances are exact int64; ties keep the LOWEST cid
    (the strict ``<`` update never replaces an equal best — the
    first-match CASE / ORDER BY dist2, cid total order), and a tied
    second stays equal to best (margin 0, matching the oracle's rn=2
    row). Centroids ride the closure (k×dim ints, argument-bounded)."""
    import numpy as np
    cmat = np.array(centroids, dtype=np.int64)

    @F.pandas_udf(_ASSIGN_T)
    def assign(v: pd.Series) -> pd.DataFrame:
        x = np.array(v.tolist(), dtype=np.float64)
        q = np.floor(x * SCALE + 0.5)
        xi = (np.clip(q, -SHIFT, SHIFT) + SHIFT).astype(np.int64)
        best_d = ((xi - cmat[0]) ** 2).sum(axis=1)
        best_c = np.zeros(len(xi), dtype=np.int32)
        second = np.full(len(xi), np.iinfo(np.int64).max, dtype=np.int64)
        for j in range(1, len(cmat)):
            d = ((xi - cmat[j]) ** 2).sum(axis=1)
            better = d < best_d
            second = np.where(better, best_d, np.minimum(second, d))
            best_d = np.where(better, d, best_d)
            best_c = np.where(better, np.int32(j), best_c)
        out = pd.DataFrame({"cid": best_c, "dist2": best_d})
        out["second2"] = pd.array(
            [None if len(cmat) < 2 else int(s) for s in second],
            dtype="Int64")
        return out

    return assign


def assign_fixed(emb: DataFrame, centroids: list[list[int]],
                 dim: int = DIM, emb_col: str = "embedding",
                 impl: str = "arrow",
                 extra_cols: tuple[str, ...] = ()) -> DataFrame:
    """(vec_id, cid, dist2) under FIXED integer centroids — the assignment
    face shared by the final kmeans round, the batch cluster profile, and
    the streaming occupancy monitor (one definition, never forked).

    DEFAULT impl="arrow": ONE ArrowEvalPython projection (vectorized
    int64 numpy, centroid matrix in the closure). The declarative
    impl="column" spells the literal-expanded least/CASE expression the
    DuckDB oracle mirrors — value-identical (equality-pinned in
    test_clustering) but its ~k·dim-term trees pay Catalyst/janino
    COMPILATION per stage, which dominates wall time at any data size
    (measured 62 s vs ~4 s for the full kmeans_summary at sf0.1 — the
    v6-key lesson: repeated giant Column trees want a physical Arrow
    barrier, and CASE arms are invisible to codegen CSE)."""
    if not centroids or any(len(c) != dim for c in centroids):
        raise ValueError(
            f"assign_fixed: centroids must be a non-empty list of "
            f"length-{dim} integer vectors")
    if impl == "arrow":
        a = emb.select("vec_id", *extra_cols,
                       _assign_udf(centroids)(F.col(emb_col)).alias("a"))
        return a.select("vec_id", *extra_cols,
                        F.col("a.cid").alias("cid"),
                        F.col("a.dist2").alias("dist2"))
    if impl != "column":
        raise ValueError(f"assign_fixed: impl must be 'arrow' or "
                         f"'column': {impl!r}")
    iv = int_vectors(emb.select("vec_id", *extra_cols, emb_col),
                     emb_col=emb_col, dim=dim, keep=extra_cols)
    cid_col, dist_col = _assign_cols(centroids, dim)
    return iv.select("vec_id", *extra_cols, cid_col, dist_col)


def cluster_profile(emb: DataFrame, centroids: list[list[int]],
                    dim: int = DIM, emb_col: str = "embedding",
                    impl: str = "arrow") -> DataFrame:
    """(cid, n_members, inertia) occupancy profile under fixed centroids —
    one scan + a two-phase aggregate onto ≤ len(centroids) groups. Pure
    ADDITION across inputs (profile(A ∪ B) == profile(A) + profile(B)
    per cid), which is what makes the streaming face a counter merge."""
    a = assign_fixed(emb, centroids, dim=dim, emb_col=emb_col, impl=impl)
    return (a.groupBy("cid")
             .agg(F.count(F.lit(1)).alias("n_members"),
                  F.sum("dist2").alias("inertia")))


def kmeans_margins(emb: DataFrame, k: int = K_CLUSTERS,
                   n_iter: int = N_ITER, dim: int = DIM,
                   emb_col: str = "embedding") -> DataFrame:
    """(vec_id, cid, dist2, margin2) — margin2 = second-best minus best
    distance, the assignment-confidence score (margin 0 = the vector sits
    exactly on a cluster boundary; small margins flag label-noise /
    re-review candidates). Arrow assignment only (the second-best register
    rides the same numpy pass for free); the ORACLE is the independent
    check — the rn=1/rn=2 rows of the same unrolled chain. k must be ≥ 2
    (no second centroid, no margin)."""
    if k < 2:
        raise ValueError(f"kmeans_margins: k must be >= 2: {k}")
    cents = train_centroids(emb, k=k, n_iter=n_iter, dim=dim,
                            emb_col=emb_col)
    a = emb.select("vec_id",
                   _assign_udf(cents)(F.col(emb_col)).alias("a"))
    return a.select("vec_id", F.col("a.cid").alias("cid"),
                    F.col("a.dist2").alias("dist2"),
                    (F.col("a.second2") - F.col("a.dist2"))
                    .alias("margin2"))


def kmeans_crosstab(emb: DataFrame, label_col: str = "label",
                    k: int = K_CLUSTERS, n_iter: int = N_ITER,
                    dim: int = DIM,
                    emb_col: str = "embedding") -> DataFrame:
    """(cid, label, n_members) — the cluster × ground-label contingency
    table (cluster purity / topic-drift audit). The label rides the
    assignment scan as a passthrough column — ONE scan, no join-back of
    two data-sized relations."""
    a = assign_fixed(
        emb,
        train_centroids(emb, k=k, n_iter=n_iter, dim=dim,
                        emb_col=emb_col),
        dim=dim, emb_col=emb_col, extra_cols=(label_col,))
    return (a.groupBy("cid", label_col)
             .agg(F.count(F.lit(1)).alias("n_members")))


def kmeans_summary(emb: DataFrame, k: int = K_CLUSTERS,
                   n_iter: int = N_ITER, dim: int = DIM,
                   emb_col: str = "embedding",
                   impl: str = "arrow") -> DataFrame:
    """(cid, n_members, inertia) — the per-cluster rollup of the final
    assignment (inertia = exact BIGINT sum of dist2)."""
    a = kmeans_assign(emb, k=k, n_iter=n_iter, dim=dim, emb_col=emb_col,
                      impl=impl)
    return (a.groupBy("cid")
             .agg(F.count(F.lit(1)).alias("n_members"),
                  F.sum("dist2").alias("inertia")))


def contrastive_triplets(emb: DataFrame, k: int = K_CLUSTERS,
                         n_iter: int = N_ITER, dim: int = DIM,
                         emb_col: str = "embedding",
                         impl: str = "arrow") -> DataFrame:
    """Hard-negative mining for contrastive/triplet training: per anchor
    vector, the nearest same-cluster neighbour (positive) and the
    FARTHEST same-cluster neighbour (hard negative — still semantically
    related by cluster membership, maximally dissimilar within it).
    Returns (anchor_id, cid, pos_id, pos_dist2, neg_id, neg_dist2,
    n_partners), anchors with ≥ 2 cluster partners only (so pos ≠ neg is
    guaranteed: pos ties break to the LOWEST partner id, neg ties to the
    HIGHEST — on an all-equal cluster the two rules pick different
    partners). Distances are the exact integer dist2 of the shared
    clamp+shift rule (pair dist2 ≤ dim·(2·SHIFT)² ≈ 2.7e8 — int64-safe).

    impl="arrow" (default): ONE applyInPandas over cid groups — the
    O(|cluster|²·dim) pairwise block runs vectorized int64 numpy inside
    the Arrow barrier; the shuffle moves each vector ONCE (keyed on cid;
    cluster occupancy is the documented skew/size knob — at 100 TB cap
    cluster sizes by raising k or sub-clustering oversized cells, the
    containment_pairs discipline). impl="column" is the oracle's exact
    shape — the literal-expanded 64-term pair distance over a cid
    self-join + two rank windows — equality-pinned, gate-scale only
    (the assign_fixed compile-cost lesson)."""
    cents = train_centroids(emb, k=k, n_iter=n_iter, dim=dim,
                            emb_col=emb_col, impl=impl)
    if impl == "arrow":
        a = assign_fixed(emb.select("vec_id", emb_col), cents, dim=dim,
                         emb_col=emb_col, extra_cols=(emb_col,))
        out_t = T.StructType([
            T.StructField("anchor_id", T.LongType()),
            T.StructField("cid", T.IntegerType()),
            T.StructField("pos_id", T.LongType()),
            T.StructField("pos_dist2", T.LongType()),
            T.StructField("neg_id", T.LongType()),
            T.StructField("neg_dist2", T.LongType()),
            T.StructField("n_partners", T.LongType()),
        ])

        def block(pdf: pd.DataFrame) -> pd.DataFrame:
            import numpy as np
            if len(pdf) < 3:
                # < 2 partners per anchor — nothing qualifies
                z64 = np.array([], dtype=np.int64)
                return pd.DataFrame({
                    "anchor_id": z64, "cid": z64.astype(np.int32),
                    "pos_id": z64, "pos_dist2": z64,
                    "neg_id": z64, "neg_dist2": z64, "n_partners": z64})
            pdf = pdf.sort_values("vec_id").reset_index(drop=True)
            ids = pdf["vec_id"].to_numpy()
            x = np.array(pdf[emb_col].tolist(), dtype=np.float64)
            q = np.floor(x * SCALE + 0.5)
            xi = (np.clip(q, -SHIFT, SHIFT) + SHIFT).astype(np.int64)
            # exact int64 pairwise distances via the Gram matrix:
            # (a-b)² = aa + bb − 2ab (dots ≤ dim·(2·SHIFT)² ≈ 2.7e8 —
            # far inside int64). The matmul form keeps the intermediate
            # n², not n²·dim (the (n,None,dim) broadcast materializes
            # n²·dim·8 bytes — 5 TB at a 25k-member cluster)
            g = xi @ xi.T
            sq = np.diag(g)
            d = sq[:, None] + sq[None, :] - 2 * g
            n = len(ids)
            big = np.iinfo(np.int64).max
            dmin = d.copy()
            np.fill_diagonal(dmin, big)
            # argmin first-occurrence == lowest partner id (id-sorted)
            pos_idx = dmin.argmin(axis=1)
            dmax = d.copy()
            np.fill_diagonal(dmax, -1)
            # last-occurrence argmax == highest partner id on ties
            neg_idx = (n - 1) - dmax[:, ::-1].argmax(axis=1)
            return pd.DataFrame({
                "anchor_id": ids,
                "cid": pdf["cid"].to_numpy(),
                "pos_id": ids[pos_idx],
                "pos_dist2": dmin[np.arange(n), pos_idx],
                "neg_id": ids[neg_idx],
                "neg_dist2": dmax[np.arange(n), neg_idx],
                "n_partners": np.full(n, n - 1, dtype=np.int64),
            })

        return a.groupBy("cid").applyInPandas(block, out_t)
    if impl != "column":
        raise ValueError(f"contrastive_triplets: impl must be 'arrow' or "
                         f"'column': {impl!r}")
    asg = assign_fixed(emb, cents, dim=dim, emb_col=emb_col, impl="column")
    iv = int_vectors(emb, emb_col=emb_col, dim=dim)
    # physical barrier BEFORE the pair join (gate-scale only — this impl
    # is the oracle's shape): fusing the 64 quantization trees, the SMJ,
    # and the 64-term pair distance into one whole-stage-codegen function
    # overflows janino (measured: compile never returns). localCheckpoint
    # truncates the plan so the pair stage sees plain integer columns —
    # the withColumn lesson: only a physical barrier truly materializes.
    base = (asg.select("vec_id", "cid").join(iv.drop("h"), "vec_id")
               .localCheckpoint(eager=True))
    side_a = base.select(F.col("vec_id").alias("anchor_id"), "cid",
                         *[F.col(f"x{i}").alias(f"a{i}")
                           for i in range(dim)])
    side_b = base.select(F.col("vec_id").alias("partner"), "cid",
                         *[F.col(f"x{i}").alias(f"b{i}")
                           for i in range(dim)])
    d2 = reduce(lambda a, b: a + b,
                [(F.col(f"a{i}") - F.col(f"b{i}"))
                 * (F.col(f"a{i}") - F.col(f"b{i}")) for i in range(dim)])
    pairs = (side_a.join(side_b.hint("merge"), "cid")
                   .where(F.col("anchor_id") != F.col("partner"))
                   .select("anchor_id", "cid", "partner", d2.alias("d2")))
    wp = Window.partitionBy("anchor_id").orderBy(
        F.col("d2").asc(), F.col("partner").asc())
    wq = Window.partitionBy("anchor_id").orderBy(
        F.col("d2").desc(), F.col("partner").desc())
    ranked = (pairs.withColumn("__rp", F.row_number().over(wp))
                   .withColumn("__rq", F.row_number().over(wq)))
    return (ranked.groupBy("anchor_id", "cid")
                  .agg(F.max(F.when(F.col("__rp") == 1,
                                    F.col("partner"))).alias("pos_id"),
                       F.max(F.when(F.col("__rp") == 1,
                                    F.col("d2"))).alias("pos_dist2"),
                       F.max(F.when(F.col("__rq") == 1,
                                    F.col("partner"))).alias("neg_id"),
                       F.max(F.when(F.col("__rq") == 1,
                                    F.col("d2"))).alias("neg_dist2"),
                       F.count(F.lit(1)).alias("n_partners"))
                  .where(F.col("n_partners") >= 2))


def train_centroids(emb: DataFrame, k: int = K_CLUSTERS,
                    n_iter: int = N_ITER, dim: int = DIM,
                    emb_col: str = "embedding",
                    impl: str = "arrow") -> list[list[int]]:
    """The trained integer centroid matrix itself (k×dim BIGINTs) — the
    bounded artifact a streaming occupancy monitor pins in its state
    meta. The ONE Lloyd loop (kmeans_assign composes from it).

    Each update round is one scan: the assignment (arrow barrier or the
    declarative expression, per ``impl``) plus the dim small integerized
    projections feeding a two-phase K-group aggregate."""
    if k < 1 or n_iter < 0:
        raise ValueError(f"kmeans: k >= 1 and n_iter >= 0 required "
                         f"(got k={k}, n_iter={n_iter})")
    iv = int_vectors(emb, emb_col=emb_col, dim=dim)
    # init: k smallest (h, vec_id) — TakeOrderedAndProject, never a global
    # sort; k rows to the driver
    init_rows = (iv.orderBy(F.col("h").asc(), F.col("vec_id").asc())
                   .limit(k).collect())
    if len(init_rows) < k:
        raise ValueError(
            f"kmeans: k={k} exceeds the {len(init_rows)} input vectors")
    cents = [[r[f"x{i}"] for i in range(dim)] for r in init_rows]
    xs = [f"x{i}" for i in range(dim)]
    for _ in range(n_iter):
        if impl == "arrow":
            assigned = emb.select(
                _assign_udf(cents)(F.col(emb_col))["cid"].alias("cid"),
                *[_int_dim_col(emb_col, i).alias(x)
                  for i, x in enumerate(xs)])
        else:
            cid_col, _ = _assign_cols(cents, dim)
            assigned = iv.select(cid_col, *xs)
        upd = (assigned.groupBy("cid")
               .agg(F.count(F.lit(1)).alias("n"),
                    *[F.sum(x).alias(f"s{i}") for i, x in enumerate(xs)])
               .collect())
        by_cid = {r["cid"]: r for r in upd}
        # sums are non-negative, so Python // == Spark div == DuckDB //
        cents = [[by_cid[j][f"s{i}"] // by_cid[j]["n"] for i in range(dim)]
                 if j in by_cid else cents[j]
                 for j in range(k)]
    return cents


# ---------------------------------------------------------------------------
# DuckDB oracle: the unrolled c0..cK chain
# ---------------------------------------------------------------------------


def _iv_sql(table: str, emb_expr: str, dim: int) -> str:
    xs = ",\n         ".join(
        f"{_int_dim_sql(emb_expr, i)} AS x{i}" for i in range(dim))
    h = md5_hash60_sql("CAST(vec_id AS VARCHAR)")
    return (f"km_iv AS MATERIALIZED (\n  SELECT vec_id, {h} AS h,\n"
            f"         {xs}\n  FROM {table}\n)")


def _assign_cte(name: str, cents: str, dim: int) -> str:
    dist = " + ".join(f"(v.x{i} - c.x{i}) * (v.x{i} - c.x{i})"
                      for i in range(dim))
    return f"""{name} AS MATERIALIZED (
  SELECT vec_id, cid, dist2,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY dist2, cid) AS rn
  FROM (SELECT v.vec_id, c.cid, {dist} AS dist2
        FROM km_iv v CROSS JOIN {cents} c) km_d
)"""


def kmeans_oracle_sql(k: int = K_CLUSTERS, n_iter: int = N_ITER,
                      dim: int = DIM, table: str = "embeddings",
                      emb_expr: str = "embedding",
                      summary: bool | str = False) -> str:
    """The identical computation as one DuckDB query: init by the same
    (h, vec_id) rank, per-round assignment via the same (dist2, cid) total
    order, update via the same truncating non-negative mean, empty clusters
    frozen by the LEFT JOIN coalesce. ``summary``: False = per-vector
    assignment, True = per-cluster rollup, "margins" = the rn=1/rn=2
    margin rows, "crosstab" = cluster × label counts."""
    ctes = [_iv_sql(table, emb_expr, dim)]
    xs = ", ".join(f"x{i}" for i in range(dim))
    ctes.append(f"""km_c0 AS MATERIALIZED (
  SELECT CAST(row_number() OVER (ORDER BY h, vec_id) - 1 AS INT) AS cid,
         {xs}
  FROM (SELECT * FROM km_iv ORDER BY h, vec_id LIMIT {k}) km_i
)""")
    for r in range(1, n_iter + 1):
        ctes.append(_assign_cte(f"km_a{r}", f"km_c{r - 1}", dim))
        sums = ", ".join(f"sum(v.x{i}) AS s{i}" for i in range(dim))
        upd_cols = ",\n         ".join(
            f"coalesce(CAST(u.s{i} AS BIGINT) // u.n, p.x{i}) AS x{i}"
            for i in range(dim))
        ctes.append(f"""km_u{r} AS (
  SELECT a.cid, count(*) AS n, {sums}
  FROM km_a{r} a JOIN km_iv v USING (vec_id)
  WHERE a.rn = 1 GROUP BY a.cid
),
km_c{r} AS MATERIALIZED (
  SELECT p.cid, {upd_cols}
  FROM km_c{r - 1} p LEFT JOIN km_u{r} u USING (cid)
)""")
    ctes.append(_assign_cte("km_af", f"km_c{n_iter}", dim))
    if summary == "triplets":
        dist = " + ".join(f"(va.x{i} - vb.x{i}) * (va.x{i} - vb.x{i})"
                          for i in range(dim))
        ctes.append(f"""km_pairs AS MATERIALIZED (
  SELECT a.vec_id AS anchor_id, a.cid, b.vec_id AS partner, {dist} AS d2
  FROM (SELECT vec_id, cid FROM km_af WHERE rn = 1) a
  JOIN (SELECT vec_id, cid FROM km_af WHERE rn = 1) b
    ON a.cid = b.cid AND a.vec_id <> b.vec_id
  JOIN km_iv va ON va.vec_id = a.vec_id
  JOIN km_iv vb ON vb.vec_id = b.vec_id
),
km_rank AS (
  SELECT *,
         row_number() OVER (PARTITION BY anchor_id
                            ORDER BY d2, partner) AS rp,
         row_number() OVER (PARTITION BY anchor_id
                            ORDER BY d2 DESC, partner DESC) AS rq
  FROM km_pairs
)""")
        body = ("SELECT anchor_id, cid,\n"
                "       max(CASE WHEN rp = 1 THEN partner END) AS pos_id,\n"
                "       CAST(max(CASE WHEN rp = 1 THEN d2 END) AS BIGINT)"
                " AS pos_dist2,\n"
                "       max(CASE WHEN rq = 1 THEN partner END) AS neg_id,\n"
                "       CAST(max(CASE WHEN rq = 1 THEN d2 END) AS BIGINT)"
                " AS neg_dist2,\n"
                "       CAST(count(*) AS BIGINT) AS n_partners\n"
                "FROM km_rank GROUP BY anchor_id, cid\n"
                "HAVING count(*) >= 2")
        return "WITH " + ",\n".join(ctes) + "\n" + body + "\n"
    if summary == "margins":
        body = ("SELECT a1.vec_id, a1.cid, a1.dist2,\n"
                "       a2.dist2 - a1.dist2 AS margin2\n"
                "FROM km_af a1 JOIN km_af a2 USING (vec_id)\n"
                "WHERE a1.rn = 1 AND a2.rn = 2")
    elif summary == "crosstab":
        body = (f"SELECT a.cid, e.label,\n"
                f"       CAST(count(*) AS BIGINT) AS n_members\n"
                f"FROM km_af a JOIN {table} e USING (vec_id)\n"
                f"WHERE a.rn = 1 GROUP BY 1, 2")
    elif summary:
        body = ("SELECT cid, CAST(count(*) AS BIGINT) AS n_members,\n"
                "       CAST(sum(dist2) AS BIGINT) AS inertia\n"
                "FROM km_af WHERE rn = 1 GROUP BY cid")
    else:
        body = "SELECT vec_id, cid, dist2 FROM km_af WHERE rn = 1"
    return "WITH " + ",\n".join(ctes) + "\n" + body + "\n"


# ---------------------------------------------------------------------------
# driver contract
# ---------------------------------------------------------------------------


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def queries():
    return {
        "kmeans_assign": lambda s, d: kmeans_assign(_emb(s, d)),
        "kmeans_summary": lambda s, d: kmeans_summary(_emb(s, d)),
        "kmeans_margins": lambda s, d: kmeans_margins(_emb(s, d)),
        "kmeans_crosstab": lambda s, d: kmeans_crosstab(_emb(s, d)),
        "contrastive_triplets": lambda s, d: contrastive_triplets(
            _emb(s, d)),
    }


def oracles() -> dict[str, str]:
    return {
        "kmeans_assign": kmeans_oracle_sql(),
        "kmeans_summary": kmeans_oracle_sql(summary=True),
        "kmeans_margins": kmeans_oracle_sql(summary="margins"),
        "kmeans_crosstab": kmeans_oracle_sql(summary="crosstab"),
        "contrastive_triplets": kmeans_oracle_sql(summary="triplets"),
    }
