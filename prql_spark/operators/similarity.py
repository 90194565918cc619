"""Similarity search over an embedding column (array<float>).

Two paths, per SURVEY §2 #31/#32:
- brute-force cosine top-k — exact baseline. The dot product is a
  ``zip_with``/``aggregate`` higher-order expression (JVM-side); the
  query set is broadcast, so the big side never shuffles: scan →
  per-partition partial top-k → driver-side merge via TakeOrdered.
- random-hyperplane LSH — the scale path: 16 seeded hyperplanes give
  a 16-bit bucket; candidates come from matching buckets only, then
  exact rerank. Hyperplanes are deterministic literals (seed 42), so
  DuckDB can replay the same plan for the oracle.

Embedding near-dup dedup (SURVEY §2 #30) reuses the same bucketing
for a within-bucket self-join at cosine >= threshold.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, functions as F


def _dot(a: str, b: str) -> str:
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * y), "
        f"CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def _norm(a: str) -> str:
    return f"sqrt({_dot(a, a)})"


def cosine_expr(a: str, b: str) -> str:
    return f"({_dot(a, b)} / ({_norm(a)} * {_norm(b)}))"


def _topk_per_query(
    scored: DataFrame, k: int, query_id_col: str, id_col: str
) -> DataFrame:
    """Per-query top-k over (query_id, id, cosine) rows.

    A single rank-filter window compiles to a two-stage top-k: Spark's
    rank-limit pushdown (WindowGroupLimit, SPARK-37099) inserts a
    *Partial* group-limit BEFORE the exchange, so each input partition
    forwards at most k rows per query and the per-query reducer sees
    k × n_partitions rows, never the whole scored corpus. Pinned by
    tests/test_plans.py (a hand-rolled second window would double the
    sorts — measured 4× slower at sf0.1).
    """
    return (
        scored.withColumn(
            "rk",
            F.expr(
                f"row_number() OVER (PARTITION BY {query_id_col} "
                f"ORDER BY cosine DESC, {id_col})"
            ),
        )
        .where(F.col("rk") <= k)
        .drop("rk")
    )


def brute_force_topk(
    df: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k for each query vector.

    ``queries``: (query_id, qvec). Broadcast — the corpus side never
    shuffles whole vectors; only (query_id, id, cosine) triples enter
    the two-stage top-k.
    """
    from prql_spark.operators.dedup import _spread

    # the per-row work is |queries| cosine folds — heavy enough that
    # a single-scan-partition input serializes the op (measured
    # 0.42-0.62 s -> 0.32-0.36 s at sf0.1 with the spread, 3 reps);
    # no-op on already-parallel inputs
    df = _spread(df, id_col)
    j = df.alias("d").join(F.broadcast(queries.alias("q")))
    scored = j.select(
        F.col(f"q.{query_id_col}").alias(query_id_col),
        F.col(f"d.{id_col}").alias(id_col),
        F.expr(f"round({cosine_expr('d.' + vec_col, 'q.qvec')}, 6)").alias(
            "cosine"
        ),
    )
    return _topk_per_query(scored, k, query_id_col, id_col)


def hyperplanes(dim: int, n_planes: int = 16, seed: int = 42) -> list[list[float]]:
    rng = random.Random(seed)
    return [
        [round(rng.gauss(0.0, 1.0), 6) for _ in range(dim)]
        for _ in range(n_planes)
    ]


def _bucket_expr(vec: str, planes: list[list[float]]) -> str:
    """16-bit LSH bucket id: sign bits of hyperplane dot products."""
    if not planes:
        return "(0)"
    bits = []
    for j, p in enumerate(planes):
        arr = "array(" + ", ".join(f"CAST({x} AS DOUBLE)" for x in p) + ")"
        bits.append(f"IF({_dot(vec, arr)} > 0, {1 << j}, 0)")
    return "(" + " + ".join(bits) + ")"


def lsh_topk(
    df: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_planes: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    seed: int = 42,
    multiprobe: bool = False,
) -> DataFrame:
    """Approximate top-k: candidates share the query's LSH bucket,
    then exact cosine rerank. One narrow map to bucket the corpus,
    one broadcast-join on bucket id — no corpus shuffle.

    ``multiprobe``: also probe every Hamming-1 neighbor bucket of the
    query's — (n_planes+1)× the broadcast rows (still tiny: only the
    QUERY side explodes) for a large recall lift; a corpus vector has
    one bucket and probe buckets are distinct, so each (query, vec)
    candidate appears at most once — no dedup pass needed.
    """
    from prql_spark.operators.dedup import _spread

    planes = hyperplanes(dim, n_planes, seed)
    b = _bucket_expr(vec_col, planes)
    bq = _bucket_expr("qvec", planes)
    # n_planes sign-dot folds per corpus row: spread a
    # single-scan-partition input (no-op on parallel inputs — see
    # brute_force_topk's measured A/B)
    corpus = _spread(df, id_col).withColumn("__bucket", F.expr(b))
    if multiprobe:
        probes = ", ".join(
            f"(__b0 ^ {1 << j})" for j in range(n_planes)
        )
        qs = (
            queries.withColumn("__b0", F.expr(bq))
            .select(
                "*",
                F.explode(F.expr(f"array(__b0, {probes})")).alias(
                    "__bucket"
                ),
            )
            .drop("__b0")
        )
    else:
        qs = queries.withColumn("__bucket", F.expr(bq))
    j = corpus.alias("d").join(
        F.broadcast(qs.alias("q")), on="__bucket", how="inner"
    )
    scored = j.select(
        F.col(query_id_col),
        F.col(id_col),
        F.expr(f"round({cosine_expr(vec_col, 'qvec')}, 6)").alias("cosine"),
    )
    return _topk_per_query(scored, k, query_id_col, id_col)


def ivf_train_centroids(
    df: DataFrame,
    dim: int,
    n_lists: int = 16,
    iters: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> list[list[float]]:
    """Lloyd's k-means (few iterations) for an IVF coarse quantizer.

    Deterministic seeding: the n_lists vectors with the smallest ids.
    Each iteration is one broadcast-join assignment + one groupBy
    average — the corpus never shuffles by more than (list_id).
    Centroid lists are tiny (n_lists × dim) and live on the driver,
    as a real IVF index's coarse quantizer would.
    """
    seed_rows = (
        df.orderBy(id_col).limit(n_lists).select(vec_col).collect()
    )
    centroids = [[float(x) for x in r[0]] for r in seed_rows]
    for _ in range(iters):
        # assignment via broadcast centroid FRAME + argmax aggregate —
        # the same shape (and the same round-9 / ties-to-larger-index
        # contract) as _nearest_expr, but it scales to thousands of
        # lists: the inline-literal array_max form falls out of
        # whole-stage codegen past ~dozens of centroids (measured
        # 108 s vs 2 s on 64 lists in semdedup). Verified to
        # reproduce _nearest_expr's assignments bit-for-bit — the
        # regenerated pretrained centroids are byte-identical.
        cents_df = df.sparkSession.createDataFrame(
            [(i, c) for i, c in enumerate(centroids)],
            "i int, c array<double>",
        )
        assigned = (
            df.select(F.col(id_col), F.col(vec_col))
            .join(F.broadcast(cents_df))
            .select(
                F.col(id_col),
                F.col(vec_col),
                F.expr(
                    f"named_struct("
                    f"'cos', round({cosine_expr(vec_col, 'c')}, 9), "
                    f"'i', i)"
                ).alias("__s"),
            )
            .groupBy(id_col)
            .agg(
                F.max("__s").alias("__m"),
                F.first(vec_col).alias(vec_col),
            )
            .select(F.col("__m.i").alias("__list"), F.col(vec_col))
        )
        # component-wise mean via posexplode + partial-sum: the
        # shuffle carries only (list, pos, partial_sum) — never
        # whole-vector collections per group
        sums = (
            assigned.select(
                "__list", F.posexplode(F.col(vec_col)).alias("pos", "val")
            )
            .groupBy("__list", "pos")
            .agg(
                F.sum(F.expr("CAST(val AS DOUBLE)")).alias("s"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()
        )
        new = [list(c) for c in centroids]
        for r in sums:
            new[r["__list"]][r.pos] = r.s / r.n
        centroids = [c for c in new]
    return centroids


def _nearest_expr(vec: str, centroids: list[list[float]]) -> str:
    """SQL expr: index of the max-cosine centroid for `vec`.

    The cosine is rounded to 9 decimals before the argmax so the
    assignment is reproducible across engines (a last-ulp difference
    in two engines' double summation must not flip a list
    assignment); ties break to the larger index (struct comparison).
    """
    structs = []
    for i, c in enumerate(centroids):
        arr = "array(" + ", ".join(f"CAST({x} AS DOUBLE)" for x in c) + ")"
        structs.append(
            f"named_struct('cos', round({cosine_expr(vec, arr)}, 9), "
            f"'i', {i})"
        )
    return f"array_max(array({', '.join(structs)})).i"


def ivf_topk(
    df: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_lists: int | None = 16,
    nprobe: int = 4,
    centroids: list[list[float]] | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """IVF approximate top-k: corpus bucketed by nearest centroid
    (one narrow map), queries probe their nprobe closest lists, exact
    cosine rerank within probed lists only. Candidate volume is
    ~nprobe/n_lists of the corpus. ``n_lists=None`` sizes the
    quantizer from a corpus count (:func:`occupancy_lists`).

    Assignment strategy splits on quantizer size: a pretrained SMALL
    quantizer (≤64 lists — the driver entry's shape) keeps the
    inline-centroid-literal map, which is zero-shuffle (the corpus
    never exchanges at all). Past that, inline literals fall out of
    whole-stage codegen (measured 108 s vs 2 s on 64 lists —
    SURVEY §2 #77), so large quantizers assign via the broadcast
    centroid FRAME + argmax aggregate, paying ONE map-side-combined
    corpus exchange for assignment that stays in codegen at any list
    count. Both strategies produce identical assignments (round-9
    cosine, ties to larger index)."""
    if centroids is None:
        if n_lists is None:
            n_lists = occupancy_lists(df.count())
        centroids = ivf_train_centroids(df, dim, n_lists, vec_col=vec_col,
                                        id_col=id_col)
    from prql_spark.operators.dedup import _spread

    small_quantizer = len(centroids) <= 64
    if small_quantizer:
        # n_lists cosine folds per row: spread a single-scan-
        # partition input (no-op on parallel inputs — see
        # brute_force_topk's A/B)
        corpus = _spread(df, id_col).withColumn(
            "__list", F.expr(_nearest_expr(vec_col, centroids))
        )
    else:
        cents_df = df.sparkSession.createDataFrame(
            [(i, c) for i, c in enumerate(centroids)],
            "i int, c array<double>",
        )
        corpus = (
            df.select(F.col(id_col), F.col(vec_col))
            .join(F.broadcast(cents_df))
            .select(
                F.col(id_col),
                F.col(vec_col),
                F.expr(
                    f"named_struct("
                    f"'cos', round({cosine_expr(vec_col, 'c')}, 9), "
                    f"'i', i)"
                ).alias("__s"),
            )
            .groupBy(id_col)
            .agg(
                F.max("__s").alias("__m"),
                F.first(vec_col).alias(vec_col),
            )
            .select(id_col, vec_col, F.col("__m.i").alias("__list"))
        )
    # per-query probe lists: indexes of the nprobe best centroids
    # (round-9 cosine for cross-engine-reproducible probe order, as
    # in _nearest_expr). Queries are tiny, but the inline probe expr
    # also grows with the quantizer — large quantizers rank against
    # the centroid frame instead (queries × centroids is still a
    # broadcast-sized frame).
    if small_quantizer:
        probes = []
        for i, c in enumerate(centroids):
            arr = "array(" + ", ".join(
                f"CAST({x} AS DOUBLE)" for x in c
            ) + ")"
            probes.append(
                f"named_struct('cos', round({cosine_expr('qvec', arr)}, 9), "
                f"'i', {i})"
            )
        probe_expr = (
            f"transform(slice(reverse(array_sort(array("
            f"{', '.join(probes)}))), 1, {nprobe}), s -> s.i)"
        )
        qs = queries.select(
            F.col(query_id_col),
            F.col("qvec"),
            F.explode(F.expr(probe_expr)).alias("__list"),
        )
    else:
        qs = (
            queries.join(F.broadcast(cents_df))
            .select(
                F.col(query_id_col),
                F.col("qvec"),
                F.col("i").alias("__list"),
                F.expr(
                    f"round({cosine_expr('qvec', 'c')}, 9)"
                ).alias("__pc"),
            )
            .withColumn(
                "__rk",
                F.expr(
                    f"row_number() OVER (PARTITION BY {query_id_col} "
                    "ORDER BY __pc DESC, __list DESC)"
                ),
            )
            .where(F.col("__rk") <= nprobe)
            .select(query_id_col, "qvec", "__list")
        )
    j = corpus.join(F.broadcast(qs), on="__list")
    scored = j.select(
        F.col(query_id_col),
        F.col(id_col),
        F.expr(f"round({cosine_expr(vec_col, 'qvec')}, 6)").alias("cosine"),
    )
    return _topk_per_query(scored, k, query_id_col, id_col)


def unit_normalize(centroids: list[list[float]]) -> list[list[float]]:
    """L2-normalize centroid rows in Python ONCE, so both the engine
    and the DuckDB oracle embed the *identical* unit-vector literals
    and cosine degrades to a single dot product."""
    import math

    out = []
    for c in centroids:
        n = math.sqrt(sum(x * x for x in c)) or 1.0
        out.append([x / n for x in c])
    return out


def semdedup_pairs(
    df: DataFrame,
    dim: int,
    centroids: list[list[float]],
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    star_cap: int = 256,
    hier_assign: bool = False,
) -> DataFrame:
    """Semantic near-dup pairs, k-means-blocked (SemDeDup shape —
    Abbas et al. 2023, "SemDeDup: Data-efficient learning at web-scale
    through semantic deduplication").

    Where :func:`embedding_near_dups` blocks on random hyperplanes,
    this blocks on a TRAINED coarse quantizer: each vector is assigned
    to its nearest centroid (one narrow map over centroid literals —
    the same pretrained-quantizer pattern as :func:`ivf_topk`), and
    cosine is evaluated only within a cluster. Trained clusters track
    the data's own density, so semantically-close pairs land together
    at much higher rates than under data-oblivious hyperplane cuts.

    Cost shape, measured at sf0.1 (5k × 64-dim): the per-pair cosine
    fold dominates, so the corpus is L2-normalized ONCE up front
    (cosine → one dot fold instead of dot+two norms, 3×) and the
    cluster count — not the formula — controls pair volume
    (Σ cluster² ≈ n²/n_lists). Size n_lists to the corpus (the paper
    uses ~100k clusters at LAION scale; rule of thumb n_lists ≈
    corpus / 1k); the 8→64-list move plus normalization took the
    sf0.1 entry 13 s → ~2 s with identical semantics. The self-join
    shuffles the corpus once, hash-partitioned by cluster id.

    ``star_cap``: clusters larger than the cap (a huge
    exact-duplicate embedding class lands in ONE cluster no matter
    how n_lists is sized) star-link against the cluster min instead
    of emitting O(n²) pairs from one reducer — the same guard the
    minhash/simhash/ngram bucket-combines carry, equivalent for
    keep/drop pruning of homogeneous duplicate classes.

    PRECONDITION: ``id_col`` must be unique per row (the contract of
    every id-keyed operator here — embeddings tables are keyed by
    vec_id). The per-row argmax assignment keeps one corpus row per
    input row, so a DUPLICATED id would contribute one corpus row
    per duplicate (and with it ``id_a == id_b`` self-pairs at
    cosine 1.0) where a pre-round-11 ``groupBy(id)`` shape
    collapsed duplicates to an arbitrary single vector. Neither
    behavior is meaningful for non-unique ids — dedup of a corpus
    whose KEYS are ambiguous is ill-posed — so the precondition is
    documented rather than paid for with a corpus-wide
    ``dropDuplicates`` exchange (which would undo the slim-argmax
    optimization for every well-keyed caller). Run
    ``df.dropDuplicates([id_col])`` first if your ids may repeat.

    Returns (id_a, id_b, list_id, cosine), id_a < id_b.
    """
    if centroids and len(centroids[0]) != dim:
        raise ValueError(
            f"semdedup_pairs: centroid dim {len(centroids[0])} != {dim}"
        )
    cn = unit_normalize(centroids)
    # two-step normalize: materialize the norm as a column first — a
    # sqrt-fold INSIDE the transform lambda would re-run per element
    # (64× the work). Zero-norm vectors (missing/failed embeddings)
    # divide by 1 instead of erroring the job under ANSI mode; their
    # all-zero unit vector dots to 0 with everything, so they never
    # pair — mirroring unit_normalize's `or 1.0` guard.
    from prql_spark.operators.dedup import _spread

    # the normalize + n_lists-fold argmax below are narrow maps — a
    # single-scan-partition input would run them as ONE task (no-op
    # on parallel inputs; see brute_force_topk's measured A/B)
    base = (
        _spread(df, id_col).select(
            F.col(id_col),
            F.expr(_norm(vec_col)).alias("__n0"),
            F.col(vec_col),
        )
        .select(
            F.col(id_col),
            F.expr("IF(__n0 = 0.0, 1.0, __n0)").alias("__n"),
            F.col(vec_col),
        )
        .select(
            F.col(id_col),
            # zip_with against a repeated-scalar array instead of
            # referencing __n inside the lambda BODY: a lambda-body
            # column ref is one alias substitution (pushdown /
            # collapse) away from re-evaluating the sqrt fold per
            # ELEMENT (64×) — whole-array arguments are safe under
            # any substitution. Same float ops, identical values.
            F.expr(
                f"zip_with({vec_col}, "
                f"array_repeat(__n, size({vec_col})), "
                f"(x, nv) -> CAST(x AS DOUBLE) / nv)"
            ).alias("__vn"),
        )
    )
    # Assignment = per-row argmax over ONE constant centroid-array
    # literal: transform((c, i) -> (round(cos, 9), i)) + array_max —
    # round-9 cos, ties to the larger index, the same cross-engine
    # determinism contract as _nearest_expr. Round 12: this replaces
    # the round-11 broadcast-join + max(struct) SortAggregate +
    # corpus re-join — measured 1.74 s → 0.99 s for the corpus phase
    # at sf0.1 (identical assignments), and it deletes BOTH corpus
    # exchanges (the argmax group-by and the re-join): the
    # assignment is now a narrow map, linear at 100 TB with zero
    # shuffle. This is NOT the shape round 11 measured at 108 s —
    # that one unrolled n_lists SEPARATE named_struct expressions,
    # each embedding its own 64-literal array (n_lists × dim literal
    # loads of generated code, past the codegen limits into per-row
    # interpretation). Here the centroids fold into a single
    # array<array<double>> literal OBJECT at optimization time and
    # one interpreted transform loops over it; the dot fold runs
    # exactly as often as the old join shape without materializing
    # the n × n_lists joined rows (the 64-way vector copy was the
    # measured cost, not the fold). __vn enters through a
    # one-element binding, so no alias substitution can inline the
    # normalize chain into the lambda body.
    if hier_assign:
        # corpus-sized quantizer: the two-level assignment (measured
        # 5.9× at 2000 lists, the only tractable path past ~8000);
        # approximate (≥98% agreement pinned in tests) — the oracled
        # entry keeps the exact flat path below
        corpus = assign_lists_hier(
            base, cn, vec_col="__vn", id_col=id_col, out_col="list_id"
        )
    else:
        # The centroid table enters the plan as ONE constant:
        # from_json over a literal JSON string, which ConstantFolding
        # collapses to a single array<array<double>> literal OBJECT
        # before execution (verified in the optimized plan), and
        # Jackson's double parse round-trips repr-exact values
        # bit-for-bit. Measured alternatives for getting n_lists×dim
        # doubles into the plan PER QUERY BUILD (driver-side, inside
        # any caller's timed region): SQL-text literals ~1.4 s of
        # parsing, F.lit per row / nested ~1.8-2.0 s of py4j
        # element-wise conversion, this form ~10 ms (one string
        # ships). unit_normalize guarantees finite values (no
        # NaN/Infinity to trip JSON).
        import json as _json

        cents_lit = F.from_json(
            F.lit(_json.dumps(cn)), "array<array<double>>"
        )

        def _dot_col(a, b):
            return F.aggregate(
                F.zip_with(a, b, lambda x, y: x.cast("double") * y),
                F.lit(0.0).cast("double"),
                lambda acc, v: acc + v,
            )

        argmax = F.element_at(
            F.transform(
                F.array(F.col("__vn")),
                lambda vn: F.array_max(
                    F.transform(
                        cents_lit,
                        lambda c, i: F.struct(
                            F.round(_dot_col(vn, c), 9).alias("cos"),
                            i.alias("i"),
                        ),
                    )
                ),
            ),
            1,
        )["i"]
        corpus = base.select(
            F.col(id_col), F.col("__vn"), argmax.alias("list_id")
        )
    # Bucket-combine (the minhash/simhash shape), not a self-join:
    # ONE more exchange groups each cluster's (id, vn) members, and
    # pairs are generated inside the collected bucket. A self-join on
    # list_id would recompute the whole assignment on BOTH sides and
    # exchange the corpus twice more; here assignment runs once and
    # the pair reducer sees exactly its cluster. Per-reducer work is
    # O(cluster²) either way — n_lists sizing is the lever.
    grouped = (
        corpus.groupBy("list_id")
        .agg(
            F.expr(
                f"array_sort(collect_list(struct({id_col}, __vn)))"
            ).alias("mem")
        )
        .where(F.expr("size(mem) >= 2"))
    )
    from prql_spark.operators.dedup import pairs_from_buckets

    pair = (
        f"named_struct('id_a', mem[p.i].{id_col}, "
        f"'id_b', mem[p.j].{id_col}, "
        f"'cosine', round({_dot('mem[p.i].__vn', 'mem[p.j].__vn')}, 6))"
    )
    return (
        pairs_from_buckets(grouped, pair, star_cap)
        .select("p.id_a", "p.id_b", "list_id", "p.cosine")
        .where(F.col("cosine") >= threshold)
    )


def semdedup(
    df: DataFrame,
    dim: int,
    centroids: list[list[float]] | None = None,
    n_lists: int | None = None,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    star_cap: int = 256,
    hier_assign: bool | None = None,
) -> DataFrame:
    """Rows surviving semantic dedup: drop any vector that has a
    smaller-id within-cluster neighbor at cosine >= threshold (greedy
    keep-first, matching the dedup family's policy). Pass pretrained
    ``centroids`` (the production path — train once, prune many
    shards); ``centroids=None`` trains on the fly with
    ``n_lists=None`` sized from a corpus count via
    :func:`occupancy_lists` (n ≈ corpus/1k — mean cluster size, and
    with it pair volume per reducer, stays ~constant at any scale).

    ``hier_assign=None`` (default) picks the assignment strategy by
    quantizer size: past 1000 lists the flat argmax's n × n_lists
    folds dominate (measured 486 s vs 82 s at 2000 lists, 200k
    vectors) and the two-level :func:`assign_lists_hier` takes over
    (approximate — ≥98% agreement pinned in tests). Force True/False
    to override; the oracled entry's 64-list quantizer stays flat."""
    if centroids is None:
        if n_lists is None:
            n_lists = occupancy_lists(df.count())
        centroids = ivf_train_centroids(df, dim, n_lists, vec_col=vec_col,
                                        id_col=id_col)
    if hier_assign is None:
        hier_assign = len(centroids) > 1000
    losers = (
        semdedup_pairs(
            df, dim, centroids, threshold, vec_col, id_col, star_cap,
            hier_assign=hier_assign,
        )
        .select(F.col("id_b").alias(id_col))
        .distinct()
    )
    return df.join(losers, id_col, "left_anti")


def super_quantize(
    centroids: list[list[float]],
    n_super: int | None = None,
    iters: int = 5,
    seed: int = 42,
) -> tuple[list[list[float]], list[int]]:
    """Cluster the CENTROIDS themselves (driver-side numpy Lloyd's,
    unit-normalized cosine) into ~√L superclusters — the coarse level
    of a two-level quantizer. Returns (super_centroids,
    super_of_list) where super_of_list[i] is list i's supercluster."""
    import math

    import numpy as np

    c = np.asarray(centroids, dtype=np.float64)
    norms = np.linalg.norm(c, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    cn = c / norms
    L = len(centroids)
    k = n_super or max(2, int(math.isqrt(L)))
    k = min(k, L)
    rng = np.random.default_rng(seed)
    sup = cn[rng.choice(L, size=k, replace=False)]
    for _ in range(iters):
        assign = (cn @ sup.T).argmax(axis=1)
        for j in range(k):
            members = cn[assign == j]
            if len(members):
                m = members.mean(axis=0)
                n = np.linalg.norm(m) or 1.0
                sup[j] = m / n
    assign = (cn @ sup.T).argmax(axis=1)
    return [list(map(float, row)) for row in sup], [int(a) for a in assign]


def assign_lists_hier(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    nprobe_super: int = 4,
    out_col: str = "list_id",
    seed: int = 42,
) -> DataFrame:
    """Two-level (hierarchical) coarse-quantizer ASSIGNMENT — the
    scale path past the flat broadcast-frame argmax: flat assignment
    costs n × L cosine folds, which at L = 100k lists (the SemDeDup
    paper's LAION sizing) is 10⁴× the corpus scan. Here each vector
    scores the ~√L SUPERCLUSTERS (one broadcast frame), probes its
    ``nprobe_super`` best, and argmaxes only the centroids inside
    those — n × (√L + nprobe_super·√L) folds, an ~L/(√L·(p+1))
    speedup that GROWS with L.

    MEASURED at 200k×64-dim vectors (beware dead-code-eliminated
    benchmarks: a ``count()`` drain lets Catalyst prune the whole
    argmax — force the assigned values): L=2000 → flat 486 s, hier
    82 s (5.9×); at L=8000 the flat path did not finish in 10
    minutes. Below L ≈ a few hundred the flat path's map-side
    partial max wins (hier pays two joins + a probe exchange) — keep
    flat for pretrained small quantizers, switch here when n_lists
    is occupancy-sized for a large corpus.

    APPROXIMATE by construction: the true nearest centroid can live
    in an unprobed supercluster. Agreement vs the exact argmax is
    pinned in tests (≥98% at nprobe_super=6 on UNstructured random
    embeddings — the worst case; clustered real corpora agree higher
    at lower probes, 97.3% at 4 probes here). Oracled entries keep
    the exact path (results must be bit-reproducible); this is the
    opt-in for corpus-sized quantizers.

    Returns (id, vec, out_col); ties and rounding follow the exact
    path's contract (round-9 cosine, ties to larger index).
    """
    spark = df.sparkSession
    sup, super_of = super_quantize(centroids, seed=seed)
    cn = unit_normalize(centroids)
    sup_df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(sup)], "si int, sc array<double>"
    )
    cents_df = spark.createDataFrame(
        [(super_of[i], i, c) for i, c in enumerate(cn)],
        "si int, i int, c array<double>",
    )
    # stage 1: per-vector top-p superclusters (broadcast ~√L rows).
    # The probe exchange carries NO vectors — only (id, (cos, si))
    # structs (a first formulation that exploded the vector per super
    # shuffled n×√L×dim doubles and lost to the flat path outright;
    # slim probes shuffle n×√L×16 bytes). A hash aggregate with a
    # per-group array sort, not a window (the window's full sort of
    # the exploded rows measured ~2× this stage).
    probes = (
        df.select(F.col(id_col), F.col(vec_col))
        .join(F.broadcast(sup_df))
        .select(
            F.col(id_col),
            F.expr(
                f"named_struct('cos', round({cosine_expr(vec_col, 'sc')}, 9), "
                f"'si', si)"
            ).alias("__ss"),
        )
        .groupBy(id_col)
        .agg(
            F.expr(
                f"transform(slice(reverse(array_sort(collect_list(__ss))), "
                f"1, {nprobe_super}), s -> s.si)"
            ).alias("__top")
        )
    )
    # stage 2: vectors join their probe list ONCE (the corpus
    # exchanges by id exactly one time), explode the p probes, argmax
    # over the probed superclusters' centroids via the broadcast
    # frame. The final groupBy reuses the join's id-partitioning —
    # no further exchange; max() partial-aggregates map-side.
    return (
        df.select(F.col(id_col), F.col(vec_col))
        .join(probes, id_col)
        .select(
            F.col(id_col),
            F.col(vec_col),
            F.explode(F.col("__top")).alias("si"),
        )
        .join(F.broadcast(cents_df), "si")
        .select(
            F.col(id_col),
            F.col(vec_col),
            F.expr(
                f"named_struct('cos', round({cosine_expr(vec_col, 'c')}, 9), "
                f"'i', i)"
            ).alias("__s"),
        )
        .groupBy(id_col)
        .agg(F.max("__s").alias("__m"), F.first(vec_col).alias(vec_col))
        .select(id_col, vec_col, F.col("__m.i").alias(out_col))
    )


def occupancy_lists(
    n_vectors: int, target_cluster: int = 1000, lo: int = 8,
    hi: int = 1 << 17,
) -> int:
    """Cluster count sized from the corpus: n_lists ≈
    n_vectors / target_cluster, clamped to [lo, hi].

    The k-means-blocked pair emitters (semdedup) and IVF probing both
    have cost ~n²/n_lists — a FIXED list count is the same scale trap
    as a fixed plane count: at 10⁸ vectors, 64 lists would put ~1.5M
    vectors in every cluster and the star_cap would truncate real
    (non-duplicate) neighborhoods, not just degenerate classes.
    Deriving n_lists from a corpus count keeps mean cluster size
    ~constant (the SemDeDup paper trains ~100k clusters at LAION
    scale — exactly this rule). The trainer's broadcast-frame argmax
    assignment scales to these list counts (the inline-literal form
    does not — see :func:`ivf_train_centroids`)."""
    return min(hi, max(lo, round(n_vectors / target_cluster)))


def occupancy_planes(
    n_vectors: int, target_bucket: int = 64, lo: int = 4, hi: int = 24
) -> int:
    """Plane count sized from the corpus: 2^n_planes buckets ≈
    n_vectors / target_bucket, clamped to [lo, hi].

    A FIXED plane count is the scale trap: 8 planes = 256 buckets
    means O(n²/256) candidate pairs and 256-way max join parallelism
    no matter how big the corpus gets. Occupancy-derived sizing keeps
    mean bucket size ~constant, so candidate volume grows linearly
    with the corpus (10⁸ vectors → 21 planes → ~2M buckets)."""
    import math

    return min(hi, max(lo, math.ceil(math.log2(max(n_vectors / target_bucket, 2.0)))))


def embedding_near_dups(
    df: DataFrame,
    dim: int,
    threshold: float = 0.95,
    n_planes: int | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
    multiprobe: bool = True,
    star_cap: int = 256,
) -> DataFrame:
    """Near-duplicate pairs by embedding cosine, LSH-blocked.

    ``n_planes=None`` (default) derives the plane count from a corpus
    count via :func:`occupancy_planes` — one cheap count job buys a
    bucket grid that keeps mean occupancy ~constant at any scale. An
    explicit ``n_planes`` pins the grid (the oracled driver entry
    does, for a deterministic cross-engine plan).

    n_planes planes → 2^n_planes buckets; only bucket-colliding pairs
    are scored. Bucket-combine shape (shared with minhash / simhash /
    ngram / semdedup): ONE group-by exchange on the probed bucket id,
    pairs generated inside each collected bucket — no self-join
    re-bucketing the corpus on both sides.

    ``star_cap`` closes the mega-bucket hole occupancy sizing cannot:
    n IDENTICAL embeddings share a bucket at ANY plane count and
    would emit n(n-1)/2 pairs from one reducer; past the cap every
    member pairs only with the bucket min (O(n), dedup-equivalent for
    the homogeneous duplicate classes that produce huge buckets).

    With ``multiprobe`` each vector ALSO probes its n_planes
    Hamming-1 neighbor buckets (one sign bit flipped), so pairs whose
    signatures differ in one bit are still compared — at cos≈0.95
    exact-collision recall is already (1-θ/π)^8 ≈ 0.87, but at looser
    thresholds (θ≈70°) it is ~2% and Hamming-1 probing lifts it ~6×.
    Probing is asymmetric: a pair is emitted only when its LARGER id
    sits in its exact bucket (``mem[p.j].__exact``) — the same
    exactly-once contract the old ``l.probe = r.bucket AND
    l.id < r.id`` join enforced, so no dedup stage, and candidate
    volume is (n_planes+1)× the exact-collision count, not
    (n_planes+1)².
    """
    from prql_spark.operators.dedup import _spread

    if n_planes is None:
        n_planes = occupancy_planes(df.count())
    planes = hyperplanes(dim, n_planes, seed)
    b = _bucket_expr(vec_col, planes)
    # n_planes sign-dot folds per row: spread a single-scan-partition
    # input (no-op on parallel inputs — see brute_force_topk's A/B)
    base = _spread(df, id_col).select(
        F.col(id_col), F.col(vec_col), F.expr(b).alias("__bucket")
    )
    masks = [0] + ([1 << j for j in range(n_planes)] if multiprobe else [])
    probe_arr = "array(" + ", ".join(
        f"named_struct('g', __bucket ^ {m}, 'e', {str(m == 0).upper()})"
        for m in masks
    ) + ")"
    rows = base.select(
        F.col(id_col),
        F.col(vec_col),
        F.explode(F.expr(probe_arr)).alias("__pr"),
    ).select(
        id_col, vec_col,
        F.col("__pr.g").alias("__grp"),
        F.col("__pr.e").alias("__exact"),
    )
    # mem sorts by id (first struct field) — ids are unique within a
    # group because a vector's probe buckets are pairwise distinct
    grouped = (
        rows.groupBy("__grp")
        .agg(
            F.expr(
                f"array_sort(collect_list("
                f"struct({id_col}, __exact, {vec_col})))"
            ).alias("mem")
        )
        .where(F.expr("size(mem) >= 2"))
    )
    from prql_spark.operators.dedup import pairs_from_buckets

    pair = (
        f"named_struct("
        f"'id_a', mem[p.i].{id_col}, 'id_b', mem[p.j].{id_col}, "
        f"'cosine', round({cosine_expr(f'mem[p.i].{vec_col}', f'mem[p.j].{vec_col}')}, 6))"
    )
    return (
        pairs_from_buckets(
            grouped, pair, star_cap,
            idx_filter="mem[p.j].__exact",
            # cap on EXACT members: quadratic pair volume is
            # size × n_exact, and a probe-inflated healthy bucket
            # (multiprobe adds n_planes× rows) must not lose
            # all-pairs recall — only a genuine duplicate class
            # (huge EXACT count in one bucket) star-links
            cap_on="size(filter(mem, m -> m.__exact))",
        )
        .select("p.id_a", "p.id_b", "p.cosine")
        .where(F.col("cosine") >= threshold)
    )


def pseudo_centroids(
    n: int = 64, dim: int = 64, seed: int = 7
) -> list[list[float]]:
    """Deterministic unit-normalized pseudo-random centroids — a
    stand-in quantizer for tests and value oracles that need MORE
    lists than the pretrained set (hierarchical assignment is only
    meaningfully partial when nprobe_super < √L superclusters).
    Values are rounded to 6 decimals BEFORE normalization so the
    literal repr embedded in an oracle reconstructs bit-identical
    doubles on any engine."""
    import math
    import random

    rng = random.Random(seed)
    out = []
    for _ in range(n):
        v = [round(rng.gauss(0.0, 1.0), 6) for _ in range(dim)]
        nrm = math.sqrt(sum(x * x for x in v)) or 1.0
        out.append([x / nrm for x in v])
    return out
