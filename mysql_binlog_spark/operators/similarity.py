"""Similarity search over embedding columns (array<float>).

* ``cosine_knn`` — brute-force top-k: cross join queries × corpus with the
  dot product as JVM builtins (zip_with + aggregate, whole-stage codegen).
  The baseline; exact.  At scale: broadcast the (small) query set so the
  corpus scan stays shuffle-free, then a top-k per query via window.
* ``lsh_ann_*`` — sign-LSH (random hyperplanes): bucket by the sign
  pattern of dot(h_j, emb); candidates only within equal buckets.  The
  scale path — the corpus shuffles once on a uniform bucket key, no n².
* ``cosine_neardup_pairs`` — near-dup pairs above a cosine threshold via
  the same LSH bucketing.

Hyperplanes are deterministic md5-derived ±1 vectors
(functions/hashing.hyperplanes) shared with the DuckDB oracle as literals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import hyperplanes


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_knn(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 4,
) -> DataFrame:
    """Exact top-k neighbors per query vector (excluding self).

    ``queries`` is broadcast — the corpus-side scan never shuffles; the
    only wide exchange is the per-query top-k reduce.

    Round-7 optimization (guide §1.2 "per-task work" + §2): norms are
    hoisted OUT of the pair loop — each corpus norm is computed once per
    row and each query norm once per query instead of once per
    (query, corpus) pair, which cuts the scoring stage's higher-order-
    function work ~3× with bit-identical doubles (same per-element
    sequence of IEEE ops, just evaluated once).  ``spread`` widens a
    single-file corpus scan so scoring uses the whole cluster.
    """
    from pyspark.sql import Window

    from .partitioning import spread

    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    ).withColumn("_qnorm", _norm(F.col("qvec")))
    c = spread(
        corpus.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec")
        )
    ).withColumn("_cnorm", _norm(F.col("cvec")))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                _dot(F.col("qvec"), F.col("cvec"))
                / (F.col("_qnorm") * F.col("_cnorm")),
                round_digits,
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def lsh_bucket_expr(vec_col, planes: list[list[float]]):
    """Sign pattern of the hyperplane dots, packed into one bigint bucket."""
    bucket = F.lit(0).cast("bigint")
    for j, hp in enumerate(planes):
        dot_j = _dot(vec_col, F.array(*[F.lit(v) for v in hp]))
        bucket = bucket + F.when(dot_j >= 0, F.lit(1 << j)).otherwise(F.lit(0))
    return bucket


def lsh_ann_buckets(
    df: DataFrame,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    planes = hyperplanes(n_planes, dim)
    return df.select(
        F.col(id_col),
        lsh_bucket_expr(F.col(vec_col), planes).alias("bucket"),
    )


def band_planes(n_bands: int, planes_per_band: int, dim: int) -> list[list[list[float]]]:
    """Deterministic hyperplanes split into bands: band j uses planes
    [j*r, (j+1)*r) of one shared hyperplanes() call (oracle-portable)."""
    flat = hyperplanes(n_bands * planes_per_band, dim)
    return [
        flat[j * planes_per_band : (j + 1) * planes_per_band]
        for j in range(n_bands)
    ]


def cosine_neardup_pairs(
    df: DataFrame,
    threshold: float = 0.45,
    n_bands: int = 6,
    planes_per_band: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    round_digits: int = 4,
) -> DataFrame:
    """Near-duplicate vector pairs: banded sign-LSH candidates + exact
    cosine verify (VERDICT round-1 #8: the single-4-plane variant held
    n/16 vectors per bucket → (n/16)² blow-up at corpus scale).

    8 planes/band → 256 buckets/band keeps bucket sizes sub-linear; 6
    bands multi-probe recovers recall: P(candidate) = 1-(1-p^8)^6 with
    p = 1-θ/π.  For true near-dups (cos ≥ 0.95) that is ≈ 0.96; at the
    verify threshold 0.45 it is ≈ 0.17 — documented approximate recall,
    replicated exactly by the oracle (shared deterministic planes).
    """
    bands = band_planes(n_bands, planes_per_band, dim)
    banded = F.array(
        *[
            F.struct(
                F.lit(j).alias("band_idx"),
                lsh_bucket_expr(F.col(vec_col), bp).alias("band_key"),
            )
            for j, bp in enumerate(bands)
        ]
    )
    withb = df.select(F.col(id_col), F.col(vec_col), banded.alias("_bands"))
    # No persist (round 5): both sides of the self-join are the same
    # subplan shuffled by (band_idx, band_key) — AQE exchange reuse
    # computes the bucket projection once per action, with no cached
    # blocks left behind in a long-lived session.
    ex = withb.select(F.col(id_col), F.explode("_bands").alias("b")).select(
        id_col, "b.band_idx", "b.band_key"
    )
    a, b = ex.alias("ba"), ex.alias("bb")
    cands = (
        a.join(
            b,
            (F.col("ba.band_idx") == F.col("bb.band_idx"))
            & (F.col("ba.band_key") == F.col("bb.band_key"))
            & (F.col(f"ba.{id_col}") < F.col(f"bb.{id_col}")),
        )
        .select(
            F.col(f"ba.{id_col}").alias("vec_a"),
            F.col(f"bb.{id_col}").alias("vec_b"),
        )
        .distinct()
    )
    va = withb.select(F.col(id_col).alias("_ia"), F.col(vec_col).alias("_va"))
    vb = withb.select(F.col(id_col).alias("_ib"), F.col(vec_col).alias("_vb"))
    return (
        cands.join(va, cands.vec_a == F.col("_ia"))
        .join(vb, cands.vec_b == F.col("_ib"))
        .select(
            "vec_a",
            "vec_b",
            F.round(cosine(F.col("_va"), F.col("_vb")), round_digits).alias(
                "cos_sim"
            ),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


# ------------------------------------------- scalar quantization (SQ8)

def sq8_quantized(vec_col):
    """Per-vector int8 scalar quantization: q_i = round(x_i / s) with
    s = max|x| / 127 (floored at 1e-12 for zero vectors).  4x memory
    compression for a 100 TB embedding store; cosine over the quantized
    vectors needs NO dequantization — the scale cancels — and integer
    dot products are exact, so ranking is bit-deterministic across
    engines (no float reduce-order sensitivity at all)."""
    scale = F.greatest(
        F.array_max(F.transform(vec_col, lambda x: F.abs(x.cast("double"))))
        / F.lit(127.0),
        F.lit(1e-12),
    )
    return F.transform(
        vec_col, lambda x: F.round(x.cast("double") / scale).cast("int")
    )


def sq8_knn(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 4,
) -> DataFrame:
    """Exact top-k by cosine over SQ8-quantized vectors (both sides
    quantized — the memory-bound ANN configuration).  Plan shape is
    cosine_knn's: queries broadcast, corpus never shuffles, one top-k
    window reduce."""
    from pyspark.sql import Window

    q = queries.select(
        F.col(id_col).alias("query_id"),
        sq8_quantized(F.col(vec_col)).alias("qv"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        sq8_quantized(F.col(vec_col)).alias("cv"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("cv")), round_digits).alias(
                "cos_sim"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


# ------------------------------------------------------------------- IVF

IVF_SCALE = 10_000_000  # float→scaled-int quantum for exact Lloyd sums


def ivf_centroid_ids(n_cells: int) -> list[int]:
    """Deterministic centroid seeds: corpus vectors with ids 0, 7, 14, …
    (no RNG; shared with the DuckDB oracle).  ``ivf_lloyd_refine`` runs
    fixed-count k-means iterations from these seeds."""
    return [7 * j for j in range(n_cells)]


def ivf_best_cell(vec_col, centroids: list[tuple[int, list[float]]]):
    """(s, negcell) struct of the argmax-cosine cell (score rounded to 4
    decimals, ties to the lower cell via the negated index)."""
    scored = F.array(
        *[
            F.struct(
                F.round(
                    cosine(vec_col, F.array(*[F.lit(v) for v in c])), 4
                ).alias("s"),
                F.lit(-j).alias("negcell"),
            )
            for j, (_, c) in enumerate(centroids)
        ]
    )
    return F.array_max(scored)


def ivf_cell_expr(vec_col, centroids: list[tuple[int, list[float]]]):
    """argmax-cosine cell index (ties to the lower cell) as a column."""
    return -ivf_best_cell(vec_col, centroids)["negcell"]


def ivf_assign(
    df: DataFrame,
    centroids: list[tuple[int, list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign every vector to its nearest centroid by cosine (argmax, ties
    to the lower cell id) — one narrow projection, no shuffle."""
    return df.select(
        F.col(id_col), F.col(vec_col),
        ivf_cell_expr(F.col(vec_col), centroids).alias("cell"),
    )


def ivf_lloyd_refine(
    embs: DataFrame,
    centroids: list[tuple[int, list[float]]],
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> list[tuple[int, list[float]]]:
    """Fixed-count deterministic Lloyd refinement (VERDICT round-2 #5).

    Each iteration reassigns every vector to its argmax-cosine cell
    (round-4, ties to the lower cell) and replaces each centroid with the
    elementwise SUM of its members' scaled-integer vectors
    (``round(x·10⁷)`` as BIGINT), cast to double.  Cosine is
    scale-invariant, so the sum points exactly where the mean does — and
    integer sums are associative/order-independent, so a SQL oracle
    reproduces the refined centroids bit-for-bit (float means would drift
    with Spark's nondeterministic reduce order).  Empty cells keep their
    previous centroid.

    100 TB shape: per iteration one narrow projection (assignment is a
    literal expression, no join) + one groupBy("cell", "pos") partial-agg
    shuffle bounded by n_cells × dim; the driver collects only
    n_cells × dim longs.
    """
    cents = [(cid, [float(v) for v in vec]) for cid, vec in centroids]
    scaled = embs.select(
        F.col(id_col),
        F.col(vec_col),
        F.transform(
            F.col(vec_col),
            lambda x: F.round(x.cast("double") * IVF_SCALE).cast("bigint"),
        ).alias("_iv"),
    ).persist()
    for _ in range(iters):
        sums = (
            scaled.withColumn(
                "cell", ivf_cell_expr(F.col(vec_col), cents)
            )
            .select("cell", F.posexplode("_iv").alias("pos", "v"))
            .groupBy("cell", "pos")
            .agg(F.sum("v").alias("s"))
            .collect()
        )
        by_cell: dict[int, dict[int, int]] = {}
        for r in sums:
            by_cell.setdefault(r["cell"], {})[r["pos"]] = r["s"]
        cents = [
            (
                cid,
                [float(by_cell[j].get(p, 0)) for p in range(dim)]
                if j in by_cell
                else old,
            )
            for j, (cid, old) in enumerate(cents)
        ]
    scaled.unpersist(blocking=False)
    return cents


def ivf_knn(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[tuple[int, list[float]]],
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 4,
) -> DataFrame:
    """IVF approximate kNN: corpus bucketed once by nearest centroid;
    each query probes only its ``nprobe`` closest cells and ranks
    exactly inside them.

    100 TB shape: the corpus shuffles once on ``cell`` (bounded
    cardinality, uniform-ish); a query touches nprobe/n_cells of the
    data.  Queries are broadcast (small side).  Recall is the standard
    IVF trade — governed by nprobe — and the oracle replicates the
    probe rule exactly, so correctness checks stay deterministic.
    """
    from pyspark.sql import Window

    assigned = ivf_assign(corpus, centroids, id_col, vec_col)
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    # per-query probe list: rank all centroids by cosine to the query
    cents = F.array(
        *[
            F.struct(
                F.round(
                    cosine(F.col("qvec"), F.array(*[F.lit(v) for v in c])),
                    4,
                ).alias("s"),
                F.lit(-j).alias("negcell"),
            )
            for j, (_, c) in enumerate(centroids)
        ]
    )
    probes = q.select(
        "query_id", "qvec",
        F.slice(F.reverse(F.array_sort(cents)), 1, nprobe).alias("_top"),
    ).select(
        "query_id", "qvec",
        F.explode(F.transform(F.col("_top"), lambda s: -s["negcell"])).alias(
            "cell"
        ),
    )
    scored = (
        assigned.join(F.broadcast(probes), on="cell")
        .filter(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            F.round(cosine(F.col("qvec"), F.col(vec_col)), round_digits).alias(
                "cos_sim"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def semantic_dedup(
    corpus: DataFrame,
    centroids: list[tuple[int, list[float]]],
    threshold: float = 0.45,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 4,
) -> DataFrame:
    """SemDeDup-shaped semantic deduplication (Abbas et al. 2023 pattern):
    cluster the embedding corpus by nearest centroid (``ivf_assign`` —
    one narrow projection, no shuffle), then inside each cell drop every
    vector whose cosine to a LOWER-id cell-mate reaches ``threshold``
    (keep the lowest id as the group representative).  Returns the
    surviving (id, cell) rows.

    100 TB shape: candidate pairs exist only WITHIN a cell — one shuffle
    keyed on the bounded ``cell`` id, |cell|² work per cell instead of
    n² overall, the same containment bound as IVF probing.  Cell counts
    are balanced by the deterministic Lloyd refinement upstream; a hot
    cell is re-split by raising n_cells, not by changing this operator.
    Cosines are rounded to ``round_digits`` before the threshold compare
    so a SQL oracle reproduces the survivor set exactly.
    """
    assigned = ivf_assign(corpus, centroids, id_col, vec_col)
    a = assigned.alias("a")
    b = assigned.alias("b")
    dominated = (
        a.join(
            b,
            (F.col("a.cell") == F.col("b.cell"))
            & (F.col(f"b.{id_col}") < F.col(f"a.{id_col}")),
        )
        .filter(
            F.round(
                cosine(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}")),
                round_digits,
            )
            >= threshold
        )
        .select(F.col(f"a.{id_col}").alias(id_col))
        .distinct()
    )
    return assigned.join(dominated, id_col, "left_anti").select(
        F.col(id_col), F.col("cell").cast("int").alias("cell")
    )


def ivf_cluster_stats(
    embs: DataFrame,
    centroids: list[tuple[int, list[float]]],
    vec_col: str = "embedding",
) -> DataFrame:
    """(cell, n_vectors, avg_cos): IVF index health — per-cell population
    and mean cosine-to-own-centroid (the balance/coherence report that
    decides nlist sizing and re-training cadence; FAISS's imbalance
    factor is computed from exactly these counts).

    100 TB shape: the argmax scoring is the SAME narrow projection as
    ``ivf_assign`` (no shuffle), the collapse is one aggregation to
    |cells| rows.

    Determinism: a raw float cosine differs between engines in the last
    ulp (different dot-product summation), which can flip a round(·,4)
    half-boundary and drift the mean.  The REPORTED cosine is therefore
    computed over integer-quantized copies — vector at ×IVF_SCALE (the
    Lloyd quantum), centroid integer-divided so |cq| ≤ 1e6 — keeping
    every product and partial sum an exact integer below 2^53: the
    double arithmetic is then EXACT in any order, sqrt is IEEE
    correctly-rounded, and round(·,4) sees bit-identical inputs.
    Quantization error ~1e-6, far below the reported precision.  Cell
    ASSIGNMENT stays on the float cosine (parity proven by the IVF
    queries; ties already broken by round-4 + cell order).
    """
    cmap_entries = []
    for j, (_, c) in enumerate(centroids):
        mx = max(int(abs(round(v))) for v in c) or 1
        d = mx // 1_000_000 + 1
        cq = [
            (1 if v >= 0 else -1) * (int(abs(round(v))) // d) for v in c
        ]
        cmap_entries += [F.lit(j), F.array(*[F.lit(x) for x in cq])]
    cmap = F.create_map(*cmap_entries)
    iv = F.transform(
        F.col(vec_col),
        lambda x: F.round(x.cast("double") * IVF_SCALE).cast("bigint"),
    )
    d = embs.select(
        (-ivf_best_cell(F.col(vec_col), centroids)["negcell"])
        .cast("int")
        .alias("cell"),
        iv.alias("_iv"),
    )
    d = d.select(
        "cell",
        F.round(
            F.round(cosine(F.col("_iv"), F.element_at(cmap, F.col("cell"))), 4)
            * 1e4
        )
        .cast("bigint")
        .alias("q"),
    )
    return d.groupBy("cell").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vectors"),
        F.round(F.sum("q") / (F.count(F.lit(1)) * 1e4), 6).alias("avg_cos"),
    )


# --------------------------------------------------------------------- PQ

# Product quantization (Jégou et al. 2011): split the d-dim space into M
# subspaces, quantize each subvector to one of K codebook entries, store
# M small codes per vector (e.g. 16 bytes vs 64 floats — 16× memory).
# Queries stay EXACT and score against reconstructions via asymmetric
# distance computation (ADC): score(q, c) = Σ_m <q_m, cb[m][code_m(c)]>
# — the memory-bound ANN shape for an embedding lake too big to hold
# uncompressed (IVF bounds compute, PQ bounds memory; production systems
# compose both).  Codebooks here are deterministic corpus seeds (the IVF
# seeding convention, vec_id 0,7,…) so the DuckDB oracle replays them
# exactly; k-means-refined codebooks drop in via the same literals.


def pq_seed_ids(k_codes: int) -> list[int]:
    """Seed vec_ids for the codebooks — the IVF convention (·7 stride)."""
    return [7 * j for j in range(k_codes)]


def pq_codebooks(
    seeds: list[tuple[int, list[float]]], m: int, dim: int
) -> list[list[list[float]]]:
    """codebooks[m][j] = subvector m of seed j (sorted by seed id)."""
    subdim = dim // m
    vecs = [v for _, v in sorted(seeds)]
    return [
        [[float(x) for x in v[mm * subdim : (mm + 1) * subdim]] for v in vecs]
        for mm in range(m)
    ]


def _l2_to_code(sub, code_lits):
    """round(<s,s> - 2<s,c> + <c,c>, 4) — the dot-expansion form, every
    term an in-engine left-to-right fold so the DuckDB twin
    (list_dot_product) reproduces it bit-for-bit."""
    return F.round(
        _dot(sub, sub) - 2 * _dot(sub, code_lits) + _dot(code_lits, code_lits),
        4,
    )


def pq_encode_cols(vec_col, codebooks: list[list[list[float]]]):
    """One int code column per subspace: argmin_j L2²(subvec, cb[m][j]),
    ties by code id (array_min over (dist, j) structs — lexicographic).
    Pure projection: ZERO exchanges, whole-stage codegen."""
    subdim = len(codebooks[0][0])
    cols = []
    for mm, cb in enumerate(codebooks):
        sub = F.slice(vec_col, mm * subdim + 1, subdim)
        cands = F.array(*[
            F.struct(
                _l2_to_code(sub, F.array(*[F.lit(v) for v in cj])).alias("d"),
                F.lit(j).alias("j"),
            )
            for j, cj in enumerate(cb)
        ])
        cols.append(F.array_min(cands)["j"].alias(f"code_{mm}"))
    return cols


def _adc_score(qvec_col, codebooks: list[list[list[float]]]):
    """ADC inner product: ordered (m = 0, 1, …) left-to-right adds of
    <q_sub_m, codebook[m][code_m]> so both engines sum the per-subspace
    dots in the same sequence and binary64 matches the SQL twin."""
    subdim = len(codebooks[0][0])
    cb_lits = [
        F.array(*[F.array(*[F.lit(v) for v in cj]) for cj in cb])
        for cb in codebooks
    ]
    score = None
    for mm, cb_lit in enumerate(cb_lits):
        qsub = F.slice(qvec_col, mm * subdim + 1, subdim)
        term = _dot(qsub, F.element_at(cb_lit, F.col(f"code_{mm}") + 1))
        score = term if score is None else score + term
    return score


def pq_knn(
    corpus: DataFrame,
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 4,
) -> DataFrame:
    """Top-k by PQ-ADC inner product (query exact, corpus reconstructed).

    Plan: the corpus encodes in a narrow projection (codes replace the
    vector — at scale this is the only thing kept in memory), the tiny
    query set broadcasts, ADC is M dynamic codebook lookups
    (element_at on array-of-array literals) + M ordered dot adds, then
    the standard per-query top-k window.  Same single-exchange shape as
    cosine_knn with 16× less corpus state."""
    from pyspark.sql import Window

    subdim = len(codebooks[0][0])
    enc = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        *pq_encode_cols(F.col(vec_col), codebooks),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    score = _adc_score(F.col("qvec"), codebooks)
    scored = (
        enc.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(score, round_digits).alias("adc_ip"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("adc_ip"), F.asc("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def pq_rerank_knn(
    corpus: DataFrame,
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    k: int = 10,
    shortlist: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 4,
) -> DataFrame:
    """PQ-ADC shortlist → exact cosine re-rank (the standard two-stage
    production ANN: compressed codes pick ``shortlist`` candidates per
    query, then full-precision vectors re-score only those).

    Plan at scale: stage 1 is ``pq_knn`` (corpus never shuffles, codes
    only in memory); stage 2 joins the tiny Q×S candidate set back to
    the corpus BY BROADCAST — the full-vector scan stays shuffle-free
    and touches every row once, but computes the exact cosine only for
    the ≤ Q×S matches.  Recall ≈ exact whenever the true top-k survives
    into the ADC top-S, at 1/16th the memory of brute force."""
    from pyspark.sql import Window

    cand = pq_knn(
        corpus, queries, codebooks, k=shortlist,
        id_col=id_col, vec_col=vec_col, round_digits=round_digits,
    ).select("query_id", "neighbor_id")
    return exact_rerank(
        corpus, queries, cand, k=k,
        id_col=id_col, vec_col=vec_col, round_digits=round_digits,
    )


def exact_rerank(
    corpus: DataFrame,
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 4,
) -> DataFrame:
    """Stage-2 exact re-rank shared by the two-stage ANN compositions:
    the tiny (query_id, neighbor_id) candidate set broadcasts BACK
    against the full-precision corpus (scan stays shuffle-free, exact
    cosine computed only for the matches), then the standard per-query
    top-k window over ≤ Q×S rows."""
    from pyspark.sql import Window

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nvec")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    rescored = (
        c.join(F.broadcast(candidates), "neighbor_id")
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qvec"), F.col("nvec")), round_digits).alias(
                "cos_sim"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return rescored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def ivfpq_knn(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[tuple[int, list[float]]],
    codebooks: list[list[list[float]]],
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 4,
) -> DataFrame:
    """IVF-PQ (the IVFADC architecture of Jégou et al. 2011 — what FAISS
    ships for billion-vector search): corpus bucketed once by nearest
    centroid AND stored as PQ codes; each query probes only its
    ``nprobe`` closest cells and ranks candidates by the ADC inner
    product against codebook reconstructions.

    100 TB shape — this is THE production composition: IVF bounds the
    candidates a query touches (nprobe/n_cells of the data), PQ bounds
    the bytes per candidate (codes, 16× less than raw vectors), so the
    working set per probe is nprobe/n_cells × 1/16 of brute force.  The
    corpus shuffles once on the bounded ``cell`` key; raw vectors never
    leave the initial encode projection.  Chain ``pq_rerank_knn``-style
    exact re-scoring on top when the recall target demands it."""
    from pyspark.sql import Window

    assigned = ivf_assign(corpus, centroids, id_col, vec_col)
    enc = assigned.select(
        F.col(id_col).alias("neighbor_id"),
        "cell",
        *pq_encode_cols(F.col(vec_col), codebooks),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    cents = F.array(
        *[
            F.struct(
                F.round(
                    cosine(F.col("qvec"), F.array(*[F.lit(v) for v in c])),
                    4,
                ).alias("s"),
                F.lit(-j).alias("negcell"),
            )
            for j, (_, c) in enumerate(centroids)
        ]
    )
    probes = q.select(
        "query_id", "qvec",
        F.slice(F.reverse(F.array_sort(cents)), 1, nprobe).alias("_top"),
    ).select(
        "query_id", "qvec",
        F.explode(F.transform(F.col("_top"), lambda s: -s["negcell"])).alias(
            "cell"
        ),
    )
    scored = (
        enc.join(F.broadcast(probes), on="cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(_adc_score(F.col("qvec"), codebooks), round_digits).alias(
                "adc_ip"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("adc_ip"), F.asc("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def ivfpq_rerank_knn(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[tuple[int, list[float]]],
    codebooks: list[list[list[float]]],
    k: int = 10,
    nprobe: int = 4,
    shortlist: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 4,
) -> DataFrame:
    """The full production ANN stack (what a FAISS IVFPQ + refine
    deployment runs): IVF cells prune WHICH candidates are touched, PQ
    codes prune the BYTES per candidate, ADC picks a top-``shortlist``,
    and the full-precision vectors re-score only those — recovering the
    recall the two quantizations compound away (measured in
    emb_ivfpq_rerank_recall) at O(Q·shortlist) exact work."""
    cand = ivfpq_knn(
        corpus, queries, centroids, codebooks, k=shortlist, nprobe=nprobe,
        id_col=id_col, vec_col=vec_col, round_digits=round_digits,
    ).select("query_id", "neighbor_id")
    return exact_rerank(
        corpus, queries, cand, k=k,
        id_col=id_col, vec_col=vec_col, round_digits=round_digits,
    )
