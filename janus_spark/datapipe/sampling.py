"""Deterministic sampling operators for training-data curation.

All sampling here is *content-hash* based, not RNG based: a row's fate
depends only on its key, so runs are reproducible across cluster sizes,
partitionings, retries and engines (the md5 threshold trick evaluates
identically in Spark and DuckDB, which makes every operator in this
module oracle-checkable — see ``janus_spark.queries``).

Scale notes (100 TB): every operator is map-only over the scan except
``quota_sample``, which shuffles once on the stratum key (bounded output:
n_per_stratum rows per stratum survive).  No Python UDFs anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# md5-prefix space: first 8 hex chars = 32 bits
_HASH_SPACE = 16 ** 8


def rate_to_hex_threshold(rate: float) -> str:
    """Map a sampling rate in [0, 1] to an 8-hex-char threshold such that
    ``substr(md5(key), 1, 8) < threshold`` keeps ~rate of uniformly-hashed
    keys.  Plain string comparison — lowercase hex sorts like the integer
    it encodes, so no engine-specific hex→int conversion is needed."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0,1], got {rate}")
    return format(min(int(rate * _HASH_SPACE), _HASH_SPACE - 1), "08x")


def _rate_col_to_hex_threshold(rate: Column) -> Column:
    """Column form of :func:`rate_to_hex_threshold` — per-row rate to an
    8-hex-char string threshold.  ``conv`` emits UPPERCASE hex, which
    would mis-sort against the lowercase md5 (digits < A-F < a-f) and
    skew the retention rate — lower it."""
    return F.lower(
        F.lpad(
            F.conv(
                F.least(
                    F.floor(rate * F.lit(float(_HASH_SPACE))),
                    F.lit(float(_HASH_SPACE - 1)),
                ).cast("long").cast("string"),
                10,
                16,
            ),
            8,
            "0",
        )
    )


def hash_bucket(key: Column, salt: str = "") -> Column:
    """The 8-hex-char md5 prefix of a key's string form — the uniform
    'coin flip' every sampler below compares against a threshold.

    ``salt`` namespaces the draw per OPERATOR: two hash-keyed operators
    composed over the same key column must not share a coin (an unsalted
    temperature-mix → split pipeline made the eval fraction 0.1/keep_rate
    instead of 0.1, because the split's low-hash winners were exactly the
    mix's low-hash keepers).  Each sampler below has a distinct default
    salt; pass your own when composing the same operator twice."""
    return F.substring(F.md5(F.concat(key.cast("string"), F.lit(salt))), 1, 8)


def hash_sample(
    df: DataFrame, rate: float, key_col: str = "doc_id", salt: str = ":sample"
) -> DataFrame:
    """Keep ~``rate`` of rows, chosen deterministically by key hash.
    Unlike ``df.sample()`` the selection is stable across runs, partition
    counts and engines."""
    return df.where(hash_bucket(F.col(key_col), salt) < rate_to_hex_threshold(rate))


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    strata_col: str = "lang",
    key_col: str = "doc_id",
    default_rate: float = 0.0,
    salt: str = ":strat",
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. language rebalancing: keep
    10% of English, 100% of low-resource languages).  Map-only: the rate
    lookup folds to a CASE expression, no join."""
    thr: Column = F.lit(rate_to_hex_threshold(default_rate))
    for stratum, rate in rates.items():
        thr = F.when(F.col(strata_col) == stratum, F.lit(rate_to_hex_threshold(rate))).otherwise(thr)
    return df.where(hash_bucket(F.col(key_col), salt) < thr)


def quota_sample(
    df: DataFrame,
    n_per_stratum: int,
    strata_col: str = "source",
    key_col: str = "doc_id",
    salt: str = ":quota",
) -> DataFrame:
    """At most ``n_per_stratum`` rows per stratum, picked deterministically
    (lowest key-hashes win; key breaks hash ties).  The domain-quota
    pattern: cap any one source's contribution to the corpus.

    One shuffle on the stratum key.  Skew note: a mega-stratum (one domain
    with billions of rows) funnels into one partition before the rank cut;
    at that scale pre-filter with ``hash_sample`` at a rate that leaves
    ~10×n survivors per stratum, then apply the exact quota."""
    w = Window.partitionBy(strata_col).orderBy(hash_bucket(F.col(key_col), salt), F.col(key_col))
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= n_per_stratum)
        .drop("__rk")
    )


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    key_col: str = "doc_id",
    salt: str = ":weight",
) -> DataFrame:
    """Deterministic weighted sampling without replacement (Efraimidis–
    Spirakis): each row draws a reproducible uniform u from its key hash
    and scores ``-ln(u) / weight``; the k smallest scores win, so a row's
    selection probability is proportional to its weight.  Quality-weighted
    corpus subsetting with exact reproducibility across engines.

    Scale: orderBy(score).limit(k) compiles to TakeOrderedAndProject —
    each task keeps a k-heap, the driver merges; no global sort.  Rows
    with weight <= 0 (or null) are excluded."""
    h = F.conv(hash_bucket(F.col(key_col), salt), 16, 10)
    u = (h.cast("double") + 1) / (_HASH_SPACE + 1)  # (0, 1]
    w = F.col(weight_col).try_cast("double")
    score = -F.log(u) / w
    return (
        df.where(w > 0)
        .withColumn("__score", score)
        .orderBy("__score")
        .limit(k)
        .drop("__score")
    )


def temperature_mix(
    df: DataFrame,
    budget: int,
    alpha: float = 0.5,
    source_col: str = "source",
    key_col: str = "doc_id",
    salt: str = ":mix",
) -> DataFrame:
    """Temperature-based domain re-balancing: sample ~``budget`` rows with
    per-source share ∝ ``n_s^alpha`` — the standard multi-domain training
    mix (alpha=1 keeps natural proportions, alpha→0 approaches uniform
    across sources; 0.5 is the common square-root temperature).  The
    per-source keep rate is ``min(1, budget·share_s / n_s)``; selection
    within a source is the deterministic md5 threshold, so the draw is
    reproducible across engines, partitionings and re-runs.

    Plan: one count aggregate over the scan (map-side combined, one row
    per source) → rate table broadcast back onto the corpus — the big
    side is touched map-only twice, no shuffle of the corpus itself.
    Rates are rounded to 9 decimals before thresholding so the Spark and
    DuckDB float paths agree bit-for-bit at the comparison.

    alpha=0.5 uses ``sqrt`` (IEEE-754 correctly rounded in every engine);
    other alphas use ``pow``, where a last-ulp divergence between libm
    implementations is absorbed by the rounding except on measure-zero
    boundaries."""
    w = (lambda c: F.sqrt(c)) if alpha == 0.5 else (lambda c: F.pow(c, F.lit(alpha)))
    counts = df.groupBy(source_col).agg(F.count("*").alias("__n"))
    z = counts.agg(F.sum(w(F.col("__n"))).alias("__z"))
    rates = counts.crossJoin(F.broadcast(z)).select(
        source_col,
        F.least(
            F.lit(1.0),
            F.round(F.lit(float(budget)) * w(F.col("__n")) / F.col("__z") / F.col("__n"), 9),
        ).alias("__rate"),
    )
    h = F.conv(hash_bucket(F.col(key_col), salt), 16, 10).cast("bigint")
    thr = F.floor(F.col("__rate") * F.lit(float(_HASH_SPACE))).cast("bigint")
    return df.join(F.broadcast(rates), source_col).where(h < thr).drop("__rate")


def split_train_eval(
    df: DataFrame,
    eval_rate: float = 0.01,
    key_col: str = "doc_id",
    salt: str = ":split",
) -> DataFrame:
    """Tag every row with a stable 'train' / 'eval' split label.  Because
    the split is key-hash based, later re-runs over a grown corpus keep
    existing rows in their original split (no eval contamination when new
    data arrives)."""
    return df.withColumn(
        "split",
        F.when(
            hash_bucket(F.col(key_col), salt) < rate_to_hex_threshold(eval_rate), F.lit("eval")
        ).otherwise(F.lit("train")),
    )


def shuffle_shard(
    df: DataFrame,
    n_shards: int,
    seed: int = 0,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic global training-order shuffle + sharding — the last
    stage before a corpus becomes training input.  Every row gets

    - ``shard``   = hash(seed:id) mod ``n_shards`` — which output file
      the example lands in, and
    - ``pos``     = its rank within the shard by (hash, id) —

    so reading shards 0..n-1 each in ``pos`` order IS the canonical
    shuffled epoch order: reproducible across cluster sizes,
    partitionings, retries and engines (the hash family is the
    md5-derived ``shared_hash64``, the same one the dedup oracles
    replay in DuckDB), and re-seeding gives an independent order per
    epoch.

    Scale: the hash + shard assignment is map-only over the scan; the
    within-shard rank is a window PARTITIONed by shard — shards are
    file-sized by construction (pick n_shards so a shard ≈ an output
    file, thousands at 100 TB), so no single-partition global sort
    ever exists in the plan.  The (hash, id) tie-break makes the order
    total even under hash collisions.
    """
    from janus_spark.datapipe.dedup import shared_hash64

    hk = shared_hash64(F.col(id_col).cast("string"), seed)
    w = Window.partitionBy("shard").orderBy(F.col("__hk").asc(), F.col(id_col).asc())
    return (
        df.withColumn("__hk", hk)
        .withColumn("shard", F.pmod(F.col("__hk"), F.lit(n_shards)).cast("long"))
        .withColumn("pos", F.row_number().over(w).cast("long"))
        .drop("__hk")
    )


def largest_remainder(
    weights,
    budget: int,
    caps: dict | None = None,
) -> dict:
    """Exact-integer largest-remainder (Hamilton) apportionment of
    ``budget`` slots over integer ``weights`` [(name, w), ...], with
    optional per-name capacity ``caps`` — the DoReMi-lite / target-
    mixture allocation step.  NO float quotas anywhere (the ROUND-
    boundary lesson): base shares are integer division ``budget·w // W``
    and the leftover goes to the largest integer remainders
    ``budget·w % W`` (ties broken by name ascending), so the result is
    bit-identical across engines and platforms.

    With caps, over-cap names are fixed at capacity and the remaining
    budget is re-apportioned over the rest (standard capped Hamilton;
    at most one round per name, driver-side over the model-sized domain
    table — never row-scale data).  If the budget exceeds total
    capacity, every name gets its cap and the surplus stays unspent.
    """
    weights = [(str(k), int(w)) for k, w in weights]
    if any(w < 0 for _, w in weights):
        raise ValueError("weights must be non-negative")
    if len({k for k, _ in weights}) != len(weights):
        raise ValueError("duplicate names in weights")
    if budget < 0:
        raise ValueError("budget must be non-negative")
    caps = {str(k): int(v) for k, v in (caps or {}).items()}
    if any(v < 0 for v in caps.values()):
        raise ValueError("caps must be non-negative")
    alloc = {k: 0 for k, _ in weights}
    active = {k: w for k, w in weights if w > 0}
    remaining = budget
    while remaining > 0 and active:
        total_w = sum(active.values())
        base = {k: (remaining * w) // total_w for k, w in active.items()}
        rem = {k: (remaining * w) % total_w for k, w in active.items()}
        leftover = remaining - sum(base.values())
        for i, k in enumerate(sorted(active, key=lambda k: (-rem[k], k))):
            if i < leftover:
                base[k] += 1
        over = {
            k for k in active if k in caps and base[k] > caps[k] - alloc[k]
        }
        if not over:
            for k in active:
                alloc[k] += base[k]
            break
        for k in sorted(over):
            take = caps[k] - alloc[k]
            alloc[k] += take
            remaining -= take
            del active[k]
    return alloc


def domain_mixture(
    df: DataFrame,
    target,
    budget: int,
    source_col: str = "source",
) -> DataFrame:
    """Per-domain sampling allocations for a target mixture, computed IN
    the engine: exact-integer largest-remainder apportionment of
    ``budget`` over literal integer weights ``target`` [(domain, w)...].

    Returns one row per TARGET domain: ``(source, w, n_avail, alloc)``
    — all exact integers (``n_avail`` = documents present; a target
    domain absent from the corpus shows ``n_avail = 0`` and still gets
    its allocation, surfacing the shortfall instead of silently
    re-weighting).  The allocation itself depends only on (target,
    budget), so it is scale-invariant by construction; use
    :func:`largest_remainder` with ``caps`` when allocations must
    respect availability.

    Plan shape (100 TB): ONE map-side-combined count over the corpus
    scan; everything after operates on the model-sized domain table
    (|target| rows) — the global windows below never see row-scale
    data.  Total weight is a Python-side exact constant (the target is
    a literal input, like a weight table)."""
    target = [(str(k), int(w)) for k, w in target]
    if any(w < 0 for _, w in target):
        raise ValueError("weights must be non-negative")
    if len({k for k, _ in target}) != len(target):
        # mirror largest_remainder: a duplicated domain would survive the
        # join as duplicate rows and silently over-allocate the budget
        raise ValueError("duplicate names in weights")
    total_w = sum(w for _, w in target)
    if total_w == 0:
        raise ValueError("target weights sum to zero")
    spark = df.sparkSession
    tw = spark.createDataFrame(target, f"{source_col} string, w long")
    counts = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("n_avail"))
    # BIGINT `div` / `%` — never float division (the ROUND-boundary rule)
    j = tw.join(counts, source_col, "left").select(
        source_col,
        "w",
        F.coalesce(F.col("n_avail"), F.lit(0)).cast("long").alias("n_avail"),
        F.expr(f"(CAST({int(budget)} AS BIGINT) * w) div {total_w}").alias("base"),
        F.expr(f"(CAST({int(budget)} AS BIGINT) * w) % {total_w}").alias("rem"),
    )
    # tiny-frame windows: |target| rows, explicitly bounded
    wall = Window.partitionBy()
    worder = Window.partitionBy().orderBy(F.desc("rem"), F.asc(source_col))
    return (
        j.withColumn("__left", F.lit(int(budget)) - F.sum("base").over(wall))
        .withColumn("__rn", F.row_number().over(worder))
        .select(
            source_col,
            "w",
            "n_avail",
            (
                F.col("base")
                + F.when(F.col("__rn") <= F.col("__left"), 1).otherwise(0)
            ).cast("long").alias("alloc"),
        )
    )


def mixture_sample(
    df: DataFrame,
    target,
    budget: int,
    source_col: str = "source",
    key_col: str = "doc_id",
    salt: str = ":mixsample",
) -> DataFrame:
    """Deterministic sample honoring a :func:`domain_mixture` allocation:
    within each target domain the ``alloc`` lowest key-hashes win (key
    breaks hash ties — the ``quota_sample`` discipline, so the draw is
    reproducible across engines, partitionings and re-runs, and a grown
    corpus keeps its previous winners except where new lower hashes
    arrive).  Domains with fewer documents than their allocation
    contribute everything they have (the shortfall is visible in
    :func:`domain_mixture`'s ``n_avail``); domains outside the target
    are dropped.

    One shuffle of the corpus on the domain key for the per-domain rank
    (same skew note as ``quota_sample``: pre-filter a mega-domain with
    ``hash_sample`` leaving ~10× alloc survivors, then apply the exact
    rank)."""
    alloc = F.broadcast(
        domain_mixture(df, target, budget, source_col).select(
            source_col, "alloc"
        )
    )
    w = Window.partitionBy(source_col).orderBy(
        hash_bucket(F.col(key_col), salt), F.col(key_col)
    )
    return (
        df.join(alloc, source_col)
        .withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= F.col("alloc"))
        .drop("__rk", "alloc")
    )


def unimax_allocations(
    df: DataFrame,
    budget: int,
    max_epochs: int = 1,
    source_col: str = "source",
) -> DataFrame:
    """UniMax domain allocation (Chung et al. 2023, "UniMax: Fairer and
    More Effective Language Sampling"): spread ``budget`` documents as
    UNIFORMLY as possible across domains subject to a per-domain
    repeat cap ``max_epochs x n_avail`` — the published alternative to
    temperature mixing that never over-samples a small domain.

    Equal-weight capped apportionment has a closed form — integer
    water-filling: sort domains by cap ascending, cap out the longest
    prefix whose caps fit under the budget (``S_i = P_{i-1} +
    c_i * (m-i+1) <= B`` — S is monotone, so the capped set is a
    prefix), then split the remaining budget equally among the rest,
    leftover to the first names ascending.  Every step is BIGINT
    arithmetic (the ROUND-boundary discipline), and the closed form is
    provably what :func:`largest_remainder` converges to for equal
    weights (pinned by a hypothesis net), so the two entry points can
    never disagree.

    Returns one row per domain: ``(source, n_avail, cap, alloc)``, all
    exact integers; ``sum(alloc) = min(budget, sum(cap))``.

    Plan shape (100 TB): ONE map-side-combined count over the corpus
    scan; every window below runs over the model-sized domain table
    (|domains| rows), never row-scale data."""
    if budget < 0:
        raise ValueError("budget must be non-negative")
    if max_epochs <= 0:
        raise ValueError("max_epochs must be positive")
    counts = df.groupBy(source_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_avail")
    )
    j = counts.select(
        source_col,
        "n_avail",
        (F.col("n_avail") * F.lit(int(max_epochs))).cast("long").alias("cap"),
    )
    worder = Window.orderBy(F.asc("cap"), F.asc(source_col))
    wall = Window.partitionBy()
    wname = Window.orderBy(F.asc(source_col))
    B = F.lit(int(budget)).cast("long")
    s = (
        j.withColumn("__i", F.row_number().over(worder))
        .withColumn("__m", F.count(F.lit(1)).over(wall))
        .withColumn(
            "__P",
            F.sum("cap").over(worder.rowsBetween(Window.unboundedPreceding, 0)),
        )
        # budget needed for prefix 1..i-1 at cap and everyone else at c_i
        .withColumn(
            "__S",
            F.col("__P") - F.col("cap") + F.col("cap") * (F.col("__m") - F.col("__i") + 1),
        )
        .withColumn("__capped", F.col("__S") <= B)
        .withColumn("__k", F.sum(F.col("__capped").cast("long")).over(wall))
        .withColumn(
            "__Pk",
            F.coalesce(
                F.max(F.when(F.col("__capped"), F.col("__P"))).over(wall),
                F.lit(0).cast("long"),
            ),
        )
        .withColumn("__B2", B - F.col("__Pk"))
        .withColumn("__u", F.col("__m") - F.col("__k"))
        .withColumn(
            "__base",
            F.when(
                F.col("__u") > 0, F.expr("__B2 div __u").cast("long")
            ).otherwise(F.lit(0).cast("long")),
        )
        .withColumn(
            "__L",
            F.when(F.col("__u") > 0, F.col("__B2") % F.col("__u")).otherwise(
                F.lit(0).cast("long")
            ),
        )
        # leftover +1s go to the first uncapped names ascending
        .withColumn(
            "__nr",
            F.sum(F.when(F.col("__capped"), 0).otherwise(1)).over(
                wname.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
    )
    return s.select(
        source_col,
        "n_avail",
        "cap",
        F.when(F.col("__capped"), F.col("cap"))
        .otherwise(
            F.col("__base")
            + F.when(F.col("__nr") <= F.col("__L"), 1).otherwise(0)
        )
        .cast("long")
        .alias("alloc"),
    )


def mixture_sample_tokens(
    df: DataFrame,
    target,
    budget_tokens: int,
    source_col: str = "source",
    text_col: str = "text",
    key_col: str = "doc_id",
    salt: str = ":mixtok",
) -> DataFrame:
    """Token-budgeted mixture sampling — the allocation unit a training
    run actually budgets in.  The TOKEN budget is apportioned over the
    target weights with the same exact-integer largest-remainder rule
    as :func:`domain_mixture`, then each domain is filled greedily in
    deterministic hash order (lowest key-hashes first, key breaks
    ties): a document is kept iff the tokens accumulated BEFORE it are
    still under the domain's allocation, so the selected set is a
    prefix of the domain's canonical hash order and the last kept doc
    may straddle the boundary (the packing convention — chop at token
    granularity downstream; rejecting it instead would leave the
    budget silently underfilled and make selection depend on one doc's
    length).  Emits the kept rows with ``n_tok`` and the exact-integer
    ``tok_before`` (tokens accumulated ahead of the doc within its
    domain), so downstream chopping needs no recount.

    Reproducible across engines, partitionings and re-runs (exact
    integers + md5 order throughout).  One shuffle of the corpus on the
    domain key for the per-domain running sum — same skew note as
    ``quota_sample`` for mega-domains."""
    alloc = F.broadcast(
        domain_mixture(df, target, budget_tokens, source_col).select(
            source_col, "alloc"
        )
    )
    from janus_spark.datapipe.text import clean_tokens

    w = Window.partitionBy(source_col).orderBy(
        hash_bucket(F.col(key_col), salt), F.col(key_col)
    )
    return (
        df.join(alloc, source_col)
        .withColumn(
            "n_tok", F.size(clean_tokens(text_col)).cast("long")
        )
        .withColumn(
            "tok_before",
            F.coalesce(
                F.sum("n_tok").over(
                    w.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ).cast("long"),
        )
        .where(F.col("tok_before") < F.col("alloc"))
        .drop("alloc")
    )


def quota_sample_prefiltered(
    df: DataFrame,
    n_per_stratum: int,
    strata_col: str = "source",
    key_col: str = "doc_id",
    salt: str = ":quota",
    ratio: int = 10,
) -> DataFrame:
    """The mega-stratum scale path for :func:`quota_sample`, REALIZED:
    identical output, but the corpus-wide shuffle feeding the rank cut
    sees ~``ratio * n / count`` of each stratum instead of all of it.

    Why it is exact and not approximate: selection keeps the n LOWEST
    ``(hash, key)`` rows per stratum, and the pre-filter keeps rows with
    ``hash < t_s`` — the SAME hash, strict threshold, so what survives
    is a PREFIX of each stratum's selection order (ties at the boundary
    hash are kept or dropped together).  Winners can therefore only be
    lost if a stratum retains fewer than n rows; the plan counts
    survivors per stratum and RESCUES any short stratum by taking its
    full rows — the rescue set rides a broadcast flag fused into the
    SAME filter pass (``rescued OR hash < t_s``), no driver loop, no
    silent approximation.  The rank cut at the end is the same
    expression as ``quota_sample``'s, so the two functions are
    output-identical by construction (pinned by tests forcing both the
    fast path and the rescue path, and by the q_sample_quota_prefiltered
    gate whose DuckDB oracle is the PLAIN ranking SQL).

    Scale: the expected survivor count per stratum is ``ratio * n``
    (binomial around the rate), so the shuffle into the per-stratum
    window shrinks by ``count / (ratio * n)`` — for a billion-row
    stratum with n=100k and ratio=10 that is a 1000x lighter shuffle,
    and the rescue path stays empty with overwhelming probability
    (retention is ~Binomial(count, ratio*n/count); at ratio=10 the
    short-stratum probability is e-digits negligible, and when it DOES
    happen the answer is still exact, just slower for that stratum).
    Scan budget: the corpus is read exactly THREE times — once for the
    checkpointed stratum counts (model-sized result, so it can't
    re-trigger corpus scans per consumer), then survivor count +
    filtered pass in the final plan (which shows exactly two scans,
    plan-pinned)."""
    if ratio < 1:
        raise ValueError("ratio must be >= 1")
    # model-sized (|strata| rows): checkpoint so each downstream
    # consumer reuses the ONE corpus count scan instead of re-running it
    counts = df.groupBy(strata_col).agg(
        F.count(F.lit(1)).alias("__cnt")
    ).localCheckpoint(eager=True)
    rates = counts.select(
        strata_col,
        F.least(
            F.lit(1.0),
            F.lit(float(ratio * n_per_stratum)) / F.col("__cnt").cast("double"),
        ).alias("__rate"),
        "__cnt",
    )
    h = hash_bucket(F.col(key_col), salt)
    thr = _rate_col_to_hex_threshold(F.col("__rate"))
    tagged = df.join(F.broadcast(rates), strata_col)
    kpost = tagged.where(h < thr).groupBy(strata_col).agg(
        F.count(F.lit(1)).alias("__k")
    )
    # counts LEFT JOIN kpost, not inner: a stratum whose pre-filter kept
    # ZERO rows is absent from kpost entirely, and an inner join would
    # drop it from `short` — never rescued, the whole stratum silently
    # vanishing (at ratio=1 that is ~e^-n per large stratum, a real
    # event).  coalesce(__k, 0) makes it satisfy __k < n and take the
    # rescue path like any other short stratum.
    short = (
        counts.join(kpost, strata_col, "left")
        .select(
            strata_col,
            F.coalesce(F.col("__k"), F.lit(0)).alias("__k"),
            "__cnt",
        )
        .where(
            (F.col("__k") < F.lit(int(n_per_stratum)))
            & (F.col("__k") < F.col("__cnt"))
        )
        .select(strata_col, F.lit(True).alias("__rescue"))
    )
    # rescue fused into the pre-filter: keep a row iff its stratum is
    # short (take everything) or its hash clears the pre-cut — the same
    # multiset as anti(short) ∪ semi(short) in ONE corpus pass
    base = (
        tagged.join(F.broadcast(short), strata_col, "left")
        .where(F.col("__rescue").isNotNull() | (h < thr))
        .drop("__rate", "__cnt", "__rescue")
    )
    w = Window.partitionBy(strata_col).orderBy(
        hash_bucket(F.col(key_col), salt), F.col(key_col)
    )
    return (
        base.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= n_per_stratum)
        .drop("__rk")
    )


def mixture_sample_prefiltered(
    df: DataFrame,
    target,
    budget: int,
    source_col: str = "source",
    key_col: str = "doc_id",
    salt: str = ":mixsample",
    ratio: int = 10,
) -> DataFrame:
    """The mega-domain scale path for :func:`mixture_sample`, realized
    with the :func:`quota_sample_prefiltered` recipe: identical output,
    but the corpus shuffle feeding the per-domain rank sees
    ~``ratio * alloc`` rows of each domain instead of all of it.

    Exactness argument (same as the quota path): selection keeps the
    ``alloc`` lowest ``(hash, key)`` rows per domain and the pre-filter
    keeps ``hash < t_d`` — the SAME hash with a strict threshold, so
    survivors are a PREFIX of the domain's selection order.  A domain
    can only lose winners if it retains fewer than ``alloc`` survivors;
    the plan counts survivors per domain and RESCUES any short domain
    declaratively (a broadcast flag fused into the same filter pass),
    including the zero-survivor case (counts LEFT JOIN survivor
    counts).  Scan budget: the corpus is read exactly THREE times —
    once for the checkpointed allocation (the apportionment's count
    can't re-run per consumer), then survivor count + filtered pass in
    the final plan (exactly two scans, plan-pinned).  The final
    rank cut is :func:`mixture_sample`'s own expression, so the two
    functions are output-identical by construction (pinned by tests on
    both paths and by the q_mixture_sample_prefiltered gate, whose
    DuckDB oracle is the PLAIN ranking SQL).

    Scale: a 1e9-row domain with alloc=100k and ratio=10 shuffles ~1e6
    rows into its rank window instead of 1e9 — ~1000x lighter — and the
    allocation itself rides a broadcast of the |target|-row table."""
    if ratio < 1:
        raise ValueError("ratio must be >= 1")
    # model-sized (|target| rows): checkpoint so the apportionment's
    # corpus count runs once, not once per downstream consumer
    mix = domain_mixture(df, target, budget, source_col).localCheckpoint(
        eager=True
    )
    rates = mix.select(
        source_col,
        "alloc",
        "n_avail",
        F.when(
            F.col("n_avail") > 0,
            F.least(
                F.lit(1.0),
                F.lit(float(ratio))
                * F.col("alloc").cast("double")
                / F.col("n_avail").cast("double"),
            ),
        )
        .otherwise(F.lit(1.0))
        .alias("__rate"),
    )
    h = hash_bucket(F.col(key_col), salt)
    thr = _rate_col_to_hex_threshold(F.col("__rate"))
    tagged = df.join(F.broadcast(rates), source_col)
    kpost = tagged.where(h < thr).groupBy(source_col).agg(
        F.count(F.lit(1)).alias("__k")
    )
    short = (
        rates.join(kpost, source_col, "left")
        .select(
            source_col,
            F.coalesce(F.col("__k"), F.lit(0)).alias("__k"),
            "alloc",
            "n_avail",
        )
        .where(
            (F.col("__k") < F.col("alloc")) & (F.col("__k") < F.col("n_avail"))
        )
        .select(source_col, F.lit(True).alias("__rescue"))
    )
    # rescue fused into the pre-filter: one corpus pass (see
    # quota_sample_prefiltered)
    base = (
        tagged.join(F.broadcast(short), source_col, "left")
        .where(F.col("__rescue").isNotNull() | (h < thr))
        .drop("__rate", "n_avail", "__rescue")
    )
    w = Window.partitionBy(source_col).orderBy(
        hash_bucket(F.col(key_col), salt), F.col(key_col)
    )
    return (
        base.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= F.col("alloc"))
        .drop("__rk", "alloc")
    )


def mixture_sample_tokens_prefiltered(
    df: DataFrame,
    target,
    budget_tokens: int,
    source_col: str = "source",
    text_col: str = "text",
    key_col: str = "doc_id",
    salt: str = ":mixtok",
    ratio: int = 10,
) -> DataFrame:
    """The mega-domain scale path for :func:`mixture_sample_tokens`:
    identical output, but each domain's running-sum window sees rows
    carrying ~``ratio * alloc`` TOKENS instead of the whole domain.

    The pre-filter keeps ``hash < t_d`` with ``t_d`` sized so the
    retained token mass is ~``ratio * alloc`` (rate =
    ``ratio * alloc / domain_total_tokens``; one map-side-combined
    count+token aggregate over the corpus scan — the same tokenization
    work the plain operator already pays on its window input).
    Survivors are a PREFIX of the domain's ``(hash, key)`` order, so
    ``tok_before`` computed over survivors equals the true value for
    every survivor; the kept set (``tok_before < alloc``) can only be
    cut short if the survivors' total token mass is below the
    allocation WITH rows left behind — exactly the per-domain rescue
    condition (``sum(n_tok) < alloc AND n_docs_kept < n_docs``),
    checked with a LEFT join so a zero-survivor domain is rescued too.
    The final cut is :func:`mixture_sample_tokens`'s own expression, so
    the two are output-identical by construction (pinned by tests on
    both paths and by the q_mixture_tokens_prefiltered gate, whose
    DuckDB oracle is the PLAIN running-sum SQL).  Scan budget: the
    corpus is read exactly FOUR times — twice for the checkpointed rate
    table (apportionment count + token stats, materialized once), then
    survivor count + filtered pass in the final plan (exactly two
    scans, plan-pinned)."""
    if ratio < 1:
        raise ValueError("ratio must be >= 1")
    from janus_spark.datapipe.text import clean_tokens

    alloc = domain_mixture(df, target, budget_tokens, source_col).select(
        source_col, "alloc"
    )
    stats = df.groupBy(source_col).agg(
        F.count(F.lit(1)).cast("long").alias("__cnt"),
        F.sum(F.size(clean_tokens(text_col)).cast("long"))
        .cast("long")
        .alias("__tok"),
    )
    # model-sized (|target| rows): checkpoint materializes BOTH corpus
    # aggregates (apportionment count + token stats) exactly once
    rates = (
        alloc.join(stats, source_col, "left")
        .select(
            source_col,
            "alloc",
            F.coalesce(F.col("__cnt"), F.lit(0)).cast("long").alias("__cnt"),
            F.when(
                F.coalesce(F.col("__tok"), F.lit(0)) > 0,
                F.least(
                    F.lit(1.0),
                    F.lit(float(ratio))
                    * F.col("alloc").cast("double")
                    / F.col("__tok").cast("double"),
                ),
            )
            .otherwise(F.lit(1.0))
            .alias("__rate"),
        )
        .localCheckpoint(eager=True)
    )
    h = hash_bucket(F.col(key_col), salt)
    thr = _rate_col_to_hex_threshold(F.col("__rate"))
    tagged = df.join(F.broadcast(rates), source_col).withColumn(
        "n_tok", F.size(clean_tokens(text_col)).cast("long")
    )
    kpost = tagged.where(h < thr).groupBy(source_col).agg(
        F.count(F.lit(1)).alias("__k"),
        F.sum("n_tok").cast("long").alias("__s"),
    )
    short = (
        rates.join(kpost, source_col, "left")
        .select(
            source_col,
            F.coalesce(F.col("__k"), F.lit(0)).alias("__k"),
            F.coalesce(F.col("__s"), F.lit(0)).alias("__s"),
            "alloc",
            "__cnt",
        )
        .where(
            (F.col("__s") < F.col("alloc")) & (F.col("__k") < F.col("__cnt"))
        )
        .select(source_col, F.lit(True).alias("__rescue"))
    )
    # rescue fused into the pre-filter: one corpus pass (see
    # quota_sample_prefiltered)
    base = (
        tagged.join(F.broadcast(short), source_col, "left")
        .where(F.col("__rescue").isNotNull() | (h < thr))
        .drop("__rate", "__cnt", "__rescue")
    )
    w = Window.partitionBy(source_col).orderBy(
        hash_bucket(F.col(key_col), salt), F.col(key_col)
    )
    return (
        base.withColumn(
            "tok_before",
            F.coalesce(
                F.sum("n_tok").over(
                    w.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ).cast("long"),
        )
        .where(F.col("tok_before") < F.col("alloc"))
        .drop("alloc")
    )
