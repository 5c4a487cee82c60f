"""Mergeable sketches for corpus-scale cardinality questions.

HyperLogLog (Flajolet et al. 2007, with the small-range linear-counting
correction from the original paper; bias constants per Heule et al.
2013 are not needed at p=14 for the +/-2% the tests pin) over a Ray
Dataset column. The sketch is the textbook answer to "how many
distinct urls/tokens/hosts are in 100 TB" without a corpus-wide
groupby: per-batch register arrays fold locally, the shuffle moves at
most 2^p tiny (register, rank) rows per block, and the driver sees
one 2^p-row table regardless of corpus size.

Scale shape: one stateless map_batches (vectorized blake2b via
per-batch bytes hashing -> numpy bit ops), one groupby(register).max
whose input is pre-folded per batch, and a constant-size driver-side
estimate. Determinism: the hash is keyed blake2b (hashing.blake64),
so the estimate is bit-stable across runs, block layouts and cluster
sizes — the property that makes the sketch a driver-checkable query.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .hashing import tokens_of

__all__ = [
    "hll_distinct_tokens",
    "hll_grouped",
    "hll_grouped_registers",
    "hll_token_registers",
    "distinct_tokens_exact",
    "hll_estimate",
    "cms_token_counts",
    "sampled_quantile_disc",
    "grouped_sampled_quantile_disc",
    "exact_float_quantiles",
]


def _hash_tokens_u64(tokens: list[str]) -> np.ndarray:
    """uint64 blake2b hashes of a token list (memoized upstream kernel
    reused: hashing._token_hash caches per-worker)."""
    from .hashing import _token_hash

    return np.fromiter(
        (_token_hash(t) for t in tokens), dtype=np.uint64, count=len(tokens)
    )


def _registers_of(h: np.ndarray, p: int) -> np.ndarray:
    """Fold a uint64 hash array into a 2^p register array (max rank)."""
    m = 1 << p
    regs = np.zeros(m, dtype=np.int64)
    if len(h) == 0:
        return regs
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = (h << np.uint64(p)) | (np.uint64(1) << np.uint64(p - 1))
    # rank = leading zeros of the remaining 64-p bits, + 1; the OR above
    # plants a sentinel bit so rank caps at 64-p+1 without a branch.
    # Leading-zero count via float64 log2 is unsafe at 64 bits; use a
    # vectorized binary-CLZ halving loop (6 iterations for 64-bit).
    v = rest.copy()
    zeros = np.zeros(len(h), dtype=np.int64)
    shift = 32
    while shift >= 1:
        mask = (v >> np.uint64(64 - shift)) == 0
        zeros[mask] += shift
        v[mask] = v[mask] << np.uint64(shift)
        shift //= 2
    rank = zeros + 1
    np.maximum.at(regs, idx, rank)
    return regs


def hll_estimate(regs: np.ndarray, p: int) -> float:
    """Standard HLL estimate with small-range linear counting."""
    m = float(1 << p)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)
    return float(est)


def hll_distinct_tokens(docs, p: int = 14, text_col="text"):
    """Approximate DISTINCT-token count over the corpus as one
    (n_estimate) row. The exact sibling (``distinct_tokens_exact``)
    is the conformance oracle; the pytest bound ties the two within
    the sketch's standard error (1.04/sqrt(2^p) ~ 0.8% at p=14)."""
    import ray.data as rd
    from ray.data.aggregate import Max

    def partial(t: pa.Table) -> pa.Table:
        toks: list[str] = []
        for x in t[text_col].to_pylist():
            toks.extend(tokens_of(x))
        regs = _registers_of(_hash_tokens_u64(toks), p)
        nz = np.nonzero(regs)[0]
        return pa.table(
            {
                "reg": pa.array(nz.astype(np.int64), pa.int64()),
                "rank": pa.array(regs[nz], pa.int64()),
            }
        )

    merged = (
        docs.select_columns([text_col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("reg")
        .aggregate(Max("rank", alias_name="rank"))
        .take_all()
    )  # <= 2^p rows regardless of corpus size
    regs = np.zeros(1 << p, dtype=np.int64)
    for r in merged:
        regs[int(r["reg"])] = int(r["rank"])
    est = int(round(hll_estimate(regs, p)))
    return rd.from_arrow(pa.table({"n_estimate": pa.array([est], pa.int64())}))


def hll_token_registers(docs, p: int = 14, text_col="text",
                        hash_kind: str = "md5"):
    """Corpus-wide distinct-token HLL REGISTER table (reg, rank) — the
    driver-visible sketch STATE (cf. hll_grouped_registers): with the
    md5_number_lower token hash every register is independently
    re-derivable by the SQL oracle. Same exchange as
    hll_distinct_tokens: per-batch register partials, one
    groupby(reg).max, <= 2^p rows total."""
    from ray.data.aggregate import Max

    from .hashing import md5_lower64

    def partial(t: pa.Table) -> pa.Table:
        toks: list[str] = []
        for x in t[text_col].to_pylist():
            toks.extend(tokens_of(x))
        if hash_kind == "md5":
            h = np.fromiter(
                (md5_lower64(tk) for tk in toks), dtype=np.uint64,
                count=len(toks),
            )
        else:
            h = _hash_tokens_u64(toks)
        regs = _registers_of(h, p)
        nz = np.nonzero(regs)[0]
        return pa.table(
            {
                "reg": pa.array(nz.astype(np.int64), pa.int64()),
                "rank": pa.array(regs[nz], pa.int64()),
            }
        )

    return (
        docs.select_columns([text_col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("reg")
        .aggregate(Max("rank", alias_name="rank"))
    )


def distinct_tokens_exact(docs, text_col="text"):
    """Exact corpus-wide DISTINCT-token count as one (n) row — the
    heavy-hitters shuffle shape (per-batch unique partials, one
    groupby) finished with a metadata-only count(); the SQL twin
    re-derives it via unnest."""
    import ray.data as rd

    def partial(t: pa.Table) -> pa.Table:
        toks = {tok for x in t[text_col].to_pylist() for tok in tokens_of(x)}
        return pa.table({"token": pa.array(sorted(toks), pa.string())})

    n = (
        docs.select_columns([text_col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("token")
        .count()
        .count()  # rows in the aggregated vocabulary = distinct tokens
    )
    return rd.from_arrow(pa.table({"n": pa.array([int(n)], pa.int64())}))


# ------------------------------------------------------- count-min sketch
_CMS_RNG = np.random.default_rng(0xC0117)  # fixed: row params are the format
_CMS_MAX_D = 8
_CMS_A = _CMS_RNG.integers(1, (1 << 61) - 1, size=_CMS_MAX_D, dtype=np.uint64) | np.uint64(1)
_CMS_B = _CMS_RNG.integers(0, (1 << 61) - 1, size=_CMS_MAX_D, dtype=np.uint64)
_M61 = np.uint64((1 << 61) - 1)


def _cms_buckets(h: np.ndarray, d: int, w: int) -> np.ndarray:
    """(d, len(h)) bucket indices: row-j bucket of each uint64 hash via
    pairwise-independent (a*h + b) mod M61 mod w, all vectorized."""
    out = np.empty((d, len(h)), dtype=np.int64)
    with np.errstate(over="ignore"):
        for j in range(d):
            mixed = (h * _CMS_A[j] + _CMS_B[j]) % _M61
            out[j] = (mixed % np.uint64(w)).astype(np.int64)
    return out


def cms_token_counts(docs, probe_tokens: list[str], d: int = 4, w: int = 8192,
                     text_col="text", hash_kind: str = "blake"):
    """Count-min sketch (Cormode & Muthukrishnan 2005) estimate of each
    probe token's TOTAL occurrence count — "how often does this token
    appear in 100 TB" without shuffling the token stream. Guarantees
    estimate >= true count always, and <= true + eps*N (eps = e/w)
    with prob 1 - delta (delta = e^-d) — the pytest pins both sides.

    Scale shape (the HLL pattern): per-batch token counts fold into a
    local d x w counter table (np.add.at — counters are sums, so
    partials MERGE exactly); the one groupby moves <= d*w (cell, sum)
    rows per block; the driver probes a constant-size table. Keyed
    blake2b token hashes + fixed row params make the estimate
    bit-stable across runs, block layouts and cluster sizes — the
    exact sibling (``heavy_hitters``) is the SQL-certified oracle.
    """
    import ray.data as rd
    from ray.data.aggregate import Sum

    from .hashing import md5_lower64

    if d > _CMS_MAX_D:
        raise ValueError(f"d <= {_CMS_MAX_D}")

    def buckets(tokens: list[str]) -> np.ndarray:
        """(d, n) bucket indices. ``hash_kind="md5"``: row j's bucket =
        md5_number_lower('j:tok') % w — DuckDB-reproducible, so the
        ENTIRE counter table (and every estimate) is SQL-derivable;
        "blake" keeps the faster keyed pairwise-independent rows."""
        if hash_kind == "md5":
            return np.array(
                [[md5_lower64(f"{j}:{t}") % w for t in tokens]
                 for j in range(d)],
                dtype=np.int64,
            )
        return _cms_buckets(_hash_tokens_u64(tokens), d, w)

    def partial(t: pa.Table) -> pa.Table:
        toks: list[str] = []
        for x in t[text_col].to_pylist():
            toks.extend(tokens_of(x))
        if not toks:
            return pa.table({"cell": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        # hash DISTINCT tokens, weight by occurrence count (md5 per
        # occurrence would be needless string hashing)
        uniq, counts = np.unique(np.asarray(toks, dtype=object),
                                 return_counts=True)
        bk = buckets(list(uniq))  # (d, n_uniq)
        cells = (np.arange(d, dtype=np.int64)[:, None] * w + bk).ravel()
        weights = np.tile(counts.astype(np.int64), d)
        u, inv = np.unique(cells, return_inverse=True)
        acc = np.zeros(len(u), dtype=np.int64)
        np.add.at(acc, inv, weights)
        return pa.table({"cell": pa.array(u, pa.int64()),
                         "n": pa.array(acc, pa.int64())})

    merged = (
        docs.select_columns([text_col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("cell")
        .aggregate(Sum("n", alias_name="n"))
        .take_all()
    )  # <= d*w rows regardless of corpus size
    table = np.zeros(d * w, dtype=np.int64)
    for r in merged:
        table[int(r["cell"])] = int(r["n"])
    table = table.reshape(d, w)
    pb = buckets(list(probe_tokens))  # (d, n_probe)
    est = table[np.arange(d)[:, None], pb].min(axis=0)
    return rd.from_arrow(
        pa.table(
            {
                "token": pa.array(list(probe_tokens), pa.string()),
                "n_est": pa.array(est.astype(np.int64), pa.int64()),
            }
        )
    )


# ------------------------------------------- exact float quantiles
def _f64_sortkey(x: np.ndarray) -> np.ndarray:
    """Order-preserving IEEE-double -> uint64 transform (standard bit
    trick: flip the sign bit for non-negatives, complement everything
    for negatives) — lets range/bucket logic on doubles run in exact
    integer space."""
    b = x.astype(np.float64).view(np.int64)
    mask = np.where(b < 0, np.uint64(0xFFFFFFFFFFFFFFFF), np.uint64(1) << np.uint64(63))
    return b.view(np.uint64) ^ mask


def _f64_sortkey_inv(u: np.ndarray) -> np.ndarray:
    """Inverse of _f64_sortkey."""
    u = u.astype(np.uint64)
    neg = u < (np.uint64(1) << np.uint64(63))
    mask = np.where(neg, np.uint64(0xFFFFFFFFFFFFFFFF), np.uint64(1) << np.uint64(63))
    return (u ^ mask).view(np.int64).view(np.float64)


def exact_float_quantiles(ds, col: str, qs=(0.25, 0.5, 0.75, 0.9, 0.99),
                          cap: int = 100_000):
    """EXACT quantile_disc of a float64 column (1-based rank
    ``max(1, ceil(q*n))`` over the sorted multiset, DuckDB semantics)
    — for columns where values are ~all distinct, so the (value,
    count) histogram trick (token_length_percentiles) would itself be
    corpus-sized.

    Scale shape: iterative range refinement in order-preserving uint64
    key space. Each round is ONE streaming pass emitting per-batch
    (q_idx, bucket, count) partials over 4096 buckets per still-open
    quantile — a constant-size groupby — after which each target
    rank's range narrows 4096x. When a range's row count <= ``cap``
    the final pass gathers just those rows (expected n/4096^rounds)
    and takes the exact rank. log_4096(n) + 1 passes total (3 passes
    at 10^12 rows); the driver never holds more than ``cap`` values
    per quantile. NaNs/nulls are excluded (SQL NULL semantics); the
    returned value is an ELEMENT of the input, so the float is
    hash-exact against the SQL twin.
    """
    import pandas as pd
    from ray.data.aggregate import Sum

    BUCKET_BITS = 12
    NB = 1 << BUCKET_BITS

    base = ds.select_columns([col])

    def clean(t: pa.Table) -> np.ndarray:
        v = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
        return v[~np.isnan(v)]

    # total non-null count (one metadata-cheap pass)
    def count_batch(t: pa.Table) -> pa.Table:
        return pa.table({"n": pa.array([len(clean(t))], pa.int64())})

    n = 0
    for row in base.map_batches(count_batch, batch_format="pyarrow").iter_rows():
        n += int(row["n"])
    if n == 0:
        return pd.DataFrame({"q": np.array(qs, np.float64),
                             "value": np.full(len(qs), np.nan)})

    # state per quantile: open key range [lo, hi), rank within range
    import math

    state = []
    for q in qs:
        rank = max(1, math.ceil(q * n))  # 1-based global rank
        state.append({"lo": np.uint64(0), "hi": np.uint64(0xFFFFFFFFFFFFFFFF),
                      "rank": rank, "count": n, "value": None})
    # hi is inclusive-top sentinel; ranges are [lo, hi]
    max_rounds = 7  # 4096^6 > 2^64: always terminates
    for _ in range(max_rounds):
        open_idx = [i for i, s in enumerate(state)
                    if s["value"] is None and s["count"] > cap]
        if not open_idx:
            break
        spans = {}
        for i in open_idx:
            s = state[i]
            width = int(s["hi"]) - int(s["lo"]) + 1
            step = max(1, (width + NB - 1) // NB)
            spans[i] = (int(s["lo"]), int(s["hi"]), step)

        def hist(t: pa.Table) -> pa.Table:
            v = clean(t)
            k = _f64_sortkey(v).astype(np.uint64)
            qi, bk, ct = [], [], []
            for i, (lo, hi, step) in spans.items():
                m = (k >= np.uint64(lo)) & (k <= np.uint64(hi))
                if not m.any():
                    continue
                b = ((k[m] - np.uint64(lo)) // np.uint64(step)).astype(np.int64)
                u, c = np.unique(b, return_counts=True)
                qi.extend([i] * len(u))
                bk.extend(u.tolist())
                ct.extend(c.astype(np.int64).tolist())
            return pa.table({"qi": pa.array(qi, pa.int64()),
                             "bk": pa.array(bk, pa.int64()),
                             "n": pa.array(ct, pa.int64())})

        merged = (
            base.map_batches(hist, batch_format="pyarrow")
            .groupby(["qi", "bk"])
            .aggregate(Sum("n", alias_name="n"))
            .to_pandas()
        )
        for i in open_idx:
            s = state[i]
            lo, hi, step = spans[i]
            sub = merged[merged["qi"] == i].sort_values("bk")
            cum = sub["n"].cumsum().to_numpy()
            pos = int(np.searchsorted(cum, s["rank"]))
            b = int(sub["bk"].to_numpy()[pos])
            prev = int(cum[pos - 1]) if pos else 0
            s["rank"] -= prev
            s["count"] = int(sub["n"].to_numpy()[pos])
            s["lo"] = np.uint64(lo + b * step)
            s["hi"] = np.uint64(min(hi, lo + (b + 1) * step - 1))
            if s["lo"] == s["hi"]:
                # range is a single key: decode it — no gather needed
                # even if that one value repeats a billion times
                s["value"] = float(_f64_sortkey_inv(np.array([s["lo"]],
                                                             np.uint64))[0])

    # final gather: ranges are small now — collect values per open q
    open_idx = [i for i, s in enumerate(state) if s["value"] is None]
    if open_idx:
        franges = {i: (int(state[i]["lo"]), int(state[i]["hi"])) for i in open_idx}

        def gather(t: pa.Table) -> pa.Table:
            v = clean(t)
            k = _f64_sortkey(v).astype(np.uint64)
            qi, vals = [], []
            for i, (lo, hi) in franges.items():
                m = (k >= np.uint64(lo)) & (k <= np.uint64(hi))
                if m.any():
                    qi.extend([i] * int(m.sum()))
                    vals.extend(v[m].tolist())
            return pa.table({"qi": pa.array(qi, pa.int64()),
                             "v": pa.array(vals, pa.float64())})

        got = base.map_batches(gather, batch_format="pyarrow").to_pandas()
        for i in open_idx:
            s = state[i]
            vals = np.sort(got[got["qi"] == i]["v"].to_numpy())
            if len(vals) != s["count"]:
                raise RuntimeError(
                    f"exact_float_quantiles: gathered {len(vals)} values "
                    f"but histogram counted {s['count']} — passes disagree"
                )
            s["value"] = float(vals[s["rank"] - 1])

    return pd.DataFrame(
        {
            "q": np.array(qs, np.float64),
            "value": np.array([s["value"] for s in state], np.float64),
        }
    )


def hll_grouped_registers(ds, key_col: str, value_col: str, p: int = 12,
                          hash_kind: str = "blake"):
    """The merged per-group HLL REGISTER table — (key, reg, rank) with
    reg = top-p hash bits and rank = max leading-zero rank seen in that
    register. This is the sketch's entire state, in integers: with
    ``hash_kind="md5"`` (value hash = md5_number_lower of str(value),
    DuckDB-reproducible) the table is bit-identical to a SQL oracle
    re-deriving the registers — the driver-visible invariant that pins
    the whole sketch computation, not just its estimate. ``"blake"``
    keeps the faster keyed-blake2b / splitmix64 hash for scale runs.

    Exchange cost is the same as :func:`hll_grouped`: each batch
    pre-folds to per-group register partials, the one shuffle moves
    <= |groups| * 2^p tiny rows."""
    import pandas as pd
    from ray.data.aggregate import Max

    from .hashing import blake64, md5_lower64
    from .joins import _mix64

    def partial(t: pa.Table) -> pa.Table:
        keys = t[key_col].to_pylist()
        col = t[value_col]
        if hash_kind == "md5":
            h = np.fromiter(
                (md5_lower64(str(x)) for x in col.to_pylist()),
                dtype=np.uint64, count=len(col),
            )
        elif pa.types.is_integer(col.type):
            v = col.to_numpy(zero_copy_only=False).astype(np.int64)
            h = _mix64(v.view(np.uint64))
        else:
            h = np.fromiter(
                (blake64(str(x).encode("utf-8")) for x in col.to_pylist()),
                dtype=np.uint64, count=len(col),
            )
        out_k, out_r, out_rank = [], [], []
        df = pd.DataFrame({"k": keys, "h": h})
        for k, grp in df.groupby("k", sort=False):
            regs = _registers_of(grp["h"].to_numpy(), p)
            nz = np.nonzero(regs)[0]
            out_k.extend([k] * len(nz))
            out_r.extend(nz.tolist())
            out_rank.extend(regs[nz].tolist())
        return pa.table(
            {
                key_col: pa.array(out_k),
                "reg": pa.array(out_r, pa.int64()),
                "rank": pa.array(out_rank, pa.int64()),
            }
        )

    return (
        ds.select_columns([key_col, value_col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby([key_col, "reg"])
        .aggregate(Max("rank", alias_name="rank"))
    )


def hll_grouped(ds, key_col: str, value_col: str, p: int = 12):
    """Per-GROUP approximate distinct count — HLL registers keyed by
    (group, register): each batch folds its values into per-group
    register partials (vectorized over the whole batch via lexsorted
    (group, reg) reduction), the one shuffle moves <= |groups| * 2^p
    tiny rows, and a final map_groups renders each group's estimate.
    The per-event-type distinct-users shape when the exact
    double-groupby (distinct_users_per_event_type — its oracle-certified
    exact sibling) is too wide to shuffle at corpus scale. Hashing is
    bit-stable across runs and block layouts: INTEGER value columns go
    through a vectorized splitmix64 finalizer (no per-row Python in the
    hot path); other types fall back to per-row keyed blake2b.
    """
    import pandas as pd

    merged = hll_grouped_registers(ds, key_col, value_col, p)

    def estimate(g: pd.DataFrame) -> pd.DataFrame:
        regs = np.zeros(1 << p, dtype=np.int64)
        regs[g["reg"].to_numpy()] = g["rank"].to_numpy()
        return pd.DataFrame(
            {
                key_col: [g[key_col].iloc[0]],
                "n_estimate": [int(round(hll_estimate(regs, p)))],
            }
        )

    return merged.groupby(key_col).map_groups(estimate, batch_format="pandas")


def sampled_quantile_disc(ds, col: str, id_col: str, k: int = 2000,
                          qs=(0.25, 0.5, 0.75, 0.9, 0.99)):
    """ONE-PASS approximate quantiles from a deterministic uniform
    sample: the k rows with the smallest (md5(id), id) — a mergeable
    bottom-k sketch (each batch pre-prunes to its local bottom-k, the
    global merge is a tiny sort+limit), then quantile_disc ranks over
    the sample on the driver. Error ~O(1/sqrt(k)) in rank space.

    The at-scale sibling of exact_float_quantiles (which needs
    log_4096(n) passes): one streaming pass, k rows to the driver, and
    — because the sample is HASH-deterministic, not random — the
    result is bit-stable across runs/layouts AND exactly reproducible
    in SQL (row_number() OVER (ORDER BY md5(id), id) <= k), so even
    the approximation carries a full oracle twin.
    """
    import hashlib
    import math

    import pandas as pd

    def local_bottomk(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_pylist()
        h = [hashlib.md5(str(i).encode()).hexdigest() for i in ids]
        df = pd.DataFrame({"h": h, id_col: ids, col: t[col].to_pylist()})
        df = df.sort_values(["h", id_col], kind="mergesort").head(k)
        return pa.Table.from_pandas(df, preserve_index=False)

    sample = (
        ds.select_columns([id_col, col])
        .map_batches(local_bottomk, batch_format="pyarrow")
        .sort(["h", id_col])
        .limit(k)
        .to_pandas()
    )
    vals = np.sort(sample[col].to_numpy())
    n = len(vals)
    out_q, out_v = [], []
    for q in qs:
        rank = max(1, math.ceil(q * n))  # quantile_disc 1-based rank
        out_q.append(float(q))
        out_v.append(float(vals[rank - 1]))
    return pd.DataFrame(
        {"q": np.array(out_q, np.float64), "value": np.array(out_v, np.float64)}
    )


def grouped_sampled_quantile_disc(ds, by: str, col: str, id_col: str,
                                  k: int = 200, qs=(0.5, 0.9)):
    """Per-GROUP one-pass sampled quantiles: each group's
    hash-deterministic bottom-k sample (smallest (md5(id), id)), then
    quantile_disc ranks inside the group. Same mergeable-sample idea
    as sampled_quantile_disc, partitioned: per-batch LOCAL bottom-k
    per group bounds the exchange at k rows per (group, block), one
    groupby(by) finishes the sample and walks the ranks — the grouped
    approximate sibling of grouped_token_quantiles' exact histogram.
    SQL-reproducible (PARTITION BY + row_number over md5).
    """
    import hashlib
    import math

    import pandas as pd

    def local(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_pylist()
        df = pd.DataFrame(
            {
                by: t[by].to_pylist(),
                "h": [hashlib.md5(str(i).encode()).hexdigest() for i in ids],
                id_col: ids,
                col: t[col].to_pylist(),
            }
        )
        df = (
            df.sort_values(["h", id_col], kind="mergesort")
            .groupby(by, sort=False)
            .head(k)
        )
        return pa.Table.from_pandas(df, preserve_index=False)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["h", id_col], kind="mergesort").head(k)
        vals = np.sort(g[col].to_numpy())
        n = len(vals)
        rows = []
        for q in qs:
            rank = max(1, math.ceil(q * n))
            rows.append((g[by].iloc[0], float(q), int(vals[rank - 1])))
        return pd.DataFrame(rows, columns=[by, "q", "value"])

    return (
        ds.select_columns([by, col, id_col])
        .map_batches(local, batch_format="pyarrow")
        .groupby(by)
        .map_groups(final, batch_format="pandas")
    )
