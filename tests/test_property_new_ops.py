"""Randomized brute-force conformance for the fourth-session kernels:
each test draws several seeded random inputs and compares the
distributed operator against an in-memory reference implementation.
Seeded loops instead of hypothesis: each example runs a full Ray
pipeline (~1 s), so the example budget is spent on diverse seeds, not
shrinking."""

import itertools

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _rd(tbl):
    import ray.data as rd

    return rd.from_arrow(tbl).repartition(3)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_pair_cooccurrence_random_vs_bruteforce(ray_session, seed):
    from brinkray.textproc.relagg import pair_cooccurrence

    rng = np.random.default_rng(seed)
    n = int(rng.integers(30, 120))
    g = rng.integers(0, 12, n).astype(np.int64)
    i = rng.integers(0, 9, n).astype(np.int64)
    ds = _rd(pa.table({"g": pa.array(g), "i": pa.array(i)}))
    got = (
        pair_cooccurrence(ds, "g", "i", min_count=2).to_pandas()
        .sort_values(["item_a", "item_b"]).reset_index(drop=True)
    )
    # brute force
    want: dict[tuple[int, int], int] = {}
    df = pd.DataFrame({"g": g, "i": i}).drop_duplicates()
    for _, grp in df.groupby("g"):
        for a, b in itertools.combinations(sorted(grp["i"]), 2):
            if a != b:
                want[(a, b)] = want.get((a, b), 0) + 1
    want = {k: v for k, v in want.items() if v >= 2}
    got_map = {
        (int(r["item_a"]), int(r["item_b"])): int(r["n_groups"])
        for _, r in got.iterrows()
    }
    assert got_map == want


@pytest.mark.parametrize("seed", [3, 4])
def test_bfs_distances_random_vs_bruteforce(ray_session, seed):
    from brinkray.textproc.joins import bfs_distances

    rng = np.random.default_rng(seed)
    n_nodes, n_edges = 25, 40
    ea = rng.integers(0, n_nodes, n_edges).astype(np.int64)
    eb = rng.integers(0, n_nodes, n_edges).astype(np.int64)
    keep = ea != eb
    ea, eb = np.minimum(ea, eb)[keep], np.maximum(ea, eb)[keep]
    ds = _rd(pa.table({"item_a": pa.array(ea), "item_b": pa.array(eb)}))
    got = bfs_distances(ds, [0], max_depth=8).to_pandas()
    got_map = dict(zip(got["node"].astype(int), got["dist"].astype(int)))
    # brute-force BFS
    adj: dict[int, set[int]] = {}
    for a, b in zip(ea, eb):
        adj.setdefault(int(a), set()).add(int(b))
        adj.setdefault(int(b), set()).add(int(a))
    want = {0: 0}
    frontier = [0]
    for d in range(1, 9):
        nxt = sorted(
            {m for x in frontier for m in adj.get(x, ()) if m not in want}
        )
        for m in nxt:
            want[m] = d
        frontier = nxt
        if not frontier:
            break
    assert got_map == want


@pytest.mark.parametrize("seed", [5, 6])
def test_snapshot_diff_apply_inverse(ray_session, seed):
    """apply_changes(a, diff-as-changes) must reproduce snapshot b —
    the CDC pair is a diff/patch inverse."""
    import ray.data as rd

    from brinkray.textproc.curation import apply_changes, snapshot_diff

    rng = np.random.default_rng(seed)
    n = 40
    a_ids = np.arange(n, dtype=np.int64)
    a_tx = [f"doc {i} v{rng.integers(0, 3)}" for i in a_ids]
    # b: drop some, modify some, add some
    drop = set(rng.choice(n, 6, replace=False).tolist())
    mod = set(rng.choice(n, 8, replace=False).tolist()) - drop
    b_ids, b_tx = [], []
    for i in a_ids:
        if int(i) in drop:
            continue
        b_ids.append(int(i))
        b_tx.append(a_tx[i] + " MOD" if int(i) in mod else a_tx[i])
    for j in range(3):
        b_ids.append(1000 + j)
        b_tx.append(f"new {j}")
    a = rd.from_arrow(pa.table(
        {"doc_id": pa.array(a_ids), "text": pa.array(a_tx)}))
    b_tbl = pa.table(
        {"doc_id": pa.array(b_ids, pa.int64()), "text": pa.array(b_tx)})
    b = rd.from_arrow(b_tbl)

    diff = snapshot_diff(a, b).to_pandas()
    b_map = dict(zip(b_ids, b_tx))
    ch_ids, ch_ops, ch_tx = [], [], []
    for _, r in diff.iterrows():
        i, c = int(r["doc_id"]), r["change"]
        if c == "removed":
            ch_ids.append(i); ch_ops.append("delete"); ch_tx.append("")
        else:
            ch_ids.append(i); ch_ops.append("upsert"); ch_tx.append(b_map[i])
    changes = rd.from_arrow(pa.table(
        {"doc_id": pa.array(ch_ids, pa.int64()),
         "op": pa.array(ch_ops), "text": pa.array(ch_tx)}))
    out = apply_changes(a, changes).to_pandas().sort_values("doc_id")
    assert dict(zip(out["doc_id"].astype(int), out["text"])) == b_map


@pytest.mark.parametrize("seed", [7, 8])
def test_late_events_random_vs_bruteforce(ray_session, seed):
    from brinkray.textproc.windows import late_events

    rng = np.random.default_rng(seed)
    n = 120
    users = rng.integers(0, 5, n).astype(np.int64)
    seqs = rng.permutation(n).astype(np.int64)
    ts = rng.integers(0, 10**7, n).astype(np.int64) * 1_000_000
    t = pa.table(
        {
            "user_id": pa.array(users),
            "event_id": pa.array(seqs),
            "ts": pa.array(ts).cast(pa.timestamp("us")),
        }
    )
    lateness_min = 30
    got = late_events(
        _rd(t), lateness_minutes=lateness_min, seq_col="event_id"
    ).to_pandas()
    got_set = set(zip(got["user_id"].astype(int), got["event_id"].astype(int)))
    want = set()
    df = pd.DataFrame({"u": users, "s": seqs, "t": ts}).sort_values(["u", "s"])
    for u, grp in df.groupby("u"):
        wm = -(2**62)
        for _, r in grp.iterrows():
            if wm - r["t"] > lateness_min * 60 * 1_000_000:
                want.add((int(u), int(r["s"])))
            wm = max(wm, int(r["t"]))
    assert got_set == want
