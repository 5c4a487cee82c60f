"""The fetch stage: an actor pool implementing Fetch's gate order
(brink.go:166-229) as a vectorized lookup-join against the page index.

Stateful pieces living in each actor (reference: crawler.go:36-38):
the zero-copy page index mapping, the cookie jar + header session
(CookieSession below), and the seen-shard handles used to mark
successful fetches (brink.go:103) before the batch returns — so the
wave barrier guarantees marks are visible to the next wave's check.

Error rows (transport / NotAllowed / ContentTooLarge) are dropped
inside the stage — the silent-drop semantic (brink.go:95-101): never
marked, never emitted.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

from ..ref.config import AUTHORIZATION_HEADER, Cookie, CrawlConfig
from ..state.cuckoo import sha1_16
from ..state.politeness import PolitenessClient
from ..state.seen import ShardedSeenSet
from .index import PageIndex

__all__ = [
    "CookieSession",
    "SharedCookieJar",
    "Fetcher",
    "BlockRefFetcher",
    "PartitionedFetcher",
    "HttpFetcher",
]


class CookieSession:
    """Cookie jar + request-header state (brink.go:166-203, 256-274).

    Reproduced quirks: the jar is keyed by cookie NAME only (no host
    scoping, crawler.go:36); once any request carries a cookie whose
    name case-insensitively matches SessionCookieNames, the
    Authorization header is deleted PERMANENTLY (brink.go:178-183);
    response cookies merge into the jar by name (brink.go:267-274).

    The reference shares one jar across all workers; here each fetcher
    actor owns a jar (SURVEY §7 hard part 4) — conformance tests run
    cookie-free configs, and the jar contract is unit-tested directly.
    """

    def __init__(self, cfg: CrawlConfig):
        self.cookies: dict[str, Cookie] = dict(cfg.opts.cookies)
        self.headers: dict[str, str] = dict(cfg.req_headers)
        self._session_names = {n.lower() for n in cfg.opts.session_cookie_names}

    def prepare_headers(self) -> dict[str, str]:
        """Headers for the next request: cookies first (possibly
        dropping Authorization), then the header store."""
        headers: dict[str, str] = {}
        if self.cookies:
            parts = []
            for c in self.cookies.values():
                parts.append(f"{c.name}={c.value}")
                if c.name.lower() in self._session_names:
                    self.headers.pop(AUTHORIZATION_HEADER, None)
            headers["Cookie"] = "; ".join(parts)
        headers.update(self.headers)
        return headers

    def merge_response_cookies(self, cookies: list[Cookie]) -> None:
        for c in cookies:
            self.cookies[c.name] = c


@ray.remote(num_cpus=0)
class SharedCookieJar:
    """THE cookie jar: one mutable session shared by every fetcher,
    matching the reference's single jar across all workers
    (crawler.go:36, brink.go:267-274) — this closes the per-actor-jar
    divergence SURVEY §7.4 declared. The actor serializes access, so
    the one-way Authorization drop (brink.go:178-183) happens exactly
    once crawl-wide. Granularity: one prepare_headers RPC per WORKER
    (first batch blocks; later batches reuse the cached result, which
    is exact because the jar mutates only via that idempotent drop and
    via response-cookie merges that invalidate the cache — see
    Fetcher._lookup_and_gate). A cookie-enabled crawl therefore does
    NOT serialize per batch on this actor at cluster scale."""

    def __init__(self, cfg: CrawlConfig):
        self.session = CookieSession(cfg)

    def prepare_headers(self) -> dict[str, str]:
        return self.session.prepare_headers()

    def merge_response_cookies(self, cookies: list[Cookie]) -> None:
        self.session.merge_response_cookies(cookies)

    def state(self) -> dict:
        return {
            "cookies": {n: c.value for n, c in self.session.cookies.items()},
            "headers": dict(self.session.headers),
        }


class Fetcher:
    """Callable class for ``map_batches(Fetcher, concurrency=N)``.

    __init__ runs once per actor: maps the broadcast index zero-copy,
    builds the session. __call__ fetches one frontier batch and returns
    only the OK rows, after marking them seen.
    """

    def __init__(
        self,
        cfg: CrawlConfig,
        index: PageIndex,
        seen_actors: list,
        nshards: int,
        politeness_actors: list | None = None,
        politeness_shards: int = 0,
        cookie_jar=None,
        track_body: bool = False,
    ):
        # NOTE: no combine_chunks here — the table is zero-copy mapped
        # from the object store; combining would copy the whole corpus
        # once per worker process (catastrophic at 32 workers)
        import numpy as np

        tbl: pa.Table = ray.get(index.table_ref)
        self._canon = tbl["canon"]
        self._status = tbl["status"]
        self._html = tbl["html"]
        self._body_type = self._html.type
        # zero-copy view of the sorted hash column (see index.py)
        hcol = tbl["h"]
        if hcol.num_chunks == 1:
            self._h = hcol.chunk(0).to_numpy(zero_copy_only=True)
        else:  # tiny column; a copy is fine
            self._h = hcol.to_numpy()
        self._known_hosts = pa.array(sorted(index.known_hosts), pa.string())
        self._allowed = pa.array(sorted(cfg.allowed_domains), pa.string())
        self._max_cl = cfg.max_content_length
        self._forbidden = cfg.forbidden_paths
        self._seen = ShardedSeenSet(nshards, actors=seen_actors)
        self._track_body = track_body
        self._politeness = (
            PolitenessClient(politeness_shards, actors=politeness_actors)
            if politeness_actors
            else None
        )
        self.session = CookieSession(cfg)
        self._jar = cookie_jar  # SharedCookieJar handle (or None)
        self._jar_prepared = False

    def _join(self, batch: pa.Table, hs=None):
        """Broadcast-index lookup via the sorted hash column:
        np.searchsorted (vectorized, allocation-free) + string
        verification (exactness under 64-bit collisions). ``hs``
        (optional) reuses already-computed uint64 canon hashes so the
        scale path hashes each canon exactly once per batch."""
        import numpy as np

        from ..state.cuckoo import sha1_64

        canons = batch["canon"].to_pylist()
        n = len(canons)
        if hs is None:
            hs = np.fromiter((sha1_64(c) for c in canons), dtype=np.uint64, count=n)
        pos = np.searchsorted(self._h, hs)
        in_range = pos < len(self._h)
        pos_c = np.where(in_range, pos, 0)
        hit = in_range & (self._h[pos_c] == hs)
        idx_arr = pa.array(pos_c, pa.int64())
        # verify the canon string (collisions -> treated as miss unless
        # a neighboring duplicate-hash row matches)
        cand = pc.take(self._canon, idx_arr)
        same = pc.equal(cand, batch["canon"]).to_numpy(zero_copy_only=False).astype(bool)
        mismatch = hit & ~same
        if mismatch.any():
            for i in np.nonzero(mismatch)[0]:
                p = int(pos_c[i])
                hit_i = False
                while p < len(self._h) and self._h[p] == hs[i]:
                    if self._canon[p].as_py() == canons[i]:
                        pos_c[i] = p
                        hit_i = True
                        break
                    p += 1
                hit[i] = hit_i
            idx_arr = pa.array(pos_c, pa.int64())
        hit_pa = pa.array(hit)
        status = pc.if_else(
            hit_pa, pc.take(self._status, idx_arr), pa.scalar(404, pa.int32())
        )
        body = pc.if_else(
            hit_pa, pc.take(self._html, idx_arr), pa.scalar(b"", self._body_type)
        )
        return status, body

    @property
    def _known_set(self) -> frozenset:
        ks = getattr(self, "_known_set_cache", None)
        if ks is None:
            ks = frozenset(self._known_hosts.to_pylist())
            self._known_set_cache = ks
        return ks

    def _redirect_subst(self, batch: pa.Table, hs):
        """Redirect chains (ref/redirects.py; Go client.Do follows them
        inside the request): substitute the FINAL url's canon as the
        index-lookup key for redirect-path rows, leaving the batch's
        original canon/domain/path untouched for every OTHER use (seen
        key, link absolutization, domain + forbidden gates — all keyed
        to the ORIGINAL url per brink.go:104-116,205-215).

        Returns (batch_for_join, hs_for_join, ok_extra) where ok_extra
        is None when the batch has no redirect rows (two starts_with
        kernels — the only cost on the hot path) or a bool mask that is
        False for failed resolutions (hop budget exhausted, unknown hop
        host, /err/ landing) — transport errors, silently dropped like
        any other. Resolution itself is per-row Python over ONLY the
        redirect rows; vectorizing it would buy nothing (redirects are
        a thin slice of real frontiers and each chain is data-dependent
        iteration)."""
        import numpy as np

        from ..ref.errors import TransportError
        from ..ref.redirects import resolve_chain
        from ..state.cuckoo import sha1_64

        paths = batch["path"]
        redir = pc.or_(
            pc.starts_with(paths, "/redir/"), pc.starts_with(paths, "/xredir/")
        )
        if not pc.any(redir).as_py():
            return batch, hs, None
        mask = redir.to_numpy(zero_copy_only=False).astype(bool)
        idxs = np.nonzero(mask)[0]
        canons = batch["canon"].to_pylist()
        domains = batch["domain"].to_pylist()
        pl = paths.to_pylist()
        known = self._known_set
        new_canons = list(canons)
        ok_extra = np.ones(batch.num_rows, dtype=bool)
        hs2 = None if hs is None else hs.copy()
        for i in idxs:
            scheme, host = domains[i].split("://", 1)
            try:
                fs, fh, fp = resolve_chain(scheme, host, pl[i], known)
            except TransportError:
                ok_extra[i] = False
                continue
            if fp.startswith("/err/"):
                ok_extra[i] = False  # the landing request itself fails
                continue
            qsuffix = canons[i][len(domains[i]) + len(pl[i]):]
            new_canons[i] = f"{fs}://{fh}{fp}{qsuffix}"
            if hs2 is not None:
                hs2[i] = sha1_64(new_canons[i])
        ci = batch.schema.get_field_index("canon")
        batch2 = batch.set_column(ci, "canon", pa.array(new_canons, pa.string()))
        return batch2, hs2, pa.array(ok_extra)

    def _lookup_and_gate(self, batch: pa.Table, hs=None):
        """Fetch's gate order (brink.go:166-229) vectorized: returns
        (status, body, ok_mask) for the batch; ~ok rows are the silent
        drops (transport / NotAllowed / ContentTooLarge)."""
        # session fidelity: the header/jar state advances per request
        # (on the sandbox world the headers have no observable effect).
        # With a shared jar the mutation happens in THE one jar actor —
        # but the RPC is issued once per WORKER, not per batch: the jar
        # mutates only via (a) the one-way Authorization drop inside
        # prepare_headers, idempotent after the first call, and (b)
        # response-cookie merges (merge_response_cookies), which reset
        # _jar_prepared and force a refresh on the next batch. On the
        # sandbox world (no Set-Cookie in responses) the elided calls
        # are provably state-identical; a cookie-enabled crawl no
        # longer serializes every fetch batch on the single jar actor
        # (round-2 cost: one blocking ray.get per batch crawl-wide).
        if self._jar is not None:
            if not self._jar_prepared:
                ray.get(self._jar.prepare_headers.remote())
                self._jar_prepared = True
        else:
            self.session.prepare_headers()

        # (a) the request: unknown domain or /err/ path => transport error
        domain_known = pc.is_in(batch["domain"], value_set=self._known_hosts)
        err_path = pc.starts_with(batch["path"], "/err/")
        transport_ok = pc.and_(domain_known, pc.invert(err_path))

        # (b) redirect chains resolve inside the request: the join key
        # becomes the final url's canon; failed chains are transport
        # errors (ref/redirects.py)
        join_batch, join_hs, redirect_ok = self._redirect_subst(batch, hs)
        if redirect_ok is not None:
            transport_ok = pc.and_(transport_ok, redirect_ok)

        # the lookup-join (J1): canon -> (status, html); miss => 404, b""
        status, body = self._join(join_batch, join_hs)

        # (e) domain gate after the request (NotAllowed discards status)
        allowed = pc.is_in(batch["domain"], value_set=self._allowed)
        # (f) content-length gate
        fits = pc.less_equal(pc.binary_length(body), pa.scalar(self._max_cl))

        ok = pc.and_(pc.and_(transport_ok, allowed), fits)
        return status, body, ok

    def _merge_response_cookies(self, cookies) -> None:
        """Live-transport plumbing: response cookies go to THE shared
        jar and the worker's prepared-headers cache is invalidated, so
        the next batch re-RPCs and sees the merged state. The sandbox
        world never sets cookies; the HTTP transport stub would call
        this per response batch."""
        if self._jar is not None:
            ray.get(self._jar.merge_response_cookies.remote(cookies))
            self._jar_prepared = False
        else:
            self.session.merge_response_cookies(cookies)

    def scale_call(
        self,
        batch: pa.Table,
        store_body: bool = True,
        store_text: bool = True,
        fast_extract: bool = True,
        gen: int = 0,
        key_cap: int | None = None,
    ) -> pa.Table:
        """Scale-ordering fetch (sort-free dedup): within the batch the
        first occurrence per canon (by order_key) drives; cross-batch
        dedup goes through the shards' atomic ``reserve``. Output rows
        carry ``kind``: 'fetched' | 'cached' | 'pending' (another
        in-flight batch owns the canon — resolved post-barrier) |
        'link' (next-frontier rows, extracted INLINE so page bodies
        never have to be materialized between executions — at corpus
        scale the per-wave body blocks would spill the object store).
        Set-exact vs the reference: errors release their reservation so
        rediscoveries re-fetch; marks are first-write-wins."""
        from ..ref.gourl import URLError
        from ..ref.text import extract_text
        from ..ref.urls import absolute_links_in

        if batch.num_rows == 0:
            return self._empty_out(batch).append_column(
                "kind", pa.array([], pa.string())
            ).append_column("text", pa.array([], pa.string()))
        batch = batch.sort_by("order_key")
        canons = batch["canon"].to_pylist()
        # hash each canon exactly once per batch: 16-byte digests are the
        # shard wire keys; their leading 8 bytes feed the index join
        digs = [sha1_16(c) for c in canons]
        first_of: dict[str, int] = {}
        owner = [first_of.setdefault(c, i) for i, c in enumerate(canons)]
        firsts = sorted(first_of.values())
        res = self._seen.reserve_digests([digs[i] for i in firsts], gen)

        owned_pos = [i for i, r in zip(firsts, res) if r == -1]
        budget_dropped: list[int] = []
        if self._politeness is not None and owned_pos:
            # budget-only admission (scale ordering): one token per fetch
            # ATTEMPT, taken per domain per batch in batch-local
            # order — which URLs land inside a binding budget is
            # approximate (vs strict's frontier-exact order), but the
            # per-host token ACCOUNTING matches the oracle. Dropped rows
            # release their reservation and vanish silently, exactly
            # like strict's budget drop (oracle.py budget extension).
            domains = batch["domain"].to_pylist()
            by_dom: dict[str, list[int]] = {}
            for i in owned_pos:
                by_dom.setdefault(domains[i], []).append(i)
            admitted: set[int] = set()
            for d, rows_d in by_dom.items():
                k = self._politeness.take(d, len(rows_d))
                admitted.update(rows_d[:k])
                budget_dropped.extend(rows_d[k:])
            owned_pos = sorted(admitted)
        sub = batch.take(pa.array(owned_pos, pa.int64()))
        if sub.num_rows:
            import numpy as np

            sub_hs = np.fromiter(
                (int.from_bytes(digs[i][:8], "big") for i in owned_pos),
                dtype=np.uint64,
                count=len(owned_pos),
            )
            status_a, body_a, ok_a = self._lookup_and_gate(sub, sub_hs)
        else:
            status_a, body_a, ok_a = None, None, None

        # outcome per first-occurrence row index
        outcome: dict[int, tuple] = {}  # idx -> (kind, status, body)
        for i, r in zip(firsts, res):
            if r >= 0:
                outcome[i] = ("cached", r, b"")
            elif r == -2:
                outcome[i] = ("pending", -1, b"")
        err_digs = [digs[i] for i in budget_dropped]
        for i in budget_dropped:
            outcome[i] = ("error", -1, b"")
        mark_digs, mark_canons, mark_statuses = [], [], []
        mark_md5s: list[bytes] | None = [] if self._track_body else None
        if sub.num_rows:
            import hashlib

            st_l = status_a.to_pylist()
            ok_l = ok_a.to_pylist()
            body_l = body_a.to_pylist()
            for j, i in enumerate(owned_pos):
                if ok_l[j]:
                    outcome[i] = ("fetched", st_l[j], body_l[j])
                    mark_digs.append(digs[i])
                    mark_canons.append(canons[i])
                    mark_statuses.append(st_l[j])
                    if mark_md5s is not None:
                        mark_md5s.append(hashlib.md5(body_l[j]).digest())
                else:
                    outcome[i] = ("error", -1, b"")
                    err_digs.append(digs[i])
        # overlap the mark/release RPCs with the extraction loop below;
        # joined before return, so the wave barrier still guarantees
        # visibility to the next wave's reserve
        pending_rpcs: list = []
        if mark_digs:
            pending_rpcs += self._seen.mark_digests_async(
                mark_digs, mark_canons, mark_statuses, mark_md5s
            )
        if err_digs:
            groups = self._seen._group(err_digs)
            pending_rpcs += [
                self._seen.actors[s].release.remote([err_digs[i] for i in idxs])
                for s, idxs in groups.items()
            ]

        hrefs = batch["href"].to_pylist()
        okeys = batch["order_key"].to_pylist()
        waves = batch["wave"].to_pylist()
        paths = batch["path"].to_pylist()

        keep_idx, statuses, bodies, cacheds, kinds, texts = [], [], [], [], [], []
        l_href, l_from, l_target, l_key, l_wave = [], [], [], [], []
        for i in range(batch.num_rows):
            kind, st, body = outcome[owner[i]]
            if kind == "error":
                continue  # silent drop (all occurrences re-fetch later)
            if i != owner[i]:
                # duplicate occurrence: cached replay off the local
                # winner (or pending alongside it)
                keep_idx.append(i)
                statuses.append(st if kind not in ("pending",) else -1)
                bodies.append(b"")
                cacheds.append(True)
                kinds.append("pending" if kind == "pending" else "cached")
                texts.append("")
                continue
            keep_idx.append(i)
            statuses.append(st)
            cacheds.append(kind != "fetched")
            kinds.append(kind)
            if kind != "fetched":
                bodies.append(b"")
                texts.append("")
                continue
            bodies.append(body if store_body else b"")
            # extraction always runs (it IS the job — the metric is
            # urls fetched+extracted/sec); store_text only controls
            # whether the result rows carry the text payload
            text_val = extract_text(body)
            texts.append(text_val if store_text else "")
            # expansion gate + inline link extraction (brink.go:111-135)
            if st != 200 or any(f in paths[i] for f in self._forbidden):
                continue
            try:
                links = absolute_links_in(
                    hrefs[i], hrefs[i], body, True, fast=fast_extract
                )
            except URLError:
                continue
            pos = 0
            for l in links:
                if l.href == "":
                    continue
                l_href.append(l.href)
                l_from.append(l.linked_from)
                l_target.append(l.target)
                # key_cap (deep-crawl width bound, crawl.py
                # rebase_order_keys): past the cap children inherit the
                # parent's label — ordering (already approximate in
                # scale mode) coarsens below cap depth, set semantics
                # (reservation dedup) are untouched
                if key_cap is not None and len(okeys[i]) + 7 > key_cap:
                    l_key.append(okeys[i])
                else:
                    l_key.append(f"{okeys[i]}/{pos:06d}")
                l_wave.append(waves[i] + 1)
                pos += 1

        if pending_rpcs:
            ray.get(pending_rpcs)
        out = batch.take(pa.array(keep_idx, pa.int64()))
        out = (
            out.append_column("status", pa.array(statuses, pa.int32()))
            .append_column("body", pa.array(bodies, self._body_type))
            .append_column("cached", pa.array(cacheds, pa.bool_()))
            .append_column("kind", pa.array(kinds, pa.string()))
            .append_column("text", pa.array(texts, pa.string()))
        )
        if not l_href:
            return out
        nl = len(l_href)
        fill = {
            "href": pa.array(l_href, pa.string()),
            "linked_from": pa.array(l_from, pa.string()),
            "target": pa.array(l_target, pa.string()),
            "order_key": pa.array(l_key, pa.string()),
            "wave": pa.array(l_wave, pa.int32()),
            "canon": pa.array([""] * nl, pa.string()),
            "domain": pa.array([""] * nl, pa.string()),
            "path": pa.array([""] * nl, pa.string()),
            "status": pa.array([-1] * nl, pa.int32()),
            "body": pa.array([b""] * nl, self._body_type),
            "cached": pa.array([False] * nl, pa.bool_()),
            "kind": pa.array(["link"] * nl, pa.string()),
            "text": pa.array([""] * nl, pa.string()),
        }
        link_tbl = pa.table({name: fill[name] for name in out.column_names})
        return pa.concat_tables([out, link_tbl.cast(out.schema)])

    def _empty_out(self, batch: pa.Table) -> pa.Table:
        return (
            batch.append_column("status", pa.array([], pa.int32()))
            .append_column("body", pa.array([], self._body_type))
            .append_column("cached", pa.array([], pa.bool_()))
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Mixed winner batch: rows with seen_status != -1 pass through
        as cached replays (stored status, empty body, brink.go:83-93);
        novel rows go through the fetch gates; error rows vanish."""
        if batch.num_rows == 0:
            return self._empty_out(batch)
        novel_mask = pc.equal(batch["seen_status"], pa.scalar(-1, pa.int32()))
        seen_rows = batch.filter(pc.invert(novel_mask))
        batch = batch.filter(novel_mask)

        out_parts: list[pa.Table] = []
        if seen_rows.num_rows:
            out_parts.append(
                seen_rows.append_column(
                    "status", seen_rows["seen_status"].cast(pa.int32())
                )
                .append_column(
                    "body",
                    pa.array([b""] * seen_rows.num_rows, self._body_type),
                )
                .append_column(
                    "cached", pa.array([True] * seen_rows.num_rows, pa.bool_())
                )
            )

        if batch.num_rows:
            status, body, ok = self._lookup_and_gate(batch)
            kept = batch.filter(ok)
            fetched = (
                kept.append_column("status", pc.filter(status, ok))
                .append_column("body", pc.filter(body, ok))
                .append_column(
                    "cached", pa.array([False] * kept.num_rows, pa.bool_())
                )
            )
            # (4) mark visited BEFORE returning (brink.go:103); the wave
            # barrier makes this visible to every later lookup
            if fetched.num_rows:
                md5s = None
                if self._track_body:
                    import hashlib

                    md5s = [
                        hashlib.md5(b).digest()
                        for b in fetched["body"].to_pylist()
                    ]
                self._seen.mark(
                    fetched["canon"].to_pylist(),
                    fetched["status"].to_pylist(),
                    md5s,
                )
            out_parts.append(fetched)

        if not out_parts:
            return self._empty_out(batch)
        out = pa.concat_tables(out_parts) if len(out_parts) > 1 else out_parts[0]
        return out.sort_by("order_key")


class BlockRefFetcher(Fetcher):
    """Fetch against a BlockPageIndex (distributed-sorted blocks in the
    object store). Each worker maps ALL blocks zero-copy on first
    construction and stitches them into the single-table layout with
    METADATA-ONLY concatenation (pa.concat_tables shares the plasma
    buffers; only the 8-byte h column is copied into one contiguous
    array for searchsorted) — after which the probe is exactly
    ``Fetcher._join``. The driver never held more than block refs."""

    def __init__(
        self,
        cfg: CrawlConfig,
        bindex,
        seen_actors: list,
        nshards: int,
        politeness_actors: list | None = None,
        politeness_shards: int = 0,
        cookie_jar=None,
        track_body: bool = False,
    ):
        import numpy as np

        tables = [ray.get(r) for r in bindex.block_refs]  # zero-copy maps
        # flatten to plain chunk lists; arrow compute kernels over a
        # many-chunk ChunkedArray concatenate internally (a multi-GB
        # copy PER BATCH on a broadcast corpus), so the join gathers
        # chunk-aware instead: numpy for h/status, per-row chunk
        # indexing for canon/html (which materialize per row anyway)
        self._canon_chunks = [c for t in tables for c in t["canon"].chunks]
        self._html_chunks = [c for t in tables for c in t["html"].chunks]
        self._body_type = (
            self._html_chunks[0].type if self._html_chunks else pa.large_binary()
        )
        if tables:
            self._h = np.concatenate(
                [
                    c.to_numpy(zero_copy_only=True)
                    for t in tables
                    for c in t["h"].chunks
                ]
            )  # blocks are globally h-sorted, so concat stays sorted
            self._status_np = np.concatenate(
                [
                    c.to_numpy(zero_copy_only=False)
                    for t in tables
                    for c in t["status"].chunks
                ]
            ).astype(np.int32)
        else:
            self._h = np.array([], dtype=np.uint64)
            self._status_np = np.array([], dtype=np.int32)
        lens = [len(c) for c in self._canon_chunks]
        self._chunk_offs = np.concatenate([[0], np.cumsum(lens)]).astype(np.int64)
        self._known_hosts = pa.array(sorted(bindex.known_hosts), pa.string())
        self._allowed = pa.array(sorted(cfg.allowed_domains), pa.string())
        self._max_cl = cfg.max_content_length
        self._forbidden = cfg.forbidden_paths
        self._seen = ShardedSeenSet(nshards, actors=seen_actors)
        self._track_body = track_body
        self._politeness = (
            PolitenessClient(politeness_shards, actors=politeness_actors)
            if politeness_actors
            else None
        )
        self.session = CookieSession(cfg)
        self._jar = cookie_jar
        self._jar_prepared = False

    def _cell(self, chunks, g: int):
        c = int(np.searchsorted(self._chunk_offs, g, side="right") - 1)
        return chunks[c][g - int(self._chunk_offs[c])].as_py()

    def _join(self, batch: pa.Table, hs=None):
        """Same sorted-hash probe as Fetcher._join, but gathering
        chunk-aware from the mapped blocks (no arrow kernel over the
        full chunked corpus)."""
        from ..state.cuckoo import sha1_64

        canons = batch["canon"].to_pylist()
        n = len(canons)
        if hs is None:
            hs = np.fromiter((sha1_64(c) for c in canons), dtype=np.uint64, count=n)
        pos = np.searchsorted(self._h, hs)
        in_range = pos < len(self._h)
        pos_c = np.where(in_range, pos, 0)
        hit = in_range & (self._h[pos_c] == hs)
        st_out = np.full(n, 404, dtype=np.int32)
        hit_rows = np.nonzero(hit)[0]
        if len(hit_rows) == 0:
            return pa.array(st_out, pa.int32()), pa.array([b""] * n, self._body_type)
        st_out[hit_rows] = self._status_np[pos_c[hit_rows]]
        g = pos_c[hit_rows].astype(np.int64)
        cids = np.searchsorted(self._chunk_offs, g, side="right") - 1
        # fully-arrow gather: per-chunk takes (chunks are plain Arrays —
        # efficient vectorized gather, no cross-chunk concat), stitched
        # back to row order with a reorder take over the SMALL selected
        # array. No per-row Python in the hot path.
        order = np.argsort(cids, kind="stable")
        g_ord = g[order]
        cids_ord = cids[order]
        canon_parts, body_parts = [], []
        for c in np.unique(cids_ord):
            m = cids_ord == c
            loc = pa.array(g_ord[m] - int(self._chunk_offs[c]), pa.int64())
            canon_parts.append(pc.take(self._canon_chunks[c], loc))
            body_parts.append(pc.take(self._html_chunks[c], loc))
        canon_sel = (
            pa.concat_arrays(canon_parts) if len(canon_parts) > 1 else canon_parts[0]
        )
        body_sel = (
            pa.concat_arrays(body_parts) if len(body_parts) > 1 else body_parts[0]
        )
        inv = np.empty(len(order), dtype=np.int64)
        inv[order] = np.arange(len(order))
        inv_arr = pa.array(inv, pa.int64())
        canon_sel = pc.take(canon_sel, inv_arr)  # back to hit_rows order
        body_sel = pc.take(body_sel, inv_arr)
        # verify canon strings (64-bit collision safety), vectorized
        batch_canon_hit = pc.take(batch["canon"], pa.array(hit_rows, pa.int64()))
        same = pc.equal(canon_sel, batch_canon_hit).to_numpy(zero_copy_only=False)
        same = same.astype(bool)
        if not same.all():
            body_py = None
            for j in np.nonzero(~same)[0]:
                ri = int(hit_rows[j])
                q, h_val, found = int(g[j]), int(hs[ri]), False
                while q < len(self._h) and int(self._h[q]) == h_val:
                    if self._cell(self._canon_chunks, q) == canons[ri]:
                        st_out[ri] = int(self._status_np[q])
                        if body_py is None:
                            body_py = body_sel.to_pylist()
                        body_py[j] = self._cell(self._html_chunks, q)
                        found = True
                        break
                    q += 1
                if not found:
                    st_out[ri] = 404
                    if body_py is None:
                        body_py = body_sel.to_pylist()
                    body_py[j] = b""
            if body_py is not None:
                body_sel = pa.array(body_py, self._body_type)
        # scatter: output[i] = b"" for misses, selected body for hits —
        # a take over [sentinel b""] ++ selected, still all-arrow
        idx_full = np.zeros(n, dtype=np.int64)
        idx_full[hit_rows] = 1 + np.arange(len(hit_rows))
        sentinel = pa.array([b""], self._body_type)
        if isinstance(body_sel, pa.ChunkedArray):
            body_sel = body_sel.combine_chunks()
        body_all = pa.concat_arrays([sentinel, body_sel])
        body_out = pc.take(body_all, pa.array(idx_full, pa.int64()))
        return pa.array(st_out, pa.int32()), body_out


class PartitionedFetcher(Fetcher):
    """Fetch against a disk-partitioned page index (PartitionedPageIndex):
    the lookup-join loads only the hash shards the batch's canons map
    to, kept in a per-worker LRU. The broadcast variant is preferred
    while the corpus fits the object store; this is the co-partitioned
    path beyond that (SURVEY §2.4 J1).

    LRU sizing: frontier blocks are NOT shard-ranged (ranging them
    would cost a per-wave shuffle the wave loop deliberately avoids),
    so a batch cycles through up to nparts shards — sequential cyclic
    access is LRU's worst case, and a cache smaller than the working
    set reloads EVERY shard EVERY batch. ``cache_cap=None`` (default)
    therefore auto-sizes the cache to as many shards as a memory
    budget holds (BRINKRAY_SHARD_CACHE_BYTES, default 1 GiB/worker),
    capped at nparts; ``_shard_loads`` counts parquet (re)loads so the
    storm is observable (tests assert loads <= nparts). Beyond-budget
    corpora (nparts * shard_bytes >> budget) need the shard-ranged
    frontier — the documented 100-TB follow-up — or fewer workers with
    bigger budgets."""

    def __init__(
        self,
        cfg: CrawlConfig,
        pindex,
        seen_actors: list,
        nshards: int,
        politeness_actors: list | None = None,
        politeness_shards: int = 0,
        cookie_jar=None,
        cache_cap: int | None = None,
        track_body: bool = False,
    ):
        import os

        from collections import OrderedDict

        self._root = pindex.root
        self._nparts = pindex.nparts
        self._cache: "OrderedDict[int, pa.Table]" = OrderedDict()
        self._shard_loads = 0
        if cache_cap is None:
            budget = int(
                os.environ.get("BRINKRAY_SHARD_CACHE_BYTES", str(1 << 30))
            )
            disk = 0
            for p in range(self._nparts):
                d = os.path.join(self._root, f"pshard={p}")
                if os.path.isdir(d):
                    disk += sum(
                        os.path.getsize(os.path.join(d, f)) for f in os.listdir(d)
                    )
            # heap footprint ~2x the parquet bytes (decompression +
            # arrow offsets); at least 1 shard always fits
            per_shard = max(1, (2 * disk) // max(1, self._nparts))
            cache_cap = max(1, min(self._nparts, int(budget // per_shard)))
        self._cache_cap = cache_cap
        self._known_hosts = pa.array(sorted(pindex.known_hosts), pa.string())
        self._allowed = pa.array(sorted(cfg.allowed_domains), pa.string())
        self._max_cl = cfg.max_content_length
        self._forbidden = cfg.forbidden_paths
        self._body_type = pa.large_binary()
        self._seen = ShardedSeenSet(nshards, actors=seen_actors)
        self._track_body = track_body
        self._politeness = (
            PolitenessClient(politeness_shards, actors=politeness_actors)
            if politeness_actors
            else None
        )
        self.session = CookieSession(cfg)
        self._jar = cookie_jar
        self._jar_prepared = False

    def _shard_table(self, p: int):
        """Load-and-cache one pages shard as (table sorted by h,
        h ndarray). The persisted ``h`` column (written by
        build_partitioned_index) means loading costs one argsort —
        no string hashing."""
        import os

        import numpy as np
        import pyarrow.parquet as pq

        entry = self._cache.get(p)
        if entry is not None:
            self._cache.move_to_end(p)
            return entry
        self._shard_loads += 1
        d = os.path.join(self._root, f"pshard={p}")
        parts = [pq.read_table(os.path.join(d, f)) for f in sorted(os.listdir(d))]
        if parts:
            t = pa.concat_tables(parts).combine_chunks()
            h = t["h"].to_numpy(zero_copy_only=False).astype(np.uint64)
            order = np.argsort(h, kind="stable")
            t = t.take(pa.array(order, pa.int64()))
            h = h[order]
        else:
            t = pa.table(
                {
                    "canon": pa.array([], pa.string()),
                    "status": pa.array([], pa.int32()),
                    "html": pa.array([], pa.large_binary()),
                    "h": pa.array([], pa.uint64()),
                }
            )
            h = np.array([], dtype=np.uint64)
        entry = (t, h)
        self._cache[p] = entry
        while len(self._cache) > self._cache_cap:
            self._cache.popitem(last=False)
        return entry

    def _join(self, batch: pa.Table, hs=None):
        """Co-partitioned hash join, vectorized per shard group:
        np.searchsorted over the shard's sorted h column + pc.take,
        with string verification under 64-bit collisions — the same
        probe the broadcast Fetcher uses (fetch.py Fetcher._join)."""
        import numpy as np

        from ..state.cuckoo import sha1_64

        canons = batch["canon"].to_pylist()
        n = len(canons)
        if hs is None:
            hs = np.fromiter((sha1_64(c) for c in canons), dtype=np.uint64, count=n)
        shard_ids = (hs % np.uint64(self._nparts)).astype(np.int64)
        st_out = np.full(n, 404, dtype=np.int32)
        body_out: list[bytes] = [b""] * n
        for p in np.unique(shard_ids):
            rows = np.nonzero(shard_ids == p)[0]
            tbl, h_sorted = self._shard_table(int(p))
            if len(h_sorted) == 0:
                continue
            sub_h = hs[rows]
            pos = np.searchsorted(h_sorted, sub_h)
            in_range = pos < len(h_sorted)
            pos_c = np.where(in_range, pos, 0)
            hit = in_range & (h_sorted[pos_c] == sub_h)
            if not hit.any():
                continue
            hit_rows = rows[hit]
            hit_pos = pos_c[hit]
            idx = pa.array(hit_pos, pa.int64())
            cand = pc.take(tbl["canon"], idx).to_pylist()
            sts = pc.take(tbl["status"], idx).to_pylist()
            bodies = pc.take(tbl["html"], idx).to_pylist()
            canon_col = tbl["canon"]
            for j, ri in enumerate(hit_rows):
                if cand[j] == canons[ri]:
                    st_out[ri] = sts[j]
                    body_out[ri] = bodies[j]
                    continue
                # hash collision: scan the duplicate-hash run
                q = int(hit_pos[j])
                h_val = h_sorted[q]
                found = False
                while q < len(h_sorted) and h_sorted[q] == h_val:
                    if canon_col[q].as_py() == canons[ri]:
                        st_out[ri] = tbl["status"][q].as_py()
                        body_out[ri] = tbl["html"][q].as_py()
                        found = True
                        break
                    q += 1
                if not found:
                    pass  # miss: stays 404 / b""
        return pa.array(st_out, pa.int32()), pa.array(body_out, self._body_type)


_WORKER_FETCHERS: dict[str, "Fetcher"] = {}


def make_fetcher_fn(
    cfg: CrawlConfig,
    index: PageIndex,
    seen_actors: list,
    nshards: int,
    scale: bool = False,
    scale_opts: dict | None = None,
    politeness_actors: list | None = None,
    politeness_shards: int = 0,
    cookie_jar=None,
    chaos_marker: str | None = None,
    track_body: bool = False,
):
    """Stateless-task variant of the fetch stage with per-worker-process
    state caching: Ray worker processes persist across executions, so
    the Fetcher (zero-copy index mapping, session, shard handles) is
    built once per process and reused by every wave — an actor pool
    would be torn down and restarted per wave (per-wave map_batches),
    paying pool startup each time."""
    from .index import BlockPageIndex, PartitionedPageIndex

    if isinstance(index, PartitionedPageIndex):
        cls, key = PartitionedFetcher, index.root
    elif isinstance(index, BlockPageIndex):
        cls = BlockRefFetcher
        key = index.block_refs[0].hex() if index.block_refs else "empty_block_index"
    else:
        cls, key = Fetcher, index.table_ref.hex()
    # scope the worker cache to THIS crawl's state actors, not just the
    # index: two crawls may legally reuse one immutable index (bench
    # does) but never each other's seen shards — an index-only key
    # would hand crawl 2 a cached fetcher still wired to crawl 1's
    # actors. Cache persistence across WAVES (same crawl) is what the
    # cache is for, and the actor id is constant within a crawl.
    if seen_actors:
        key = f"{key}:{seen_actors[0]._actor_id.hex()}"

    def fetch_fn(batch: pa.Table) -> pa.Table:
        # fault-injection hook (chaos tests): when a marker path is
        # configured, the FIRST task to claim it hard-kills its worker
        # process mid-batch — exactly once per marker ("x" create is
        # atomic). Exercises the path a preempted/OOM-killed node takes
        # in production: Ray retries the task, the dead attempt's shard
        # reservations are orphan-swept at the execution barrier, and
        # the requeued rows claim in the next wave.
        if chaos_marker:
            try:
                open(chaos_marker, "x").close()
            except FileExistsError:
                pass
            else:
                os._exit(1)
        f = _WORKER_FETCHERS.get(key)
        if f is None:
            f = cls(
                cfg,
                index,
                seen_actors,
                nshards,
                politeness_actors=politeness_actors,
                politeness_shards=politeness_shards,
                cookie_jar=cookie_jar,
                track_body=track_body,
            )
            _WORKER_FETCHERS.clear()  # one crawl at a time per worker
            _WORKER_FETCHERS[key] = f
        if scale:
            return f.scale_call(batch, **(scale_opts or {}))
        return f(batch)

    return fetch_fn


class HttpFetcher:
    """Real-HTTP fetch stage — the reference's ``Fetch``
    (brink.go:166-229) over a live socket, with the same stage contract
    as ``Fetcher`` (actor-pool ``map_batches``; cached replays pass
    through, error rows silently drop, fetched rows are marked seen
    before the batch returns). Tested against a loopback
    ``http.server`` (no external network in CI); pointing it at a real
    web is a config change, not a code change.

    Reference gate order, reproduced exactly:
      1. request cookies from the jar; a session-named cookie deletes
         the Authorization header PERMANENTLY (brink.go:173-185,
         CookieSession.prepare_headers);
      2. the GET itself — transport errors (refused/timeout/malformed)
         drop silently (brink.go:195-197 error return);
      3. response Set-Cookie values merge into THE shared jar by name
         (brink.go:201-204);
      4. domain-allowed gate AFTER the request — status observed,
         row dropped (NotAllowed, brink.go:206-215);
      5. HEADER Content-Length gate (ContentTooLarge,
         brink.go:217-221) INCLUDING the -1 quirk: Go's
         resp.ContentLength is -1 when the header is absent/chunked,
         and ``-1 > MaxContentLength`` is false — an UNKNOWN length
         always passes and the full body is read. The fetch-as-join
         path can only approximate this with body length
         (a lookup join has no headers); here the gate is the header
         itself, oracle-diffed in tests/test_http_fetcher.py.
    """

    def __init__(self, cfg: CrawlConfig, seen_actors: list, nshards: int,
                 cookie_jar=None, timeout: float = 10.0):
        self.cfg = cfg
        self.session = CookieSession(cfg)
        self._jar = cookie_jar  # SharedCookieJar handle (or None)
        self._seen = (
            ShardedSeenSet(nshards, actors=seen_actors) if seen_actors else None
        )
        self._allowed = set(cfg.allowed_domains)
        self._max_cl = cfg.max_content_length
        self._timeout = timeout

    # -- session plumbing (shared-jar when provided, else per-actor) --
    def _headers(self) -> dict[str, str]:
        if self._jar is not None:
            return ray.get(self._jar.prepare_headers.remote())
        return self.session.prepare_headers()

    def _merge(self, cookies: list[Cookie]) -> None:
        if not cookies:
            return
        if self._jar is not None:
            ray.get(self._jar.merge_response_cookies.remote(cookies))
        else:
            self.session.merge_response_cookies(cookies)

    def fetch_one(self, url: str):
        """One URL through the reference gates. Returns (status, body)
        or None for a silent drop (transport / NotAllowed /
        ContentTooLarge)."""
        import urllib.error
        import urllib.request

        from ..ref.gourl import URLError
        from ..ref.urls import scheme_and_host

        try:
            # construction errors are the reference's "failed creating
            # new request" return (brink.go:168-170) — also a drop
            req = urllib.request.Request(
                url, headers=self._headers(), method="GET"
            )
            resp = urllib.request.urlopen(req, timeout=self._timeout)
        except urllib.error.HTTPError as e:
            resp = e  # non-2xx IS a response (Go returns its status)
        except Exception:
            return None  # transport error -> silent drop
        with resp:
            status = int(getattr(resp, "status", None) or resp.code)
            # (3) response cookies -> jar, BEFORE any gate
            merged = []
            for sc in resp.headers.get_all("Set-Cookie") or []:
                nv = sc.split(";", 1)[0]
                if "=" in nv:
                    n, v = nv.split("=", 1)
                    merged.append(Cookie(name=n.strip(), value=v.strip()))
            self._merge(merged)
            # (4) domain gate after the request
            try:
                scheme, host = scheme_and_host(url)
            except URLError:
                return None
            if f"{scheme}://{host}" not in self._allowed:
                return None  # NotAllowed
            # (5) header Content-Length; absent == Go's -1 == passes
            cl_hdr = resp.headers.get("Content-Length")
            try:
                cl = int(cl_hdr) if cl_hdr is not None else -1
            except ValueError:
                cl = -1
            if cl > self._max_cl:
                return None  # ContentTooLarge
            body = resp.read()
        return status, body

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Same mixed-winner-batch contract as ``Fetcher.__call__``:
        seen rows replay cached, novel rows fetch live, errors vanish,
        fetched rows are marked before the batch returns."""
        body_type = pa.large_binary()
        if batch.num_rows == 0:
            return (
                batch.append_column("status", pa.array([], pa.int32()))
                .append_column("body", pa.array([], body_type))
                .append_column("cached", pa.array([], pa.bool_()))
            )
        novel_mask = pc.equal(batch["seen_status"], pa.scalar(-1, pa.int32()))
        seen_rows = batch.filter(pc.invert(novel_mask))
        novel = batch.filter(novel_mask)

        out_parts: list[pa.Table] = []
        if seen_rows.num_rows:
            out_parts.append(
                seen_rows.append_column(
                    "status", seen_rows["seen_status"].cast(pa.int32())
                )
                .append_column(
                    "body", pa.array([b""] * seen_rows.num_rows, body_type)
                )
                .append_column(
                    "cached", pa.array([True] * seen_rows.num_rows, pa.bool_())
                )
            )
        if novel.num_rows:
            keep_idx, statuses, bodies = [], [], []
            for i, canon in enumerate(novel["canon"].to_pylist()):
                got = self.fetch_one(canon)
                if got is None:
                    continue
                keep_idx.append(i)
                statuses.append(got[0])
                bodies.append(got[1])
            kept = novel.take(pa.array(keep_idx, pa.int64()))
            fetched = (
                kept.append_column("status", pa.array(statuses, pa.int32()))
                .append_column("body", pa.array(bodies, body_type))
                .append_column(
                    "cached", pa.array([False] * kept.num_rows, pa.bool_())
                )
            )
            if fetched.num_rows and self._seen is not None:
                self._seen.mark(
                    fetched["canon"].to_pylist(), fetched["status"].to_pylist()
                )
            out_parts.append(fetched)
        if not out_parts:
            return self.__call__(batch.slice(0, 0))
        out = pa.concat_tables(out_parts) if len(out_parts) > 1 else out_parts[0]
        return out.sort_by("order_key")
