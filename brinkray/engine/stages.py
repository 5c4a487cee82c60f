"""Stateless map_batches stages (Arrow in / Arrow out).

Each stage wraps a conformance-core function from ``brinkray.ref`` over
a zero-copy pyarrow batch. The scalar bodies are necessarily Python
(byte-exact Go string semantics), but each batch is one function call,
regexes/sets are bound once in the closure, and all column assembly is
Arrow. Frontier rows are small (strings only), so these stages are
cheap relative to fetch/extract.
"""

from __future__ import annotations

from typing import Callable

import pyarrow as pa

from ..ref.config import CrawlConfig
from ..ref.gourl import URLError
from ..ref.text import extract_text
from ..ref.urls import absolute_links_in, get_path, normalize_parts

FRONTIER_SCHEMA = pa.schema(
    [
        ("href", pa.string()),  # raw, pre-normalization (the expansion base)
        ("linked_from", pa.string()),
        ("target", pa.string()),
        ("order_key", pa.string()),  # FIFO-equivalent path label (see crawl.py)
        ("wave", pa.int32()),
    ]
)

NORM_FIELDS = [("canon", pa.string()), ("domain", pa.string()), ("path", pa.string())]


def make_normalize_fn(cfg: CrawlConfig) -> Callable[[pa.Table], pa.Table]:
    """brink.go:75-81 — normalize each href; failures are dropped here
    (the silent-drop branch). Adds canon/domain/path columns."""
    ignored = cfg.ignored_get_params
    fuzzy = cfg.fuzzy

    def normalize_batch(t: pa.Table) -> pa.Table:
        hrefs = t["href"].to_pylist()
        keep: list[int] = []
        canons: list[str] = []
        domains: list[str] = []
        paths: list[str] = []
        for i, h in enumerate(hrefs):
            try:
                canon, scheme, host, _ = normalize_parts(h, ignored, fuzzy)
            except URLError:
                continue
            try:
                # path must come from the canon (the worker re-parses the
                # normalized URL for pathForbidden, brink.go:111/urls.go:166);
                # a canon that fails to re-parse has path "" (pathForbidden
                # returns false on parse failure, urls.go:169-173)
                path = get_path(canon)
            except URLError:
                path = ""
            keep.append(i)
            canons.append(canon)
            domains.append(f"{scheme}://{host}")
            paths.append(path)
        kept = t.take(pa.array(keep, pa.int64()))
        return (
            kept.append_column("canon", pa.array(canons, pa.string()))
            .append_column("domain", pa.array(domains, pa.string()))
            .append_column("path", pa.array(paths, pa.string()))
        )

    return normalize_batch


def make_extract_links_fn(
    max_links_digits: int = 6, fast: bool = True
) -> Callable[[pa.Table], pa.Table]:
    """brink.go:117-135 — AbsoluteLinksIn over the RAW parent href, then
    enqueue non-empty hrefs. Emits next-wave frontier rows whose
    ``order_key`` extends the parent's (FIFO-order label)."""

    def extract_batch(t: pa.Table) -> pa.Table:
        hrefs_raw = t["href"].to_pylist()
        order_keys = t["order_key"].to_pylist()
        waves = t["wave"].to_pylist()
        bodies = t["body"].to_pylist()

        out_href: list[str] = []
        out_from: list[str] = []
        out_target: list[str] = []
        out_key: list[str] = []
        out_wave: list[int] = []
        for raw, okey, wave, body in zip(hrefs_raw, order_keys, waves, bodies):
            try:
                links = absolute_links_in(raw, raw, body, True, fast=fast)
            except URLError:
                continue  # err in AbsLinksIn => no expansion (brink.go:118-122)
            pos = 0
            for l in links:
                if l.href == "":
                    continue  # brink.go:125-128
                out_href.append(l.href)
                out_from.append(l.linked_from)
                out_target.append(l.target)
                out_key.append(f"{okey}/{pos:0{max_links_digits}d}")
                out_wave.append(wave + 1)
                pos += 1
        return pa.table(
            {
                "href": pa.array(out_href, pa.string()),
                "linked_from": pa.array(out_from, pa.string()),
                "target": pa.array(out_target, pa.string()),
                "order_key": pa.array(out_key, pa.string()),
                "wave": pa.array(out_wave, pa.int32()),
            }
        )

    return extract_batch


def make_robots_filter(policy) -> Callable[[pa.Table], pa.Table]:
    """Drop robots-disallowed rows right after normalization — before
    the seen check, so disallowed URLs are never fetched, marked or
    replayed (engine.robots docstring)."""

    def gate(t: pa.Table) -> pa.Table:
        domains = t["domain"].to_pylist()
        paths = t["path"].to_pylist()
        mask = pa.array(
            [policy.allowed(d, p) for d, p in zip(domains, paths)], pa.bool_()
        )
        return t.filter(mask)

    return gate


def extract_text_stage(t: pa.Table) -> pa.Table:
    """html/body binary column -> extracted ``text`` column (the
    byte-identical conformance surface)."""
    bodies = t["body"].to_pylist()
    texts = [extract_text(b) for b in bodies]
    return t.append_column("text", pa.array(texts, pa.string()))


def make_forbidden_filter(cfg: CrawlConfig) -> Callable[[pa.Table], pa.Table]:
    """Expansion gate (brink.go:111-114): keep rows with status==200 and
    path not forbidden. Handler delivery happened BEFORE this gate."""
    forbidden = cfg.forbidden_paths

    def gate(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ok_status = pc.equal(t["status"], pa.scalar(200, pa.int32()))
        if forbidden:
            paths = t["path"].to_pylist()
            allowed = pa.array([not any(f in p for f in forbidden) for p in paths])
            mask = pc.and_(ok_status, allowed)
        else:
            mask = ok_status
        return t.filter(mask)

    return gate
