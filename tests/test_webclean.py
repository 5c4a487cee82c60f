"""Organic-behavior pins for the web-corpus cleaning operators
(brinkray/textproc/webclean.py). The driver twins exercise these over a
constructed corpus (the sf texts have no newlines/emails); here we pin
the operators on hand-built multi-paragraph / PII-bearing docs with
known answers, across multiple blocks, and tie the percentile kernel to
DuckDB's quantile_disc on random data."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from brinkray.textproc.webclean import (
    paragraph_dedup,
    pii_scrub,
    token_length_percentiles,
)


def _docs(texts):
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    # several input blocks so the dedup count shuffle is cross-block
    return rd.from_arrow(tbl).repartition(4)


def test_paragraph_dedup_removes_cross_doc_boilerplate(ray_session):
    texts = [
        "BOILER\nunique one\n\nalpha",
        "BOILER\nunique two",
        "BOILER\nunique three\nSHARED TAIL",
        "solo document\nSHARED TAIL",
    ]
    out = (
        paragraph_dedup(_docs(texts))
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    # BOILER in 3 docs, SHARED TAIL in 2 -> both removed everywhere;
    # empty segment in doc 0 is kept (structure, not content)
    assert out["text_clean"].tolist() == [
        "unique one\n\nalpha",
        "unique two",
        "unique three",
        "solo document",
    ]
    assert out["n_paras"].tolist() == [4, 2, 3, 2]
    assert out["n_removed"].tolist() == [1, 1, 2, 1]


def test_paragraph_dedup_within_doc_repeat_not_removed(ray_session):
    # the same paragraph repeated INSIDE one doc counts once (distinct
    # docs), so min_docs=2 keeps it — cross-doc sharing is the signal
    out = paragraph_dedup(_docs(["rep\nrep\nbody", "other"])).to_pandas()
    row = out[out["doc_id"] == 0].iloc[0]
    assert row["text_clean"] == "rep\nrep\nbody"
    assert row["n_removed"] == 0


def test_paragraph_dedup_min_docs_knob(ray_session):
    texts = ["X\na", "X\nb", "X\nc"]
    loose = paragraph_dedup(_docs(texts), min_docs=4).to_pandas()
    assert (loose["n_removed"] == 0).all()
    tight = paragraph_dedup(_docs(texts), min_docs=3).to_pandas()
    assert (tight["n_removed"] == 1).all()


def test_paragraph_dedup_matches_duckdb_organically(ray_session):
    # randomized multi-paragraph corpus with a small paragraph
    # vocabulary (forces organic cross-doc sharing), checked against a
    # direct DuckDB re-derivation on the STRINGS (independent of the
    # engine's uint64 hashing)
    rng = np.random.default_rng(7)
    vocab = [f"para {i} content" for i in range(12)]
    texts = [
        "\n".join(vocab[j] for j in rng.integers(0, 12, size=rng.integers(1, 8)))
        for _ in range(60)
    ]
    got = (
        paragraph_dedup(_docs(texts))
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    con = duckdb.connect()
    con.register(
        "docs",
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        ),
    )
    want = con.sql(
        """
        WITH sp AS (SELECT doc_id, string_split(text, chr(10)) AS ps FROM docs),
        p AS (SELECT doc_id, unnest(ps) AS para, generate_subscripts(ps, 1) AS i
              FROM sp),
        shared AS (SELECT para FROM p WHERE length(para) > 0
                   GROUP BY para HAVING COUNT(DISTINCT doc_id) >= 2),
        kept AS (SELECT doc_id, para, i FROM p WHERE length(para) = 0
                 OR para NOT IN (SELECT para FROM shared)),
        tot AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_paras
                FROM p GROUP BY doc_id),
        agg AS (SELECT doc_id, COUNT(*) AS n_kept,
                string_agg(para, chr(10) ORDER BY i) AS text_clean
                FROM kept GROUP BY doc_id)
        SELECT t.doc_id, t.n_paras,
               CAST(t.n_paras - COALESCE(a.n_kept, 0) AS BIGINT) AS n_removed,
               COALESCE(a.text_clean, '') AS text_clean
        FROM tot t LEFT JOIN agg a USING (doc_id) ORDER BY doc_id
        """
    ).df()
    assert got["n_paras"].tolist() == want["n_paras"].tolist()
    assert got["n_removed"].tolist() == want["n_removed"].tolist()
    assert got["text_clean"].tolist() == want["text_clean"].tolist()


def test_pii_scrub_counts_and_redaction(ray_session):
    texts = [
        "reach bob.smith+tag@ex-ample.co.uk or carol@x.io at 192.168.0.1",
        "no pii here",
        "bare ip 10.0.0.255 twice 8.8.8.8",
        "",
    ]
    out = (
        pii_scrub(_docs(texts)).to_pandas().sort_values("doc_id", ignore_index=True)
    )
    assert out["n_emails"].tolist() == [2, 0, 0, 0]
    assert out["n_ipv4"].tolist() == [1, 0, 2, 0]
    assert (
        out["text_redacted"].iloc[0]
        == "reach <EMAIL> or <EMAIL> at <IP>"
    )
    assert out["text_redacted"].iloc[2] == "bare ip <IP> twice <IP>"


def test_pii_scrub_ip_host_not_an_email(ray_session):
    # an IP-shaped mail host has no alphabetic TLD, so the email
    # pattern does NOT match — the address is redacted as an IP
    # (identical under DuckDB's RE2; the pattern string is shared)
    out = pii_scrub(_docs(["admin@10.1.2.3 logged in"])).to_pandas()
    assert out["n_emails"].tolist() == [0]
    assert out["n_ipv4"].tolist() == [1]
    assert out["text_redacted"].tolist() == ["admin@<IP> logged in"]


@pytest.mark.parametrize("n", [1, 2, 97])
def test_percentiles_match_duckdb_quantile_disc(ray_session, n):
    rng = np.random.default_rng(n)
    counts = rng.integers(0, 40, size=n)
    texts = ["tok " * int(c) for c in counts]
    got = token_length_percentiles(_docs(texts))
    con = duckdb.connect()
    con.register("t", pa.table({"n": pa.array(counts, pa.int64())}))
    for q, v in zip(got["q"], got["n_tokens"]):
        want = con.sql(f"SELECT quantile_disc(n, {q}) FROM t").fetchone()[0]
        assert v == want, (q, v, want)
    assert str(got["q"].dtype) == "float64"
    assert str(got["n_tokens"].dtype) == "int64"


def test_grouped_token_quantiles_matches_duckdb(ray_session):
    import duckdb
    import numpy as np
    import ray.data as rd

    from brinkray.textproc.webclean import grouped_token_quantiles

    rng = np.random.default_rng(13)
    langs = rng.choice(["en", "de", "fr"], 400)
    texts = [" ".join(["w"] * int(n)) for n in rng.integers(1, 200, 400)]
    tbl = pa.table({"lang": pa.array(langs), "text": pa.array(texts)})
    got = grouped_token_quantiles(
        rd.from_arrow(tbl).repartition(6), qs=(0.1, 0.5, 0.95)
    )
    con = duckdb.connect()
    con.register("t", tbl.to_pandas())
    for _, row in got.iterrows():
        want = con.execute(
            "SELECT quantile_disc(len(string_split(text, ' ')), ?) FROM t "
            "WHERE lang = ?",
            [row["q"], row["lang"]],
        ).fetchone()[0]
        assert row["n_tokens"] == want, (row["lang"], row["q"])


def test_int_quantile_disc_duckdb_semantics(ray_session):
    import duckdb
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from brinkray.textproc.webclean import int_quantile_disc

    rng = np.random.default_rng(5)
    v = rng.integers(0, 500, 321).astype(np.int64)
    got = int_quantile_disc(
        rd.from_arrow(pa.table({"x": pa.array(v)})).repartition(4),
        "x", qs=(0.25, 0.5, 0.99),
    )
    con = duckdb.connect()
    con.register("t", pa.table({"x": pa.array(v)}))
    for q, val in got.items():
        want = con.execute(
            f"SELECT quantile_disc(x, {q}) FROM t"
        ).fetchone()[0]
        assert val == want, (q, val, want)


def test_paragraph_dedup_shuffled_equals_broadcast(ray_session):
    """Join-based shared-paragraph path == broadcast path row for row
    (the 100-TB fallback contract), including docs with no hits and a
    paragraph shared by many docs."""
    import pyarrow as pa
    import ray.data as rd

    from brinkray.textproc.webclean import paragraph_dedup, paragraph_dedup_shuffled

    boiler = "subscribe to our newsletter"
    texts = []
    for i in range(40):
        body = f"unique body {i}\nsecond line {i * 7}"
        if i % 2 == 0:
            body = boiler + "\n" + body
        if i % 5 == 0:
            body += "\ncookie banner text"
        texts.append(body)
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )
    a = (
        paragraph_dedup(ds).to_pandas()
        .sort_values("doc_id").reset_index(drop=True)
    )
    b = (
        paragraph_dedup_shuffled(ds).to_pandas()
        .sort_values("doc_id").reset_index(drop=True)
    )
    assert a.equals(b)
    assert a["n_removed"].sum() > 0  # the fixture actually removes
