"""CLI end-to-end (port of cmd/main.go): toml config + pages parquet
in, log + results parquet out."""

import pyarrow.parquet as pq


def test_cli_run(ray_session, tmp_path):
    from brinkray.cli import main
    from brinkray.fixtures import build_site

    pages_dir = tmp_path / "pages"
    pages_dir.mkdir()
    pq.write_table(build_site(30), str(pages_dir / "part0.parquet"))

    conf = tmp_path / "brink.toml"
    conf.write_text(
        'entrypoint = "https://site-a.test"\n'
        'allowed-domains = ["https://site-b.test"]\n'
        'ignore-get-parameters = ["session"]\n'
        'ignore-path-visits = ["admin/"]\n'
        "max-content-length = 8192\n"
    )
    log = tmp_path / "run.log"
    results = tmp_path / "out"

    rc = main(
        [
            "--conf", str(conf),
            "--out", str(log),
            "--pages", str(pages_dir),
            "--results", str(results),
        ]
    )
    assert rc == 0
    text = log.read_text()
    assert "crawl finished" in text
    assert "404:" in text  # the notFoundHandler fired (cmd/main.go:71-77)
    out_files = list(results.rglob("*.parquet"))
    assert out_files
    total = sum(pq.read_table(str(f)).num_rows for f in out_files)
    assert total > 30
