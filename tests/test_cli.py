"""CLI entry points (python -m janus_spark …) — parse and query
subcommands; datapipe is covered in test_datapipe, serve in test_http_api."""

import json

from janus_spark.__main__ import main

QUERY = """
PREFIX ex: <http://example.org/>
REGISTER RStream <out> AS
SELECT ?e ?v
FROM NAMED WINDOW ex:h ON LOG <urn:stream:events> [START 0 END 99999999999999]
WHERE { WINDOW ex:h { ?e <urn:col:value> ?v . } }
"""


def test_cli_parse_emits_decomposition(capsys):
    assert main(["parse", QUERY]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["operator"] == "RStream"
    assert out["historical_windows"] == ["http://example.org/h"]
    assert out["live_windows"] == [] and not out["hybrid"]


def test_cli_query_runs_historical_window(spark, sf_dir, capsys):
    # spark fixture keeps the session alive; _spark() in the CLI reuses it
    assert main(["query", QUERY, "--sf-dir", sf_dir, "--limit", "5"]) == 0
    lines = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
    assert 1 <= len(lines) <= 5
    row = json.loads(lines[0])
    assert set(row) >= {"e", "v"}


def test_cli_parse_rejects_garbage(capsys):
    try:
        main(["parse", "SELECT WHERE garbage {{{"])
    except (SystemExit, SyntaxError, ValueError):
        return
    raise AssertionError("expected a parse failure")


def test_cli_search(spark, capsys):
    import json as _json

    from janus_spark.__main__ import main

    rc = main(["search", "spark window stream", "--sf-dir", "/root/testdata/sf0.001", "--k", "3"])
    assert rc == 0
    lines = [l for l in capsys.readouterr().out.strip().splitlines() if l.startswith("{")]
    hits = [_json.loads(l) for l in lines]
    assert len(hits) == 3
    assert [h["rank"] for h in hits] == [1, 2, 3]
    assert all(h["score"] > 0 and "snippet" in h for h in hits)
