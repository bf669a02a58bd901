"""End-to-end CLI flow (bitcoin_ledger_2es_ray/cli.py): build → stats →
query → suggest → explain → check → delete → repo snapshot → restore →
query-the-restore — every hop through `main(argv)` exactly as a shell user
would run it."""

from __future__ import annotations

import json

import pytest

from bitcoin_ledger_2es_ray.cli import main
from bitcoin_ledger_2es_ray.pipelines.query import SegmentStore, score_query

from conftest import SF_DIR


@pytest.fixture(scope="module")
def cli_flow(ray_session, tmp_path_factory):
    from bitcoin_ledger_2es_ray.sources.corpus import derive_corpus_parquet

    root = tmp_path_factory.mktemp("cliflow")
    corpus = derive_corpus_parquet(SF_DIR, str(root / "corpus.parquet"))
    idx = str(root / "idx")
    rc = main(
        [
            "build", "--corpus", corpus, "--out", idx,
            "--partitions", "4", "--n-salt", "2",
        ]
    )
    assert rc == 0
    return root, idx


def _run(capsys, argv: list[str]) -> str:
    capsys.readouterr()  # drop anything earlier setup printed
    rc = main(argv)
    out = capsys.readouterr().out
    assert rc == 0, argv
    return out


def test_cli_stats_query_suggest_explain_check(cli_flow, capsys):
    _root, idx = cli_flow
    stats = json.loads(_run(capsys, ["stats", "--index", idx]).strip())
    assert stats["n_docs"] > 0 and stats["n_tombstones"] == 0

    store = SegmentStore(idx)
    vocab = sorted(store.df)
    text = f"{vocab[3 % len(vocab)]} {vocab[11 % len(vocab)]}"
    out = _run(capsys, ["query", "--index", idx, "--q", text, "-k", "5"])
    want = score_query(store, text, 5, round_decimals=6)
    lines = out.strip().splitlines()
    assert len(lines) == len(want)
    for line, (d, s) in zip(lines, want):
        parts = line.split()
        assert int(parts[3]) == d  # "rank score doc <id> repo:path@commit"
        assert abs(float(parts[1]) - s) < 5e-5  # printed at 4 dp

    t = vocab[5 % len(vocab)]
    sug = json.loads(_run(capsys, ["suggest", "--index", idx, "--q", t + "x"]).strip())
    assert any(r["term"] == t for r in sug)

    first_doc = want[0][0]
    ex = json.loads(
        _run(capsys, ["explain", "--index", idx, "--q", text,
                      "--doc", str(first_doc)]).strip()
    )
    assert ex["doc_id"] == first_doc and len(ex["terms"]) >= 1

    chk = json.loads(_run(capsys, ["check", "--index", idx]).strip())
    assert chk["ok"] is True


def test_cli_delete_repo_restore_roundtrip(cli_flow, capsys, tmp_path):
    _root, idx = cli_flow
    repo = str(tmp_path / "repo")
    created = json.loads(
        _run(capsys, ["repo", "create", "--repo", repo, "--name", "s1",
                      "--index", idx]).strip()
    )
    assert created["files"] > 0 and created["new_files"] == created["files"]

    # soft-delete a language, snapshot again: exactly one new blob
    deleted = json.loads(
        _run(capsys, ["delete", "--index", idx, "--field", "lang",
                      "--value", "de"]).strip()
    )
    assert deleted["tombstones_total"] > 0
    second = json.loads(
        _run(capsys, ["repo", "create", "--repo", repo, "--name", "s2",
                      "--index", idx]).strip()
    )
    assert second["new_files"] == 1  # only tombstones.parquet changed

    dest = str(tmp_path / "restored")
    restored = json.loads(
        _run(capsys, ["repo", "restore", "--repo", repo, "--name", "s1",
                      "--out", dest]).strip()
    )
    assert restored["files"] == created["files"]
    # the s1 restore predates the delete: no tombstones, full corpus answers
    a, b = SegmentStore(dest), SegmentStore(idx)
    assert a.tombs is None and b.tombs is not None

    gone = json.loads(
        _run(capsys, ["repo", "delete", "--repo", repo, "--name", "s2"]).strip()
    )
    assert gone["deleted_blobs"] == 1  # s2's tombstone blob GC'd


def test_cli_cat_indices(cli_flow, capsys, tmp_path):
    _root, idx = cli_flow
    reg = str(tmp_path / "reg")
    _run(capsys, ["alias", "--registry", reg, "--alias", "live", "--set", idx])
    out = _run(capsys, ["cat", "--registry", reg]).strip().splitlines()
    rows = [json.loads(line) for line in out]
    assert len(rows) == 1
    assert rows[0]["aliases"] == "live" and rows[0]["status"] == "green"
    assert rows[0]["docs_count"] > 0


def test_cli_esql(ray_session, capsys):
    out = _run(capsys, [
        "esql",
        "FROM events | STATS n = COUNT(*) BY event_type | SORT event_type",
        "--sf-dir", SF_DIR,
    ]).strip().splitlines()
    rows = [json.loads(line) for line in out]
    assert len(rows) == 5 and all(r["n"] > 0 for r in rows)
    # CSV path JSON-encodes nested (multivalue) columns
    csv_out = _run(capsys, [
        "esql",
        "FROM events | STATS v = VALUES(event_type) BY user_id | SORT user_id",
        "--sf-dir", SF_DIR, "--csv",
    ]).strip().splitlines()
    assert csv_out[0] == '"user_id","v"'
    import csv as _csv

    first = next(_csv.reader([csv_out[1]]))
    assert isinstance(json.loads(first[1]), list)  # nested JSON list cell


def test_cli_ccr_follow(cli_flow, capsys, tmp_path):
    _, idx = cli_flow
    follower = str(tmp_path / "follower")
    s1 = json.loads(_run(capsys, ["ccr", "--leader", idx, "--follower", follower]).strip())
    assert s1["copied"] == s1["files"] > 0
    s2 = json.loads(_run(capsys, ["ccr", "--leader", idx, "--follower", follower]).strip())
    assert s2["copied"] == 0 and s2["reused"] == s2["files"]


def test_cli_search_body(cli_flow, capsys):
    _, idx = cli_flow
    out = _run(capsys, [
        "search", "--index", idx, "--body",
        '{"query": {"bool": {"must": [{"match": {"content": "scan"}}]}}, "size": 3}',
    ]).strip().splitlines()
    assert 1 <= len(out) <= 3
    rows = [json.loads(l) for l in out]
    assert rows[0]["rank"] == 1 and rows[0]["score"] >= rows[-1]["score"]
