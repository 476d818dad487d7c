"""Checked-in golden results (FIXTURES.md §3): both the oracle AND the
distributed engine must reproduce the recorded top-k doc_ids and scores for
the tiny corpus — guarding against oracle and engine drifting together."""

import json
import os

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "golden", "tiny_golden.json")


def _check(result: dict, golden: dict, q: str):
    assert result["total_hits"] == golden["total_hits"], q
    got = [(r["doc_id"], int(round(r["score"] * 1e9))) for r in result["results"]]
    exp = [(r["doc_id"], r["score_u"]) for r in golden["results"]]
    # scores recorded in nano-units; allow 1 ulp of re-rounding
    assert len(got) == len(exp), q
    for (gd, gs), (ed, es) in zip(got, exp):
        assert gd == ed, q
        assert abs(gs - es) <= 1, q


def test_oracle_matches_golden(tiny_oracle):
    data = json.load(open(GOLDEN_PATH))
    assert data["corpus"] == {"num_docs": 200, "avg_len": 60, "seed": 42}
    for q, golden in data["golden"].items():
        _check(tiny_oracle.query(q), golden, q)


def test_engine_matches_golden(tiny_engine):
    data = json.load(open(GOLDEN_PATH))
    for q, golden in data["golden"].items():
        _check(tiny_engine.search(q), golden, q)
