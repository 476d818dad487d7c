"""plot_d-style conformance: every engine mode scores MAP/MRR/P@10 = 1.0
against the oracle ground truth on the fixture query set."""

from elasticsearch_ray.oracle.oracle import looks_boolean
from elasticsearch_ray.pipelines.evaluate import evaluate_engine

from test_query import fixture_queries


def test_engine_modes_score_perfect_map(tiny_engine, tiny_oracle):
    ranked = [q for q in fixture_queries() if not looks_boolean(q)]
    for mode in ("taat", "wand"):
        res = evaluate_engine(
            lambda q, m=mode: tiny_engine.search(q, mode=m),
            tiny_oracle.query_taat,
            ranked,
        )
        assert res["num_queries"] > 10
        assert res["map"] == 1.0, (mode, res["map"])
        assert res["mrr"] == 1.0
        assert res["aggregates"]["precision"]["mean"] == 1.0


def test_degraded_engine_scores_below_one(tiny_engine, tiny_oracle):
    """Sanity: the harness can actually detect mismatches."""

    def broken(q):
        r = tiny_engine.search(q)
        r["results"] = r["results"][::-1][:5]  # wrong order, truncated
        return r

    ranked = [q for q in fixture_queries() if not looks_boolean(q)]
    res = evaluate_engine(broken, tiny_oracle.query_taat, ranked)
    assert res["map"] < 1.0
