"""Driver-contract meta-tests for __ray_entry__: every queries() entry has
an oracle_sql() twin, no stray twins, and the module never owns a Ray
session (the driver calls ray.init itself)."""

import ast
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _entry_module():
    sys.path.insert(0, REPO)
    import __ray_entry__ as m

    return m


# Entries with NO SQL-expressible oracle (the driver records a weaker
# rows-only check for these; each names the pytest that pins it instead).
ROWS_ONLY = {
    # product quantization: tests/test_ops.py::test_ann_ivfpq pins
    # recall vs brute force, rebuild determinism, and pq_k >= n
    "ann_ivfpq_top10",
}


def test_every_query_has_a_twin():
    m = _entry_module()
    qs = set(m.queries())
    sqls = set(m.oracle_sql())
    missing = qs - sqls - ROWS_ONLY
    extra = sqls - qs
    assert not missing, f"queries without oracle twins: {sorted(missing)}"
    assert not extra, f"twins without queries: {sorted(extra)}"
    assert not (ROWS_ONLY & sqls), "rows-only entry grew a twin: update"
    assert len(qs) >= 75


def test_entry_module_never_inits_ray():
    """Statically assert no ray.init()/ray.shutdown() calls in the entry
    module or the library package (driver owns the session)."""
    offenders = []
    paths = [os.path.join(REPO, "__ray_entry__.py")]
    for root, _, files in os.walk(os.path.join(REPO, "elasticsearch_ray")):
        paths.extend(
            os.path.join(root, f) for f in files if f.endswith(".py")
        )
    for p in paths:
        with open(p) as f:
            tree = ast.parse(f.read(), filename=p)
        for node in ast.walk(tree):
            if (
                isinstance(node, ast.Call)
                and isinstance(node.func, ast.Attribute)
                and node.func.attr in ("init", "shutdown")
                and isinstance(node.func.value, ast.Name)
                and node.func.value.id == "ray"
            ):
                offenders.append(f"{p}:{node.lineno}")
    assert not offenders, offenders
