"""Boolean query compiler tests (reference shunting-yard with implicit AND,
``measure_latency_datastores.py:88-133``)."""

from elasticsearch_ray.oracle import to_rpn
from elasticsearch_ray.oracle.oracle import looks_boolean


def test_implicit_and():
    assert to_rpn(("a", "b")) == ("a", "b", "AND")
    assert to_rpn(("a", "b", "c")) == ("a", "b", "AND", "c", "AND")


def test_precedence_not_and_or():
    # NOT > AND > OR
    assert to_rpn(("a", "OR", "b", "AND", "c")) == ("a", "b", "c", "AND", "OR")
    assert to_rpn(("NOT", "a", "AND", "b")) == ("a", "NOT", "b", "AND")


def test_parens():
    assert to_rpn(("(", "a", "OR", "b", ")", "AND", "c")) == (
        "a", "b", "OR", "c", "AND",
    )


def test_implicit_and_before_not():
    # "a NOT b" -> a AND (NOT b)
    assert to_rpn(("a", "NOT", "b")) == ("a", "b", "NOT", "AND")


def test_implicit_and_around_parens():
    # "a (b OR c)" -> a AND (b OR c)
    assert to_rpn(("a", "(", "b", "OR", "c", ")")) == ("a", "b", "c", "OR", "AND")


def test_router():
    assert looks_boolean("a AND b")
    assert looks_boolean("(x) y")
    assert not looks_boolean("plain ranked query")
    # lowercase 'and' is NOT routed boolean (reference Q7 checks ' AND ')
    assert not looks_boolean("cats and dogs")
