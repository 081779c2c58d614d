"""Flattening (§8) tests: structural contract + the graph-preservation
invariant (triples from flattened == triples from expanded). Spark-free."""

import pytest

from json_ld_spark.contexts import ContextDict
from json_ld_spark.kernel import (
    Context,
    expand_document,
    expanded_to_triples,
    flatten_document,
    flatten_expanded,
    process_context,
)

DOC = {
    "@id": "http://ex.org/a",
    "http://ex.org/name": "A",
    "http://ex.org/knows": {
        "@id": "http://ex.org/b",
        "http://ex.org/name": "B",
        # anonymous nested node → must get a blank-node id when flattened
        "http://ex.org/knows": {"http://ex.org/name": "anon"},
    },
    "http://ex.org/tags": {"@list": ["x", "y"]},
    "http://ex.org/sub": {
        "@graph": [{"@id": "http://ex.org/g1", "http://ex.org/p": 1}]
    },
}


@pytest.fixture(scope="module")
def cd():
    return ContextDict()


@pytest.fixture(scope="module")
def ctx(cd):
    return Context(base=cd.document_iri)


@pytest.fixture(scope="module")
def flat(cd, ctx):
    return flatten_document(cd.processor, ctx, DOC)


def _is_node_ref_only(obj):
    return isinstance(obj, dict) and set(obj) == {"@id"}


def test_all_nodes_top_level_and_referenced(flat):
    ids = [n["@id"] for n in flat]
    assert ids == sorted(ids)  # ordered by id
    assert "http://ex.org/a" in ids
    assert "http://ex.org/b" in ids
    assert any(i.startswith("_:") for i in ids)  # anon node got a label
    # no nested node objects with properties: every property value is a
    # value object, a list object, or a bare {@id} reference
    for node in flat:
        for prop, values in node.items():
            if prop in ("@id", "@type", "@graph"):
                continue
            for v in values:
                assert (
                    "@value" in v or "@list" in v or _is_node_ref_only(v)
                ), (node["@id"], prop, v)


def test_named_graph_nested_under_graph_node(flat):
    graph_nodes = [n for n in flat if "@graph" in n]
    assert len(graph_nodes) == 1
    inner = graph_nodes[0]["@graph"]
    assert [n["@id"] for n in inner] == ["http://ex.org/g1"]


def test_flatten_preserves_triples(cd, ctx):
    """The anchor invariant: flattening reshapes, never changes, the graph."""
    expanded = expand_document(cd.processor, ctx, DOC)
    direct = expanded_to_triples(expanded)
    flattened = flatten_expanded(expanded)
    via_flat = expanded_to_triples(flattened)
    key = lambda t: tuple(
        (k, repr(v)) for k, v in sorted(t.items())
    )  # noqa: E731
    assert sorted(map(key, via_flat)) == sorted(map(key, direct))


def test_flatten_preserves_typed_literal_datatype(cd, ctx):
    """Regression: a value object's @type is a STRING datatype (unlike a
    node object's @type list) and must pass through flattening untouched —
    the node-map relabel step once iterated it char-wise."""
    expanded = [{
        "@id": "http://ex.org/a",
        "http://ex.org/p": [
            {"@value": "5",
             "@type": "http://www.w3.org/2001/XMLSchema#integer"}
        ],
    }]
    flat = flatten_expanded(expanded)
    v = flat[0]["http://ex.org/p"][0]
    assert v == {
        "@value": "5",
        "@type": "http://www.w3.org/2001/XMLSchema#integer",
    }
    key = lambda t: tuple((k, repr(x)) for k, x in sorted(t.items()))  # noqa: E731
    assert sorted(map(key, expanded_to_triples(flat))) == sorted(
        map(key, expanded_to_triples(expanded))
    )


def test_flatten_idempotent(cd, ctx):
    expanded = expand_document(cd.processor, ctx, DOC)
    once = flatten_expanded(expanded)
    twice = flatten_expanded(once)
    assert twice == once


def test_flatten_merges_duplicate_subjects(cd, ctx):
    doc = [
        {"@id": "http://ex.org/x", "http://ex.org/p": "1"},
        {"@id": "http://ex.org/x", "http://ex.org/q": "2",
         "http://ex.org/p": "1"},
    ]
    flat = flatten_document(cd.processor, ctx, doc)
    assert len(flat) == 1
    node = flat[0]
    assert node["@id"] == "http://ex.org/x"
    # duplicate value merged once; both properties present
    assert node["http://ex.org/p"] == [{"@value": "1"}]
    assert node["http://ex.org/q"] == [{"@value": "2"}]


def test_flatten_on_fixture_contexts(cd):
    """Every fixture context's template document flattens with the triple
    invariant intact (broad sweep across the context branches)."""
    docs = [
        {"@context": "https://example.org/ctx/prefix",
         "@id": "http://ex.org/p1", "name": "N",
         "knows": {"@id": "http://ex.org/p2", "name": "M"}},
        {"@context": "https://example.org/ctx/typed",
         "@id": "http://ex.org/e1", "label": "E",
         "ref": {"@id": "http://ex.org/p1"}, "tags": ["a", "b"]},
        {"@context": "https://example.org/ctx/reverse",
         "@id": "http://ex.org/p3",
         "isKnownBy": {"@id": "http://ex.org/p4"}},
    ]
    for doc in docs:
        ctx_val = doc["@context"]
        body = {k: v for k, v in doc.items() if k != "@context"}
        actx = process_context(
            cd.processor, Context(base=cd.document_iri), ctx_val,
            cd.document_iri,
        )
        expanded = expand_document(cd.processor, actx, body)
        key = lambda t: tuple(
            (k, repr(v)) for k, v in sorted(t.items())
        )  # noqa: E731
        assert sorted(
            map(key, expanded_to_triples(flatten_expanded(expanded)))
        ) == sorted(map(key, expanded_to_triples(expanded))), doc
