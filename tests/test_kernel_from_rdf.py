"""fromRdf (§8.6) tests: the serialization loop closes.

triples → triples_to_expanded → expanded_to_triples must reproduce the
original triple multiset up to a consistent blank-node relabeling (blank
labels are canonicalized by first appearance in the label-masked sorted
triple list before comparison)."""

import pytest

from json_ld_spark.contexts import ContextDict
from json_ld_spark.kernel import (
    Context,
    expand_document,
    expanded_to_triples,
    process_context,
    triples_to_expanded,
)

DOCS = [
    # plain node graph with typed/lang literals
    {
        "@id": "http://ex.org/a",
        "@type": "http://ex.org/T",
        "http://ex.org/name": {"@value": "A", "@language": "en"},
        "http://ex.org/n": 42,
        "http://ex.org/knows": {"@id": "http://ex.org/b"},
    },
    # lists (incl. empty) and anonymous nodes
    {
        "@id": "http://ex.org/l",
        "http://ex.org/tags": {"@list": ["x", "y", "z"]},
        "http://ex.org/none": {"@list": []},
        "http://ex.org/anon": {"http://ex.org/p": "inner"},
    },
    # named graph
    {
        "@id": "http://ex.org/g",
        "http://ex.org/sub": {
            "@graph": [{"@id": "http://ex.org/gn", "http://ex.org/p": 1}]
        },
    },
]


from json_ld_spark.kernel.from_rdf import canonical_triples as _canonical


@pytest.fixture(scope="module")
def cd():
    return ContextDict()


@pytest.mark.parametrize("doc", DOCS, ids=["literals", "lists", "graph"])
def test_roundtrip_triples_fromrdf_totriples(cd, doc):
    ctx = Context(base=cd.document_iri)
    expanded = expand_document(cd.processor, ctx, doc)
    original = expanded_to_triples(expanded)
    rebuilt = triples_to_expanded(
        [dict(t) for t in original]
    )
    again = expanded_to_triples(rebuilt)
    assert _canonical(again) == _canonical(original)


def test_fromrdf_reconstructs_lists(cd):
    ctx = Context(base=cd.document_iri)
    doc = {"@id": "http://ex.org/l",
           "http://ex.org/tags": {"@list": ["x", "y"]}}
    triples = expanded_to_triples(expand_document(cd.processor, ctx, doc))
    rebuilt = triples_to_expanded(triples)
    node = [n for n in rebuilt if n["@id"] == "http://ex.org/l"][0]
    vals = node["http://ex.org/tags"]
    assert len(vals) == 1 and "@list" in vals[0]
    assert [v["@value"] for v in vals[0]["@list"]] == ["x", "y"]
    # chain bnodes consumed — no rdf:first leftovers at top level
    assert not any(
        "http://www.w3.org/1999/02/22-rdf-syntax-ns#first" in n
        for n in rebuilt
    )


def test_fromrdf_named_graph_and_value_objects(cd):
    ctx = Context(base=cd.document_iri)
    doc = DOCS[2]
    triples = expanded_to_triples(expand_document(cd.processor, ctx, doc))
    rebuilt = triples_to_expanded(triples)
    g = [n for n in rebuilt if "@graph" in n]
    assert len(g) == 1
    inner = g[0]["@graph"][0]
    assert inner["@id"] == "http://ex.org/gn"
    v = inner["http://ex.org/p"][0]
    # useNativeTypes=false: lexical string + explicit datatype
    assert v == {
        "@value": "1",
        "@type": "http://www.w3.org/2001/XMLSchema#integer",
    }


def test_fromrdf_shared_list_not_collapsed(cd):
    """A chain referenced twice is NOT a well-formed list per spec — it
    must stay as rdf:first/rest nodes."""
    triples = [
        {"subj": "http://ex.org/a", "pred": "http://ex.org/p",
         "obj_kind": "bnode", "obj_value": "_:b0", "obj_type": None,
         "obj_lang": None, "obj_direction": None, "graph": None},
        {"subj": "http://ex.org/b", "pred": "http://ex.org/p",
         "obj_kind": "bnode", "obj_value": "_:b0", "obj_type": None,
         "obj_lang": None, "obj_direction": None, "graph": None},
        {"subj": "_:b0",
         "pred": "http://www.w3.org/1999/02/22-rdf-syntax-ns#first",
         "obj_kind": "literal", "obj_value": "x",
         "obj_type": "http://www.w3.org/2001/XMLSchema#string",
         "obj_lang": None, "obj_direction": None, "graph": None},
        {"subj": "_:b0",
         "pred": "http://www.w3.org/1999/02/22-rdf-syntax-ns#rest",
         "obj_kind": "iri",
         "obj_value": "http://www.w3.org/1999/02/22-rdf-syntax-ns#nil",
         "obj_type": None, "obj_lang": None, "obj_direction": None,
         "graph": None},
    ]
    rebuilt = triples_to_expanded(triples)
    ids = {n["@id"] for n in rebuilt}
    assert "_:b0" in ids  # chain survives as a node
    for n in rebuilt:
        for prop, vals in n.items():
            if prop == "@id":
                continue
            assert all("@list" not in v for v in vals)
