"""Kernel compaction unit tests (WD-json-ld11-api §6 subset, SURVEY.md M0).

compact_iri's exact-term/prefix/vocab preference order is already pinned
JVM-vs-kernel in tests/test_functions_iri_ops.py; here the document/value
layers are pinned: expansion→compaction round-trips on the fixture shapes.
"""

import pytest

from json_ld_spark.contexts import ContextDict
from json_ld_spark.kernel import expand_document
from json_ld_spark.kernel.compact import compact_document, compact_value


@pytest.fixture(scope="module")
def cd():
    return ContextDict()


def _roundtrip(cd, ctx_iri, doc_body):
    ctx = cd.compiled(ctx_iri)
    expanded = expand_document(cd.processor, ctx, doc_body)
    return compact_document(ctx, expanded)


def test_compact_value_typed_id(cd):
    ctx = cd.compiled("https://example.org/ctx/prefix")
    td = ctx.term_definitions["knows"]  # @type: @id
    assert compact_value(ctx, td, {"@id": "http://ex.org/p1"}) == "http://ex.org/p1"


def test_compact_value_plain_string(cd):
    ctx = cd.compiled("https://example.org/ctx/prefix")
    td = ctx.term_definitions["name"]
    assert compact_value(ctx, td, {"@value": "Alice"}) == "Alice"


def test_compact_document_prefix_roundtrip(cd):
    doc = {
        "@id": "http://ex.org/person-1",
        "name": "Agent 1",
        "knows": {"@id": "http://ex.org/person-2"},
    }
    out = _roundtrip(cd, "https://example.org/ctx/prefix", doc)
    assert isinstance(out, dict)
    assert out["@id"] == "http://ex.org/person-1"
    # property IRIs compact back to the defined terms
    assert out["name"] == "Agent 1"
    assert out["knows"] == "http://ex.org/person-2"


def test_compact_document_vocab_suffix(cd):
    doc = {"@id": "http://ex.org/d/x", "unmapped": "v"}
    out = _roundtrip(cd, "https://example.org/ctx/base", doc)
    # @vocab-expanded term compacts back to its suffix form
    assert out["unmapped"] == "v"


def test_compact_document_list_container(cd):
    doc = {"@id": "http://ex.org/e1", "tags": ["alpha", "beta"]}
    out = _roundtrip(cd, "https://example.org/ctx/typed", doc)
    tags = out["tags"]
    if isinstance(tags, dict):  # @list object form
        assert tags.get("@list") == ["alpha", "beta"]
    else:
        assert tags == ["alpha", "beta"]


def test_compact_document_preserves_unknown_absolute(cd):
    doc = {"@id": "http://ex.org/p", "http://other.org/prop": "x"}
    out = _roundtrip(cd, "https://example.org/ctx/prefix", doc)
    assert out["http://other.org/prop"] == "x"
