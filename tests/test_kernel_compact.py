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


# --------------------------------------------------- container-map forms

MAP_CTX = {
    "@context": {
        "ex": "http://ex.org/",
        "label": {"@id": "ex:label", "@container": "@language"},
        "posts": {"@id": "ex:posts", "@container": "@index"},
        "members": {"@id": "ex:members", "@container": "@id"},
    }
}


@pytest.fixture(scope="module")
def map_ctx(cd):
    from json_ld_spark.kernel import Context, process_context

    return process_context(
        cd.processor, Context(base=cd.document_iri),
        MAP_CTX["@context"], cd.document_iri,
    )


def _expand_compact_expand(cd, ctx, body):
    """compact must be lossless: re-expanding the compacted form yields
    the original expanded form (order-insensitive)."""
    import json

    expanded = expand_document(cd.processor, ctx, body)
    compacted = compact_document(ctx, expanded)
    again = expand_document(cd.processor, ctx, compacted)
    canon = lambda e: sorted(  # noqa: E731
        json.dumps(n, sort_keys=True) for n in e
    )
    assert canon(again) == canon(expanded), (compacted, expanded, again)
    return compacted


def test_compact_language_map(cd, map_ctx):
    body = {
        "@id": "http://ex.org/x",
        "label": {"en": "Hello", "de": ["Hallo", "Servus"]},
    }
    out = _expand_compact_expand(cd, map_ctx, body)
    assert out["label"] == {"en": "Hello", "de": ["Hallo", "Servus"]}


def test_compact_index_map(cd, map_ctx):
    body = {
        "@id": "http://ex.org/x",
        "posts": {"2024": "a", "2025": ["b", "c"]},
    }
    out = _expand_compact_expand(cd, map_ctx, body)
    assert out["posts"] == {"2024": "a", "2025": ["b", "c"]}


def test_compact_id_map(cd, map_ctx):
    body = {
        "@id": "http://ex.org/x",
        "members": {
            "http://ex.org/m1": {"ex:name": "A"},
            "http://ex.org/m2": {"ex:name": "B"},
        },
    }
    out = _expand_compact_expand(cd, map_ctx, body)
    # id-map keys compact in document-relative (vocab=false) mode, where
    # our compact_iri leaves absolute IRIs untouched — lossless, and the
    # roundtrip above is the contract
    assert set(out["members"].keys()) == {
        "http://ex.org/m1", "http://ex.org/m2"
    }
    assert all(
        v == {"ex:name": n}
        for v, n in zip(
            (out["members"]["http://ex.org/m1"],
             out["members"]["http://ex.org/m2"]),
            ("A", "B"),
        )
    )


def test_compact_map_fallback_when_lossy(cd, map_ctx):
    """A language-container property whose expanded values carry extra
    members must NOT be forced into map form — fallback to array."""
    from json_ld_spark.kernel.compact import compact_document

    expanded = [{
        "@id": "http://ex.org/x",
        "http://ex.org/label": [
            {"@value": "plain"},
            {"@value": "typed", "@type": "http://ex.org/T"},
        ],
    }]
    out = compact_document(map_ctx, expanded)
    assert isinstance(out["label"], list), out


def test_compact_language_map_rejects_non_string(cd, map_ctx):
    """Regression: a non-string @value can't live in a language map (it
    would fail re-expansion: 'invalid language map value') — must fall
    back to array compaction, roundtrip intact."""
    from json_ld_spark.kernel.compact import compact_document

    expanded = [{
        "@id": "http://ex.org/x",
        "http://ex.org/label": [{"@value": 42}],
    }]
    out = compact_document(map_ctx, expanded)
    assert not isinstance(out.get("label"), dict), out
    from json_ld_spark.kernel import expand_document

    again = expand_document(cd.processor, map_ctx, out)
    assert again[0]["http://ex.org/label"] == [{"@value": 42}]
