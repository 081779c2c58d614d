"""Framing (§9 subset, kernel/frame.py) tests: matching, embedding
policies, explicit/default, errors. Spark-free."""

import pytest

from json_ld_spark.contexts import ContextDict
from json_ld_spark.kernel import (
    Context,
    ErrorCode,
    JsonLdError,
    ProcessorOptions,
    expand_document,
    frame_document,
    frame_expanded,
)

DOC = {
    "@id": "http://ex.org/a",
    "@type": "http://ex.org/Person",
    "http://ex.org/name": "A",
    "http://ex.org/knows": {
        "@id": "http://ex.org/b",
        "@type": "http://ex.org/Person",
        "http://ex.org/name": "B",
        "http://ex.org/knows": {"@id": "http://ex.org/a"},
    },
    "http://ex.org/attends": {
        "@id": "http://ex.org/e1",
        "@type": "http://ex.org/Event",
        "http://ex.org/label": "kickoff",
    },
}


@pytest.fixture(scope="module")
def env():
    cd = ContextDict()
    proc = ProcessorOptions(
        document_iri=cd.document_iri, context_loader=dict(cd.raw)
    )
    ctx = Context(base=cd.document_iri)
    return proc, ctx


@pytest.fixture(scope="module")
def expanded(env):
    proc, ctx = env
    return expand_document(proc, ctx, DOC)


def _ids(framed):
    return [n["@id"] for n in framed]


def test_type_match_and_embed_once(expanded):
    framed = frame_expanded(expanded, {"@type": ["http://ex.org/Person"]})
    assert _ids(framed) == ["http://ex.org/a", "http://ex.org/b"]
    a = framed[0]
    # b embedded under a (first occurrence)
    b = a["http://ex.org/knows"][0]
    assert b["@id"] == "http://ex.org/b"
    assert "http://ex.org/name" in b
    # the cycle back to a is a bare reference
    assert b["http://ex.org/knows"] == [{"@id": "http://ex.org/a"}]
    # event embedded too (default frame embeds everything reachable)
    assert a["http://ex.org/attends"][0]["@type"] == ["http://ex.org/Event"]


def test_type_wildcard_and_match_none(expanded):
    assert len(frame_expanded(expanded, {"@type": [{}]})) == 3  # any typed
    assert frame_expanded(expanded, {"@type": []}) == []  # only untyped


def test_id_match(expanded):
    framed = frame_expanded(expanded, {"@id": ["http://ex.org/e1"]})
    assert _ids(framed) == ["http://ex.org/e1"]


def test_property_match_requireall(expanded):
    # any-of: name OR label → all three nodes
    frame = {"http://ex.org/name": [{}], "http://ex.org/label": [{}]}
    assert len(frame_expanded(expanded, frame)) == 3
    # require-all: name AND label → nobody
    frame_all = dict(frame, **{"@requireAll": True})
    assert frame_expanded(expanded, frame_all) == []


def test_property_match_absent(expanded):
    # [] = match nodes WITHOUT the property
    framed = frame_expanded(expanded, {"http://ex.org/name": []})
    assert _ids(framed) == ["http://ex.org/e1"]


def test_embed_never(expanded):
    framed = frame_expanded(
        expanded,
        {"@type": ["http://ex.org/Person"], "@embed": "@never"},
    )
    a = framed[0]
    assert a["http://ex.org/knows"] == [{"@id": "http://ex.org/b"}]
    assert a["http://ex.org/attends"] == [{"@id": "http://ex.org/e1"}]


def test_embed_always_rembeds_previous(expanded):
    framed = frame_expanded(
        expanded,
        {"@id": ["http://ex.org/a"], "@embed": "@always"},
    )
    b = framed[0]["http://ex.org/knows"][0]
    assert "http://ex.org/name" in b  # embedded, not a ref
    # cycle still cut by the path guard
    assert b["http://ex.org/knows"] == [{"@id": "http://ex.org/a"}]


def test_explicit_and_default(expanded):
    framed = frame_expanded(
        expanded,
        {
            "@id": ["http://ex.org/a"],
            "@explicit": True,
            "http://ex.org/name": [{}],
            "http://ex.org/age": [{"@default": 33}],
        },
    )
    a = framed[0]
    assert set(p for p in a if not p.startswith("@")) == {
        "http://ex.org/name", "http://ex.org/age"
    }
    assert a["http://ex.org/age"] == [{"@value": 33}]


def test_invalid_embed_value(expanded):
    with pytest.raises(JsonLdError) as e:
        frame_expanded(expanded, {"@embed": "@sometimes"})
    assert e.value.code == ErrorCode.INVALID_EMBED_VALUE


def test_invalid_frame(expanded):
    with pytest.raises(JsonLdError) as e:
        frame_expanded(expanded, "not-a-frame")
    assert e.value.code == ErrorCode.INVALID_FRAME


def test_frame_document_with_context(env):
    """End-to-end frame() over a fixture-context document: the frame's own
    @context expands its terms."""
    proc, ctx = env
    doc = {
        "@context": "https://example.org/ctx/prefix",
        "@id": "http://ex.org/person-1",
        "name": "Agent 1",
        "knows": {"@id": "http://ex.org/person-2"},
    }
    from json_ld_spark.kernel import process_context

    active = process_context(proc, ctx, doc["@context"], proc.document_iri)
    body = {k: v for k, v in doc.items() if k != "@context"}
    framed = frame_document(
        proc, active, body,
        {"@context": "https://example.org/ctx/prefix", "name": {}},
        frame_ctx=ctx,
    )
    assert _ids(framed) == ["http://ex.org/person-1"]
    assert framed[0]["http://schema.org/name"] == [{"@value": "Agent 1"}]


def test_subframe_explicit_scopes_embedded_node(expanded):
    """A per-property subframe controls the embedded node's shape."""
    framed = frame_expanded(
        expanded,
        {
            "@id": ["http://ex.org/a"],
            "http://ex.org/knows": [
                {"@explicit": True, "http://ex.org/name": [{}]}
            ],
        },
    )
    b = framed[0]["http://ex.org/knows"][0]
    assert "http://ex.org/name" in b
    assert "http://ex.org/knows" not in b  # explicit subframe pruned it


def test_omit_default_false_emits_null_markers(expanded):
    """Spec §3.1: with @omitDefault false, a frame property the node lacks
    (and no @default) yields the ["@null"] marker; @default still wins;
    match-absent ([]) patterns never emit markers."""
    framed = frame_expanded(
        expanded,
        {
            "@id": ["http://ex.org/e1"],
            "@omitDefault": False,
            "http://ex.org/label": [{}],
            "http://ex.org/missing": [{}],
            "http://ex.org/aged": [{"@default": 7}],
            "http://ex.org/name": [],
        },
    )
    e1 = framed[0]
    assert e1["http://ex.org/label"] == [{"@value": "kickoff"}]
    assert e1["http://ex.org/missing"] == ["@null"]
    assert e1["http://ex.org/aged"] == [{"@value": 7}]
    assert "http://ex.org/name" not in e1  # [] = match-absent, no marker


def test_omit_default_inherited_and_overridable(expanded):
    framed = frame_expanded(
        expanded,
        {
            "@id": ["http://ex.org/a"],
            "@omitDefault": False,
            "http://ex.org/knows": [
                {"@omitDefault": True, "http://ex.org/missing": [{}]}
            ],
            "http://ex.org/gone": [{}],
        },
    )
    a = framed[0]
    assert a["http://ex.org/gone"] == ["@null"]  # root: markers on
    b = a["http://ex.org/knows"][0]
    assert "http://ex.org/missing" not in b  # subframe overrode to omit


def test_omit_default_spec_default_is_false(expanded):
    """Spec default (@omitDefault: false) WITHOUT saying so in the frame:
    an @id-matched node lacking a wildcard frame property gets the
    ["@null"] marker — the r4 deviation (defaulting to true) is gone."""
    framed = frame_expanded(
        expanded,
        {
            "@id": ["http://ex.org/e1"],
            "http://ex.org/label": [{}],
            "http://ex.org/missing": [{}],
        },
    )
    assert framed[0]["http://ex.org/missing"] == ["@null"]


def test_frame_and_compact_null_cleanup(env):
    """Framing §4.1 steps 19/21: frame_and_compact compacts framed output
    against the frame's own @context and turns "@null" markers into JSON
    null — the cleanup pass that makes the spec default usable."""
    from json_ld_spark.kernel import frame_and_compact

    proc, ctx = env
    frame = {
        "@context": {
            "name": "http://ex.org/name",
            "missing": "http://ex.org/missing",
            "Person": "http://ex.org/Person",
        },
        "@type": "Person",
        "name": {},
        "missing": {},
    }
    roots = frame_and_compact(proc, ctx, DOC, frame)
    assert {r["@id"] for r in roots} == {"http://ex.org/a", "http://ex.org/b"}
    for r in roots:
        assert r["missing"] is None  # marker → null, array collapsed
        assert r["name"] in ("A", "B")  # compacted term, not the IRI
    # mixed array keeps real values and drops only the markers
    assert frame_and_compact(
        proc, ctx, DOC, {"@type": "http://ex.org/Event"}
    )[0]["@id"] == "http://ex.org/e1"


def test_empty_frame_never_embed_reproduces_flatten_shape(expanded):
    """Invariant: frame {} with @embed @never returns every node with its
    flattened properties and bare references — the flatten node map
    re-expressed (framing adds nothing, removes nothing)."""
    from json_ld_spark.kernel import flatten_expanded

    framed = frame_expanded(expanded, {"@embed": "@never"})
    flat = flatten_expanded(expanded)
    assert {n["@id"] for n in framed} == {n["@id"] for n in flat}
    by_id = {n["@id"]: n for n in flat}
    for node in framed:
        src = by_id[node["@id"]]
        assert set(node) == set(src)
        for prop, vals in node.items():
            if prop == "@id":
                continue
            assert vals == src[prop], prop


# ------------------------------------------- named graphs (Framing §3.1)

GRAPH_DOC = [
    {
        "@id": "http://ex.org/g1",
        "http://ex.org/label": [{"@value": "graph one"}],
        "@graph": [
            {
                "@id": "http://ex.org/n1",
                "@type": ["http://ex.org/Person"],
                "http://ex.org/name": [{"@value": "In G1"}],
            },
            {
                "@id": "http://ex.org/n2",
                "@type": ["http://ex.org/Event"],
                "http://ex.org/name": [{"@value": "Ev G1"}],
            },
        ],
    },
    {
        "@id": "http://ex.org/top",
        "http://ex.org/name": [{"@value": "default-graph node"}],
    },
]


def test_frame_named_graph_recursion(env):
    frame = {
        "@id": ["http://ex.org/g1"],
        "@graph": [{"@type": ["http://ex.org/Person"]}],
    }
    out = frame_expanded(GRAPH_DOC, frame)
    assert len(out) == 1
    g = out[0]
    assert g["@id"] == "http://ex.org/g1"
    # the graph node keeps its own default-graph properties
    assert g["http://ex.org/label"] == [{"@value": "graph one"}]
    # and @graph holds only the nodes matching the subframe
    assert [n["@id"] for n in g["@graph"]] == ["http://ex.org/n1"]
    assert g["@graph"][0]["http://ex.org/name"] == [{"@value": "In G1"}]


def test_frame_named_graph_wildcard_includes_all(env):
    frame = {"@id": ["http://ex.org/g1"], "@graph": [{}]}
    out = frame_expanded(GRAPH_DOC, frame)
    assert [n["@id"] for n in out[0]["@graph"]] == [
        "http://ex.org/n1", "http://ex.org/n2"
    ]


def test_frame_named_graph_idonly_graph_name(env):
    """A graph name with no default-graph properties is an id-only
    placeholder, but a frame asking for its @graph must still match it."""
    doc = [{
        "@id": "http://ex.org/g2",
        "@graph": [{
            "@id": "http://ex.org/m",
            "http://ex.org/name": [{"@value": "x"}],
        }],
    }]
    frame = {"@id": ["http://ex.org/g2"], "@graph": [{}]}
    out = frame_expanded(doc, frame)
    assert len(out) == 1
    assert [n["@id"] for n in out[0]["@graph"]] == ["http://ex.org/m"]


def test_frame_without_graph_entry_stays_default_graph(env):
    """No @graph in the frame → named-graph content is NOT pulled in; the
    graph name matches on its default-graph properties only."""
    frame = {"@id": ["http://ex.org/g1"]}
    out = frame_expanded(GRAPH_DOC, frame)
    assert "@graph" not in out[0]
    assert "http://ex.org/label" in out[0]


# ------------------------------------------- value patterns (Framing §2.3)

VAL_DOC = [
    {
        "@id": "http://ex.org/v1",
        "http://ex.org/label": [
            {"@value": "Hallo", "@language": "de"},
            {"@value": "Hello", "@language": "en"},
            {"@value": "plain"},
        ],
    },
    {
        "@id": "http://ex.org/v2",
        "http://ex.org/label": [
            {"@value": "42", "@type": "http://www.w3.org/2001/XMLSchema#integer"},
        ],
    },
]


def test_frame_value_pattern_filters_by_language(env):
    # @value {} wildcard + exact language list
    frame = {
        "http://ex.org/label": [{"@value": [{}], "@language": ["de"]}],
    }
    out = frame_expanded(VAL_DOC, frame)
    # v1 matches (has a de value) and keeps ONLY the matching value
    ids = {n["@id"]: n for n in out}
    assert ids["http://ex.org/v1"]["http://ex.org/label"] == [
        {"@value": "Hallo", "@language": "de"}
    ]
    # v2 has no de value: property pattern fails; with a single-property
    # frame nothing matches → node absent
    assert "http://ex.org/v2" not in ids


def test_frame_value_pattern_by_type(env):
    frame = {
        "http://ex.org/label": [{
            "@value": [{}],
            "@type": ["http://www.w3.org/2001/XMLSchema#integer"],
        }],
    }
    out = frame_expanded(VAL_DOC, frame)
    ids = {n["@id"]: n for n in out}
    assert "http://ex.org/v2" in ids
    assert "http://ex.org/v1" not in ids


def test_frame_value_pattern_exact_value(env):
    frame = {"http://ex.org/label": [{"@value": ["plain"]}]}
    out = frame_expanded(VAL_DOC, frame)
    ids = {n["@id"]: n for n in out}
    assert ids["http://ex.org/v1"]["http://ex.org/label"] == [
        {"@value": "plain"}
    ]


def test_frame_unsupported_keyword_raises(env):
    proc, ctx = env
    from json_ld_spark.kernel import expand_frame

    with pytest.raises(JsonLdError) as exc:
        expand_frame(proc, ctx, {"http://ex.org/p": {"@list": [{}]}})
    assert exc.value.code == ErrorCode.INVALID_FRAME
