"""Context processing + create-term-definition + IRI-expansion conformance.

Table-driven in the shape of the W3C JSON-LD API test suite (expand/context
tests), pinning the reference's observable behavior (SURVEY.md §5.2 item 1).
Fixture contexts mirror FIXTURES.md §2.
"""

import pytest

from json_ld_spark.kernel import (
    Context,
    ErrorCode,
    JsonLdError,
    ProcessorOptions,
    expand_iri,
    process_context,
)

DOC_IRI = "http://example.org/doc"


def make_processor(contexts=None):
    return ProcessorOptions(document_iri=DOC_IRI, context_loader=contexts or {})


def ctx_from(local, processor=None, base=DOC_IRI, active=None):
    processor = processor or make_processor()
    active = active or Context(base=DOC_IRI)
    return process_context(processor, active, local, base)


# ------------------------------------------------------------------ basics

def test_vocab_and_base():
    ctx = ctx_from({"@vocab": "http://ex.org/v#", "@base": "http://ex.org/d/"})
    assert ctx.vocab == "http://ex.org/v#"
    assert ctx.base == "http://ex.org/d/"
    p = make_processor()
    assert expand_iri(p, ctx, "name", vocab=True) == "http://ex.org/v#name"
    assert expand_iri(p, ctx, "x/y", document_relative=True) == "http://ex.org/d/x/y"


def test_simple_term_definition():
    ctx = ctx_from({"name": "http://schema.org/name"})
    assert ctx.term_definition("name").iri == "http://schema.org/name"
    p = make_processor()
    assert expand_iri(p, ctx, "name", vocab=True) == "http://schema.org/name"
    # non-vocab mode does not use term definitions
    assert expand_iri(p, ctx, "name") == "name"


def test_prefix_expansion_and_recursion():
    # compact-IRI prefix recursion (non_reverse.rs:232-254)
    ctx = ctx_from({"schema": "http://schema.org/", "knows": "schema:knows"})
    assert ctx.term_definition("knows").iri == "http://schema.org/knows"
    p = make_processor()
    # simple-term prefix ending in gen-delims is auto-prefix (step 16.6)
    assert ctx.term_definition("schema").is_prefix
    assert expand_iri(p, ctx, "schema:other", vocab=True) == "http://schema.org/other"


def test_absolute_iri_and_blank_node_passthrough():
    p = make_processor()
    ctx = Context(base=DOC_IRI)
    assert expand_iri(p, ctx, "http://ex.org/a", vocab=True) == "http://ex.org/a"
    assert expand_iri(p, ctx, "_:b1", vocab=True) == "_:b1"


def test_keyword_passthrough_and_keyword_form_null():
    p = make_processor()
    ctx = Context()
    assert expand_iri(p, ctx, "@type") == "@type"
    # keyword-form expands to null (src/expand/iri.rs:244-247)
    assert expand_iri(p, ctx, "@madeUpKeyword") is None


def test_null_term_tombstone_blocks_vocab_fallback_t0032():
    # W3C t0032 semantics (src/expand/iri.rs:261-272)
    ctx = ctx_from({"@vocab": "http://ex.org/v#", "hidden": None})
    p = make_processor()
    assert expand_iri(p, ctx, "hidden", vocab=True) is None
    assert expand_iri(p, ctx, "visible", vocab=True) == "http://ex.org/v#visible"


def test_term_alias_to_keyword():
    ctx = ctx_from({"id": "@id", "type": "@type"})
    p = make_processor()
    assert expand_iri(p, ctx, "id", vocab=True) == "@id"
    assert expand_iri(p, ctx, "type") == "@type"  # step 4 applies in any mode


def test_array_of_contexts_merge_order():
    ctx = ctx_from([
        {"name": "http://schema.org/name"},
        {"name": "http://xmlns.com/foaf/0.1/name"},
    ])
    assert ctx.term_definition("name").iri == "http://xmlns.com/foaf/0.1/name"


def test_null_context_resets():
    ctx = ctx_from([{"name": "http://schema.org/name"}, None])
    assert ctx.term_definition("name") is None
    assert not ctx.term_definitions


# ------------------------------------------------------- typed/expanded defs

def test_expanded_term_definition_type_id():
    ctx = ctx_from({
        "schema": "http://schema.org/",
        "knows": {"@id": "schema:knows", "@type": "@id"},
    })
    td = ctx.term_definition("knows")
    assert td.iri == "http://schema.org/knows"
    assert td.ty == "@id"


def test_language_and_direction_on_term():
    ctx = ctx_from({
        "label": {"@id": "http://ex.org/label", "@language": "EN-us",
                  "@direction": "rtl"},
    })
    td = ctx.term_definition("label")
    assert td.language == "EN-us"  # verbatim, not lowercased (R5)
    assert td.direction == "rtl"


def test_container_list_set():
    ctx = ctx_from({
        "tags": {"@id": "http://ex.org/tags", "@container": "@list"},
        "alts": {"@id": "http://ex.org/alts", "@container": ["@set", "@index"]},
    })
    assert ctx.term_definition("tags").container == frozenset({"@list"})
    assert ctx.term_definition("alts").container == frozenset({"@set", "@index"})


def test_container_type_forces_type_mapping():
    ctx = ctx_from({"t": {"@id": "http://ex.org/t", "@container": "@type"}})
    assert ctx.term_definition("t").ty == "@id"


def test_invalid_container_combination():
    with pytest.raises(JsonLdError) as e:
        ctx_from({"x": {"@id": "http://ex.org/x",
                        "@container": ["@list", "@id"]}})
    assert e.value.code == ErrorCode.INVALID_CONTAINER_MAPPING


def test_reverse_term():
    ctx = ctx_from({
        "schema": "http://schema.org/",
        "isKnownBy": {"@reverse": "schema:knows"},
    })
    td = ctx.term_definition("isKnownBy")
    assert td.reverse is True
    assert td.iri == "http://schema.org/knows"


def test_reverse_term_rejects_bad_container():
    with pytest.raises(JsonLdError) as e:
        ctx_from({"r": {"@reverse": "http://ex.org/p", "@container": "@list"}})
    assert e.value.code == ErrorCode.INVALID_REVERSE_PROPERTY


def test_scoped_context():
    ctx = ctx_from({
        "ex": "http://ex.org/",
        "prop": {"@id": "ex:prop", "@context": {"inner": "ex:inner"}},
    })
    scoped = ctx.term_definition("prop").local_context
    assert scoped is not None
    assert scoped.term_definition("inner").iri == "http://ex.org/inner"


# ------------------------------------------------------------- protected

def test_protected_term_redefinition_rejected():
    base = ctx_from({"@protected": True, "name": "http://schema.org/name"})
    with pytest.raises(JsonLdError) as e:
        ctx_from({"name": "http://other.org/name"}, active=base)
    assert e.value.code == ErrorCode.PROTECTED_TERM_REDEFINITION


def test_protected_identical_redefinition_allowed():
    base = ctx_from({"@protected": True, "name": "http://schema.org/name"})
    # identical redefinition (modulo nothing — full equality incl. protected,
    # matching the reference's eq_other_than_protected quirk) passes when the
    # new definition is also protected
    out = ctx_from({"@protected": True, "name": "http://schema.org/name"},
                   active=base)
    assert out.term_definition("name").iri == "http://schema.org/name"


def test_protected_null_context_rejected():
    base = ctx_from({"@protected": True, "name": "http://schema.org/name"})
    with pytest.raises(JsonLdError) as e:
        ctx_from(None, active=base)
    assert e.value.code == ErrorCode.INVALID_CONTEXT_NULLIFICATION


# ------------------------------------------------------------- error cases

def test_cyclic_iri_mapping():
    with pytest.raises(JsonLdError) as e:
        ctx_from({"a": "b:x", "b": "a:y"})
    assert e.value.code == ErrorCode.CYCLIC_IRI_MAPPING


def test_keyword_redefinition():
    with pytest.raises(JsonLdError) as e:
        ctx_from({"@reverse": "http://ex.org/rev"})
    assert e.value.code == ErrorCode.KEYWORD_REDEFINITION


def test_type_redefinition_always_errors_quirk_r9():
    # the reference's step-5 keyword check runs after the @type special case
    # (create_term_def.rs:169-172), so even a shape-valid redefinition errors
    with pytest.raises(JsonLdError) as e:
        ctx_from({"@type": {"@container": "@set"}})
    assert e.value.code == ErrorCode.KEYWORD_REDEFINITION


def test_invalid_version():
    with pytest.raises(JsonLdError) as e:
        ctx_from({"@version": "1.1"})
    assert e.value.code == ErrorCode.INVALID_VERSION_VALUE
    ctx_from({"@version": 1.1})  # numeric 1.1 is fine


def test_invalid_base():
    with pytest.raises(JsonLdError) as e:
        ctx_from({"@base": 42})
    assert e.value.code == ErrorCode.INVALID_BASE_IRI


def test_invalid_vocab():
    with pytest.raises(JsonLdError) as e:
        ctx_from({"@vocab": "not an iri"})
    assert e.value.code == ErrorCode.INVALID_VOCAB_MAPPING


def test_invalid_local_context_type():
    with pytest.raises(JsonLdError) as e:
        ctx_from(42)
    assert e.value.code == ErrorCode.INVALID_LOCAL_CONTEXT


def test_one_char_term_safe_slicing_quirk_r4():
    # the reference panics on 1-char terms at non_reverse.rs:197; we apply
    # spec-intent safe slicing — the term defines cleanly
    ctx = ctx_from({"a": {"@id": "http://ex.org/a"}})
    assert ctx.term_definition("a").iri == "http://ex.org/a"


# ------------------------------------------------------------- remote dict

def test_remote_context_from_dictionary():
    contexts = {
        "https://example.org/ctx/agent": {
            "@context": {"@vocab": "http://ex.org/v#"}
        }
    }
    p = make_processor(contexts)
    ctx = ctx_from("https://example.org/ctx/agent", processor=p)
    assert ctx.vocab == "http://ex.org/v#"


def test_remote_context_miss_fails():
    p = make_processor({})
    with pytest.raises(JsonLdError) as e:
        ctx_from("https://example.org/ctx/missing", processor=p)
    assert e.value.code == ErrorCode.LOADING_REMOTE_CONTEXT_FAILED


def test_remote_context_cycle_detected():
    contexts = {
        "http://ex.org/a": {"@context": "http://ex.org/b"},
        "http://ex.org/b": {"@context": "http://ex.org/a"},
    }
    p = make_processor(contexts)
    with pytest.raises(JsonLdError) as e:
        ctx_from("http://ex.org/a", processor=p)
    assert e.value.code == ErrorCode.CONTEXT_OVERFLOW


def test_import_local_keys_win_quirk_r6():
    contexts = {
        "http://ex.org/imported": {
            "@context": {"a": "http://imported.org/a", "b": "http://imported.org/b"}
        }
    }
    p = make_processor(contexts)
    ctx = ctx_from(
        {"@import": "http://ex.org/imported", "a": "http://local.org/a"},
        processor=p,
    )
    assert ctx.term_definition("a").iri == "http://local.org/a"
    assert ctx.term_definition("b").iri == "http://imported.org/b"


def test_base_ignored_in_remote_context_quirk_r6():
    contexts = {
        "http://ex.org/remote": {
            "@context": {"@base": "http://should-be-ignored.org/"}
        }
    }
    p = make_processor(contexts)
    ctx = ctx_from("http://ex.org/remote", processor=p)
    assert ctx.base == DOC_IRI  # unchanged


# ------------------------------------------------------------- propagate

def test_propagate_lenient_read_quirk_r3():
    # non-boolean @propagate is consumed leniently (merge.rs:139-143); the
    # miswired validation (ctx_def.rs:367 reads @direction) is skipped
    ctx = ctx_from({"@propagate": "yes", "t": "http://ex.org/t"})
    assert ctx.term_definition("t").iri == "http://ex.org/t"
