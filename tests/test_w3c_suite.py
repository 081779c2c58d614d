"""W3C-style JSON-LD API conformance runner over tests/w3c/manifest.json.

These cases are RECONSTRUCTED from the public spec's normative examples
(WD-json-ld11-api-20191112 — the draft the reference pins on nearly every
function) and well-known test-suite cases (e.g. the t0032 null-term-vocab
rule the reference cites at src/expand/iri.rs:262-264). The sandbox has no
network, so the actual w3c/json-ld-api test files cannot be vendored; this
manifest is the strongest available substitute for binary parity with the
unbuildable reference crate, and the provenance is declared in the manifest
header. Every case either runs or is skipped WITH a reason — no silent
skips.
"""

import json
import os

import pytest

from json_ld_spark.contexts import ContextDict
from json_ld_spark.kernel import (
    Context,
    JsonLdError,
    expand_document,
    flatten_expanded,
    process_context,
)

_MANIFEST = os.path.join(os.path.dirname(__file__), "w3c", "manifest.json")
with open(_MANIFEST) as _fh:
    _CASES = json.load(_fh)["cases"]


@pytest.fixture(scope="module")
def env():
    cd = ContextDict()
    proc = cd.processor
    return proc, cd.document_iri


def _run(proc, document_iri, doc):
    active = Context(base=document_iri)
    if isinstance(doc, list):
        out = []
        for item in doc:
            out.extend(_run(proc, document_iri, item))
        return out
    ctx_value = doc.get("@context")
    if ctx_value is not None:
        active = process_context(proc, active, ctx_value, document_iri)
    body = {k: v for k, v in doc.items() if k != "@context"}
    return expand_document(proc, active, body)


@pytest.mark.parametrize(
    "case", _CASES, ids=[c["id"] for c in _CASES]
)
def test_w3c_case(case, env):
    proc, document_iri = env
    if case.get("skip"):
        pytest.skip(case["skip"])
    if "expectError" in case:
        with pytest.raises(JsonLdError) as exc:
            _run(proc, document_iri, case["input"])
        assert exc.value.code.value == case["expectError"], exc.value
        return
    if case.get("type") == "canon":
        from json_ld_spark.kernel.canonicalize import canonicalize_quads

        got = canonicalize_quads(case["input"])
        assert got == case["expect"], json.dumps(got, indent=1)
        return
    if case.get("type") == "fromRdf":
        from json_ld_spark.kernel import triples_to_expanded

        got = triples_to_expanded(case["input"])
        assert got == case["expect"], json.dumps(got, indent=1)
        return
    expanded = _run(proc, document_iri, case["input"])
    if case.get("type") == "compact":
        from json_ld_spark.kernel import Context as _Context
        from json_ld_spark.kernel import compact_document

        ctx = process_context(
            proc, _Context(base=document_iri),
            case["compactContext"], document_iri,
        )
        got = compact_document(ctx, expanded)
    elif case.get("type") == "flatten":
        got = flatten_expanded(expanded)
    elif case.get("type") == "frame":
        from json_ld_spark.kernel import Context, expand_frame, frame_expanded

        got = frame_expanded(
            expanded,
            expand_frame(proc, Context(base=document_iri), case["frame"]),
        )
    elif case.get("type") == "frameCompact":
        from json_ld_spark.kernel import Context, frame_and_compact

        got = frame_and_compact(
            proc, Context(base=document_iri), expanded, case["frame"]
        )
    else:
        got = expanded
    assert got == case["expect"], json.dumps(got, indent=1)


def test_manifest_has_no_silent_skips():
    for case in _CASES:
        if case.get("skip"):
            assert isinstance(case["skip"], str) and len(case["skip"]) > 10
