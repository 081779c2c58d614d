"""IRI / value / document compaction (WD-json-ld11-api-20191112 §6).

The reference implements no compaction (src/remote/profile.rs only names the
``compacted`` profile for content negotiation); this module completes the
expansion→compaction round-trip mandated by BASELINE.json's north_star,
following the same WD the reference cites, reusing the reference-parity
context model.

Implementation is deliberately a pragmatic subset of the full §6.1 algorithm:
term choice prefers (1) an exact-IRI term with compatible type/language
mapping, (2) the longest-prefix compact IRI via a term with ``prefix=true``,
(3) vocab-relative suffix, (4) the absolute IRI. This covers the conformance
shapes our fixtures exercise and is the piece used by the KG pipeline to
produce human-readable predicate labels.
"""

from __future__ import annotations

from typing import Any, Mapping, Optional

from .model import MISSING, Context, TermDefinition, is_keyword


def _inverse_context(ctx: Context) -> dict[str, list[tuple[str, TermDefinition]]]:
    """iri → [(term, definition)] sorted by (term length, term)."""
    inv: dict[str, list[tuple[str, TermDefinition]]] = {}
    for term, td in ctx.term_definitions.items():
        if td is None or td.reverse:
            continue
        inv.setdefault(td.iri, []).append((term, td))
    for lst in inv.values():
        lst.sort(key=lambda p: (len(p[0]), p[0]))
    return inv


def compact_iri(
    ctx: Context,
    iri: Optional[str],
    *,
    value: Optional[Mapping[str, Any]] = None,
    vocab: bool = False,
    inverse: Optional[dict] = None,
) -> Optional[str]:
    """Compact an IRI against the context (§6.3, simplified)."""
    if iri is None:
        return None
    if is_keyword(iri):
        return iri
    if inverse is None:
        inverse = _inverse_context(ctx)
    if vocab:
        # 1. exact term match with compatible coercion
        for term, td in inverse.get(iri, []):
            if _coercion_compatible(td, value, ctx):
                return term
        # 2. compact IRI via longest declared prefix
        best: Optional[str] = None
        for term, td in sorted(
            ctx.term_definitions.items(), key=lambda p: (-len(p[1].iri), p[0])
            if p[1] is not None else (0, p[0]),
        ):
            if td is None or not td.is_prefix:
                continue
            ns = td.iri
            if iri.startswith(ns) and len(iri) > len(ns):
                candidate = f"{term}:{iri[len(ns):]}"
                # a candidate that collides with a defined term is unusable
                if candidate not in ctx.term_definitions:
                    best = candidate
                    break
        if best is not None:
            return best
        # 3. vocab-relative
        if ctx.vocab is not None and iri.startswith(ctx.vocab) and len(iri) > len(ctx.vocab):
            suffix = iri[len(ctx.vocab):]
            if suffix not in ctx.term_definitions:
                return suffix
    # 4. fall back to the absolute IRI (document-relative compaction of
    # non-vocab IRIs keeps absolute form for lossless round-trips)
    return iri


def _coercion_compatible(
    td: TermDefinition, value: Optional[Mapping[str, Any]], ctx: Context
) -> bool:
    if value is None:
        return td.ty is None and td.language is MISSING and not td.container
    if "@list" in value:
        return td.container_contains("@list")
    if td.container_contains("@list"):
        return False
    # container-map terms absorb the member the map key captures: a
    # @language container matches any language-tagged (or plain) string
    # value, an @index container any indexed value, an @id container any
    # node reference — the map form re-adds the key on expansion
    if td.container and td.container_contains("@language"):
        return (
            "@value" in value
            and set(value) <= {"@value", "@language"}
            and isinstance(value["@value"], str)
        )
    if td.container and td.container_contains("@index"):
        return "@index" in value
    if "@id" in value and len(set(value.keys()) - {"@id", "@index"}) == 0:
        return td.ty in ("@id", "@vocab")
    ty = value.get("@type")
    lang = value.get("@language")
    if ty is not None:
        return td.ty == ty
    if lang is not None:
        return td.language == lang or (
            td.language is MISSING and ctx.default_language == lang
        )
    return td.ty is None and (td.language is MISSING or td.language is None)


def compact_value(
    ctx: Context, td: Optional[TermDefinition], value: Mapping[str, Any],
    inverse: Optional[dict] = None,
) -> Any:
    """Compact a value object to a scalar when lossless (§6.2, simplified)."""
    keys = set(value.keys()) - {"@index"}
    if "@id" in value and keys == {"@id"}:
        compacted_ref = compact_iri(ctx, value["@id"], vocab=(td is not None and td.ty == "@vocab"), inverse=inverse)
        if td is not None and td.ty in ("@id", "@vocab"):
            return compacted_ref
        return {"@id": compacted_ref}
    if "@value" not in value:
        return dict(value)
    v = value["@value"]
    ty = value.get("@type")
    lang = value.get("@language")
    if td is not None and ty is not None and td.ty == ty:
        return v
    if td is not None and lang is not None and td.language == lang:
        return v
    if ty is None and lang is None and (
        td is None or (td.ty is None and td.language is MISSING)
    ):
        if not isinstance(v, str) or ctx.default_language is None:
            return v
    if ty is None and lang is not None and lang == ctx.default_language and (
        td is None or td.language is MISSING
    ):
        return v
    out: dict[str, Any] = {"@value": v}
    if ty is not None:
        out["@type"] = compact_iri(ctx, ty, vocab=True, inverse=inverse)
    if lang is not None:
        out["@language"] = lang
    if "@direction" in value:
        out["@direction"] = value["@direction"]
    return out


def compact_document(ctx: Context, expanded: Any) -> Any:
    """Compact expanded JSON-LD output against ``ctx`` (§6.1, simplified)."""
    inverse = _inverse_context(ctx)
    return _compact(ctx, None, expanded, inverse)


def _compact(ctx: Context, active_property: Optional[str], element: Any, inverse) -> Any:
    if isinstance(element, list):
        out = [_compact(ctx, active_property, item, inverse) for item in element]
        td_ap = _td(ctx, active_property) if active_property else None
        # a list-container term's expanded value is [{"@list": [...]}]; the
        # @list branch below unwraps the inner array, so collapse the
        # now-redundant outer singleton too (§6.1 step for list containers)
        if (
            td_ap is not None
            and td_ap.container_contains("@list")
            and len(out) == 1
            and isinstance(out[0], list)
        ):
            return out[0]
        if len(out) == 1 and (td_ap is None or not td_ap.container):
            return out[0]
        return out
    if not isinstance(element, Mapping):
        return element
    td = _td(ctx, active_property) if active_property else None
    if "@value" in element or (
        "@id" in element and set(element.keys()) <= {"@id", "@index"}
    ):
        return compact_value(ctx, td, element, inverse=inverse)
    result: dict[str, Any] = {}
    for key in sorted(element.keys()):
        value = element[key]
        if key == "@id":
            result["@id"] = compact_iri(ctx, value, inverse=inverse)
        elif key == "@type":
            types = [compact_iri(ctx, t, vocab=True, inverse=inverse) for t in value]
            result["@type"] = types[0] if len(types) == 1 else types
        elif key == "@list":
            lst = [_compact(ctx, active_property, v, inverse) for v in value]
            if td is not None and td.container_contains("@list"):
                return lst
            result["@list"] = lst
        elif key == "@reverse":
            rev = {}
            for p, items in value.items():
                cp = compact_iri(ctx, p, vocab=True, inverse=inverse)
                rev[cp] = _compact(ctx, cp, items, inverse)
            result["@reverse"] = rev
        elif key == "@graph":
            result["@graph"] = [
                _compact(ctx, None, v, inverse) for v in value
            ]
        elif key.startswith("@"):
            result[key] = value
        else:
            sample = value[0] if isinstance(value, list) and value else None
            cp = compact_iri(
                ctx, key, vocab=True, inverse=inverse,
                value=sample if isinstance(sample, Mapping) else None,
            )
            td_p = _td(ctx, cp)
            if (
                td_p is not None
                and td_p.container
                and td_p.container & frozenset(("@language", "@index", "@id"))
                and isinstance(value, list)
            ):
                mapped = _compact_container_map(ctx, cp, td_p, value, inverse)
                if mapped is not None:
                    result[cp] = mapped
                    continue
            result[cp] = _compact(ctx, cp, value, inverse)
    return result


def _compact_container_map(
    ctx: Context, term: str, td: TermDefinition, values: list, inverse
) -> Optional[dict]:
    """§6.1 container-map compaction for @language / @index / @id
    containers: the expanded array reshapes into a map keyed by language
    tag / index / compacted id (missing key → "@none"). Returns None when
    any item doesn't fit the map shape losslessly — the caller then falls
    back to plain array compaction, so this is always semantics-preserving
    (expansion of the map form reproduces the original expanded array;
    pinned by the roundtrip tests)."""
    out: dict[str, list] = {}
    for item in values:
        if not isinstance(item, Mapping):
            return None
        if td.container_contains("@language"):
            # language-map values must be strings (a non-string would fail
            # re-expansion: 'invalid language map value') — fall back
            if (
                "@value" not in item
                or not set(item) <= {"@value", "@language"}
                or not isinstance(item["@value"], str)
            ):
                return None
            key = item.get("@language", "@none")
            v: Any = item["@value"]
        elif td.container_contains("@index"):
            if "@value" in item and "@index" not in item:
                return None  # would lose the no-index distinction
            key = item.get("@index", "@none")
            rest = {k: x for k, x in item.items() if k != "@index"}
            v = _compact(ctx, term, rest, inverse)
        else:  # @id container
            if "@value" in item or "@id" not in item:
                return None
            key = compact_iri(ctx, item["@id"], inverse=inverse)
            rest = {k: x for k, x in item.items() if k != "@id"}
            if not rest:
                return None  # bare reference: the array form is shorter
            v = _compact(ctx, term, rest, inverse)
        out.setdefault(key, []).append(v)
    return {k: (vs[0] if len(vs) == 1 else vs) for k, vs in out.items()}


def _td(ctx: Context, term: Optional[str]) -> Optional[TermDefinition]:
    return ctx.term_definition(term) if term else None
