"""Serialize RDF as JSON-LD (WD-json-ld11-api-20191112 §8.6 subset) —
the inverse of ``expanded_to_triples``.

Rebuilds flattened expanded JSON-LD from the pipeline's triple rows:
literals back to value objects (``useNativeTypes=false`` semantics: the
lexical form stays a string, the datatype stays explicit, ``@json``
literals parse back to native JSON), ``rdf:first``/``rdf:rest`` chains
back to ``@list`` objects (well-formed, singly-referenced chains only —
the spec's condition), named graphs back under their graph node's
``@graph``.

With toRdf (``expanded_to_triples`` + ``functions/nquads.py``) this
closes the serialization loop; the roundtrip invariant
``triples → from_rdf → expanded_to_triples ≅ triples`` (blank labels
canonicalized) is pinned by tests/test_kernel_from_rdf.py.
"""

from __future__ import annotations

import json
from collections import defaultdict
from typing import Any, Optional

from .expand_doc import RDF_FIRST, RDF_JSON, RDF_NIL, RDF_REST, RDF_TYPE, XSD_STRING


def _object_repr(t: dict) -> dict:
    if t["obj_kind"] in ("iri", "bnode"):
        return {"@id": t["obj_value"]}
    ty = t["obj_type"]
    if t["obj_lang"] is not None:
        obj: dict[str, Any] = {
            "@value": t["obj_value"], "@language": t["obj_lang"],
        }
        if t["obj_direction"] is not None:
            obj["@direction"] = t["obj_direction"]
        return obj
    if ty == RDF_JSON:
        return {"@value": json.loads(t["obj_value"]), "@type": "@json"}
    if ty is None or ty == XSD_STRING:
        obj = {"@value": t["obj_value"]}
        if t["obj_direction"] is not None:
            obj["@direction"] = t["obj_direction"]
        return obj
    return {"@value": t["obj_value"], "@type": ty}


def triples_to_expanded(triples: list[dict]) -> list[dict[str, Any]]:
    """Triple rows → flattened expanded JSON-LD (§8.6, useNativeTypes
    off). Quarantine rows (``error_code`` set) must be filtered upstream.
    """
    # ---- per-graph node maps -------------------------------------------
    graphs: dict[Optional[str], dict[str, dict]] = defaultdict(dict)
    ref_count: dict[tuple, int] = defaultdict(int)  # (graph, bnode) usages
    for t in triples:
        g = t["graph"]
        node = graphs[g].setdefault(t["subj"], {"@id": t["subj"]})
        if t["pred"] == RDF_TYPE and t["obj_kind"] in ("iri", "bnode"):
            types = node.setdefault("@type", [])
            if t["obj_value"] not in types:
                types.append(t["obj_value"])
            continue
        obj = _object_repr(t)
        node.setdefault(t["pred"], []).append(obj)
        if t["obj_kind"] == "bnode":
            ref_count[(g, t["obj_value"])] += 1

    # ---- list reconstruction (spec: well-formed chains referenced once) --
    for g, nodes in graphs.items():
        def is_chain_node(label: str) -> bool:
            n = nodes.get(label)
            if n is None:
                return False
            keys = set(n) - {"@id"}
            if keys != {RDF_FIRST, RDF_REST}:
                return False
            return (
                len(n[RDF_FIRST]) == 1
                and len(n[RDF_REST]) == 1
                and ref_count[(g, label)] == 1
            )

        def chain_items(label: str):
            """Items of the chain starting at label, or None if malformed."""
            items, seen = [], set()
            while label != RDF_NIL:
                if label in seen or not is_chain_node(label):
                    return None
                seen.add(label)
                n = nodes[label]
                items.append(n[RDF_FIRST][0])
                rest = n[RDF_REST][0]
                if "@id" not in rest:
                    return None
                label = rest["@id"]
            return items

        consumed: set[str] = set()
        for node in list(nodes.values()):
            for prop, values in node.items():
                if prop in ("@id", "@type") or prop in (RDF_FIRST, RDF_REST):
                    continue
                for i, v in enumerate(values):
                    head = v.get("@id") if isinstance(v, dict) else None
                    if head is None or not head.startswith("_:"):
                        if head == RDF_NIL:
                            values[i] = {"@list": []}
                        continue
                    items = chain_items(head)
                    if items is None:
                        continue
                    values[i] = {"@list": items}
                    label = head
                    while label != RDF_NIL:
                        consumed.add(label)
                        label = nodes[label][RDF_REST][0]["@id"]
        for label in consumed:
            nodes.pop(label, None)

    # ---- assemble flattened output -------------------------------------
    default = graphs.get(None, {})
    for g in sorted(k for k in graphs if k is not None):
        entry = default.setdefault(g, {"@id": g})
        entry["@graph"] = [n for _, n in sorted(graphs[g].items())]
    return [n for _, n in sorted(default.items())]


def canonical_triples(triples):
    """Blank labels → canonical ids by first appearance in the
    label-masked sort order; returns a sorted list of key/value tuple
    rows. Two triple sets are equal *as RDF graphs* (modulo blank-node
    relabeling) iff their canonical forms are equal — the comparator
    behind the fromRdf→toRdf roundtrip invariant.
    """
    masked = []
    for t in triples:
        row = tuple(
            ("_:?" if isinstance(v, str) and v.startswith("_:") else v)
            if k in ("subj", "obj_value", "graph") else v
            for k, v in sorted(t.items())
        )
        masked.append((row, t))
    masked.sort(key=lambda p: tuple(repr(x) for x in p[0]))
    mapping = {}

    def canon(v):
        if isinstance(v, str) and v.startswith("_:"):
            if v not in mapping:
                mapping[v] = f"_:c{len(mapping)}"
            return mapping[v]
        return v

    out = []
    for _, t in masked:
        out.append(tuple((k, canon(v)) for k, v in sorted(t.items())))
    return sorted(out, key=repr)
