"""Flattening (WD-json-ld11-api-20191112 §8): node-map generation +
flattened output.

The reference implements none of the document algorithms (its
``src/expand.rs`` is a 5-line stub exporting only ``iri``); this module
completes the JsonLdProcessor trio (expand / compact / flatten) from the
same WD the reference cites on every function, reusing the expansion
kernel (expand_doc.py) and its deterministic blank-node allocator so
flatten output is stable across runs.

Covers every shape our expansion kernel emits, including ``@reverse``
maps (reverse edges become forward edges on the referenced node, §8.2
step 6.9 — the referenced-node-as-subject trick is implemented as an
explicit ``reverse_of`` parameter) and ``@included`` blocks (merged into
the active graph, step 6.8).

Invariant pinned by tests/test_kernel_flatten.py: the triples emitted
from the flattened document equal the triples emitted from the expanded
document (flattening reshapes, never changes, the graph).
"""

from __future__ import annotations

from typing import Any, Mapping, Optional

from .expand_doc import _BNodes, expand_document


def _relabel_if_blank(ident: str, bnodes: _BNodes) -> str:
    return bnodes.relabel(ident) if ident.startswith("_:") else ident


def _generate_node_map(
    element: Any,
    node_map: dict[str, dict[str, dict]],
    bnodes: _BNodes,
    active_graph: str = "@default",
    active_subject: Optional[str] = None,
    active_property: Optional[str] = None,
    lst: Optional[dict] = None,
    reverse_of: Optional[tuple[dict, str]] = None,
) -> None:
    """§8.2 Node Map Generation over our expanded form.

    ``reverse_of=(ref, prop)`` marks the element as a value under some
    parent's ``@reverse`` map: the element's node gets a FORWARD edge
    ``prop → ref`` (the spec's referenced-node-as-active-subject device).
    """
    # step 1 — arrays recurse element-wise
    if isinstance(element, list):
        for item in element:
            _generate_node_map(
                element=item, node_map=node_map, bnodes=bnodes,
                active_graph=active_graph, active_subject=active_subject,
                active_property=active_property, lst=lst,
                reverse_of=reverse_of,
            )
        return

    graph = node_map.setdefault(active_graph, {})
    subject_node = (
        graph.get(active_subject) if active_subject is not None else None
    )

    # step 3 — relabel blank-node @type values. Node objects carry @type
    # as a LIST of IRIs; value objects carry it as a STRING datatype
    # (expand_doc._expand_value) which must pass through untouched — a
    # bare list comprehension here would iterate the string char-wise and
    # corrupt typed literals (regression-pinned in test_kernel_flatten).
    if "@type" in element and "@value" not in element:
        element = dict(element)
        element["@type"] = [
            _relabel_if_blank(t, bnodes) for t in element["@type"]
        ]

    if "@value" in element:
        # step 4 — value object: append to list or merge into the property
        if lst is not None:
            lst["@list"].append(element)
        else:
            values = subject_node.setdefault(active_property, [])
            if element not in values:
                values.append(element)
        return

    if "@list" in element:
        # step 5 — list object: recurse with a fresh result list
        result = {"@list": []}
        _generate_node_map(
            element=element["@list"], node_map=node_map, bnodes=bnodes,
            active_graph=active_graph, active_subject=active_subject,
            active_property=active_property, lst=result,
        )
        if lst is not None:
            lst["@list"].append(result)
        else:
            subject_node.setdefault(active_property, []).append(result)
        return

    # step 6 — node object
    if "@id" in element:
        ident = _relabel_if_blank(element["@id"], bnodes)
    else:
        ident = bnodes.fresh()
    node = graph.setdefault(ident, {"@id": ident})

    # step 6.5/6.6 — reference from the embedding property
    if active_subject is not None and active_property is not None:
        reference = {"@id": ident}
        if lst is not None:
            lst["@list"].append(reference)
        else:
            values = subject_node.setdefault(active_property, [])
            if reference not in values:
                values.append(reference)

    # reverse embedding: this node carries the forward edge back to the
    # parent (spec step 6.9's referenced-node-as-subject)
    if reverse_of is not None:
        ref, rprop = reverse_of
        vals = node.setdefault(rprop, [])
        if ref not in vals:
            vals.append(ref)

    if "@type" in element:
        types = node.setdefault("@type", [])
        for t in element["@type"]:
            if t not in types:
                types.append(t)

    if "@index" in element:
        node["@index"] = element["@index"]

    if "@reverse" in element:
        # step 6.9 — each value under @reverse gets prop → this node
        ref = {"@id": ident}
        for prop, values in element["@reverse"].items():
            prop_label = _relabel_if_blank(prop, bnodes)
            _generate_node_map(
                element=values, node_map=node_map, bnodes=bnodes,
                active_graph=active_graph, reverse_of=(ref, prop_label),
            )

    if "@included" in element:
        # step 6.8 — included nodes merge into the active graph
        _generate_node_map(
            element=element["@included"], node_map=node_map, bnodes=bnodes,
            active_graph=active_graph,
        )

    if "@graph" in element:
        _generate_node_map(
            element=element["@graph"], node_map=node_map, bnodes=bnodes,
            active_graph=ident,
        )

    for prop in sorted(
        p for p in element
        if p not in (
            "@id", "@type", "@index", "@graph", "@value", "@list",
            "@reverse", "@included",
        )
    ):
        prop_label = _relabel_if_blank(prop, bnodes)
        node.setdefault(prop_label, [])
        _generate_node_map(
            element=element[prop], node_map=node_map, bnodes=bnodes,
            active_graph=active_graph, active_subject=ident,
            active_property=prop_label,
        )


def flatten_expanded(expanded: list[dict[str, Any]]) -> list[dict[str, Any]]:
    """§8.1 — flattened expanded form: every node object top-level, blank
    nodes labelled, named graphs nested under their graph node's
    ``@graph``, nodes ordered by id, id-only nodes dropped."""
    bnodes = _BNodes()
    node_map: dict[str, dict[str, dict]] = {"@default": {}}
    _generate_node_map(expanded, node_map, bnodes)
    default_graph = node_map["@default"]
    for graph_name in sorted(k for k in node_map if k != "@default"):
        entry = default_graph.setdefault(graph_name, {"@id": graph_name})
        entry["@graph"] = [
            node
            for _, node in sorted(node_map[graph_name].items())
            if len(node) > 1
        ]
    return [
        node for _, node in sorted(default_graph.items()) if len(node) > 1
    ]


def flatten_document(
    processor, active_ctx, document: Mapping[str, Any] | list
) -> list[dict[str, Any]]:
    """expand → flatten (the JsonLdProcessor ``flatten()`` entry, §5)."""
    return flatten_expanded(expand_document(processor, active_ctx, document))


def flatten_stats(flattened: list[dict[str, Any]]) -> tuple[int, int, int]:
    """(n_nodes, n_props, n_blank_nodes) over a flattened document,
    counting named-graph members as nodes too — the shape summary the
    pipeline's kg_flatten_stats query aggregates per turn."""
    nodes = list(flattened)
    for n in flattened:
        nodes.extend(n.get("@graph", []))
    n_props = sum(
        1
        for n in nodes
        for p in n
        if not p.startswith("@")
    )
    n_blank = len({n["@id"] for n in nodes if n["@id"].startswith("_:")})
    return len(nodes), n_props, n_blank
