"""Distributed fromRdf reconstruction (pipeline/reconstruct.py)."""

import pytest

from json_ld_spark.pipeline.reconstruct import (
    _TRIPLE_FIELDS,
    reconstruct_turn_docs,
    reconstruct_turn_stats,
)


XSD_STRING = "http://www.w3.org/2001/XMLSchema#string"


def _row(subj, pred, kind, value, ty=None, lang=None, direction=None, graph=None):
    if kind == "literal" and ty is None and lang is None:
        ty = XSD_STRING  # the extraction emits explicit xsd:string
    return {
        "subj": subj, "pred": pred, "obj_kind": kind, "obj_value": value,
        "obj_type": ty, "obj_lang": lang, "obj_direction": direction,
        "graph": graph,
    }


def test_spark_matches_kernel_per_turn(spark, sf_dir):
    from json_ld_spark.pipeline.extract import extract_triples
    from json_ld_spark.pipeline.transcripts import synth_transcripts

    triples = extract_triples(synth_transcripts(spark, sf_dir))
    got = {tuple(r) for r in reconstruct_turn_docs(triples).collect()}
    assert got and all(r[6] == 1 for r in got), "roundtrip failed on fixture"

    rows = triples.where("error_code IS NULL").collect()
    by_turn = {}
    for r in rows:
        by_turn.setdefault((r.conv_id, r.turn_idx), []).append(
            {k: getattr(r, k) for k in _TRIPLE_FIELDS}
        )
    expected = {
        (conv, turn) + reconstruct_turn_stats(trs)
        for (conv, turn), trs in by_turn.items()
    }
    assert got == expected


def test_stats_invariant_to_row_order_and_blank_labels():
    rows = [
        _row("http://ex/s", "http://ex/p", "bnode", "_:b0"),
        _row("_:b0", "http://ex/q", "literal", "x"),
        _row("_:b0", "http://ex/q", "literal", "y",
             ty="http://www.w3.org/2001/XMLSchema#integer"),
    ]
    base = reconstruct_turn_stats(list(rows))
    assert base[4] == 1  # roundtrip_ok
    # row order must not matter
    assert reconstruct_turn_stats(list(reversed(rows))) == base
    # blank relabeling must not change the fingerprint
    relabeled = [
        {k: ("_:zz9" if v == "_:b0" else v) for k, v in r.items()}
        for r in rows
    ]
    assert reconstruct_turn_stats(relabeled) == base


def test_named_graph_and_list_reconstruction():
    first = "http://www.w3.org/1999/02/22-rdf-syntax-ns#first"
    rest = "http://www.w3.org/1999/02/22-rdf-syntax-ns#rest"
    nil = "http://www.w3.org/1999/02/22-rdf-syntax-ns#nil"
    rows = [
        _row("http://ex/s", "http://ex/items", "bnode", "_:l0"),
        _row("_:l0", first, "literal", "a"),
        _row("_:l0", rest, "bnode", "_:l1"),
        _row("_:l1", first, "literal", "b"),
        _row("_:l1", rest, "iri", nil),
        _row("http://ex/g-node", "http://ex/in", "literal", "g",
             graph="http://ex/g"),
    ]
    n_nodes, n_graphs, n_lists, n_triples, ok, fp = reconstruct_turn_stats(rows)
    assert ok == 1
    assert n_lists == 1
    assert n_graphs == 1
    assert n_triples == 6
    assert len(fp) == 32


def test_bnode_prefixed_literal_not_confused_with_labels():
    """A string literal whose TEXT starts with "_:" is not a blank node:
    it must not break the roundtrip verdict (false failure), must not be
    relabeled into the fingerprint (false collision), and two graphs
    differing only in such a literal must compare unequal."""
    from json_ld_spark.kernel.from_rdf import canonical_triples

    RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    # list whose first item is the literal "_:b0" — fromRdf re-mints list
    # bnodes as _:b0/_:b1, textually colliding with the literal
    rows = [
        _row("http://s", "http://p", "bnode", "_:l0"),
        _row("_:l0", RDF + "first", "literal", "_:b0"),
        _row("_:l0", RDF + "rest", "bnode", "_:l1"),
        _row("_:l1", RDF + "first", "literal", "two"),
        _row("_:l1", RDF + "rest", "iri", RDF + "nil"),
    ]
    st = reconstruct_turn_stats(rows)
    assert st[4] == 1, "roundtrip must hold despite the '_:' literal"
    assert st[2] == 1  # the list is reconstructed

    # literal content must distinguish graphs (no joint relabeling)
    r1 = [_row("http://s", "http://p", "literal", "_:b0")]
    r2 = [_row("http://s", "http://p", "literal", "_:q7")]
    assert canonical_triples(r1) != canonical_triples(r2)
    assert reconstruct_turn_stats(r1)[5] != reconstruct_turn_stats(r2)[5]


def test_fingerprint_invariant_multivalued_property_relabeling():
    """Multi-valued properties append objects in row order; sorting by the
    ORIGINAL labels leaked them into the rebuilt structure, hashing two
    isomorphic turns apart. Rows must sort by their canonical labels."""
    r1 = [
        _row("http://s", "http://p", "bnode", "_:a"),
        _row("http://s", "http://p", "bnode", "_:b"),
        _row("_:a", "http://name", "literal", "1"),
        _row("_:b", "http://name", "literal", "2"),
    ]
    # same graph, labels swapped so the original-label sort order flips
    r2 = [
        _row("http://s", "http://p", "bnode", "_:z"),
        _row("http://s", "http://p", "bnode", "_:y"),
        _row("_:z", "http://name", "literal", "1"),
        _row("_:y", "http://name", "literal", "2"),
    ]
    assert reconstruct_turn_stats(r1) == reconstruct_turn_stats(r2)


def test_fingerprint_invariant_under_relabeling_distinct_nodes():
    """fromrdf_fp is computed after canonical relabeling, so node sort
    order cannot leak the input labels (two relabelings of content-
    distinguishable nodes used to sort differently and hash apart)."""
    r1 = [
        _row("_:a", "http://p", "literal", "1"),
        _row("_:b", "http://p", "literal", "2"),
        _row("_:a", "http://q", "bnode", "_:b"),
    ]
    r2 = [
        _row("_:z", "http://p", "literal", "1"),
        _row("_:y", "http://p", "literal", "2"),
        _row("_:z", "http://q", "bnode", "_:y"),
    ]
    assert reconstruct_turn_stats(r1) == reconstruct_turn_stats(r2)
