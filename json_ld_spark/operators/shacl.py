"""SHACL-lite shape validation over the materialized triple table.

The reference library produces the graph (expand/compact/toRdf —
/root/reference/src/lib.rs:1-40 scopes the crate to the processing
algorithms); the next thing a production KG pipeline does after
materializing it is *validate* it before downstream consumers read it.
This module implements the core of W3C SHACL most KG publishers actually
use: per-shape focus-node targeting via ``sh:targetSubjectsOf`` and the
cardinality / node-kind / datatype property constraints
(``sh:minCount`` / ``sh:maxCount`` / ``sh:nodeKind`` / ``sh:datatype``),
emitting a violation report row per (focus, path, constraint).

Value-node semantics follow SHACL: an RDF graph is a *set* of triples,
so the value nodes of ``(focus, path)`` are the DISTINCT
``(obj_kind, obj_value, obj_type, obj_lang)`` tuples — turn-level
assertion multiplicity in the extraction table does not inflate counts.
The effective datatype of a literal mirrors RDF 1.1 Concepts §3.3:
``obj_type`` when present, ``rdf:langString`` when language-tagged,
``xsd:string`` otherwise.

Execution model (why this scales)
---------------------------------
Per shape: one predicate-pushed scan of the triple table restricted to
the shape's paths (parquet row-group skipping on ``pred``), a DISTINCT
+ groupBy(focus, path) pair of aggregations with map-side combine, one
scan for the target set, and a single equi-join on focus — per-focus
state is a handful of counters, so no key can overload an executor
regardless of corpus size (hub subjects contribute one row per path,
not one per assertion).  Constraint evaluation itself is a map-side
``explode(array(struct(...)))`` over per-(focus, path) counters: pure
JVM, no Python.  Shapes union together; Catalyst dedups the scans.
"""

from __future__ import annotations

from typing import Mapping, Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

XSD_STRING = "http://www.w3.org/2001/XMLSchema#string"
RDF_LANG_STRING = "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString"


def _effective_datatype() -> F.Column:
    return F.coalesce(
        F.col("obj_type"),
        F.when(F.col("obj_lang").isNotNull(), F.lit(RDF_LANG_STRING)),
        F.lit(XSD_STRING),
    )


def _shape_report(triples: DataFrame, shape: Mapping) -> DataFrame:
    shape_id = shape["shape"]
    target_pred = shape["target_subjects_of"]
    props: Sequence[Mapping] = shape["properties"]
    paths = [p["path"] for p in props]
    if len(set(paths)) != len(paths):
        raise ValueError(f"duplicate property path in shape {shape_id}")

    # focus nodes: sh:targetSubjectsOf — every subject of the target
    # predicate, deduplicated (one predicate-pushed scan)
    targets = (
        triples.where(F.col("pred") == F.lit(target_pred))
        .select(F.col("subj").alias("focus"))
        .distinct()
    )

    # value nodes per (focus, path): SET semantics over the object tuple
    values = (
        triples.where(F.col("pred").isin(paths))
        .select(
            F.col("subj").alias("focus"),
            F.col("pred").alias("path"),
            "obj_kind",
            "obj_value",
            "obj_type",
            "obj_lang",
        )
        .distinct()
    )

    # per-path expected node kind / datatype as CASE chains (pure JVM)
    kind_expec = F.lit(None).cast("string")
    dtype_expec = F.lit(None).cast("string")
    for p in props:
        if p.get("node_kind") is not None:
            kind_expec = F.when(
                F.col("path") == F.lit(p["path"]), F.lit(p["node_kind"])
            ).otherwise(kind_expec)
        if p.get("datatype") is not None:
            dtype_expec = F.when(
                F.col("path") == F.lit(p["path"]), F.lit(p["datatype"])
            ).otherwise(dtype_expec)

    per = values.groupBy("focus", "path").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.when(
                kind_expec.isNotNull() & (F.col("obj_kind") != kind_expec),
                F.lit(1),
            ).otherwise(F.lit(0))
        ).alias("bad_kind"),
        F.sum(
            F.when(
                dtype_expec.isNotNull()
                & (
                    (F.col("obj_kind") != F.lit("literal"))
                    | (_effective_datatype() != dtype_expec)
                ),
                F.lit(1),
            ).otherwise(F.lit(0))
        ).alias("bad_dtype"),
    )

    # every (focus, path) pair exists even with zero values — minCount
    # violations come from absence (explode of a literal array: map-only)
    grid = targets.select(
        "focus",
        F.explode(F.array(*[F.lit(p) for p in paths])).alias("path"),
    )
    full = grid.join(per, ["focus", "path"], "left").select(
        "focus",
        "path",
        F.coalesce(F.col("n"), F.lit(0)).alias("n"),
        F.coalesce(F.col("bad_kind"), F.lit(0)).alias("bad_kind"),
        F.coalesce(F.col("bad_dtype"), F.lit(0)).alias("bad_dtype"),
    )

    # violation emission: per-path thresholds as CASE chains, then one
    # explode(array(struct)) + null-filter — map-side, no extra shuffle
    min_c = F.lit(None).cast("long")
    max_c = F.lit(None).cast("long")
    for p in props:
        if p.get("min_count") is not None:
            min_c = F.when(
                F.col("path") == F.lit(p["path"]), F.lit(int(p["min_count"]))
            ).otherwise(min_c)
        if p.get("max_count") is not None:
            max_c = F.when(
                F.col("path") == F.lit(p["path"]), F.lit(int(p["max_count"]))
            ).otherwise(max_c)
    kind_expec_p = F.lit(None).cast("string")
    dtype_expec_p = F.lit(None).cast("string")
    for p in props:
        if p.get("node_kind") is not None:
            kind_expec_p = F.when(
                F.col("path") == F.lit(p["path"]), F.lit(p["node_kind"])
            ).otherwise(kind_expec_p)
        if p.get("datatype") is not None:
            dtype_expec_p = F.when(
                F.col("path") == F.lit(p["path"]), F.lit(p["datatype"])
            ).otherwise(dtype_expec_p)

    def _v(cond: F.Column, constraint: str, expected: F.Column, actual: F.Column):
        return F.when(
            cond,
            F.struct(
                F.lit(constraint).alias("constraint"),
                expected.alias("expected"),
                actual.cast("long").alias("actual"),
            ),
        )

    report = (
        full.select(
            "focus",
            "path",
            F.explode(
                F.array(
                    _v(
                        min_c.isNotNull() & (F.col("n") < min_c),
                        "minCount",
                        F.concat(F.lit(">="), min_c.cast("string")),
                        F.col("n"),
                    ),
                    _v(
                        max_c.isNotNull() & (F.col("n") > max_c),
                        "maxCount",
                        F.concat(F.lit("<="), max_c.cast("string")),
                        F.col("n"),
                    ),
                    _v(
                        F.col("bad_kind") > 0,
                        "nodeKind",
                        kind_expec_p,
                        F.col("bad_kind"),
                    ),
                    _v(
                        F.col("bad_dtype") > 0,
                        "datatype",
                        dtype_expec_p,
                        F.col("bad_dtype"),
                    ),
                )
            ).alias("v"),
        )
        .where(F.col("v").isNotNull())
        .select(
            F.lit(shape_id).alias("shape"),
            "focus",
            "path",
            F.col("v.constraint").alias("constraint"),
            F.col("v.expected").alias("expected"),
            F.col("v.actual").alias("actual"),
        )
    )
    return report


def shacl_validate(
    triples: DataFrame, shapes: Sequence[Mapping]
) -> DataFrame:
    """Validate ``triples`` against SHACL-lite ``shapes``; return the
    violation report (shape, focus, path, constraint, expected, actual).

    Each shape is a mapping::

        {"shape": "PersonShape",
         "target_subjects_of": "<predicate IRI>",
         "properties": [
             {"path": "<predicate IRI>",
              "min_count": 1,          # optional
              "max_count": 1,          # optional
              "node_kind": "literal",  # optional: iri|literal|bnode
              "datatype": "<IRI>"},    # optional (implies literals)
         ]}

    An empty result means the graph conforms.  ``triples`` needs columns
    (subj, pred, obj_kind, obj_value, obj_type, obj_lang).
    """
    if not shapes:
        raise ValueError("no shapes given")
    reports = [_shape_report(triples, s) for s in shapes]
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out
