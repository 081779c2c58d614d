"""N-Quads serialization of the triples table (RDF 1.1 N-Quads grammar).

The reference stubs toRdf entirely (src/expand.rs exports only ``iri``);
this surface completes the export path a KG user needs: the extracted
``triples`` rows become standard N-Quads lines consumable by any RDF
store. Pure Catalyst expressions — literal ``replace`` chains (no regex)
for string escaping, so the DuckDB oracle (replace chains too) is
bit-exact by construction.

Serialization rules (N-Quads §2.2 / N-Triples §2.3):
- IRIs as ``<iri>``; blank nodes pass through (``_:label``).
- Literals as ``"escaped"`` with ECHAR escapes for backslash, quote, LF,
  CR, TAB (backslash first — order matters).
- ``@lang`` when a language tag is present; else ``^^<datatype>`` unless
  the type is xsd:string (the implicit default per RDF 1.1).
- JSON-LD base direction has no standard N-Quads encoding (it needs
  rdf-star or compound literals); direction is dropped here and the
  column is documented as lossy — matching what common processors emit
  without the ``rdfDirection`` option.
- A non-null ``graph`` becomes the 4th term (IRI or blank node).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

XSD_STRING = "http://www.w3.org/2001/XMLSchema#string"

# (from, to) literal replacements, backslash FIRST
_ESCAPES = [
    ("\\", "\\\\"),
    ('"', '\\"'),
    ("\n", "\\n"),
    ("\r", "\\r"),
    ("\t", "\\t"),
]


def escape_literal(col: Column) -> Column:
    for src, dst in _ESCAPES:
        col = F.replace(col, F.lit(src), F.lit(dst))
    return col


def _term(col: Column) -> Column:
    """IRI or blank-node term."""
    return F.when(col.startswith("_:"), col).otherwise(
        F.concat(F.lit("<"), col, F.lit(">"))
    )


def nquad_col(
    subj: Column,
    pred: Column,
    obj_kind: Column,
    obj_value: Column,
    obj_type: Column,
    obj_lang: Column,
    graph: Column,
) -> Column:
    obj = (
        F.when(obj_kind != "literal", _term(obj_value))
        .otherwise(
            F.concat(
                F.lit('"'),
                escape_literal(obj_value),
                F.lit('"'),
                F.when(
                    obj_lang.isNotNull(), F.concat(F.lit("@"), obj_lang)
                )
                .when(
                    obj_type.isNotNull() & (obj_type != XSD_STRING),
                    F.concat(F.lit("^^<"), obj_type, F.lit(">")),
                )
                .otherwise(F.lit("")),
            )
        )
    )
    g = F.when(
        graph.isNotNull(), F.concat(F.lit(" "), _term(graph))
    ).otherwise(F.lit(""))
    return F.concat(
        _term(subj), F.lit(" "), _term(pred), F.lit(" "), obj, g, F.lit(" .")
    )


def to_nquads(triples: DataFrame) -> DataFrame:
    """Clean triples → one ``nquad`` string column (plus the provenance
    keys for ordering/partitioned export)."""
    clean = triples.where(F.col("error_code").isNull())
    return clean.select(
        "conv_id",
        "turn_idx",
        nquad_col(
            F.col("subj"), F.col("pred"), F.col("obj_kind"),
            F.col("obj_value"), F.col("obj_type"), F.col("obj_lang"),
            F.col("graph"),
        ).alias("nquad"),
    )
