"""SHACL-lite shape validation (operators/shacl.py)."""

import pytest

SCHEMA = (
    "subj string, pred string, obj_kind string, obj_value string, "
    "obj_type string, obj_lang string"
)
XSD_STR = "http://www.w3.org/2001/XMLSchema#string"
LANG_STR = "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString"


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _person_shape(**overrides):
    shape = {
        "shape": "PersonShape",
        "target_subjects_of": "knows",
        "properties": [
            {
                "path": "name",
                "min_count": 1,
                "max_count": 1,
                "node_kind": "literal",
                "datatype": XSD_STR,
            },
            {"path": "knows", "max_count": 2, "node_kind": "iri"},
        ],
    }
    shape.update(overrides)
    return shape


def test_conforming_graph_is_empty_report(spark):
    from json_ld_spark.operators.shacl import shacl_validate

    t = _df(
        spark,
        [
            ("a", "knows", "iri", "b", None, None),
            ("a", "name", "literal", "A", None, None),
        ],
    )
    assert shacl_validate(t, [_person_shape()]).count() == 0


def test_min_count_fires_on_absence(spark):
    from json_ld_spark.operators.shacl import shacl_validate

    t = _df(spark, [("a", "knows", "iri", "b", None, None)])
    rows = shacl_validate(t, [_person_shape()]).collect()
    assert [
        (r.shape, r.focus, r.path, r.constraint, r.expected, r.actual)
        for r in rows
    ] == [("PersonShape", "a", "name", "minCount", ">=1", 0)]


def test_max_count_and_set_semantics(spark):
    from json_ld_spark.operators.shacl import shacl_validate

    # three distinct knows values -> maxCount(<=2) fires with actual=3;
    # the duplicate assertion of (a knows b) must NOT count twice
    t = _df(
        spark,
        [
            ("a", "knows", "iri", "b", None, None),
            ("a", "knows", "iri", "b", None, None),
            ("a", "knows", "iri", "c", None, None),
            ("a", "knows", "iri", "d", None, None),
            ("a", "name", "literal", "A", None, None),
        ],
    )
    rows = shacl_validate(t, [_person_shape()]).collect()
    assert [(r.path, r.constraint, r.actual) for r in rows] == [
        ("knows", "maxCount", 3)
    ]

    # with only the duplicate pair the count is 1 -> conforms
    t2 = _df(
        spark,
        [
            ("a", "knows", "iri", "b", None, None),
            ("a", "knows", "iri", "b", None, None),
            ("a", "name", "literal", "A", None, None),
        ],
    )
    assert shacl_validate(t2, [_person_shape()]).count() == 0


def test_node_kind_violation_counts_offending_values(spark):
    from json_ld_spark.operators.shacl import shacl_validate

    t = _df(
        spark,
        [
            ("a", "knows", "iri", "b", None, None),
            ("a", "knows", "literal", "bob", None, None),
            ("a", "name", "literal", "A", None, None),
        ],
    )
    rows = shacl_validate(t, [_person_shape()]).collect()
    assert [(r.path, r.constraint, r.expected, r.actual) for r in rows] == [
        ("knows", "nodeKind", "iri", 1)
    ]


def test_effective_datatype_lang_string(spark):
    from json_ld_spark.operators.shacl import shacl_validate

    # language-tagged literal has effective datatype rdf:langString,
    # violating datatype=xsd:string even with obj_type NULL
    t = _df(
        spark,
        [
            ("a", "knows", "iri", "b", None, None),
            ("a", "name", "literal", "A", None, "en"),
        ],
    )
    rows = shacl_validate(t, [_person_shape()]).collect()
    assert [(r.path, r.constraint, r.expected, r.actual) for r in rows] == [
        ("name", "datatype", XSD_STR, 1)
    ]

    # and a shape expecting langString conforms
    shape = _person_shape()
    shape["properties"][0]["datatype"] = LANG_STR
    assert shacl_validate(t, [shape]).count() == 0


def test_untargeted_subjects_not_validated(spark):
    from json_ld_spark.operators.shacl import shacl_validate

    # "x" has no knows triple -> not a focus node, its missing name is fine
    t = _df(
        spark,
        [
            ("a", "knows", "iri", "b", None, None),
            ("a", "name", "literal", "A", None, None),
            ("x", "other", "literal", "noise", None, None),
        ],
    )
    assert shacl_validate(t, [_person_shape()]).count() == 0


def test_multiple_shapes_union(spark):
    from json_ld_spark.operators.shacl import shacl_validate

    t = _df(
        spark,
        [
            ("a", "knows", "iri", "b", None, None),
            ("i", "label", "literal", "L", None, None),
        ],
    )
    item = {
        "shape": "ItemShape",
        "target_subjects_of": "label",
        "properties": [{"path": "ref", "min_count": 1, "node_kind": "iri"}],
    }
    rows = shacl_validate(t, [_person_shape(), item]).collect()
    assert {(r.shape, r.focus, r.path, r.constraint) for r in rows} == {
        ("PersonShape", "a", "name", "minCount"),
        ("ItemShape", "i", "ref", "minCount"),
    }


def test_validation_errors(spark):
    from json_ld_spark.operators.shacl import shacl_validate

    t = _df(spark, [("a", "knows", "iri", "b", None, None)])
    with pytest.raises(ValueError, match="no shapes"):
        shacl_validate(t, [])
    bad = _person_shape()
    bad["properties"] = [{"path": "name"}, {"path": "name"}]
    with pytest.raises(ValueError, match="duplicate property path"):
        shacl_validate(t, [bad])


def test_plan_stays_jvm_side(spark):
    from json_ld_spark.operators.shacl import shacl_validate

    t = _df(
        spark,
        [
            ("a", "knows", "iri", "b", None, None),
            ("a", "name", "literal", "A", None, None),
        ],
    )
    plan = (
        shacl_validate(t, [_person_shape()])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
