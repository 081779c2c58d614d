"""Basic graph pattern matching (operators/bgp.py)."""

import pytest


def _triples(spark):
    rows = [
        # alice knows bob; bob knows carol; names for all three
        ("alice", "knows", "iri", "bob"),
        ("bob", "knows", "iri", "carol"),
        ("alice", "name", "literal", "Alice"),
        ("bob", "name", "literal", "Bob"),
        ("carol", "name", "literal", "Carol"),
        # a literal that shares a value with an IRI (obj_kind must split them)
        ("mallory", "knows", "literal", "bob"),
        # self-knowledge for the repeated-variable case
        ("dave", "knows", "iri", "dave"),
        ("dave", "name", "literal", "Dave"),
    ]
    return spark.createDataFrame(
        rows, "subj string, pred string, obj_kind string, obj_value string"
    )


def test_path_and_star_join(spark):
    from json_ld_spark.operators.bgp import bgp_match

    out = bgp_match(
        _triples(spark),
        [
            ("?a", "knows", "?b"),
            ("?a", "name", "?a_name"),
            ("?b", "name", "?b_name"),
        ],
        obj_kinds=["iri", "literal", "literal"],
    )
    got = {tuple(r) for r in out.select("a", "a_name", "b", "b_name").collect()}
    assert got == {
        ("alice", "Alice", "bob", "Bob"),
        ("bob", "Bob", "carol", "Carol"),
        ("dave", "Dave", "dave", "Dave"),
    }


def test_obj_kind_filters_literal_impostor(spark):
    from json_ld_spark.operators.bgp import bgp_match

    # without the kind restriction mallory's literal "bob" would join
    out = bgp_match(
        _triples(spark), [("?a", "knows", "?b")], obj_kinds=["iri"]
    )
    assert ("mallory",) not in {
        (r.a,) for r in out.select("a").collect()
    }


def test_repeated_variable_is_self_equality(spark):
    from json_ld_spark.operators.bgp import bgp_match

    out = bgp_match(_triples(spark), [("?x", "knows", "?x")])
    assert [r.x for r in out.collect()] == ["dave"]


def test_constant_subject(spark):
    from json_ld_spark.operators.bgp import bgp_match

    out = bgp_match(_triples(spark), [("alice", "knows", "?who")])
    assert [r.who for r in out.collect()] == ["bob"]


def test_distinct_bindings(spark):
    from json_ld_spark.operators.bgp import bgp_match

    # duplicate assertion of the same triple (e.g. two turns) must not
    # duplicate the binding (SPARQL set semantics)
    t = _triples(spark)
    out = bgp_match(t.union(t), [("?a", "knows", "?b")], obj_kinds=["iri"])
    rows = out.collect()
    assert len(rows) == len({tuple(r) for r in rows}) == 3


def test_disconnected_bgp_rejected(spark):
    from json_ld_spark.operators.bgp import bgp_match

    with pytest.raises(ValueError, match="disconnected"):
        bgp_match(
            _triples(spark), [("?a", "knows", "?b"), ("?x", "name", "?y")]
        )


def test_empty_and_unbound_patterns_rejected(spark):
    from json_ld_spark.operators.bgp import bgp_match

    with pytest.raises(ValueError, match="empty basic graph pattern"):
        bgp_match(_triples(spark), [])
    with pytest.raises(ValueError, match="binds no variables"):
        bgp_match(_triples(spark), [("alice", "knows", "bob")])


def test_pattern_joins_are_equi_joins(spark):
    """The BGP plan must stay hash/merge-join shaped — a Cartesian or
    nested-loop product anywhere means the variable wiring broke."""
    from json_ld_spark.operators.bgp import bgp_match

    out = bgp_match(
        _triples(spark),
        [("?a", "knows", "?b"), ("?b", "name", "?n")],
        obj_kinds=["iri", "literal"],
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_optional_unmatched_survives_with_null(spark):
    from json_ld_spark.operators.bgp import bgp_match

    # carol knows nobody onward; ?b name always exists here, so make the
    # optional pattern affiliation-like: only alice has an "affil" triple
    t = _triples(spark).union(
        spark.createDataFrame(
            [("alice", "affil", "iri", "acme")],
            "subj string, pred string, obj_kind string, obj_value string",
        )
    )
    out = bgp_match(
        t,
        [("?a", "name", "?n")],
        obj_kinds=["literal"],
        optional_groups=[[("?a", "affil", "?org")]],
    )
    got = {(r.a, r.n, r.org) for r in out.collect()}
    assert ("alice", "Alice", "acme") in got
    assert ("bob", "Bob", None) in got
    assert ("carol", "Carol", None) in got
    # OPTIONAL never drops required solutions
    assert len(got) == 4  # alice, bob, carol, dave


def test_optional_multiplies_per_matching_binding(spark):
    from json_ld_spark.operators.bgp import bgp_match

    t = _triples(spark).union(
        spark.createDataFrame(
            [("alice", "affil", "iri", "acme"), ("alice", "affil", "iri", "umbrella")],
            "subj string, pred string, obj_kind string, obj_value string",
        )
    )
    out = bgp_match(
        t,
        [("?a", "name", "?n")],
        obj_kinds=["literal"],
        optional_groups=[[("?a", "affil", "?org")]],
    )
    # SPARQL leftjoin: one solution per compatible optional binding
    got = {(r.a, r.n, r.org) for r in out.collect()}
    assert {(n, o) for a, n, o in got if a == "alice"} == {
        ("Alice", "acme"),
        ("Alice", "umbrella"),
    }
    assert ("bob", "Bob", None) in got


def test_optional_group_is_a_joint_bgp(spark):
    from json_ld_spark.operators.bgp import bgp_match

    # the whole optional group must match together: ?b name AND ?b knows ?c
    out = bgp_match(
        _triples(spark),
        [("?a", "knows", "?b")],
        obj_kinds=["iri"],
        optional_groups=[[("?b", "name", "?bn"), ("?b", "knows", "?c")]],
        optional_obj_kinds=[["literal", "iri"]],
    )
    got = {(r.a, r.b, r.bn, r.c) for r in out.collect()}
    # bob knows carol -> group matches for ?b=bob; carol/dave chains differ
    assert ("alice", "bob", "Bob", "carol") in got
    assert ("bob", "carol", None, None) in got  # carol has name but no knows
    assert ("dave", "dave", "Dave", "dave") in got


def test_optional_disconnected_rejected(spark):
    from json_ld_spark.operators.bgp import bgp_match

    with pytest.raises(ValueError, match="OPTIONAL group shares no variable"):
        bgp_match(
            _triples(spark),
            [("?a", "knows", "?b")],
            optional_groups=[[("?x", "name", "?y")]],
        )
