"""KG referential-integrity audit (pipeline/audit.py)."""


def test_kg_integrity_detects_every_defect_class(spark):
    from json_ld_spark.pipeline.audit import kg_integrity

    nodes = spark.createDataFrame(
        [
            ("c1", "http://a", "iri", 1),
            ("c2", "http://b", "iri", 1),
            ("c2", "http://b2", "iri", 1),   # duplicate canon_id
            ("c3", "http://c", "iri", 1),    # orphan (no edge touches it)
        ],
        "canon_id string, iri string, kind string, n_aliases long",
    )
    edges = spark.createDataFrame(
        [
            ("c1", "http://p", "c2", 1),     # healthy
            ("c1", "http://p", "c1", 1),     # self-loop
            ("cX", "http://p", "c2", 1),     # dangling src
            ("c1", "http://p", "cY", 1),     # dangling dst
            (None, "http://p", "c2", 1),     # null key (also dangling src)
        ],
        "src_canon string, pred string, dst_canon string, provenance long",
    )
    row = kg_integrity(nodes, edges).collect()[0].asDict()
    assert row == {
        "n_nodes": 4,
        "n_edges": 5,
        "dup_node_ids": 1,
        "dangling_src": 2,   # cX and the NULL src both fail the anti-join
        "dangling_dst": 1,
        "orphan_nodes": 1,   # c3
        "self_loops": 1,
        "null_keys": 1,
    }


def test_kg_integrity_clean_graph_all_zero(spark):
    from json_ld_spark.pipeline.audit import kg_integrity

    nodes = spark.createDataFrame(
        [("c1", "http://a", "iri", 1), ("c2", "http://b", "iri", 1)],
        "canon_id string, iri string, kind string, n_aliases long",
    )
    edges = spark.createDataFrame(
        [("c1", "http://p", "c2", 1)],
        "src_canon string, pred string, dst_canon string, provenance long",
    )
    row = kg_integrity(nodes, edges).collect()[0].asDict()
    assert row["n_nodes"] == 2 and row["n_edges"] == 1
    assert all(
        row[k] == 0
        for k in (
            "dup_node_ids", "dangling_src", "dangling_dst",
            "orphan_nodes", "self_loops", "null_keys",
        )
    )


def test_void_stats_counts(spark):
    from json_ld_spark.pipeline.audit import void_stats

    triples = spark.createDataFrame(
        [
            ("s1", "p1", "iri", "o1", None, None),
            ("s1", "p1", "iri", "o2", None, None),
            ("s2", "p1", "literal", "hello", "http://t", None),
            ("s2", "p1", "literal", "bonjour", None, "fr"),
            ("s3", "p2", "bnode", "_:b0", None, None),
        ],
        "subj string, pred string, obj_kind string, obj_value string, "
        "obj_type string, obj_lang string",
    )
    rows = {r.pred: r.asDict() for r in void_stats(triples).collect()}
    assert rows["p1"] == {
        "pred": "p1", "n_triples": 4, "n_subjects": 2, "n_objects": 4,
        "n_literal": 2, "n_iri": 2, "n_bnode": 0, "n_typed": 1, "n_lang": 1,
    }
    assert rows["p2"]["n_bnode"] == 1 and rows["p2"]["n_triples"] == 1


def test_conv_stats_profile(spark):
    import datetime as dt

    from json_ld_spark.pipeline.audit import conv_stats

    t0 = dt.datetime(2026, 1, 1, 0, 0, 0)

    def ts(s):
        return t0 + dt.timedelta(seconds=s)

    tr = spark.createDataFrame(
        [
            ("c1", 0, "user", "hi", "", ts(0)),
            ("c1", 1, "assistant", "yo <jsonld>{}</jsonld>", "", ts(10)),
            ("c1", 2, "tool", "result", "t", ts(70)),
            ("c2", 0, "user", "solo", "", ts(0)),
        ],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    rows = {r.conv_id: r.asDict() for r in conv_stats(tr).collect()}
    c1 = rows["c1"]
    assert c1["n_turns"] == 3 and c1["n_user"] == 1
    assert c1["n_assistant"] == 1 and c1["n_tool"] == 1
    assert c1["n_json_turns"] == 1
    assert c1["text_chars"] == len("hi") + len("yo <jsonld>{}</jsonld>") + len("result")
    assert c1["duration_s"] == 70 and c1["max_gap_s"] == 60
    c2 = rows["c2"]
    assert c2["n_turns"] == 1 and c2["duration_s"] == 0
    assert c2["max_gap_s"] is None  # no second turn, no gap


def test_entity_timeline(spark):
    import datetime as dt

    from json_ld_spark.pipeline.audit import entity_timeline

    def ts(m):
        return dt.datetime(2026, 1, 1, 12, m, 0)

    triples = spark.createDataFrame(
        [
            ("c1", 0, "http://e/a"),
            ("c1", 0, "http://e/a"),   # second assertion, same turn
            ("c1", 2, "http://e/a"),
            ("c2", 0, "http://e/a"),
            ("c2", 0, "_:b0"),          # blank subject excluded
            ("c1", 2, "http://e/b"),
        ],
        "conv_id string, turn_idx int, subj string",
    )
    transcripts = spark.createDataFrame(
        [("c1", 0, ts(0)), ("c1", 2, ts(10)), ("c2", 0, ts(5))],
        "conv_id string, turn_idx int, ts timestamp",
    )
    got = {
        r.entity: (r.first_seen, r.last_seen, r.n_turns, r.n_convs, r.n_assertions)
        for r in entity_timeline(triples, transcripts).collect()
    }
    base = int(ts(0).replace(tzinfo=dt.timezone.utc).timestamp())
    # session tz is whatever the harness runs; compare relative spans
    a = got["http://e/a"]
    assert a[1] - a[0] == 600          # first c1#0, last c1#2
    assert a[2:] == (3, 2, 4)          # 3 turns, 2 convs, 4 assertions
    b = got["http://e/b"]
    assert b[0] == b[1] and b[2:] == (1, 1, 1)
    assert "_:b0" not in got


def test_characteristic_sets(spark):
    from json_ld_spark.pipeline.audit import characteristic_sets

    triples = spark.createDataFrame(
        [
            ("s1", "name"), ("s1", "knows"), ("s1", "knows"),
            ("s2", "knows"), ("s2", "name"),
            ("s3", "name"),
        ],
        "subj string, pred string",
    )
    got = {
        r.cset: (r.n_preds, r.n_subjects, r.n_triples)
        for r in characteristic_sets(triples).collect()
    }
    # s1 and s2 share {knows,name}; s1 carries 3 triples, s2 carries 2
    assert got == {"knows,name": (2, 2, 5), "name": (1, 1, 1)}


def test_plan_compaction(spark):
    from json_ld_spark.pipeline.audit import plan_compaction

    files = spark.createDataFrame(
        [
            ("p1", "f1", 60), ("p1", "f2", 60),   # pack together (<100 before f2)
            ("p1", "f3", 60),                       # cum_before=120 -> group 1
            ("p1", "f4", 250),                      # oversized: own group 1? cum=180 -> group 1
            ("p2", "f1", 10),                       # partitions independent
        ],
        "partition string, path string, bytes long",
    )
    rows = {
        (r.partition, r.path): (r.group, r.group_files, r.group_bytes)
        for r in plan_compaction(files, target_bytes=100).collect()
    }
    assert rows[("p1", "f1")] == (0, 2, 120)
    assert rows[("p1", "f2")] == (0, 2, 120)
    assert rows[("p1", "f3")] == (1, 2, 310)   # 120 div 100 = 1
    assert rows[("p1", "f4")] == (1, 2, 310)   # 180 div 100 = 1
    assert rows[("p2", "f1")] == (0, 1, 10)

    import pytest as _pytest

    with _pytest.raises(ValueError, match="target_bytes"):
        plan_compaction(files, target_bytes=0)
