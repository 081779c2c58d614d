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
