"""IRI helper parity tests.

The split cases replicate the reference's only inline unit test verbatim
(/root/reference/src/iri.rs:87-94).
"""

import pytest

from json_ld_spark.kernel.iri import (
    has_form_of_keyword,
    is_absolute_iri_ref,
    is_blank_node,
    is_compact_iri,
    remove_dot_segments,
    resolve_iri,
    split_prefix,
)


def test_split_prefix_reference_vectors():
    # verbatim from src/iri.rs:87-94
    assert split_prefix("foo") is None
    assert split_prefix("foo:bar") == ("foo", "bar")
    assert split_prefix(":foo") is None
    assert split_prefix("foo:") == ("foo", "")
    assert split_prefix(":foo:") == (":foo", "")
    assert split_prefix(":foo:bar:") == (":foo", "bar:")
    assert split_prefix("") is None


def test_classification_heuristics():
    # reference heuristic: authority-based absolute (src/iri.rs:20-28)
    assert is_absolute_iri_ref("http://example.org/x")
    assert not is_absolute_iri_ref("urn:isbn:12345")  # no //: compact per heuristic
    assert is_compact_iri("urn:isbn:12345")
    assert is_blank_node("_:b0")
    assert not is_blank_node("a_:b")
    assert is_compact_iri("noColon")
    assert is_compact_iri("schema:name")


def test_keyword_form():
    assert has_form_of_keyword("@type")
    assert has_form_of_keyword("@madeUp")
    assert not has_form_of_keyword("@")
    assert not has_form_of_keyword("@123")
    assert not has_form_of_keyword("type")
    assert not has_form_of_keyword("@ty-pe")


@pytest.mark.parametrize(
    "ref,base,expected",
    [
        # RFC 3986 §5.4.1 normal examples
        ("g", "http://a/b/c/d;p?q", "http://a/b/c/g"),
        ("./g", "http://a/b/c/d;p?q", "http://a/b/c/g"),
        ("g/", "http://a/b/c/d;p?q", "http://a/b/c/g/"),
        ("/g", "http://a/b/c/d;p?q", "http://a/g"),
        ("//g", "http://a/b/c/d;p?q", "http://g"),
        ("?y", "http://a/b/c/d;p?q", "http://a/b/c/d;p?y"),
        ("g?y", "http://a/b/c/d;p?q", "http://a/b/c/g?y"),
        ("#s", "http://a/b/c/d;p?q", "http://a/b/c/d;p?q#s"),
        ("g#s", "http://a/b/c/d;p?q", "http://a/b/c/g#s"),
        (";x", "http://a/b/c/d;p?q", "http://a/b/c/;x"),
        ("", "http://a/b/c/d;p?q", "http://a/b/c/d;p?q"),
        (".", "http://a/b/c/d;p?q", "http://a/b/c/"),
        ("..", "http://a/b/c/d;p?q", "http://a/b/"),
        ("../g", "http://a/b/c/d;p?q", "http://a/b/g"),
        ("../..", "http://a/b/c/d;p?q", "http://a/"),
        ("../../g", "http://a/b/c/d;p?q", "http://a/g"),
        # remaining normal examples (complete §5.4.1 grid)
        ("g?y#s", "http://a/b/c/d;p?q", "http://a/b/c/g?y#s"),
        ("g;x", "http://a/b/c/d;p?q", "http://a/b/c/g;x"),
        ("g;x?y#s", "http://a/b/c/d;p?q", "http://a/b/c/g;x?y#s"),
        ("./", "http://a/b/c/d;p?q", "http://a/b/c/"),
        ("../", "http://a/b/c/d;p?q", "http://a/b/"),
        ("../../", "http://a/b/c/d;p?q", "http://a/"),
        # abnormal examples (§5.4.2, complete grid)
        ("../../../g", "http://a/b/c/d;p?q", "http://a/g"),
        ("../../../../g", "http://a/b/c/d;p?q", "http://a/g"),
        ("/./g", "http://a/b/c/d;p?q", "http://a/g"),
        ("/../g", "http://a/b/c/d;p?q", "http://a/g"),
        ("g.", "http://a/b/c/d;p?q", "http://a/b/c/g."),
        (".g", "http://a/b/c/d;p?q", "http://a/b/c/.g"),
        ("g..", "http://a/b/c/d;p?q", "http://a/b/c/g.."),
        ("..g", "http://a/b/c/d;p?q", "http://a/b/c/..g"),
        ("./../g", "http://a/b/c/d;p?q", "http://a/b/g"),
        ("./g/.", "http://a/b/c/d;p?q", "http://a/b/c/g/"),
        ("g/./h", "http://a/b/c/d;p?q", "http://a/b/c/g/h"),
        ("g/../h", "http://a/b/c/d;p?q", "http://a/b/c/h"),
        ("g;x=1/./y", "http://a/b/c/d;p?q", "http://a/b/c/g;x=1/y"),
        ("g;x=1/../y", "http://a/b/c/d;p?q", "http://a/b/c/y"),
        ("g?y/./x", "http://a/b/c/d;p?q", "http://a/b/c/g?y/./x"),
        ("g?y/../x", "http://a/b/c/d;p?q", "http://a/b/c/g?y/../x"),
        ("g#s/./x", "http://a/b/c/d;p?q", "http://a/b/c/g#s/./x"),
        ("g#s/../x", "http://a/b/c/d;p?q", "http://a/b/c/g#s/../x"),
        # strict parser: scheme-bearing reference wins even same-scheme
        ("http:g", "http://a/b/c/d;p?q", "http:g"),
        ("g:h", "http://a/b/c/d;p?q", "g:h"),
        ("http://x/y", "http://a/b/", "http://x/y"),
    ],
)
def test_resolve_iri_rfc3986(ref, base, expected):
    assert resolve_iri(ref, base) == expected


def test_remove_dot_segments():
    assert remove_dot_segments("/a/b/c/./../../g") == "/a/g"
    assert remove_dot_segments("mid/content=5/../6") == "mid/6"
