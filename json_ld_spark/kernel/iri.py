"""IRI helpers: splitting, classification, RFC 3986/3987 reference resolution.

Behavioral parity targets (reference, read-only at /root/reference/):

- ``split_prefix`` — src/iri.rs:43-54 (first char is never a separator; see
  w3c/json-ld-api issues 189 / PR 203). Unit-test vectors at src/iri.rs:87-94
  are replicated verbatim in tests/test_kernel_iri.py.
- IRI classification — src/iri.rs:5-38: the reference uses a *heuristic*
  (``prefix == "_"`` → blank node; ``suffix.startswith("//")`` → absolute IRI
  ref; else compact IRI). We match the heuristic, not full RFC 3987 parsing —
  parity over purity.
- gen-delims test — src/iri.rs:75-80.
- keyword-form test ``@1*ALPHA`` — src/syntax.rs:8-10.
- Reference resolution: the reference defers to the ``iri_string`` crate
  (Cargo.toml:20); we implement RFC 3986 §5.2-§5.3 (public algorithm) which is
  what that crate implements for ``resolve_against``.

The regex constants are also the vectorized pre-pass used batch-side in
pandas (``Series.str.match``) — keep them in sync with the scalar functions.
"""

from __future__ import annotations

import re

# Keyword-form: "@" 1*ALPHA (reference: src/syntax.rs:8-10).
KEYWORD_FORM_RE = re.compile(r"^@[A-Za-z]+$")

# An RFC 3986 scheme (used only for validity checks on absolute-IRI *syntax*
# where the reference relies on iri_string's parser, e.g. @base handling).
_SCHEME_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.-]*$")

# Characters excluded from IRIs entirely (space and ASCII controls). The
# iri_string crate rejects these; we use this as a light-weight validity probe.
_BAD_IRI_CHARS_RE = re.compile(r'[\x00-\x20<>"{}|\\^`]')


def has_form_of_keyword(s: str) -> bool:
    """True iff ``s`` matches ``@1*ALPHA`` (src/syntax.rs:8-10)."""
    return bool(KEYWORD_FORM_RE.match(s))


def split_prefix(s: str) -> tuple[str, str] | None:
    """Split ``s`` into (prefix, suffix) at the first ':' strictly after the
    first character; None when there is no such colon.

    Parity: src/iri.rs:43-54 — the first character is treated as a normal
    character, never a separator, so ``":foo"`` does not split and
    ``":foo:bar:"`` splits to ``(":foo", "bar:")``.
    """
    if not s:
        return None
    pos = s.find(":", 1)
    if pos == -1:
        return None
    return s[:pos], s[pos + 1 :]


def is_blank_node(s: str) -> bool:
    """Blank node identifier: prefix part is exactly ``_`` (src/iri.rs:20-23)."""
    parts = split_prefix(s)
    return parts is not None and parts[0] == "_"


def is_absolute_iri_ref(s: str) -> bool:
    """Reference heuristic: has a prefix and the suffix starts with ``//``
    (src/iri.rs:24-28, :62-64). This is RFC 3987 "IRI" (absolute form with
    optional fragment) under the reference's authority-based approximation."""
    parts = split_prefix(s)
    return parts is not None and parts[0] != "_" and parts[1].startswith("//")


def is_compact_iri(s: str) -> bool:
    """Compact IRI per the reference heuristic (src/iri.rs:57-59): anything
    that is neither blank-node-prefixed nor authority-based absolute,
    including strings with no colon at all."""
    return not is_blank_node(s) and not is_absolute_iri_ref(s)


def is_absolute_ref_or_blank_node(s: str) -> bool:
    """src/iri.rs:67-72."""
    parts = split_prefix(s)
    if parts is None:
        return False
    return parts[0] == "_" or parts[1].startswith("//")


def is_gen_delims(ch: str) -> bool:
    """RFC 3986 gen-delims (src/iri.rs:75-80)."""
    return ch in ":/?#[]@"


def looks_like_iri(s: str) -> bool:
    """Syntactic probe for an *absolute* IRI (scheme ":" ...), used where the
    reference calls ``IriStr::new`` (e.g. @base / @vocab validation)."""
    if _BAD_IRI_CHARS_RE.search(s):
        return False
    pos = s.find(":")
    if pos <= 0:
        return False
    return bool(_SCHEME_RE.match(s[:pos]))


def looks_like_iri_reference(s: str) -> bool:
    """Syntactic probe for an IRI *reference* (absolute or relative); where
    the reference calls ``IriReferenceStr::new``. Permissive by design —
    RFC 3987 iri-reference accepts nearly everything without spaces/controls."""
    return not _BAD_IRI_CHARS_RE.search(s)


# --------------------------------------------------------------------------
# RFC 3986 §5 reference resolution (public algorithm; the reference defers to
# the iri_string crate for this).
# --------------------------------------------------------------------------

_URI_SPLIT_RE = re.compile(
    r"^(?:([A-Za-z][A-Za-z0-9+.-]*):)?(//[^/?#]*)?([^?#]*)(?:\?([^#]*))?(?:#(.*))?$"
)


def _split_iri(s: str) -> tuple[str | None, str | None, str, str | None, str | None]:
    m = _URI_SPLIT_RE.match(s)
    assert m is not None  # the regex matches any string
    scheme, authority, path, query, fragment = m.groups()
    if authority is not None:
        authority = authority[2:]
    return scheme, authority, path, query, fragment


def _merge_paths(base_authority: str | None, base_path: str, ref_path: str) -> str:
    # RFC 3986 §5.3
    if base_authority is not None and base_path == "":
        return "/" + ref_path
    pos = base_path.rfind("/")
    if pos == -1:
        return ref_path
    return base_path[: pos + 1] + ref_path


def remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4."""
    output: list[str] = []
    while path:
        if path.startswith("../"):
            path = path[3:]
        elif path.startswith("./"):
            path = path[2:]
        elif path.startswith("/./"):
            path = "/" + path[3:]
        elif path == "/.":
            path = "/"
        elif path.startswith("/../"):
            path = "/" + path[4:]
            if output:
                output.pop()
        elif path == "/..":
            path = "/"
            if output:
                output.pop()
        elif path in (".", ".."):
            path = ""
        else:
            if path.startswith("/"):
                pos = path.find("/", 1)
            else:
                pos = path.find("/")
            if pos == -1:
                output.append(path)
                path = ""
            else:
                output.append(path[:pos])
                path = path[pos:]
    return "".join(output)


def resolve_iri(reference: str, base: str) -> str:
    """Resolve ``reference`` against absolute ``base`` per RFC 3986 §5.2
    (strict mode). Matches iri_string's ``resolve_against`` used at e.g.
    src/context/merge.rs:237-245 and src/context/merge/ctx_def.rs:236."""
    r_scheme, r_auth, r_path, r_query, r_frag = _split_iri(reference)
    b_scheme, b_auth, b_path, b_query, _ = _split_iri(base)

    if r_scheme is not None:
        scheme, authority, path, query = r_scheme, r_auth, remove_dot_segments(r_path), r_query
    else:
        if r_auth is not None:
            authority, path, query = r_auth, remove_dot_segments(r_path), r_query
        else:
            if r_path == "":
                path = b_path
                query = r_query if r_query is not None else b_query
            else:
                if r_path.startswith("/"):
                    path = remove_dot_segments(r_path)
                else:
                    path = remove_dot_segments(_merge_paths(b_auth, b_path, r_path))
                query = r_query
            authority = b_auth
        scheme = b_scheme

    out = []
    if scheme is not None:
        out.append(scheme + ":")
    if authority is not None:
        out.append("//" + authority)
    out.append(path)
    if query is not None:
        out.append("?" + query)
    if r_frag is not None:
        out.append("#" + r_frag)
    return "".join(out)


def relativize_iri(iri: str, base: str | None) -> str:
    """Best-effort inverse of :func:`resolve_iri` — JSON-LD API §6.3 step 8
    (the ``compactToRelative`` option): the shortest relative reference
    that resolves back to ``iri`` against ``base``.

    Every candidate is SELF-VERIFIED by resolving it back and comparing:
    anything that would not round-trip (or any shape this generator does
    not cover) falls back to the absolute IRI, so the output is correct by
    construction — lossy relativization is structurally impossible. Blank
    nodes and non-IRI strings fall out via the scheme/authority mismatch.
    """
    if not base or not iri:
        return iri
    t_scheme, t_auth, t_path, t_query, t_frag = _split_iri(iri)
    b_scheme, b_auth, b_path, _, _ = _split_iri(base)
    if t_scheme is None or t_scheme != b_scheme or t_auth != b_auth:
        return iri
    tail = ("?" + t_query if t_query is not None else "") + (
        "#" + t_frag if t_frag is not None else ""
    )
    candidates: list[str] = []
    if t_path == b_path:
        # same path: fragment-only / query+fragment references
        if t_frag is not None:
            candidates.append("#" + t_frag)
        if t_query is not None:
            candidates.append(tail)
    # segment-relative path: strip the common directory prefix, climb the
    # rest of the base directory with "../"
    b_segs = b_path.split("/")
    t_segs = t_path.split("/")
    i = 0
    while (
        i < len(b_segs) - 1
        and i < len(t_segs) - 1
        and b_segs[i] == t_segs[i]
    ):
        i += 1
    ups = len(b_segs) - 1 - i
    rel_path = "../" * ups + "/".join(t_segs[i:])
    if not rel_path:
        rel_path = "./"
    # a leading segment containing ":" would parse as a scheme
    if ":" in rel_path.split("/", 1)[0]:
        rel_path = "./" + rel_path
    candidates.append(rel_path + tail)
    candidates.append(t_path + tail)  # absolute-path reference
    for cand in sorted(set(candidates), key=lambda c: (len(c), c)):
        if cand and resolve_iri(cand, base) == iri:
            return cand
    return iri
