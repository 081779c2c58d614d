"""Context dictionary: the offline replacement for the remote-document loader.

The reference defines an async ``LoadRemoteDocument`` interface
(src/remote.rs:21-44) whose caching contract says a context MUST NOT be
re-dereferenced (src/remote.rs:29-38); its own remote path is unreachable
(quirk R1). Our engine's equivalent is a small ``contexts(ctx_iri, ctx_json)``
table, resolved and *compiled* once on the driver and shipped to executors via
broadcast/closure capture — executors never do network I/O (SURVEY.md §2 S3).

The built-in fixture dictionary below follows FIXTURES.md §2 — each entry
exercises a distinct reference algorithm branch (citations inline).
"""

from __future__ import annotations

import json
from typing import Mapping, NamedTuple, Optional

from .kernel import (
    Context,
    ErrorCode,
    JsonLdError,
    LoadDocumentOptions,
    ProcessorOptions,
    process_context,
)


class RemoteDocument(NamedTuple):
    """Mirror of reference ``RemoteDocument`` (src/remote.rs:112-120)."""

    context_url: Optional[str]
    document_url: str
    document: dict

# ctx_iri → context *document* (a JSON object containing "@context").
FIXTURE_CONTEXTS: dict[str, dict] = {
    # vocab concat (src/expand/iri.rs:299-303) + base resolution
    # (src/context/merge/ctx_def.rs:204-259)
    "https://example.org/ctx/base": {
        "@context": {
            "@vocab": "http://ex.org/v#",
            "@base": "http://ex.org/d/",
            "name": "http://schema.org/name",
        }
    },
    # compact-IRI expansion + prefix recursion
    # (src/context/create_term_def/non_reverse.rs:232-254, expand/iri.rs:274-297)
    "https://example.org/ctx/prefix": {
        "@context": {
            "schema": "http://schema.org/",
            "knows": {"@id": "schema:knows", "@type": "@id"},
            "name": "schema:name",
        }
    },
    # typed / language / direction / container terms
    # (create_term_def.rs:277-320, non_reverse.rs:104-130,303-358)
    "https://example.org/ctx/typed": {
        "@context": {
            "ex": "http://ex.org/",
            "when": {"@id": "ex:when",
                     "@type": "http://www.w3.org/2001/XMLSchema#dateTime"},
            "label": {"@id": "ex:label", "@language": "en", "@direction": "ltr"},
            "tags": {"@id": "ex:tags", "@container": "@list"},
            "alts": {"@id": "ex:alts", "@container": "@set"},
            "ref": {"@id": "ex:ref", "@type": "@id"},
        }
    },
    # reverse terms (src/context/create_term_def/reverse.rs:27-87)
    "https://example.org/ctx/reverse": {
        "@context": {
            "schema": "http://schema.org/",
            "isKnownBy": {"@reverse": "schema:knows"},
        }
    },
    # null tombstone blocks @vocab fallback — W3C t0032
    # (src/expand/iri.rs:261-272)
    "https://example.org/ctx/nullterm": {
        "@context": {
            "@vocab": "http://ex.org/v#",
            "schema": "http://schema.org/",
            "hidden": None,
        }
    },
    # protected terms (non_reverse.rs:518-537)
    "https://example.org/ctx/protected": {
        "@context": {
            "@protected": True,
            "schema": "http://schema.org/",
            "name": "schema:name",
        }
    },
    # term-scoped context (non_reverse.rs:397-422)
    "https://example.org/ctx/scoped": {
        "@context": {
            "ex": "http://ex.org/",
            "detail": {"@id": "ex:detail",
                       "@context": {"inner": "ex:inner"}},
        }
    },
    # array-of-contexts merge order (src/context/merge.rs:149-195)
    "https://example.org/ctx/array": {
        "@context": [
            {"name": "http://schema.org/name"},
            {"@vocab": "http://ex.org/v#"},
        ]
    },
}

DEFAULT_DOCUMENT_IRI = "https://example.org/transcripts/"


class ContextDict:
    """Pre-resolved context dictionary + driver-side compile cache.

    ``raw`` maps ctx_iri → context document (used by the kernel loader);
    ``compiled(iri)`` memoizes fully-processed active contexts so executors
    do pure dict lookups on the hot path.
    """

    def __init__(
        self,
        raw: Optional[Mapping[str, dict]] = None,
        document_iri: str = DEFAULT_DOCUMENT_IRI,
    ) -> None:
        self.raw: dict[str, dict] = dict(raw if raw is not None else FIXTURE_CONTEXTS)
        self.document_iri = document_iri
        self._compiled: dict[str, Context] = {}

    @property
    def processor(self) -> ProcessorOptions:
        return ProcessorOptions(
            document_iri=self.document_iri, context_loader=self.raw
        )

    def load(
        self, iri: str, options: Optional[LoadDocumentOptions] = None
    ) -> RemoteDocument:
        """``LoadRemoteDocument::load`` surface (src/remote.rs:39-109):
        dictionary lookup honoring the caching contract trivially (the dict
        IS the cache; a context is never re-dereferenced, :29-38), raising
        the spec error on a miss (src/error.rs:196-198).

        ``options`` (extract_all_scripts / profile / request_profile) are
        accepted for API parity but have no observable effect here: they
        only matter for HTML script extraction and HTTP content
        negotiation, and this loader is offline by design — the same
        reason the reference's own remote path is unreachable (quirk R1).
        """
        _ = options or LoadDocumentOptions()
        doc = self.raw.get(iri)
        if doc is None:
            raise JsonLdError(ErrorCode.LOADING_REMOTE_CONTEXT_FAILED, iri)
        return RemoteDocument(context_url=None, document_url=iri, document=doc)

    def compiled(self, ctx_iri: str) -> Context:
        if ctx_iri not in self._compiled:
            base_ctx = Context(base=self.document_iri)
            self._compiled[ctx_iri] = process_context(
                self.processor, base_ctx, ctx_iri, self.document_iri
            )
        return self._compiled[ctx_iri]

    def compile_all(self) -> dict[str, Context]:
        for iri in self.raw:
            self.compiled(iri)
        return dict(self._compiled)

    def as_rows(self) -> list[tuple[str, str]]:
        """(ctx_iri, ctx_json) rows for materializing the contexts table."""
        return [(iri, json.dumps(doc, sort_keys=True)) for iri, doc in self.raw.items()]

    @classmethod
    def from_table(cls, spark, path_or_df, document_iri: str = DEFAULT_DOCUMENT_IRI):
        """Load from a contexts(ctx_iri, ctx_json) parquet/table — the small
        table is collected to the driver, matching broadcast sizing."""
        df = (
            spark.read.parquet(path_or_df)
            if isinstance(path_or_df, str)
            else path_or_df
        )
        raw = {
            r["ctx_iri"]: json.loads(r["ctx_json"])
            for r in df.select("ctx_iri", "ctx_json").collect()
        }
        return cls(raw, document_iri)
