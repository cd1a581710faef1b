"""Indexed-field specifications (SURVEY.md §1.1: documents are bags of
named fields, each with its own analyzer — [up] core/index/index_writer.hpp
documents_context::insert takes per-field analyzers).

A FieldSpec binds an index field name to a corpus source column and an
analyzer spec string (iresearch_spark.analysis.analyzers). The special
source "__text__" is the default web path: html -> frozen extraction,
falling back to the `text` column for rows with null html.

The spec list is frozen into the snapshot manifest at build time, so a
reader always scores with the exact analysis the index was built with.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class FieldSpec:
    name: str
    source: str = "__text__"
    analyzer: str = "text"
    # A8 index feature flag ([up] core/analysis/token_attributes.hpp ::
    # offset): store per-occurrence (start char, length) spans alongside
    # positions — enables offset-based highlighting. Opt-in per field,
    # exactly like the reference's per-field index features.
    offsets: bool = False
    # A8 payload attribute ([up] core/analysis/token_attributes.hpp ::
    # payload): store per-occurrence analyzer-produced payload blobs —
    # here the SURFACE FORM of the occurrence (the token fed to the final
    # pipeline stage, e.g. the pre-stem word under "text|stem"), encoded
    # as its code-point sequence. Requires offsets=True (payload slices
    # are delimited by the span lengths at decode time).
    payloads: bool = False

    def __post_init__(self) -> None:
        if self.payloads and not self.offsets:
            raise ValueError(
                f"field {self.name!r}: payloads=True requires offsets=True "
                "(payload slices are delimited by span lengths)"
            )

    def to_json(self) -> dict:
        return {
            "name": self.name,
            "source": self.source,
            "analyzer": self.analyzer,
            "offsets": self.offsets,
            "payloads": self.payloads,
        }

    @classmethod
    def from_json(cls, d: dict) -> "FieldSpec":
        return cls(
            d["name"],
            d["source"],
            d["analyzer"],
            bool(d.get("offsets", False)),
            bool(d.get("payloads", False)),
        )


DEFAULT_FIELDS: tuple[FieldSpec, ...] = (FieldSpec("text", "__text__", "text"),)
