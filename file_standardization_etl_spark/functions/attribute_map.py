"""dd_attribute_detail-driven column mapping: the reference's dynamic
schema registry applied to a positional string grid.

The reference looks up, per entity, rows of ``dd_attribute_detail``
(``original_column_name, second_column_name, etl_column_name,
column_position, starting_row, is_mandatory`` —
``/root/reference/config/queries.py:117-131``) and matches them against
the raw grid two ways (``repomix-output.xml:7423-7549``):

- **TABULAR**: by header NAME — the grid's header row is normalized with
  the F1 cleanup (strip → drop ``[^\\w\\s]`` → whitespace→``_`` → upper,
  ``src/etl/transformers.py:22-44``) and compared against the normalized
  ``original_column_name`` or ``second_column_name``;
- **POSITION / CUSTOM POSITION / CUSTOMRAFED**: by ``column_position``
  (1-based, the grid's c1..cN names).

Spark-first shape: the header is ONE driver-side row lookup (a schema
decision, like any DDL — no payload moves), the mapping itself is a pure
``select`` with aliases/casts, so the data path stays a single projected
scan with full codegen. Unmatched mandatory attributes raise — the
reference's schema validators made the same check
(``src/validation/schema_validator.py:24-109``).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

POSITION_STRUCTURES = ("POSITION", "CUSTOM POSITION", "CUSTOMRAFED")


@dataclass
class AttributeSpec:
    """One dd_attribute_detail row (types optional — the reference's grid
    is all-string; a DDL type here adds the downstream coercion F15)."""

    etl_column_name: str
    original_column_name: str | None = None
    second_column_name: str | None = None
    column_position: int | None = None
    starting_row: int = 1
    is_mandatory: bool = False
    type_ddl: str | None = None


def normalize_header(name: str | None) -> str | None:
    """F1 column-name cleanup (transformers.py:22-44), driver-side."""
    if name is None:
        return None
    import re

    out = re.sub(r"[^\w\s]", "", str(name).strip())
    out = re.sub(r"\s+", "_", out)
    return out.upper()


def apply_attribute_mapping(
    grid: DataFrame,
    attrs: list[AttributeSpec],
    structure: str = "TABULAR",
    row_idx_col: str = "row_idx",
    header_row: int = 0,
) -> DataFrame:
    """Map a positional string grid (columns ``c1..cN`` + a row index) to
    its canonical columns per the attribute specs. Returns the data rows
    (``row_idx >= max(starting_row)``) projected to the etl names, cast
    where a spec carries a type.
    """
    if structure == "TABULAR":
        hdr = grid.filter(F.col(row_idx_col) == header_row).first()
        if hdr is None:
            raise ValueError("grid has no header row")
        by_norm: dict[str, str] = {}
        for col in grid.columns:
            if col == row_idx_col:
                continue
            key = normalize_header(hdr[col])
            if key and key not in by_norm:  # first occurrence wins (W3 dedup)
                by_norm[key] = col
        resolved: list[tuple[AttributeSpec, str | None]] = []
        for a in attrs:
            src = by_norm.get(normalize_header(a.original_column_name) or "")
            if src is None:
                src = by_norm.get(normalize_header(a.second_column_name) or "")
            resolved.append((a, src))
    elif structure in POSITION_STRUCTURES:
        resolved = []
        for a in attrs:
            src = f"c{a.column_position}" if a.column_position else None
            resolved.append((a, src if src in grid.columns else None))
    else:
        raise ValueError(f"unknown structure: {structure}")

    missing = [a.etl_column_name for a, src in resolved if src is None and a.is_mandatory]
    if missing:
        raise ValueError(f"mandatory attributes unmatched: {missing}")

    start = max((a.starting_row for a, _ in resolved), default=1)
    cols = []
    for a, src in resolved:
        c = F.col(src) if src is not None else F.lit(None).cast("string")
        if a.type_ddl:
            c = c.cast(a.type_ddl)
        cols.append(c.alias(a.etl_column_name))
    return grid.filter(F.col(row_idx_col) >= start).select(*cols)
