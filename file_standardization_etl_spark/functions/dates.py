"""The reference's multi-format trial date parser as one column expression.

The reference ships a 42-format table (``/root/reference/config/settings.py:16-71``
``DATE_FORMATS``) consumed by a per-value Python trial loop
(``/root/reference/src/utils/date_utils.py:10-38``: try each format in list
order, first successful parse wins). The monolith generation extends the
table with 12 no-separator day/month-first variants
(``/root/reference/repomix-output.xml:7195-7258``), for 54 total.

Here the whole trial loop is ONE Catalyst expression —
``coalesce(try_to_timestamp(col, f) for f in FORMATS)`` — evaluated
JVM-side inside whole-stage codegen, no UDF. ``coalesce`` preserves the
reference's first-match-wins trial order exactly, including its
deliberate ambiguity resolution (e.g. ``'311224'`` matches ``%y%m%d``
before ``%d%m%y`` because that's the order the table lists them).

Century semantics: the reference parses ``%y`` with Python strptime =
POSIX rules (00-68 → 2000s, 69-99 → 1900s). Spark's ``yy`` pattern maps
to 2000-2099 instead, so every ``%y`` format gets a century correction
(year ≥ 2069 → minus 100 years; leap-validity is unaffected because
19xx/20xx share leap parity for xx ≥ 69). DuckDB's ``try_strptime`` is
already POSIX — the oracle needs no fix.

Strictness: every trial is gated on the string's length equaling the
format's canonical rendered length (all fields are fixed-width: %Y=4,
everything else 2). This pins ONE portable semantics for degenerate
inputs where the three parsers genuinely disagree — Python's regex
backtracks ('290195' + '%d%m%Y' → year 195!), DuckDB accepts 2-digit
%Y ('95' → year 0095), Spark strictly rejects — none of which the
reference's canonical fixed-width examples (settings.py comments:
'31122024' for '%d%m%Y') ever relied on. With the gate, a string only
reaches parsers it fits, where all engines agree.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# The canonical table, in the reference's trial order
# (config/settings.py:16-71).
DATE_FORMATS: list[str] = [
    # 4-digit year, hyphen-separated
    "%Y-%m-%d %H%M%S", "%Y-%m-%d %H%M", "%Y-%m-%d",
    "%d-%m-%Y %H%M%S", "%d-%m-%Y %H%M", "%d-%m-%Y",
    "%m-%d-%Y %H%M%S", "%m-%d-%Y %H%M", "%m-%d-%Y",
    # 4-digit year, dot-separated
    "%Y.%m.%d %H%M%S", "%Y.%m.%d %H%M", "%Y.%m.%d",
    "%d.%m.%Y %H%M%S", "%d.%m.%Y %H%M", "%d.%m.%Y",
    "%m.%d.%Y %H%M%S", "%m.%d.%Y %H%M", "%m.%d.%Y",
    # 4-digit year, no separator
    "%Y%m%d%H%M%S", "%Y%m%d%H%M", "%Y%m%d",
    # 2-digit year, hyphen-separated
    "%d-%m-%y %H%M%S", "%d-%m-%y %H%M", "%d-%m-%y",
    "%y-%m-%d %H%M%S", "%y-%m-%d %H%M", "%y-%m-%d",
    "%m-%d-%y %H%M%S", "%m-%d-%y %H%M", "%m-%d-%y",
    # 2-digit year, dot-separated
    "%d.%m.%y %H%M%S", "%d.%m.%y %H%M", "%d.%m.%y",
    "%y.%m.%d %H%M%S", "%y.%m.%d %H%M", "%y.%m.%d",
    "%m.%d.%y %H%M%S", "%m.%d.%y %H%M", "%m.%d.%y",
    # 2-digit year, no separator
    "%y%m%d%H%M%S", "%y%m%d%H%M", "%y%m%d",
]

# Monolith extension (repomix-output.xml:7218-7226, 7250-7258): the
# no-separator day-first / month-first variants, appended after their
# 4-digit / 2-digit no-separator groups respectively — preserving the
# monolith list's relative order.
_EXT_4DIGIT = ["%d%m%Y%H%M%S", "%d%m%Y%H%M", "%d%m%Y",
               "%m%d%Y%H%M%S", "%m%d%Y%H%M", "%m%d%Y"]
_EXT_2DIGIT = ["%d%m%y%H%M%S", "%d%m%y%H%M", "%d%m%y",
               "%m%d%y%H%M%S", "%m%d%y%H%M", "%m%d%y"]

DATE_FORMATS_EXTENDED: list[str] = (
    DATE_FORMATS[: DATE_FORMATS.index("%d-%m-%y %H%M%S")]
    + _EXT_4DIGIT
    + DATE_FORMATS[DATE_FORMATS.index("%d-%m-%y %H%M%S"):]
    + _EXT_2DIGIT
)

_STRPTIME_TO_SPARK = [
    ("%Y", "yyyy"), ("%m", "MM"), ("%d", "dd"),
    ("%H", "HH"), ("%M", "mm"), ("%S", "ss"), ("%y", "yy"),
]


def spark_pattern(strptime_fmt: str) -> str:
    """Python strptime format → Spark datetime pattern."""
    out = strptime_fmt
    for a, b in _STRPTIME_TO_SPARK:
        out = out.replace(a, b)
    return out


def rendered_length(strptime_fmt: str) -> int:
    """Canonical fixed-width rendered length of a format (%Y=4, other
    fields 2, literals verbatim)."""
    n, i = 0, 0
    while i < len(strptime_fmt):
        if strptime_fmt[i] == "%":
            n += 4 if strptime_fmt[i + 1] == "Y" else 2
            i += 2
        else:
            n += 1
            i += 1
    return n


def try_parse(col: Column, strptime_fmt: str) -> Column:
    """One trial: length-gated ``try_to_timestamp`` with the POSIX century
    correction for 2-digit years (see module docstring)."""
    t = F.try_to_timestamp(col, F.lit(spark_pattern(strptime_fmt)))
    if "%y" in strptime_fmt:
        t = F.when(F.year(t) >= 2069, t - F.expr("INTERVAL '100' YEAR")).otherwise(t)
    return F.when(F.length(col) == rendered_length(strptime_fmt), t)


def parse_any_ts(col: Column, formats: list[str] | None = None) -> Column:
    """The reference's trial loop (date_utils.py:10-38) as one expression:
    first format in the table that parses wins; null if none do."""
    formats = formats or DATE_FORMATS_EXTENDED
    return F.coalesce(*[try_parse(col, f) for f in formats])


def duckdb_parse_any_sql(expr: str, formats: list[str] | None = None) -> str:
    """The identical trial loop for the DuckDB oracle (try_strptime is
    already POSIX for %y)."""
    formats = formats or DATE_FORMATS_EXTENDED
    trials = ", ".join(
        f"CASE WHEN length({expr}) = {rendered_length(f)} "
        f"THEN try_strptime({expr}, '{f}') END"
        for f in formats
    )
    return f"COALESCE({trials})"
