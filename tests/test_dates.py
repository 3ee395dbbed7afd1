"""The 54-format trial date parser (functions/dates.py) vs a pure-Python
reference implementing the same loop as the reference repo's
``src/utils/date_utils.py:10-38`` (try formats in table order, first
success wins), pinned to the engine's portable semantics: fixed-width
length gate + POSIX %y century."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from file_standardization_etl_spark.functions.dates import (
    DATE_FORMATS,
    DATE_FORMATS_EXTENDED,
    parse_any_ts,
    rendered_length,
)

SAMPLES = [
    datetime.datetime(1996, 3, 5, 23, 59, 59),
    datetime.datetime(2024, 12, 31, 1, 2, 3),
    datetime.datetime(2001, 1, 1, 0, 0, 0),
    datetime.datetime(1987, 11, 30, 12, 30, 45),
    datetime.datetime(2068, 6, 15, 6, 7, 8),   # POSIX pivot edge: 68 -> 2068
    datetime.datetime(1969, 7, 20, 20, 17, 0),  # POSIX pivot edge: 69 -> 1969
]


def py_reference_parse(s: str) -> datetime.datetime | None:
    """The reference's trial loop with the engine's pinned semantics."""
    for f in DATE_FORMATS_EXTENDED:
        if len(s) != rendered_length(f):
            continue
        try:
            return datetime.datetime.strptime(s, f)
        except ValueError:
            continue
    return None


def test_format_tables():
    assert len(DATE_FORMATS) == 42  # config/settings.py:16-71
    assert len(DATE_FORMATS_EXTENDED) == 54  # + monolith extension
    assert len(set(DATE_FORMATS_EXTENDED)) == 54


def test_trial_parse_matches_python_reference(spark):
    rows = []
    for d in SAMPLES:
        for f in DATE_FORMATS_EXTENDED:
            rows.append((d.strftime(f),))
    df = spark.createDataFrame(rows, "s string")
    got = {
        r["s"]: r["p"]
        for r in df.select("s", parse_any_ts(F.col("s")).alias("p")).collect()
    }
    for s in {r[0] for r in rows}:
        expect = py_reference_parse(s)
        assert got[s] == expect, f"{s!r}: spark={got[s]!r} python={expect!r}"


def test_unparseable_stays_null(spark):
    df = spark.createDataFrame(
        [("not a date",), ("2024-13-45",), ("",), ("99999999999999",)], "s string"
    )
    out = df.select(parse_any_ts(F.col("s")).alias("p")).collect()
    assert all(r["p"] is None for r in out)
