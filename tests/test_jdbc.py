"""S4/S5 JDBC smoke against embedded Derby (bundled with Spark — no
external DB needed): write_jdbc sink round-trips through read_jdbc's
whole-query pushdown, the reference's main I/O shape
(``/root/reference/src/database/connection.py:47-93``,
``src/etl/loaders.py:36-95``)."""

from __future__ import annotations

import pytest

from file_standardization_etl_spark.sources import readers

DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture(scope="module")
def derby_url(tmp_path_factory):
    return f"jdbc:derby:{tmp_path_factory.mktemp('derby')}/db;create=true"


def test_jdbc_write_then_query_pushdown(spark, derby_url):
    df = spark.createDataFrame(
        [(1, "STOCK", 10.5), (2, "SALES", -3.25), (3, "STOCK", 0.0)],
        "id int, context string, qty double",
    )
    readers.write_jdbc(
        df, derby_url, "load_info", mode="overwrite", driver=DRIVER,
        # Derby's dialect maps StringType -> CLOB, which can't be grouped;
        # pin a comparable type (standard Spark JDBC option)
        createTableColumnTypes="context VARCHAR(32)",
    )

    # S4: arbitrary SQL pushed down whole (filter + aggregate run in the DB)
    back = readers.read_jdbc(
        spark,
        derby_url,
        'SELECT "context", COUNT(*) AS n, SUM("qty") AS total '
        'FROM load_info WHERE "qty" >= 0 GROUP BY "context"',
        driver=DRIVER,
    )
    rows = {(r["context"], r["N"], r["TOTAL"]) for r in back.collect()}
    assert rows == {("STOCK", 2, 10.5)}


def test_jdbc_append_accumulates(spark, derby_url):
    df1 = spark.createDataFrame([(10, "A", 1.0)], "id int, context string, qty double")
    df2 = spark.createDataFrame([(11, "B", 2.0)], "id int, context string, qty double")
    readers.write_jdbc(df1, derby_url, "append_t", mode="overwrite", driver=DRIVER)
    readers.write_jdbc(df2, derby_url, "append_t", mode="append", driver=DRIVER)
    back = readers.read_jdbc(
        spark, derby_url, 'SELECT COUNT(*) AS n FROM append_t', driver=DRIVER
    )
    assert back.collect()[0]["N"] == 2
