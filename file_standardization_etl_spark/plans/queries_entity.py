"""J6/J7 fidelity: the reference's four-strategy entity-match cascade with
its REAL normalizations, end-to-end over synthesized dd_entity-style
metadata — one precedence-union + row_number plan instead of four
count()-gated JDBC round trips.

Reference semantics reproduced (``/root/reference/``):

- strategy order: sheet → extension → sender-only → country+filename
  (``src/database/operations.py:129-162``);
- S1: ``data_owner_mail = sender`` AND digit-stripped lowercased sheet
  names equal (``config/queries.py:48-72``, the
  ``lower(regexp_replace(sheet_name, '[0-9]', '', 'g'))`` key);
- S2: normalized extension equality — extension = text after the last
  '.' else 'EMPTY', strip lowercase 'n', COALESCE null → 'file_ext',
  upper, XLS → XLSX; the daq side additionally folds İ → I
  (``config/queries.py:75-114``);
- S3: ``data_owner_mail = sender`` alone (``config/queries.py:141-154``);
- S4: S2's extension equality AND (space-stripped İ-folded upper owner =
  sender, OR email-domain(data_owner_mail) = sender, OR (entity country =
  country routed from the receiver via email_connection_info ×
  dim_countries AND filename-prefix-before-[-.]  equality))
  (``config/queries.py:157-231``);
- ``is_api = 0`` filter on every strategy; first non-empty strategy wins
  → here: precedence tag + ``row_number() over (partition by event order
  by precedence)`` = 1.

Faithfulness note the collapse makes visible: S4's WHERE clause is a
strict superset of S2's (both start from the identical normalized
extension equality, ``config/queries.py:104-113`` vs ``:186-200``), so
any row S4 could return would already have been returned by S2 — in the
reference the fourth strategy is reachable only when S2's *result set*
is empty, which the subset relation makes impossible for non-empty S4.
The cascade therefore effectively resolves through strategies 1-3; S4 is
kept in the plan for fidelity and tagged so the shadowing is observable.

The metadata tables are synthesized deterministically from the shared
testdata (entities from ``part``, events from ``orders``, routing from
``nation``/``region``) with the same expressions on both engines, so the
oracle checks the full cascade bitwise. All entity-side joins broadcast —
metadata is tiny next to the event log, exactly the reference's shape.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .queries import load

# ---------------------------------------------------------------------------
# shared derivations (kept as SQL-expression strings usable by BOTH engines
# modulo the tiny dialect differences handled below)
# ---------------------------------------------------------------------------


def _entities(spark, sf_dir):
    p = load(spark, sf_dir, "part").filter(F.col("p_partkey") < 60)
    eid = F.col("p_partkey").cast("long")
    base = F.concat(F.lit("FT"), (eid % 6).cast("string"))
    ext = (
        F.when(eid % 5 == 0, F.lit(".xls"))
        .when(eid % 5 == 1, F.lit(".xlsx"))
        .when(eid % 5 == 2, F.lit(".csv"))
        .when(eid % 5 == 3, F.lit(".xlsn"))
        .otherwise(F.lit(""))
    )
    sheet = F.concat(
        F.when(eid % 4 == 0, F.lit("Stock"))
        .when(eid % 4 == 1, F.lit("Sales"))
        .when(eid % 4 == 2, F.lit("Inv"))
        .otherwise(F.lit("Data")),
        (eid % 9).cast("string"),
    )
    owner = (
        F.when(eid % 3 == 0, F.concat(F.lit("OWNER "), (eid % 10).cast("string")))
        .when(eid % 3 == 1, F.concat(F.lit("İSTANBUL CO "), (eid % 10).cast("string")))
        .otherwise(F.concat(F.lit("ACME"), (eid % 10).cast("string")))
    )
    return p.select(
        eid.alias("eid"),
        F.concat(base, F.lit("-"), eid.cast("string"), ext).alias("file_table_name"),
        sheet.alias("entity_sheet"),
        owner.alias("data_owner"),
        F.concat(
            F.lit("owner"), (eid % 10).cast("string"),
            F.lit("@corp"), (eid % 5).cast("string"), F.lit(".com"),
        ).alias("data_owner_mail"),
        F.concat(F.lit("COUNTRY_"), (eid % 5).cast("string")).alias("country"),
        F.when(eid % 13 == 0, F.lit(1)).otherwise(F.lit(0)).alias("is_api"),
    )


def _daq(spark, sf_dir):
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 400)
    i = F.col("o_orderkey").cast("long")
    sheet = F.concat(
        F.when(i % 5 == 0, F.lit("Stock"))
        .when(i % 5 == 1, F.lit("Sales"))
        .when(i % 5 == 2, F.lit("Inv"))
        .when(i % 5 == 3, F.lit("Data"))
        .otherwise(F.lit("Misc")),
        (i % 7).cast("string"),
    )
    file = F.concat(
        F.lit("FT"), (i % 8).cast("string"),
        F.when(i % 4 == 0, F.lit("-x.xls"))
        .when(i % 4 == 1, F.lit(".xlsx"))
        .when(i % 4 == 2, F.lit(".pdf"))
        .otherwise(F.lit(".csvn")),
    )
    sender = F.when(
        i % 17 == 0, F.concat(F.lit("corp"), (i % 5).cast("string"))
    ).otherwise(
        F.concat(
            F.lit("owner"), (i % 11).cast("string"),
            F.lit("@corp"), (i % 4).cast("string"), F.lit(".com"),
        )
    )
    return o.select(
        i.alias("id"),
        sheet.alias("daq_sheet"),
        file.alias("file"),
        sender.alias("sender"),
        F.concat(F.lit("recv"), (i % 6).cast("string"), F.lit("@mail.com")).alias(
            "receiver"
        ),
    )


def _sheet_key(col):
    """lower(regexp_replace(x, '[0-9]', '')) — config/queries.py:59-63."""
    return F.lower(F.regexp_replace(col, "[0-9]", ""))


def _file_ext(col):
    """After-last-dot extension else 'EMPTY' — config/queries.py:14-18."""
    return F.when(
        col.contains("."), F.element_at(F.split(col, "\\."), -1)
    ).otherwise(F.lit("EMPTY"))


def _ext_norm(col, fold_turkish: bool):
    """strip 'n' → coalesce 'file_ext' → upper (→ İ-fold on the daq side)
    → XLS→XLSX — config/queries.py:104-113."""
    e = F.upper(F.coalesce(F.replace(col, F.lit("n"), F.lit("")), F.lit("file_ext")))
    if fold_turkish:
        e = F.replace(e, F.lit("İ"), F.lit("I"))
    return F.when(e == "XLS", F.lit("XLSX")).otherwise(e)


def _owner_norm(col):
    """replace(replace(upper(x),'İ','I'),' ','') — config/queries.py:186."""
    return F.replace(F.replace(F.upper(col), F.lit("İ"), F.lit("I")), F.lit(" "), F.lit(""))


def _prefix(col):
    """Text before the first '-' else first '.' else whole —
    config/queries.py:211-229."""
    return (
        F.when(col.contains("-"), F.substring_index(col, "-", 1))
        .when(col.contains("."), F.substring_index(col, ".", 1))
        .otherwise(col)
    )


def q_join_entity_cascade(spark, sf_dir):
    """One deterministic routing plan for the reference's 4-strategy
    cascade (see module docstring). Output: one row per matched event —
    winning precedence/strategy + the matched entity (deterministic
    tiebreak by entity id within a precedence)."""
    e = _entities(spark, sf_dir).filter(F.col("is_api") == 0)
    e = e.select(
        "*",
        _sheet_key(F.col("entity_sheet")).alias("e_sheet_key"),
        _ext_norm(_file_ext(F.col("file_table_name")), fold_turkish=False).alias("e_ext"),
        _prefix(F.col("file_table_name")).alias("e_prefix"),
        _owner_norm(F.col("data_owner")).alias("e_owner_norm"),
        F.regexp_extract(F.col("data_owner_mail"), "@([^.]+)", 1).alias("e_domain"),
    )
    conn = load(spark, sf_dir, "nation").filter(F.col("n_nationkey") < 6).select(
        F.concat(F.lit("recv"), F.col("n_nationkey").cast("string"), F.lit("@mail.com")).alias(
            "email_address"
        ),
        (F.col("n_nationkey") % 5).cast("long").alias("country_id"),
    )
    countries = load(spark, sf_dir, "region").select(
        F.col("r_regionkey").cast("long").alias("country_id"),
        F.concat(F.lit("COUNTRY_"), F.col("r_regionkey").cast("string")).alias("country_name"),
    )
    d = _daq(spark, sf_dir)
    d = d.select(
        "*",
        _sheet_key(F.col("daq_sheet")).alias("d_sheet_key"),
        _ext_norm(_file_ext(F.col("file")), fold_turkish=True).alias("d_ext"),
        _prefix(F.col("file")).alias("d_prefix"),
        _owner_norm(F.col("sender")).alias("d_sender_norm"),
    )
    # receiver → country routing (J4's two-table scalar lookup, per event)
    d = d.join(F.broadcast(conn), d.receiver == conn.email_address, "left").join(
        F.broadcast(countries), "country_id", "left"
    ).drop("email_address", "country_id")

    be = F.broadcast(e)
    s1 = d.join(
        be,
        (e.data_owner_mail == d.sender) & (e.e_sheet_key == d.d_sheet_key),
    ).select(d["*"], be["*"]).withColumn("prec", F.lit(1))
    s2 = d.join(be, e.e_ext == d.d_ext).select(d["*"], be["*"]).withColumn(
        "prec", F.lit(2)
    )
    s3 = d.join(be, e.data_owner_mail == d.sender).select(d["*"], be["*"]).withColumn(
        "prec", F.lit(3)
    )
    s4 = d.join(
        be,
        (e.e_ext == d.d_ext)
        & (
            (e.e_owner_norm == d.d_sender_norm)
            | (e.e_domain == d.sender)
            | (
                (e.country == d.country_name)
                & (e.e_prefix == d.d_prefix)
            )
        ),
    ).select(d["*"], be["*"]).withColumn("prec", F.lit(4))

    allm = s1.unionByName(s2).unionByName(s3).unionByName(s4)
    w = Window.partitionBy("id").orderBy("prec", "eid")
    first = allm.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    strategy = (
        F.when(F.col("prec") == 1, F.lit("sheet"))
        .when(F.col("prec") == 2, F.lit("extension"))
        .when(F.col("prec") == 3, F.lit("sender"))
        .otherwise(F.lit("country_filename"))
    )
    return first.select(
        "id",
        "prec",
        strategy.alias("strategy"),
        "eid",
        "data_owner",
        F.col("file_table_name").alias("entity_file_table_name"),
        "entity_sheet",
    )


SQL_JOIN_ENTITY_CASCADE = """
WITH e0 AS (
  SELECT CAST(p_partkey AS BIGINT) AS eid FROM part WHERE p_partkey < 60
), e1 AS (
  SELECT eid,
         'FT' || CAST(eid % 6 AS VARCHAR) || '-' || CAST(eid AS VARCHAR) ||
           CASE eid % 5 WHEN 0 THEN '.xls' WHEN 1 THEN '.xlsx'
                        WHEN 2 THEN '.csv' WHEN 3 THEN '.xlsn' ELSE '' END AS file_table_name,
         (CASE eid % 4 WHEN 0 THEN 'Stock' WHEN 1 THEN 'Sales'
                       WHEN 2 THEN 'Inv' ELSE 'Data' END) || CAST(eid % 9 AS VARCHAR) AS entity_sheet,
         CASE eid % 3 WHEN 0 THEN 'OWNER ' || CAST(eid % 10 AS VARCHAR)
                      WHEN 1 THEN 'İSTANBUL CO ' || CAST(eid % 10 AS VARCHAR)
                      ELSE 'ACME' || CAST(eid % 10 AS VARCHAR) END AS data_owner,
         'owner' || CAST(eid % 10 AS VARCHAR) || '@corp' || CAST(eid % 5 AS VARCHAR) || '.com' AS data_owner_mail,
         'COUNTRY_' || CAST(eid % 5 AS VARCHAR) AS country,
         CASE WHEN eid % 13 = 0 THEN 1 ELSE 0 END AS is_api
  FROM e0
), e AS (
  SELECT *,
         lower(regexp_replace(entity_sheet, '[0-9]', '', 'g')) AS e_sheet_key,
         CASE WHEN ue = 'XLS' THEN 'XLSX' ELSE ue END AS e_ext,
         CASE WHEN position('-' IN file_table_name) > 0
              THEN substring(file_table_name, 1, position('-' IN file_table_name) - 1)
              WHEN position('.' IN file_table_name) > 0
              THEN substring(file_table_name, 1, position('.' IN file_table_name) - 1)
              ELSE file_table_name END AS e_prefix,
         replace(replace(upper(data_owner), 'İ', 'I'), ' ', '') AS e_owner_norm,
         regexp_extract(data_owner_mail, '@([^.]+)', 1) AS e_domain
  FROM (
    SELECT *,
           upper(COALESCE(replace(
             CASE WHEN position('.' IN file_table_name) > 0
                  THEN string_split(file_table_name, '.')[len(string_split(file_table_name, '.'))]
                  ELSE 'EMPTY' END, 'n', ''), 'file_ext')) AS ue
    FROM e1
  ) WHERE is_api = 0
), d0 AS (
  SELECT CAST(o_orderkey AS BIGINT) AS id FROM orders WHERE o_orderkey < 400
), d1 AS (
  SELECT id,
         (CASE id % 5 WHEN 0 THEN 'Stock' WHEN 1 THEN 'Sales' WHEN 2 THEN 'Inv'
                      WHEN 3 THEN 'Data' ELSE 'Misc' END) || CAST(id % 7 AS VARCHAR) AS daq_sheet,
         'FT' || CAST(id % 8 AS VARCHAR) ||
           CASE id % 4 WHEN 0 THEN '-x.xls' WHEN 1 THEN '.xlsx'
                       WHEN 2 THEN '.pdf' ELSE '.csvn' END AS file,
         CASE WHEN id % 17 = 0 THEN 'corp' || CAST(id % 5 AS VARCHAR)
              ELSE 'owner' || CAST(id % 11 AS VARCHAR) || '@corp' || CAST(id % 4 AS VARCHAR) || '.com' END AS sender,
         'recv' || CAST(id % 6 AS VARCHAR) || '@mail.com' AS receiver
  FROM d0
), conn AS (
  SELECT 'recv' || CAST(n_nationkey AS VARCHAR) || '@mail.com' AS email_address,
         CAST(n_nationkey % 5 AS BIGINT) AS country_id
  FROM nation WHERE n_nationkey < 6
), countries AS (
  SELECT CAST(r_regionkey AS BIGINT) AS country_id,
         'COUNTRY_' || CAST(r_regionkey AS VARCHAR) AS country_name
  FROM region
), d AS (
  SELECT d2.*, countries.country_name
  FROM (
    SELECT *,
           lower(regexp_replace(daq_sheet, '[0-9]', '', 'g')) AS d_sheet_key,
           CASE WHEN ud = 'XLS' THEN 'XLSX' ELSE ud END AS d_ext,
           CASE WHEN position('-' IN file) > 0
                THEN substring(file, 1, position('-' IN file) - 1)
                WHEN position('.' IN file) > 0
                THEN substring(file, 1, position('.' IN file) - 1)
                ELSE file END AS d_prefix,
           replace(replace(upper(sender), 'İ', 'I'), ' ', '') AS d_sender_norm
    FROM (
      SELECT *,
             replace(upper(COALESCE(replace(
               CASE WHEN position('.' IN file) > 0
                    THEN string_split(file, '.')[len(string_split(file, '.'))]
                    ELSE 'EMPTY' END, 'n', ''), 'file_ext')), 'İ', 'I') AS ud
      FROM d1
    )
  ) d2
  LEFT JOIN conn ON d2.receiver = conn.email_address
  LEFT JOIN countries ON conn.country_id = countries.country_id
), matches AS (
  SELECT d.id, 1 AS prec, e.eid, e.data_owner, e.file_table_name, e.entity_sheet
  FROM d JOIN e ON e.data_owner_mail = d.sender AND e.e_sheet_key = d.d_sheet_key
  UNION ALL
  SELECT d.id, 2, e.eid, e.data_owner, e.file_table_name, e.entity_sheet
  FROM d JOIN e ON e.e_ext = d.d_ext
  UNION ALL
  SELECT d.id, 3, e.eid, e.data_owner, e.file_table_name, e.entity_sheet
  FROM d JOIN e ON e.data_owner_mail = d.sender
  UNION ALL
  SELECT d.id, 4, e.eid, e.data_owner, e.file_table_name, e.entity_sheet
  FROM d JOIN e ON e.e_ext = d.d_ext
                AND (e.e_owner_norm = d.d_sender_norm
                     OR e.e_domain = d.sender
                     OR (e.country = d.country_name AND e.e_prefix = d.d_prefix))
)
SELECT id, CAST(prec AS INTEGER) AS prec,
       CASE prec WHEN 1 THEN 'sheet' WHEN 2 THEN 'extension'
                 WHEN 3 THEN 'sender' ELSE 'country_filename' END AS strategy,
       eid, data_owner,
       file_table_name AS entity_file_table_name, entity_sheet
FROM (
  SELECT *, row_number() OVER (PARTITION BY id ORDER BY prec, eid) AS rn
  FROM matches
) WHERE rn = 1
"""

ENTITY_QUERIES: dict[str, tuple] = {
    "join_entity_cascade": (q_join_entity_cascade, SQL_JOIN_ENTITY_CASCADE),
}
