"""Oracle output-type hygiene.

DuckDB's SUM over integer inputs widens to HUGEINT (int128).  The driver's
correctness gate fetches oracle results through a dataframe path where a
HUGEINT column no longer normalizes like Spark's bigint (``123.0`` vs
``123``), so a hash mismatch appears even when every value is identical —
this bit ``events_json_extract`` and ``token_budget_mix`` in round 3.

Every oracle column must therefore land on a type with a stable textual
form: BIGINT/INTEGER, DOUBLE, VARCHAR, BOOLEAN, DATE/TIMESTAMP.  HUGEINT
and DECIMAL outputs fail here; cast them (``::BIGINT`` / ``::DOUBLE``) in
the SQL instead.
"""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entrymod
from azuredatalakeindexer_spark.sources.fixtures import TABLES

SF_DIR = "/root/testdata/sf0.001"

_BANNED = ("HUGEINT", "UHUGEINT")


@pytest.fixture(scope="module")
def con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def test_no_hugeint_or_decimal_oracle_outputs(con):
    offenders = []
    for name, sql in entrymod.oracle_sql().items():
        rel = con.sql(sql)
        for col, ty in zip(rel.columns, rel.types):
            ts = str(ty)
            if ts in _BANNED or ts.startswith("DECIMAL"):
                offenders.append((name, col, ts))
    assert not offenders, f"oracle columns with driver-unstable types: {offenders}"
