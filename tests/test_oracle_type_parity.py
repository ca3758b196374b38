"""Cross-engine TYPE parity for every oracle-bearing query.

The driver's value hash is format-sensitive: it stringifies cell values
after pandas materialization, so a DuckDB column that widens to HUGEINT
or DOUBLE (→ pandas float64) hashes '4177920.0' against Spark's
'4177920' and fails even when the values are numerically identical.
Round 5's only red slot (q_media_invariants) was exactly this: one
BIGINT * sum()-subquery product promoted to HUGEINT and the UNION ALL
widened the whole column.

This test kills the bug class without executing anything: it DESCRIBEs
each oracle lazily in DuckDB and compares column type families against
the lazily-built Spark schema. Integer must meet integer, float must
meet float, bool bool, etc.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import types as T

from streamprocess_spark.plans import oracle_sql_map, query_map
from streamprocess_spark.schemas import TABLE_NAMES
from tests.conftest import SF_DIR

ORACLES = oracle_sql_map()
NAMES = sorted(ORACLES)

_SPARK_INT = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
_SPARK_FLOAT = (T.FloatType, T.DoubleType)

_DUCK_INT = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"}
# HUGEINT is deliberately NOT in _DUCK_INT: pandas has no int128, so
# DuckDB materializes it as float64 and the driver hash sees 'x.0'.
_DUCK_FLOAT = {"FLOAT", "DOUBLE"}


def _spark_family(dt: T.DataType) -> str:
    if isinstance(dt, T.BooleanType):
        return "bool"
    if isinstance(dt, _SPARK_INT):
        return "int"
    if isinstance(dt, _SPARK_FLOAT):
        return "float"
    if isinstance(dt, T.DecimalType):
        return "decimal"
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType, T.DateType)):
        return "datetime"
    return "object"


def _duck_family(tname: str) -> str:
    t = tname.upper()
    if t == "BOOLEAN":
        return "bool"
    if t in _DUCK_INT:
        return "int"
    if t in _DUCK_FLOAT:
        return "float"
    if t.startswith("DECIMAL") or t == "HUGEINT":
        return "decimal-or-huge"
    if t.startswith("TIMESTAMP") or t == "DATE":
        return "datetime"
    return "object"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{SF_DIR}/{name}.parquet'"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", NAMES)
def test_oracle_type_parity(spark, duck, name):
    sdf = query_map()[name](spark, SF_DIR)
    spark_types = {f.name: _spark_family(f.dataType) for f in sdf.schema.fields}
    rel = duck.sql(ORACLES[name])
    duck_types = {c: _duck_family(str(t)) for c, t in zip(rel.columns, rel.types)}
    assert sorted(spark_types) == sorted(duck_types), (
        f"{name}: column sets differ {sorted(spark_types)} vs {sorted(duck_types)}"
    )
    problems = []
    for col, sfam in spark_types.items():
        dfam = duck_types[col]
        if sfam == "int" and dfam != "int":
            problems.append(
                f"{col}: spark=int but duck={dfam} — add an outer "
                f"cast(... AS BIGINT) in the oracle (HUGEINT/DOUBLE widening "
                f"materializes as float64 and breaks the driver hash)"
            )
        elif sfam == "float" and dfam not in ("float",):
            problems.append(f"{col}: spark=float but duck={dfam}")
        elif sfam == "bool" and dfam != "bool":
            problems.append(f"{col}: spark=bool but duck={dfam}")
        elif sfam == "datetime" and dfam != "datetime":
            problems.append(f"{col}: spark=datetime but duck={dfam}")
    assert not problems, f"{name}: " + "; ".join(problems)
