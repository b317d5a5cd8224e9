"""Every registry query vs its DuckDB oracle twin (the same comparison
the external driver performs: row count + column names + values).
Runs at sf0.001 for speed; tools/check_oracle.py runs the same thing
at any SF.
"""

from __future__ import annotations

import math

import pytest

from rc_scanner_spark.queries import build_registry

from tests.conftest import SF_ORACLE

REGISTRY = build_registry()


def _normalize(v):
    if v is None:
        return None
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else v
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


def _rows(pdf):
    cols = sorted(pdf.columns)
    return cols, sorted(
        (tuple(_normalize(v) for v in row) for row in pdf[cols].itertuples(index=False)),
        key=repr,
    )


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(name, spark, duck):
    spec = REGISTRY[name]
    sdf = spec.fn(spark, SF_ORACLE).toPandas()
    if spec.sql is None:
        # rows-only contract: must run and be deterministic in shape
        assert sdf is not None
        return
    odf = duck.execute(spec.sql).df()
    scols, srows = _rows(sdf)
    ocols, orows = _rows(odf)
    assert scols == ocols, f"column mismatch: {scols} != {ocols}"
    assert len(srows) == len(orows), f"row count {len(srows)} != {len(orows)}"
    assert srows == orows


def test_entry_smoke(spark):
    import __spark_entry__ as E

    df = E.entry(spark)
    assert df.count() > 0
    assert {f.name for f in df.schema.fields} >= {"doc_id", "lang", "match_msg", "fp"}


def test_oracle_keys_subset():
    import __spark_entry__ as E

    qs, osql = E.queries(), E.oracle_sql()
    assert set(osql) <= set(qs)
    assert len(qs) == len(REGISTRY)
