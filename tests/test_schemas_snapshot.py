"""Schema-stability guard: every query's output schema is pinned to
``tests/query_schemas.json``.

The driver's correctness gate hashes (column names + values); an accidental
type or column change that still "works" locally would silently flip the
hash in a later round. Any intentional schema change must regenerate the
snapshot (see the docstring in the JSON's sibling generator below)::

    python - <<'PY'
    import json
    from crypto_clickhouse_poc_spark.session import get_spark
    from crypto_clickhouse_poc_spark import operators
    spark = get_spark("snap"); qs = operators.library_queries(); snap = {}
    for name in sorted(qs):
        df = qs[name](spark, "/root/testdata/sf0.001")
        snap[name] = [[f.name, f.dataType.simpleString()] for f in df.schema.fields]
    json.dump(snap, open("tests/query_schemas.json", "w"), indent=1, sort_keys=True)
    PY
"""

from __future__ import annotations

import json
from pathlib import Path

import pytest

from crypto_clickhouse_poc_spark import operators
from tests.conftest import SF_SMOKE

SNAPSHOT = json.loads((Path(__file__).parent / "query_schemas.json").read_text())
QUERIES = operators.library_queries()


def test_snapshot_covers_every_query():
    assert sorted(SNAPSHOT) == sorted(QUERIES)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_schema_unchanged(name, spark):
    df = QUERIES[name](spark, SF_SMOKE)
    got = [[f.name, f.dataType.simpleString()] for f in df.schema.fields]
    assert got == SNAPSHOT[name], (
        f"{name}: output schema changed; if intentional, regenerate "
        "tests/query_schemas.json (see module docstring)"
    )


def test_declared_surface_has_only_scalar_columns():
    """The driver canonicalizes declared results through pandas
    ``sort_values``, which cannot hash list/dict-valued cells — a declared
    array/map/struct column is a guaranteed red row even with oracle-exact
    values (the r8 ``doc_hash_embed`` lesson). Library-only queries may
    keep vector shapes (pytest compares them itself); the DECLARED surface
    may not."""
    for name in operators._DECLARED:
        for col, dtype in SNAPSHOT[name]:
            assert not dtype.startswith(("array<", "map<", "struct<")), (
                f"declared query {name} exposes non-scalar column "
                f"{col}:{dtype}; explode or stringify it"
            )
