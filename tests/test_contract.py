"""Schema-contract operator semantics (operators/contract.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from movie_data_pipeline_spark.operators.contract import (
    ContractViolation,
    enforce,
    schema_violations,
)

CONTRACT = StructType(
    [
        StructField("id", LongType(), nullable=False),
        StructField("name", StringType(), nullable=True),
    ]
)


def test_conforming_frame_projected_in_contract_order(spark):
    df = spark.createDataFrame([( "a", 1)], "name STRING, id LONG").withColumn(
        "id", F.col("id").cast("long")
    )
    # make id non-nullable to satisfy the contract
    df = spark.createDataFrame(df.selectExpr("id", "name").rdd,
                               "id LONG NOT NULL, name STRING")
    out = enforce(df, CONTRACT)
    assert out.columns == ["id", "name"]
    assert schema_violations(df, CONTRACT) == []


def test_each_violation_class_reported(spark):
    df = spark.createDataFrame(
        [(1, 2, "x")], "id INT, extra INT, name STRING"
    )
    v = schema_violations(df, CONTRACT)
    joined = "\n".join(v)
    assert "type mismatch on 'id'" in joined  # int vs long, no widening
    assert "nullable but contract requires NOT NULL" in joined
    assert "unexpected column 'extra'" in joined
    with pytest.raises(ContractViolation):
        enforce(df, CONTRACT)


def test_missing_column_and_nonstrict_extras(spark):
    df = spark.createDataFrame([(1,)], "extra INT")
    v = schema_violations(df, CONTRACT, strict=False)
    assert any("missing column 'id'" in x for x in v)
    assert any("missing column 'name'" in x for x in v)
    assert not any("unexpected" in x for x in v)  # non-strict ignores extras


def test_readme_query_count_matches_registry():
    """ADVICE r7: the README's 'N named queries' line drifted from the
    registry twice; derive the check so it can't."""
    import os
    import re

    from movie_data_pipeline_spark.plans import REGISTRY

    readme = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", "README.md"
    )
    text = open(readme).read()
    m = re.search(r"(\d+) named queries", text)
    assert m, "README must state the catalog size as 'N named queries'"
    assert int(m.group(1)) == len(REGISTRY), (
        f"README says {m.group(1)} named queries; registry has "
        f"{len(REGISTRY)} — update README.md"
    )
