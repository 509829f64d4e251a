"""Functional-dependency check (operators/fd.py, DSL keyword ``x-fd``).

Fixture FDs: device d1 is clean, d2 has a majority (16000 x2) and one
deviant (22050), d3 is a perfect tie (8000 vs 44100, one row each) — the
tie must break to the SMALLER dependent value so reruns are stable.
"""

import pytest
from pyspark.sql import functions as F

from remark_lint_frontmatter_schema_spark.operators.fd import (
    fd_conflicts, fd_violations)
from remark_lint_frontmatter_schema_spark.operators.table_checks import (
    validate_with_table_checks)
from remark_lint_frontmatter_schema_spark.plans.compiler import compile_ruleset

ROWS = [
    (1, "d1", 16000), (2, "d1", 16000), (3, "d1", 16000),
    (4, "d2", 16000), (5, "d2", 16000), (6, "d2", 22050),
    (7, "d3", 8000), (8, "d3", 44100),
    (9, None, 16000), (10, "d2", None),   # out of scope: NULLs
]
SCHEMA = "clip_id long, device string, sr_hz int"


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(ROWS, SCHEMA)


def test_conflicts_majority_and_tiebreak(df):
    c = {r.device: r for r in
         fd_conflicts(df, "sr_hz", ["device"]).collect()}
    assert set(c) == {"d2", "d3"}
    assert c["d2"].majority == 16000 and c["d2"].n_majority == 2
    assert c["d2"].n_variants == 2 and c["d2"].n_rows == 3
    assert c["d3"].majority == 8000  # tie -> smaller value


def test_violations_rows(df):
    v = {r.row_id: r for r in
         fd_violations(df, "sr_hz", ["device"], row_id="clip_id").collect()}
    assert set(v) == {"6", "8"}
    assert v["6"].actual == "22050" and v["6"].expected == ["16000"]
    assert v["6"].message == (
        "Must be functionally determined by `device`: "
        "expected `16000` for (d2), got `22050`")
    assert v["8"].expected == ["8000"]


def test_multi_determinant(spark):
    rows = [(1, "a", "x", 1), (2, "a", "x", 1), (3, "a", "x", 2),
            (4, "a", "y", 2), (5, "b", "x", 3)]
    d = spark.createDataFrame(rows, "id long, g1 string, g2 string, v int")
    v = fd_violations(d, "v", ["g1", "g2"], row_id="id").collect()
    assert [r.row_id for r in v] == ["3"]
    assert v[0].constraint_id == "fd:g1,g2->v"
    assert "for (a,x)" in v[0].message


def test_dsl_x_fd(df):
    rs = {"type": "object", "properties": {
        "sr_hz": {"type": "integer",
                  "x-fd": {"determined_by": ["device"]}}}}
    compiled = compile_ruleset(rs, df.schema, name="clips")
    assert ("fd", "sr_hz",
            {"determined_by": ["device"], "id": None,
             "severity": "warning"}) in compiled.table_checks
    res = validate_with_table_checks(df, compiled, row_id="clip_id")
    fd_rows = res.violations.where(F.col("keyword") == "fd").collect()
    assert sorted(r.row_id for r in fd_rows) == ["6", "8"]
    assert all(r.ruleset_id == "clips" for r in fd_rows)


def test_x_fd_nested_is_unknown(spark):
    import pyspark.sql.types as T
    schema = T.StructType([
        T.StructField("id", T.StringType()),
        T.StructField("m", T.MapType(T.StringType(), T.StringType())),
    ])
    rs = {"properties": {"m": {"properties": {
        "k": {"x-fd": {"determined_by": ["id"]}}}}}}
    compiled = compile_ruleset(rs, schema, name="nested")
    assert ("/m/k", "x-fd") in compiled.unknown
    assert not compiled.table_checks


def test_x_fd_malformed_rejected(df):
    from remark_lint_frontmatter_schema_spark.plans.compiler import (
        RulesetCompileError)
    for bad in ({"determined_by": []}, {"determined_by": "device"},
                {"determined_by": [1]}, {}):
        with pytest.raises(RulesetCompileError):
            compile_ruleset({"type": "object", "properties": {
                "sr_hz": {"x-fd": bad}}}, df.schema, name="bad")


def test_clean_fd_no_violations(df):
    clean = df.where(F.col("device") == "d1")
    assert fd_violations(clean, "sr_hz", ["device"],
                         row_id="clip_id").count() == 0


def test_fd_strength_and_discover(df):
    from remark_lint_frontmatter_schema_spark.operators.fd import (
        fd_discover, fd_strength)
    s = fd_strength(df, "sr_hz", ["device"])
    # scope = 8 non-null pairs; minority rows: 22050 (d2), 44100 (d3)
    assert s == {"n_rows": 8, "n_violations": 2,
                 "violation_rate": 0.25, "holds": False}
    res = fd_discover(df, [(["device"], "sr_hz"),
                           (["sr_hz"], "sr_hz")])
    by_dep = {tuple(r["determined_by"]): r for r in res}
    assert not by_dep[("device",)]["suggested"]
    assert by_dep[("sr_hz",)]["holds"] and by_dep[("sr_hz",)]["suggested"]
    # tolerance: 25% violations pass a 0.3 bar
    res2 = fd_discover(df, [(["device"], "sr_hz")], max_violation_rate=0.3)
    assert res2[0]["suggested"] and not res2[0]["holds"]
