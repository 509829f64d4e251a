"""mask_profile and correlation_profile."""

import numpy as np
import pytest

from remark_lint_frontmatter_schema_spark.operators.stats import (
    correlation_profile, mask_profile)


def test_mask_profile_shapes(spark):
    rows = [("Customer#000000001", "1-URGENT"),
            ("Customer#000000002", "5-LOW"),
            ("weird", "1-URGENT"),
            (None, "2-HIGH")]
    df = spark.createDataFrame(rows, "name string, prio string")
    got = [(r.column, r.mask, r.n, r.share)
           for r in mask_profile(df, ["name", "prio"]).collect()]
    assert got == [
        ("name", "A#9", 2, 0.5),
        ("name", "A", 1, 0.25),
        ("name", None, 1, 0.25),  # NULL profiles as a mask, sorted last
        ("prio", "9-A", 4, 1.0),
    ]


def test_mask_profile_top_k_and_guards(spark):
    rows = [(f"v{i}x" * (i % 3 + 1),) for i in range(30)]
    df = spark.createDataFrame(rows, "s string")
    assert mask_profile(df, ["s"], top_k=1).count() == 1
    with pytest.raises(ValueError):
        mask_profile(df, [])
    with pytest.raises(ValueError):
        mask_profile(df, ["s"], top_k=0)


def test_correlation_profile_values(spark):
    rng = np.random.default_rng(4)
    x = rng.normal(0, 1, 500)
    noise = rng.normal(0, 0.1, 500)
    rows = [(float(a), float(2 * a + n), float(c), 7.0)
            for a, n, c in zip(x, noise, rng.normal(0, 1, 500))]
    df = spark.createDataFrame(rows, "a double, b double, c double, k double")
    got = {(r.col_a, r.col_b): r.corr
           for r in correlation_profile(df, ["a", "b", "c", "k"]).collect()}
    assert set(got) == {("a", "b"), ("a", "c"), ("a", "k"),
                        ("b", "c"), ("b", "k"), ("c", "k")}
    assert got[("a", "b")] > 0.99
    assert abs(got[("a", "c")]) < 0.2
    assert got[("a", "k")] is None  # constant column: undefined, visible
    # numpy parity on the strong pair
    want = float(np.corrcoef(x, 2 * x + noise)[0, 1])
    assert got[("a", "b")] == pytest.approx(want, abs=1e-5)
    with pytest.raises(ValueError):
        correlation_profile(df, ["a"])


def test_correlation_violations_and_dsl(spark):
    import numpy as np
    from remark_lint_frontmatter_schema_spark.operators.stats import (
        correlation_violations)
    from remark_lint_frontmatter_schema_spark.operators.table_checks import (
        table_check_violations)
    from remark_lint_frontmatter_schema_spark.plans.compiler import (
        RulesetCompileError, compile_ruleset)
    from pyspark.sql import functions as F

    rng = np.random.default_rng(9)
    x = rng.normal(0, 1, 300)
    rows = [(float(a), float(2 * a + n), float(u), 5.0)
            for a, n, u in zip(x, rng.normal(0, 0.1, 300),
                               rng.normal(0, 1, 300))]
    df = spark.createDataFrame(rows, "a double, b double, u double, k double")
    # strong pair passes, independent pair violates with the value,
    # constant pair violates with NULL actual (fail-closed)
    assert correlation_violations(df, "a", "b", min_abs=0.9).collect() == []
    v = correlation_violations(df, "a", "u", min_abs=0.5).collect()
    assert len(v) == 1 and "below 0.5" in v[0].message
    vc = correlation_violations(df, "a", "k", min_abs=0.5).collect()
    assert len(vc) == 1 and vc[0].actual is None
    assert "undefined" in vc[0].message
    with pytest.raises(ValueError):
        correlation_violations(df, "a", "b", min_abs=0)

    rid = df.withColumn("rid", F.monotonically_increasing_id())
    doc = {"type": "object", "properties": {"a": {
        "type": "number", "x-corr": {"with": "u", "min_abs": 0.5}}}}
    compiled = compile_ruleset(doc, rid.schema, name="xc")
    out = table_check_violations(rid, compiled, row_id="rid").collect()
    assert len(out) == 1 and out[0].keyword == "x-corr"
    # unknown partner column -> unknown, not a silent pass
    c2 = compile_ruleset({"properties": {"a": {
        "x-corr": {"with": "nope", "min_abs": 0.5}}}}, rid.schema,
        name="xc2")
    assert ("/a", "x-corr") in c2.unknown and not c2.table_checks
    with pytest.raises(RulesetCompileError):
        compile_ruleset({"properties": {"a": {
            "x-corr": {"with": "u", "min_abs": 2}}}}, rid.schema,
            name="bad")


def test_mask_violations_and_dsl(spark):
    from remark_lint_frontmatter_schema_spark.operators.stats import (
        mask_violations)
    from remark_lint_frontmatter_schema_spark.operators.table_checks import (
        table_check_violations)
    from remark_lint_frontmatter_schema_spark.plans.compiler import (
        RulesetCompileError, compile_ruleset)
    from pyspark.sql import functions as F

    rows = [("Cust#001",)] * 97 + [("bogus",)] * 2 + [(None,)]
    df = spark.createDataFrame(rows, "name string")
    # 97/99 non-NULL conform (0.979798)
    ok = mask_violations(df, "name", expect="A#9", min_share=0.97)
    assert ok.collect() == []
    v = mask_violations(df, "name", expect="A#9", min_share=0.99).collect()
    assert len(v) == 1
    assert v[0].actual == "0.979798"
    assert "top offender A" in v[0].message
    assert v[0].expected == ["A#9"]
    # wrong expected mask entirely: share 0, offender is the dominant one
    v2 = mask_violations(df, "name", expect="9!",
                         min_share=0.5).collect()
    assert v2[0].actual == "0.0" and "top offender A#9" in v2[0].message
    # all-NULL input: no conformance evidence -> fail closed with
    # actual NULL (the x-freshness policy; code-review finding)
    empty = spark.createDataFrame([(None,)], "name string")
    ve = mask_violations(empty, "name", expect="A").collect()
    assert len(ve) == 1 and ve[0].actual is None
    assert ve[0].message == "Must match shape 'A': no non-NULL values " \
        "to check"
    with pytest.raises(ValueError):
        mask_violations(df, "name", expect="A", min_share=0)

    rid = df.withColumn("rid", F.monotonically_increasing_id())
    doc = {"type": "object", "properties": {"name": {
        "type": "string", "x-mask": {"expect": "A#9",
                                     "min_share": 0.99}}}}
    compiled = compile_ruleset(doc, rid.schema, name="xm")
    out = table_check_violations(rid, compiled, row_id="rid").collect()
    assert len(out) == 1 and out[0].keyword == "x-mask"
    with pytest.raises(RulesetCompileError):
        compile_ruleset({"properties": {"name": {
            "x-mask": {"expect": ""}}}}, rid.schema, name="bad")


def test_mask_violations_grouped(spark):
    """`by:` form — one violation row per failing group, group value as
    row_id, per-group top offender; NULL group is real and keeps its
    offender (eqNullSafe join); all-NULL group fails closed."""
    from remark_lint_frontmatter_schema_spark.operators.stats import (
        mask_violations)
    rows = (
        [("us", "Bob#1")] * 97 + [("us", "##bad")] * 3        # 0.97 < 0.99
        + [("de", "Ann#2")] * 100                             # conforms
        + [(None, "Eva#3")] * 9 + [(None, "!!x")]             # NULL grp 0.9
        + [("xx", None)] * 4                                  # all-NULL grp
    )
    df = spark.createDataFrame(rows, "country string, name string")
    got = {r.row_id: r for r in mask_violations(
        df, "name", expect="A#9", min_share=0.99,
        by="country").collect()}
    assert set(got) == {"us", "<null>", "xx"}
    assert got["us"].actual == "0.97" and "top offender ##A" in got["us"].message
    assert got["<null>"].actual == "0.9"
    assert "top offender !!A" in got["<null>"].message
    assert got["xx"].actual is None
    assert "no non-NULL values" in got["xx"].message
    assert got["us"].constraint_id == "mask:name:by=country"


def test_correlation_violations_grouped(spark):
    """`by:` form — perfectly-correlated group passes, anti-correlated
    |corr|=1 passes, a noise group fails, a constant group fails with
    actual NULL (undefined)."""
    from remark_lint_frontmatter_schema_spark.operators.stats import (
        correlation_violations)
    import random
    rnd = random.Random(7)
    rows = ([("lin", float(i), 2.0 * i + 1) for i in range(50)]
            + [("noise", float(rnd.random()), rnd.random())
               for _ in range(50)]
            + [("const", 5.0, float(i)) for i in range(50)])
    df = spark.createDataFrame(rows, "grp string, a double, b double")
    got = {r.row_id: r for r in correlation_violations(
        df, "a", "b", min_abs=0.9, by="grp").collect()}
    assert set(got) == {"noise", "const"}
    assert got["const"].actual is None
    assert "undefined" in got["const"].message
    assert float(got["noise"].actual) < 0.9
    assert got["noise"].constraint_id == "corr:a~b:by=grp"


def test_grouped_mask_corr_dsl(spark):
    from remark_lint_frontmatter_schema_spark import compile_ruleset
    from remark_lint_frontmatter_schema_spark.operators.table_checks import (
        table_check_violations)
    df = spark.createDataFrame(
        [("r1", "g1", "AB-1", 1.0, 2.0), ("r2", "g1", "??", 2.0, 1.0),
         ("r3", "g2", "CD-2", 3.0, 6.0)],
        "rid string, g string, name string, a double, b double")
    doc = {"properties": {
        "name": {"x-mask": {"expect": "A#9", "min_share": 0.99,
                            "by": "g"}},
        "a": {"x-corr": {"with": "b", "min_abs": 0.9, "by": "g"}}}}
    compiled = compile_ruleset(doc, df.schema, name="grp")
    kinds = {(k, p.get("by")) for k, _, p in compiled.table_checks}
    assert kinds == {("mask", "g"), ("corr", "g")}
    out = table_check_violations(df, compiled, row_id="rid").collect()
    assert {(r.keyword, r.row_id) for r in out} >= {("x-mask", "g1")}
