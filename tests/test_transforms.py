"""Golden-pinned transform semantics (reference doc/usage.md:251-292 and
examples/regional-trade observed outputs)."""

import pytest
from pyspark.sql import functions as F

from table2qb_spark.functions import transforms as T

SLUG_CASES = [
    ("0 Food and Live Animals", "0-food-and-live-animals"),
    ("1 Beverages and Tobacco", "1-beverages-and-tobacco"),
    ("GBP Total", "gbp-total"),
    ("Export and Import Activity", "export-and-import-activity"),
    ("Gender", "gender"),
    ("Export", "export"),
    ("Net Mass", "net-mass"),
    ("  leading  spaces ", "leading-spaces"),
    ("Total", "total"),
]

UNIT_CASES = [
    ("£ million", "gbp-million"),
    ("£ 10000", "gbp-10000"),
    ("GBP Total", "gbp-total"),
]

PROPERTIZE_CASES = [
    ("GBP Total", "gbpTotal"),
    ("date of birth", "dateOfBirth"),
    ("Flow", "flow"),
    ("Net Mass", "netMass"),
]

CLASSIZE_CASES = [
    ("GBP Total", "GbpTotal"),
    ("date of birth", "DateOfBirth"),
    ("Flow", "Flow"),
    ("Net Mass", "NetMass"),
]


@pytest.mark.parametrize("inp,expected", SLUG_CASES)
def test_slugize_py(inp, expected):
    assert T.slugize_py(inp) == expected


@pytest.mark.parametrize("inp,expected", UNIT_CASES)
def test_unitize_py(inp, expected):
    assert T.unitize_py(inp) == expected


@pytest.mark.parametrize("inp,expected", PROPERTIZE_CASES)
def test_propertize_py(inp, expected):
    assert T.propertize_py(inp) == expected


@pytest.mark.parametrize("inp,expected", CLASSIZE_CASES)
def test_classize_py(inp, expected):
    assert T.classize_py(inp) == expected


def test_catalyst_and_pandas_forms_agree(spark):
    """The Catalyst expression, pandas UDF, and plain-Python forms must agree
    on every pinned case."""
    inputs = [c[0] for c in SLUG_CASES + UNIT_CASES + PROPERTIZE_CASES]
    df = spark.createDataFrame([(s,) for s in inputs], ["s"])
    out = df.select(
        "s",
        T.slugize("s").alias("slug_expr"),
        T.slugize_pd(F.col("s")).alias("slug_pd"),
        T.unitize("s").alias("unit_expr"),
        T.unitize_pd(F.col("s")).alias("unit_pd"),
        T.propertize("s").alias("prop_expr"),
        T.propertize_pd(F.col("s")).alias("prop_pd"),
        T.classize("s").alias("class_expr"),
        T.classize_pd(F.col("s")).alias("class_pd"),
    ).collect()
    for r in out:
        assert r["slug_expr"] == T.slugize_py(r["s"]) == r["slug_pd"]
        assert r["unit_expr"] == T.unitize_py(r["s"]) == r["unit_pd"]
        assert r["prop_expr"] == T.propertize_py(r["s"]) == r["prop_pd"]
        assert r["class_expr"] == T.classize_py(r["s"]) == r["class_pd"]


def test_uri_template_expansion(spark):
    from table2qb_spark.functions import uris as U

    assert U.expand_uri_template(
        "$(base-uri)/def/concept/$(codelist-slug)/{notation}",
        {"base-uri": "http://example.com", "codelist-slug": "genders"},
    ) == "http://example.com/def/concept/genders/{notation}"

    # merge-uris: unknown user keys ignored (configuration/uris.clj:26-30)
    merged = U.merge_uris({"a": "1", "b": "2"}, {"b": "3", "zzz": "9"})
    assert merged == {"a": "1", "b": "3"}

    # RFC 6570: {var} percent-encodes reserved chars, {+var} does not
    # (evidence: cn#cn8 -> cn%23cn8, integration_test.clj:57)
    df = spark.createDataFrame([("cn#cn8_28399000",)], ["code"])
    row = df.select(
        U.uri_template_expr("http://x.org/{code}").alias("enc"),
        U.uri_template_expr("http://x.org/{+code}").alias("raw"),
        U.uri_template_expr("http://x.org/{code}", encoder="pandas").alias("enc_pd"),
    ).collect()[0]
    assert row["enc"] == "http://x.org/cn%23cn8_28399000"
    assert row["enc_pd"] == "http://x.org/cn%23cn8_28399000"
    assert row["raw"] == "http://x.org/cn#cn8_28399000"

    assert U.expand_template_py(
        "http://x.org/{code}/{+code}", {"code": "a b#c"}
    ) == "http://x.org/a%20b%23c/a b#c"


def test_validate_uri_template():
    from table2qb_spark.functions.uris import validate_uri_template

    assert validate_uri_template("http://x/{foo}/{+bar}")
    assert validate_uri_template("http://x/plain")
    assert not validate_uri_template("http://x/{unclosed")
    # RFC 6570 extended operators are ACCEPTED, matching the reference's
    # csv2rdf-backed validator (configuration/column.clj:81-86) — round-4
    # verdict #6 flagged {#frag}/{?q}/{.ext} rejection as a divergence
    for t in ("http://x/p{#frag}", "http://x/s{?q}", "http://x/f{.ext}",
              "http://x{/seg}", "http://x/m{;mat}", "http://x/s?a=1{&b}"):
        assert validate_uri_template(t), t
    assert not validate_uri_template("http://x/{=bad}")


def test_uri_template_extended_operators(spark):
    """RFC 6570 level-2/3 single-variable expansion: {#var} raw behind a
    literal '#', {.var}/{/var} encoded behind their prefix, {;var}/{?var}/
    {&var} named var=value forms — Catalyst expression and the driver-side
    scalar twin agree."""
    from table2qb_spark.functions import uris as U

    row = {"v": "a b#c"}
    cases = {
        "http://x/p{#v}": "http://x/p#a b#c",
        "http://x/f{.v}": "http://x/f.a%20b%23c",
        "http://x{/v}": "http://x/a%20b%23c",
        "http://x/m{;v}": "http://x/m;v=a%20b%23c",
        "http://x/s{?v}": "http://x/s?v=a%20b%23c",
        "http://x/s?a=1{&v}": "http://x/s?a=1&v=a%20b%23c",
        # :N prefix modifier truncates the value BEFORE encoding
        # (RFC 6570 2.4.1); previously validated but silently unexpanded
        "http://x/t/{v:3}": "http://x/t/a%20b",
        "http://x/t/{+v:4}": "http://x/t/a b#",
    }
    df = spark.createDataFrame([("a b#c",)], ["v"])
    got = df.select(
        *[U.uri_template_expr(t).alias(f"c{i}") for i, t in enumerate(cases)]
    ).collect()[0]
    for i, (tmpl, want) in enumerate(cases.items()):
        assert got[f"c{i}"] == want, tmpl
        assert U.expand_template_py(tmpl, row) == want, tmpl


class TestTwinEquivalenceFuzz:
    """Property test (hypothesis): for ARBITRARY text the three forms of
    every transform — Catalyst expression, plain-Python, pandas UDF — agree
    exactly. The Catalyst form is what pipelines run; the twins are the
    UDF-surface contract, and divergence on weird unicode/punctuation would
    silently fork pipeline output from the documented semantics."""

    def test_all_three_forms_agree_on_fuzzed_text(self, spark):
        from hypothesis import given, settings, HealthCheck, strategies as st
        from pyspark.sql import functions as F
        from table2qb_spark.functions import transforms as T

        pairs = [
            (T.slugize, T.slugize_py, T.slugize_pd),
            (T.unitize, T.unitize_py, T.unitize_pd),
            (T.classize, T.classize_py, T.classize_pd),
            (T.propertize, T.propertize_py, T.propertize_pd),
        ]

        @settings(
            max_examples=25, deadline=None, derandomize=True,
            suppress_health_check=[HealthCheck.too_slow],
        )
        @given(
            st.lists(
                st.text(
                    alphabet=st.characters(
                        blacklist_categories=("Cs",),  # no lone surrogates
                    ),
                    max_size=40,
                ),
                min_size=1, max_size=8,
            )
        )
        def check(texts):
            df = spark.createDataFrame([(t,) for t in texts], "s string")
            sel = []
            for i, (expr_f, _, pd_f) in enumerate(pairs):
                sel.append(expr_f(F.col("s")).alias(f"e{i}"))
                sel.append(pd_f(F.col("s")).alias(f"p{i}"))
            rows = df.select("s", *sel).collect()
            for r in rows:
                for i, (_, py_f, _) in enumerate(pairs):
                    expect = py_f(r["s"])
                    assert r[f"e{i}"] == expect, (r["s"], i, r[f"e{i}"], expect)
                    assert r[f"p{i}"] == expect, (r["s"], i, r[f"p{i}"], expect)

        check()
