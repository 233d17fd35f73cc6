"""bop-quarterly golden round-trip — the second full multi-pipeline example
(examples/bop-quarterly/), asserted byte-value-exactly against the
reference's own csvw/ goldens (read in place, never copied). Unlike
overseas-trade, these goldens are consistent with the current inputs, so
every table is compared golden-exact: two codelists, the components table,
and the 396-row observations cube built with the example's own columns.csv.
"""

import csv as _csv

import pytest

from table2qb_spark.config.columns import load_column_configuration
from table2qb_spark.pipelines import codelist, components, cube
from tests.conftest import example_csv, example_csvw

TEST_DOMAIN = "http://gss-data.org.uk/"
EXAMPLE = "bop-quarterly"


def read_csv_dicts(path):
    with open(path, newline="", encoding="utf-8-sig") as f:
        return list(_csv.DictReader(f))


@pytest.fixture(scope="module")
def bop_columns(reference_available):
    """The example's columns.csv, plus the two descriptors its goldens were
    generated with but that a later config revision renamed: the goldens use
    titles 'Cdid' (now 'CDID') and 'Services' (now 'BOP Services' /
    'Pink Book Services'), and component-specifications.csv pins their
    property URIs (attribute/cdid, dimension/service)."""
    from table2qb_spark.config.columns import ColumnDescriptor, ColumnsConfig

    cfg = load_column_configuration(f"/root/reference/examples/{EXAMPLE}/columns.csv")
    extra = [
        ColumnDescriptor(
            "Cdid", "cdid", "attribute",
            "http://gss-data.org.uk/def/attribute/cdid",
            "http://gss-data.org.uk/def/cdid/{cdid}", "string", None,
        ),
        ColumnDescriptor(
            "Services", "services", "dimension",
            "http://gss-data.org.uk/def/dimension/service",
            "http://gss-data.org.uk/def/concept/services/{services}",
            "string", "slugize",
        ),
    ]
    return ColumnsConfig(list(cfg.columns) + extra)


class TestBopQuarterly:
    @pytest.mark.parametrize("src,slug,name", [
        ("flow-directions.csv", "flow-directions", "Flow Directions"),
        ("services.csv", "services", "Services"),
    ])
    def test_codelists_match_goldens(self, spark, tmp_path, src, slug, name, reference_available):
        res = codelist.codelist_pipeline(
            spark, str(tmp_path / slug), example_csv(EXAMPLE, src), name, slug, TEST_DOMAIN
        )
        got = read_csv_dicts(res["codelist_csv"])
        want = read_csv_dicts(example_csvw(EXAMPLE, src))
        golden_cols = list(want[0].keys())
        got_proj = [{c: r[c] for c in golden_cols} for r in got]
        assert got_proj == want  # order-preserving

    def test_components_match_golden(self, spark, tmp_path, reference_available):
        res = components.components_pipeline(
            spark, str(tmp_path), example_csv(EXAMPLE, "components.csv"), TEST_DOMAIN
        )
        got = read_csv_dicts(res["components_csv"])
        want = read_csv_dicts(example_csvw(EXAMPLE, "components.csv"))
        key = lambda r: r["notation"]  # noqa: E731
        assert sorted(got, key=key) == sorted(want, key=key)

    def test_observations_match_golden(self, spark, tmp_path, bop_columns, reference_available):
        res = cube.cube_pipeline(
            spark,
            str(tmp_path),
            example_csv(EXAMPLE, "balanceofpayments2017q3.csv"),
            "UK Balance of Payments",
            "bop-quarterly",
            bop_columns,
            TEST_DOMAIN,
        )
        got = read_csv_dicts(res["observations_csv"])
        want = read_csv_dicts(example_csvw(EXAMPLE, "observations.csv"))
        assert got == want  # order-preserving, value-exact, all 396 rows

    def test_component_specifications_match_golden(
        self, spark, tmp_path, bop_columns, reference_available
    ):
        res = cube.cube_pipeline(
            spark,
            str(tmp_path),
            example_csv(EXAMPLE, "balanceofpayments2017q3.csv"),
            "UK Balance of Payments",
            "bop-quarterly",
            bop_columns,
            TEST_DOMAIN,
        )
        got = read_csv_dicts(res["component_specifications_csv"])
        want = read_csv_dicts(example_csvw(EXAMPLE, "component-specifications.csv"))
        key = lambda r: r["component_slug"]  # noqa: E731
        assert sorted(got, key=key) == sorted(want, key=key)
