"""CSV spec engine tests — ports of test/table2qb/csv_test.clj and
test/table2qb/configuration/columns_test.clj / column_test.clj."""

import os

import pytest

from table2qb_spark.config import csvspec
from table2qb_spark.config.columns import load_column_configuration
from table2qb_spark.config.csvspec import ColumnSpec
from table2qb_spark.errors import CellValidationError, HeaderValidationError

REF = "/root/reference"


def specs_abc():
    return [
        ColumnSpec("a", "a", required=True),
        ColumnSpec("b", "b"),
        ColumnSpec("c", "c"),
    ]


class TestValidateHeader:
    # csv_test.clj:20-36
    def test_duplicates(self):
        with pytest.raises(HeaderValidationError, match="Duplicate column headers: a"):
            csvspec.validate_header(["a", "a", "b"], specs_abc())

    def test_missing_required(self):
        with pytest.raises(HeaderValidationError) as e:
            csvspec.validate_header(["b", "c"], specs_abc())
        assert "Missing required columns: a" in str(e.value)
        assert e.value.data["missing_columns"] == {"a"}

    def test_unknown(self):
        with pytest.raises(HeaderValidationError) as e:
            csvspec.validate_header(["a", "zzz"], specs_abc())
        assert "Unexpected columns" in str(e.value)
        assert e.value.data["unknown_columns"] == {"zzz"}

    def test_ok(self):
        csvspec.validate_header(["a", "b"], specs_abc())


class TestReadRecords:
    def test_defaults_literal_and_derived(self):
        # csv_test.clj:56-66
        specs = [
            ColumnSpec("x", "x", required=True),
            ColumnSpec("y", "y", default="dy"),
            ColumnSpec("z", "z", default_py=lambda row: row["x"].upper()),
        ]
        recs = csvspec.read_records("x\nfoo\nbar", specs)
        assert recs == [
            {"x": "foo", "y": "dy", "z": "FOO"},
            {"x": "bar", "y": "dy", "z": "BAR"},
        ]

    def test_bom_stripped(self):
        # csv_test.clj:5-8 / test/resources/bom-example.csv
        path = os.path.join(REF, "test", "resources", "bom-example.csv")
        if not os.path.exists(path):
            pytest.skip("no reference")
        with open(path, "rb") as f:
            assert f.read(3) == b"\xef\xbb\xbf"
        from table2qb_spark.pipelines import codelist

        recs = csvspec.read_records(path, codelist.csv_specs())
        assert len(recs) > 0
        assert all("label" in r for r in recs)

    def test_validator_error_includes_row_and_column(self):
        specs = [ColumnSpec("a", "a", validators=[csvspec.validate_not_blank])]
        with pytest.raises(
            CellValidationError, match='Invalid cell in column "a", row 2: Value cannot be blank'
        ):
            csvspec.read_records("a\nok\n\n", specs)


class TestDistributedPath:
    def test_records_df_matches_driver_path(self, spark, tmp_path):
        csv = "a,b\n1,x\n2,y\n"
        p = tmp_path / "t.csv"
        p.write_text(csv)
        specs = [
            ColumnSpec("a", "a", required=True),
            ColumnSpec("b", "b"),
            ColumnSpec("c", "c", default_py=lambda r: r["a"] + "!", default_expr=None),
        ]
        from pyspark.sql import functions as F

        specs[2].default_expr = lambda cols: F.concat(cols["a"], F.lit("!"))
        df = csvspec.records_df(spark, str(p), specs)
        got = sorted([r.asDict() for r in df.collect()], key=lambda r: r["a"])
        want = csvspec.read_records(csv, specs)
        assert got == want

    def test_raise_error_guard_fires_with_row_context(self, spark, tmp_path):
        """Distributed fail-fast errors carry the reference's 'row N, column
        T' shape (csv.clj:166-177) — the bad cell is on data row 2."""
        p = tmp_path / "bad.csv"
        p.write_text("a,b\nok,1\n,2\n")
        specs = [
            ColumnSpec("a", "a", validators=[csvspec.validate_not_blank]),
            ColumnSpec("b", "b"),
        ]
        df = csvspec.records_df(spark, str(p), specs)
        with pytest.raises(Exception, match=r'column "a", row 2: Value cannot be blank'):
            df.collect()

    def test_distributed_row_number_matches_driver_path(self, spark, tmp_path):
        """The mid-derived ordinal equals the driver path's 1-based data-row
        numbering on a single-split file — here an enum failure on row 3."""
        p = tmp_path / "enum.csv"
        p.write_text("a\nx\ny\nz\n")
        specs = [ColumnSpec("a", "a", validators=[csvspec.validate_one_of({"x", "y"})])]
        with pytest.raises(Exception, match=r'row 3: Expected one of: x, y'):
            csvspec.records_df(spark, str(p), specs).collect()
        # driver path: identical message
        from table2qb_spark.errors import CellValidationError

        with pytest.raises(CellValidationError, match=r'row 3: Expected one of: x, y'):
            csvspec.read_records("a\nx\ny\nz\n", specs)


class TestColumnsConfig:
    # columns_test.clj:6-43
    def test_missing_required(self):
        with pytest.raises(HeaderValidationError) as e:
            load_column_configuration("column-a\nvalue-1")
        assert e.value.data["missing_columns"] == {"title", "name", "property_template"}

    @pytest.mark.parametrize(
        "csv,pattern",
        [
            (
                "title,name,property_template\n,reference_period,http://p/refPeriod",
                r'"title", row 1: Value cannot be blank',
            ),
            (
                "title,name,property_template\nreference period,,http://p/refPeriod",
                r'"name", row 1: Value cannot be blank',
            ),
            (
                "title,name,property_template\nreference period,reference-period,http://p/refPeriod",
                r"csvw:name cannot contain hyphens",
            ),
            (
                "title,name,property_template,component_attachment\n"
                "reference period,reference_period,http://p/refPeriod,not_an_option",
                r'"component_attachment", row 1: Value must be blank or one of qb:dimension, qb:measure or qb:attribute',
            ),
            (
                "title,name,property_template,value_transformation\n"
                "reference period,reference_period,http://p/refPeriod,renticulate",
                r'"value_transformation", row 1: Expected one of: slugize, unitize',
            ),
        ],
    )
    def test_value_validation(self, csv, pattern):
        with pytest.raises(CellValidationError, match=pattern):
            load_column_configuration(csv)

    def test_datatype_validation(self):
        # column_test.clj:28-33: datetime accepted, junk rejected
        ok = (
            "title,name,property_template,datatype\n"
            "Date,date,http://p/refPeriod,datetime"
        )
        cfg = load_column_configuration(ok)
        assert cfg.columns[0].datatype == "datetime"
        bad = (
            "title,name,property_template,datatype\n"
            "Date,date,http://p/refPeriod,not_a_type"
        )
        with pytest.raises(CellValidationError, match="Invalid XML datatype name: 'not_a_type'"):
            load_column_configuration(bad)

    def test_uri_template_validation(self):
        bad = "title,name,property_template\nDate,date,http://p/{unclosed"
        with pytest.raises(CellValidationError, match="as a URI template"):
            load_column_configuration(bad)

    def test_reference_config_loads(self, default_config):
        cfg = default_config
        assert cfg.title_to_name["Measure Type"] == "measure_type"
        assert "measure_type" in cfg.measure_types
        assert "gbp_total" in cfg.measures
        assert "value" in cfg.values
        assert "unit" in cfg.attributes
        assert "flow" in cfg.dimensions
        mt = cfg.name_to_component["measure_type"]
        assert mt.is_qb_measure_type
        assert cfg.name_to_component["unit"].value_transformation == "unitize"
        assert cfg.name_to_component["flow"].value_transformation == "slugize"
