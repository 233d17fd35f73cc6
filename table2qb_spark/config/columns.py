"""Columns configuration — the per-dataset column descriptor table.

Reference: src/table2qb/configuration/column.clj (descriptor spec +
validators) and src/table2qb/configuration/columns.clj (config load +
grouping). The config is tiny (tens of rows), driver-parsed, then broadcast
into generated Catalyst expressions — semantically the reference's
title->column map lookups are broadcast hash joins (SURVEY.md §2.5 J1).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from table2qb_spark.config import csvspec
from table2qb_spark.config.csvspec import ColumnSpec
from table2qb_spark.errors import throw_cell_validation_error
from table2qb_spark.functions import transforms
from table2qb_spark.functions.uris import validate_uri_template

# XSD datatype names accepted by CSVW (reference validates against
# csv2rdf.xml.datatype/type-names, configuration/column.clj:76-79).
# Set = XSD 1.1 built-in primitives + derived types + the CSVW aliases
# (https://www.w3.org/TR/tabular-metadata/#datatypes).
XSD_TYPE_NAMES = {
    "anyAtomicType", "anyURI", "base64Binary", "boolean", "date", "dateTime",
    "dateTimeStamp", "decimal", "integer", "long", "int", "short", "byte",
    "nonNegativeInteger", "positiveInteger", "unsignedLong", "unsignedInt",
    "unsignedShort", "unsignedByte", "nonPositiveInteger", "negativeInteger",
    "double", "duration", "dayTimeDuration", "yearMonthDuration", "float",
    "gDay", "gMonth", "gMonthDay", "gYear", "gYearMonth", "hexBinary",
    "QName", "string", "normalizedString", "token", "language", "Name",
    "NMTOKEN", "NCName", "time",
    # CSVW aliases
    "number", "binary", "datetime", "any", "xml", "html", "json",
}

# Spark types for the typed view of a declared datatype (SURVEY.md §1.2).
DATATYPE_TO_SPARK = {
    "string": "string",
    "number": "double",
    "double": "double",
    "float": "float",
    "decimal": "decimal(38,18)",
    "integer": "long",
    "long": "long",
    "int": "int",
    "short": "short",
    "byte": "byte",
    "boolean": "boolean",
    "datetime": "timestamp",
    "dateTime": "timestamp",
    "date": "date",
    "time": "string",
}

ATTACHMENT_TO_TYPE = {
    "qb:dimension": "dimension",
    "qb:measure": "measure",
    "qb:attribute": "attribute",
}
TYPE_TO_ATTACHMENT = {v: k for k, v in ATTACHMENT_TO_TYPE.items()}

QB_MEASURE_TYPE_URI = "http://purl.org/linked-data/cube#measureType"
SDMX_OBS_VALUE = "http://purl.org/linked-data/sdmx/2009/measure#obsValue"


@dataclass(frozen=True)
class ColumnDescriptor:
    """One row of the columns config (configuration/column.clj:25-26)."""

    title: str
    name: str
    type: str  # dimension | attribute | measure | value
    property_template: str | None = None
    value_template: str | None = None
    datatype: str | None = None
    value_transformation: str | None = None  # 'slugize' | 'unitize' | None

    @property
    def component_attachment(self) -> str | None:
        return TYPE_TO_ATTACHMENT.get(self.type)

    @property
    def is_qb_measure_type(self) -> bool:
        # configuration/column.clj:117-121
        return self.type == "dimension" and self.property_template == QB_MEASURE_TYPE_URI


# --- cell transforms/validators for the config CSV itself ------------------


def _validate_column_type(row_num, title, value):
    # configuration/column.clj:62-69: blank -> value column
    if value is None or value.strip() == "":
        return "value"
    t = ATTACHMENT_TO_TYPE.get(value)
    if t is None:
        throw_cell_validation_error(
            row_num, title,
            "Value must be blank or one of qb:dimension, qb:measure or qb:attribute",
        )
    return t


def _validate_name(row_num, title, value):
    # configuration/column.clj:71-74
    if "-" in value:
        throw_cell_validation_error(
            row_num, title, "csvw:name cannot contain hyphens (use underscores instead)"
        )


def _validate_datatype(row_num, title, value):
    # configuration/column.clj:76-79
    if value not in XSD_TYPE_NAMES:
        throw_cell_validation_error(
            row_num, title, f"Invalid XML datatype name: '{value}'"
        )
    return value


def _validate_uri_template(row_num, title, value):
    # configuration/column.clj:81-86
    if not validate_uri_template(value):
        throw_cell_validation_error(
            row_num, title, f"Could not parse {value} as a URI template"
        )
    return value


def _noop_expr(c, title, row=None):
    return c


_COLUMN_SPECS: list[ColumnSpec] = [
    ColumnSpec("title", "title", required=True, validators=[csvspec.validate_not_blank]),
    ColumnSpec(
        "name", "name", required=True,
        validators=[
            csvspec.validate_not_blank,
            csvspec.Validator("no-hyphens", _validate_name, _noop_expr),
        ],
    ),
    ColumnSpec(
        "component_attachment", "type",
        transform=csvspec.check_transform("column-type", _validate_column_type, _noop_expr),
        # column absent == every cell blank == value column (column.clj:62-69)
        default="value",
    ),
    ColumnSpec(
        "property_template", "property_template", required=True,
        transform=csvspec.optional_transform(
            csvspec.check_transform("uri-template", _validate_uri_template, _noop_expr)
        ),
    ),
    ColumnSpec(
        "value_template", "value_template",
        transform=csvspec.optional_transform(
            csvspec.check_transform("uri-template", _validate_uri_template, _noop_expr)
        ),
    ),
    ColumnSpec(
        "datatype", "datatype",
        transform=csvspec.optional_transform(
            csvspec.check_transform("csvw-datatype", _validate_datatype, _noop_expr)
        ),
    ),
    ColumnSpec(
        "value_transformation", "value_transformation",
        transform=csvspec.optional_transform(
            csvspec.check_transform(
                "value-transformation",
                csvspec.mapping_transform(
                    {"slugize": "slugize", "unitize": "unitize"}
                ).py,
                _noop_expr,
            )
        ),
    ),
]


@dataclass
class ColumnsConfig:
    """Loaded configuration (configuration/columns.clj:34-45)."""

    columns: list[ColumnDescriptor]
    name_to_component: dict[str, ColumnDescriptor] = field(init=False)
    title_to_name: dict[str, str] = field(init=False)
    dimensions: set[str] = field(init=False)
    attributes: set[str] = field(init=False)
    values: set[str] = field(init=False)
    measures: set[str] = field(init=False)
    measure_types: set[str] = field(init=False)

    def __post_init__(self):
        self.name_to_component = {c.name: c for c in self.columns}
        self.title_to_name = {c.title: c.name for c in self.columns}
        self.dimensions = {c.name for c in self.columns if c.type == "dimension"}
        self.attributes = {c.name for c in self.columns if c.type == "attribute"}
        self.values = {c.name for c in self.columns if c.type == "value"}
        self.measures = {c.name for c in self.columns if c.type == "measure"}
        self.measure_types = {c.name for c in self.columns if c.is_qb_measure_type}

    def title_to_column(self, title: str) -> ColumnDescriptor | None:
        name = self.title_to_name.get(title)
        return self.name_to_component.get(name) if name else None

    def component_name_to_title(self, name: str) -> str:
        comp = self.name_to_component.get(name)
        if comp is None:
            raise KeyError(f"Unknown component name {name}")
        return comp.title


def load_column_configuration(source: str) -> ColumnsConfig:
    """Load + validate a columns config CSV (path or literal text)."""
    records = csvspec.read_records(source, _COLUMN_SPECS)
    cols = [
        ColumnDescriptor(
            title=r["title"].strip() if r["title"] else r["title"],
            name=r["name"].strip() if r["name"] else r["name"],
            type=r["type"],
            property_template=_strip_or_none(r.get("property_template")),
            value_template=_strip_or_none(r.get("value_template")),
            datatype=_strip_or_none(r.get("datatype")),
            value_transformation=r.get("value_transformation"),
        )
        for r in records
    ]
    return ColumnsConfig(cols)


def _strip_or_none(v: str | None) -> str | None:
    if v is None:
        return None
    v = v.strip()
    return v or None


def transform_expr_for(name: str | None):
    """Resolve a value_transformation name to its Catalyst builder."""
    if name is None:
        return None
    return transforms.TRANSFORMS[name]
