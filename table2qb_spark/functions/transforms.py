"""Cell-level value transformations: slugize / unitize / propertize / classize.

Reference semantics (Swirrl/table2qb):
- slugize/unitize registry: src/table2qb/configuration/column.clj:48-57
- documented spec: doc/usage.md:251-292 (note: the doc says "non
  alphabetical" but observed behavior preserves digits —
  examples/regional-trade/csvw/observations.csv:2 has
  ``0-food-and-live-animals`` — we pin to the examples, digits preserved)
- propertize/classize usage: src/table2qb/pipelines/components.clj:83-91 and
  test/table2qb/pipelines/components_test.clj:35-45
  ("GBP Total" -> property_slug "gbpTotal", class_slug "GbpTotal")

Each transform exists in three forms:
1. ``*_expr`` / bare name — a **Catalyst Column expression** (the fast path:
   JVM-side, whole-stage-codegen, no Python in the loop). This is what the
   pipelines use.
2. ``*_py`` — plain-Python scalar twin, used by driver-side config parsing
   (tiny inputs) and by the synthetic-data oracle.
3. ``*_pd`` — vectorized pandas (Arrow) UDF twin, exposed to satisfy the
   pandas/Arrow UDF surface requirement and for callers embedding the
   transform inside other pandas UDFs. Never per-row Python.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

# ---------------------------------------------------------------------------
# Catalyst expression forms (preferred — pure JVM, codegen-friendly)
# ---------------------------------------------------------------------------


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def slugize(c: Column | str) -> Column:
    """lowercase; runs of non-alphanumerics -> '-'; strip leading/trailing '-'.

    "0 Food and Live Animals" -> "0-food-and-live-animals";
    "GBP Total" -> "gbp-total".
    """
    out = F.lower(_col(c))
    out = F.regexp_replace(out, r"[^a-z0-9]+", "-")
    out = F.regexp_replace(out, r"(^-+)|(-+$)", "")
    return out


def unitize(c: Column | str) -> Column:
    """Replace £ with GBP, then slugize. "£ million" -> "gbp-million"."""
    return slugize(F.regexp_replace(_col(c), "£", "GBP"))


def classize(c: Column | str) -> Column:
    """PascalCase words: "GBP Total" -> "GbpTotal", "date of birth" -> "DateOfBirth".

    Each word: first letter upper, rest lower (initcap semantics), whitespace
    removed. Word separators: any non-alphanumeric run.
    """
    words = F.regexp_replace(_col(c), r"[^a-zA-Z0-9]+", " ")
    return F.regexp_replace(F.initcap(F.trim(words)), r" ", "")


def propertize(c: Column | str) -> Column:
    """camelCase: classize with the first character lowercased.

    "GBP Total" -> "gbpTotal"; "date of birth" -> "dateOfBirth".
    """
    cl = classize(c)
    return F.concat(F.lower(F.substring(cl, 1, 1)), F.substring(cl, 2, 2_000_000_000))


# ---------------------------------------------------------------------------
# Plain-Python scalar twins (driver-side config parsing + oracles)
# ---------------------------------------------------------------------------

_NON_ALNUM = re.compile(r"[^a-z0-9]+")
_EDGE_DASH = re.compile(r"(^-+)|(-+$)")
_WORD_SPLIT = re.compile(r"[^a-zA-Z0-9]+")


def slugize_py(s: str) -> str:
    return _EDGE_DASH.sub("", _NON_ALNUM.sub("-", s.lower()))


def unitize_py(s: str) -> str:
    return slugize_py(s.replace("£", "GBP"))


def classize_py(s: str) -> str:
    return "".join(w[:1].upper() + w[1:].lower() for w in _WORD_SPLIT.split(s) if w)


def propertize_py(s: str) -> str:
    cl = classize_py(s)
    return cl[:1].lower() + cl[1:]


# ---------------------------------------------------------------------------
# Vectorized pandas (Arrow) UDF twins
# ---------------------------------------------------------------------------


@pandas_udf(StringType())
def slugize_pd(s: pd.Series) -> pd.Series:
    return (
        s.str.lower()
        .str.replace(r"[^a-z0-9]+", "-", regex=True)
        .str.replace(r"(^-+)|(-+$)", "", regex=True)
    )


@pandas_udf(StringType())
def unitize_pd(s: pd.Series) -> pd.Series:
    s = s.str.replace("£", "GBP", regex=False)
    return (
        s.str.lower()
        .str.replace(r"[^a-z0-9]+", "-", regex=True)
        .str.replace(r"(^-+)|(-+$)", "", regex=True)
    )


def _classize_series(s: pd.Series) -> pd.Series:
    # NOT .str.title(): title() uppercases the first LETTER of a word even
    # when digits precede it ("0a" -> "0A"), while initcap (and the Python
    # twin) titlecase the first CHARACTER only ("0a" stays "0a") — found by
    # the hypothesis twin-equivalence fuzz. Words are ASCII alnum here (the
    # separator regex removed everything else), so upper == titlecase.
    words = (
        s.str.replace(r"[^a-zA-Z0-9]+", " ", regex=True).str.strip().str.lower()
    )
    return words.str.replace(
        r"(^| )([a-z])", lambda m: m.group(1) + m.group(2).upper(), regex=True
    ).str.replace(" ", "", regex=False)


@pandas_udf(StringType())
def classize_pd(s: pd.Series) -> pd.Series:
    return _classize_series(s)


@pandas_udf(StringType())
def propertize_pd(s: pd.Series) -> pd.Series:
    cl = _classize_series(s)
    return cl.str[:1].str.lower() + cl.str[1:]


# Registry equivalent of the reference's column-transformers map
# (configuration/column.clj:55-57): only slugize/unitize are valid
# ``value_transformation`` names.
TRANSFORMS: dict[str, object] = {"slugize": slugize, "unitize": unitize}
TRANSFORMS_PY: dict[str, object] = {"slugize": slugize_py, "unitize": unitize_py}
