from table2qb_spark.functions.transforms import (  # noqa: F401
    slugize,
    unitize,
    propertize,
    classize,
    slugize_py,
    unitize_py,
    propertize_py,
    classize_py,
    slugize_pd,
    unitize_pd,
    propertize_pd,
    classize_pd,
    TRANSFORMS,
)
from table2qb_spark.functions.uris import (  # noqa: F401
    expand_uri_template,
    expand_uris,
    merge_uris,
    strip_trailing_path_separator,
    uri_template_expr,
    validate_uri_template,
)
