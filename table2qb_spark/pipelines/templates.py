"""Default URI-template definitions per pipeline.

Python equivalents of the reference's EDN resources
(resources/templates/*.edn). ``$(var)`` placeholders are expanded at plan
time; ``{var}`` placeholders are CSVW cell templates expanded per row.
"""

CODELIST_PIPELINE_URIS = {
    "codelist-uri": "$(base-uri)/def/concept-scheme/$(codelist-slug)",
    "code-uri": "$(base-uri)/def/concept/$(codelist-slug)/{notation}",
    "parent-uri": "$(base-uri)/def/concept/$(codelist-slug)/{parent_notation}",
    "concept-types": ["skos:Concept"],
}

COMPONENTS_PIPELINE_URIS = {
    "ontology-uri": "$(base-uri)/def/ontology/components",
    "component-uri": "$(base-uri)/def/{component_type_slug}/{notation}",
    "component-class-uri": "$(base-uri)/def/{class_slug}",
}

CUBE_PIPELINE_URIS = {
    "used-codes-codelist-uri-from-component": "$(base-uri)/data/$(dataset-slug)/codes-used/{component_slug}",
    "used-codes-codelist-uri-from-observation": "$(base-uri)/data/$(dataset-slug)/codes-used/{_name}",
    "dataset-uri": "$(base-uri)/data/$(dataset-slug)",
    "dsd-uri": "$(base-uri)/data/$(dataset-slug)/structure",
    "component-specification-uri": "$(base-uri)/data/$(dataset-slug)/component/{component_slug}",
}

# Per-pipeline variable documentation for the `uris` CLI task — mirrors the
# :template-vars / :csvw-vars entries of the reference's integrant config
# (resources/table2qb-config.edn:29-31,48-57,81-88).
TEMPLATE_VARS = {
    "cube-pipeline": {
        "base-uri": "Base URI",
        "dataset-slug": "Provided slug for the dataset",
    },
    "components-pipeline": {"base-uri": "Base URI"},
    "codelist-pipeline": {
        "base-uri": "Base URI",
        "codelist-slug": "Provided slug for the codelist",
    },
}

CSVW_VARS = {
    "cube-pipeline": {},
    "components-pipeline": {
        "label": "Component label",
        "notation": "An optional slug, defaults to the slugised label",
        "description": "Component description",
        "component_type": "Component property e.g. qb:Dimension, qb:Measure",
        "codelist": "Optional codelist URI",
        "component_type_slug": "Slugized version of Component Type input value",
        "property_slug": "Propertized version of the component Label",
        "class_slug": "Classized version of the component Label",
    },
    "codelist-pipeline": {
        "label": "Code Label",
        "notation": "Code Notation",
        "parent_notation": "Optional parent code",
        "sort_priority": "Optional code Sort Priority",
        "description": "Optional code Description",
    },
}

PIPELINE_URIS = {
    "codelist-pipeline": CODELIST_PIPELINE_URIS,
    "components-pipeline": COMPONENTS_PIPELINE_URIS,
    "cube-pipeline": CUBE_PIPELINE_URIS,
}


def read_edn_uris(path: str) -> dict:
    """Minimal EDN reader for URI-template override files — the only EDN
    shape table2qb accepts here: one map of :keyword keys to strings or
    vectors of strings, with `;` line comments (reference: util/read-edn on
    the --uri-templates file, cli/tasks.clj:315). Unknown EDN forms raise."""
    with open(path, encoding="utf-8") as f:
        text = f.read()
    toks = _edn_tokens(text)
    val, rest = _edn_parse(toks)
    if rest:
        raise ValueError(f"trailing EDN content in {path}: {rest[:3]}")
    if not isinstance(val, dict):
        raise ValueError(f"expected an EDN map in {path}")
    return val


def _edn_tokens(text: str) -> list[str]:
    toks, i, n = [], 0, len(text)
    while i < n:
        ch = text[i]
        if ch in " \t\r\n,":
            i += 1
        elif ch == ";":
            while i < n and text[i] != "\n":
                i += 1
        elif ch in "{}[]":
            toks.append(ch)
            i += 1
        elif ch == '"':
            j, out = i + 1, []
            while j < n and text[j] != '"':
                if text[j] == "\\" and j + 1 < n:
                    esc = text[j + 1]
                    out.append({"n": "\n", "t": "\t", '"': '"', "\\": "\\"}.get(esc, esc))
                    j += 2
                else:
                    out.append(text[j])
                    j += 1
            if j >= n:
                raise ValueError("unterminated EDN string")
            toks.append('"' + "".join(out))
            i = j + 1
        else:
            j = i
            while j < n and text[j] not in ' \t\r\n,{}[];"':
                j += 1
            toks.append(text[i:j])
            i = j
    return toks


def _edn_parse(toks: list[str]):
    if not toks:
        raise ValueError("unexpected end of EDN input")
    t, rest = toks[0], toks[1:]
    if t == "{":
        out = {}
        while rest and rest[0] != "}":
            k, rest = _edn_parse(rest)
            v, rest = _edn_parse(rest)
            out[k] = v
        if not rest:
            raise ValueError("unterminated EDN map")
        return out, rest[1:]
    if t == "[":
        out = []
        while rest and rest[0] != "]":
            v, rest = _edn_parse(rest)
            out.append(v)
        if not rest:
            raise ValueError("unterminated EDN vector")
        return out, rest[1:]
    if t.startswith('"'):
        return t[1:], rest
    if t.startswith(":"):
        return t[1:], rest  # keyword -> bare name (matches dict keys above)
    raise ValueError(f"unsupported EDN token {t!r} (only maps of :kw -> string/vector)")
