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
