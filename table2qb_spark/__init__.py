"""table2qb_spark — a PySpark-native CDC / incremental-ingest engine with the
query and data-processing capabilities of Swirrl/table2qb.

Built from scratch on the PySpark DataFrame API (Catalyst/Tungsten do the
physical planning). The reference (/root/reference, Clojure) defines WHAT is
computed — the data model, row-level transform semantics, validation rules,
URI-template slugging and codelist resolution; this package re-expresses all
of it Spark-first, and adds the CDC layer (ordered change-log tail, MERGE
upserts keyed on (repo, path), max-seq-wins dedup, exactly-once commit
manifests, schema evolution, checkpoint/resume, per-batch metrics) plus the
large-scale training-data ops (dedup, similarity search, text analysis).
"""

__version__ = "0.1.0"
