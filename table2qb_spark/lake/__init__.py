from table2qb_spark.lake.table import LakeTable  # noqa: F401
