"""Primary resource for `spark-submit --py-files table2qb_spark.zip` — the
north rule's launch mode. All engine code arrives via the --py-files zip
(shipped to every executor's PYTHONPATH); this file only dispatches to the
CLI, so the same artifact pair runs unchanged on a real multi-executor
cluster:

    spark-submit --master spark://... --py-files dist/table2qb_spark.zip \
        tools/spark_submit_launcher.py cdc-replay --table ... --events ...
"""

import sys

from table2qb_spark.main import main

if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
