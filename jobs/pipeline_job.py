"""spark-submit entry point.

Usage (cluster):
    python scripts/build_pyfiles_zip.py   # -> dist/dandi_s3_log_parser_spark.zip
    spark-submit --master <cluster> \\
        --py-files dist/dandi_s3_log_parser_spark.zip \\
        jobs/pipeline_job.py pipeline --stage all \\
        --pages <pages_tbl> --dims <dims_dir> --warehouse <wh>

The package arrives on executors via --py-files; this file contains no
logic of its own (the north rule's "ships as spark-submit --py-files").
"""

import sys

from dandi_s3_log_parser_spark.cli import main

sys.exit(main())
