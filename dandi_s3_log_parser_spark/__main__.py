"""``python -m dandi_s3_log_parser_spark`` — same CLI as jobs/pipeline_job.py."""

import sys

from .cli import main

sys.exit(main())
