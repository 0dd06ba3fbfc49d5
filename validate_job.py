"""Thin spark-submit driver script: ship the package with --py-files and
run the CLI (see snowy_json_spark/cli.py for the full usage)."""

import sys

from snowy_json_spark.cli import main

if __name__ == "__main__":
    sys.exit(main())
