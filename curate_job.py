"""Thin spark-submit driver script for corpus curation: ship the
package with --py-files and run the curation CLI (see
snowy_json_spark/curate_cli.py for the full usage)."""

import sys

from snowy_json_spark.curate_cli import main

if __name__ == "__main__":
    sys.exit(main())
