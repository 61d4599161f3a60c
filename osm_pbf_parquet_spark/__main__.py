"""`python -m osm_pbf_parquet_spark` → the turnkey CLI (cli.py)."""

import sys

from .cli import main

if __name__ == "__main__":
    sys.exit(main())
