#!/usr/bin/env python
"""spark-submit entrypoint: a file target for ``spark-submit`` that
dispatches into the installed package's CLI (``python -m
gcs2postgres_spark`` and this file share one main — reference
src/main.go:14-26's LoadConfig -> FetchSecret -> Transfer flow).

spark-submit needs a script path (it cannot submit ``-m module``), so
this shim exists for the container/cluster path while the pip console
script ``gcs2postgres-spark`` serves the local path.
"""

import sys

try:
    from gcs2postgres_spark.__main__ import main
except ModuleNotFoundError:  # running from a source checkout, not a wheel
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from gcs2postgres_spark.__main__ import main

if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
