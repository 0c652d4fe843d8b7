#!/usr/bin/env python
"""Vendor the Delta Lake / Apache Iceberg runtime artifacts so the
table-format roundtrip tests RUN instead of skipping.

This sandbox has no network and no pip, so
``tests/test_table_format.py::TestDeltaRouting`` /
``TestIcebergRouting`` skip loudly. On any machine WITH network, one
command turns those skips green:

    python tools/vendor_table_formats.py            # both formats
    python tools/vendor_table_formats.py --iceberg  # just Iceberg
    python -m pytest tests/test_table_format.py -q  # roundtrips now run

What it does (all public artifacts, pinned below):
- Iceberg: downloads ``iceberg-spark-runtime-<spark>_<scala>-<ver>.jar``
  from Maven Central into ``<repo>/vendor/``. The test session picks it
  up via ``pipeline.table_format.vendor_jars()`` → ``spark.jars``.
- Delta: ``pip install delta-spark==<ver>`` (the python package is a
  thin wrapper; pip resolves the matching JVM jars through
  delta-spark's declared Maven coordinates at session build), or with
  ``--jars-only`` downloads ``delta-spark_<scala>`` + ``delta-storage``
  jars into ``vendor/`` for offline transfer.

Version pins track the installed pyspark's major.minor; override with
``--iceberg-version`` / ``--delta-version`` / ``--spark-minor`` when a
newer runtime line exists for your Spark.
"""

from __future__ import annotations

import argparse
import subprocess
import sys
import urllib.request
from pathlib import Path

MAVEN = "https://repo1.maven.org/maven2"
SCALA = "2.13"
# Default pins per Spark minor line (extend as lines appear; these are
# the newest publicly released pairings known at pin time).
ICEBERG_DEFAULT = "1.10.0"
DELTA_DEFAULT = "4.0.0"

REPO = Path(__file__).resolve().parents[1]
VENDOR = REPO / "vendor"


def spark_minor() -> str:
    import pyspark

    return ".".join(pyspark.__version__.split(".")[:2])


def fetch(url: str, dest: Path) -> None:
    print(f"  {url}\n    -> {dest}")
    dest.parent.mkdir(parents=True, exist_ok=True)
    tmp = dest.with_suffix(dest.suffix + ".part")
    with urllib.request.urlopen(url) as r, open(tmp, "wb") as f:
        while chunk := r.read(1 << 20):
            f.write(chunk)
    tmp.replace(dest)


def vendor_iceberg(spark_mm: str, version: str) -> None:
    art = f"iceberg-spark-runtime-{spark_mm}_{SCALA}"
    jar = f"{art}-{version}.jar"
    url = f"{MAVEN}/org/apache/iceberg/{art}/{version}/{jar}"
    fetch(url, VENDOR / jar)


def vendor_delta_jars(version: str) -> None:
    for art in (f"delta-spark_{SCALA}", "delta-storage"):
        jar = f"{art}-{version}.jar"
        url = f"{MAVEN}/io/delta/{art}/{version}/{jar}"
        fetch(url, VENDOR / jar)


def pip_delta(version: str) -> None:
    subprocess.check_call(
        [sys.executable, "-m", "pip", "install", f"delta-spark=={version}"]
    )


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--iceberg", action="store_true", help="vendor Iceberg only")
    ap.add_argument("--delta", action="store_true", help="vendor Delta only")
    ap.add_argument("--jars-only", action="store_true",
                    help="Delta: download jars to vendor/ instead of pip install")
    ap.add_argument("--spark-minor", default=None,
                    help="override the Spark minor line (default: installed pyspark)")
    ap.add_argument("--iceberg-version", default=ICEBERG_DEFAULT)
    ap.add_argument("--delta-version", default=DELTA_DEFAULT)
    args = ap.parse_args(argv)
    both = not (args.iceberg or args.delta)
    mm = args.spark_minor or spark_minor()
    try:
        if args.iceberg or both:
            print(f"Vendoring Iceberg {args.iceberg_version} for Spark {mm}:")
            vendor_iceberg(mm, args.iceberg_version)
        if args.delta or both:
            if args.jars_only:
                print(f"Vendoring Delta {args.delta_version} jars:")
                vendor_delta_jars(args.delta_version)
            else:
                print(f"pip-installing delta-spark {args.delta_version}:")
                pip_delta(args.delta_version)
    except Exception as exc:  # no network here — say exactly what to do
        print(
            f"\nFAILED: {exc}\nThis environment likely has no network. "
            "Run this script on a networked machine and copy vendor/ "
            "(and the delta-spark pip install) across.",
            file=sys.stderr,
        )
        return 1
    print("\nDone. The skipped roundtrip tests will now run:")
    print("  python -m pytest tests/test_table_format.py -q")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
