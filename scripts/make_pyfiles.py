"""Build the --py-files zip for spark-submit: ``python scripts/make_pyfiles.py [dest]``."""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cow_spark.session import _package_zip  # noqa: E402


def main() -> None:
    dest = sys.argv[1] if len(sys.argv) > 1 else "dist/cow_spark.zip"
    os.makedirs(os.path.dirname(dest) or ".", exist_ok=True)
    shutil.copy(_package_zip(), dest)
    print(dest)


if __name__ == "__main__":
    main()
