"""Build dist/dandi_s3_log_parser_spark.zip for spark-submit --py-files."""

from __future__ import annotations

import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
PKG = REPO / "dandi_s3_log_parser_spark"
OUT = REPO / "dist" / "dandi_s3_log_parser_spark.zip"


def build(out: Path = OUT) -> Path:
    out.parent.mkdir(parents=True, exist_ok=True)
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for py in sorted(PKG.rglob("*.py")):
            zf.write(py, py.relative_to(REPO))
    return out


if __name__ == "__main__":
    print(build())
