"""Build dist/varint_spark.zip for spark-submit --py-files."""
from __future__ import annotations

import zipfile
from pathlib import Path

REPO = Path(__file__).parent.parent
OUT = REPO / "dist" / "varint_spark.zip"


def main() -> None:
    OUT.parent.mkdir(exist_ok=True)
    with zipfile.ZipFile(OUT, "w", zipfile.ZIP_DEFLATED) as z:
        for f in sorted((REPO / "varint_spark").rglob("*.py")):
            z.write(f, f.relative_to(REPO))
    print(OUT)


if __name__ == "__main__":
    main()
