"""Golden-file block-format stability: encoded bytes of fixed fixtures are
pinned by digest, so accidental format changes (header layout, codec ids,
stream order) fail loudly instead of silently breaking stored data.

Regenerate intentionally with:  python tests/test_golden.py --regen
(then review the diff — a golden change means old encoded data can no
longer be decoded by new code unless a format version bump handles it).
"""

from __future__ import annotations

import hashlib
import json
import sys
from pathlib import Path

import numpy as np

GOLDEN = Path(__file__).parent / "golden" / "blocks.json"


def _cases():
    sys.path.insert(0, str(Path(__file__).parent))
    sys.path.insert(0, str(Path(__file__).parent.parent))
    from fixtures import INT_FIXTURES, STR_FIXTURES
    from varint_spark.selector import encode_int_block, encode_str_block

    out = {}
    for name, fn in INT_FIXTURES.items():
        blk = encode_int_block(fn())
        out[f"int:{name}"] = {"sha256": hashlib.sha256(blk).hexdigest(), "len": len(blk)}
    for name, fn in STR_FIXTURES.items():
        blk = encode_str_block(fn(2000) if name != "roles" else fn(20000))
        out[f"str:{name}"] = {"sha256": hashlib.sha256(blk).hexdigest(), "len": len(blk)}
    return out


def test_block_format_golden():
    assert GOLDEN.exists(), "golden file missing — run: python tests/test_golden.py --regen"
    expected = json.loads(GOLDEN.read_text())
    actual = _cases()
    assert actual == expected, (
        "encoded block bytes changed — if intentional, regenerate the golden "
        "file and document the format change"
    )


if __name__ == "__main__":
    if "--regen" in sys.argv:
        GOLDEN.parent.mkdir(exist_ok=True)
        GOLDEN.write_text(json.dumps(_cases(), indent=1, sort_keys=True))
        print(f"wrote {GOLDEN}")
