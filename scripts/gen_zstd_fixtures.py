"""Generate zstd test fixtures with REAL libzstd (via pyarrow) — run once,
check in the outputs.

Round-7's zstd work was validated only by self-round-trips, which is how
two spec deviations survived a green suite (literal size_format 0/1 swap,
direct-weight header off-by-one; see ADVICE round 8). These fixtures are
frames produced by an independent implementation (libzstd, bundled with
pyarrow), curated so the set covers every literals/weights variant libzstd
emits on this corpus:

- huffman literals with DIRECT 4-bit weight headers at size_format 0
  (single-stream), 1, 2 and 3 (4-stream, growing size fields),
- huffman literals with FSE-compressed weight headers (sf 1/2/3),
- treeless (type-3) literals reusing the previous block's table across
  a multi-block frame,
- raw blocks (incompressible input), RLE blocks, and an empty payload.

Usage: python scripts/gen_zstd_fixtures.py   (writes tests/fixtures/zstd/)

Each fixture is a pair <name>.zst (the frame) + <name>.bin (the payload);
tests/test_zstd.py asserts byte-exact decode of every pair.
"""

from __future__ import annotations

import random
from pathlib import Path

import pyarrow as pa

OUT = Path(__file__).resolve().parent.parent / "tests" / "fixtures" / "zstd"


def _skewed(nsym: int, size: int, seed: int) -> bytes:
    rnd = random.Random(seed)
    alpha = list(range(nsym))
    wts = [1.0 / (i + 1) for i in range(nsym)]
    return bytes(rnd.choices(alpha, weights=wts, k=size))


def main() -> None:
    OUT.mkdir(parents=True, exist_ok=True)
    rnd = random.Random(42)
    words = ["the", "quick", "brown", "fox", "jumps", "over", "lazy",
             "dog", "spark", "parquet", "zstd", "frame"]
    cases: list[tuple[str, bytes, int]] = [
        # (name, payload, libzstd level) — levels picked empirically so
        # libzstd emits the named variant on the named payload
        ("direct_weights_sf0", _skewed(3, 400, 7), 1),
        ("direct_weights_sf1", _skewed(3, 400, 7), 12),
        ("direct_weights_sf2", _skewed(3, 3000, 8), 12),
        ("direct_weights_sf3", _skewed(3, 60000, 9), 22),
        ("treeless_multiblock", _skewed(3, 200000, 10), 1),
        ("fse_weights_sf1", _skewed(32, 400, 11), 1),
        ("fse_weights_sf2", _skewed(32, 3000, 12), 1),
        ("fse_weights_sf3", _skewed(32, 60000, 13), 1),
        ("words_l19",
         (" ".join(rnd.choice(words) for _ in range(5000))).encode(), 19),
        ("random_incompressible",
         bytes(rnd.getrandbits(8) for _ in range(2000)), 3),
        ("rle_run", b"a" * 10000, 3),
        ("tiny", b"hello world", 3),
        ("empty", b"", 3),
    ]
    for name, payload, level in cases:
        codec = pa.Codec("zstd", compression_level=level)
        frame = codec.compress(payload).to_pybytes()
        (OUT / f"{name}.zst").write_bytes(frame)
        (OUT / f"{name}.bin").write_bytes(payload)
        print(f"{name}: {len(payload)} -> {len(frame)} bytes")


if __name__ == "__main__":
    main()
