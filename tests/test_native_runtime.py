"""Native C++ packer == pure-Python IO layer."""

import numpy as np
import pytest

from swtpu.io import encode_seq, pack_2bit, read_fasta, unpack_2bit
from swtpu.ops.common import T_PAD
from swtpu.runtime import native_available

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native library unavailable"
)

FASTA = b""">query
AGGGCGTCATTTAATGACTATCATGGTGCAAT
>db1 some description
ACGTacgtNNX
>db2
AAAA
CCCC
GGGG
"""


def test_index_and_encode_matches_python():
    from swtpu.runtime import NativePacker

    p = NativePacker(strict=True)
    names, rs, re_, seq_lens = p.index_fasta(FASTA)
    assert names == ["query", "db1", "db2"]
    assert list(seq_lens) == [32, 11, 12]
    enc, lens = p.encode(FASTA, rs, re_, width=32, pad_code=T_PAD)
    # python reference
    recs = read_fasta_bytes(FASTA)
    for i, (name, seq) in enumerate(recs):
        want = encode_seq(seq, strict=True)
        assert lens[i] == len(want)
        np.testing.assert_array_equal(enc[i, : len(want)], want)
        assert (enc[i, len(want):] == T_PAD).all()


def read_fasta_bytes(blob: bytes):
    import tempfile

    with tempfile.NamedTemporaryFile(suffix=".fa", delete=False) as f:
        f.write(blob)
        path = f.name
    return [(r.name, r.seq) for r in read_fasta(path)]


def test_pack_bucket_ids():
    from swtpu.runtime import NativePacker

    p = NativePacker()
    src = np.arange(24, dtype=np.int8).reshape(4, 6) % 4
    lens = np.array([6, 3, 6, 2], np.int32)
    assign = np.array([0, 1, 0, 1], np.int32)
    dst, ids, out_lens, n = p.pack_bucket(src, lens, assign, bucket=1, dst_width=4, pad_code=T_PAD, max_rows=8)
    assert n == 2
    assert list(ids[:2]) == [1, 3]
    np.testing.assert_array_equal(dst[0, :3], src[1, :3])
    assert (dst[0, 3:] == T_PAD).all()
    assert (ids[2:] == -1).all()


def test_pack_2bit_roundtrip_matches_python():
    from swtpu.runtime import NativePacker

    p = NativePacker()
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 4, size=37).astype(np.int8)
    packed = p.pack_2bit(codes)
    np.testing.assert_array_equal(packed, pack_2bit(codes))
    np.testing.assert_array_equal(p.unpack_2bit(packed, 37), codes)
    np.testing.assert_array_equal(unpack_2bit(packed, 37), codes)


def test_native_pack_wire_matches_numpy():
    """The C++ one-pass wire packer is bit-identical to the numpy form
    (codes 4/byte LSB-first + flag bitmap 8/byte)."""
    import numpy as np

    from swtpu.runtime.native import NativePacker, native_available

    if not native_available():
        import pytest

        pytest.skip("no native toolchain")
    rng = np.random.default_rng(0)
    stream = rng.integers(0, 4, size=(7, 64)).astype(np.int8)
    stream[rng.random(stream.shape) < 0.1] |= 8  # scattered flags
    stream[2, 40:] = 4  # pad tail
    codes, flags = NativePacker().pack_wire(stream)
    u = stream.astype(np.uint8)
    quads = (u & 3).reshape(7, -1, 4)
    codes_ref = np.bitwise_or.reduce(
        quads << np.array([0, 2, 4, 6], np.uint8), axis=2
    ).astype(np.uint8)
    flags_ref = np.packbits((u & 8) != 0, axis=1, bitorder="little")
    np.testing.assert_array_equal(codes, codes_ref)
    np.testing.assert_array_equal(flags, flags_ref)
