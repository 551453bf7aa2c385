"""Native C++ packed-dataset loader: parity with the numpy reader."""

from pathlib import Path

import numpy as np
import pytest

from fastmax_tpu.data.packed_dataset import PackedDataset, PackedDatasetBuilder
from fastmax_tpu.native.build import SO, build
from fastmax_tpu.native import loader as native_loader


@pytest.fixture(scope="module")
def chunk_dir(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("chunks")
    builder = PackedDatasetBuilder(
        outdir=str(tmp), prefix="t", chunk_size=1024, sep_token=0,
        dtype=np.uint16, vocab_size=None,
    )
    rng = np.random.default_rng(0)
    for _ in range(10):
        builder.add_array(rng.integers(1, 60000, size=500).astype(np.uint16))
    builder.write_reminder()
    return tmp


@pytest.fixture(scope="module", autouse=True)
def ensure_built():
    if not SO.exists():
        build(verbose=False)


def test_native_reads_all_blocks_unshuffled(chunk_dir):
    files = sorted(Path(chunk_dir).glob("*.bin"))
    ref = list(PackedDataset(files, n_chunks=1, block_size=128, shuffle=False, wrap=False))
    nat = list(native_loader.NativePackedDataset(files, 128, shuffle=False, wrap=False))
    assert len(nat) == len(ref)
    for a, b in zip(nat, ref):
        np.testing.assert_array_equal(a, b)


def test_native_shuffle_covers_same_multiset(chunk_dir):
    files = sorted(Path(chunk_dir).glob("*.bin"))
    ref = list(PackedDataset(files, n_chunks=1, block_size=128, shuffle=False, wrap=False))
    nat = list(native_loader.NativePackedDataset(files, 128, shuffle=True, seed=7, wrap=False))
    assert len(nat) == len(ref)
    ref_set = {a.tobytes() for a in ref}
    nat_set = {a.tobytes() for a in nat}
    assert ref_set == nat_set
    # and the order actually differs (shuffled)
    assert any(not np.array_equal(a, b) for a, b in zip(nat, ref))


def test_native_wrap_streams_forever(chunk_dir):
    files = sorted(Path(chunk_dir).glob("*.bin"))
    n_finite = len(list(native_loader.NativePackedDataset(files, 128, shuffle=False, wrap=False)))
    it = iter(native_loader.NativePackedDataset(files, 128, shuffle=False, wrap=True))
    got = [next(it) for _ in range(n_finite + 5)]
    assert len(got) == n_finite + 5


def test_native_rank_sharding(chunk_dir):
    files = sorted(Path(chunk_dir).glob("*.bin"))
    r0 = list(native_loader.NativePackedDataset(files, 128, shuffle=False, wrap=False,
                                                num_processes=2, process_rank=0))
    r1 = list(native_loader.NativePackedDataset(files, 128, shuffle=False, wrap=False,
                                                num_processes=2, process_rank=1))
    full = list(native_loader.NativePackedDataset(files, 128, shuffle=False, wrap=False))
    assert len(r0) + len(r1) == len(full)
    joined = {a.tobytes() for a in r0} | {a.tobytes() for a in r1}
    assert joined == {a.tobytes() for a in full}
