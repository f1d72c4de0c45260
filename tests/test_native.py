"""Native host-runtime kernels: C path vs numpy fallback parity."""

import numpy as np

import fuxictr_tpu.native as native


def _cases():
    rng = np.random.default_rng(0)
    seqs = [rng.integers(1, 100, rng.integers(0, 30)) for _ in range(64)]
    lens = np.array([min(len(s), int(rng.integers(0, 35))) for s in seqs])
    return seqs, lens


def _numpy_pad(seqs, lens, max_len, pre_pad):
    out = np.zeros((len(seqs), max_len), np.int64)
    for i, (s, l) in enumerate(zip(seqs, lens)):
        s = np.asarray(s, np.int64)[:int(l)]
        s = s[-max_len:] if pre_pad else s[:max_len]   # keras semantics
        if pre_pad:
            out[i, max_len - len(s):] = s
        else:
            out[i, :len(s)] = s
    return out


def test_native_builds():
    assert native._ensure_built(), "cc is available in this image"


def test_pad_sequences_matches_numpy():
    seqs, lens = _cases()
    for pre in (True, False):
        got = native.pad_sequences(seqs, lens, 12, pre_pad=pre)
        np.testing.assert_array_equal(got, _numpy_pad(seqs, lens, 12, pre))


def test_pad_sequences_empty_and_overflow():
    out = native.pad_sequences([np.array([], np.int64), np.arange(1, 50)],
                               np.array([0, 49]), 8)
    np.testing.assert_array_equal(out[0], 0)
    np.testing.assert_array_equal(out[1], np.arange(42, 50))  # keep last 8


def test_take_rows():
    rng = np.random.default_rng(1)
    for dtype in (np.int64, np.float32):
        table = rng.integers(0, 100, (50, 7)).astype(dtype)
        ids = rng.integers(0, 50, 200)
        np.testing.assert_array_equal(native.take_rows(table, ids),
                                      table[ids])


def test_unique_inverse_matches_np_unique():
    from fuxictr_tpu.native import unique_inverse
    rng = np.random.default_rng(3)
    for n, hi in [(0, 10), (1, 5), (1000, 37), (10000, 100000)]:
        ids = rng.integers(0, hi, n)
        uniq, inv = unique_inverse(ids)
        assert uniq.dtype == np.int64 and inv.dtype == np.int32
        np.testing.assert_array_equal(uniq[inv] if n else ids, ids)
        ref = np.unique(ids)
        np.testing.assert_array_equal(np.sort(uniq), ref)
        # first-occurrence order: uniq follows the first sighting of each id
        first = {v: i for i, v in reversed(list(enumerate(ids)))}
        assert list(uniq) == sorted(first, key=first.get)


def test_unique_inverse_negative_free_but_zero_ok():
    """id 0 collides with nothing (ht sentinel is -1)."""
    from fuxictr_tpu.native import unique_inverse
    ids = np.array([0, 0, 5, 0, 5, 7])
    uniq, inv = unique_inverse(ids)
    np.testing.assert_array_equal(uniq, [0, 5, 7])
    np.testing.assert_array_equal(uniq[inv], ids)
