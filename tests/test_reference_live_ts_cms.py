"""Live bit-for-bit fuzz vs the compiled reference: time series + CMS.

Compiles time_series.c / cm_sketch.c (+xxhash) into a shared object and
replays random operation sequences through both implementations:

- time series: interleaved add/set at advancing + jittered (late /
  skipping) timestamps — the advance-zeroing, late-drop, and saturation
  rules — comparing every in-window row value, return value, and the
  current timestamp after every operation;
- CMS: random scalar conservative updates (positive and negative, skewed
  keys) comparing every update return, point query, item_count and
  unique_count.
"""

import ctypes
import os
import subprocess

import numpy as np
import pytest

REF_SRC = "/root/reference/library/src"
REF_INC = "/root/reference/library/include"
SO_PATH = "/tmp/refbuild/libref_tscms.so"

INT_MIN = -(2**31)


@pytest.fixture(scope="module")
def ref():
    if not os.path.isdir(REF_SRC):
        pytest.skip("reference sources not available")
    os.makedirs(os.path.dirname(SO_PATH), exist_ok=True)
    if not os.path.exists(SO_PATH):
        r = subprocess.run(
            ["gcc", "-O2", "-shared", "-fPIC", f"-I{REF_INC}",
             f"{REF_SRC}/time_series.c", f"{REF_SRC}/cm_sketch.c",
             f"{REF_SRC}/xxhash.c", f"{REF_SRC}/common.c",
             f"{REF_SRC}/p2.c", f"{REF_SRC}/matrix.c",
             f"{REF_SRC}/running_stats.c",
             "-o", SO_PATH, "-lm"],
            capture_output=True, text=True,
        )
        if r.returncode != 0:
            pytest.skip(f"cannot compile reference: {r.stderr[:200]}")
    lib = ctypes.CDLL(SO_PATH)
    lib.sa_create_time_series_int.restype = ctypes.c_void_p
    lib.sa_create_time_series_int.argtypes = [ctypes.c_int, ctypes.c_uint64]
    lib.sa_add_time_series_int.restype = ctypes.c_int
    lib.sa_add_time_series_int.argtypes = [ctypes.c_void_p, ctypes.c_uint64, ctypes.c_int]
    lib.sa_set_time_series_int.restype = ctypes.c_int
    lib.sa_set_time_series_int.argtypes = [ctypes.c_void_p, ctypes.c_uint64, ctypes.c_int]
    lib.sa_get_time_series_int.restype = ctypes.c_int
    lib.sa_get_time_series_int.argtypes = [ctypes.c_void_p, ctypes.c_uint64]
    lib.sa_timestamp_time_series_int.restype = ctypes.c_uint64
    lib.sa_timestamp_time_series_int.argtypes = [ctypes.c_void_p]
    lib.sa_destroy_time_series_int.argtypes = [ctypes.c_void_p]
    lib.sa_create_cms.restype = ctypes.c_void_p
    lib.sa_create_cms.argtypes = [ctypes.c_double, ctypes.c_double]
    lib.sa_update_cms.restype = ctypes.c_uint32
    lib.sa_update_cms.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                  ctypes.c_size_t, ctypes.c_int]
    lib.sa_point_query_cms.restype = ctypes.c_uint32
    lib.sa_point_query_cms.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                       ctypes.c_size_t]
    lib.sa_item_count_cms.restype = ctypes.c_uint64
    lib.sa_item_count_cms.argtypes = [ctypes.c_void_p]
    lib.sa_unique_count_cms.restype = ctypes.c_uint64
    lib.sa_unique_count_cms.argtypes = [ctypes.c_void_p]
    lib.sa_destroy_cms.argtypes = [ctypes.c_void_p]
    return lib


class TestTimeSeriesLive:
    @pytest.mark.parametrize("seed", range(6))
    @pytest.mark.parametrize("rows,npr", [(5, 10), (24, 1000), (96, 7)])
    def test_random_op_sequences(self, ref, seed, rows, npr):
        from raysketch.sketches.time_series import TimeSeriesInt

        rng = np.random.default_rng(seed * 1000 + rows)
        ours = TimeSeriesInt(rows, npr)
        ud = ref.sa_create_time_series_int(rows, npr)
        try:
            clock = 0
            for step in range(400):
                # advancing clock with jitter: sometimes late (window or
                # beyond-window old), sometimes skipping rows forward
                move = rng.choice([0, 1, npr, npr * 2, npr * (rows // 2 + 1)])
                clock += int(move)
                ns = max(0, clock - int(rng.choice([0, 1, npr, npr * rows * 2])))
                v = int(rng.integers(-100, 1000))
                if rng.random() < 0.5:
                    a = ours.add(ns, v)
                    b = ref.sa_add_time_series_int(ud, ns, v)
                else:
                    a = ours.set(ns, v)
                    b = ref.sa_set_time_series_int(ud, ns, v)
                a_cmp = INT_MIN if a is None else a
                assert a_cmp == b, (step, ns, v, a, b)
                assert ours.current_time == ref.sa_timestamp_time_series_int(ud)
                if step % 25 == 0:  # full-window readback
                    cur = ours.current_time
                    for r in range(rows):
                        t = cur - (rows - 1 - r) * npr
                        if t < 0:
                            continue
                        ga = ours.get(t)
                        gb = ref.sa_get_time_series_int(ud, t)
                        assert (INT_MIN if ga is None else ga) == gb, (step, r)
        finally:
            ref.sa_destroy_time_series_int(ud)

    def test_saturation_vs_c(self, ref):
        from raysketch.sketches.time_series import TimeSeriesInt

        ours = TimeSeriesInt(2, 1)
        ud = ref.sa_create_time_series_int(2, 1)
        try:
            for _ in range(4):
                a = ours.add(0, 2**30)
                b = ref.sa_add_time_series_int(ud, 0, 2**30)
                assert a == b  # saturates at INT_MAX identically
        finally:
            ref.sa_destroy_time_series_int(ud)


class TestXXH32Live:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_random_buffers_bit_exact(self, ref, seed):
        """Our pure-python/numpy XXH32 must equal the vendored C for
        arbitrary byte strings and both reference seeds."""
        from raysketch.sketches.xxh32 import xxh32

        ref.XXH32.restype = ctypes.c_uint32
        ref.XXH32.argtypes = [ctypes.c_char_p, ctypes.c_size_t, ctypes.c_uint32]
        rng = np.random.default_rng(seed)
        for _ in range(200):
            n = int(rng.integers(0, 100))
            buf = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
            for s in (0, 1, 2, 12345):
                assert xxh32(buf, s) == ref.XXH32(buf, len(buf), s)


class TestCMSLive:
    @pytest.mark.parametrize("seed", range(4))
    def test_random_scalar_updates(self, ref, seed):
        """Conservative scalar updates (the reference-parity path) must
        bit-match on every return value, including negative removes."""
        from raysketch.sketches.cms import CMSketch

        rng = np.random.default_rng(seed)
        ours = CMSketch(0.01, 0.05)
        ud = ref.sa_create_cms(0.01, 0.05)
        try:
            keys = [f"key{i}".encode() for i in range(50)]
            for step in range(2000):
                k = keys[int(rng.zipf(1.5)) % len(keys)]
                n = int(rng.choice([1, 1, 1, 5, -1, -3]))
                a = ours.update(k, n)
                b = ref.sa_update_cms(ud, k, len(k), n)
                assert a == b, (step, k, n, a, b)
            for k in keys:
                assert ours.point_query(k) == ref.sa_point_query_cms(ud, k, len(k))
            assert ours.item_count == ref.sa_item_count_cms(ud)
            assert ours.unique_count == ref.sa_unique_count_cms(ud)
        finally:
            ref.sa_destroy_cms(ud)
