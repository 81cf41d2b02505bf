"""LIVE bit-for-bit fuzz against the compiled reference C library.

Compiles trink's p2.c / running_stats.c into a shared object (session
fixture; skipped cleanly when no compiler is available) and drives random
streams through BOTH implementations, asserting every marker estimate,
marker counter, and running-stat moment matches the C library exactly —
far stronger than fixed goldens because it sweeps arbitrary value
distributions and stream lengths.
"""

import ctypes
import math
import os
import subprocess
import zlib

import numpy as np
import pytest

REF_SRC = "/root/reference/library/src"
REF_INC = "/root/reference/library/include"
SO_PATH = "/tmp/refbuild/libref_test.so"


@pytest.fixture(scope="module")
def ref():
    if not os.path.isdir(REF_SRC):
        pytest.skip("reference sources not available")
    os.makedirs(os.path.dirname(SO_PATH), exist_ok=True)
    if not os.path.exists(SO_PATH):
        r = subprocess.run(
            ["gcc", "-O2", "-shared", "-fPIC", f"-I{REF_INC}",
             f"{REF_SRC}/p2.c", f"{REF_SRC}/running_stats.c",
             f"{REF_SRC}/common.c", "-o", SO_PATH, "-lm"],
            capture_output=True, text=True,
        )
        if r.returncode != 0:
            pytest.skip(f"cannot compile reference: {r.stderr[:200]}")
    lib = ctypes.CDLL(SO_PATH)
    # argtypes are REQUIRED — missing ones segfault
    lib.sa_create_p2_quantile.restype = ctypes.c_void_p
    lib.sa_create_p2_quantile.argtypes = [ctypes.c_double]
    lib.sa_add_p2_quantile.restype = ctypes.c_double
    lib.sa_add_p2_quantile.argtypes = [ctypes.c_void_p, ctypes.c_double]
    lib.sa_estimate_p2_quantile.restype = ctypes.c_double
    lib.sa_estimate_p2_quantile.argtypes = [ctypes.c_void_p, ctypes.c_ushort]
    lib.sa_count_p2_quantile.restype = ctypes.c_ulonglong
    lib.sa_count_p2_quantile.argtypes = [ctypes.c_void_p, ctypes.c_ushort]
    lib.sa_destroy_p2_quantile.argtypes = [ctypes.c_void_p]
    lib.sa_create_p2_histogram.restype = ctypes.c_void_p
    lib.sa_create_p2_histogram.argtypes = [ctypes.c_ushort]
    lib.sa_add_p2_histogram.argtypes = [ctypes.c_void_p, ctypes.c_double]
    lib.sa_estimate_p2_histogram.restype = ctypes.c_double
    lib.sa_estimate_p2_histogram.argtypes = [ctypes.c_void_p, ctypes.c_ushort]
    lib.sa_count_p2_histogram.restype = ctypes.c_ulonglong
    lib.sa_count_p2_histogram.argtypes = [ctypes.c_void_p, ctypes.c_ushort]
    lib.sa_destroy_p2_histogram.argtypes = [ctypes.c_void_p]
    return lib


_STREAMS = [
    ("uniform", lambda rng, n: rng.uniform(0, 100, n)),
    ("normal", lambda rng, n: rng.normal(50, 15, n)),
    ("exponential", lambda rng, n: rng.exponential(10, n)),
    ("lognormal", lambda rng, n: rng.lognormal(2, 1, n)),
    ("integers", lambda rng, n: rng.integers(0, 50, n).astype(np.float64)),
    ("constant", lambda rng, n: np.full(n, 7.25)),
]


class TestP2QuantileLive:
    @pytest.mark.parametrize("dist,gen", _STREAMS)
    @pytest.mark.parametrize("n", [5, 6, 23, 200, 1000, 5000])
    @pytest.mark.parametrize("p", [0.5, 0.9, 0.95])
    def test_bit_exact_vs_c(self, ref, dist, gen, n, p):
        from raysketch.sketches.p2 import P2Quantile

        rng = np.random.default_rng(zlib.crc32(f"{dist}-{n}-{p}".encode()))
        xs = gen(rng, n)
        ours = P2Quantile(p)
        ud = ref.sa_create_p2_quantile(p)
        try:
            for x in xs:
                a = ours.add(float(x))
                b = ref.sa_add_p2_quantile(ud, float(x))
                assert (math.isnan(a) and math.isnan(b)) or a == b
            for m in range(5):
                ea = ours.estimate(m)
                eb = ref.sa_estimate_p2_quantile(ud, m)
                assert (math.isnan(ea) and math.isnan(eb)) or ea == eb, (m, ea, eb)
                assert ours.count(m) == ref.sa_count_p2_quantile(ud, m)
        finally:
            ref.sa_destroy_p2_quantile(ud)


class TestP2HistogramLive:
    @pytest.mark.parametrize("dist,gen", _STREAMS)
    @pytest.mark.parametrize("n,buckets", [(4, 4), (40, 4), (500, 10), (2000, 25)])
    def test_bit_exact_vs_c(self, ref, dist, gen, n, buckets):
        from raysketch.sketches.p2 import P2Histogram

        rng = np.random.default_rng(zlib.crc32(f"{dist}-{n}-{buckets}".encode()))
        xs = gen(rng, n)
        ours = P2Histogram(buckets)
        ud = ref.sa_create_p2_histogram(buckets)
        try:
            for x in xs:
                ours.add(float(x))
                ref.sa_add_p2_histogram(ud, float(x))
            for m in range(buckets + 1):
                ea = ours.estimate(m)
                eb = ref.sa_estimate_p2_histogram(ud, m)
                assert (math.isnan(ea) and math.isnan(eb)) or ea == eb, (m, ea, eb)
                assert ours.count(m) == ref.sa_count_p2_histogram(ud, m)
        finally:
            ref.sa_destroy_p2_histogram(ud)


class TestRunningStatsLive:
    class _CStats(ctypes.Structure):
        _fields_ = [("count", ctypes.c_double), ("mean", ctypes.c_double),
                    ("sum", ctypes.c_double)]

    def test_bit_exact_vs_c(self, ref):
        from raysketch.sketches.running_stats import RunningStats

        ref.sa_init_running_stats.argtypes = [ctypes.c_void_p]
        ref.sa_add_running_stats.argtypes = [ctypes.c_void_p, ctypes.c_double]
        ref.sa_variance_running_stats.restype = ctypes.c_double
        ref.sa_variance_running_stats.argtypes = [ctypes.c_void_p]
        ref.sa_sd_running_stats.restype = ctypes.c_double
        ref.sa_sd_running_stats.argtypes = [ctypes.c_void_p]
        for seed in range(5):
            rng = np.random.default_rng(seed)
            xs = rng.normal(0, 1000, 500)
            ours = RunningStats()
            c = self._CStats()
            ref.sa_init_running_stats(ctypes.byref(c))
            for x in xs:
                ours.add(float(x))
                ref.sa_add_running_stats(ctypes.byref(c), float(x))
            assert ours.count == c.count
            assert ours.mean == c.mean
            assert ours.variance() == ref.sa_variance_running_stats(ctypes.byref(c))
            assert ours.sd() == ref.sa_sd_running_stats(ctypes.byref(c))
