"""Native C++ exact-kernel parity tests (clrs_tpu/native)."""

import numpy as np
import pytest

from clrs_tpu.exact.modp import _rref_native, rref_mod_p


def _rref_python(a, p):
    """the numpy reference path (native disabled)"""
    a = a % p
    m, n = a.shape
    pivots = []
    r = 0
    for col in range(n):
        piv = None
        for i in range(r, m):
            if a[i, col] % p:
                piv = i
                break
        if piv is None:
            continue
        a[[r, piv]] = a[[piv, r]]
        inv = pow(int(a[r, col]), -1, p)
        a[r] = (a[r] * inv) % p
        for i in range(m):
            if i != r and a[i, col]:
                a[i] = (a[i] - a[i, col] * a[r]) % p
        pivots.append(col)
        r += 1
        if r == m:
            break
    return pivots, a


@pytest.mark.parametrize("seed,m,n,p", [(0, 8, 12, 10007), (1, 12, 8, 101),
                                        (2, 20, 20, 7919), (3, 5, 5, 2)])
def test_native_rref_matches_python(seed, m, n, p):
    rng = np.random.default_rng(seed)
    a = rng.integers(0, p, size=(m, n)).astype(np.int64)
    # inject rank deficiency
    if m > 2:
        a[m // 2] = (a[0] + a[1]) % p
    res = _rref_native(a.copy(), p)
    if res is None:
        pytest.skip("native lib unavailable (no g++)")
    piv_n, red_n = res
    piv_p, red_p = _rref_python(a.copy(), p)
    assert piv_n == piv_p
    np.testing.assert_array_equal(red_n % p, red_p % p)


def test_rref_mod_p_dispatches_consistently():
    rng = np.random.default_rng(7)
    p = 10007
    a = rng.integers(0, p, size=(15, 25)).astype(np.int64)
    piv, red = rref_mod_p(a.copy(), p)
    piv_p, red_p = _rref_python(a.copy(), p)
    assert piv == piv_p
    np.testing.assert_array_equal(red % p, red_p % p)


def test_native_large_prime():
    res = _rref_native(np.array([[2, 4], [3, 5]], dtype=np.int64),
                       (1 << 61) - 1)
    if res is None:
        pytest.skip("native lib unavailable")
    piv, red = res
    assert piv == [0, 1]
    np.testing.assert_array_equal(red, np.eye(2, dtype=np.int64))
