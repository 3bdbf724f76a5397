"""GDAL checksum aggregate — pure-numpy clone of ``GDALChecksumImage``'s
integer path (/root/reference/alg/gdalchecksum.cpp:48-260): position-weighted
modular sum ``sum(val % primes[i % 11]) & 0xffff`` over the window in row-major
order, primes = 7,11,13,17,19,23,29,31,37,41,43.

Used as the scalar golden oracle for tile pixel content (the reference's own
test style: ``assert band.Checksum() == 4672``,
autotest/utilities/test_gdal_translate.py:52).
"""

from __future__ import annotations

import numpy as np

_PRIMES = np.array([7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43], dtype=np.int64)
_PRIME_CACHE: dict = {}


def _primes_for(n: int):
    pat = _PRIME_CACHE.get(n)
    if pat is None:
        pat = np.resize(_PRIMES, n)
        if len(_PRIME_CACHE) < 64:
            _PRIME_CACHE[n] = pat
    return pat


def checksum(band):
    """Checksum of a single 2-D band (any integer dtype; floats are rounded
    half-up to int like GDALCopyWords float->Int32)."""
    a = np.asarray(band)
    if np.issubdtype(a.dtype, np.floating):
        a = np.floor(a.astype(np.float64) + 0.5)
        a = np.clip(a, -2147483647, 2147483647)
        flat = a.astype(np.int64).ravel()
    else:
        flat = a.astype(np.int64).ravel()
    primes = _primes_for(flat.size)
    # C's % truncates toward zero (matters only for negative values)
    rem = np.fmod(flat, primes)
    return int(int(rem.sum(dtype=np.int64)) & 0xFFFF)


def checksum_image(arr):
    """Checksum each band of an (H, W) or (H, W, C) array -> list of ints."""
    a = np.asarray(arr)
    if a.ndim == 2:
        return [checksum(a)]
    return [checksum(a[:, :, c]) for c in range(a.shape[2])]
